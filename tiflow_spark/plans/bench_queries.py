"""Driver-facing query definitions over /root/testdata parquet tables.

Each query exists twice with identical semantics and column names:
- a Spark implementation built from tiflow_spark operators (queries());
- an ANSI-SQL oracle DuckDB can run (oracle_sql()).

The CDC queries derive a deterministic change-event view from the `events`
table using only arithmetic both engines evaluate identically (modular int
math, md5, string concat) — no engine-specific hashing on the oracle path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiflow_spark.functions import dedup as dd
from tiflow_spark.functions import similarity as sim
from tiflow_spark.functions import text as tx
from tiflow_spark.operators.filters import EventFilterRule, apply_event_filter
from tiflow_spark.operators.lww import (
    compact_net_op,
    lww_latest,
    lww_latest_window,
    with_op_order,
)
from tiflow_spark.operators.frontier import partition_frontiers
from tiflow_spark.operators.update_split import split_updates

# ---------------------------------------------------------------- helpers

def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def change_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic change-event derivation from the events table.
    Kept in exact lockstep with CE_SQL below."""
    e = _t(spark, sf_dir, "events")
    commit_ts = (F.col("event_id") * 37) % 1_000_000
    return e.select(
        F.when(F.col("event_id") % 10 < 5, "U")
        .when(F.col("event_id") % 10 < 9, "I")
        .otherwise("D")
        .alias("op"),
        commit_ts.alias("commit_ts"),
        (commit_ts - 1 - F.col("event_id") % 7).alias("start_ts"),
        F.concat(F.lit("c"), F.col("user_id").cast("string")).alias("conv_id"),
        (F.col("event_id") % 25).cast("int").alias("turn_idx"),
        F.when(commit_ts < 500_000, F.lit(1)).otherwise(F.lit(2)).alias("schema_version"),
        F.col("event_type").alias("role"),
        F.concat(F.lit("txt-"), F.col("event_id").cast("string")).alias("text"),
        F.col("value").alias("val"),
        (F.col("user_id") % 8).cast("int").alias("source_partition"),
        ((F.col("event_id") % 25 + F.when(F.col("event_id") % 5 == 0, 1).otherwise(0)) % 25)
        .cast("int")
        .alias("pre_turn"),
    )


CE_SQL = """
  SELECT
    CASE WHEN event_id % 10 < 5 THEN 'U'
         WHEN event_id % 10 < 9 THEN 'I' ELSE 'D' END AS op,
    (event_id * 37) % 1000000 AS commit_ts,
    (event_id * 37) % 1000000 - 1 - (event_id % 7) AS start_ts,
    'c' || CAST(user_id AS VARCHAR) AS conv_id,
    CAST(event_id % 25 AS INT) AS turn_idx,
    CASE WHEN (event_id * 37) % 1000000 < 500000 THEN 1 ELSE 2 END AS schema_version,
    event_type AS role,
    'txt-' || CAST(event_id AS VARCHAR) AS text,
    value AS val,
    CAST(user_id % 8 AS INT) AS source_partition,
    CAST((event_id % 25 + CASE WHEN event_id % 5 = 0 THEN 1 ELSE 0 END) % 25 AS INT) AS pre_turn
  FROM events
"""

OP_ORDER_SQL = "CASE op WHEN 'D' THEN 1 WHEN 'U' THEN 2 ELSE 3 END"

# ---------------------------------------------------------------- CDC queries

def q_cdc_lww_final_state(spark, sf_dir):
    ce = change_events(spark, sf_dir)
    latest = lww_latest(ce)
    return latest.filter(F.col("op") != "D").select(
        "conv_id", "turn_idx", "role", "text", "val", "commit_ts"
    )


def q_cdc_lww_salted(spark, sf_dir):
    ce = change_events(spark, sf_dir)
    latest = lww_latest_window(ce, n_salts=8)
    return latest.filter(F.col("op") != "D").select(
        "conv_id", "turn_idx", "role", "text", "val", "commit_ts"
    )


_LWW_SQL = f"""
  WITH ce AS ({CE_SQL}),
  ranked AS (
    SELECT *, row_number() OVER (
      PARTITION BY conv_id, turn_idx
      ORDER BY commit_ts DESC, start_ts DESC, {OP_ORDER_SQL} DESC) AS rn
    FROM ce)
  SELECT conv_id, turn_idx, role, text, val, commit_ts
  FROM ranked WHERE rn = 1 AND op <> 'D'
"""


def q_cdc_partition_frontiers(spark, sf_dir):
    return partition_frontiers(change_events(spark, sf_dir))


def q_cdc_resolved_ts(spark, sf_dir):
    fr = partition_frontiers(change_events(spark, sf_dir))
    return fr.agg(F.min("resolved_ts").alias("resolved_ts"))


def q_cdc_net_op_algebra(spark, sf_dir):
    return compact_net_op(change_events(spark, sf_dir))


def q_cdc_txn_grouping(spark, sf_dir):
    ce = change_events(spark, sf_dir).withColumn(
        "txn_band", (F.col("commit_ts") / 1000).cast("long")
    )
    return ce.groupBy("txn_band").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("conv_id").alias("n_convs"),
        F.min("commit_ts").alias("min_ts"),
        F.max("commit_ts").alias("max_ts"),
    )


def q_cdc_update_split(spark, sf_dir):
    ce = change_events(spark, sf_dir)
    out = split_updates(ce, pre_key_cols={"turn_idx": "pre_turn"})
    return out.select("op", "conv_id", "turn_idx", "commit_ts")


def q_cdc_event_filter(spark, sf_dir):
    ce = change_events(spark, sf_dir)
    rule = EventFilterRule(
        ignore_ops=frozenset({"D"}), ignore_update_new_expr="val < 100"
    )
    return apply_event_filter(ce, rule).select(
        "op", "conv_id", "turn_idx", "commit_ts", "val"
    )


def q_cdc_checksum_chunks(spark, sf_dir):
    ce = change_events(spark, sf_dir)
    row = F.md5(
        F.concat_ws(
            "|",
            F.col("conv_id"),
            F.col("turn_idx").cast("string"),
            F.col("commit_ts").cast("string"),
            F.col("op"),
        )
    )
    return (
        ce.withColumn("chunk", F.pmod(F.col("commit_ts"), F.lit(16)).cast("int"))
        .groupBy("chunk")
        .agg(F.count(F.lit(1)).alias("cnt"), F.min(row).alias("min_h"), F.max(row).alias("max_h"))
    )


def q_cdc_op_order(spark, sf_dir):
    ce = with_op_order(change_events(spark, sf_dir))
    return ce.select("conv_id", "turn_idx", "commit_ts", "op", "op_order")


# ------------------------------------------------------------- text queries

def q_text_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    feats = tx.quality_features(F.col("text"))
    return d.select(
        "doc_id",
        tx.token_count(F.col("text")).cast("long").alias("n_tokens"),
        feats["n_chars"].cast("long").alias("n_chars"),
        F.round(feats["punct_ratio"], 6).alias("punct_ratio"),
    )


def q_text_lang_id(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", tx.lang_id(F.col("text")).alias("pred_lang"))


def q_text_fingerprint(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", tx.fingerprint(F.col("text")).alias("fp"))


def q_dedup_exact(spark, sf_dir):
    return dd.exact_dedup(_t(spark, sf_dir, "documents"))


def q_dedup_minhash_sigs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return dd.minhash_signatures(dd.shingles(d), k=4)


def q_dedup_jaccard_pairs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").filter("doc_id < 150")
    sh = dd.shingles(d)
    return dd.jaccard_pairs(sh, threshold=0.4).select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    )


def q_dedup_simhash(spark, sf_dir):
    return dd.simhash64(_t(spark, sf_dir, "documents"))


def q_ann_topk(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    queries = e.filter("vec_id < 5").select(F.col("vec_id").alias("query_id"), "embedding")
    return sim.topk_cosine(e, queries, k=10).select("query_id", "vec_id", "rank")


def q_ann_lsh_topk(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    dim = len(e.select("embedding").first()[0])
    queries = e.filter("vec_id < 5").select(F.col("vec_id").alias("query_id"), "embedding")
    return sim.lsh_bucket_topk(e, queries, dim=dim, k=10, n_planes=4).select(
        "query_id", "vec_id", "rank"
    )


def q_embedding_near_dups(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    dim = len(e.select("embedding").first()[0])
    return sim.embedding_near_dups(e, dim=dim, threshold=0.99, n_planes=4).select(
        "id_a", "id_b", F.round("sim", 6).alias("sim")
    )


QUERIES = {
    "cdc_lww_final_state": q_cdc_lww_final_state,
    "cdc_lww_salted": q_cdc_lww_salted,
    "cdc_partition_frontiers": q_cdc_partition_frontiers,
    "cdc_resolved_ts": q_cdc_resolved_ts,
    "cdc_net_op_algebra": q_cdc_net_op_algebra,
    "cdc_txn_grouping": q_cdc_txn_grouping,
    "cdc_update_split": q_cdc_update_split,
    "cdc_event_filter": q_cdc_event_filter,
    "cdc_checksum_chunks": q_cdc_checksum_chunks,
    "cdc_op_order": q_cdc_op_order,
    "text_stats": q_text_stats,
    "text_lang_id": q_text_lang_id,
    "text_fingerprint": q_text_fingerprint,
    "dedup_exact": q_dedup_exact,
    "dedup_minhash_sigs": q_dedup_minhash_sigs,
    "dedup_jaccard_pairs": q_dedup_jaccard_pairs,
    "dedup_simhash": q_dedup_simhash,
    "ann_topk": q_ann_topk,
    "ann_lsh_topk": q_ann_lsh_topk,
    "embedding_near_dups": q_embedding_near_dups,
}


# ------------------------------------------------------------- oracle SQL

def _count_sql(haystack: str, needle: str) -> str:
    n = len(needle)
    return f"(length({haystack}) - length(replace({haystack}, '{needle}', ''))) / {n}"


def _lang_sql() -> str:
    padded = "' ' || lower(text) || ' '"
    scores = {
        lang: " + ".join(_count_sql(padded, m) for m in markers)
        for lang, markers in tx.LANG_MARKERS.items()
    }
    best = "greatest(" + ", ".join(f"({s})" for s in scores.values()) + ")"
    expr = "'unknown'"
    for lang in reversed(list(scores)):
        expr = (
            f"CASE WHEN ({scores[lang]}) >= 1 AND ({scores[lang]}) = {best} "
            f"THEN '{lang}' ELSE {expr} END"
        )
    return expr


_FP_SQL = "md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))"

_SHINGLES_SQL = """
  WITH norm AS (
    SELECT doc_id, regexp_replace(lower(text), '\\s+', ' ', 'g') AS n FROM documents {where}
  ),
  sh AS (
    SELECT DISTINCT doc_id, substr(n, CAST(i AS INT), 3) AS shingle
    FROM norm, unnest(generate_series(1, greatest(length(n) - 2, 1))) AS t(i)
  )
"""


def _minhash_cols(k: int) -> str:
    return ", ".join(f"min(md5('{s}' || shingle)) AS h{s}" for s in range(k))


ORACLES = {
    "cdc_lww_final_state": _LWW_SQL,
    "cdc_lww_salted": _LWW_SQL,
    "cdc_partition_frontiers": f"""
      WITH ce AS ({CE_SQL})
      SELECT source_partition, max(commit_ts) AS resolved_ts,
             count(*) AS n_events
      FROM ce GROUP BY source_partition
    """,
    "cdc_resolved_ts": f"""
      WITH ce AS ({CE_SQL}),
      fr AS (SELECT source_partition, max(commit_ts) AS m FROM ce GROUP BY 1)
      SELECT min(m) AS resolved_ts FROM fr
    """,
    "cdc_net_op_algebra": f"""
      WITH ce AS ({CE_SQL}),
      agg AS (
        SELECT conv_id, turn_idx,
               arg_max(op, commit_ts) AS last_op,
               arg_min(op, commit_ts) AS first_op,
               max(CASE WHEN op = 'D' THEN commit_ts END) AS last_del
        FROM ce GROUP BY conv_id, turn_idx)
      SELECT conv_id, turn_idx,
             CASE WHEN last_op = 'D' THEN 'D'
                  WHEN last_del IS NOT NULL THEN 'R'
                  WHEN first_op = 'I' THEN 'I'
                  ELSE last_op END AS net_op
      FROM agg
    """,
    "cdc_txn_grouping": f"""
      WITH ce AS ({CE_SQL})
      SELECT CAST(floor(commit_ts / 1000) AS BIGINT) AS txn_band,
             count(*) AS n_events, count(DISTINCT conv_id) AS n_convs,
             min(commit_ts) AS min_ts, max(commit_ts) AS max_ts
      FROM ce GROUP BY 1
    """,
    "cdc_update_split": f"""
      WITH ce AS ({CE_SQL})
      SELECT op, conv_id, turn_idx, commit_ts FROM ce
        WHERE NOT (op = 'U' AND pre_turn <> turn_idx)
      UNION ALL
      SELECT 'D' AS op, conv_id, pre_turn AS turn_idx, commit_ts FROM ce
        WHERE op = 'U' AND pre_turn <> turn_idx
      UNION ALL
      SELECT 'I' AS op, conv_id, turn_idx, commit_ts FROM ce
        WHERE op = 'U' AND pre_turn <> turn_idx
    """,
    "cdc_event_filter": f"""
      WITH ce AS ({CE_SQL})
      SELECT op, conv_id, turn_idx, commit_ts, val FROM ce
      WHERE NOT (op = 'D') AND NOT (op = 'U' AND val < 100)
    """,
    "cdc_checksum_chunks": f"""
      WITH ce AS ({CE_SQL})
      SELECT CAST(commit_ts % 16 AS INT) AS chunk, count(*) AS cnt,
             min(md5(conv_id || '|' || CAST(turn_idx AS VARCHAR) || '|' ||
                     CAST(commit_ts AS VARCHAR) || '|' || op)) AS min_h,
             max(md5(conv_id || '|' || CAST(turn_idx AS VARCHAR) || '|' ||
                     CAST(commit_ts AS VARCHAR) || '|' || op)) AS max_h
      FROM ce GROUP BY 1
    """,
    "cdc_op_order": f"""
      WITH ce AS ({CE_SQL})
      SELECT conv_id, turn_idx, commit_ts, op, {OP_ORDER_SQL} AS op_order FROM ce
    """,
    "text_stats": f"""
      SELECT doc_id,
        CAST(CASE WHEN length(trim(text)) = 0 THEN 0
             ELSE length(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT)
          AS n_tokens,
        CAST(length(text) AS BIGINT) AS n_chars,
        round(CASE WHEN length(text) > 0
          THEN length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 1.0 / length(text)
          ELSE 0.0 END, 6) AS punct_ratio
      FROM documents
    """,
    "text_lang_id": f"SELECT doc_id, {_lang_sql()} AS pred_lang FROM documents",
    "text_fingerprint": f"SELECT doc_id, {_FP_SQL} AS fp FROM documents",
    "dedup_exact": f"""
      SELECT {_FP_SQL} AS fp, min(doc_id) AS keep_id, count(*) AS n_dupes
      FROM documents GROUP BY 1
    """,
    "dedup_minhash_sigs": _SHINGLES_SQL.format(where="")
    + f"SELECT doc_id AS id, {_minhash_cols(4)} FROM sh GROUP BY doc_id",
    "dedup_jaccard_pairs": _SHINGLES_SQL.format(where="WHERE doc_id < 150")
    + """,
      sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
      inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT id_a, id_b,
             round(n_inter * 1.0 / (sa.sz + sb.sz - n_inter), 6) AS jaccard
      FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE n_inter * 1.0 / (sa.sz + sb.sz - n_inter) >= 0.4
    """,
}
