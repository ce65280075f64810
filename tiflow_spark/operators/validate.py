"""Table validation — the sync_diff_inspector analog.

Reference: chunks both tables, compares per-chunk ``COUNT(*)`` and
``BIT_XOR(MD5(CONCAT_WS(cols)))``, binary-searching chunks that differ
(/root/reference/sync_diff_inspector/utils/utils.go:860-918).

Spark form: one distributed aggregation per table —
``groupBy(chunk).agg(count, bit_xor(xxhash64(concat_ws(...))))`` — then a
full-outer join of the two tiny checksum tables. bit_xor is
order-insensitive, so no sort; at 100 TB this is a single scan + a
n_chunks-row join. Mismatched chunks are re-compared row-by-row only for
the affected chunk (the binary-search analog, one level deep).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class DiffResult:
    n_chunks: int
    mismatched_chunks: list[int]
    row_diffs: int  # rows differing inside mismatched chunks

    @property
    def identical(self) -> bool:
        return not self.mismatched_chunks


def _chunked_checksum(df: DataFrame, key_cols: list[str], cols: list[str], n_chunks: int) -> DataFrame:
    chunk = F.pmod(F.xxhash64(*key_cols), F.lit(n_chunks)).alias("chunk")
    row_hash = F.xxhash64(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols]))
    return df.select(chunk, row_hash.alias("h")).groupBy("chunk").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.bit_xor("h").alias("checksum"),
    )


def verify_changefeed(
    table, events: DataFrame, registry, n_chunks: int = 64, key_split: int = 1,
) -> DiffResult:
    """check_sync_diff analog (/root/reference/tests/integration_tests/
    _utils/check_sync_diff:21-33): derive the expected final state from the
    FULL source log (distributed LWW + decode — no driver-side oracle) and
    chunk-diff it against the table snapshot. The post-migration/post-replay
    verification a reference user runs; both sides are one scan each.

    ``key_split=K`` runs the diff in K key-hash passes, each LWW-reducing
    only keys with ``hash % K == i`` — the full-log LWW's shuffle barely
    shrinks under partial aggregation when a key's events are spread
    across epochs (every map partition sees mostly-distinct keys), so at
    10^9+ events the one-pass shuffle is O(log size) and can exceed a
    single node's spill disk; K passes bound in-flight shuffle to 1/K at
    the cost of K source scans (the sync_diff chunking idea applied to
    the shuffle, not just the checksum). Requires NULL-free key columns
    (DML-only log) and ``key_split | n_chunks`` so every pass covers
    whole chunks; results merge exactly (chunk sets are disjoint)."""
    from pyspark.sql import functions as F

    from tiflow_spark.functions.decode import decode_payload
    from tiflow_spark.operators.lww import lww_latest, with_op_order

    def _diff(ev: DataFrame, actual: DataFrame) -> DiffResult:
        expected = (
            decode_payload(lww_latest(with_op_order(ev), table.key_cols), registry)
            .filter(F.col("op") != "D")
            .select(*table.key_cols, *[c for c in table.data_cols])
        )
        return diff_tables(
            expected, actual.select(*table.key_cols, *table.data_cols),
            key_cols=list(table.key_cols),
            compare_cols=list(table.data_cols), n_chunks=n_chunks,
        )

    if key_split <= 1:
        return _diff(events, table.snapshot())
    if n_chunks % key_split:
        raise ValueError(
            f"key_split {key_split} must divide n_chunks {n_chunks} "
            "(each pass must cover whole checksum chunks)"
        )
    mismatched: list[int] = []
    row_diffs = 0
    snap = table.snapshot()
    for i in range(key_split):
        sel = F.pmod(F.xxhash64(*table.key_cols), F.lit(key_split)) == i
        res = _diff(events.filter(sel), snap.filter(sel))
        mismatched.extend(res.mismatched_chunks)
        row_diffs += res.row_diffs
    return DiffResult(
        n_chunks=n_chunks, mismatched_chunks=sorted(mismatched),
        row_diffs=row_diffs,
    )


def diff_tables(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    n_chunks: int = 64,
) -> DiffResult:
    """Compare two tables chunk-wise; drill into mismatched chunks."""
    cols = compare_cols or sorted(set(left.columns) & set(right.columns))
    lc = _chunked_checksum(left, key_cols, cols, n_chunks).alias("l")
    rc = _chunked_checksum(right, key_cols, cols, n_chunks).alias("r")
    joined = lc.join(rc, "chunk", "full_outer").select(
        "chunk",
        F.coalesce(F.col("l.cnt"), F.lit(0)).alias("lcnt"),
        F.coalesce(F.col("r.cnt"), F.lit(0)).alias("rcnt"),
        F.col("l.checksum").alias("lsum"),
        F.col("r.checksum").alias("rsum"),
    )
    bad = [
        int(r["chunk"])
        for r in joined.filter(
            (F.col("lcnt") != F.col("rcnt")) | ~F.col("lsum").eqNullSafe(F.col("rsum"))
        ).collect()
    ]
    if not bad:
        return DiffResult(n_chunks=n_chunks, mismatched_chunks=[], row_diffs=0)

    # drill-down: row-level symmetric difference restricted to bad chunks
    # (multiset compare via per-row-hash counts; avoids exceptAll, which
    # trips a RewriteExceptAll optimizer bug on self-derived plans in 4.1)
    chunk_col = F.pmod(F.xxhash64(*key_cols), F.lit(n_chunks))
    row_hash = F.xxhash64(*[F.col(c).cast("string") for c in [*key_cols, *cols]])

    def _counts(df: DataFrame) -> DataFrame:
        return (
            df.filter(chunk_col.isin(bad))
            .select(row_hash.alias("rh"))
            .groupBy("rh")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    joined_rows = _counts(left).withColumnRenamed("n", "ln").join(
        _counts(right).withColumnRenamed("n", "rn"), "rh", "full_outer"
    )
    row_diffs = int(
        joined_rows.select(
            F.sum(
                F.abs(F.coalesce(F.col("ln"), F.lit(0)) - F.coalesce(F.col("rn"), F.lit(0)))
            ).alias("d")
        ).first()["d"]
        or 0
    )
    return DiffResult(n_chunks=n_chunks, mismatched_chunks=sorted(bad), row_diffs=row_diffs)


def _diff_join(
    expected: DataFrame,
    actual: DataFrame,
    key_cols: list[str],
    data_cols: list[str],
) -> DataFrame:
    """Set-wise diff shared by ``make_repair_batch`` and
    ``fix_sql_statements``: one full-outer key join filtered to differing
    keys. Expected's data columns keep their names; actual's are prefixed
    ``_a_``; ``_e``/``_a`` mark side presence."""
    e = expected.select(
        *key_cols, *data_cols, F.lit(True).alias("_e")
    ).alias("e")
    a = actual.select(
        *key_cols,
        *[F.col(c).alias(f"_a_{c}") for c in data_cols],
        F.lit(True).alias("_a"),
    ).alias("a")
    joined = e.join(a, on=key_cols, how="full_outer")
    differs = F.col("_e").isNull() | F.col("_a").isNull()
    for c in data_cols:
        differs = differs | ~F.col(c).eqNullSafe(F.col(f"_a_{c}"))
    return joined.filter(differs)


def make_repair_batch(
    expected: DataFrame,
    actual: DataFrame,
    key_cols: list[str],
    data_cols: list[str],
    repair_ts: int,
) -> DataFrame:
    """The sync_diff repair analog as a CHANGE BATCH (/root/reference/
    sync_diff_inspector/checkpoints + the generated fix.sql): a batch
    that, merged into the table behind ``actual``, makes it equal
    ``expected``. (``fix_sql_statements`` emits the reference's literal
    SQL-text artifact instead.)

    Set-wise (one full-outer key join, no driver loop):
    - key in expected, absent or different in actual → INSERT expected row;
    - key only in actual → DELETE.
    Versioned at ``repair_ts``, which must exceed every commit_ts in the
    table so the version-conditional merge lets repairs win."""
    return (
        _diff_join(expected, actual, key_cols, data_cols)
        .select(
            F.when(F.col("_e").isNull(), F.lit("D")).otherwise(F.lit("I")).alias("op"),
            F.lit(repair_ts).cast("long").alias("commit_ts"),
            F.lit(repair_ts - 1).cast("long").alias("start_ts"),
            F.lit(0).cast("int").alias("source_partition"),
            *key_cols,
            *data_cols,
        )
    )


def fix_sql_statements(
    expected: DataFrame,
    actual: DataFrame,
    key_cols: list[str],
    data_cols: list[str],
    schema: str = "db",
    table: str = "tbl",
) -> DataFrame:
    """sync_diff's fix-SQL artifact, set-wise: one SQL statement string
    per differing key (reference GenerateReplaceDML /
    /root/reference/sync_diff_inspector/utils/utils.go:193-218 and
    GenerateDeleteDML / utils.go:297-321):

    - expected-side row missing or different downstream →
      ``REPLACE INTO `schema`.`tbl`(`c`,...) VALUES (...);`` with the
      expected values (all columns, NULL literal for nulls);
    - downstream-only row → ``DELETE FROM `schema`.`tbl` WHERE `c` = v
      AND `c2` is NULL ... LIMIT 1;`` built from the downstream row's own
      values, every column in the predicate, exactly the reference shape.

    String literals escape single quotes by doubling (ANSI; the reference
    targets MySQL's escapeString — backslash escaping is out of scope for
    this artifact and documented here). Emits (key_cols..., op, fix_sql);
    the whole construction is one JVM projection over the shared
    ``_diff_join`` — no driver loop, no extra shuffle beyond the diff's
    own key join."""
    string_cols = {
        f.name for f in expected.select(*key_cols, *data_cols).schema.fields
        if f.dataType.simpleString() == "string"
    }

    def lit_value(col, name):
        if name in string_cols:
            quoted = F.concat(
                F.lit("'"), F.regexp_replace(col, "'", "''"), F.lit("'")
            )
        else:
            quoted = col.cast("string")
        return F.when(col.isNull(), F.lit("NULL")).otherwise(quoted)

    cols = [*key_cols, *data_cols]
    target = f"`{schema}`.`{table}`"
    col_list = ",".join(f"`{c}`" for c in cols)
    replace_vals = [
        lit_value(F.col(c), c) for c in cols
    ]
    replace_sql = F.concat(
        F.lit(f"REPLACE INTO {target}({col_list}) VALUES ("),
        F.concat_ws(",", *replace_vals),
        F.lit(");"),
    )

    def where_kv(col, name):
        return F.when(
            col.isNull(), F.lit(f"`{name}` is NULL")
        ).otherwise(F.concat(F.lit(f"`{name}` = "), lit_value(col, name)))

    delete_kvs = [where_kv(F.col(c), c) for c in key_cols] + [
        where_kv(F.col(f"_a_{c}"), c) for c in data_cols
    ]
    delete_sql = F.concat(
        F.lit(f"DELETE FROM {target} WHERE "),
        F.concat_ws(" AND ", *delete_kvs),
        F.lit(" LIMIT 1;"),
    )

    return _diff_join(expected, actual, key_cols, data_cols).select(
        *key_cols,
        F.when(F.col("_e").isNull(), F.lit("D")).otherwise(F.lit("I")).alias("op"),
        F.when(F.col("_e").isNull(), delete_sql)
        .otherwise(replace_sql)
        .alias("fix_sql"),
    )


def repair_table(table, expected: DataFrame, repair_ts: int) -> int:
    """Apply a repair pass: diff the snapshot against ``expected`` and merge
    the correcting batch. Returns the number of repair events applied."""
    batch = make_repair_batch(
        expected,
        table.snapshot(),
        key_cols=list(table.key_cols),
        data_cols=list(table.data_cols),
        repair_ts=repair_ts,
    )
    stats = table.merge(batch, batch_id=table.last_committed_batch() + 1)
    return stats.applied_events
