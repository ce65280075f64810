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


def make_repair_batch(
    expected: DataFrame,
    actual: DataFrame,
    key_cols: list[str],
    data_cols: list[str],
    repair_ts: int,
) -> DataFrame:
    """The sync_diff fix-SQL analog (/root/reference/sync_diff_inspector/
    checkpoints + the generated fix.sql): a change batch that, merged into
    the table behind ``actual``, makes it equal ``expected``.

    Set-wise (one full-outer key join, no driver loop):
    - key in expected, absent or different in actual → INSERT expected row;
    - key only in actual → DELETE.
    Versioned at ``repair_ts``, which must exceed every commit_ts in the
    table so the version-conditional merge lets repairs win."""
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

    return (
        joined.filter(differs)
        .select(
            F.when(F.col("_e").isNull(), F.lit("D")).otherwise(F.lit("I")).alias("op"),
            F.lit(repair_ts).cast("long").alias("commit_ts"),
            F.lit(repair_ts - 1).cast("long").alias("start_ts"),
            F.lit(0).cast("int").alias("source_partition"),
            *key_cols,
            *data_cols,
        )
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
