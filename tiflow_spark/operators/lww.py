"""Commit-ts-ordered last-writer-wins dedup — the sorter + DM-compactor core.

Reference:
- DM compactor: per identity-key last-writer-wins with an op algebra
  (/root/reference/dm/syncer/compactor.go:152-207);
- identity key = PK/UK tuple (/root/reference/pkg/sqlmodel/reduce.go:177-186)
  → here (conv_id, turn_idx);
- total order = (commit_ts, start_ts, delete<update<insert)
  (/root/reference/cdc/model/mounter.go:163-186).

Two physical strategies, same semantics:

1. ``lww_latest`` (default, aggregation-based): groupBy(key).max_by(row,
   version). Spark's partial (map-side) aggregation is the *built-in* salted
   two-stage reduce — every map task pre-reduces its local events per key
   before the shuffle, so a hot key ships one candidate row per map task,
   not its full event stream. At 10^10 events this is the difference between
   a shuffle of ~n_keys rows and a shuffle of 10^10 rows.

2. ``lww_latest_window`` (explicit salted window): repartition on
   (key, salt) → local row_number → final row_number per key. The
   hot-span-split analog (/root/reference/cdc/scheduler/internal/v3/keyspan/
   splitter_write.go:115-188) made explicit; used when the caller needs the
   full sorted run per key (e.g. the validation job), not just the winner.

Uniqueness assumption (same as the reference sorter key, encoding/key.go:85):
the tuple (key, commit_ts, start_ts, op) identifies an event; rows that tie
on the full version tuple are redeliveries of the same event.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tiflow_spark.operators.ordering import op_order

KEY_COLS = ("conv_id", "turn_idx")


def with_op_order(events: DataFrame) -> DataFrame:
    if "op_order" in events.columns:
        return events
    return events.withColumn("op_order", op_order("op"))


def version_struct() -> Column:
    """Lexicographically ordered version tuple; larger = newer."""
    return F.struct(
        F.col("commit_ts"), F.col("start_ts"), F.col("op_order")
    )


def lww_latest(events: DataFrame, key_cols: tuple[str, ...] = KEY_COLS) -> DataFrame:
    """One winning (newest) row per key. Aggregation-based; skew-proof via
    partial aggregation (see module docstring)."""
    ev = with_op_order(events)
    payload_cols = [c for c in ev.columns if c not in key_cols]
    packed = ev.groupBy(*key_cols).agg(
        F.max_by(F.struct(*payload_cols), version_struct()).alias("_w"),
        F.count(F.lit(1)).alias("_n_events"),
    )
    return packed.select(
        *key_cols, *[F.col(f"_w.{c}").alias(c) for c in payload_cols], "_n_events"
    )


def lww_latest_window(
    events: DataFrame,
    key_cols: tuple[str, ...] = KEY_COLS,
    n_salts: int = 16,
) -> DataFrame:
    """Window-based LWW with explicit two-stage salting for hot keys.

    Stage 1 partitions by (key, salt(version)) — a hot key's events split
    across ``n_salts`` reducers, each keeping a local winner; stage 2 reduces
    the ≤ n_salts candidates per key. Equivalent output to ``lww_latest``.
    """
    ev = with_op_order(events)
    salt = F.pmod(F.xxhash64("commit_ts", "start_ts", "op_order"), F.lit(n_salts))
    ev = ev.withColumn("_salt", salt)

    w_local = (
        Window.partitionBy(*key_cols, "_salt")
        .orderBy(F.col("commit_ts").desc(), F.col("start_ts").desc(), F.col("op_order").desc())
    )
    local = ev.withColumn("_rn", F.row_number().over(w_local)).filter(F.col("_rn") == 1)

    w_final = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("commit_ts").desc(), F.col("start_ts").desc(), F.col("op_order").desc())
    )
    return (
        local.withColumn("_rn2", F.row_number().over(w_final))
        .filter(F.col("_rn2") == 1)
        .drop("_salt", "_rn", "_rn2")
    )


def compact_net_op(events: DataFrame, key_cols: tuple[str, ...] = KEY_COLS) -> DataFrame:
    """DM compactor op algebra (compactor.go:152-162): per key, reduce the
    event run to one net operation.

        first=I, last=U  → I   (INSERT+UPDATE→INSERT)
        last=D           → D   (anything+DELETE→DELETE)
        D seen, last=I   → R   (DELETE+INSERT→REPLACE, i.e. forced upsert)
        otherwise        → last op

    The MERGE sink treats I/U/R identically (upsert) and D as delete; the
    algebra is kept for parity with the reference and the truth-table tests.
    """
    ev = with_op_order(events)
    ver = version_struct()
    agg = ev.groupBy(*key_cols).agg(
        F.max_by("op", ver).alias("_last_op"),
        F.min_by("op", ver).alias("_first_op"),
        F.max(ver).alias("_last_ver"),
        F.max(F.when(F.col("op") == "D", ver)).alias("_last_del_ver"),
    )
    net = (
        F.when(F.col("_last_op") == "D", F.lit("D"))
        .when(F.col("_last_del_ver").isNotNull(), F.lit("R"))  # D then I later
        .when(F.col("_first_op") == "I", F.lit("I"))
        .otherwise(F.col("_last_op"))
    )
    return agg.select(*key_cols, net.alias("net_op"))
