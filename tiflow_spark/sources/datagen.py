"""Deterministic change-event generator (the synthetic binlog/WAL).

Produces the `change_events` stream described in FIXTURES.md §2 — the
RawKVEntry analog (/root/reference/cdc/model/kv.go:82-96) over conversation
transcripts. Fully deterministic from (seed, shape params): built on
``spark.range`` + ``xxhash64``; no wall clock, no RNG state, so the same
call reproduces the same 10^10-event log on any cluster size (a requirement
of the restart/replay tests and the scaling bench).

Generated properties (FIXTURES.md §2):
- per-key lifecycles {I}, {I,U*}, {I,U*,D}, {I,D,I};
- same-key same-commit_ts twin rows differing in op (delete/insert tie,
  reference sorter order delete < update < insert,
  /root/reference/cdc/processor/sourcemanager/sorter/pebble/encoding/key.go:113);
- commit_ts collisions across keys;
- skew: ``hot_conv_fraction`` of conv_ids carry ~``hot_event_share`` of events;
- schema evolution: events with commit_ts >= ddl_ts carry schema_version 2
  whose payload adds the `tool` field (v1 payloads lack it);
- optional exact duplicate rows (at-least-once redelivery).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# commit_ts layout: each lifecycle step s lands in band [TS_BAND*s, TS_BAND*(s+1))
# with a hash jitter — per-key temporal order follows lifecycle order while
# commit_ts values collide freely across keys.
TS_BAND = 1_000


@dataclass(frozen=True)
class GenSpec:
    """Shape of the synthetic change log. Defaults give a small smoke log."""

    n_convs: int = 200
    cold_turns: int = 4
    hot_turns: int = 64          # turns per hot conversation
    hot_conv_fraction: float = 0.02
    seed: int = 42
    n_source_partitions: int = 8
    ddl_step: int = 3            # lifecycle step from which schema v2 applies
    twin_fraction: float = 0.05  # same-(key,commit_ts,start_ts) op-tie twins
    duplicate_fraction: float = 0.05  # exact redelivered rows
    max_extra_updates: int = 3   # lifecycle length jitter
    # emit the v2 DDL as an op='DDL' row IN the log (payload = schema JSON),
    # at commit_ts = ddl_ts - 1 so it lands in the band BEFORE the first v2
    # DML (the schema-resolved-ts contract: a version is registered no later
    # than its first row). Consumers must run with ddl_in_stream=True.
    emit_ddl: bool = False

    @property
    def ddl_ts(self) -> int:
        """commit_ts from which schema_version 2 applies (the DDL TSO analog)."""
        return TS_BAND * self.ddl_step


def _h(*cols, seed: int, tag: str):
    """Deterministic non-negative 63-bit hash of columns + a salt tag."""
    return F.abs(F.xxhash64(F.lit(tag), F.lit(seed), *cols))


def generate_change_events(spark: SparkSession, spec: GenSpec = GenSpec()) -> DataFrame:
    """Build the change-event DataFrame. Lazy — nothing is materialized here.

    Schema (FIXTURES.md §2): op, commit_ts, start_ts, conv_id, turn_idx,
    schema_version, payload, pre_payload, source_partition.
    """
    s = spec.seed
    n_hot = max(1, int(spec.n_convs * spec.hot_conv_fraction))

    # hot convs are STRIDED through the id range (conv_n % stride == 0), not
    # a contiguous prefix: spark.range splits are contiguous, so a prefix
    # would concentrate ~half the events in one input split/file — an input-
    # layout skew that serializes every downstream scan (measured: one file
    # held 55% of rows and capped scan parallelism at ~2 tasks)
    hot_stride = max(1, spec.n_convs // n_hot)
    convs = (
        spark.range(spec.n_convs)
        .withColumnRenamed("id", "conv_n")
        .withColumn("conv_id", F.concat(F.lit("c"), F.col("conv_n")))
        .withColumn("is_hot", F.col("conv_n") % hot_stride == 0)
        .withColumn(
            "n_turns",
            F.when(F.col("is_hot"), F.lit(spec.hot_turns)).otherwise(F.lit(spec.cold_turns)),
        )
    )

    turns = convs.select(
        "conv_id",
        "is_hot",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )

    # lifecycle pattern per key: 0={I,U*}, 1={I}, 2={I,U*,D}, 3={I,D,I}
    turns = turns.withColumn("pattern", (_h("conv_id", "turn_idx", seed=s, tag="pat") % 4))
    turns = turns.withColumn(
        "life_len",
        F.when(F.col("pattern") == 1, F.lit(1))
        .when(F.col("pattern") == 3, F.lit(3))
        .otherwise(
            F.lit(2) + (_h("conv_id", "turn_idx", seed=s, tag="len") % spec.max_extra_updates)
        ),
    )

    ev = turns.select(
        "conv_id",
        "turn_idx",
        "pattern",
        "life_len",
        F.explode(F.sequence(F.lit(0), F.col("life_len") - 1)).alias("seq"),
    )

    last = F.col("seq") == F.col("life_len") - 1
    ev = ev.withColumn(
        "op",
        F.when(F.col("seq") == 0, F.lit("I"))
        .when((F.col("pattern") == 2) & last, F.lit("D"))
        .when((F.col("pattern") == 3) & (F.col("seq") == 1), F.lit("D"))
        .when((F.col("pattern") == 3) & (F.col("seq") == 2), F.lit("I"))
        .otherwise(F.lit("U")),
    )

    jitter = _h("conv_id", "turn_idx", "seq", seed=s, tag="cts") % (TS_BAND - 10)
    ev = ev.withColumn("commit_ts", F.col("seq") * TS_BAND + jitter)
    ev = ev.withColumn(
        "start_ts", F.col("commit_ts") - 1 - (_h("conv_id", "turn_idx", "seq", seed=s, tag="sts") % 50)
    )

    # twin rows: same key, same commit_ts, same start_ts, different op —
    # exercises the delete<update<insert tie-break. A twin 'D' loses to the
    # original op at equal (commit_ts, start_ts); a twin 'I' against a 'D'
    # original wins.
    is_twin_base = (_h("conv_id", "turn_idx", "seq", seed=s, tag="twin") % 10_000) < int(
        spec.twin_fraction * 10_000
    )
    ev = ev.withColumn("n_copies", F.when(is_twin_base, F.lit(2)).otherwise(F.lit(1)))
    ev = ev.select(
        "*", F.explode(F.sequence(F.lit(0), F.col("n_copies") - 1)).alias("copy")
    ).drop("n_copies")
    ev = ev.withColumn(
        "op",
        F.when(F.col("copy") == 0, F.col("op")).otherwise(
            # twin flips the op: D twins an I/U, I twins a D
            F.when(F.col("op") == "D", F.lit("I")).otherwise(F.lit("D"))
        ),
    )

    ev = ev.withColumn(
        "schema_version", F.when(F.col("commit_ts") < F.lit(spec.ddl_ts), F.lit(1)).otherwise(F.lit(2))
    )

    role = F.element_at(
        F.array(F.lit("user"), F.lit("assistant"), F.lit("system"), F.lit("tool")),
        (_h("conv_id", "turn_idx", seed=s, tag="role") % 4 + 1).cast("int"),
    )
    text = F.concat_ws(
        "-", F.lit("t"), "conv_id", F.col("turn_idx").cast("string"),
        F.col("seq").cast("string"), F.col("copy").cast("string"),
        F.col("commit_ts").cast("string"),
    )
    tool = F.when(
        (_h("conv_id", "turn_idx", "seq", seed=s, tag="tool") % 10) < 3,
        F.concat(F.lit("tool_"), (_h("conv_id", "turn_idx", seed=s, tag="tooln") % 5).cast("string")),
    )
    ts = F.timestamp_seconds(F.lit(1_700_000_000) + F.col("commit_ts"))

    payload_v1 = F.to_json(F.struct(role.alias("role"), text.alias("text"), ts.alias("ts")))
    payload_v2 = F.to_json(
        F.struct(role.alias("role"), text.alias("text"), tool.alias("tool"), ts.alias("ts"))
    )
    ev = ev.withColumn(
        "payload",
        F.when(F.col("op") == "D", F.lit(None).cast("string"))
        .when(F.col("schema_version") == 1, payload_v1)
        .otherwise(payload_v2),
    )
    pre_text = F.concat_ws(
        "-", F.lit("t"), "conv_id", F.col("turn_idx").cast("string"),
        (F.col("seq") - 1).cast("string"), F.lit("0"),
    )
    ev = ev.withColumn(
        "pre_payload",
        F.when(
            F.col("op") == "U",
            F.to_json(F.struct(role.alias("role"), pre_text.alias("text"), ts.alias("ts"))),
        ).otherwise(F.lit(None).cast("string")),
    )

    # source partition is key-aligned (a TiKV region owns a key range):
    # all events of one conv land in one source partition.
    ev = ev.withColumn(
        "source_partition",
        (_h("conv_id", seed=s, tag="srcpart") % spec.n_source_partitions).cast("int"),
    )

    out_cols = [
        "op", "commit_ts", "start_ts", "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        "schema_version", "payload", "pre_payload", "source_partition",
    ]
    ev = ev.select(*out_cols)

    if spec.duplicate_fraction > 0:
        dup = ev.filter(
            (_h("conv_id", "turn_idx", "commit_ts", "op", seed=s, tag="redeliver") % 10_000)
            < int(spec.duplicate_fraction * 10_000)
        )
        ev = ev.unionAll(dup)

    if spec.emit_ddl:
        from tiflow_spark.sources.registry import PAYLOAD_V2

        ddl_row = [
            (
                "DDL", spec.ddl_ts - 1, spec.ddl_ts - 2, None, None,
                2, PAYLOAD_V2.json(), None, 0,
            )
        ]
        ddl_df = spark.createDataFrame(
            ddl_row,
            "op STRING, commit_ts LONG, start_ts LONG, conv_id STRING, "
            "turn_idx INT, schema_version LONG, payload STRING, "
            "pre_payload STRING, source_partition INT",
        )
        ev = ev.unionByName(ddl_df)

    return ev


def write_epoch_files(
    spark: SparkSession,
    spec: GenSpec,
    out_dir: str,
    n_epochs: int | None = None,
) -> list[str]:
    """Materialize the change log as one parquet directory per epoch, in
    commit_ts bands — the file-stream source consumes these in order.

    Returns the epoch directory paths (epoch k holds lifecycle step k, i.e.
    commit_ts in [k*TS_BAND, (k+1)*TS_BAND)); later epochs only ever carry
    later commit_ts bands, mirroring the resolved-ts contract
    (/root/reference/cdc/model/kv.go:58-66).
    """
    ev = generate_change_events(spark, spec).withColumn(
        "epoch", (F.col("commit_ts") / TS_BAND).cast("long")
    )
    max_epoch = spec.max_extra_updates + 2  # upper bound on lifecycle len + twin
    n = n_epochs if n_epochs is not None else max_epoch
    paths = []
    for k in range(n):
        p = f"{out_dir}/epoch_{k:04d}"
        ev.filter(F.col("epoch") == k).drop("epoch").write.mode("overwrite").parquet(p)
        paths.append(p)
    return paths


def write_epoch_files_key_local(
    spark: SparkSession,
    spec: GenSpec,
    out_dir: str,
    n_groups: int = 16,
) -> list[str]:
    """Materialize the change log as key-LOCAL epochs: epoch k carries the
    full lifecycle of the k-th contiguous conv-id range (conversations
    arriving as they complete — the bulk-backfill shape), instead of
    commit_ts bands. Paired with a range-bucketed CowTable
    (``bucket_expr`` on contiguous conv ranges), each epoch's merge touches
    only the buckets its key range maps to — the bucket-pruning
    demonstration the commit_ts-banded feed (every epoch touches every
    key) cannot show. Out-of-order commit_ts across epochs is safe: the
    version-conditional merge is order-free and frontiers are per-source-
    partition maxima."""
    group_size = (spec.n_convs + n_groups - 1) // n_groups
    conv_n = F.substring("conv_id", 2, 18).cast("long")
    ev = generate_change_events(spark, spec).withColumn(
        "epoch", (conv_n / group_size).cast("long")
    )
    paths = []
    for k in range(n_groups):
        p = f"{out_dir}/epoch_{k:04d}"
        # one file per epoch so maxFilesPerTrigger=1 maps one epoch to one
        # microbatch (scan parallelism is preserved — parquet splits by row
        # group, not by file)
        ev.filter(F.col("epoch") == k).drop("epoch").coalesce(1).write.mode(
            "overwrite"
        ).parquet(p)
        paths.append(p)
    return paths
