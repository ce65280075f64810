"""One-epoch replay plan — the puller→sorter→mounter→sink data path.

Reference walk (SURVEY.md §3.3): RawKVEntry → sorter (pebble) → mounter →
RowChangedEvent → MySQL DMLs → checkpoint advance. Spark rebuild, one
``foreachBatch`` body:

    raw events
      → frontier (per-source-partition resolved-ts + counts → lineage)
      → op_order + LWW reduce to net row per key  [1 shuffle, partial-agg
        = the salted hot-key split; sorter + DM compactor in one op]
      → versioned payload decode                  [narrow, JVM from_json]
      → CowTable.merge                            [bucket-pruned COW MERGE,
        epoch-fenced, version-conditional → idempotent + out-of-order safe]

Decode runs AFTER the reduce (the reference also mounts post-sorter,
/root/reference/cdc/processor/sinkmanager/table_sink_worker.go): at 10^10
events/epoch with ~10^8 live keys this decodes 1% of the payload bytes the
naive order would.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from tiflow_spark.functions.decode import decode_payload, decode_payload_pandas
from tiflow_spark.operators.frontier import partition_frontiers
from tiflow_spark.operators.lww import lww_latest, with_op_order
from tiflow_spark.sinks.cow_table import CowTable, MergeStats
from tiflow_spark.sources.registry import SchemaVersion


@dataclass
class EpochResult:
    stats: MergeStats
    resolved_ts: int | None


def apply_epoch(
    table: CowTable,
    registry: list[SchemaVersion],
    batch: DataFrame,
    batch_id: int,
    decoder: str = "jvm",
) -> EpochResult:
    """Process one microbatch of raw change events into the table.

    Action layout (one full pass over the raw events + one over net rows):
    the frontier aggregate and the LWW reduce both scan the raw batch; the
    caller (streaming runner) persists the batch so the scan is one read.
    The merge is told the batch is pre-reduced, so it skips its own LWW.
    """
    ev = with_op_order(batch)

    # frontier + lineage as a SEPARATE tiny job: the scan projects only
    # (source_partition, commit_ts) — parquet column pruning makes it ~1% of
    # the main job. Round 1 rode these as 2x64 conditional aggregates ON the
    # LWW job ("zero extra pass"); measured at 59.8M events that added 5.9s
    # to a 9.3s job while the pruned scan costs 0.69s — observation was the
    # wrong tool for per-partition metrics.
    lineage_rows = [
        (batch_id, int(r["source_partition"]), int(r["resolved_ts"]), int(r["n_events"]))
        for r in partition_frontiers(batch).collect()
    ]
    resolved = min((r[2] for r in lineage_rows), default=None)

    # persist the reduced rows BEFORE decoding: projecting from_json onto
    # the aggregate output folds the decode into the aggregate's result
    # expressions (measured ~75x slower); the cache is a plan barrier and
    # the net rows (one per live key) are the smallest point in the pipeline
    net = lww_latest(ev).withColumn("bucket", table._bucket_col()).persist()
    net.count()  # materialize
    # affected buckets read from the (small, cached) net — sub-second
    affected = [int(r["bucket"]) for r in net.select("bucket").distinct().collect()]

    try:
        decode = decode_payload_pandas if decoder == "pandas" else decode_payload
        dec = decode(net, registry)

        stats = table.merge(
            dec, batch_id, resolved_ts=resolved, lineage_rows=lineage_rows,
            pre_reduced=True, affected_buckets=affected,
        )
    finally:
        net.unpersist()
    return EpochResult(stats=stats, resolved_ts=resolved)
