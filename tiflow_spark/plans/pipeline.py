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
    strict_frontier: bool = False,
) -> EpochResult:
    """Process one microbatch of raw change events into the table.

    Action layout (one full pass over the raw events + one over net rows):
    the frontier aggregate and the LWW reduce both scan the raw batch; the
    caller (streaming runner) persists the batch so the scan is one read.
    The merge is told the batch is pre-reduced, so it skips its own LWW.

    ``strict_frontier=True`` enforces the reference's commit fence
    (/root/reference/cdc/processor/sourcemanager/sorter/engine.go:103-113):
    only events at or below the table's global resolved-ts are applied this
    epoch; the rest are withheld in the table's pending store and re-enter
    when the frontier passes them — readers never observe a row above the
    watermark. The default (False) applies everything immediately: the
    version-conditional merge makes that equally convergent, at the cost of
    transiently exposing above-watermark rows (documented deviation)."""
    # the sink pipeline never reads the old-value image (pre-image consumers
    # — old-image filters, key-change splitting — run upstream); carrying
    # pre_payload through the LWW shuffle costs real bytes (measured: the
    # reduce runs 38% faster without it at 59.8M events)
    if "pre_payload" in batch.columns:
        batch = batch.drop("pre_payload")
    ev = with_op_order(batch)

    if strict_frontier:
        return _apply_epoch_strict(table, registry, ev, batch_id, decoder)

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


def _apply_epoch_strict(
    table: CowTable,
    registry: list[SchemaVersion],
    ev: DataFrame,
    batch_id: int,
    decoder: str,
) -> EpochResult:
    """Commit-fenced epoch: split (new events ∪ previous pending) at the NEW
    global watermark; apply the ready half, persist the rest as the next
    pending generation, commit both references in one atomic manifest swap.
    Pending holds at most one frontier-lag of events (bounded by the source
    contract, kv.go:58-66); it is rewritten whole each epoch and old
    generations are vacuumed."""
    from pyspark.sql import functions as F

    if batch_id <= table.last_committed_batch():
        return EpochResult(stats=MergeStats(batch_id=batch_id, skipped=True), resolved_ts=None)

    lineage_rows = [
        (batch_id, int(r["source_partition"]), int(r["resolved_ts"]), int(r["n_events"]))
        for r in partition_frontiers(ev).collect()
    ]
    _, resolved = CowTable._advance_frontiers(table.current_manifest(), lineage_rows)

    prev_pending = table.read_pending()
    full = ev.unionByName(with_op_order(prev_pending)) if prev_pending is not None else ev
    gate = F.col("commit_ts") <= F.lit(resolved if resolved is not None else -1)
    # pending written BEFORE the manifest that references it (crash-safe:
    # orphans are vacuumed); drop op_order — it is recomputed on re-entry
    pending_rel = table.write_pending(full.filter(~gate).drop("op_order"), batch_id)

    net = lww_latest(full.filter(gate)).withColumn("bucket", table._bucket_col()).persist()
    net.count()
    affected = [int(r["bucket"]) for r in net.select("bucket").distinct().collect()]
    try:
        decode = decode_payload_pandas if decoder == "pandas" else decode_payload
        stats = table.merge(
            decode(net, registry), batch_id, resolved_ts=resolved,
            lineage_rows=lineage_rows, pre_reduced=True, affected_buckets=affected,
            manifest_extra={"pending": pending_rel},
        )
    finally:
        net.unpersist()
    return EpochResult(stats=stats, resolved_ts=resolved)
