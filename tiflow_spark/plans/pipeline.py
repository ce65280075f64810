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
    version_gate: int | None = None,
    manifest_extra: dict | None = None,
    frontier_mode: str = "scan",
    frontier_observe_partitions: int = 64,
    capture_net: bool = False,
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
    transiently exposing above-watermark rows (documented deviation).

    ``version_gate`` is the sharding-DDL pessimistic barrier (reference
    /root/reference/dm/pkg/shardddl/pessimism/lock.go): events whose
    schema_version exceeds it are withheld to the pending store until every
    routed shard has executed the DDL — the streaming runner computes the
    gate as min over shards of each shard's delivered schema_version.
    ``manifest_extra`` rides the epoch's atomic manifest commit (the runner
    persists shard frontiers there, restart-safe).

    ``capture_net=True`` persists the epoch's decoded net rows under the
    table's ``_validator/net/`` and references them in the manifest — the
    continuous validator's forward feed (reference dm/syncer/
    data_validator.go validates rows AS replicated): validation then diffs
    these captured rows against the table read-back, never rescanning the
    source log. The capture file doubles as the merge input (written once,
    read back), so enabling it adds one O(net) write per epoch, not a
    second decode."""
    # the sink pipeline never reads the old-value image (pre-image consumers
    # — old-image filters, key-change splitting — run upstream); carrying
    # pre_payload through the LWW shuffle costs real bytes (measured: the
    # reduce runs 38% faster without it at 59.8M events)
    if "pre_payload" in batch.columns:
        batch = batch.drop("pre_payload")
    ev = with_op_order(batch)

    if strict_frontier or version_gate is not None:
        return _apply_epoch_fenced(
            table, registry, ev, batch_id, decoder,
            strict_frontier=strict_frontier, version_gate=version_gate,
            manifest_extra=manifest_extra, capture_net=capture_net,
        )

    # a non-strict epoch on a table holding a pending store (a strict feed
    # restarted with strict_frontier=False) drains it: the withheld events
    # re-enter this epoch's LWW and the reference is cleared in the same
    # manifest commit (otherwise merge carries it forward untouched)
    manifest_extra = dict(manifest_extra or {})
    prev_pending = table.read_pending()

    # frontier + lineage: two modes —
    # - "scan" (default, and measured-fastest at every scale tried): a
    #   SEPARATE tiny job whose scan projects only (source_partition,
    #   commit_ts); parquet column pruning makes it ~1% of the main job.
    #   Round 1: the observation variant at 59.8M events added 5.9s to a
    #   9.3s job vs 0.69s for the pruned scan. Round 4 re-measured at
    #   streaming cadence hoping the one-job saving would win there:
    #   still no — 33x8k-event epochs, scan 1.6-2.1s/epoch vs observe
    #   2.4s/epoch; 5x300k-event epochs, 89.7k vs 85.5k ev/s. The 64x2
    #   conditional aggregates evaluated per input row cost more than one
    #   extra column-pruned job at every epoch size on local[32].
    # - "observe": the aggregates ride the LWW job itself (zero extra
    #   job) — the reference's inline resolved-ts shape
    #   (multiplexing_puller.go:440-480). Kept as an option (correct,
    #   oracle-tested) for deployments where job-scheduling latency
    #   dominates (e.g. high-latency cluster managers), but the default
    #   stays "scan" per the measurements above.
    fetch = None
    frontier_fut = None
    if frontier_mode == "observe":
        from tiflow_spark.operators.frontier import observe_frontiers

        ev, fetch = observe_frontiers(ev, max_partitions=frontier_observe_partitions)
        lineage_rows = None
        resolved = None
    else:
        # overlap the (column-pruned, ~1%-sized) frontier job with the LWW
        # job below (guide §2.6): both only READ the batch, the scheduler
        # back-fills the frontier tasks into the LWW stage's tail, and the
        # result is joined before the merge commit needs it. Measured
        # ~0.3s/epoch hidden at 300k-event epochs.
        from concurrent.futures import ThreadPoolExecutor

        _frontier_pool = ThreadPoolExecutor(max_workers=1)
        frontier_fut = _frontier_pool.submit(
            lambda: partition_frontiers(batch).collect()
        )
        _frontier_pool.shutdown(wait=False)
        lineage_rows = None
        resolved = None

    if prev_pending is not None:
        # pending events were lineage-counted by the epoch that withheld
        # them — fold them into the LWW only, and clear the reference.
        # (observe mode: the observer wraps only the NEW events, so pending
        # rows are correctly excluded from this epoch's lineage counts.
        # An EMPTY microbatch still drains: the withheld rows merge with
        # zero new lineage rather than sitting in the store forever.)
        dp = prev_pending.drop(
            *[c for c in ("pre_payload", "op_order") if c in prev_pending.columns]
        )
        ev = ev.unionByName(with_op_order(dp), allowMissingColumns=True)
        manifest_extra["pending"] = None

    # persist the reduced rows BEFORE decoding: projecting from_json onto
    # the aggregate output folds the decode into the aggregate's result
    # expressions (measured ~75x slower); the cache is a plan barrier and
    # the net rows (one per live key) are the smallest point in the pipeline
    net = lww_latest(ev).withColumn("bucket", table._bucket_col()).persist()
    # ONE action materializes the cache (whole partitions, a plan barrier —
    # decoding after the aggregate would otherwise fold from_json into its
    # result expressions, measured ~75x slower) AND yields the affected
    # buckets; a separate count() first was a second full job per epoch
    affected = [int(r["bucket"]) for r in net.select("bucket").distinct().collect()]
    if frontier_fut is not None:
        lineage_rows = [
            (batch_id, int(r["source_partition"]), int(r["resolved_ts"]), int(r["n_events"]))
            for r in frontier_fut.result()
        ]
        resolved = min((r[2] for r in lineage_rows), default=None)
    if fetch is not None:
        # observation metrics are valid once the action above ran
        lineage_rows = [(batch_id, p, rts, n) for (p, rts, n) in fetch()]
        resolved = min((r[2] for r in lineage_rows), default=None)
        if not lineage_rows and affected and prev_pending is None:
            # invariant: a non-empty reduce with no observed lineage means
            # the metrics were lost, not that the batch was empty — fail
            # loudly rather than commit a merge with a zeroed watermark.
            # Exception: when a pending store was drained, the reduce is
            # legitimately non-empty on an empty new batch (the observation
            # wraps only new events), so empty lineage is correct there.
            net.unpersist()
            raise RuntimeError(
                "observe-mode frontier returned no metrics for a non-empty "
                "batch — observation was optimized out; use frontier_mode="
                "'scan' for this feed"
            )

    try:
        decode = decode_payload_pandas if decoder == "pandas" else decode_payload
        dec = decode(net, registry)
        if capture_net:
            dec, manifest_extra = _capture_net(table, dec, batch_id, manifest_extra)

        stats = table.merge(
            dec, batch_id, resolved_ts=resolved, lineage_rows=lineage_rows,
            pre_reduced=True, affected_buckets=affected,
            manifest_extra=manifest_extra,
        )
    finally:
        net.unpersist()
    return EpochResult(stats=stats, resolved_ts=resolved)


def _capture_net(
    table: CowTable, dec: DataFrame, batch_id: int, manifest_extra: dict | None
) -> tuple[DataFrame, dict]:
    """Persist the epoch's decoded net rows for the continuous validator and
    return (read-back frame, manifest_extra referencing it).

    Crash-safety: the file is named by the manifest seq it will commit
    under — a retry of an UNcommitted epoch overwrites the same path with
    identical content, while a redelivery of an already-committed epoch
    (merge fence skips it) writes a DIFFERENT, never-referenced path that
    vacuum removes; the committed capture is never clobbered. The raw
    ``payload`` string is dropped (the decoded columns carry the data)."""
    m = table.current_manifest()
    rel = f"_validator/net/s{int(m['seq']) + 1}_b{batch_id}"
    out = dec.drop(*[c for c in ("payload", "pre_payload") if c in dec.columns])
    out.write.mode("overwrite").parquet(f"{table.root}/{rel}")
    extra = dict(manifest_extra or {})
    extra["validator_nets"] = list(m.get("validator_nets") or []) + [rel]
    return table.spark.read.parquet(f"{table.root}/{rel}"), extra


def _apply_epoch_fenced(
    table: CowTable,
    registry: list[SchemaVersion],
    ev: DataFrame,
    batch_id: int,
    decoder: str,
    strict_frontier: bool = True,
    version_gate: int | None = None,
    manifest_extra: dict | None = None,
    capture_net: bool = False,
) -> EpochResult:
    """Fenced epoch: split (new events ∪ previous pending) at the active
    gates; apply the ready half, persist the rest as the next pending
    generation, commit both references in one atomic manifest swap.

    Gates compose:
    - strict_frontier: commit_ts must be at or below the NEW global
      watermark (reference engine.go:103-113 commit fence);
    - version_gate: schema_version must be at or below the sharding-DDL
      barrier (reference dm/pkg/shardddl/pessimism — post-DDL shard rows
      wait until every shard executed the DDL).

    Pending holds at most one gate-lag of events (bounded by the source
    contract for the frontier gate, and by one DDL's worth of shard skew
    for the version gate); it is rewritten whole each epoch and old
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
    full = (
        ev.unionByName(with_op_order(prev_pending), allowMissingColumns=True)
        if prev_pending is not None
        else ev
    )
    gate = F.lit(True)
    if strict_frontier:
        gate = gate & (F.col("commit_ts") <= F.lit(resolved if resolved is not None else -1))
    if version_gate is not None:
        gate = gate & (
            F.col("schema_version").isNull()
            | (F.col("schema_version") <= F.lit(version_gate))
        )
    # pending written BEFORE the manifest that references it (crash-safe:
    # orphans are vacuumed); drop op_order — it is recomputed on re-entry
    pending_rel = table.write_pending(full.filter(~gate).drop("op_order"), batch_id)

    net = lww_latest(full.filter(gate)).withColumn("bucket", table._bucket_col()).persist()
    # one materializing action (see apply_epoch)
    affected = [int(r["bucket"]) for r in net.select("bucket").distinct().collect()]
    try:
        decode = decode_payload_pandas if decoder == "pandas" else decode_payload
        dec = decode(net, registry)
        extra = {**(manifest_extra or {}), "pending": pending_rel}
        if capture_net:
            dec, extra = _capture_net(table, dec, batch_id, extra)
        stats = table.merge(
            dec, batch_id, resolved_ts=resolved,
            lineage_rows=lineage_rows, pre_reduced=True, affected_buckets=affected,
            manifest_extra=extra,
        )
    finally:
        net.unpersist()
    return EpochResult(stats=stats, resolved_ts=resolved)
