"""Structured Streaming changefeed runner — the capture/owner/processor loop.

Reference: the owner ticks per-changefeed, advancing a persisted checkpoint
(/root/reference/cdc/owner/changefeed.go:269-313, etcd-persisted); processors
pull/sort/mount/sink assigned spans (/root/reference/cdc/processor/
processor.go:497). Spark rebuild: ONE streaming query —

    spark.readStream (file source over the change-event log;
                      maxFilesPerTrigger = backpressure quota analog,
                      /root/reference/pkg/config/server_config.go:48)
      .foreachBatch(apply_epoch)        # plans/pipeline.py
      .option("checkpointLocation", …)  # source-offset checkpoint (etcd analog)
      .trigger(AvailableNow | processingTime)

Exactly-once = SS offset tracking (each file delivered to exactly one
batch_id, batches replayed with the SAME id after crash) + CowTable's
batch_id fence + version-conditional MERGE idempotence. Restart-from-
checkpoint therefore re-delivers the in-flight epoch and the fence/merge
absorbs it — the redo-log-free recovery argued in SURVEY.md §2.6.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from tiflow_spark.plans.pipeline import apply_epoch
from tiflow_spark.sinks.cow_table import CowTable
from tiflow_spark.sources.registry import SchemaVersion

CHANGE_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType()),
        T.StructField("commit_ts", T.LongType()),
        T.StructField("start_ts", T.LongType()),
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("schema_version", T.LongType()),
        T.StructField("payload", T.StringType()),
        T.StructField("pre_payload", T.StringType()),
        T.StructField("source_partition", T.IntegerType()),
    ]
)


@dataclass
class Changefeed:
    """One replication job: change-event log dir → CowTable.

    Schema evolution: pass ``registry_path`` instead of a static ``registry``
    and the feed reloads the registry at every epoch boundary — the DDL
    puller/barrier analog (/root/reference/cdc/puller/ddl_puller.go:60-302,
    /root/reference/cdc/owner/barrier.go:22-47): a DDL lands as a registry
    append (sources/registry.py add_version) between epochs; the next epoch
    decodes with the new version.
    """

    spark: SparkSession
    events_dir: str
    table: CowTable
    registry: list[SchemaVersion] | None
    checkpoint_dir: str
    max_files_per_trigger: int = 4
    decoder: str = "jvm"
    registry_path: str | None = None
    batch_log: list = field(default_factory=list)  # (batch_id, MergeStats)

    def _current_registry(self) -> list[SchemaVersion]:
        if self.registry_path is not None:
            from tiflow_spark.sources.registry import load_registry

            return load_registry(self.spark, self.registry_path)
        assert self.registry is not None
        return self.registry

    def _process_batch(self, batch: DataFrame, batch_id: int) -> None:
        batch = batch.persist()
        try:
            res = apply_epoch(
                self.table,
                self._current_registry(),
                batch,
                int(batch_id),
                decoder=self.decoder,
            )
            self.batch_log.append((int(batch_id), res.stats))
        finally:
            batch.unpersist()

    def synced(self, lag_threshold: int = 0) -> bool:
        """`synced` status check analog (/root/reference/cdc/owner/
        changefeed.go:972): the feed is synced iff the applied resolved-ts
        is within ``lag_threshold`` of the newest commit_ts present in the
        source log (puller resolved-ts vs checkpoint-ts lag)."""
        import glob as _glob

        applied = self.table.current_manifest().get("resolved_ts")
        if applied is None:
            return False
        paths = _glob.glob(self.events_dir) or [self.events_dir]
        source_max = (
            self.spark.read.schema(CHANGE_EVENT_SCHEMA)
            .parquet(*paths)
            .agg({"commit_ts": "max"})
            .first()[0]
        )
        if source_max is None:
            return True
        return applied >= source_max - lag_threshold

    def run_available_now(self, timeout_sec: int = 600) -> None:
        """Drain everything currently in the log, then stop (the batch-replay
        mode; Trigger.AvailableNow still honors maxFilesPerTrigger per
        microbatch, so epochs stay bounded)."""
        stream = (
            self.spark.readStream.schema(CHANGE_EVENT_SCHEMA)
            .option("maxFilesPerTrigger", self.max_files_per_trigger)
            .parquet(self.events_dir)
        )
        q = (
            stream.writeStream.foreachBatch(self._process_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_sec)
        if q.isActive:
            q.stop()
            raise TimeoutError("changefeed did not drain within timeout")
        if q.exception() is not None:
            raise q.exception()
