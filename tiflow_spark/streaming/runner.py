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

DDL events travel IN the change stream (op='DDL', payload = the new schema's
JSON) — the DDL puller decodes DDL jobs from the same log
(/root/reference/cdc/puller/ddl_puller.go:190-302) and the barrier holds the
checkpoint until the DDL is applied (/root/reference/cdc/owner/
barrier.go:22-47). Here the barrier is the epoch itself: each microbatch
first registers its DDLs (registry append), then decodes/merges its DMLs —
post-DDL rows in the same or later epochs decode with the new version. A
DML whose schema_version is not yet registered fails loudly (the reference
equivalently blocks until schema resolved-ts catches up,
schema_storage.go:152-178) rather than silently NULLing its payload.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
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

# Multi-table feeds carry a routing column (event_router.go:91-132 analog).
CHANGE_EVENT_SCHEMA_MULTI = T.StructType(
    CHANGE_EVENT_SCHEMA.fields + [T.StructField("table_name", T.StringType())]
)


@dataclass
class Changefeed:
    """One replication job: change-event log dir → CowTable(s).

    Schema evolution, three mechanisms (all barrier-at-epoch-boundary):
    - static ``registry``;
    - ``registry_path``: reload the persisted registry every epoch — an
      out-of-band DDL lands as a registry append between epochs;
    - ``ddl_in_stream=True``: op='DDL' rows in the log itself carry the new
      schema JSON; each epoch registers them before decoding its DMLs (the
      in-band DDL puller + barrier analog — the normal CDC case).

    Multi-table: pass ``tables={name: (CowTable, registry)}`` and events
    carrying a ``table_name`` column; rows route to their table's pipeline
    (per-table sinks/progress, reference event_router.go:91-132).
    """

    spark: SparkSession
    events_dir: str
    checkpoint_dir: str
    table: CowTable | None = None
    registry: list[SchemaVersion] | None = None
    max_files_per_trigger: int = 4
    decoder: str = "jvm"
    registry_path: str | None = None
    ddl_in_stream: bool = False
    # commit-fence mode: withhold events above the global resolved-ts to the
    # table's pending store (reference engine.go:103-113); see apply_epoch
    strict_frontier: bool = False
    # replication start point (changefeed create --start-ts; reference
    # cli_changefeed_create / resumeChangefeed with checkpoint ts): events
    # below it are skipped at the source — starting mid-log replicates only
    # history from that ts on, exactly the reference semantic
    start_ts: int | None = None
    tables: dict[str, tuple[CowTable, list[SchemaVersion]]] | None = None
    table_col: str = "table_name"
    # DM shard-merge routing: applied to table_name before table dispatch
    route_rules: tuple | None = None
    # sharding-DDL coordination for route_rules-merged targets:
    # True = PESSIMISTIC (dm/pkg/shardddl/pessimism/lock.go): rows whose
    # schema_version exceeds min-over-shards(delivered version) are withheld
    # to the target's pending store until every shard executed the DDL;
    # per-shard version frontiers persist in the target's manifest.
    # False = OPTIMISTIC (dm/pkg/shardddl/optimism): no gate — every row
    # decodes against its own schema_version and the sink schema evolves to
    # the registered union immediately, so lagging shards' old-schema rows
    # coexist with leading shards' new-schema rows (DM's compatible-
    # superset merge is exactly the mounter's per-version decode + NULL
    # backfill here).
    shard_ddl_barrier: bool = True
    _shard_vers: dict = field(default_factory=dict)  # target -> {shard: ver}
    # online-DDL tool (gh-ost/pt-osc) handling: drop trash-table events and
    # ghost-table DMLs, route ghost-table DDLs to the real table (see
    # operators/filters.apply_online_ddl). Multi-table feeds only.
    online_ddl: bool = False
    event_schema: T.StructType | None = None
    # continuous data validation (reference dm/syncer/data_validator.go:
    # validate rows DURING replication, not just post-hoc): every N
    # committed batches, chunk-diff the settled region (commit_ts <= global
    # resolved watermark) of the buckets changed since the last validation
    # against the source log's expected state; findings are recorded in the
    # table manifest (atomic, restart-visible) and validation_log.
    # 0 = off (use verify_changefeed for a full post-hoc check).
    validate_every: int = 0
    validation_log: list = field(default_factory=list)  # (seq, dict)
    _batches_since_validation: int = 0
    # frontier/lineage job mode (plans/pipeline.apply_epoch): "scan" (a
    # separate column-pruned job — measured fastest at replay AND
    # streaming cadence on local[32]) or "observe" (aggregates ride the
    # LWW job — one fewer Spark job per epoch; an option for deployments
    # where job-scheduling latency dominates, see pipeline.py measurements)
    frontier_mode: str = "scan"
    batch_log: list = field(default_factory=list)  # (batch_id, [name,] MergeStats)

    def __post_init__(self) -> None:
        if self.tables is not None and self.validate_every:
            # the continuous validator is per-table (it derives expected
            # state from the single-table event shape); silently ignoring
            # the knob would fake a safety net that isn't running
            raise ValueError(
                "validate_every is single-table only — run validate_now() "
                "per table or use operators.validate.verify_changefeed"
            )
        if self.tables is not None and self.registry_path is not None:
            # one persisted registry shared by N tables would interleave
            # every table's DDL versions into every other table's registry
            # (_apply_ddls appends per-table into the single path) — each
            # table owns its registry in `tables={name: (table, registry)}`
            raise ValueError(
                "tables= cannot be combined with a single registry_path — "
                "pass each table's registry in the tables mapping instead"
            )

    def _current_registry(self) -> list[SchemaVersion]:
        if self.registry_path is not None:
            from tiflow_spark.sources.registry import load_registry

            return load_registry(self.spark, self.registry_path)
        assert self.registry is not None
        return self.registry

    def _apply_ddls(
        self, batch: DataFrame, registry: list[SchemaVersion]
    ) -> tuple[list[SchemaVersion], DataFrame]:
        """Register in-stream DDLs (ts order, redelivery-safe), verify every
        DML schema_version is decodable, return (registry, DML-only batch).
        One aggregate job over the (persisted) batch collects both."""
        meta = batch.agg(
            F.collect_set(
                F.when(
                    F.col("op") == "DDL",
                    F.struct("commit_ts", "schema_version", "payload"),
                )
            ).alias("ddls"),
            F.collect_set("schema_version").alias("versions"),
        ).first()
        known = {v.schema_version for v in registry}
        for r in sorted(meta["ddls"], key=lambda r: (r["commit_ts"], r["schema_version"])):
            ver = int(r["schema_version"])
            if ver in known:
                continue  # at-least-once redelivery of the DDL event
            parsed = json.loads(r["payload"])
            if "schema" in parsed and "type" not in parsed:
                # extended DDL payload: {"schema": <struct json>,
                # "renames": [[new, old], ...]} — RENAME COLUMN carries the
                # mapping so renamed columns keep pre-DDL rows' data
                sch = T.StructType.fromJson(parsed["schema"])
                renames = tuple(tuple(p) for p in parsed.get("renames", []))
            else:
                sch = T.StructType.fromJson(parsed)
                renames = ()
            new = SchemaVersion(ver, int(r["commit_ts"]) + 1, sch, renames=renames)
            if self.registry_path is not None:
                from tiflow_spark.sources.registry import add_version

                registry = add_version(self.spark, self.registry_path, new)
            else:
                registry = sorted(registry + [new], key=lambda v: v.schema_version)
            known.add(ver)
        missing = {int(v) for v in meta["versions"] if v is not None} - known
        if missing:
            raise ValueError(
                f"batch carries schema_version(s) {sorted(missing)} with no "
                "registered schema and no in-batch DDL — the DDL event must "
                "arrive in the log no later than the first row of its version "
                "(reference blocks on schema resolved-ts, schema_storage.go:152)"
            )
        return registry, batch.filter(F.col("op") != "DDL")

    def _evolve_sink_schema(
        self, table: CowTable, registry: list[SchemaVersion]
    ) -> None:
        """Sink-side DDL execution (ddl_manager.go:508-583 + the MySQL DDL
        sink analog): when the registry is the feed's source of schema truth
        (in-stream DDLs or a reloaded registry_path), the sink's column set
        follows the post-barrier registry — an added column lands in the
        very epoch its DDL arrived, a dropped one leaves the snapshot.
        Static-registry feeds keep the constructed data_schema (the caller
        owns it: projection sinks stay possible, and merge fails loudly on
        a mismatch instead of dropping data)."""
        if not (self.ddl_in_stream or self.registry_path is not None):
            return
        from tiflow_spark.sinks.cow_table import data_schema_from_registry
        from tiflow_spark.sources.registry import field_source_name, latest_schema

        new_schema = data_schema_from_registry(registry)
        if new_schema != table.data_schema:
            table.data_schema = new_schema
        # rename history (newest-first older names per current column) so
        # the sink can read bucket files written before a RENAME without
        # rewriting them (cow_table._with_all_data_cols)
        ordered = sorted(registry, key=lambda v: -v.schema_version)
        hist: dict[str, list[str]] = {}
        for f in latest_schema(registry).fields:
            names: list[str] = []
            for v in ordered:
                src = field_source_name(registry, f.name, v)
                if src and src != f.name and src not in names:
                    names.append(src)
            if names:
                hist[f.name] = names
        if hist != table.column_history:
            table.column_history = hist

    def _shard_barrier(
        self, name: str, tbl: CowTable, shard_maxima: list | None
    ) -> tuple[int | None, dict | None]:
        """Advance this target's per-shard schema_version frontiers with the
        current batch and return (version_gate, manifest_extra). The gate —
        min over shards of the highest version each shard has delivered —
        is the pessimistic shard-DDL lock's effect: a post-DDL row waits
        until the slowest shard has executed the same DDL. None until a
        second shard appears (a single-shard target needs no coordination).
        Frontiers are carried in the target's manifest (restart-safe) and
        only ever advance."""
        if shard_maxima is None:
            return None, None
        if name not in self._shard_vers:
            self._shard_vers[name] = {
                k: int(v)
                for k, v in tbl.current_manifest().get("shard_vers", {}).items()
            }
        state = self._shard_vers[name]
        for r in shard_maxima:
            if r[self.table_col] == name and r["v"] is not None:
                shard = str(r["__shard"])
                state[shard] = max(state.get(shard, 0), int(r["v"]))
        gate = min(state.values()) if len(state) > 1 else None
        return gate, {"shard_vers": dict(state)}

    def _process_batch(self, batch: DataFrame, batch_id: int) -> None:
        batch = batch.persist()
        try:
            if self.tables is None:
                registry = self._current_registry()
                if self.ddl_in_stream:
                    registry, batch_dml = self._apply_ddls(batch, registry)
                    if self.registry_path is None:
                        self.registry = registry
                else:
                    batch_dml = batch
                self._evolve_sink_schema(self.table, registry)
                res = apply_epoch(
                    self.table, registry, batch_dml, int(batch_id),
                    decoder=self.decoder, strict_frontier=self.strict_frontier,
                    frontier_mode=self.frontier_mode,
                )
                self.batch_log.append((int(batch_id), res.stats))
                if self.validate_every > 0 and not res.stats.skipped:
                    self._batches_since_validation += 1
                    if self._batches_since_validation >= self.validate_every:
                        self._batches_since_validation = 0
                        self.validate_now()
            else:
                if self.online_ddl:
                    from tiflow_spark.operators.filters import apply_online_ddl

                    batch = apply_online_ddl(batch, table_col=self.table_col)
                shard_maxima = None
                if self.route_rules:
                    from tiflow_spark.operators.filters import route_tables

                    # remember the pre-route (shard) name — the sharding-DDL
                    # barrier tracks each shard's delivered schema_version
                    batch = batch.withColumn("__shard", F.col(self.table_col))
                    batch = route_tables(batch, self.route_rules, self.table_col)
                    if self.shard_ddl_barrier:
                        # one tiny agg over the persisted batch: per (target,
                        # shard) max delivered version (DDL rows included —
                        # a shard "executes" the DDL when its event arrives)
                        shard_maxima = (
                            batch.groupBy(self.table_col, "__shard")
                            .agg(F.max("schema_version").alias("v"))
                            .collect()
                        )
                for name in sorted(self.tables):
                    tbl, reg = self.tables[name]
                    sub = batch.filter(F.col(self.table_col) == name)
                    if self.ddl_in_stream:
                        # per-table DDL barrier: register this table's DDLs
                        # against ITS registry, then drop the DDL rows so
                        # they never reach the LWW as null-key rows
                        reg, sub = self._apply_ddls(sub, reg)
                        self.tables[name] = (tbl, reg)
                    self._evolve_sink_schema(tbl, reg)
                    version_gate, extra = self._shard_barrier(name, tbl, shard_maxima)
                    res = apply_epoch(
                        tbl, reg, sub, int(batch_id), decoder=self.decoder,
                        strict_frontier=self.strict_frontier,
                        version_gate=version_gate, manifest_extra=extra,
                    )
                    self.batch_log.append((int(batch_id), name, res.stats))
        finally:
            batch.unpersist()

    def metrics(self, table_name: str | None = None) -> DataFrame:
        """Per-epoch changefeed metrics — the reference's per-changefeed
        Grafana counters (applied event counts, resolved-ts, checkpoint
        lag) as a DataFrame, derived from the table's manifest-committed
        lineage plus the in-memory batch log. Multi-table feeds pass
        ``table_name`` to select the target."""
        from pyspark.sql.window import Window

        if table_name is not None:
            assert self.tables is not None and table_name in self.tables, table_name
            table = self.tables[table_name][0]
        else:
            assert self.table is not None, (
                "multi-table feed: pass metrics(table_name=...)"
            )
            table = self.table
        lineage = table.lineage().groupBy("batch_id").agg(
            F.sum("applied_events").alias("applied_events"),
            F.count(F.lit(1)).alias("n_source_partitions"),
        )
        # resolved_ts from the manifest history: the carried-forward GLOBAL
        # watermark (monotone), not the per-batch partition minimum
        epochs = table.epochs().groupBy("batch_id").agg(
            F.max("committed_at").alias("committed_at"),
            F.max("resolved_ts").alias("resolved_ts"),
        )
        return (
            lineage.join(epochs, "batch_id", "left")
            .withColumn(
                "commit_interval_sec",
                F.col("committed_at")
                - F.lag("committed_at").over(Window.orderBy("batch_id")),
            )
            .orderBy("batch_id")
        )

    def validate_now(self, n_chunks: int = 16) -> dict:
        """One continuous-validation epoch (reference dm/syncer/
        data_validator.go:1-120 — validate rows *during* replication with
        failed-row tracking, vs the post-hoc verify_changefeed): chunk-diff
        the SETTLED region (winning commit_ts <= the global resolved
        watermark — rows above it are still in flight, exactly the rows the
        reference validator holds as pending/retry) of the buckets changed
        since the last validation against the expected state derived from
        the source log. Cost ∝ changed buckets on the table side; the
        source-log scan is key-restricted to those buckets before the LWW
        aggregate. Findings commit to the table manifest (atomic,
        restart-visible) and append to ``validation_log``."""
        import glob as _glob

        from tiflow_spark.functions.decode import decode_payload
        from tiflow_spark.operators.lww import lww_latest, with_op_order
        from tiflow_spark.operators.validate import diff_tables

        assert self.table is not None, "validate_now() is per-table"
        table = self.table
        m = table.current_manifest()
        cur = int(m["seq"])
        resolved = m.get("resolved_ts")
        if resolved is None or cur < 0:
            return {"skipped": True, "reason": "no committed watermark yet"}
        since = m.get("validated_seq")
        try:
            changed = (
                table.changed_buckets(int(since), cur) if since is not None else None
            )
        except FileNotFoundError:
            # the baseline manifest was folded into _history.json by vacuum
            # since the last validation — fall back to a full validation
            changed = None
        if changed == []:
            return {"ok": True, "buckets": [], "validated_at_seq": cur}
        bucket_col = table._bucket_col()

        paths = _glob.glob(self.events_dir) or [self.events_dir]
        events = self.spark.read.schema(self._schema()).parquet(*paths)
        if self.start_ts is not None:
            events = events.filter(F.col("commit_ts") >= self.start_ts)
        events = events.filter(
            (F.col("op") != "DDL") & (F.col("commit_ts") <= resolved)
        )
        if changed is not None:
            events = events.filter(bucket_col.isin([int(b) for b in changed]))
        registry = self._current_registry()
        dec = decode_payload(
            lww_latest(with_op_order(events), table.key_cols), registry
        ).filter(F.col("op") != "D")
        # sink columns the registry doesn't decode (e.g. a projection sink
        # wider than the payload schema) backfill NULL, mirroring the
        # sink's own _with_all_data_cols rule
        expected = dec.select(
            *table.key_cols,
            *[
                F.col(c) if c in dec.columns
                else F.lit(None).cast(table.data_schema[c]).alias(c)
                for c in table.data_cols
            ],
        )
        snap = table.snapshot(include_tombstones=True, buckets=changed)
        actual = snap.filter(
            (F.col("__commit_ts") <= resolved) & ~F.col("__deleted")
        ).select(*table.key_cols, *table.data_cols)
        # keys whose applied winner is above the watermark are in flight
        # (non-strict feeds apply them eagerly) — skip them on both sides
        # until the watermark passes them
        inflight = snap.filter(F.col("__commit_ts") > resolved).select(
            *table.key_cols
        )
        expected = expected.join(inflight, on=list(table.key_cols), how="left_anti")

        result = diff_tables(
            expected, actual, key_cols=list(table.key_cols),
            compare_cols=list(table.data_cols), n_chunks=n_chunks,
        )
        record = {
            "validated_at_seq": cur,
            "since_seq": int(since) if since is not None else -1,
            "buckets": changed,
            "resolved_ts": int(resolved),
            "n_chunks": result.n_chunks,
            "mismatched_chunks": result.mismatched_chunks,
            "row_diffs": result.row_diffs,
            "ok": result.identical,
        }
        table._commit_manifest(
            {
                **m,
                "seq": cur + 1,
                "validation": record,
                "validated_seq": cur + 1,
                "committed_at": time.time(),
                "lineage": [],
            }
        )
        self.validation_log.append((cur, record))
        return record

    def synced(self, lag_threshold: int = 0) -> bool:
        """`synced` status check analog (/root/reference/cdc/owner/
        changefeed.go:972): the feed is synced iff the applied resolved-ts
        is within ``lag_threshold`` of the newest commit_ts present in the
        source log (puller resolved-ts vs checkpoint-ts lag)."""
        import glob as _glob

        assert self.table is not None, "synced() is per-table; use tables[name]"
        applied = self.table.current_manifest().get("resolved_ts")
        if applied is None:
            return False
        paths = _glob.glob(self.events_dir) or [self.events_dir]
        source_max = (
            self.spark.read.schema(self._schema())
            .parquet(*paths)
            .agg({"commit_ts": "max"})
            .first()[0]
        )
        if source_max is None:
            return True
        return applied >= source_max - lag_threshold

    def _schema(self) -> T.StructType:
        if self.event_schema is not None:
            return self.event_schema
        return CHANGE_EVENT_SCHEMA_MULTI if self.tables is not None else CHANGE_EVENT_SCHEMA

    def _stream(self):
        s = (
            self.spark.readStream.schema(self._schema())
            .option("maxFilesPerTrigger", self.max_files_per_trigger)
            .parquet(self.events_dir)
        )
        if self.start_ts is not None:
            s = s.filter(
                (F.col("commit_ts") >= self.start_ts) | (F.col("op") == "DDL")
            )
        return s

    def run_available_now(self, timeout_sec: int = 600) -> None:
        """Drain everything currently in the log, then stop (the batch-replay
        mode; Trigger.AvailableNow still honors maxFilesPerTrigger per
        microbatch, so epochs stay bounded)."""
        q = (
            self._stream()
            .writeStream.foreachBatch(self._process_batch)
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

    def run_mq(
        self,
        mq_dir: str,
        n_partitions: int = 16,
        dispatch: str = "index-value",
        timeout_sec: int = 600,
        bootstrap_interval: int = 0,
    ) -> None:
        """Changefeed to an MQ sink instead of a table: each microbatch's
        events are decoded, canal-JSON-encoded with partition routing, and
        written to ``{mq_dir}/batch=<id>`` — overwrite per batch id, so a
        replayed epoch rewrites its own directory (idempotent, the MQ
        analog of the table's batch fence). A consumer replays the encoded
        stream into a table (sinks/mq.canal_json_decode) — the reference's
        kafka-consumer verification loop. With a Kafka classpath, swap the
        file write for sinks/mq.write_mq_kafka.

        ``bootstrap_interval=N`` re-broadcasts the FULL current registry to
        every partition on every Nth epoch (and on epoch 0) — the "simple"
        protocol's periodic bootstrap (reference bootstraper.go:38-130), so
        a consumer joining at batch k>0 rebuilds the registry from at most
        N epochs of look-back (sinks/mq.mq_registry) instead of replaying
        from the beginning. The one-shot DDL broadcast alone can't serve a
        consumer whose retention window no longer holds the DDL's epoch."""
        from tiflow_spark.functions.decode import decode_payload
        from tiflow_spark.sinks.mq import encode_for_mq

        def emit(batch: DataFrame, batch_id: int) -> None:
            batch = batch.persist()
            try:
                registry = self._current_registry()
                if self.ddl_in_stream:
                    registry, batch_dml = self._apply_ddls(batch, registry)
                    if self.registry_path is None:
                        self.registry = registry
                else:
                    batch_dml = batch
                frame = encode_for_mq(
                    decode_payload(batch_dml, registry),
                    n_partitions=n_partitions,
                    dispatch=dispatch,
                )
                # watermark flush: this epoch's resolved-ts broadcast to
                # every partition (reference mq sink resolved-ts flush);
                # DDL rows broadcast likewise (MQ DDL sink) so consumers
                # keep schema lockstep
                from tiflow_spark.operators.frontier import partition_frontiers
                from tiflow_spark.sinks.mq import ddl_messages, resolved_messages

                fr = (
                    partition_frontiers(batch_dml)
                    .agg(F.min("resolved_ts"))
                    .first()[0]
                )
                if fr is not None:
                    frame = frame.unionByName(
                        resolved_messages(self.spark, int(fr), n_partitions)
                    )
                if self.ddl_in_stream:
                    frame = frame.unionByName(
                        ddl_messages(
                            batch.filter(F.col("op") == "DDL"), n_partitions
                        )
                    )
                if bootstrap_interval > 0 and batch_id % bootstrap_interval == 0:
                    from tiflow_spark.sinks.mq import bootstrap_messages

                    frame = frame.unionByName(
                        bootstrap_messages(self.spark, registry, n_partitions)
                    )
                frame.write.mode("overwrite").parquet(f"{mq_dir}/batch={batch_id}")
                self.batch_log.append((int(batch_id), "mq"))
            finally:
                batch.unpersist()

        q = (
            self._stream()
            .writeStream.foreachBatch(emit)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_sec)
        if q.isActive:
            q.stop()
            raise TimeoutError("mq changefeed did not drain within timeout")
        if q.exception() is not None:
            raise q.exception()

    def run_continuous(self, processing_time: str = "1 second"):
        """Long-lived changefeed — the reference's only mode: keep tailing
        the log at a microbatch cadence. Returns the StreamingQuery handle;
        the caller owns its lifetime (q.stop() = changefeed pause; restarting
        with the same checkpoint_dir = resume)."""
        return (
            self._stream()
            .writeStream.foreachBatch(self._process_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(processingTime=processing_time)
            .start()
        )
