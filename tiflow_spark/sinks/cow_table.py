"""Bucketed copy-on-write lake table with atomic manifest commits — the sink.

Reference mapping:
- MySQL txn sink's prepareDMLs/exec loop
  (/root/reference/cdc/sink/dmlsink/txn/mysql/mysql.go:507-708) collapses to
  ONE set-wise MERGE: per batch, per key, keep the newest of {target row,
  batch row} by (commit_ts, start_ts, op_order); a winning delete becomes a
  tombstone.
- Safe mode (/root/reference/dm/syncer/safe-mode/mode.go:28-63,
  mysql.go:515-539): unnecessary — the conditional-version MERGE is
  idempotent by construction; replayed epochs re-merge to the same state.
- Checkpoint/epoch fencing (/root/reference/cdc/owner/changefeed.go:295-313,
  progress_tracker.go:179-255): the manifest records the last committed
  batch_id; a re-delivered batch_id <= committed is skipped.
- Syncpoint / lineage (/root/reference/cdc/syncpointstore/
  mysql_syncpoint_store.go:155-227): per-epoch, per-source-partition applied
  counts + resolved_ts appended to a lineage table.

Why not Iceberg MERGE INTO: this sandbox has no Iceberg runtime jar. The
design is the same copy-on-write MERGE an Iceberg/Delta COW table performs —
hash-bucketed layout, read only affected buckets (partition pruning), rewrite
only affected buckets, commit by atomic metadata swap (tmp + rename of a
manifest JSON, exactly Iceberg's version-hint protocol). On a real cluster
the `merge()` body is replaced by one `MERGE INTO` statement (SURVEY.md
§2.6) with the identical plan shape; everything upstream is unchanged.

Scale notes (100 TB / 1000 executors):
- merge cost ∝ size of *affected* buckets, not table size; `n_buckets`
  is the pruning granularity (use 4096+ at scale; 32 locally).
- the per-key reduce is a partial-aggregating groupBy (map-side combine),
  so hot keys don't concentrate on one reducer (see operators/lww.py).
- out-of-order safety: merge keeps max-version, so events may be applied in
  ANY batch order; deletes persist as tombstones until `gc_tombstones`
  drops those older than the global resolved-ts (below which the source
  contract promises no more events — /root/reference/cdc/model/kv.go:58-66).

Single-writer assumption (same as one changefeed owner in the reference):
one streaming query commits at a time.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiflow_spark.operators.lww import lww_latest, with_op_order
from tiflow_spark.operators.frontier import partition_frontiers

KEY_COLS = ("conv_id", "turn_idx")
VERSION_COLS = ("__commit_ts", "__start_ts", "__op_order")

LINEAGE_SCHEMA = (
    "batch_id LONG, source_partition INT, resolved_ts LONG, applied_events LONG"
)


@dataclass
class MergeStats:
    batch_id: int
    skipped: bool
    applied_events: int = 0
    affected_buckets: int = 0
    resolved_ts: int | None = None


class CowTable:
    """A hash-bucketed copy-on-write parquet table supporting idempotent,
    fenced, LWW-conditional MERGE of change batches."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        n_buckets: int = 32,
        key_cols: tuple[str, ...] = KEY_COLS,
        data_cols: tuple[str, ...] = ("role", "text", "tool", "ts"),
    ) -> None:
        self.spark = spark
        self.root = root
        self.n_buckets = n_buckets
        self.key_cols = key_cols
        self.data_cols = data_cols
        # column types, for NULL backfill when a column is absent (schema
        # evolution: a pre-DDL batch/file lacks columns added later —
        # Iceberg add-column semantics, NULL for old data)
        self.data_types = {"role": "string", "text": "string", "tool": "string", "ts": "timestamp"}
        os.makedirs(f"{root}/_manifest", exist_ok=True)
        os.makedirs(f"{root}/_lineage", exist_ok=True)

    def _with_all_data_cols(self, df: DataFrame) -> DataFrame:
        missing = [c for c in self.data_cols if c not in df.columns]
        for c in missing:
            df = df.withColumn(c, F.lit(None).cast(self.data_types.get(c, "string")))
        return df

    # ---------------- manifest (atomic metadata) ----------------

    def _manifest_seqs(self) -> list[int]:
        return sorted(
            int(f.split(".")[0])
            for f in os.listdir(f"{self.root}/_manifest")
            if f.endswith(".json") and not f.startswith("_")
        )

    def current_manifest(self) -> dict[str, Any]:
        seqs = self._manifest_seqs()
        if not seqs:
            return {"seq": -1, "batch_id": -1, "resolved_ts": None, "buckets": {}}
        with open(f"{self.root}/_manifest/{seqs[-1]}.json") as f:
            return json.load(f)

    def _commit_manifest(self, manifest: dict[str, Any]) -> None:
        seq = manifest["seq"]
        tmp = f"{self.root}/_manifest/_tmp.{seq}.json"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        # atomic on POSIX; the Iceberg version-hint analog
        os.rename(tmp, f"{self.root}/_manifest/{seq}.json")

    def last_committed_batch(self) -> int:
        return int(self.current_manifest()["batch_id"])

    # ---------------- read paths ----------------

    def _bucket_col(self):
        return F.pmod(F.xxhash64(*self.key_cols), F.lit(self.n_buckets)).cast("int")

    def _read_buckets(self, manifest: dict[str, Any], buckets: list[int]) -> DataFrame | None:
        paths = [
            os.path.join(self.root, manifest["buckets"][str(b)])
            for b in buckets
            if str(b) in manifest["buckets"]
        ]
        paths = [p for p in paths if os.path.exists(p)]
        if not paths:
            return None
        # mergeSchema: bucket files written before a DDL lack later columns
        return self.spark.read.option("mergeSchema", "true").parquet(*paths)

    def snapshot(self, include_tombstones: bool = False) -> DataFrame:
        """Current table state. Public view: tombstones filtered, internal
        columns dropped."""
        manifest = self.current_manifest()
        df = self._read_buckets(manifest, [int(b) for b in manifest["buckets"]])
        if df is None:
            from pyspark.sql import types as T  # empty table

            fields = ", ".join(
                [f"{c} STRING" if c == "conv_id" else f"{c} INT" for c in self.key_cols]
            )
            schema = (
                f"{fields}, role STRING, text STRING, tool STRING, ts TIMESTAMP, "
                "__commit_ts LONG, __start_ts LONG, __op_order INT, __deleted BOOLEAN"
            )
            df = self.spark.createDataFrame([], schema)
        df = self._with_all_data_cols(df)
        if include_tombstones:
            return df
        return df.filter(~F.col("__deleted")).drop(*VERSION_COLS, "__deleted")

    # ---------------- MERGE ----------------

    def merge(
        self,
        batch: DataFrame,
        batch_id: int,
        resolved_ts: int | None = None,
        lineage_rows: list[tuple[int, int, int, int]] | None = None,
        pre_reduced: bool = False,
    ) -> MergeStats:
        """Apply one change batch exactly-once-in-effect.

        ``batch`` must carry: key cols, decoded data cols, op, commit_ts,
        start_ts, source_partition. It may be pre-reduced (one row per key);
        pass ``lineage_rows`` [(batch_id, source_partition, resolved_ts,
        n_raw_events)] computed on the raw stream in that case, else lineage
        is derived from ``batch`` itself. Equivalent Iceberg statement::

            MERGE INTO t USING net s
              ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
            WHEN MATCHED AND (s.commit_ts, s.start_ts, s.op_order) >
                             (t.commit_ts, t.start_ts, t.op_order)
                 THEN UPDATE SET *           -- deletes update to tombstone
            WHEN NOT MATCHED THEN INSERT *
        """
        manifest = self.current_manifest()
        if batch_id <= manifest["batch_id"]:
            # epoch fence (progress_tracker/changefeed checkpoint analog)
            return MergeStats(batch_id=batch_id, skipped=True)

        if lineage_rows is None:
            frontiers = partition_frontiers(batch).collect()
            lineage_rows = [
                (batch_id, int(r["source_partition"]), int(r["resolved_ts"]), int(r["n_events"]))
                for r in frontiers
            ]
        if not lineage_rows:
            self._commit_manifest({**manifest, "seq": manifest["seq"] + 1,
                                   "batch_id": batch_id, "committed_at": time.time()})
            return MergeStats(batch_id=batch_id, skipped=False, applied_events=0)
        n_events = int(sum(r[3] for r in lineage_rows))
        batch_resolved = (
            resolved_ts if resolved_ts is not None
            else int(min(r[2] for r in lineage_rows))
        )

        # net effect per key within the batch (sorter + compactor);
        # skipped when the pipeline already reduced to one row per key
        net = self._with_all_data_cols(with_op_order(batch))
        if not pre_reduced:
            net = lww_latest(net, self.key_cols)
        net = net.select(
            *self.key_cols,
            *self.data_cols,
            F.col("commit_ts").alias("__commit_ts"),
            F.col("start_ts").alias("__start_ts"),
            F.col("op_order").alias("__op_order"),
            (F.col("op") == "D").alias("__deleted"),
        ).withColumn("bucket", self._bucket_col())

        # the reduced batch is touched by three actions (bucket pruning,
        # write, and upstream decode) — cache it, it is one row per key
        net = net.persist()

        # prune: only buckets the batch touches are read & rewritten
        affected = [int(r["bucket"]) for r in net.select("bucket").distinct().collect()]
        existing = self._read_buckets(manifest, affected)
        if existing is not None:
            existing = self._with_all_data_cols(existing).withColumn(
                "bucket", self._bucket_col()
            )
            candidates = existing.unionByName(net)
            ver = F.struct(*[F.col(c) for c in VERSION_COLS])
            val_cols = [c for c in candidates.columns if c not in self.key_cols]
            winners = (
                candidates.groupBy(*self.key_cols)
                .agg(F.max_by(F.struct(*val_cols), ver).alias("_w"))
                .select(*self.key_cols, *[F.col(f"_w.{c}").alias(c) for c in val_cols])
            )
        else:
            # fresh buckets: nothing to reconcile against — the (already
            # per-key-unique) net rows ARE the winners; skips one
            # shuffle+reduce on first touch
            winners = net

        data_rel = f"data/b{batch_id}"
        out = f"{self.root}/{data_rel}"
        # repartition on bucket: each write task owns whole buckets → one
        # file per bucket instead of n_tasks x n_buckets small files
        (
            winners.repartition(min(len(affected), 200), "bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(out)
        )
        net.unpersist()

        new_buckets = dict(manifest["buckets"])
        for b in affected:
            bucket_dir = f"{data_rel}/bucket={b}"
            if os.path.exists(f"{self.root}/{bucket_dir}"):
                new_buckets[str(b)] = bucket_dir
        prev_resolved = manifest.get("resolved_ts")
        self._commit_manifest(
            {
                "seq": manifest["seq"] + 1,
                "batch_id": batch_id,
                # checkpoint-ts monotonicity (changefeed.go:295-313): a late
                # or replayed batch never regresses the table's watermark
                "resolved_ts": max(batch_resolved, prev_resolved)
                if prev_resolved is not None
                else batch_resolved,
                "buckets": new_buckets,
                "committed_at": time.time(),
                "applied_events": n_events,
            }
        )

        self.spark.createDataFrame(lineage_rows, LINEAGE_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(f"{self.root}/_lineage")

        return MergeStats(
            batch_id=batch_id,
            skipped=False,
            applied_events=n_events,
            affected_buckets=len(affected),
            resolved_ts=batch_resolved,
        )

    # ---------------- maintenance ----------------

    def lineage(self) -> DataFrame:
        try:
            return self.spark.read.parquet(f"{self.root}/_lineage")
        except Exception:
            return self.spark.createDataFrame([], LINEAGE_SCHEMA)

    def epochs(self) -> DataFrame:
        """The fencing/epochs table (FIXTURES.md §4) — manifest history."""
        rows = []
        for seq in self._manifest_seqs():
            with open(f"{self.root}/_manifest/{seq}.json") as f:
                m = json.load(f)
            rows.append((int(m["batch_id"]), m.get("resolved_ts"), m.get("committed_at")))
        return self.spark.createDataFrame(
            rows, "batch_id LONG, resolved_ts LONG, committed_at DOUBLE"
        )

    def gc_tombstones(self, below_resolved_ts: int) -> int:
        """Drop tombstones with commit_ts < the global resolved-ts — the
        source contract (kv.go:58-66) promises no further events below it,
        so a delete there can never be out-raced. Rewrites every bucket
        (run rarely, like Iceberg's rewrite_data_files)."""
        manifest = self.current_manifest()
        all_buckets = [int(b) for b in manifest["buckets"]]
        df = self._read_buckets(manifest, all_buckets)
        if df is None:
            return 0
        keep = df.filter(
            ~(F.col("__deleted") & (F.col("__commit_ts") < below_resolved_ts))
        ).withColumn("bucket", self._bucket_col())
        data_rel = f"data/gc{manifest['seq'] + 1}"
        keep.write.mode("overwrite").partitionBy("bucket").parquet(f"{self.root}/{data_rel}")
        new_buckets = {}
        for b in all_buckets:
            bucket_dir = f"{data_rel}/bucket={b}"
            if os.path.exists(f"{self.root}/{bucket_dir}"):
                new_buckets[str(b)] = bucket_dir
        removed = manifest.get("applied_events", 0)
        self._commit_manifest(
            {
                **manifest,
                "seq": manifest["seq"] + 1,
                "buckets": new_buckets,
                "committed_at": time.time(),
                "gc_below": below_resolved_ts,
            }
        )
        return removed
