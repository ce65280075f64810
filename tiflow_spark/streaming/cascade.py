"""CDF cascade — a CowTable's change feed as the SOURCE of another feed.

Reference shape: a TiCDC changefeed whose downstream is itself captured by
another changefeed (cascaded replication), and Iceberg's incremental read
used as a streaming source. The upstream table's manifest sequence IS the
offset log: each committed seq is one epoch of row-level changes, and
``changes_between`` (manifest-diffed, bucket-pruned — cow_table.py) yields
exactly those changes without rescanning the table. The downstream consumes
them as ordinary change events through the same fenced, version-conditional
merge, so a cascade hop inherits every exactly-once/restart property of a
first-hop feed.

Scale: each ``sync`` reads only the buckets whose references changed
between the two manifest seqs on BOTH upstream snapshots (cost ∝ changed
buckets), and merges into only the downstream buckets those keys map to.
A 10^10-row upstream with a 10^5-row epoch moves ~10^5 rows per hop.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from tiflow_spark.sinks.cow_table import CowTable


@dataclass
class CascadeFeed:
    """Tail ``upstream``'s manifest sequence into ``downstream``.

    The last-consumed upstream seq persists in the DOWNSTREAM manifest
    (``upstream_seq``) — committed atomically with the merge that applied
    it, so a crash between hops re-reads the same seq range and the fence/
    LWW absorb the replay. First sync (upstream_seq absent) replays the
    full current snapshot as the initial load (changes_between(-1, seq)).

    Retention contract (the Kafka-retention analog): the upstream's vacuum
    must keep the last-consumed seq's files alive (``keep_manifests`` >
    the cascade's lag in upstream commits). If the consumer falls behind
    retention, ``sync`` raises FileNotFoundError (the snapshot read fails
    loudly) rather than silently emitting a changeset with missing
    deletes — recover by resetting ``upstream_seq`` to -1 (full reload)."""

    spark: SparkSession
    upstream: CowTable
    downstream: CowTable

    def sync(self) -> dict:
        """Consume every upstream epoch committed since the last sync.
        Returns {"from_seq", "to_seq", "applied", "skipped"}."""
        m = self.downstream.current_manifest()
        from_seq = int(m.get("upstream_seq", -1))
        to_seq = int(self.upstream.current_manifest()["seq"])
        if to_seq <= from_seq:
            return {"from_seq": from_seq, "to_seq": to_seq, "applied": 0,
                    "skipped": True}
        changes = self.upstream.changes_between(from_seq, to_seq)
        # the upstream bucket is a stable partition id for frontier lineage
        batch = changes.withColumn(
            "source_partition", self.upstream._bucket_col()
        )
        stats = self.downstream.merge(
            batch,
            batch_id=int(m["batch_id"]) + 1,
            manifest_extra={"upstream_seq": to_seq},
        )
        return {
            "from_seq": from_seq,
            "to_seq": to_seq,
            "applied": int(stats.applied_events),
            "skipped": bool(stats.skipped),
        }

    def run_continuous(self, poll_interval_sec: float = 1.0, max_syncs: int | None = None):
        """Poll-driven tailing loop (the manifest dir is the offset log; no
        Spark streaming source needed for a metadata poll). ``max_syncs``
        bounds the loop for tests; None = run until interrupted."""
        import time as _time

        n = 0
        while max_syncs is None or n < max_syncs:
            res = self.sync()
            if res["skipped"]:
                _time.sleep(poll_interval_sec)
            n += 1
            yield res
