"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the core CDC replay
throughput benchmark (generated change log → full pipeline → COW merge), and
prints ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ...,
   "cdc_replay": {"events": N, "events_per_sec": X}}

Scaling-efficiency evidence (local[8] vs local[32]) lives in
bench_scaling.py — separate processes, since a SparkSession's core count is
fixed per JVM.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "cdc_lww_final_state",
    "cdc_net_op_algebra",
    "cdc_update_split",
    "cdc_checksum_chunks",
    "text_stats",
    "text_lang_id",
    "dedup_exact",
    "dedup_minhash_sigs",
    "dedup_simhash",
    "ann_topk",
    "ann_lsh_topk",
    "embedding_near_dups",
]


def run_cdc_replay(spark, n_convs: int, workdir: str) -> dict:
    """End-to-end replay: generate events (not timed separately — it fuses
    into the pipeline scan), LWW + decode + merge into a COW table."""
    from tiflow_spark.plans.pipeline import apply_epoch
    from tiflow_spark.sinks.cow_table import CowTable
    from tiflow_spark.sources.datagen import GenSpec, generate_change_events
    from tiflow_spark.sources.registry import default_registry

    spec = GenSpec(n_convs=n_convs, hot_turns=256, n_source_partitions=32)
    events_path = f"{workdir}/events"
    generate_change_events(spark, spec).write.mode("overwrite").parquet(events_path)
    events = spark.read.parquet(events_path)
    n = events.count()

    registry = default_registry(spec.ddl_ts)

    def one_run(tag: str) -> dict:
        shutil.rmtree(f"{workdir}/table_{tag}", ignore_errors=True)
        table = CowTable(spark, f"{workdir}/table_{tag}", n_buckets=32)
        t0 = time.time()
        apply_epoch(table, registry, events, batch_id=0)
        dt = time.time() - t0
        return {"events": n, "seconds": round(dt, 3), "events_per_sec": round(n / dt)}

    cold = one_run("cold")   # includes whole-stage-codegen compile of the plan
    warm = one_run("warm")   # steady-state per-epoch cost (codegen cached)
    return {**warm, "cold": cold}


def run_cdc_stream(spark, n_convs: int, workdir: str) -> dict:
    """Steady-state changefeed: commit_ts-banded epochs applied IN SEQUENCE
    through the streaming runner into one growing table — each epoch pays
    the real costs a long-lived feed pays (fencing, existing-bucket
    reconcile, manifest commits), unlike the fresh-table single-epoch
    replay above."""
    import glob

    from tiflow_spark.sinks.cow_table import CowTable
    from tiflow_spark.sources.datagen import GenSpec, write_epoch_files
    from tiflow_spark.sources.registry import default_registry
    from tiflow_spark.streaming.runner import Changefeed

    spec = GenSpec(n_convs=n_convs, hot_turns=256, n_source_partitions=32)
    events_dir = f"{workdir}/stream_events"
    write_epoch_files(spark, spec, events_dir)
    n = spark.read.parquet(*glob.glob(events_dir + "/epoch_*")).count()

    table = CowTable(spark, f"{workdir}/stream_table", n_buckets=32,
                     auto_vacuum_keep=3)
    feed = Changefeed(
        spark=spark, events_dir=events_dir + "/epoch_*",
        checkpoint_dir=f"{workdir}/stream_ckpt", table=table,
        registry=default_registry(spec.ddl_ts), max_files_per_trigger=64,
    )
    t0 = time.time()
    feed.run_available_now()
    dt = time.time() - t0
    return {
        "events": n,
        "epochs": len(feed.batch_log),
        "seconds": round(dt, 3),
        "events_per_sec": round(n / dt),
    }


def run_cdc_stream_observed(spark, n_convs: int, workdir: str) -> dict:
    """Same feed as run_cdc_stream with frontier_mode='observe': the
    frontier/lineage aggregates ride the LWW job instead of a separate
    column-pruned scan — one fewer Spark job per epoch. Measured (r4) to
    LOSE to scan at every epoch size on local[32] (the 64x2 conditional
    aggregates per input row cost more than the extra pruned job); kept
    as the documented negative result behind the scan default."""
    import glob

    from tiflow_spark.sinks.cow_table import CowTable
    from tiflow_spark.sources.datagen import GenSpec, write_epoch_files
    from tiflow_spark.sources.registry import default_registry
    from tiflow_spark.streaming.runner import Changefeed

    spec = GenSpec(n_convs=n_convs, hot_turns=256, n_source_partitions=32)
    events_dir = f"{workdir}/stream_events"  # shared with run_cdc_stream
    if not glob.glob(events_dir + "/epoch_*"):
        write_epoch_files(spark, spec, events_dir)
    n = spark.read.parquet(*glob.glob(events_dir + "/epoch_*")).count()

    table = CowTable(spark, f"{workdir}/obs_table", n_buckets=32,
                     auto_vacuum_keep=3)
    feed = Changefeed(
        spark=spark, events_dir=events_dir + "/epoch_*",
        checkpoint_dir=f"{workdir}/obs_ckpt", table=table,
        registry=default_registry(spec.ddl_ts), max_files_per_trigger=64,
        frontier_mode="observe",
    )
    t0 = time.time()
    feed.run_available_now()
    dt = time.time() - t0
    return {
        "events": n,
        "epochs": len(feed.batch_log),
        "seconds": round(dt, 3),
        "events_per_sec": round(n / dt),
    }


def run_cdc_stream_mor(spark, n_convs: int, workdir: str) -> dict:
    """Same commit_ts-banded feed as run_cdc_stream, but the sink runs
    merge-on-read: epochs append per-bucket deltas (no reconcile read of
    the accumulated table), one compaction folds them at the end. Reported
    separately so the COW-vs-MOR write-amplification tradeoff is a
    measurement."""
    import glob

    from tiflow_spark.sinks.cow_table import CowTable
    from tiflow_spark.sources.datagen import GenSpec, write_epoch_files
    from tiflow_spark.sources.registry import default_registry
    from tiflow_spark.streaming.runner import Changefeed

    spec = GenSpec(n_convs=n_convs, hot_turns=256, n_source_partitions=32)
    events_dir = f"{workdir}/stream_events"  # shared with run_cdc_stream
    if not glob.glob(events_dir + "/epoch_*"):
        write_epoch_files(spark, spec, events_dir)
    n = spark.read.parquet(*glob.glob(events_dir + "/epoch_*")).count()

    table = CowTable(spark, f"{workdir}/mor_table", n_buckets=32,
                     mode="mor", auto_vacuum_keep=3)
    feed = Changefeed(
        spark=spark, events_dir=events_dir + "/epoch_*",
        checkpoint_dir=f"{workdir}/mor_ckpt", table=table,
        registry=default_registry(spec.ddl_ts), max_files_per_trigger=64,
    )
    t0 = time.time()
    feed.run_available_now()
    stream_dt = time.time() - t0
    t0 = time.time()
    table.compact()
    compact_dt = time.time() - t0
    return {
        "events": n,
        "epochs": len(feed.batch_log),
        "stream_seconds": round(stream_dt, 3),
        "compact_seconds": round(compact_dt, 3),
        "events_per_sec_stream": round(n / stream_dt),
        "events_per_sec_incl_compact": round(n / (stream_dt + compact_dt)),
    }


def run_cdc_stream_keylocal(spark, n_convs: int, workdir: str) -> dict:
    """Bucket-pruning evidence (round-2 verdict #9): epochs carry contiguous
    conv-id ranges and the table range-buckets on the same ranges, so each
    epoch's merge touches ~n_buckets/n_groups buckets instead of all of
    them. Reports per-epoch affected buckets alongside throughput — the
    claim 'merge cost follows the epoch's key footprint, not table size'
    as a measurement, not an argument."""
    import glob

    from tiflow_spark.sinks.cow_table import CowTable
    from tiflow_spark.sources.datagen import GenSpec, write_epoch_files_key_local
    from tiflow_spark.sources.registry import default_registry
    from tiflow_spark.streaming.runner import Changefeed

    n_buckets, n_groups = 256, 16
    spec = GenSpec(n_convs=n_convs, hot_turns=256, n_source_partitions=32)
    events_dir = f"{workdir}/keylocal_events"
    write_epoch_files_key_local(spark, spec, events_dir, n_groups=n_groups)
    n = spark.read.parquet(*glob.glob(events_dir + "/epoch_*")).count()

    group_size = (n_convs + n_buckets - 1) // n_buckets
    table = CowTable(
        spark, f"{workdir}/keylocal_table", n_buckets=n_buckets,
        auto_vacuum_keep=3,
        bucket_expr=f"cast(substring(conv_id, 2, 18) as long) div {group_size}",
    )
    feed = Changefeed(
        spark=spark, events_dir=events_dir + "/epoch_*",
        checkpoint_dir=f"{workdir}/keylocal_ckpt", table=table,
        registry=default_registry(spec.ddl_ts), max_files_per_trigger=1,
    )
    t0 = time.time()
    feed.run_available_now()
    dt = time.time() - t0
    affected = [s.affected_buckets for _, s in feed.batch_log if not s.skipped]
    return {
        "events": n,
        "epochs": len(feed.batch_log),
        "seconds": round(dt, 3),
        "events_per_sec": round(n / dt),
        "n_buckets": n_buckets,
        "affected_buckets_per_epoch": affected,
    }


def run_cdf_incremental(spark, n_convs: int, workdir: str) -> dict:
    """CDF cost ∝ changed buckets (round-3 verdict #1 'done' evidence):
    on the replayed table, commit one small epoch touching a handful of
    keys, then time changes_between over that seq window (reads only the
    changed buckets) against the full-history CDF from the empty snapshot
    (reads every bucket — the old O(table) shape)."""
    from pyspark.sql import functions as F

    from tiflow_spark.sinks.cow_table import CowTable

    table = CowTable(spark, f"{workdir}/table_warm", n_buckets=32)
    seq0 = int(table.current_manifest()["seq"])
    small = (
        table.snapshot()
        .limit(8)
        .select(
            F.lit("U").alias("op"),
            F.lit(2_000_000).cast("long").alias("commit_ts"),
            F.lit(1_999_999).cast("long").alias("start_ts"),
            F.lit(0).cast("int").alias("source_partition"),
            "conv_id", "turn_idx", "role",
            F.concat(F.lit("cdf-"), F.col("text")).alias("text"),
            "tool",
        )
    )
    table.merge(small, batch_id=table.last_committed_batch() + 1)
    seq1 = int(table.current_manifest()["seq"])
    changed = table.changed_buckets(seq0, seq1)

    t0 = time.time()
    incr_rows = table.changes_between(seq0, seq1).count()
    incr_dt = time.time() - t0
    t0 = time.time()
    full_rows = table.changes_between(-1, seq1).count()
    full_dt = time.time() - t0
    return {
        "n_buckets": 32,
        "changed_buckets": len(changed),
        "incr_rows": int(incr_rows),
        "incr_seconds": round(incr_dt, 3),
        "full_rows": int(full_rows),
        "full_seconds": round(full_dt, 3),
        "speedup": round(full_dt / incr_dt, 2) if incr_dt > 0 else None,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from tiflow_spark.plans.bench_queries import QUERIES
    from tiflow_spark.session import get_spark

    spark = get_spark("tiflow_spark_bench", cores=cpus, shuffle_partitions=cpus)

    # untimed warm-up: the first action in a fresh JVM pays classloading +
    # codegen-compiler startup (~4-5s) that belongs to the session, not the
    # query; a long-lived engine never re-pays it
    QUERIES["cdc_checksum_chunks"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # best-of-2 per query: robust against ambient VM drift (the round-2
    # driver campaign recorded 4-10x noise). Safe from Spark 4.1's
    # repeated-collect result cache because these are SINK WRITES (noop),
    # which always re-execute.
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()  # blackhole sink
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    workdir = "/tmp/tiflow_spark_bench"
    shutil.rmtree(workdir, ignore_errors=True)
    replay_convs = {"0.001": 2_000, "0.01": 20_000, "0.1": 60_000}.get(sf, 60_000)
    replay = run_cdc_replay(spark, replay_convs, workdir)
    timings["cdc_replay"] = replay["seconds"]
    # measured and reported under their own keys; NOT in the headline sum
    # (the headline stays comparable across rounds as queries grow)
    # auxiliary stream variants must never kill the headline record —
    # degrade to an error marker instead
    def _guarded(fn):
        try:
            return fn(spark, replay_convs, workdir)
        except Exception as e:  # noqa: BLE001 — report, don't die
            return {"error": f"{type(e).__name__}: {e}"[:300]}

    stream = _guarded(run_cdc_stream)
    stream_observed = _guarded(run_cdc_stream_observed)
    stream_mor = _guarded(run_cdc_stream_mor)
    stream_keylocal = _guarded(run_cdc_stream_keylocal)
    cdf_incremental = _guarded(run_cdf_incremental)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline suite wall time (CDC replay + operator queries)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
                "cdc_replay": replay,
                "cdc_stream": stream,
                "cdc_stream_observed": stream_observed,
                "cdc_stream_mor": stream_mor,
                "cdc_stream_keylocal": stream_keylocal,
                "cdf_incremental": cdf_incremental,
            }
        )
    )


if __name__ == "__main__":
    main()
