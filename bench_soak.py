"""Soak run — the north-rule replay shape at in-sandbox scale.

BASELINE.md protocol step 3: a long replay THROUGH THE STREAMING RUNNER
(not the single-epoch fast path) with a mid-stream restart from
checkpoint, a forced full re-delivery (fence no-op), and a final
distributed sync-diff of the table against the entire source log. The
10^10-event production target is stood in for by ~10^8 events locally —
every mechanism exercised (source offsets, epoch fencing, frontier
carry-forward, bucketed merges, auto-vacuum) is scale-invariant; only the
epoch count changes.

Usage:  python bench_soak.py [n_convs] [max_files_per_trigger]
        (defaults 4_000_000 ≈ 100M events, 32 files/trigger — at 10^9
        events use a smaller trigger, e.g. 8, so a microbatch's reduce fits
        the single-JVM executor memory; on a real cluster this is the
        per-changefeed memory-quota knob)
Prints one JSON line and appends a summary to BENCH.md.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

WORKDIR = (
    "/dev/shm/tiflow_soak" if os.path.isdir("/dev/shm") else "/tmp/tiflow_soak"
)


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    max_files = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    # sink mode: COW rewrites every affected bucket per epoch — on a
    # commit-ts-banded feed every epoch touches EVERY bucket, so COW
    # re-writes the whole table each microbatch (fine at 10^8 where the
    # table is small; quadratic wall-time by 10^9). MOR appends O(epoch)
    # deltas with periodic compaction — the sink a 10^10-event ingest
    # actually runs (BENCH.md measures MOR 1.8x at stream cadence).
    mode = sys.argv[3] if len(sys.argv) > 3 else "cow"
    # lifecycle length: more updates per key = more events per live row.
    # The 10^9-event run uses a longer lifecycle (m=19, ~65 events/conv)
    # so the LIVE table fits the single box; the reference's 10^10 target
    # is update-heavy in the same way (a binlog is mostly updates).
    extra_updates = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    shutil.rmtree(WORKDIR, ignore_errors=True)
    os.makedirs(WORKDIR)

    from tiflow_spark.operators.validate import verify_changefeed
    from tiflow_spark.session import get_spark
    from tiflow_spark.sinks.cow_table import CowTable
    from tiflow_spark.sources.datagen import GenSpec, write_epoch_files
    from tiflow_spark.sources.registry import default_registry
    from tiflow_spark.streaming.runner import Changefeed

    spark = get_spark("tiflow_soak", cores=32, shuffle_partitions=32)
    spec = GenSpec(n_convs=n_convs, hot_turns=256, n_source_partitions=32,
                   max_extra_updates=extra_updates)
    events_dir = f"{WORKDIR}/events"
    t0 = time.time()
    write_epoch_files(spark, spec, events_dir)
    gen_dt = time.time() - t0
    epochs = sorted(glob.glob(events_dir + "/epoch_*"))
    n_events = spark.read.parquet(*epochs).count()

    registry = default_registry(spec.ddl_ts)
    table = CowTable(spark, f"{WORKDIR}/table", n_buckets=64, auto_vacuum_keep=3,
                     mode=mode, auto_compact_deltas=24 if mode == "mor" else None)

    def feed(pattern: str) -> Changefeed:
        return Changefeed(
            spark=spark, events_dir=pattern,
            checkpoint_dir=f"{WORKDIR}/ckpt", table=table,
            registry=registry, max_files_per_trigger=max_files,
        )

    # phase 1: drain roughly the first half of the epoch files, then the
    # query stops — the mid-stream shutdown
    half = epochs[: max(1, len(epochs) // 2)]
    half_pat = "{" + ",".join(os.path.basename(p) for p in half) + "}"
    t0 = time.time()
    f1 = feed(f"{events_dir}/{half_pat}")
    f1.run_available_now(timeout_sec=7200)
    phase1_dt = time.time() - t0
    mid_batch = table.last_committed_batch()

    # phase 2: restart from the SAME checkpoint over the full log
    t0 = time.time()
    f2 = feed(events_dir + "/epoch_*")
    f2.run_available_now(timeout_sec=7200)
    phase2_dt = time.time() - t0

    # phase 3: forced full re-delivery — fresh checkpoint, same table;
    # every epoch must fence as a no-op (batch ids restart below the
    # committed fence)
    t0 = time.time()
    f3 = Changefeed(
        spark=spark, events_dir=events_dir + "/epoch_*",
        checkpoint_dir=f"{WORKDIR}/ckpt_replay", table=table,
        registry=registry, max_files_per_trigger=max_files,
    )
    f3.run_available_now(timeout_sec=7200)
    phase3_dt = time.time() - t0
    replay_all_fenced = all(s.skipped for _, s in f3.batch_log)

    # phase 4: distributed sync-diff of the final table against the FULL
    # source log (chunked checksums; sync_diff_inspector analog)
    t0 = time.time()
    events = spark.read.parquet(*epochs)
    # past ~2e8 events the one-pass full-log LWW shuffle outgrows a single
    # node's spill disk — split the verify into key-hash passes (see
    # verify_changefeed(key_split=...)); a real cluster has aggregate
    # shuffle disk and runs one pass
    ksplit = 8 if n_events > 200_000_000 else 1
    diff = verify_changefeed(table, events, registry, n_chunks=64, key_split=ksplit)
    verify_dt = time.time() - t0

    stream_dt = phase1_dt + phase2_dt
    summary = {
        "metric": "soak: streaming replay + restart + fence replay + sync-diff",
        "sink_mode": mode,
        "events": int(n_events),
        "epoch_files": len(epochs),
        "gen_seconds": round(gen_dt, 1),
        "phase1_half_drain_seconds": round(phase1_dt, 1),
        "phase2_resume_seconds": round(phase2_dt, 1),
        "stream_events_per_sec": round(n_events / stream_dt),
        "mid_restart_batch": int(mid_batch),
        "phase3_fence_replay_seconds": round(phase3_dt, 1),
        "replay_all_fenced": bool(replay_all_fenced),
        "verify_seconds": round(verify_dt, 1),
        "verify_identical": bool(diff.identical),
        "verify_chunks": diff.n_chunks,
    }
    print(json.dumps(summary))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.md"), "a") as f:
        f.write("\n## Soak run\n\n```json\n" + json.dumps(summary, indent=2) + "\n```\n")
    shutil.rmtree(WORKDIR, ignore_errors=True)


if __name__ == "__main__":
    main()
