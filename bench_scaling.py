"""Scaling-efficiency evidence: the same CDC replay at two parallelism
levels (BASELINE.md protocol — local[8] is "N executors", local[32] is "4N").

Each level runs in its own subprocess (a JVM's core count is fixed at
session start). The input change log is generated ONCE and shared; each run
replays it through the full pipeline (LWW + decode + COW merge) into its own
table dir, then a second pass with the blackhole (noop) sink isolates
source+transform cost from the sink write.

Usage:  python bench_scaling.py [n_convs]      (default 60000, ~1.3M events)
Prints one JSON line with events/sec at each level + scaling efficiency
(throughput_4N / throughput_N) / 4, and appends a row to BENCH.md.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

# RAM-backed when available: on a real cluster I/O bandwidth scales with
# nodes; a single box's shared disk does not — tmpfs removes that artifact
# from the N-vs-4N comparison
WORKDIR = (
    "/dev/shm/tiflow_scaling" if os.path.isdir("/dev/shm") else "/tmp/tiflow_scaling"
)

CHILD = r"""
import json, shutil, sys, time
sys.path.insert(0, "/root/repo")
cores, events_path, mode, table_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3], sys.argv[4]

from tiflow_spark.session import get_spark
from tiflow_spark.sources.registry import default_registry
from tiflow_spark.sources.datagen import GenSpec

# bench-scale inputs are ~300MB compressed: the default 128MB split packs
# the scan into ~6 tasks, capping map parallelism below the core count at
# BOTH levels (at 100TB this is moot — splits abound). 4MB splits give the
# 32-core level multiple task waves.
spark = get_spark(f"scaling_{cores}", cores=cores, shuffle_partitions=cores,
                  extra_conf={"spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024)})
events = spark.read.parquet(events_path)
n = events.count()
registry = default_registry(GenSpec().ddl_ts)

def one_run(tag):
    t0 = time.time()
    if mode in ("merge", "mor"):
        from tiflow_spark.sinks.cow_table import CowTable
        from tiflow_spark.plans.pipeline import apply_epoch
        shutil.rmtree(table_dir + tag, ignore_errors=True)
        table = CowTable(spark, table_dir + tag, n_buckets=32,
                         mode="mor" if mode == "mor" else "cow")
        apply_epoch(table, registry, events, batch_id=0)
    elif mode == "blackhole":  # LWW + decode, same persist barrier as the pipeline
        from tiflow_spark.operators.lww import lww_latest, with_op_order
        from tiflow_spark.functions.decode import decode_payload
        net = lww_latest(with_op_order(events)).persist()
        decode_payload(net, registry).write.format("noop").mode("overwrite").save()
        net.unpersist()
    else:  # scan: read+deserialize only — the input-bound scaling ceiling
        events.write.format("noop").mode("overwrite").save()
    return time.time() - t0

# warm up until the JVM reaches steady state (codegen + C2 JIT take 2-3
# runs to compile the hot paths; a long-running streaming feed lives there
# permanently), then report the best of 3 timed runs.
prev = one_run("_w0")
for w in range(1, 4):
    cur = one_run(f"_w{w}")
    if cur < prev * 1.15:
        break
    prev = cur
times = [one_run(f"_t{i}") for i in range(2 if n > 30_000_000 else 3)]
dt = min(times)
print(json.dumps({"cores": cores, "mode": mode, "events": n,
                  "seconds": round(dt, 3), "events_per_sec": round(n / dt),
                  "timed_runs": [round(t, 1) for t in times]}))
"""


def run_level(cores: int, events_path: str, mode: str) -> dict:
    # table data on tmpfs for the same reason as the input: on a real
    # cluster sink I/O bandwidth scales with nodes; one box's disk does not
    out = subprocess.run(
        [sys.executable, "-c", CHILD, str(cores), events_path, mode, f"{WORKDIR}/table_{cores}_{mode}"],
        capture_output=True, text=True, timeout=3600,
        # spill stays on /tmp (disk): tmpfs spill measured SLOWER (page
        # allocation churn competes with the heap); input stays on tmpfs
        env={**os.environ, "TIFLOW_SPARK_DRIVER_MEM": "16g"},
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    modes = sys.argv[2].split(",") if len(sys.argv) > 2 else ["merge", "blackhole", "scan"]
    shutil.rmtree(WORKDIR, ignore_errors=True)
    os.makedirs(WORKDIR)

    # generate the shared input once
    gen = subprocess.run(
        [sys.executable, "-c", (
            "import sys; sys.path.insert(0, '/root/repo');"
            "from tiflow_spark.session import get_spark;"
            "from tiflow_spark.sources.datagen import GenSpec, generate_change_events;"
            f"spark = get_spark('gen', cores=32);"
            f"spec = GenSpec(n_convs={n_convs}, hot_turns=256, n_source_partitions=32);"
            f"generate_change_events(spark, spec).write.mode('overwrite')"
            f".parquet('{WORKDIR}/events')"
        )],
        capture_output=True, text=True, timeout=1800,
    )
    assert gen.returncode == 0, gen.stderr[-2000:]

    results = {}
    for mode in modes:
        lo = run_level(8, f"{WORKDIR}/events", mode)
        hi = run_level(32, f"{WORKDIR}/events", mode)
        eff = round((hi["events_per_sec"] / lo["events_per_sec"]) / 4, 3)
        results[mode] = {"local8": lo, "local32": hi, "scaling_efficiency": eff}

    summary = {
        "metric": "CDC replay events/sec at local[8] vs local[32]",
        "events": results[modes[0]]["local8"]["events"],
        "results": results,
    }
    print(json.dumps(summary))

    with open("/root/repo/BENCH.md", "a") as f:
        f.write("\n## Scaling run\n\n```json\n" + json.dumps(summary, indent=2) + "\n```\n")


if __name__ == "__main__":
    main()
