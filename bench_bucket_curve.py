"""Per-epoch cost curve at production bucket granularity (4096 buckets).

VERDICT r4 next #6: evidence the bucket-count asymptotics the engine's
docstrings claim — COW merge cost follows the epoch's AFFECTED buckets
(read+rewrite of those buckets only), and incremental CDF cost follows the
CHANGED buckets, not the table size. Protocol:

1. seed a range-bucketed table (bucket_expr = contiguous conv ranges, the
   Iceberg truncate-transform analog) with a full load at 4096 buckets;
2. apply epochs of CONSTANT row count (so row work is fixed) whose key
   ranges map to k ∈ {1, 4, 16, 64, 256, 1024, 4096} buckets;
3. record per-epoch merge seconds and the incremental CDF read seconds
   (changes_between over the epoch's manifest delta) vs a full-snapshot
   read.

Expected shape: merge time ≈ fixed overhead + k × (bucket read+write),
linear in k — an epoch touching 1/4096th of the keyspace costs ~the fixed
overhead, NOT a table rewrite; CDF likewise. No new mechanism — this is
the existing merge/CDF path measured at production granularity.

Usage: python bench_bucket_curve.py [keys_per_bucket]   (default 4096)
Prints one JSON line and appends the curve to BENCH.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

WORKDIR = (
    "/dev/shm/tiflow_bcurve" if os.path.isdir("/dev/shm") else "/tmp/tiflow_bcurve"
)

N_BUCKETS = 4096
KS = [1, 4, 16, 64, 256, 1024, 4096]
EPOCH_ROWS = 100_000


def main() -> None:
    keys_per_bucket = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    n_keys = N_BUCKETS * keys_per_bucket
    shutil.rmtree(WORKDIR, ignore_errors=True)
    os.makedirs(WORKDIR)

    from pyspark.sql import functions as F

    from tiflow_spark.session import get_spark
    from tiflow_spark.sinks.cow_table import CowTable

    spark = get_spark("tiflow_bucket_curve", cores=32, shuffle_partitions=32)

    # range bucketing: conv n -> bucket n // keys_per_bucket, so an epoch
    # over convs [0, k*keys_per_bucket) touches exactly k buckets
    table = CowTable(
        spark, f"{WORKDIR}/table", n_buckets=N_BUCKETS,
        bucket_expr=(
            f"cast(substring(conv_id, 2, 18) as long) div {keys_per_bucket}"
        ),
        data_schema={"role": "string", "text": "string"},
    )

    def batch(n_rows: int, conv_span: int, commit_ts: int):
        """n_rows updates spread uniformly over convs [0, conv_span)."""
        return spark.range(n_rows).select(
            F.lit("U").alias("op"),
            F.lit(commit_ts).cast("long").alias("commit_ts"),
            F.lit(commit_ts - 1).cast("long").alias("start_ts"),
            (F.col("id") % 32).cast("int").alias("source_partition"),
            F.concat(
                F.lit("c"), ((F.col("id") * conv_span) / n_rows).cast("long")
            ).alias("conv_id"),
            F.lit(0).cast("int").alias("turn_idx"),
            F.lit("user").alias("role"),
            F.concat(F.lit("t"), F.col("id").cast("string")).alias("text"),
        )

    t0 = time.time()
    table.merge(batch(n_keys, n_keys, commit_ts=10), batch_id=0)
    seed_dt = time.time() - t0

    t0 = time.time()
    full_rows = table.snapshot().count()
    full_read_dt = time.time() - t0
    assert full_rows == n_keys, (full_rows, n_keys)

    curve = []
    for i, k in enumerate(KS):
        span = k * keys_per_bucket
        b = batch(EPOCH_ROWS, span, commit_ts=20 + i)
        t0 = time.time()
        stats = table.merge(b, batch_id=i + 1)
        merge_dt = time.time() - t0
        seq = table.current_manifest()["seq"]
        t0 = time.time()
        cdf_rows = table.changes_between(seq - 1, seq).count()
        cdf_dt = time.time() - t0
        curve.append(
            {
                "target_buckets": k,
                "affected_buckets": int(stats.affected_buckets),
                "epoch_rows": EPOCH_ROWS,
                "merge_seconds": round(merge_dt, 2),
                "cdf_rows": int(cdf_rows),
                "cdf_read_seconds": round(cdf_dt, 2),
            }
        )
        print(json.dumps(curve[-1]), flush=True)

    summary = {
        "metric": "bucket-count asymptotics at 4096 buckets",
        "n_keys": n_keys,
        "n_buckets": N_BUCKETS,
        "seed_merge_seconds": round(seed_dt, 1),
        "full_snapshot_read_seconds": round(full_read_dt, 2),
        "curve": curve,
    }
    print(json.dumps(summary))
    repo = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(repo, "BENCH.md"), "a") as f:
        f.write(
            "\n## Bucket-count cost curve (4096 buckets)\n\n"
            f"{n_keys:,} keys, constant {EPOCH_ROWS:,}-row epochs over "
            "k-bucket key spans (range bucketing):\n\n"
            "| buckets touched | merge s | CDF rows | CDF read s |\n"
            "|---|---|---|---|\n"
        )
        for c in curve:
            f.write(
                f"| {c['affected_buckets']} | {c['merge_seconds']} | "
                f"{c['cdf_rows']} | {c['cdf_read_seconds']} |\n"
            )
        f.write(
            f"\nFull-snapshot read for comparison: {full_read_dt:.2f}s; "
            f"seed merge of all {N_BUCKETS} buckets: {seed_dt:.1f}s.\n"
        )
    shutil.rmtree(WORKDIR, ignore_errors=True)


if __name__ == "__main__":
    main()
