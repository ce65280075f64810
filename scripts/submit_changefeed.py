"""spark-submit entry point for a tiflow_spark changefeed — the deployment
shape the engine targets (north rule: `spark-submit --py-files` on a
multi-executor cluster).

Usage (cluster):

    python scripts/package_pyfiles.py dist/tiflow_spark.zip
    spark-submit --master <cluster> --py-files dist/tiflow_spark.zip \
        scripts/submit_changefeed.py \
        --events-dir s3://bucket/changelog/epoch_* \
        --table-dir  s3://bucket/tables/transcripts \
        --checkpoint-dir s3://bucket/ckpt/transcripts \
        [--registry-path s3://bucket/registry] [--continuous 5s]
        [--strict-frontier] [--ddl-in-stream] [--start-ts N]

Everything the driver needs ships in the zip; executors receive it via
--py-files (SparkContext.addPyFile distribution). No cluster-side install.
Locally (this sandbox) the same script runs under `spark-submit --master
local[4]` — exercised by tests/test_spark_submit.py.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str]) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--events-dir", required=True)
    p.add_argument("--table-dir", required=True)
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--registry-path", default=None)
    p.add_argument("--n-buckets", type=int, default=32)
    p.add_argument("--max-files-per-trigger", type=int, default=16)
    p.add_argument("--strict-frontier", action="store_true")
    p.add_argument("--ddl-in-stream", action="store_true")
    p.add_argument("--start-ts", type=int, default=None)
    p.add_argument("--continuous", default=None, metavar="INTERVAL",
                   help="run forever at this trigger interval (e.g. '5 seconds'); "
                        "default drains available input and exits")
    p.add_argument("--ddl-ts", type=int, default=10**9,
                   help="fixture registry v2 activation ts when no "
                        "--registry-path is given")
    args = p.parse_args(argv)

    # under spark-submit the session already exists via the gateway; build
    # from the active conf rather than re-deriving local defaults
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("tiflow_spark_changefeed").getOrCreate()

    from tiflow_spark.sinks.cow_table import CowTable, data_schema_from_registry
    from tiflow_spark.sources.registry import default_registry, load_registry
    from tiflow_spark.streaming.runner import Changefeed

    if args.registry_path:
        registry = load_registry(spark, args.registry_path)
    else:
        registry = default_registry(args.ddl_ts)
        if args.ddl_in_stream:
            registry = registry[:1]  # later versions arrive as DDL events

    table = CowTable(
        spark, args.table_dir, n_buckets=args.n_buckets,
        data_schema=data_schema_from_registry(registry),
    )
    feed = Changefeed(
        spark=spark,
        events_dir=args.events_dir,
        checkpoint_dir=args.checkpoint_dir,
        table=table,
        registry=registry,
        registry_path=args.registry_path,
        max_files_per_trigger=args.max_files_per_trigger,
        strict_frontier=args.strict_frontier,
        ddl_in_stream=args.ddl_in_stream,
        start_ts=args.start_ts,
    )
    if args.continuous:
        q = feed.run_continuous(args.continuous)
        q.awaitTermination()
    else:
        feed.run_available_now()
        m = table.current_manifest()
        print(json.dumps({
            "batches": len(feed.batch_log),
            "resolved_ts": m.get("resolved_ts"),
            "applied_events": sum(
                s.applied_events for _, s in feed.batch_log if not s.skipped
            ),
            "rows": table.snapshot().count(),
        }))


if __name__ == "__main__":
    main(sys.argv[1:])
