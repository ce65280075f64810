"""Cloud-storage sink: CDC change files under versioned-schema paths.

Reference: the storage sink writes `CDC{num}.csv/json` data files under
`<table>/<schema-version>/` together with `schema_{version}_{checksum}.json`
metadata (/root/reference/cdc/sink/dmlsink/cloudstorage/cloud_storage_dml_
sink.go:74-237; design doc /root/reference/docs/design/2023-03-15-ticdc-
storage-sink.md:56-76). The defragmenter that restores encode-worker output
order (defragmenter.go:25-101) is unnecessary here: Spark writes each
partition's file atomically and the manifest lists them — ordering is by
(commit_ts, start_ts, op_order) columns in the data itself.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from tiflow_spark.sources.registry import SchemaVersion


def write_change_files(
    decoded: DataFrame,
    root: str,
    schema_version: SchemaVersion,
    batch_id: int,
    fmt: str = "json",
) -> str:
    """Append one batch of change rows as CDC files under the version path.
    Returns the batch directory."""
    vdir = f"{root}/v{schema_version.schema_version}"
    os.makedirs(vdir, exist_ok=True)
    meta_path = f"{vdir}/schema_{schema_version.schema_version}.json"
    if not os.path.exists(meta_path):
        with open(meta_path, "w") as fh:
            json.dump(
                {
                    "schema_version": schema_version.schema_version,
                    "active_from_ts": schema_version.active_from_ts,
                    "schema": json.loads(schema_version.schema.json()),
                },
                fh,
            )
    out = f"{vdir}/CDC{batch_id:08d}"
    writer = decoded.write.mode("overwrite")
    if fmt == "csv":
        writer.option("header", "true").csv(out)
    else:
        writer.json(out)
    return out


def read_change_files(spark: SparkSession, root: str, fmt: str = "json") -> DataFrame:
    """Consumer side (storage-consumer analog): read every version dir and
    NULL-backfill missing columns via schema merge, ready for replay into a
    CowTable."""
    paths = []
    for v in sorted(os.listdir(root)):
        if not v.startswith("v"):
            continue
        paths.extend(
            f"{root}/{v}/{d}" for d in os.listdir(f"{root}/{v}") if d.startswith("CDC")
        )
    reader = spark.read.option("mergeSchema", "true")
    return reader.option("header", "true").csv(paths) if fmt == "csv" else reader.json(paths)
