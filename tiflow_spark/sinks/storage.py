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


def _envelope_types() -> dict[str, str]:
    """Envelope columns every change file carries alongside the versioned
    data columns, DERIVED from the engine's canonical event schema
    (streaming/runner.CHANGE_EVENT_SCHEMA_MULTI) so a future envelope
    change cannot silently drift the consumer's casts. payload columns
    are replaced by the decoded data columns in storage files; op_order
    is computed downstream of decode (operators/ordering.with_op_order),
    so it rides alongside."""
    from tiflow_spark.streaming.runner import CHANGE_EVENT_SCHEMA_MULTI

    types = {
        f.name: f.dataType.simpleString()
        for f in CHANGE_EVENT_SCHEMA_MULTI.fields
        if f.name not in ("payload", "pre_payload")
    }
    types["op_order"] = "int"
    return types


def replay_storage(spark: SparkSession, root: str, table, fmt: str = "json") -> dict:
    """The storage-consumer loop as a first-class API
    (/root/reference/cmd/storage-consumer/main.go:1 — the reference ships a
    standalone consumer that walks the sink's directory layout, decodes
    each table/version's CDC files against its `schema_{version}.json`,
    and applies them to a downstream sink): read every version dir with
    the types its OWN schema file declares (text formats carry no types —
    the schema file is the consumer's source of truth, exactly the
    reference's design, storage-sink design doc §schema file), NULL-
    backfill columns the version predates, and merge into ``table``
    exactly-once-in-effect: the highest CDC batch number consumed is
    tracked in the table manifest (``storage_batch``, the replay_mq
    ``track_offset`` analog), so a re-run reads ONLY batch dirs above the
    watermark — a no-input no-op, not an O(archive) re-merge (which, being
    LWW-idempotent, would still converge, but would re-insert tombstones
    reclaimed by ``gc_tombstones`` and pay a full rewrite per run).
    Batch ids must be monotone across versions (the sink contract —
    ``write_change_files`` is fed by monotone epoch batch ids).

    Returns {"applied", "files_versions"}.
    """
    import glob as _glob

    from pyspark.sql import functions as F
    from pyspark.sql import types as PT

    metas = sorted(_glob.glob(f"{root}/v*/schema_*.json"))
    if not metas:
        raise FileNotFoundError(
            f"no schema_*.json under {root}/v*/ — not a storage-sink layout"
        )
    versions = []
    for m in metas:
        with open(m) as fh:
            versions.append(json.load(fh))
    latest = max(versions, key=lambda v: v["schema_version"])
    latest_fields = PT.StructType.fromJson(latest["schema"]).fields

    consumed = table.current_manifest().get("storage_batch")
    watermark = -1 if consumed is None else int(consumed)
    max_batch = watermark
    parts = []
    for meta in sorted(versions, key=lambda v: v["schema_version"]):
        vdir = f"{root}/v{meta['schema_version']}"
        batch_dirs = []
        for d in sorted(os.listdir(vdir)):
            if not d.startswith("CDC"):
                continue
            num = int(d[3:])
            if num <= watermark:
                continue  # already consumed (storage_batch fence)
            max_batch = max(max_batch, num)
            batch_dirs.append(f"{vdir}/{d}")
        if not batch_dirs:
            continue
        if fmt == "csv":
            raw = (
                spark.read.option("header", "true")
                .option("inferSchema", "true")
                .csv(batch_dirs)
            )
        else:
            raw = spark.read.json(batch_dirs)
        vschema = PT.StructType.fromJson(meta["schema"])
        declared = {f.name: f.dataType for f in vschema.fields}
        envelope_types = _envelope_types()
        cols = []
        for name, typ in envelope_types.items():
            if name in raw.columns:
                cols.append(F.col(name).cast(typ).alias(name))
        for f in latest_fields:
            if f.name in envelope_types:
                continue
            if f.name in raw.columns and f.name in declared:
                cols.append(F.col(f.name).cast(declared[f.name]).alias(f.name))
            else:  # column added by a later DDL: NULL backfill
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        parts.append(raw.select(*cols))
    if not parts:
        return {"applied": 0, "files_versions": 0}
    frame = parts[0]
    for p in parts[1:]:
        frame = frame.unionByName(p, allowMissingColumns=True)
    if "source_partition" not in frame.columns:
        frame = frame.withColumn("source_partition", F.lit(0).cast("int"))
    stats = table.merge(
        frame,
        batch_id=table.last_committed_batch() + 1,
        manifest_extra={"storage_batch": max_batch},
    )
    return {
        "applied": int(stats.applied_events),
        "files_versions": len(parts),
    }
