"""Schema registry — the SchemaStorage analog.

Reference: SchemaStorage keeps a sorted list of immutable schema snapshots,
one per DDL, resolved by timestamp: GetSnapshot(ts) returns the version with
Version <= ts (/root/reference/cdc/entry/schema_storage.go:40-178); the
mounter resolves rows at CRTs-1 (/root/reference/cdc/entry/mounter.go:158-160).

Here: a tiny table (schema_version, active_from_ts, schema_json) persisted
as parquet next to the target table. It is driver-collected (it has one row
per DDL ever run — trivially small) and broadcast into expressions; never a
distributed join.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Fixture versions (FIXTURES.md §3): v2 adds `tool` mid-stream.
PAYLOAD_V1 = T.StructType(
    [
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)
PAYLOAD_V2 = T.StructType(
    [
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


@dataclass(frozen=True)
class SchemaVersion:
    schema_version: int
    active_from_ts: int
    schema: T.StructType
    # column renames applied AT this version, as (new_name, old_name) pairs
    # — the mounter resolves a row's physical field name per version through
    # the rename chain, so renamed columns keep their data (the reference
    # keys row data by column ID, schema_storage.go:191-242; JSON payloads
    # are by-name, so the chain is the ID analog). Drops need no annotation:
    # a field absent from a later schema simply stops being decoded.
    renames: tuple = ()

    @property
    def field_names(self) -> tuple[str, ...]:
        return tuple(f.name for f in self.schema.fields)


def field_source_name(
    registry: list[SchemaVersion], field_name: str, version: SchemaVersion
) -> str | None:
    """The physical payload-field name that ``field_name`` (a field of the
    LATEST schema) had in ``version`` — walking rename chains backward from
    newest to ``version`` — or None when the field does not exist there
    (added later: NULL backfill)."""
    name = field_name
    for v in sorted(registry, key=lambda v: -v.schema_version):
        if v.schema_version <= version.schema_version:
            break
        for new, old in v.renames:
            if name == new:
                name = old
                break
    return name if name in version.field_names else None


def default_registry(ddl_ts: int) -> list[SchemaVersion]:
    return [
        SchemaVersion(1, 0, PAYLOAD_V1),
        SchemaVersion(2, ddl_ts, PAYLOAD_V2),
    ]


def latest_schema(registry: list[SchemaVersion]) -> T.StructType:
    return max(registry, key=lambda v: v.schema_version).schema


def resolve_version_at(registry: list[SchemaVersion], commit_ts: int) -> SchemaVersion:
    """Version applicable to a row committed at commit_ts: the newest version
    with active_from_ts <= commit_ts - 1 (mounter.go:160 — a DML whose
    commit ts equals a DDL's finish ts uses the schema *before* the DDL)."""
    eligible = [v for v in registry if v.active_from_ts <= commit_ts - 1]
    if not eligible:
        eligible = [min(registry, key=lambda v: v.schema_version)]
    return max(eligible, key=lambda v: v.active_from_ts)


def save_registry(spark: SparkSession, registry: list[SchemaVersion], path: str) -> None:
    rows = [
        (
            v.schema_version,
            v.active_from_ts,
            v.schema.json(),
            json.dumps([list(p) for p in v.renames]),
        )
        for v in registry
    ]
    schema = (
        "schema_version LONG, active_from_ts LONG, schema_json STRING, "
        "renames_json STRING"
    )
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(path)


def load_registry(spark: SparkSession, path: str) -> list[SchemaVersion]:
    df = spark.read.parquet(path)
    has_renames = "renames_json" in df.columns  # pre-rename registries
    return sorted(
        (
            SchemaVersion(
                r["schema_version"],
                r["active_from_ts"],
                T.StructType.fromJson(json.loads(r["schema_json"])),
                renames=tuple(
                    tuple(p) for p in json.loads(r["renames_json"] or "[]")
                )
                if has_renames
                else (),
            )
            for r in df.collect()
        ),
        key=lambda v: v.schema_version,
    )


def registry_df(spark: SparkSession, registry: list[SchemaVersion]) -> DataFrame:
    rows = [
        (
            v.schema_version,
            v.active_from_ts,
            v.schema.json(),
            json.dumps([list(p) for p in v.renames]),
        )
        for v in registry
    ]
    return spark.createDataFrame(
        rows,
        "schema_version LONG, active_from_ts LONG, schema_json STRING, "
        "renames_json STRING",
    )


def add_version(
    spark: SparkSession, path: str, new: SchemaVersion
) -> list[SchemaVersion]:
    """DDL apply (HandleDDLJob analog, schema_storage.go:191-242): append a
    new immutable version. Applied at an epoch boundary (DDL barrier,
    /root/reference/cdc/owner/barrier.go:22-47)."""
    registry = load_registry(spark, path) if os.path.exists(path) else []
    assert all(v.schema_version < new.schema_version for v in registry)
    registry = registry + [new]
    save_registry(spark, registry, path)
    return registry
