"""Mounter — versioned payload decode with schema-evolution backfill.

Reference: the mounter decodes raw bytes into a typed row against the schema
snapshot at CRTs-1 (/root/reference/cdc/entry/mounter.go:115-160), building
columns in schema order and backfilling columns absent in old encodings with
defaults/NULL (datum2Column + getDefaultOrZeroValue, mounter.go:338-388,
853-910). A fixed pool of 16 decode workers parallelizes it
(/root/reference/cdc/entry/mounter_group.go:49).

Two implementations with identical output (tested equal):

- ``decode_payload`` (default): pure JVM. One ``from_json`` per registry
  version, selected by a CASE on the event's schema_version; fields not in
  the event's version are NULLed even if present in the JSON (the registry
  governs, not the payload). Stays inside whole-stage codegen; zero Python.

- ``decode_payload_pandas``: the vectorized Arrow/pandas mounter required by
  the north rule — batches cross into Python via Arrow, each batch is decoded
  grouped by schema_version (one vectorized parse per version present),
  never per-row Python. Use when decode logic outgrows from_json (binary
  payloads, charset handling, checksum verification).

Parallelism is Spark task parallelism — the 16-worker mounter pool is free.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tiflow_spark.sources.registry import (
    SchemaVersion,
    field_source_name,
    latest_schema,
)


def _field_expr(
    registry: list[SchemaVersion],
    field: T.StructField,
    decoded: dict[int, Column],
    prefix: str = "",
) -> Column:
    """CASE schema_version WHEN v THEN decoded_v.<name-in-v> ... — NULL
    where the field is not part of version v (the backfill rule). The
    per-version source name walks the rename chain (a renamed column keeps
    its old rows' data, schema_storage.go:191-242); the cast absorbs
    per-version type changes."""
    expr: Column | None = None
    null = F.lit(None).cast(field.dataType)
    for v in registry:
        src = field_source_name(registry, field.name, v)
        val = decoded[v.schema_version][src].cast(field.dataType) if src else null
        cond = F.col("schema_version") == v.schema_version
        expr = F.when(cond, val) if expr is None else expr.when(cond, val)
    assert expr is not None
    return expr.otherwise(null).alias(prefix + field.name)


def _is_add_only(registry: list[SchemaVersion]) -> bool:
    """True when each version's fields are a superset of all older versions'
    (column-add-only evolution — the common case; type changes, renames, or
    drops force the general per-version decode)."""
    ordered = sorted(registry, key=lambda v: v.schema_version)
    if any(v.renames for v in ordered):
        return False
    for prev, cur in zip(ordered, ordered[1:]):
        prev_fields = {f.name: f.dataType for f in prev.schema.fields}
        cur_fields = {f.name: f.dataType for f in cur.schema.fields}
        if any(cur_fields.get(n) != t for n, t in prev_fields.items()):
            return False
    return True


def decode_payload(
    events: DataFrame,
    registry: list[SchemaVersion],
    payload_col: str = "payload",
    prefix: str = "",
) -> DataFrame:
    """Decode ``payload`` (JSON string) into typed columns of the latest
    registry schema, version-resolved per event. JVM-only fast path.

    Add-only registries decode with ONE from_json of the latest schema and
    gate each field on the version that introduced it (identical semantics,
    ~4x smaller generated code → faster whole-stage-codegen compile). The
    general path keeps one from_json per version. ``prefix`` namespaces the
    output columns (used for old-image decode, see ``decode_pre_image``).
    """
    target = latest_schema(registry)
    if _is_add_only(registry):
        intro = {
            f.name: min(
                v.schema_version for v in registry if f.name in v.field_names
            )
            for f in target.fields
        }
        d = F.from_json(F.col(payload_col), target)
        cols = [
            F.when(F.col("schema_version") >= intro[f.name], d[f.name])
            .otherwise(F.lit(None).cast(f.dataType))
            .alias(prefix + f.name)
            for f in target.fields
        ]
        return events.select("*", *cols)
    decoded = {
        v.schema_version: F.from_json(F.col(payload_col), v.schema)
        for v in registry
    }
    cols = [_field_expr(registry, f, decoded, prefix) for f in target.fields]
    return events.select("*", *cols)


def with_generated_columns(df: DataFrame, exprs: dict[str, str]) -> DataFrame:
    """Virtual/generated column fill — the mounter's
    mergeDatumWithVirtualCols (/root/reference/cdc/model/mounter.go:33-66):
    generated columns are computed at read time from the decoded row, never
    carried in the encoded payload, and excluded from the MERGE payload
    (sink.go:809 builds TableInfo without virtual columns — here, simply
    keep them out of CowTable.data_schema). Catalyst evaluates the
    expressions natively."""
    for name, e in exprs.items():
        df = df.withColumn(name, F.expr(e))
    return df


def decode_pre_image(
    events: DataFrame,
    registry: list[SchemaVersion],
    pre_payload_col: str = "pre_payload",
) -> DataFrame:
    """Decode the old-value image into ``pre_*`` columns — the mounter's
    PreColumns path (/root/reference/cdc/entry/mounter.go:256-269, 740).
    Only updates (and deletes, when the source captures old values) carry a
    pre-image; rows with a NULL pre_payload decode to all-NULL pre_* columns.
    Enables old-image expression filters (expr_filter.go update-old
    predicates) and key-change update splitting on real payloads."""
    return decode_payload(events, registry, payload_col=pre_payload_col, prefix="pre_")


def decode_payload_pandas(
    events: DataFrame,
    registry: list[SchemaVersion],
    payload_col: str = "payload",
    prefix: str = "",
) -> DataFrame:
    """Arrow-batched pandas mounter. Same output as ``decode_payload``.

    mapInPandas keeps the whole row (payload + envelope) in one pass; within
    each Arrow batch, rows are decoded grouped by schema_version — one
    vectorized ``pd.json_normalize`` per version present in the batch.
    """
    target = latest_schema(registry)
    out_schema = T.StructType(
        events.schema.fields
        + [T.StructField(prefix + f.name, f.dataType, f.nullable) for f in target.fields]
    )
    # per-version physical source name of each target field (rename chain;
    # None = field absent in that version -> NULL backfill)
    src_names = {
        v.schema_version: {
            f.name: field_source_name(registry, f.name, v) for f in target.fields
        }
        for v in registry
    }
    target_fields = [(f.name, f.dataType) for f in target.fields]

    def mount(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_cols = {name: pd.Series([None] * len(pdf), dtype="object") for name, _ in target_fields}
            for ver, grp_idx in pdf.groupby("schema_version").groups.items():
                srcs = src_names.get(int(ver))
                payloads = pdf.loc[grp_idx, payload_col]
                mask = payloads.notna()
                if not mask.any():
                    continue
                parsed = pd.json_normalize(payloads[mask].map(__import__("json").loads))
                parsed.index = payloads[mask].index
                for name, _dtype in target_fields:
                    src = srcs.get(name) if srcs is not None else name
                    if src is None:
                        continue  # backfill: stays NULL for this version
                    if src in parsed.columns:
                        out_cols[name].loc[parsed.index] = parsed[src]
            res = pdf.copy()
            for name, dtype in target_fields:
                col = out_cols[name]
                if isinstance(dtype, T.TimestampType):
                    col = pd.to_datetime(col, format="ISO8601", utc=True).dt.tz_localize(None)
                res[prefix + name] = col
            yield res

    return events.mapInPandas(mount, schema=out_schema)
