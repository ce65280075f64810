"""Confluent-compatible schema-registry HTTP client.

Reference: /root/reference/pkg/sink/codec/avro/confluent_schema_registry.go
(Register :118-203, Lookup :205-290, ClearRegistry :355-391, httpRetry
:413-467, GetCachedOrRegister :292-353) and schema_manager.go. The remote
handshake was the one piece of the reference's Avro path previously out of
scope; this client closes it with stdlib ``urllib`` only — no external HTTP
dependency, and strictly DRIVER-side: schemas are registered once per DDL
(never from an executor task), then the integer ids ride every message via
the Confluent wire framing that ``avro_binary_encode`` already emits.

Protocol (public Confluent Schema Registry REST API v1):
- POST /subjects/{subject}/versions  body {"schema": "..."}  -> {"id": N}
- GET  /schemas/ids/{id}                                     -> {"schema": "..."}
- DELETE /subjects/{subject}                                 -> [versions]

Transient failures (connection errors, HTTP 5xx) retry with backoff like
the reference's httpRetry; 4xx is a caller bug and fails loudly.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.parse
import urllib.request

from pyspark.sql import types as T

from tiflow_spark.sources.registry import SchemaVersion

ACCEPT = (
    "application/vnd.schemaregistry.v1+json, "
    "application/vnd.schemaregistry+json, application/json"
)
CONTENT_TYPE = "application/vnd.schemaregistry.v1+json"

# Spark type <-> Avro schema entry. Timestamps are Avro long with the
# timestamp-micros logical type (what avro.go emits for TiDB TIMESTAMP);
# every field is the union ["null", T] (all TiCDC Avro fields are nullable
# unions, avro.go:438-447).
_SPARK_TO_AVRO = {
    "string": "string",
    "bigint": "long",
    "int": "int",
    "double": "double",
    "boolean": "boolean",
    "binary": "bytes",
    "timestamp": {"type": "long", "logicalType": "timestamp-micros"},
}
_AVRO_TO_SPARK = {
    "string": T.StringType(),
    "long": T.LongType(),
    "int": T.IntegerType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "bytes": T.BinaryType(),
    json.dumps(
        {"type": "long", "logicalType": "timestamp-micros"}, sort_keys=True
    ): T.TimestampType(),
}


def avro_schema_json(version: SchemaVersion, name: str = "TranscriptRow") -> str:
    """The Avro record schema for a registry version — the document the
    reference registers (schema_manager.go builds the same shape from the
    table's column infos)."""
    fields = []
    for f in version.schema.fields:
        t = f.dataType.simpleString()
        if t not in _SPARK_TO_AVRO:
            raise ValueError(f"no Avro mapping for Spark type {t!r} (field {f.name})")
        fields.append({"name": f.name, "type": ["null", _SPARK_TO_AVRO[t]], "default": None})
    return json.dumps(
        {"type": "record", "name": name, "fields": fields}, sort_keys=True
    )


def schema_from_avro_json(schema_json: str) -> T.StructType:
    """Rebuild the Spark payload schema from a fetched Avro record schema —
    the consumer side of the handshake (a replica that has only the registry
    URL and the wire bytes can reconstruct decode codecs)."""
    doc = json.loads(schema_json)
    if doc.get("type") != "record":
        raise ValueError(f"expected an Avro record schema, got {doc.get('type')!r}")
    fields = []
    for f in doc["fields"]:
        branches = f["type"] if isinstance(f["type"], list) else [f["type"]]
        non_null = [b for b in branches if b != "null"]
        if len(non_null) != 1:
            raise ValueError(f"field {f['name']!r}: expected a [null, T] union")
        key = (
            non_null[0]
            if isinstance(non_null[0], str)
            else json.dumps(non_null[0], sort_keys=True)
        )
        if key not in _AVRO_TO_SPARK:
            raise ValueError(f"field {f['name']!r}: unsupported Avro type {non_null[0]!r}")
        fields.append(T.StructField(f["name"], _AVRO_TO_SPARK[key]))
    return T.StructType(fields)


class SchemaRegistryError(RuntimeError):
    def __init__(self, status: int, body: str):
        super().__init__(f"schema registry HTTP {status}: {body[:200]}")
        self.status = status


class SchemaRegistryClient:
    """Driver-side registry client with the reference's retry + cache shape."""

    def __init__(
        self,
        base_url: str,
        timeout: float = 5.0,
        max_retries: int = 3,
        backoff: float = 0.1,
    ):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout
        self.max_retries = max_retries
        self.backoff = backoff
        # (subject, schema_json) -> id; the GetCachedOrRegister cache
        self._reg_cache: dict[tuple[str, str], int] = {}
        # id -> schema_json; the Lookup cache (ids are immutable)
        self._lookup_cache: dict[int, str] = {}

    # -- transport ---------------------------------------------------------
    def _request(self, method: str, path: str, body: dict | None = None) -> object:
        url = self.base_url + path
        data = json.dumps(body).encode() if body is not None else None
        last: Exception | None = None
        for attempt in range(self.max_retries + 1):
            req = urllib.request.Request(url, data=data, method=method)
            req.add_header("Accept", ACCEPT)
            if data is not None:
                req.add_header("Content-Type", CONTENT_TYPE)
            try:
                with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                    return json.loads(resp.read().decode() or "null")
            except urllib.error.HTTPError as e:
                text = e.read().decode(errors="replace")
                if e.code >= 500:  # transient server side: retry
                    last = SchemaRegistryError(e.code, text)
                else:  # 4xx: caller bug — fail loudly, no retry
                    raise SchemaRegistryError(e.code, text) from None
            except urllib.error.URLError as e:  # connection refused/reset
                last = e
            if attempt < self.max_retries:  # no dead sleep after the last try
                time.sleep(self.backoff * (2**attempt))
        raise SchemaRegistryError(0, f"retries exhausted for {method} {url}: {last}")

    # -- API ---------------------------------------------------------------
    def register(self, subject: str, schema_json: str) -> int:
        """POST the schema under ``subject``; returns the global schema id
        (idempotent server-side: re-posting an identical schema returns the
        existing id)."""
        path = f"/subjects/{urllib.parse.quote(subject, safe='')}/versions"
        out = self._request("POST", path, {"schema": schema_json})
        return int(out["id"])

    def lookup(self, schema_id: int) -> str:
        """GET the schema document for a wire-format id (cached: ids are
        immutable, confluent_schema_registry.go:282-287)."""
        if schema_id not in self._lookup_cache:
            out = self._request("GET", f"/schemas/ids/{int(schema_id)}")
            self._lookup_cache[schema_id] = out["schema"]
        return self._lookup_cache[schema_id]

    def clear(self, subject: str) -> list[int]:
        """DELETE the subject (test/teardown path, ClearRegistry analog)."""
        out = self._request(
            "DELETE", f"/subjects/{urllib.parse.quote(subject, safe='')}"
        )
        return [int(v) for v in (out or [])]

    def get_cached_or_register(self, subject: str, schema_json: str) -> int:
        key = (subject, schema_json)
        if key not in self._reg_cache:
            self._reg_cache[key] = self.register(subject, schema_json)
        return self._reg_cache[key]


def register_avro_registry(
    client: SchemaRegistryClient, registry: list[SchemaVersion], subject: str
) -> dict[int, int]:
    """Register every schema version of a changefeed's registry under one
    value subject (the reference registers "<topic>-value"); returns
    {schema_version: confluent_id} — the id_map ``avro_binary_encode``
    stamps into the wire framing."""
    return {
        v.schema_version: client.get_cached_or_register(subject, avro_schema_json(v))
        for v in sorted(registry, key=lambda v: v.schema_version)
    }


def registry_from_remote(
    client: SchemaRegistryClient, id_map: dict[int, int]
) -> tuple[list[SchemaVersion], dict[int, int]]:
    """Consumer-side handshake: given the producer's {schema_version:
    confluent_id} map (or just the ids observed on the wire), fetch each
    schema document and rebuild decode-capable SchemaVersions. Returns
    (registry, reverse_map {confluent_id: schema_version})."""
    registry = []
    reverse = {}
    for version, cid in sorted(id_map.items()):
        struct = schema_from_avro_json(client.lookup(cid))
        # active_from_ts is a producer-side routing fact the consumer does
        # not need for decode (each message carries its id); 0 keeps the
        # SchemaVersion well-formed
        registry.append(SchemaVersion(version, 0, struct))
        reverse[cid] = version
    return registry, reverse
