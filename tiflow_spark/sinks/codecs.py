"""Message codecs for the MQ/storage sinks — the pkg/sink/codec family.

Reference protocols re-expressed as Spark column transforms (~8k LoC of Go
encoders collapse into to_json/from_json projections the JVM vectorizes):

- open-protocol  (/root/reference/pkg/sink/codec/open/): key JSON
  {ts, tbl, t} + value JSON {u: cols} (upsert) / {d: cols} (delete).
- csv            (/root/reference/pkg/sink/codec/csv/): one line per event,
  leading operation flag (I/U/D), commit-ts and table columns, then data
  columns in schema order.
- avro-json      (/root/reference/pkg/sink/codec/avro/): the Avro JSON
  encoding of each record against the registry schema — nullable fields use
  Avro's union encoding {"string": v} / null.
- avro BINARY    (same reference, avro.go:980-993): the real binary
  encoding (spec §Binary Encoding — zigzag varints, length-prefixed utf8,
  IEEE doubles, timestamp-micros) with Confluent wire framing
  (magic 0x00 + 4-byte schema id), implemented directly from the public
  Avro spec as an Arrow-batched codec; the schema id is the registry
  schema_version and decode resolves each message against its own version.
  The remote registry HTTP handshake itself lives in
  sinks/schema_registry.py (confluent_schema_registry.go analog): wire ids
  come from the registry via encode's ``wire_id`` / decode's ``id_map``;
  without a remote registry the schema_version doubles as the wire id.
- claim-check    (/root/reference/pkg/sink/codec/common/, kafka_simple_
  claim_check tests): messages larger than the broker limit are stored
  aside; the message carries {claimCheckLocation}. Expressed set-wise: the
  frame splits into small messages + a claims table, both written in one
  pass each — no per-row driver I/O.

Every encoder has a decoder and a round-trip test; the consumer-replay test
(tests/) re-applies a decoded stream into a fresh CowTable and sync-diffs it
against the source table — exactly the reference's kafka-consumer
verification loop (/root/reference/cmd/kafka-consumer/main.go:36).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tiflow_spark.sources.registry import SchemaVersion

ENVELOPE_COLS = ("op", "commit_ts", "start_ts", "conv_id", "turn_idx", "schema_version")


def _data_cols(decoded: DataFrame, key_cols: tuple[str, ...]) -> list[str]:
    skip = {"op", "op_order", "commit_ts", "start_ts", "schema_version",
            "source_partition", "payload", "pre_payload", *key_cols}
    return [c for c in decoded.columns if c not in skip and not c.startswith("pre_")]


# ---------------------------------------------------------------- open-protocol

def open_protocol_encode(
    decoded: DataFrame,
    table: str = "transcripts",
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> DataFrame:
    """(key, value) message pair per event (open/codec key/value layout).

    Beyond the reference's key fields {ts, tbl, t}, the key carries
    ``sts`` (start_ts) and ``op``: the engine's LWW total order tie-breaks
    on (commit_ts, start_ts, D<U<I), so a replayed stream that lost either
    could resolve same-commit-ts events to a different winner than the
    source table. The reference's open protocol doesn't need them (MySQL
    sink applies in txn order); a set-wise replay does."""
    data = F.struct(
        *[F.col(c) for c in key_cols],
        *[F.col(c) for c in _data_cols(decoded, key_cols)],
    )
    value = F.when(
        F.col("op") == "D", F.to_json(F.struct(data.alias("d")))
    ).otherwise(F.to_json(F.struct(data.alias("u"))))
    key = F.to_json(
        F.struct(
            F.col("commit_ts").alias("ts"),
            F.col("start_ts").alias("sts"),
            F.col("op").alias("op"),
            F.lit(table).alias("tbl"),
            F.lit(1).alias("t"),
        )
    )
    return decoded.select(key.alias("key"), value.alias("value"))


def open_protocol_decode(
    frame: DataFrame, value_schema: T.StructType,
) -> DataFrame:
    """Inverse of ``open_protocol_encode``: back to change rows (op,
    commit_ts, start_ts, data cols) — complete enough for the replayed
    stream's LWW to resolve identically to the source."""
    key_t = "ts LONG, sts LONG, op STRING, tbl STRING, t INT"
    val_t = T.StructType(
        [T.StructField("u", value_schema), T.StructField("d", value_schema)]
    )
    k = F.from_json("key", key_t)
    v = F.from_json("value", val_t)
    row = F.coalesce(v["u"], v["d"])
    return frame.select(
        # delete is authoritative from the value envelope; I-vs-U from the
        # key (older messages without it decode as 'U' — safe: the merge
        # treats both as upserts, only the op_order tie-break coarsens)
        F.when(v["d"].isNotNull(), "D")
        .otherwise(F.coalesce(k["op"], F.lit("U")))
        .alias("op"),
        k["ts"].alias("commit_ts"),
        k["sts"].alias("start_ts"),
        *[row[f.name].alias(f.name) for f in value_schema.fields],
    )


# ---------------------------------------------------------------- csv codec

def _csv_field(col: Column) -> Column:
    """RFC-4180 quoting (reference pkg/sink/codec/csv quotes data fields):
    a field containing a delimiter, quote, or newline is wrapped in double
    quotes with inner quotes doubled. NULL encodes as unquoted \\N; data
    that IS of the form \\N (any backslash run + N) gains one extra
    backslash — the CSV parser applies nullValue even to quoted fields, so
    quoting alone cannot disambiguate (decode strips the backslash back)."""
    s = col.cast("string")
    s = F.when(s.rlike(r"^\\+N$"), F.concat(F.lit("\\"), s)).otherwise(s)
    # empty string must quote too: an unquoted empty field parses as NULL,
    # silently conflating '' with the \N sentinel (found by the codec fuzz)
    needs = (
        s.contains(",") | s.contains('"') | s.contains("\n")
        | s.contains("\r") | (F.length(s) == 0)
    )
    quoted = F.concat(F.lit('"'), F.regexp_replace(s, '"', '""'), F.lit('"'))
    return F.coalesce(F.when(needs, quoted).otherwise(s), F.lit(r"\N"))


def csv_encode(
    decoded: DataFrame,
    table: str = "transcripts",
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> DataFrame:
    """One CSV line per event: op-flag, table, commit-ts, then key+data
    columns in schema order (csv/csv_message.go layout)."""
    cols = [*key_cols, *_data_cols(decoded, key_cols)]
    fields = [F.col("op"), F.lit(table), F.col("commit_ts").cast("string")]
    fields += [_csv_field(F.col(c)) for c in cols]
    return decoded.select(F.concat_ws(",", *fields).alias("line"))


def csv_decode(
    frame: DataFrame, schema: T.StructType,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> DataFrame:
    """Inverse of ``csv_encode``. Parsing is Spark's native univocity CSV
    reader via ``from_csv`` (JVM, vectorized) configured for the encoder's
    RFC-4180 quoting — data containing commas, quotes, or newlines
    round-trips (round-2 gap: a bare split broke on any quoted comma)."""
    names = [f.name for f in schema.fields]
    parse_schema = ", ".join(
        ["op STRING", "table_name STRING", "commit_ts STRING"]
        + [f"{n} STRING" for n in names]
    )
    opts = {"quote": '"', "escape": '"', "nullValue": r"\N"}
    p = F.from_csv("line", parse_schema, opts)
    out = [
        p["op"].alias("op"),
        p["table_name"].alias("table_name"),
        p["commit_ts"].cast("long").alias("commit_ts"),
    ]
    for name in names:
        v = p[name]
        # undo the \N backslash-stuffing (see _csv_field)
        v = F.when(v.rlike(r"^\\+N$"), v.substr(F.lit(2), F.length(v))).otherwise(v)
        out.append(v.cast(schema[name].dataType).alias(name))
    return frame.select(*out)


# ---------------------------------------------------------------- avro-json

def avro_json_encode(
    decoded: DataFrame, version: SchemaVersion,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> DataFrame:
    """Avro JSON encoding of the record: nullable fields as the union form
    {"<type>": value} or null (avro spec JSON encoding; reference
    avro/avro.go builds the same record shape before binary encoding)."""
    avro_type = {
        T.StringType(): "string", T.LongType(): "long",
        T.IntegerType(): "int", T.DoubleType(): "double",
        T.TimestampType(): "string",  # logicalType timestamp as ISO string
    }

    def union(f: T.StructField) -> Column:
        t = avro_type.get(f.dataType, "string")
        col = F.col(f.name).cast("string") if t == "string" else F.col(f.name)
        return F.when(
            col.isNotNull(), F.to_json(F.struct(col.alias(t)))
        ).otherwise(F.lit("null")).alias(f.name)

    body = F.concat_ws(
        ",",
        *[
            F.concat(F.lit(f'"{f.name}":'), union(f))
            for f in version.schema.fields
        ],
    )
    key = F.to_json(F.struct(*[F.col(k) for k in key_cols]))
    return decoded.select(
        key.alias("key"),
        F.concat(F.lit("{"), body, F.lit("}")).alias("value"),
        F.lit(version.schema_version).alias("schema_id"),
    )


def avro_json_decode(frame: DataFrame, version: SchemaVersion) -> DataFrame:
    """Inverse of ``avro_json_encode`` (union-unwrapping per field)."""
    avro_type = {
        T.StringType(): "string", T.LongType(): "long",
        T.IntegerType(): "int", T.DoubleType(): "double",
        T.TimestampType(): "string",
    }
    union_schema = T.StructType(
        [
            T.StructField(
                f.name,
                T.StructType([T.StructField(avro_type.get(f.dataType, "string"), T.StringType())]),
            )
            for f in version.schema.fields
        ]
    )
    v = F.from_json("value", union_schema)
    cols = []
    for f in version.schema.fields:
        t = avro_type.get(f.dataType, "string")
        cols.append(v[f.name][t].cast(f.dataType).alias(f.name))
    return frame.select(*cols)


# ---------------------------------------------------------------- avro binary

# Avro BINARY encoding (Avro spec "Binary Encoding"; reference
# /root/reference/pkg/sink/codec/avro/avro.go) implemented directly from the
# public spec — no avro library in this environment, and none needed for the
# flat record shapes a CDC row is. Framing is the Confluent wire format the
# reference's schema-registry path emits (avro.go:980-993 +
# confluent_schema_registry.go): magic 0x00, big-endian 4-byte schema id
# (here: the registry schema_version), then the Avro body. Every field is
# the union ["null", T]: varint branch index then the value.
#
# Runs as an Arrow-batched mapInPandas codec: bytes assembly is inherently
# per-record, but rows cross into Python once per BATCH (never a row-at-a-
# time Python UDF in the plan).


def _zigzag(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _avro_read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift, acc = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _avro_field_codecs(version: SchemaVersion):
    """(encode, decode) pair per schema field. Supported Avro types:
    string, long/int (zigzag varint), double (little-endian IEEE), and
    timestamps as long timestamp-micros (Avro logical type)."""
    import struct as _struct

    codecs = []
    for f in version.schema.fields:
        t = f.dataType.simpleString()
        if t in ("bigint", "int"):
            # Arrow->pandas promotes a nullable int column to float64, so
            # non-null values arrive as np.float64 — coerce to Python int
            # (also avoids np.int64 shift wraparound in _zigzag)
            enc = lambda v: _zigzag(int(v))  # noqa: E731
            dec = _avro_read_varint
        elif t == "double":
            enc = lambda v: _struct.pack("<d", v)  # noqa: E731
            dec = lambda b, p: (_struct.unpack_from("<d", b, p)[0], p + 8)  # noqa: E731
        elif t == "timestamp":
            enc = lambda v: _zigzag(int(v.timestamp() * 1_000_000))  # noqa: E731

            def dec(b, p):
                import datetime

                us, p = _avro_read_varint(b, p)
                return (
                    datetime.datetime.fromtimestamp(us / 1_000_000, datetime.timezone.utc)
                    .replace(tzinfo=None),
                    p,
                )
        else:  # string (and stringly-typed rest)
            def enc(v):
                raw = str(v).encode("utf-8")
                return _zigzag(len(raw)) + raw

            def dec(b, p):
                n, p = _avro_read_varint(b, p)
                return b[p:p + n].decode("utf-8"), p + n

        codecs.append((f.name, enc, dec))
    return codecs


def avro_binary_encode(
    decoded: DataFrame,
    version: SchemaVersion,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    wire_id: int | None = None,
) -> DataFrame:
    """Confluent-framed Avro binary messages: (key string, value binary).
    Null fields encode as union branch 0; present fields branch 1 + value.

    ``wire_id`` is the registry-assigned global schema id to stamp into the
    framing (from ``schema_registry.register_avro_registry``); default is
    the local schema_version (registry-less deployments)."""
    import pandas as pd

    from pyspark.sql import types as PT

    codecs = _avro_field_codecs(version)
    sid = int(version.schema_version if wire_id is None else wire_id)
    frame_prefix = b"\x00" + sid.to_bytes(4, "big")
    src = decoded.select(
        F.to_json(F.struct(*[F.col(k) for k in key_cols])).alias("key"),
        *[F.col(name) for name, _, _ in codecs],
    )
    out_schema = PT.StructType(
        [
            PT.StructField("key", PT.StringType()),
            PT.StructField("value", PT.BinaryType()),
            PT.StructField("schema_id", PT.IntegerType()),
        ]
    )

    def encode(batches):
        for pdf in batches:
            values = []
            cols = [pdf[name] for name, _, _ in codecs]
            for row in zip(*cols):
                body = bytearray(frame_prefix)
                for (name, enc, _), v in zip(codecs, row):
                    # pd.isna covers None, np.nan (float-promoted nullable
                    # ints), NaT, and pd.NA generically; scalars only here
                    if v is None or (not isinstance(v, (str, bytes)) and pd.isna(v)):
                        body += _zigzag(0)  # union branch: null
                    else:
                        body += _zigzag(1) + enc(v)
                values.append(bytes(body))
            yield pd.DataFrame(
                {
                    "key": pdf["key"],
                    "value": values,
                    "schema_id": sid,
                }
            )

    return src.mapInPandas(encode, schema=out_schema)


def avro_binary_decode(
    frame: DataFrame,
    registry: list[SchemaVersion],
    id_map: dict[int, int] | None = None,
) -> DataFrame:
    """Inverse of ``avro_binary_encode``. The per-message schema id selects
    the registry version (the schema-registry lookup), so a stream spanning
    a DDL decodes each message against its own schema; output columns are
    the LATEST version's fields with NULL backfill (mounter rule).

    ``id_map`` translates registry-assigned wire ids back to local schema
    versions ({confluent_id: schema_version}, the reverse map from
    ``schema_registry.registry_from_remote``); default identity."""
    import pandas as pd

    from pyspark.sql import types as PT

    from tiflow_spark.sources.registry import latest_schema

    by_version = {int(v.schema_version): _avro_field_codecs(v) for v in registry}
    if id_map is None:
        by_id = by_version
    else:
        by_id = {int(cid): by_version[int(ver)] for cid, ver in id_map.items()}
    target = latest_schema(registry)
    out_schema = PT.StructType(
        [PT.StructField("key", PT.StringType())] + list(target.fields)
    )
    target_names = [f.name for f in target.fields]

    def decode(batches):
        for pdf in batches:
            rows = []
            for key, buf in zip(pdf["key"], pdf["value"]):
                buf = bytes(buf)
                if buf[0] != 0:
                    raise ValueError("bad Confluent framing: magic byte != 0")
                sid = int.from_bytes(buf[1:5], "big")
                codecs = by_id.get(sid)
                if codecs is None:
                    raise ValueError(f"unregistered schema id {sid}")
                pos, rec = 5, {"key": key}
                for name, _, dec in codecs:
                    branch, pos = _avro_read_varint(buf, pos)
                    if branch == 0:
                        rec[name] = None
                    else:
                        rec[name], pos = dec(buf, pos)
                rows.append(rec)
            out = pd.DataFrame(rows, columns=["key", *target_names])
            yield out

    return frame.mapInPandas(decode, schema=out_schema)


# ---------------------------------------------------------------- debezium

def debezium_encode(
    decoded: DataFrame,
    table: str = "transcripts",
    db: str = "test",
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> DataFrame:
    """Debezium JSON envelope (reference /root/reference/pkg/sink/codec/
    debezium/codec.go:979-1043): payload {before, after, source, op, ts_ms}
    with op codes c/u/d, before=null for creates, after=null for deletes,
    and the source block carrying db/table/commit_ts (codec.go:985-1005).
    ``start_ts`` rides the source block as an engine extension (same reason
    the open-protocol key carries sts: the LWW tie-break needs it on
    replay). ts_ms is the logical commit_ts directly — the reference
    converts TSO→wall-clock ms (codec.go:979), which has no analog for a
    synthetic logical clock.

    One JVM ``to_json`` projection (ignoreNullFields=false so absent images
    render as JSON null, as debezium consumers expect); nothing per-row."""
    data_cols = _data_cols(decoded, key_cols)
    after_s = F.struct(
        *[F.col(c) for c in key_cols], *[F.col(c) for c in data_cols]
    )
    # old image: pre_<col> columns where the pipeline tracked them (update
    # old-value), the current columns otherwise (delete rows carry their
    # last image in the reference's PreColumns)
    pre_avail = [c for c in data_cols if f"pre_{c}" in decoded.columns]
    pre_s = F.struct(
        *[F.col(c) for c in key_cols],
        *[
            (F.col(f"pre_{c}") if c in pre_avail else F.col(c)).alias(c)
            for c in data_cols
        ],
    )
    null_s = F.when(F.lit(False), after_s)  # typed NULL of the row struct
    before = (
        F.when(F.col("op") == "D", pre_s)
        .when((F.col("op") == "U") & F.lit(bool(pre_avail)), pre_s)
        .otherwise(null_s)
    )
    source = F.struct(
        F.lit("tiflow-spark").alias("connector"),
        F.lit(db).alias("db"),
        F.lit(table).alias("table"),
        F.col("commit_ts").alias("commit_ts"),
        F.col("start_ts").alias("start_ts"),
    )
    value = F.to_json(
        F.struct(
            before.alias("before"),
            F.when(F.col("op") == "D", null_s).otherwise(after_s).alias("after"),
            source.alias("source"),
            F.when(F.col("op") == "I", "c")
            .when(F.col("op") == "U", "u")
            .otherwise("d")
            .alias("op"),
            F.col("commit_ts").alias("ts_ms"),
        ),
        {"ignoreNullFields": "false"},
    )
    key = F.to_json(F.struct(*[F.col(k) for k in key_cols]))
    return decoded.select(key.alias("key"), value.alias("value"))


def debezium_decode(frame: DataFrame, row_schema: T.StructType) -> DataFrame:
    """Inverse of ``debezium_encode`` (reference decoder.go): envelope back
    to change rows — op c/r→I, u→U, d→D; the row image from ``after`` (or
    ``before`` for deletes); commit_ts/start_ts from the source block with
    ts_ms fallback for foreign debezium streams."""
    env = F.from_json(
        "value",
        T.StructType(
            [
                T.StructField("before", row_schema),
                T.StructField("after", row_schema),
                T.StructField(
                    "source",
                    T.StructType(
                        [
                            T.StructField("connector", T.StringType()),
                            T.StructField("db", T.StringType()),
                            T.StructField("table", T.StringType()),
                            T.StructField("commit_ts", T.LongType()),
                            T.StructField("start_ts", T.LongType()),
                        ]
                    ),
                ),
                T.StructField("op", T.StringType()),
                T.StructField("ts_ms", T.LongType()),
            ]
        ),
    )
    commit_ts = F.coalesce(env["source"]["commit_ts"], env["ts_ms"])
    row = F.when(env["op"] == "d", env["before"]).otherwise(env["after"])
    return frame.select(
        F.when(env["op"].isin("c", "r"), "I")
        .when(env["op"] == "u", "U")
        .otherwise("D")
        .alias("op"),
        commit_ts.alias("commit_ts"),
        F.coalesce(env["source"]["start_ts"], commit_ts - 1).alias("start_ts"),
        *[row[f.name].alias(f.name) for f in row_schema.fields],
    )


# ---------------------------------------------------------------- maxwell

def maxwell_encode(
    decoded: DataFrame,
    table: str = "transcripts",
    db: str = "test",
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> DataFrame:
    """Maxwell envelope (reference /root/reference/pkg/sink/codec/maxwell/
    maxwell_message.go:28-47): {database, table, type insert/update/delete,
    ts, data, old} — ``old`` carries the pre-image columns for updates
    (omitted otherwise, matching the reference's json omitempty). The key
    is the reference's internal.MessageKey {ts, schema, table}."""
    data_cols = _data_cols(decoded, key_cols)
    data_s = F.struct(
        *[F.col(c) for c in key_cols], *[F.col(c) for c in data_cols]
    )
    pre_avail = [c for c in data_cols if f"pre_{c}" in decoded.columns]
    old_s = (
        F.when(
            (F.col("op") == "U") & F.lit(bool(pre_avail)),
            F.struct(*[F.col(f"pre_{c}").alias(c) for c in pre_avail]),
        )
        if pre_avail
        else F.lit(None).cast("string")
    )
    value = F.to_json(
        F.struct(
            F.lit(db).alias("database"),
            F.lit(table).alias("table"),
            F.when(F.col("op") == "I", "insert")
            .when(F.col("op") == "U", "update")
            .otherwise("delete")
            .alias("type"),
            F.col("commit_ts").alias("ts"),
            F.col("start_ts").alias("startTs"),  # engine extension (LWW ties)
            data_s.alias("data"),
            old_s.alias("old"),
        )
    )
    key = F.to_json(
        F.struct(
            F.col("commit_ts").alias("ts"),
            F.lit(db).alias("schema"),
            F.lit(table).alias("table"),
        )
    )
    return decoded.select(key.alias("key"), value.alias("value"))


def maxwell_decode(frame: DataFrame, row_schema: T.StructType) -> DataFrame:
    """Inverse of ``maxwell_encode``: envelope back to change rows."""
    env = F.from_json(
        "value",
        T.StructType(
            [
                T.StructField("database", T.StringType()),
                T.StructField("table", T.StringType()),
                T.StructField("type", T.StringType()),
                T.StructField("ts", T.LongType()),
                T.StructField("startTs", T.LongType()),
                T.StructField("data", row_schema),
                T.StructField("old", row_schema),
            ]
        ),
    )
    return frame.select(
        F.when(env["type"] == "insert", "I")
        .when(env["type"] == "update", "U")
        .otherwise("D")
        .alias("op"),
        env["ts"].alias("commit_ts"),
        F.coalesce(env["startTs"], env["ts"] - 1).alias("start_ts"),
        *[env["data"][f.name].alias(f.name) for f in row_schema.fields],
    )


# ---------------------------------------------------------------- simple

def simple_encode(
    decoded: DataFrame,
    table: str = "transcripts",
    db: str = "test",
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> DataFrame:
    """The "simple" protocol DML envelope (reference /root/reference/pkg/
    sink/codec/simple/message.go:472-502): {version:1, database, table,
    type INSERT/UPDATE/DELETE, commitTs, schemaVersion, data, old} — data
    for inserts/updates, old for updates (pre-image when tracked) and
    deletes (last image). ``startTs`` added for LWW replay ties; buildTs
    (wall clock in the reference) is omitted for determinism. The
    protocol's BOOTSTRAP/DDL schema messages are the MQ sink's broadcast
    layer (sinks/mq.bootstrap_messages / ddl_messages)."""
    data_cols = _data_cols(decoded, key_cols)
    row_s = F.struct(
        *[F.col(c) for c in key_cols], *[F.col(c) for c in data_cols]
    )
    pre_avail = [c for c in data_cols if f"pre_{c}" in decoded.columns]
    pre_s = F.struct(
        *[F.col(c) for c in key_cols],
        *[
            (F.col(f"pre_{c}") if c in pre_avail else F.col(c)).alias(c)
            for c in data_cols
        ],
    )
    null_s = F.when(F.lit(False), row_s)
    value = F.to_json(
        F.struct(
            F.lit(1).alias("version"),
            F.lit(db).alias("database"),
            F.lit(table).alias("table"),
            F.when(F.col("op") == "I", "INSERT")
            .when(F.col("op") == "U", "UPDATE")
            .otherwise("DELETE")
            .alias("type"),
            F.col("commit_ts").alias("commitTs"),
            F.col("start_ts").alias("startTs"),
            (
                F.col("schema_version") if "schema_version" in decoded.columns
                else F.lit(None).cast("long")
            ).alias("schemaVersion"),
            F.when(F.col("op") == "D", null_s).otherwise(row_s).alias("data"),
            F.when(F.col("op") == "D", pre_s)
            .when((F.col("op") == "U") & F.lit(bool(pre_avail)), pre_s)
            .otherwise(null_s)
            .alias("old"),
        )
    )
    key = F.to_json(F.struct(*[F.col(k) for k in key_cols]))
    return decoded.select(key.alias("key"), value.alias("value"))


def simple_decode(frame: DataFrame, row_schema: T.StructType) -> DataFrame:
    """Inverse of ``simple_encode``: DML messages back to change rows
    (WATERMARK/BOOTSTRAP/DDL types pass to the broadcast consumers, not
    the row replay)."""
    env = F.from_json(
        "value",
        T.StructType(
            [
                T.StructField("version", T.IntegerType()),
                T.StructField("database", T.StringType()),
                T.StructField("table", T.StringType()),
                T.StructField("type", T.StringType()),
                T.StructField("commitTs", T.LongType()),
                T.StructField("startTs", T.LongType()),
                T.StructField("schemaVersion", T.LongType()),
                T.StructField("data", row_schema),
                T.StructField("old", row_schema),
            ]
        ),
    )
    frame = frame.filter(env["type"].isin("INSERT", "UPDATE", "DELETE"))
    row = F.when(env["type"] == "DELETE", env["old"]).otherwise(env["data"])
    return frame.select(
        F.when(env["type"] == "INSERT", "I")
        .when(env["type"] == "UPDATE", "U")
        .otherwise("D")
        .alias("op"),
        env["commitTs"].alias("commit_ts"),
        F.coalesce(env["startTs"], env["commitTs"] - 1).alias("start_ts"),
        env["schemaVersion"].alias("schema_version"),
        *[row[f.name].alias(f.name) for f in row_schema.fields],
    )


# ---------------------------------------------------------------- craft

# Craft analog (reference /root/reference/pkg/sink/codec/craft/ — model.go
# term dictionary, craft_encoder.go column groups): TiCDC's high-throughput
# binary protocol batches MANY events into one columnar message — a term
# dictionary de-duplicates repeated strings, numeric columns delta/varint
# encode, and the consumer decodes whole batches at once. Re-expressed
# Spark-first rather than wire-copied (the Go layout's size tables exist
# for streaming writers; an Arrow batch already gives us whole-batch
# framing): one message per Arrow batch, laid out as
#
#   magic "CRB1" | n_rows varint | column-count varint
#   term dictionary: n_terms varint, then len-prefixed utf8 terms
#   per column: name-term-id varint | type code (0 str, 1 long) |
#     values — strings as term ids (zigzag varint, -1 = NULL, so a column
#     of repeated values costs ~1 byte/row), longs as zigzag varint
#     DELTAS from the previous row (commit_ts batches are near-sorted, so
#     deltas are tiny)
#
# Bytes assembly is inherently per-record → Arrow-batched mapInPandas,
# same as the Avro binary codec; rows cross into Python once per batch.

CRAFT_MAGIC = b"CRB1"


def craft_encode(
    decoded: DataFrame,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> DataFrame:
    """Encode change rows into columnar craft-analog batch messages:
    one (value: binary, n_rows: int) row per Arrow batch. Columns taken
    from the frame: op, commit_ts, start_ts, keys, data columns. ENVELOPE
    and KEY longs must be non-null (fail-loud — a null commit_ts encoded
    as 0 would corrupt LWW replay order); DATA long columns are nullable
    (the mounter legitimately NULL-backfills integer columns added by a
    later schema version) and use wire type 2, which carries a per-row
    presence flag."""
    import pandas as pd

    from pyspark.sql import types as PT

    cols = ["op", "commit_ts", "start_ts", *key_cols,
            *_data_cols(decoded, key_cols)]
    src = decoded.select(*cols)
    long_cols = {
        f.name for f in src.schema.fields
        if f.dataType.simpleString() in ("bigint", "int")
    }
    # envelope timestamps and primary-key columns are non-null by contract;
    # everything else long-typed is decoded data and may be NULL-backfilled
    strict_longs = long_cols & {"commit_ts", "start_ts", *key_cols}
    out_schema = PT.StructType(
        [
            PT.StructField("value", PT.BinaryType()),
            PT.StructField("n_rows", PT.IntegerType()),
        ]
    )

    def encode(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            terms: dict[str, int] = {}

            def term_id(s) -> int:
                if s is None or (isinstance(s, float) and pd.isna(s)):
                    return -1
                s = str(s)
                if s not in terms:
                    terms[s] = len(terms)
                return terms[s]

            # first pass: term-encode string columns, delta-encode longs
            encoded_cols = []
            for c in cols:
                vals = pdf[c]
                if c in long_cols:
                    has_null = vals.isna().any()
                    if has_null and c in strict_longs:
                        # fail loudly (codebase-wide style): silently
                        # encoding NULL as 0 would round-trip a null
                        # commit_ts/start_ts as 0 and corrupt the replay's
                        # LWW order, and a NULL primary key is corrupt
                        # input by definition.
                        raise ValueError(
                            f"craft_encode: NULL in long column {c!r} — "
                            "envelope and key longs are non-null by "
                            "contract"
                        )
                    if c in strict_longs or not has_null:
                        prev, out = 0, []
                        for v in vals:
                            iv = int(v)
                            out.append(iv - prev)
                            prev = iv
                        encoded_cols.append((c, 1, out))
                    else:
                        # nullable data long: per-row presence flag, deltas
                        # run over present values only. Arrow hands a
                        # null-bearing int64 column to pandas as float64,
                        # which silently loses integer precision above
                        # 2^53 — fail loudly at the boundary rather than
                        # round-trip a changed value (the no-null tcode-1
                        # path stays int64 end-to-end and is exact).
                        if vals.dtype.kind == "f" and (
                            vals.abs() >= 2**53
                        ).any():
                            # >= not >: a corrupted 2^53+1 arrives HERE
                            # already rounded to exactly 2^53, so any
                            # value at the boundary is indistinguishable
                            # from a corrupted neighbor
                            raise ValueError(
                                f"craft_encode: nullable long column {c!r} "
                                "holds |value| >= 2^53 alongside NULLs — "
                                "the Arrow→pandas float64 carrier cannot "
                                "represent it exactly; split the column "
                                "or make it non-null"
                            )
                        prev, out = 0, []
                        for v in vals:
                            if pd.isna(v):
                                out.append(0)
                            else:
                                iv = int(v)
                                out.append(1)
                                out.append(iv - prev)
                                prev = iv
                        encoded_cols.append((c, 2, out))
                else:
                    encoded_cols.append((c, 0, [term_id(v) for v in vals]))

            body = bytearray(CRAFT_MAGIC)
            body += _zigzag(n) + _zigzag(len(cols))
            ordered = sorted(terms, key=terms.get)
            body += _zigzag(len(ordered))
            for t in ordered:
                raw = t.encode("utf-8")
                body += _zigzag(len(raw)) + raw
            for name, tcode, vals in encoded_cols:
                raw = name.encode("utf-8")
                body += _zigzag(len(raw)) + raw + _zigzag(tcode)
                for v in vals:
                    body += _zigzag(v)
            yield pd.DataFrame({"value": [bytes(body)], "n_rows": [n]})

    return src.mapInPandas(encode, schema=out_schema)


def craft_decode(frame: DataFrame, schema: T.StructType) -> DataFrame:
    """Inverse of ``craft_encode``: batch messages back to change rows.
    ``schema`` gives the output column types (term-encoded columns decode
    through the dictionary; delta columns re-accumulate)."""
    import pandas as pd

    def decode(batches):
        for pdf in batches:
            frames = []
            for buf in pdf["value"]:
                buf = bytes(buf)
                if buf[:4] != CRAFT_MAGIC:
                    raise ValueError("bad craft-analog magic")
                pos = 4
                n, pos = _avro_read_varint(buf, pos)
                n_cols, pos = _avro_read_varint(buf, pos)
                n_terms, pos = _avro_read_varint(buf, pos)
                terms = []
                for _ in range(n_terms):
                    ln, pos = _avro_read_varint(buf, pos)
                    terms.append(buf[pos:pos + ln].decode("utf-8"))
                    pos += ln
                data = {}
                for _ in range(n_cols):
                    ln, pos = _avro_read_varint(buf, pos)
                    name = buf[pos:pos + ln].decode("utf-8")
                    pos += ln
                    tcode, pos = _avro_read_varint(buf, pos)
                    vals = []
                    if tcode == 1:
                        acc = 0
                        for _ in range(n):
                            d, pos = _avro_read_varint(buf, pos)
                            acc += d
                            vals.append(acc)
                    elif tcode == 2:
                        acc = 0
                        for _ in range(n):
                            flag, pos = _avro_read_varint(buf, pos)
                            if flag == 0:
                                vals.append(None)
                            else:
                                d, pos = _avro_read_varint(buf, pos)
                                acc += d
                                vals.append(acc)
                    else:
                        for _ in range(n):
                            tid, pos = _avro_read_varint(buf, pos)
                            vals.append(None if tid < 0 else terms[tid])
                    data[name] = vals
                frames.append(pd.DataFrame(data))
            if frames:
                yield pd.concat(frames, ignore_index=True)[
                    [f.name for f in schema.fields]
                ]

    return frame.mapInPandas(decode, schema=schema)


# ---------------------------------------------------------------- claim-check

def claim_check_split(
    frame: DataFrame, max_bytes: int, claim_dir: str,
) -> DataFrame:
    """Externalize oversized messages (claim-check pattern): values above
    ``max_bytes`` are written to a claims parquet keyed by (key, claim_id);
    the returned frame carries either the inline value or a pointer message
    {"claimCheckLocation", "claimId"}. Both sides are set-wise writes — the
    large-message path never loops on the driver."""
    with_id = frame.withColumn("claim_id", F.xxhash64("key", "value"))
    big = with_id.filter(F.length("value") > max_bytes)
    big.select("claim_id", "key", "value").write.mode("overwrite").parquet(claim_dir)
    pointer = F.to_json(
        F.struct(
            F.lit(claim_dir).alias("claimCheckLocation"),
            F.col("claim_id").alias("claimId"),
        )
    )
    return with_id.select(
        "key",
        F.when(F.length("value") > max_bytes, pointer)
        .otherwise(F.col("value"))
        .alias("value"),
        (F.length("value") > max_bytes).alias("is_claim"),
    )


def claim_check_resolve(frame: DataFrame, spark, claim_dir: str) -> DataFrame:
    """Consumer side: join pointer messages back to their stored values."""
    claims = spark.read.parquet(claim_dir).select(
        F.col("claim_id"), F.col("value").alias("claim_value")
    )
    ptr = F.from_json("value", "claimCheckLocation STRING, claimId LONG")
    resolved = (
        frame.withColumn("claim_id", F.when(F.col("is_claim"), ptr["claimId"]))
        .join(F.broadcast(claims), "claim_id", "left")
        .select(
            "key",
            F.when(F.col("is_claim"), F.col("claim_value"))
            .otherwise(F.col("value"))
            .alias("value"),
        )
    )
    return resolved
