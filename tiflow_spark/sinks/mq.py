"""MQ (Kafka-style) sink: row → encoded message with partition routing.

Reference:
- MQ dml sink batches, encodes, sends (/root/reference/cdc/sink/dmlsink/mq/
  mq_dml_sink.go, worker.go:155-266);
- partition dispatchers route a row to a Kafka partition by table / handle-
  key index-value / ts / key / columns
  (/root/reference/cdc/sink/dmlsink/mq/dispatcher/partition/*.go);
- canal-JSON-ish envelope (/root/reference/pkg/sink/codec/canal/).

Spark form: encoding is one `to_json(struct(...))` projection; routing is a
hash column; "send" is `df.write.format("kafka")` on a real cluster — here
(no Kafka broker/jar) the encoded frame is returned / written to partitioned
files, which is also exactly the storage-consumer replay contract the
reference tests with (/root/reference/cmd/kafka-consumer/main.go:36).
"""

from __future__ import annotations

import re
from fnmatch import fnmatch

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# [prefix]{schema}[middle][{table}][suffix] — the reference's topic
# expression grammar (dispatcher/topic/expression.go topicNameRE)
_TOPIC_EXPR_RE = re.compile(
    r"^[A-Za-z0-9._-]*(\{schema\})?([A-Za-z0-9._-]*\{table\})?[A-Za-z0-9._-]*$"
)
_KAFKA_FORBID = "[^a-zA-Z0-9._-]"

# engine-internal columns that never ride a message's data block (the
# envelope builder and the column-selector path must agree on this set —
# a drift would leak an internal column into selector-projected messages)
_ENVELOPE_SKIP = frozenset({
    "op", "op_order", "commit_ts", "start_ts", "schema_version",
    "source_partition", "payload", "pre_payload", "table_name", "__shard",
})


def canal_json_envelope(
    decoded: DataFrame,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    data_cols: list[str] | None = None,
) -> Column:
    """Canal-JSON-like message: type, ts, pk names, data columns, plus the
    TiCDC extension block ``_tidb`` (reference canal_json_message.go's
    tidbExtension carries commitTs; ``startTs`` is added here because the
    engine's LWW total order tie-breaks on (commit_ts, start_ts, D<U<I) —
    a replay that fabricated start_ts could resolve same-commit-ts events
    to a different winner than the source table, the exact hazard the
    open-protocol codec documents)."""
    skip = {*_ENVELOPE_SKIP, *key_cols}
    if data_cols is None:
        data_cols = [
            c for c in decoded.columns if c not in skip and not c.startswith("pre_")
        ]
    return F.to_json(
        F.struct(
            F.when(F.col("op") == "I", "INSERT")
            .when(F.col("op") == "U", "UPDATE")
            .otherwise("DELETE")
            .alias("type"),
            F.col("commit_ts").alias("es"),
            F.array(*[F.lit(k) for k in key_cols]).alias("pkNames"),
            F.struct(*[F.col(c) for c in key_cols], *[F.col(c) for c in data_cols]).alias("data"),
            F.struct(
                F.col("commit_ts").alias("commitTs"),
                F.col("start_ts").alias("startTs"),
            ).alias("_tidb"),
        )
    )


def dispatch_partition(
    mode: str,
    n_partitions: int,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    columns: tuple[str, ...] | None = None,
    table_col: str | None = None,
) -> Column:
    """Partition dispatchers (dispatcher/partition/*.go):
    - "table": all rows of one table to one partition (table.go:39) —
      hash of the table identity when ``table_col`` is set (multi-table
      feed), else constant 0;
    - "index-value": hash of the handle-key values (index_value.go:45-87) —
      per-key ordering preserved, the default;
    - "ts": by commit_ts (ts.go:32);
    - "key": hash of conv_id only (hot conversations stay together);
    - "columns": hash of an arbitrary NAMED column list's (name, value)
      pairs plus the table identity (columns.go:45-87's PositionInertia
      over colName+colValue) — rows agreeing on those columns land on one
      partition regardless of the handle key. A NULL value contributes
      nothing to the hash — neither the value NOR the column-name literal
      (the reference's ``if col == nil { continue }`` skips the whole
      pair).
    """
    if mode == "table":
        if table_col is not None:
            return F.pmod(F.xxhash64(table_col), F.lit(n_partitions)).cast("int")
        return F.lit(0)
    if mode == "index-value":
        return F.pmod(F.xxhash64(*key_cols), F.lit(n_partitions)).cast("int")
    if mode == "ts":
        return F.pmod(F.col("commit_ts"), F.lit(n_partitions)).cast("int")
    if mode == "key":
        return F.pmod(F.xxhash64(key_cols[0]), F.lit(n_partitions)).cast("int")
    if mode == "columns":
        if not columns:
            raise ValueError("dispatch='columns' requires a non-empty columns list")
        parts: list = [F.col(table_col)] if table_col is not None else []
        for c in columns:
            # NULL value skips BOTH name and value (xxhash64 ignores NULL
            # inputs; the name literal is gated on the value so it drops
            # out too — the reference's `if col == nil { continue }` skips
            # the whole pair, not just the value)
            parts += [
                F.when(F.col(c).isNotNull(), F.lit(c)),
                F.col(c).cast("string"),
            ]
        return F.pmod(F.xxhash64(*parts), F.lit(n_partitions)).cast("int")
    raise ValueError(f"unknown dispatch mode {mode}")


def topic_expression(
    expr: str, table_col: str = "table_name", schema_name: str = "default"
) -> Column:
    """Per-row topic from a reference topic expression —
    ``[prefix]{schema}[middle][{table}][suffix]``
    (dispatcher/topic/expression.go Substitute): ``{schema}`` substitutes
    the changefeed's schema name, ``{table}`` the row's table name, both
    with Kafka-forbidden characters replaced by ``_``. Validated against
    the reference grammar; a plain literal (no placeholders) is a
    hard-coded topic."""
    if not _TOPIC_EXPR_RE.match(expr):
        raise ValueError(
            f"invalid topic expression {expr!r} — must match "
            "[prefix]{schema}[middle][{table}][suffix] with kafka-safe "
            "literals (dispatcher/topic/expression.go)"
        )
    parts: list[Column] = []
    for piece in re.split(r"(\{schema\}|\{table\})", expr):
        if piece == "{schema}":
            parts.append(F.lit(re.sub(_KAFKA_FORBID, "_", schema_name)))
        elif piece == "{table}":
            parts.append(F.regexp_replace(F.col(table_col), _KAFKA_FORBID, "_"))
        elif piece:
            parts.append(F.lit(piece))
    return F.concat(*parts) if parts else F.lit(expr)


def resolve_topic(expr: str, table_name: str, schema_name: str = "default") -> str:
    """Driver-side form of ``topic_expression`` for a known table name —
    used to enumerate a feed's topics (watermark/DDL/bootstrap broadcasts
    go to EVERY topic of the feed)."""
    if not _TOPIC_EXPR_RE.match(expr):
        raise ValueError(f"invalid topic expression {expr!r}")
    return (
        expr.replace("{schema}", re.sub(_KAFKA_FORBID, "_", schema_name))
        .replace("{table}", re.sub(_KAFKA_FORBID, "_", table_name))
    )


class ColumnSelector:
    """Per-table column projection for MQ messages (reference
    /root/reference/cdc/sink/dmlsink/mq/transformer/columnselector/
    column_selector.go:26-121): each rule pairs table-matcher globs with a
    column filter; the FIRST rule whose matcher hits the table applies
    (column_selector.go:127-136), and unmatched tables pass through with
    every column.

    Column-filter semantics follow tidb's table-filter ColumnFilter (the
    package the reference parses rules with): patterns are evaluated in
    order and the LAST matching pattern decides — a ``!``-prefixed pattern
    drops the column, a plain pattern keeps it; a column matching no
    pattern is dropped. The reference's verifyIndices guard
    (column_selector.go:78-83 — filtering out a handle-key column makes
    the message un-mergeable downstream) is enforced driver-side at plan
    time: a rule that would drop any ``key_cols`` raises ValueError.

    Rules are ``(matcher_globs, column_patterns)`` tuples, e.g.::

        ColumnSelector([ (("transcripts*",), ("*", "!tool")) ])
    """

    def __init__(self, rules):
        if not rules:
            raise ValueError("ColumnSelector requires at least one rule")
        self.rules = []
        for rule in rules:
            # accept the changefeed.toml dict spelling too — bare tuple
            # unpacking of a dict would silently iterate its KEY STRINGS
            # ({'matcher': ..., 'columns': ...} → ('m','a','t',...)), and
            # the selector would never match a real table
            if isinstance(rule, dict):
                unknown = set(rule) - {"matcher", "columns"}
                if unknown:
                    raise ValueError(
                        f"unsupported column-selector keys: {sorted(unknown)}"
                    )
                matcher, patterns = rule.get("matcher"), rule.get("columns")
            else:
                matcher, patterns = rule
            if not matcher or not patterns or isinstance(matcher, str):
                raise ValueError(
                    "column-selector rule needs non-empty matcher and "
                    f"columns lists, got {rule!r}"
                )
            self.rules.append((tuple(matcher), tuple(patterns)))

    @staticmethod
    def _match_column(patterns: tuple[str, ...], col: str) -> bool:
        keep = False
        matched = False
        for p in patterns:
            neg = p.startswith("!")
            if fnmatch(col, p[1:] if neg else p):
                matched, keep = True, not neg
        return matched and keep

    def retained(
        self,
        table: str,
        data_cols: list[str],
        key_cols: tuple[str, ...],
    ) -> list[str] | None:
        """Columns the matched rule keeps, or None when no rule matches
        (event passes unchanged, as in the reference transformer)."""
        for matcher, patterns in self.rules:
            if any(fnmatch(table, m) for m in matcher):
                dropped_keys = [
                    k for k in key_cols if not self._match_column(patterns, k)
                ]
                if dropped_keys:
                    raise ValueError(
                        "no primary key columns obtained after filter out: "
                        f"rule {patterns!r} drops handle key(s) "
                        f"{dropped_keys} for table {table!r} "
                        "(column_selector.go verifyIndices)"
                    )
                return [c for c in data_cols if self._match_column(patterns, c)]
        return None


def encode_for_mq(
    decoded: DataFrame,
    n_partitions: int = 16,
    dispatch: str = "index-value",
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    dispatch_columns: tuple[str, ...] | None = None,
    topic_expr: str | None = None,
    table_col: str = "table_name",
    schema_name: str = "default",
    column_selector: "ColumnSelector | None" = None,
) -> DataFrame:
    """(key, value, partition[, topic]) message frame — the exact shape
    `df.write.format("kafka")` takes (``topic`` column = per-row topic
    routing, Spark's Kafka sink picks it up when no fixed topic option is
    set). ``topic_expr`` adds the routed topic (see topic_expression);
    ``dispatch_columns`` names the hash columns for dispatch='columns';
    ``column_selector`` projects each table's message columns through its
    first matching rule (ColumnSelector) — still one JVM projection: the
    per-table envelopes form a ``when`` chain over the driver-side
    distinct table set, never a per-row Python path."""
    tcol = table_col if table_col in decoded.columns else None
    if column_selector is None:
        value = canal_json_envelope(decoded, key_cols)
    else:
        skip = {*_ENVELOPE_SKIP, *key_cols}
        all_data = [
            c for c in decoded.columns
            if c not in skip and not c.startswith("pre_")
        ]
        tables = (
            [r[0] for r in decoded.select(tcol).distinct().collect()]
            if tcol is not None else [schema_name]
        )
        if tcol is not None and any(t is None for t in tables):
            # fail loudly with a routing-level message instead of letting
            # fnmatch(None, ...) die with an unrelated TypeError (and the
            # when-chain has no .otherwise, so a NULL table would otherwise
            # silently produce a NULL message value)
            raise ValueError(
                f"encode_for_mq: NULL {tcol!r} in a column-selector feed — "
                "rows without a table name cannot be routed through "
                "per-table rules; filter or repair them upstream"
            )
        if not tables:  # empty batch: nothing to project, plain envelope
            tables, tcol = [schema_name], None
        # group tables by retained-column tuple so the when-chain stays
        # short even on feeds with many tables sharing one rule
        by_retained: dict[tuple[str, ...] | None, list[str]] = {}
        for t in tables:
            kept = column_selector.retained(t, all_data, key_cols)
            by_retained.setdefault(
                None if kept is None else tuple(kept), []
            ).append(t)
        value = None
        for kept, tbls in by_retained.items():
            env = canal_json_envelope(
                decoded, key_cols,
                data_cols=None if kept is None else list(kept),
            )
            if tcol is None:
                value = env
            elif value is None:
                value = F.when(F.col(tcol).isin(tbls), env)
            else:
                value = value.when(F.col(tcol).isin(tbls), env)
        if value is None:  # unreachable: tables is non-empty by now
            raise RuntimeError("column selector produced no envelope branch")
    cols = [
        F.to_json(F.struct(*[F.col(c) for c in key_cols])).alias("key"),
        value.alias("value"),
        dispatch_partition(
            dispatch, n_partitions, key_cols,
            columns=dispatch_columns, table_col=tcol,
        ).alias("partition"),
    ]
    if topic_expr is not None:
        cols.append(
            topic_expression(topic_expr, table_col, schema_name).alias("topic")
        )
    return decoded.select(*cols)


def resolved_messages(spark, resolved_ts: int, n_partitions: int) -> DataFrame:
    """Watermark broadcast: one TIDB_WATERMARK message per MQ partition
    (reference canal-JSON watermark extension,
    /root/reference/pkg/sink/codec/canal/canal_json_message.go, and the MQ
    sink's resolved-ts flush to EVERY partition — a consumer reading any
    single partition must still learn the watermark). Shape matches
    ``encode_for_mq`` output, so it unions into the same write."""
    from pyspark.sql import functions as F

    return spark.range(n_partitions).select(
        F.lit(None).cast("string").alias("key"),
        F.to_json(
            F.struct(
                F.lit("TIDB_WATERMARK").alias("type"),
                F.lit(int(resolved_ts)).alias("es"),
            )
        ).alias("value"),
        F.col("id").cast("int").alias("partition"),
    )


def mq_resolved_ts(frame: DataFrame) -> int | None:
    """Consumer-side watermark: newest watermark per partition, then min
    across partitions (the frontier rule — a lagging partition holds the
    stream's watermark back). None when any partition has no watermark."""
    from pyspark.sql import functions as F

    env = F.from_json("value", "type STRING, es LONG")
    per_part = (
        frame.withColumn("_t", env["type"]).withColumn("_es", env["es"])
        .groupBy("partition")
        .agg(F.max(F.when(F.col("_t") == "TIDB_WATERMARK", F.col("_es"))).alias("wm"))
    )
    row = per_part.agg(
        F.min("wm").alias("m"), F.sum(F.col("wm").isNull().cast("int")).alias("gaps")
    ).first()
    if row["m"] is None or (row["gaps"] or 0) > 0:
        return None
    return int(row["m"])


def ddl_messages(ddl_rows: DataFrame, n_partitions: int) -> DataFrame:
    """DDL broadcast: each op='DDL' change row becomes one message per MQ
    partition (reference MQ DDL sink, /root/reference/cdc/sink/ddlsink/mq/
    mq_ddl_sink.go — DDLs go to every partition so any single-partition
    consumer keeps schema lockstep). Value carries the registry payload
    (schema JSON + version) the consumer replays into its own registry."""
    from pyspark.sql import functions as F

    value = F.to_json(
        F.struct(
            F.lit("DDL").alias("type"),
            F.col("commit_ts").alias("es"),
            F.col("schema_version").alias("schemaVersion"),
            F.col("payload").alias("schemaJson"),
        )
    )
    return (
        ddl_rows.select(
            F.lit(None).cast("string").alias("key"),
            value.alias("value"),
            F.explode(F.sequence(F.lit(0), F.lit(n_partitions - 1))).alias("p"),
        )
        .select("key", "value", F.col("p").cast("int").alias("partition"))
    )


def mq_schema_versions(frame: DataFrame) -> list[tuple[int, int, str]]:
    """Consumer side of the DDL broadcast: distinct (schema_version,
    commit_ts, schema_json) triples from DDL messages — feed into
    SchemaVersion/add_version to keep the consumer registry in lockstep."""
    from pyspark.sql import functions as F

    env = F.from_json("value", "type STRING, es LONG, schemaVersion LONG, schemaJson STRING")
    rows = (
        frame.select(env.alias("e"))
        .filter(F.col("e.type") == "DDL")
        .select("e.schemaVersion", "e.es", "e.schemaJson")
        .distinct()
        .collect()
    )
    return sorted(
        (int(r["schemaVersion"]), int(r["es"]), r["schemaJson"]) for r in rows
    )


def bootstrap_messages(spark, registry, n_partitions: int) -> DataFrame:
    """The "simple" protocol's bootstrap re-broadcast (reference
    /root/reference/pkg/sink/codec/bootstraper.go:38-130 and
    pkg/sink/codec/simple/): the FULL registry — every schema version, its
    activation ts, and rename chains — re-sent in-band to every partition,
    so a consumer joining mid-stream rebuilds its registry from recent
    messages alone instead of replaying from epoch 0. One message per
    (version, partition); shape matches ``encode_for_mq`` output."""
    from pyspark.sql import functions as F

    from tiflow_spark.sources.registry import registry_df

    reg = registry_df(spark, registry)
    value = F.to_json(
        F.struct(
            F.lit("BOOTSTRAP").alias("type"),
            F.col("schema_version").alias("schemaVersion"),
            F.col("active_from_ts").alias("activeFromTs"),
            F.col("schema_json").alias("schemaJson"),
            F.col("renames_json").alias("renamesJson"),
        )
    )
    return (
        reg.select(
            F.lit(None).cast("string").alias("key"),
            value.alias("value"),
            F.explode(F.sequence(F.lit(0), F.lit(n_partitions - 1))).alias("p"),
        )
        .select("key", "value", F.col("p").cast("int").alias("partition"))
    )


def mq_registry(frame: DataFrame) -> list:
    """Late-joining consumer's registry rebuild: merge BOOTSTRAP messages
    (authoritative — they carry activation ts + renames) with any DDL
    broadcasts present in the read window, newest definition per version.
    Returns a list[SchemaVersion] ready for the mounter/codecs."""
    import json as _json

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from tiflow_spark.sources.registry import SchemaVersion

    env = F.from_json(
        "value",
        "type STRING, es LONG, schemaVersion LONG, activeFromTs LONG, "
        "schemaJson STRING, renamesJson STRING",
    )
    rows = (
        frame.select(env.alias("e"))
        .filter(F.col("e.type").isin("BOOTSTRAP", "DDL"))
        .select("e.type", "e.schemaVersion", "e.activeFromTs", "e.es",
                "e.schemaJson", "e.renamesJson")
        .distinct()
        .collect()
    )
    by_ver: dict[int, SchemaVersion] = {}
    # DDL first, BOOTSTRAP second so bootstrap (which carries the exact
    # activation ts) wins when both describe a version
    for r in sorted(rows, key=lambda r: r["type"] == "BOOTSTRAP"):
        ver = int(r["schemaVersion"])
        active = (
            int(r["activeFromTs"]) if r["activeFromTs"] is not None
            else int(r["es"]) + 1  # DDL broadcast: active after its commit
        )
        by_ver[ver] = SchemaVersion(
            ver, active,
            T.StructType.fromJson(_json.loads(r["schemaJson"])),
            renames=tuple(
                tuple(p) for p in _json.loads(r["renamesJson"] or "[]")
            ),
        )
    return [by_ver[v] for v in sorted(by_ver)]


def replay_mq(
    spark,
    mq_dir: str,
    table,
    data_schema: str,
    gate_on_watermark: bool = True,
    from_batch: int = 0,
    track_offset: bool = False,
    topic: str | None = None,
) -> dict:
    """The kafka-consumer loop as a first-class API
    (/root/reference/cmd/kafka-consumer/main.go:36): read MQ batch
    directories, decode the canal-JSON envelope, optionally gate
    application at the stream's consumer watermark (min over partitions of
    the newest TIDB_WATERMARK — rows above it may still be reordered by
    un-consumed partitions), and merge into ``table``
    exactly-once-in-effect (one merge per consumer run, fenced by the
    table's own batch id; re-running re-merges idempotently).

    ``track_offset=True`` is the long-running consumer mode (the Kafka
    group offset commit analog): the highest batch id consumed rides the
    TABLE manifest (``mq_batch``, atomic with the merge that applied it),
    and the next call reads only newer batch dirs — consumer cost ∝ new
    batches, not topic length. Offsets mark whole batches consumed, so
    this mode processes closed batches ungated and refuses the watermark
    gate (gated-out rows in a consumed batch would be silently lost; a
    gating live-tail consumer should not commit offsets).

    Returns {"watermark", "applied", "skipped_above_watermark", "up_to_batch"}.
    """
    import glob as _glob

    from pyspark.sql import functions as F

    if track_offset and gate_on_watermark:
        raise ValueError(
            "track_offset=True consumes whole batches and commits their "
            "offset — combine it with gate_on_watermark=False (a gated "
            "live tail must not commit offsets past withheld rows)"
        )
    if track_offset:
        from_batch = max(from_batch, int(table.current_manifest().get("mq_batch", -1)) + 1)

    # from_batch > 0 = a consumer joining mid-stream (its broker retention
    # starts there); with the producer's bootstrap re-broadcast it still
    # recovers the registry from the window it CAN read (mq_registry)
    paths = sorted(
        p for p in _glob.glob(f"{mq_dir}/batch=*")
        if int(p.rsplit("=", 1)[1]) >= from_batch
    )
    if not paths:
        return {"watermark": None, "applied": 0,
                "skipped_above_watermark": 0, "up_to_batch": from_batch - 1}
    up_to = max(int(p.rsplit("=", 1)[1]) for p in paths)
    frame = spark.read.parquet(*paths)
    if topic is not None:
        # a consumer subscribes to ONE topic of a multi-topic feed
        # (topic_expression routing) — partition pruning on the per-topic
        # dirs (write partitionBy("topic")) makes this a subtree read
        if "topic" not in frame.columns:
            raise ValueError(
                "replay_mq(topic=...) on a stream written without topic "
                "routing — produce with topic_expr to fan out topics"
            )
        frame = frame.filter(F.col("topic") == topic)
    wm = mq_resolved_ts(frame) if gate_on_watermark else None
    # start_ts comes from the envelope's _tidb extension (canal_json_decode)
    # so same-commit-ts ties resolve identically to the source table
    rows = canal_json_decode(frame, data_schema).withColumn(
        "source_partition", F.lit(0)
    )
    skipped = 0
    if wm is not None:
        skipped = rows.filter(F.col("commit_ts") > wm).count()
        rows = rows.filter(F.col("commit_ts") <= wm)
    stats = table.merge(
        rows,
        batch_id=table.last_committed_batch() + 1,
        manifest_extra={"mq_batch": up_to} if track_offset else None,
    )
    return {
        "watermark": wm,
        "applied": int(stats.applied_events),
        "skipped_above_watermark": int(skipped),
        "up_to_batch": up_to,
    }


def write_mq_files(frame: DataFrame, out_dir: str) -> None:
    """File-backed stand-in for the broker: one dir per partition, ordered
    within by the consumer's replay sort."""
    frame.write.mode("overwrite").partitionBy("partition").parquet(out_dir)


def write_mq_kafka(
    frame: DataFrame, bootstrap_servers: str, topic: str
) -> None:
    """The real broker write: the (key, value, partition) frame is exactly
    what Spark's Kafka sink takes. Requires the spark-sql-kafka package on
    the classpath (not present in this sandbox — the file-backed
    ``write_mq_files`` + consumer replay is the tested contract; this is the
    production path, one writer call)."""
    (
        frame.write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .save()
    )


def canal_json_decode(frame: DataFrame, data_schema: str) -> DataFrame:
    """Consumer side (/root/reference/cmd/kafka-consumer/main.go:36): parse
    the canal-JSON envelope back into change rows ready for replay into a
    CowTable — proving the encoded stream alone reconstructs state.
    ``data_schema`` is the DDL of the `data` struct (keys + data columns)."""
    from pyspark.sql import functions as F

    env = F.from_json(
        "value",
        f"type STRING, es LONG, pkNames ARRAY<STRING>, "
        f"data STRUCT<{data_schema}>, "
        f"_tidb STRUCT<commitTs: LONG, startTs: LONG>",
    )
    # watermark/DDL/bootstrap messages carry no row — they feed
    # mq_resolved_ts / mq_schema_versions / mq_registry, not the DML replay
    frame = frame.filter(~env["type"].isin("TIDB_WATERMARK", "DDL", "BOOTSTRAP"))
    return frame.select(
        F.when(env["type"] == "INSERT", "I")
        .when(env["type"] == "UPDATE", "U")
        .otherwise("D")
        .alias("op"),
        env["es"].alias("commit_ts"),
        # start_ts from the _tidb extension; envelopes written before the
        # extension fall back to commit_ts - 1 (the coarsened tie-break,
        # only correct under unique commit_ts per key)
        F.coalesce(env["_tidb"]["startTs"], env["es"] - 1).alias("start_ts"),
        F.col("value").alias("_raw"),
        env["data"].alias("_data"),
    ).select("op", "commit_ts", "start_ts", "_data.*")
