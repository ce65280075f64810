"""Changefeed configuration loader — the reference's ``changefeed.toml``
surface mapped onto this engine's operators, so a TiCDC user's existing
config file drives the same behavior here.

Reference: the replica config parsed by `cli changefeed create --config`
(/root/reference/pkg/config/replica_config.go, filter rules
pkg/config/filter.go, sink block pkg/config/sink.go; the integration-test
corpus under tests/integration_tests/*/conf/changefeed.toml exercises the
shapes this loader accepts):

- ``[filter] rules``               → operators.filters.TableFilter
  (``'!'``-prefixed globs are exclusions, as in tidb table-filter)
- ``[filter] ignore-txn-start-ts`` → EventFilterRule.ignore_txn_start_ts
- ``[[filter.event-filters]]``     → (matcher, EventFilterRule) pairs:
  ``ignore-event`` DML names map to op codes (insert→I, update→U,
  delete→D, "all dml"→all three; "all ddl"→DDL — this engine's DDL
  events are schema changes in-stream with op='DDL', so DDL ignoring is
  all-or-nothing: a fine-grained kind like "drop table" fails loudly
  rather than silently widening to every DDL),
  ``ignore-insert-value-expr`` / ``ignore-update-new-value-expr`` /
  ``ignore-update-old-value-expr`` / ``ignore-delete-value-expr`` map to
  the corresponding EventFilterRule expressions verbatim (both engines
  evaluate SQL predicates over the decoded row).
- ``[sink] protocol``              → the MQ codec name (validated against
  the implemented set).
- ``[sink] dispatchers``           → DispatcherRule list (matcher globs;
  ``partition`` mode incl. "columns" + ``columns``; ``topic``
  templates); ``dispatcher_for``/``topic_for`` resolve a table the way
  the reference's event router does (first matching rule wins,
  cdc/sink/dmlsink/mq/dispatcher/event_router.go).
- ``[sink] column-selectors``      → sinks.mq.ColumnSelector.
- ``[sink.csv]``                   → validated against this engine's
  fixed RFC-4180 dialect (delimiter ',', quote '"', NULL '\\N');
  a different dialect fails loudly instead of writing mismatched files.

Anything this engine does not implement (``[consistent]`` redo logs,
``[integrity]`` checksums, kafka large-message-handle, …) raises
ValueError naming the block — a config option silently ignored would be
a silent behavior change downstream, the one thing a migration loader
must never do.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from fnmatch import fnmatch

from tiflow_spark.operators.filters import EventFilterRule, TableFilter
from tiflow_spark.sinks.mq import ColumnSelector, resolve_topic

SUPPORTED_PROTOCOLS = {
    "open-protocol", "canal-json", "avro", "maxwell", "debezium",
    "simple", "csv", "craft",
}

_DML_EVENTS = {"insert": "I", "update": "U", "delete": "D"}

_PARTITION_MODES = {"default", "table", "index-value", "ts", "key", "columns"}

# config blocks/keys whose semantics this engine does not implement —
# fail loudly (see module docstring)
_UNSUPPORTED_BLOCKS = ("consistent", "integrity", "scheduler", "mounter")


@dataclass(frozen=True)
class DispatcherRule:
    """One ``[sink] dispatchers`` entry (matcher globs → partition mode /
    hash columns / topic template)."""

    matcher: tuple[str, ...]
    partition: str = "index-value"
    columns: tuple[str, ...] = ()
    topic: str | None = None

    def matches(self, table: str) -> bool:
        return any(fnmatch(table, m) for m in self.matcher)


@dataclass(frozen=True)
class ChangefeedConfig:
    table_filter: TableFilter = field(default_factory=TableFilter)
    event_filters: tuple[tuple[tuple[str, ...], EventFilterRule], ...] = ()
    dispatchers: tuple[DispatcherRule, ...] = ()
    column_selector: ColumnSelector | None = None
    protocol: str | None = None

    def rules_for(self, table: str) -> list[EventFilterRule]:
        """Every event-filter rule whose matcher hits ``table``, in config
        order (the reference applies all matching rules,
        pkg/filter/filter.go ShouldIgnoreDMLEvent loop)."""
        return [
            rule for matcher, rule in self.event_filters
            if any(fnmatch(table, m) for m in matcher)
        ]

    def dispatcher_for(self, table: str) -> DispatcherRule | None:
        """First matching dispatcher rule (event_router.go semantics)."""
        for d in self.dispatchers:
            if d.matches(table):
                return d
        return None

    def topic_for(self, table: str, schema: str = "default") -> str | None:
        d = self.dispatcher_for(table)
        if d is None or d.topic is None:
            return None
        return resolve_topic(d.topic, table, schema)

    def mq_kwargs(self, table: str) -> dict:
        """encode_for_mq keyword arguments for one table's rows."""
        d = self.dispatcher_for(table)
        out: dict = {"column_selector": self.column_selector}
        if d is not None:
            mode = "table" if d.partition == "default" else d.partition
            out["dispatch"] = mode
            if d.columns:
                out["dispatch_columns"] = d.columns
            if d.topic is not None:
                out["topic_expr"] = d.topic
        return out


def _parse_ignore_events(values: list[str]) -> frozenset[str]:
    ops: set[str] = set()
    for v in values:
        key = " ".join(str(v).lower().split())
        if key in _DML_EVENTS:
            ops.add(_DML_EVENTS[key])
        elif key == "all dml":
            ops.update(_DML_EVENTS.values())
        elif key == "all ddl":
            ops.add("DDL")
        else:
            raise ValueError(
                f"ignore-event {v!r}: this engine's in-stream DDL events "
                "carry whole-schema payloads, so only 'all ddl' (plus the "
                "DML kinds and 'all dml') can be ignored — a fine-grained "
                "DDL kind cannot be honored and failing loudly beats "
                "silently ignoring every DDL"
            )
    return frozenset(ops)


def _parse_event_filter(ef: dict) -> tuple[tuple[str, ...], EventFilterRule]:
    known = {
        "matcher", "ignore-event", "ignore-insert-value-expr",
        "ignore-update-new-value-expr", "ignore-update-old-value-expr",
        "ignore-delete-value-expr",
    }
    unknown = set(ef) - known
    if unknown:
        raise ValueError(f"unsupported event-filter keys: {sorted(unknown)}")
    matcher = tuple(ef.get("matcher") or ("*",))
    if ef.get("ignore-delete-value-expr"):
        # this engine's delete events carry NO row image (payload NULL on
        # op='D'); the expression would evaluate NULL on every delete —
        # under reference semantics that ignores nothing, silently
        raise ValueError(
            "ignore-delete-value-expr cannot be honored: delete events "
            "carry no row image in this log — use ignore-event=['delete'] "
            "or filter upstream"
        )
    if ef.get("ignore-update-old-value-expr"):
        # the reference evaluates old-image exprs over PLAIN column names;
        # this engine exposes the old image as pre_-prefixed columns, so a
        # migrated plain-name expr would silently test the NEW image
        raise ValueError(
            "ignore-update-old-value-expr is not honored by the loader: "
            "old-image columns are pre_-prefixed here, so the reference's "
            "plain-name expression would silently evaluate the NEW image "
            "— construct EventFilterRule(ignore_update_old_expr=...) with "
            "pre_* names directly"
        )
    rule = EventFilterRule(
        ignore_ops=_parse_ignore_events(ef.get("ignore-event") or []),
        ignore_insert_expr=ef.get("ignore-insert-value-expr"),
        ignore_update_new_expr=ef.get("ignore-update-new-value-expr"),
    )
    return matcher, rule


def _parse_dispatcher(d: dict) -> DispatcherRule:
    known = {"matcher", "partition", "dispatcher", "columns", "topic", "index"}
    unknown = set(d) - known
    if unknown:
        raise ValueError(f"unsupported dispatcher keys: {sorted(unknown)}")
    # "dispatcher" is the deprecated alias for "partition" the reference
    # still accepts (sink.go DispatchRule); honoring only one when both
    # are set mirrors its validation error
    if "partition" in d and "dispatcher" in d:
        raise ValueError(
            "dispatcher rule sets both 'partition' and its deprecated "
            "alias 'dispatcher' — keep one"
        )
    mode = d.get("partition") or d.get("dispatcher") or "index-value"
    if mode not in _PARTITION_MODES:
        raise ValueError(
            f"unknown partition mode {mode!r} (supported: "
            f"{sorted(_PARTITION_MODES)})"
        )
    if "index" in d:
        # index-value with a named index: this engine's handle key IS the
        # (single) key index; a different named index cannot be honored
        raise ValueError(
            "dispatcher 'index' (index-value over a named secondary "
            "index) is not supported — the engine dispatches on the "
            "handle key"
        )
    if mode == "columns" and not d.get("columns"):
        raise ValueError("partition='columns' requires a columns list")
    return DispatcherRule(
        matcher=tuple(d.get("matcher") or ("*",)),
        partition=mode,
        columns=tuple(d.get("columns") or ()),
        topic=d.get("topic"),
    )


def load_changefeed_config(source) -> ChangefeedConfig:
    """Parse a changefeed config from a ``.toml`` path or an
    already-parsed dict. Every accepted key maps onto an engine operator;
    every unimplemented block raises (module docstring)."""
    if isinstance(source, dict):
        cfg = source
    else:
        import tomllib

        with open(source, "rb") as f:
            cfg = tomllib.load(f)

    for block in _UNSUPPORTED_BLOCKS:
        if block in cfg:
            raise ValueError(
                f"[{block}] is not supported by this engine — remove it "
                "or handle its concern outside the changefeed (silently "
                "dropping it would change replication behavior)"
            )
    unknown_top = set(cfg) - {"filter", "sink"}
    if unknown_top:
        raise ValueError(
            f"unsupported changefeed config keys: {sorted(unknown_top)} — "
            "every accepted key maps onto an engine operator; an option "
            "silently ignored would be a silent behavior change"
        )

    filt = cfg.get("filter") or {}
    unknown_f = set(filt) - {"rules", "ignore-txn-start-ts", "event-filters"}
    if unknown_f:
        raise ValueError(f"unsupported [filter] keys: {sorted(unknown_f)}")
    # ordered tidb-table-filter rules: last match wins ('!' negates) —
    # NOT an include/exclude split, which cannot express
    # ['*', '!test_*', 'test_keep'] re-inclusion
    rules = tuple(filt.get("rules") or ("*",))
    base_rule = None
    ignore_txn = filt.get("ignore-txn-start-ts") or []
    if ignore_txn:
        base_rule = (
            ("*",),
            EventFilterRule(
                ignore_txn_start_ts=frozenset(int(t) for t in ignore_txn)
            ),
        )
    event_filters = [
        _parse_event_filter(ef) for ef in (filt.get("event-filters") or [])
    ]
    if base_rule is not None:
        event_filters.insert(0, base_rule)

    sink = cfg.get("sink") or {}
    unknown_s = set(sink) - {"protocol", "dispatchers", "column-selectors", "csv"}
    if unknown_s:
        raise ValueError(f"unsupported [sink] keys: {sorted(unknown_s)}")
    protocol = sink.get("protocol")
    if protocol is not None and protocol not in SUPPORTED_PROTOCOLS:
        raise ValueError(
            f"unsupported sink protocol {protocol!r} (implemented: "
            f"{sorted(SUPPORTED_PROTOCOLS)})"
        )
    dispatchers = tuple(
        _parse_dispatcher(d) for d in (sink.get("dispatchers") or [])
    )
    selectors = sink.get("column-selectors") or []
    column_selector = (
        ColumnSelector(
            [
                (tuple(s["matcher"]), tuple(s["columns"]))
                for s in selectors
            ]
        )
        if selectors
        else None
    )
    csv_cfg = sink.get("csv") or {}
    unknown_c = set(csv_cfg) - {"delimiter", "quote", "null", "include-commit-ts"}
    if unknown_c:
        raise ValueError(f"unsupported [sink.csv] keys: {sorted(unknown_c)}")
    if csv_cfg.get("include-commit-ts") is False:
        raise ValueError(
            "[sink.csv] include-commit-ts=false: this engine's change "
            "files always carry the commit-ts column (the replay path "
            "needs it) — a consumer expecting it absent would misparse"
        )
    dialect = {
        "delimiter": csv_cfg.get("delimiter", ","),
        "quote": csv_cfg.get("quote", '"'),
        "null": csv_cfg.get("null", r"\N"),
    }
    if dialect != {"delimiter": ",", "quote": '"', "null": r"\N"}:
        raise ValueError(
            f"[sink.csv] dialect {dialect} differs from the engine's "
            "RFC-4180 dialect (',', '\"', '\\N') — writing a different "
            "dialect than configured would corrupt the consumer"
        )

    return ChangefeedConfig(
        table_filter=TableFilter(rules=rules),
        event_filters=tuple(event_filters),
        dispatchers=dispatchers,
        column_selector=column_selector,
        protocol=protocol,
    )


# ------------------------------------------------------------- DM task.yaml

def _dm_events(values: list[str], where: str) -> frozenset[str]:
    ops: set[str] = set()
    for v in values:
        key = " ".join(str(v).lower().split())
        if key == "all":
            ops.update({"I", "U", "D", "DDL"})
        elif key == "all dml":
            ops.update(_DML_EVENTS.values())
        elif key in ("all ddl", "ddl"):
            ops.add("DDL")
        elif key in _DML_EVENTS:
            ops.add(_DML_EVENTS[key])
        else:
            raise ValueError(
                f"{where}: event kind {v!r} — this engine's op codes are "
                "I/U/D plus a single in-stream DDL kind, so only "
                "insert/update/delete/'all dml'/'all ddl'/'all' map; a "
                "fine-grained DDL kind (drop/truncate/rename ...) cannot "
                "be honored and failing loudly beats widening it"
            )
    return frozenset(ops)


def _dm_pattern_to_regex(schema_pattern: str | None, table_pattern: str | None,
                         where: str) -> str:
    """DM patterns (wildcards, or ``~``-prefixed raw regex) over this
    engine's table identity. Convention: the feed's ``table_col`` carries
    either plain upstream table names or dotted ``schema.table``; when a
    schema-pattern is anything but match-all, identities must be dotted —
    the regex matches ``schema\\.table``; otherwise the table-pattern
    alone matches the whole identity."""
    import fnmatch as _fn

    def one(p: str) -> str:
        p = p or "*"
        if p.startswith("~"):
            return f"(?:{p[1:]})"
        # fnmatch.translate appends \Z; strip it — anchoring is ours
        return f"(?:{_fn.translate(p).replace(chr(92) + 'Z', '')})"

    schema_all = schema_pattern in (None, "*", "~.*")
    if schema_all:
        return f"^{one(table_pattern)}$"
    return f"^{one(schema_pattern)}\\.{one(table_pattern)}$"


def _dm_route_rule(RouteRule, r: dict, where: str):
    """DM/sync_diff route entry → RouteRule. A schema-only rename (no
    target-table) keeps each table's own name via a capture group —
    collapsing shard_0.orders AND shard_0.users into one target identity
    would silently LWW-merge unrelated tables."""
    schema_all = r.get("schema-pattern") in (None, "*", "~.*")
    if r.get("target-table"):
        target = (
            r["target-table"] if schema_all
            else f"{r['target-schema']}.{r['target-table']}"
        )
        regex = _dm_pattern_to_regex(
            r.get("schema-pattern"), r.get("table-pattern"), where
        )
    else:
        if schema_all or not r.get("target-schema"):
            raise ValueError(
                f"{where}: a route needs target-table, or a schema "
                "rename (schema-pattern + target-schema)"
            )
        # schema rename: capture the table part, substitute per row
        import fnmatch as _fn

        sp = r["schema-pattern"]
        sre = (
            f"(?:{sp[1:]})" if sp.startswith("~")
            else "(?:%s)" % _fn.translate(sp).replace(chr(92) + "Z", "")
        )
        tp = r.get("table-pattern") or "*"
        tre = (
            f"({tp[1:]})" if tp.startswith("~")
            else "(%s)" % _fn.translate(tp).replace(chr(92) + "Z", "")
        )
        regex = f"^{sre}\\.{tre}$"
        target = f"{r['target-schema']}.$1"
    return RouteRule(table_regex=regex, target=target)


@dataclass(frozen=True)
class DmSourceConfig:
    """One mysql-instance's resolved rule bundle. Duck-types the
    ``ChangefeedConfig`` surface the runner consumes (``table_filter`` +
    ``rules_for``) and adds the DM-specific pieces: ``route_rules`` for
    ``Changefeed(route_rules=...)`` shard-merge routing and
    ``binlog_rules`` for the ordered Do/Ignore ladder (the runner applies
    them on upstream names, before routing, like dm/syncer).

    Documented deviation: in a ROUTED feed, expression filters resolve
    against the post-route target identity (the runner's per-target loop),
    not the upstream shard name — DM matches upstream. Un-routed feeds are
    unaffected (identity unchanged). Write target-identity matchers when
    routing."""

    source_id: str
    table_filter: TableFilter = field(default_factory=TableFilter)
    route_rules: tuple = ()
    binlog_rules: tuple = ()
    expression_filters: tuple[tuple[tuple[str, ...], EventFilterRule], ...] = ()

    def rules_for(self, table: str) -> list[EventFilterRule]:
        return [
            rule for matcher, rule in self.expression_filters
            if any(fnmatch(table, m) for m in matcher)
        ]


@dataclass(frozen=True)
class DmTaskConfig:
    name: str
    sources: dict[str, DmSourceConfig]

    def source(self, source_id: str) -> DmSourceConfig:
        if source_id not in self.sources:
            raise ValueError(
                f"task {self.name!r} has no mysql-instance "
                f"{source_id!r} (have: {sorted(self.sources)})"
            )
        return self.sources[source_id]


_DM_KNOWN_TOP = {
    "name", "task-mode", "is-sharding", "shard-mode", "meta-schema",
    "timezone", "target-database", "mysql-instances", "routes", "filters",
    "block-allow-list", "black-white-list", "expression-filter",
    # loader/dump stages are the full-load path — this engine replicates
    # from the change log (task-mode incremental); their configs carry no
    # replication semantics for the incremental phase
    "mydumpers", "loaders", "syncers",
    "heartbeat-update-interval", "heartbeat-report-interval",
    "enable-heartbeat", "clean-dump-file", "case-sensitive",
    "collation_compatible", "online-ddl", "online-ddl-scheme",
}


def load_dm_task(source) -> DmTaskConfig:
    """Parse a DM ``task.yaml`` (path, YAML string, or dict) into
    per-source rule bundles (reference dm/config/task.go; the tests/*/conf
    task corpus exercises these shapes):

    - ``routes``            → operators.filters.RouteRule (shard-merge);
      DM wildcard / ``~regex`` patterns become the engine's table regex,
      target = ``target-schema.target-table`` when schema patterns are in
      play, else ``target-table``.
    - ``filters``           → BinlogFilterRule (ordered Do/Ignore ladder);
      event kinds map like the changefeed loader (fine-grained DDL kinds
      fail loudly).
    - ``block-allow-list`` (and its deprecated ``black-white-list``
      spelling) → TableFilter; ``do-dbs``/``ignore-dbs`` glob the schema
      part (``db.*``), ``do-tables``/``ignore-tables`` glob ``db.tbl``;
      ``~regex`` entries fail loudly (TableFilter is glob-based).
    - ``expression-filter`` → EventFilterRule value predicates.
    - ``mysql-instances``   → which named rules each source uses.

    Unknown top-level keys raise — same migration contract as
    ``load_changefeed_config``."""
    if isinstance(source, dict):
        cfg = source
    else:
        import os

        import yaml

        text = source
        if isinstance(source, str) and os.path.exists(source):
            with open(source) as f:
                text = f.read()
        cfg = yaml.safe_load(text)
    if not isinstance(cfg, dict):
        raise ValueError("DM task config must be a mapping")

    unknown = set(cfg) - _DM_KNOWN_TOP
    if unknown:
        raise ValueError(f"unsupported DM task keys: {sorted(unknown)}")

    from tiflow_spark.operators.filters import BinlogFilterRule, RouteRule

    routes = {
        rname: _dm_route_rule(RouteRule, r, f"routes.{rname}")
        for rname, r in (cfg.get("routes") or {}).items()
    }

    binlogs = {}
    for fname, fr in (cfg.get("filters") or {}).items():
        binlogs[fname] = BinlogFilterRule(
            table_regex=_dm_pattern_to_regex(
                fr.get("schema-pattern"), fr.get("table-pattern"),
                f"filters.{fname}",
            ),
            events=_dm_events(fr.get("events") or [], f"filters.{fname}"),
            action=str(fr.get("action", "Ignore")).lower(),
        )

    def _ba_globs(block: dict) -> TableFilter:
        def check(p: str) -> str:
            if str(p).startswith("~"):
                raise ValueError(
                    "block-allow-list regex patterns (~...) are not "
                    "supported — TableFilter is glob-based; rewrite "
                    f"{p!r} as a glob"
                )
            return str(p)

        include = [f"{check(db)}.*" for db in (block.get("do-dbs") or [])]
        include += [
            f"{check(t['db-name'])}.{check(t['tbl-name'])}"
            for t in (block.get("do-tables") or [])
        ]
        exclude = [f"{check(db)}.*" for db in (block.get("ignore-dbs") or [])]
        exclude += [
            f"{check(t['db-name'])}.{check(t['tbl-name'])}"
            for t in (block.get("ignore-tables") or [])
        ]
        return TableFilter(
            include=tuple(include) or ("*",), exclude=tuple(exclude)
        )

    ba_lists = {
        n: _ba_globs(b)
        for n, b in {
            **(cfg.get("black-white-list") or {}),
            **(cfg.get("block-allow-list") or {}),
        }.items()
    }

    exprs = {}
    for ename, e in (cfg.get("expression-filter") or {}).items():
        if e.get("delete-value-expr"):
            raise ValueError(
                f"expression-filter.{ename}: delete-value-expr cannot be "
                "honored — delete events carry no row image in this log; "
                "use a binlog filter on deletes or repair upstream"
            )
        if e.get("update-old-value-expr"):
            raise ValueError(
                f"expression-filter.{ename}: update-old-value-expr is not "
                "honored by the loader — old-image columns are "
                "pre_-prefixed here, so the plain-name expression would "
                "silently evaluate the NEW image; construct "
                "EventFilterRule(ignore_update_old_expr=...) with pre_* "
                "names directly"
            )
        matcher = f"{e['schema']}.{e['table']}" if e.get("schema") else e["table"]
        exprs[ename] = (
            (matcher, e["table"]),  # dotted and plain spellings both match
            EventFilterRule(
                ignore_insert_expr=e.get("insert-value-expr"),
                ignore_update_new_expr=e.get("update-new-value-expr"),
            ),
        )

    def pick(names, pool, kind):
        out = []
        for n in names or []:
            if n not in pool:
                raise ValueError(f"mysql-instance references unknown {kind} {n!r}")
            out.append(pool[n])
        return tuple(out)

    sources = {}
    for inst in cfg.get("mysql-instances") or []:
        sid = inst["source-id"]
        ba_name = inst.get("block-allow-list") or inst.get("black-white-list")
        if ba_name is not None and ba_name not in ba_lists:
            raise ValueError(
                f"mysql-instance references unknown block-allow-list {ba_name!r}"
            )
        sources[sid] = DmSourceConfig(
            source_id=sid,
            table_filter=ba_lists.get(ba_name, TableFilter()),
            route_rules=pick(inst.get("route-rules"), routes, "route rule"),
            binlog_rules=pick(inst.get("filter-rules"), binlogs, "filter rule"),
            expression_filters=pick(
                inst.get("expression-filters"), exprs, "expression filter"
            ),
        )
    return DmTaskConfig(name=str(cfg.get("name", "task")), sources=sources)


# -------------------------------------------------------- sync_diff config

@dataclass(frozen=True)
class DiffTableConfig:
    """One ``[table-configs.X]`` block: a row-range predicate and columns
    excluded from comparison for the tables it targets."""

    target_tables: tuple[str, ...]
    range_expr: str | None = None
    ignore_columns: tuple[str, ...] = ()

    def matches(self, table: str) -> bool:
        return any(fnmatch(table, p) for p in self.target_tables)


@dataclass(frozen=True)
class DiffTaskConfig:
    """sync_diff's diff_config.toml mapped onto operators/validate
    (reference /root/reference/sync_diff_inspector/config/config.go; the
    config corpus under sync_diff_inspector/config/*.toml exercises these
    shapes). Connection blocks (host/port/user/password/session/snapshot)
    are N/A here — sources are DataFrames — but each data-source's
    route-rules are honored. ``diff()`` runs the chunked checksum compare
    with the table's range/ignore-columns config and, when
    ``export-fix-sql`` is set, the fix-SQL artifact."""

    table_filter: TableFilter
    route_rules_by_source: dict[str, tuple]
    table_configs: tuple[DiffTableConfig, ...]
    export_fix_sql: bool = True
    check_thread_count: int = 4
    check_struct_only: bool = False

    def table_config(self, table: str) -> DiffTableConfig | None:
        for tc in self.table_configs:
            if tc.matches(table):
                return tc
        return None

    def diff(self, expected, actual, table: str, key_cols, data_cols,
             schema: str = "db"):
        """Compare one checked table: DiffResult plus (when configured)
        the fix-SQL statements. ``n_chunks`` scales with
        check-thread-count (the reference's parallelism knob is its chunk
        count); range/ignore-columns come from the matching table-config."""
        from tiflow_spark.operators.validate import (
            diff_tables, fix_sql_statements,
        )

        if self.table_filter.should_ignore(table):
            raise ValueError(
                f"{table!r} is not in target-check-tables — refusing to "
                "diff a table the config excludes"
            )
        tc = self.table_config(table)
        if tc is not None and tc.range_expr:
            from pyspark.sql import functions as F

            expected = expected.filter(F.expr(tc.range_expr))
            actual = actual.filter(F.expr(tc.range_expr))
        cols = list(data_cols)
        if tc is not None:
            cols = [c for c in cols if c not in tc.ignore_columns]
        result = diff_tables(
            expected, actual, key_cols=list(key_cols), compare_cols=cols,
            n_chunks=max(self.check_thread_count * 4, 4),
        )
        fix = None
        if self.export_fix_sql and not result.identical:
            dotted = table.split(".", 1)
            sch, tbl = (dotted if len(dotted) == 2 else (schema, table))
            fix = fix_sql_statements(
                expected, actual, key_cols=list(key_cols), data_cols=cols,
                schema=sch, table=tbl,
            )
        return result, fix


def load_diff_config(source) -> DiffTaskConfig:
    """Parse a sync_diff ``diff_config.toml`` (path or dict). Unknown
    top-level keys and non-empty ``index-fields`` (chunking by a named
    secondary index — this engine chunks by key hash) fail loudly."""
    if isinstance(source, dict):
        cfg = dict(source)
    else:
        import tomllib

        with open(source, "rb") as f:
            cfg = tomllib.load(f)

    known = {
        "check-thread-count", "export-fix-sql", "check-struct-only",
        "data-sources", "routes", "task", "table-configs",
    }
    unknown = set(cfg) - known
    if unknown:
        raise ValueError(f"unsupported diff config keys: {sorted(unknown)}")
    if cfg.get("check-struct-only"):
        raise ValueError(
            "check-struct-only=true compares schemas without data — "
            "compare DataFrame .schema objects directly instead; this "
            "runner is the data path"
        )

    from tiflow_spark.operators.filters import RouteRule

    routes = {
        rname: _dm_route_rule(RouteRule, r, f"routes.{rname}")
        for rname, r in (cfg.get("routes") or {}).items()
    }
    by_source = {}
    for sname, s in (cfg.get("data-sources") or {}).items():
        rr = []
        for rn in s.get("route-rules") or []:
            if rn not in routes:
                raise ValueError(
                    f"data-source {sname!r} references unknown route {rn!r}"
                )
            rr.append(routes[rn])
        by_source[sname] = tuple(rr)

    task = cfg.get("task") or {}
    checked = tuple(task.get("target-check-tables") or ("*",))

    tcs = []
    for tname, tc in (cfg.get("table-configs") or {}).items():
        idx = [f for f in (tc.get("index-fields") or []) if f]
        if idx:
            raise ValueError(
                f"table-configs.{tname}: index-fields {idx} — chunking by "
                "a named index is not supported (chunks are key-hash "
                "ranges here); remove it"
            )
        tcs.append(
            DiffTableConfig(
                target_tables=tuple(tc.get("target-tables") or ("*",)),
                range_expr=tc.get("range") or None,
                ignore_columns=tuple(
                    c for c in (tc.get("ignore-columns") or []) if c
                ),
            )
        )

    return DiffTaskConfig(
        table_filter=TableFilter(rules=checked),
        route_rules_by_source=by_source,
        table_configs=tuple(tcs),
        export_fix_sql=bool(cfg.get("export-fix-sql", True)),
        check_thread_count=int(cfg.get("check-thread-count", 4)),
    )
