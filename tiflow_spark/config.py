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
    rule = EventFilterRule(
        ignore_ops=_parse_ignore_events(ef.get("ignore-event") or []),
        ignore_insert_expr=ef.get("ignore-insert-value-expr"),
        ignore_update_new_expr=ef.get("ignore-update-new-value-expr"),
        ignore_update_old_expr=ef.get("ignore-update-old-value-expr"),
        ignore_delete_expr=ef.get("ignore-delete-value-expr"),
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

    filt = cfg.get("filter") or {}
    rules = list(filt.get("rules") or ["*"])
    include = tuple(r for r in rules if not r.startswith("!")) or ("*",)
    exclude = tuple(r[1:] for r in rules if r.startswith("!"))
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
        table_filter=TableFilter(include=include, exclude=exclude),
        event_filters=tuple(event_filters),
        dispatchers=dispatchers,
        column_selector=column_selector,
        protocol=protocol,
    )
