"""Event filtering — the filter/expr_filter/binlog-filter family.

Reference:
- table/schema include-exclude (/root/reference/pkg/filter/filter.go:164-238);
- SQL-expression DML filters evaluated per event type
  (/root/reference/pkg/filter/expr_filter.go:230-383);
- event-type skip rules (/root/reference/pkg/filter/sql_event_filter.go;
  /root/reference/pkg/binlog-filter/filter.go).

Spark form: all of these are Catalyst predicates — `expr()` strings the
user supplies, pushed down by the optimizer. The rule engine reduces to
building one boolean column. No custom evaluator needed (the reference
embeds TiDB's expression engine; Catalyst *is* ours).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from fnmatch import fnmatch

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class EventFilterRule:
    """One changefeed filter rule (filter.go + expr_filter.go analog).

    - ``ignore_ops``: event types to drop entirely, e.g. {"D"} to skip
      deletes (sql_event_filter analog).
    - ``ignore_insert_expr`` / ``ignore_update_new_expr`` /
      ``ignore_update_old_expr`` / ``ignore_delete_expr``: SQL expressions
      over the *decoded* row; a matching event is dropped
      (expr_filter.go:251-383 — note update has both old- and new-image
      predicates; old-image ones apply to ``pre_*`` columns).
    """

    ignore_ops: frozenset[str] = frozenset()
    ignore_insert_expr: str | None = None
    ignore_update_new_expr: str | None = None
    ignore_update_old_expr: str | None = None
    ignore_delete_expr: str | None = None
    # drop entire transactions by their start_ts (the changefeed
    # ignore-txn-start-ts option, /root/reference/pkg/filter/filter.go
    # ShouldIgnoreTxn — the escape hatch for replaying past one bad txn)
    ignore_txn_start_ts: frozenset[int] = frozenset()


def keep_predicate(rule: EventFilterRule) -> Column:
    """Boolean keep-column for decoded events (columns: op, decoded payload
    fields, and pre_* fields if update-old predicates are used)."""
    drop = F.lit(False)
    if rule.ignore_ops:
        drop = drop | F.col("op").isin(*rule.ignore_ops)
    if rule.ignore_txn_start_ts:
        drop = drop | F.col("start_ts").isin(*rule.ignore_txn_start_ts)
    if rule.ignore_insert_expr:
        drop = drop | ((F.col("op") == "I") & F.expr(rule.ignore_insert_expr))
    if rule.ignore_update_new_expr:
        drop = drop | ((F.col("op") == "U") & F.expr(rule.ignore_update_new_expr))
    if rule.ignore_update_old_expr:
        drop = drop | ((F.col("op") == "U") & F.expr(rule.ignore_update_old_expr))
    if rule.ignore_delete_expr:
        drop = drop | ((F.col("op") == "D") & F.expr(rule.ignore_delete_expr))
    # reference semantics (expr_filter.go): an event is ignored only when
    # the expression evaluates TRUE — a NULL/unknown predicate KEEPS the
    # row. Without the coalesce, three-valued logic inverts that: a NULL
    # expr makes keep NULL and DataFrame.filter drops it, silently losing
    # rows whose filtered column is NULL.
    return ~F.coalesce(drop, F.lit(False))


def apply_event_filter(events: DataFrame, rule: EventFilterRule) -> DataFrame:
    return events.filter(keep_predicate(rule))


@dataclass(frozen=True)
class BinlogFilterRule:
    """DM binlog filter rule (/root/reference/pkg/binlog-filter/filter.go):
    regex over the table name + an event-kind set, with action Ignore or Do.
    Rules evaluate in order; the first matching rule decides. ``events``
    uses this engine's op codes ({"I","U","D","DDL"}); empty = all kinds."""

    table_regex: str = ".*"
    events: frozenset[str] = frozenset()
    action: str = "ignore"  # "ignore" drops matches, "do" keeps only matches


def binlog_filter_predicate(
    rules: tuple[BinlogFilterRule, ...], table_col: str = "table_name"
) -> Column:
    """Keep-column for ordered binlog rules. rlike/isin are Catalyst
    expressions — the regex runs JVM-side, per row, pushable into the scan.

    Default for an event no rule fully matches (reference
    filter.go:341): KEEP, unless some 'do' rule's table_regex matches the
    event's table — the do-whitelist is scoped to the tables it names, so
    a do-rule on one table must not filter out every other table."""
    table_has_do: Column = F.lit(False)
    for r in rules:
        if r.action == "do":
            table_has_do = table_has_do | F.col(table_col).rlike(r.table_regex)
    keep: Column = ~table_has_do
    # fold right-to-left: earlier rules override later ones
    for rule in reversed(rules):
        hit = F.col(table_col).rlike(rule.table_regex)
        if rule.events:
            hit = hit & F.col("op").isin(*rule.events)
        keep = F.when(hit, F.lit(rule.action == "do")).otherwise(keep)
    return keep


def apply_binlog_filter(
    events: DataFrame,
    rules: tuple[BinlogFilterRule, ...],
    table_col: str = "table_name",
) -> DataFrame:
    return events.filter(binlog_filter_predicate(rules, table_col))


@dataclass(frozen=True)
class RouteRule:
    """DM table routing (dm route rules / pkg/router): source tables whose
    name matches ``table_regex`` route to ONE ``target`` table — the
    shard-merge DML path (N upstream shards → one downstream table). Rules
    evaluate in order, first match wins; non-matching tables keep their
    name. Sharding-DDL coordination (pessimistic/optimistic shard locks,
    dm/pkg/shardddl) is out of scope: shard schemas must already agree,
    which is the steady-state shard case."""

    table_regex: str
    target: str


def route_tables(
    events: DataFrame,
    rules: tuple[RouteRule, ...],
    table_col: str = "table_name",
) -> DataFrame:
    """Apply routing rules in order (first match wins). A ``target``
    containing ``$1``-style backrefs substitutes capture groups from
    ``table_regex`` — the schema-only rename case (DM routes with no
    target-table keep each table's own name: ``shard_*`` → ``merged.$1``
    must NOT collapse every table in the schema into one identity)."""
    expr: Column = F.col(table_col)
    for rule in reversed(rules):  # earlier rules applied last -> win
        target = (
            F.regexp_replace(F.col(table_col), rule.table_regex, rule.target)
            if re.search(r"\$\d", rule.target)
            else F.lit(rule.target)
        )
        expr = F.when(
            F.col(table_col).rlike(rule.table_regex), target
        ).otherwise(expr)
    return events.withColumn(table_col, expr)


def bdr_filter(
    events: DataFrame, local_origin: int, origin_col: str = "origin"
) -> DataFrame:
    """BDR-mode loop prevention (/root/reference/cdc/model/changefeed.go
    BDRMode; the reference skips rows written by TiCDC itself when both
    clusters replicate into each other). Rows a replication sink applied
    carry the SOURCE cluster's id in ``origin_col``; locally-originated
    writes carry NULL (or the local id). A changefeed out of this cluster
    replicates only local writes — a row can never ping-pong A→B→A.

    The sink side of the contract: when applying a remote batch, stamp
    ``origin_col`` with the remote cluster id (one literal column on the
    decoded frame) so the local binlog reflects it."""
    return events.filter(
        F.col(origin_col).isNull() | (F.col(origin_col) == F.lit(local_origin))
    )


@dataclass(frozen=True)
class OnlineDDLRule:
    """Online-DDL tool (gh-ost / pt-osc) table choreography — the reference
    recognizes the ghost/trash table naming and the rename cut-over
    (/root/reference/dm/syncer/online-ddl-tools/online_ddl.go):

    - trash tables (gh-ost ``_tbl_ghc``/``_tbl_del``, pt-osc ``_tbl_old``):
      every event dropped;
    - ghost tables (``_tbl_gho``, pt-osc ``_tbl_new``): DML events dropped —
      they are the row-copy duplicating the real table's own binlog — while
      DDL events route to the REAL table (regex capture group 1), which is
      how the tool's ALTER reaches the downstream at the rename barrier.

    Timing note: the reference memorizes ghost DDLs and applies them at the
    RENAME; here registering at DDL arrival is equivalent because decode is
    per-event schema_version — pre-cut-over real-table rows keep carrying
    the old version, so the new schema is inert until the first post-
    cut-over DML references it."""

    ghost_regex: str = r"^_(.+)_(?:gho|new)$"
    trash_regex: str = r"^_(.+)_(?:ghc|del|old)$"


def apply_online_ddl(
    events: DataFrame,
    rule: OnlineDDLRule = OnlineDDLRule(),
    table_col: str = "table_name",
) -> DataFrame:
    """Filter/route a change stream carrying online-DDL tool tables. Pure
    Catalyst predicates (rlike + regexp_extract), pushable into the scan."""
    is_trash = F.col(table_col).rlike(rule.trash_regex)
    is_ghost = F.col(table_col).rlike(rule.ghost_regex)
    keep = ~is_trash & ~(is_ghost & (F.col("op") != "DDL"))
    routed = F.when(
        is_ghost & (F.col("op") == "DDL"),
        F.regexp_extract(F.col(table_col), rule.ghost_regex, 1),
    ).otherwise(F.col(table_col))
    return events.filter(keep).withColumn(table_col, routed)


@dataclass(frozen=True)
class TableFilter:
    """Glob filtering over table names (filter.go:230-238). Two forms:

    - ``rules``: an ORDERED tidb-table-filter rule list — the LAST
      matching pattern decides, ``'!'`` prefix negates, a table no rule
      matches is excluded (the grammar `['*', '!test_*', 'test_keep']`
      re-includes test_keep after the exclusion — split include/exclude
      sets cannot express that). Config loaders use this form.
    - ``include``/``exclude``: the legacy split form (exclusion wins);
      kept for direct construction.
    """

    include: tuple[str, ...] = ("*",)
    exclude: tuple[str, ...] = field(default_factory=tuple)
    rules: tuple[str, ...] = ()

    def should_ignore(self, table: str) -> bool:
        if table is None:
            return True  # an unroutable row matches no pattern
        if self.rules:
            keep = False
            for p in self.rules:
                neg = p.startswith("!")
                if fnmatch(table, p[1:] if neg else p):
                    keep = not neg
            return not keep
        if any(fnmatch(table, p) for p in self.exclude):
            return True
        return not any(fnmatch(table, p) for p in self.include)

    @property
    def is_match_all(self) -> bool:
        return not self.rules and self.include == ("*",) and not self.exclude

    def apply(self, events: DataFrame, col: str = "table_name") -> DataFrame:
        # evaluated driver-side over the (small) distinct table set, then a
        # broadcast isin — pattern match never runs per row. NULL table
        # names match no pattern and drop with the excluded tables.
        if self.is_match_all:
            return events
        tables = [r[0] for r in events.select(col).distinct().collect()]
        keep = [t for t in tables if not self.should_ignore(t)]
        if len(keep) == len(tables):
            return events
        return events.filter(F.col(col).isin(keep))
