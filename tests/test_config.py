"""Changefeed-config loader: the reference's changefeed.toml shapes map
onto this engine's operators, and every unimplemented block fails loudly
(the migration contract: no silently dropped semantics)."""

import textwrap

import pytest
from pyspark.sql import functions as F

from tiflow_spark.config import load_changefeed_config

SAMPLE = textwrap.dedent(
    """
    [filter]
    rules = ['app_*', '!app_secrets']
    ignore-txn-start-ts = [99, 100]

    [[filter.event-filters]]
    matcher = ["app_events*"]
    ignore-event = ["delete"]
    ignore-insert-value-expr = "role = 'bot'"

    [[filter.event-filters]]
    matcher = ["app_tmp*"]
    ignore-event = ["all dml"]

    [sink]
    protocol = "canal-json"
    dispatchers = [
        {matcher = ['app_events*'], partition = "ts", topic = "{schema}_{table}"},
        {matcher = ['app_*'], partition = "columns", columns = ['role']},
    ]
    column-selectors = [
        {matcher = ['app_events*'], columns = ['*', '!tool']},
    ]
    """
)


def _load(tmp_path, text=SAMPLE):
    p = tmp_path / "changefeed.toml"
    p.write_text(text)
    return load_changefeed_config(str(p))


def test_full_sample_maps_to_operators(tmp_path):
    cfg = _load(tmp_path)

    # [filter] rules: '!' prefix = exclusion (tidb table-filter)
    assert not cfg.table_filter.should_ignore("app_events_1")
    assert cfg.table_filter.should_ignore("app_secrets")
    assert cfg.table_filter.should_ignore("other")

    # ignore-txn-start-ts becomes a '*'-matcher rule applied first
    rules = cfg.rules_for("app_events_1")
    assert rules[0].ignore_txn_start_ts == frozenset({99, 100})
    # the table-scoped rule follows, with ops and expr mapped verbatim
    assert rules[1].ignore_ops == frozenset({"D"})
    assert rules[1].ignore_insert_expr == "role = 'bot'"
    # "all dml" expands to the three op codes
    assert cfg.rules_for("app_tmp_x")[1].ignore_ops == frozenset("IUD")

    # dispatchers: first matching rule wins (event_router.go)
    d = cfg.dispatcher_for("app_events_1")
    assert d.partition == "ts" and d.topic == "{schema}_{table}"
    assert cfg.dispatcher_for("app_users").partition == "columns"
    assert cfg.dispatcher_for("zzz") is None
    assert cfg.topic_for("app_events_1", schema="db") == "db_app_events_1"

    # column selector: first matching rule projects, key cols guarded
    kept = cfg.column_selector.retained(
        "app_events_1", ["role", "text", "tool"], ("conv_id", "turn_idx")
    )
    assert kept == ["role", "text"]

    assert cfg.protocol == "canal-json"


def test_mq_kwargs_drive_encode_for_mq(spark, tmp_path):
    """The resolved kwargs run the real MQ encoder: per-table topic from
    the template, partition mode from the rule."""
    from tiflow_spark.sinks.mq import encode_for_mq

    cfg = _load(tmp_path)
    frame = spark.createDataFrame(
        [("I", 10, 9, "c1", 0, "user", "hi", None, "app_events_1")],
        "op STRING, commit_ts LONG, start_ts LONG, conv_id STRING, "
        "turn_idx INT, role STRING, text STRING, tool STRING, "
        "table_name STRING",
    )
    out = encode_for_mq(frame, n_partitions=4,
                        **cfg.mq_kwargs("app_events_1")).first()
    assert out["topic"] == "default_app_events_1"
    assert out["partition"] == 10 % 4  # partition = "ts" mode
    assert '"tool"' not in out["value"]  # selector dropped 'tool'


def test_unsupported_blocks_and_values_fail_loudly(tmp_path):
    with pytest.raises(ValueError, match=r"\[consistent\]"):
        _load(tmp_path, "[consistent]\nlevel = 'eventual'\n")
    with pytest.raises(ValueError, match="protocol"):
        _load(tmp_path, "[sink]\nprotocol = 'arvo-typo'\n")
    with pytest.raises(ValueError, match="dialect"):
        _load(tmp_path, "[sink.csv]\ndelimiter = '|'\n")
    with pytest.raises(ValueError, match="fine-grained"):
        _load(
            tmp_path,
            "[[filter.event-filters]]\nmatcher = ['t']\n"
            "ignore-event = ['drop table']\n",
        )
    with pytest.raises(ValueError, match="index"):
        _load(
            tmp_path,
            "[sink]\ndispatchers = ["
            "{matcher = ['t'], partition = 'index-value', index = 'i'}]\n",
        )
    with pytest.raises(ValueError, match="deprecated"):
        load_changefeed_config(
            {"sink": {"dispatchers": [
                {"matcher": ["t"], "partition": "ts", "dispatcher": "ts"}
            ]}}
        )
    with pytest.raises(ValueError, match="columns list"):
        load_changefeed_config(
            {"sink": {"dispatchers": [
                {"matcher": ["t"], "partition": "columns"}
            ]}}
        )


def test_dict_source_and_defaults():
    cfg = load_changefeed_config({})
    assert not cfg.table_filter.should_ignore("anything")
    assert cfg.rules_for("t") == []
    assert cfg.dispatcher_for("t") is None
    assert cfg.mq_kwargs("t") == {"column_selector": None}
    # deprecated 'dispatcher' alias alone still works; 'default' → table
    cfg2 = load_changefeed_config(
        {"sink": {"dispatchers": [
            {"matcher": ["t*"], "dispatcher": "default"}
        ]}}
    )
    assert cfg2.mq_kwargs("t1")["dispatch"] == "table"


# -------------------------------------------------- config-driven live feed

EV_SCHEMA = (
    "op STRING, commit_ts LONG, start_ts LONG, conv_id STRING, turn_idx INT, "
    "schema_version LONG, payload STRING, pre_payload STRING, "
    "source_partition INT"
)


def _ev(op, cts, conv, text, ver=1):
    return (op, cts, cts - 1, conv, 0, ver,
            None if op == "D" else f'{{"role":"u","text":"{text}"}}',
            None, 0)


def test_config_drives_multi_table_feed(spark, tmp_path):
    """A changefeed config applied to the REAL runner: the [filter] rules
    drop an entire table, a matched event-filter ignores deletes and
    expr-matched inserts, and unmatched tables replicate untouched."""
    from tiflow_spark.sinks.cow_table import CowTable
    from tiflow_spark.sources.registry import PAYLOAD_V1, SchemaVersion
    from tiflow_spark.streaming.runner import Changefeed

    cfg = load_changefeed_config({
        "filter": {
            "rules": ["t_*", "!t_skip"],
            "event-filters": [{
                "matcher": ["t_keep"],
                "ignore-event": ["delete"],
                "ignore-insert-value-expr": "text = 'spam'",
            }],
        },
    })
    rows = [
        (*_ev("I", 10, "a", "hello"), "t_keep"),
        (*_ev("I", 20, "b", "spam"), "t_keep"),     # expr-ignored
        (*_ev("D", 30, "a", None), "t_keep"),       # op-ignored: a survives
        (*_ev("U", 40, "c", "upd"), "t_keep"),
        (*_ev("I", 10, "x", "dropped"), "t_skip"),  # table-filtered
        (*_ev("I", 10, "y", "plain"), "t_other"),   # no rule matches: as-is
    ]
    events_dir = str(tmp_path / "events")
    spark.createDataFrame(rows, EV_SCHEMA + ", table_name STRING").coalesce(
        1).write.parquet(events_dir)
    reg = [SchemaVersion(1, 0, PAYLOAD_V1)]
    tables = {
        n: (CowTable(spark, str(tmp_path / n), n_buckets=2), reg)
        for n in ("t_keep", "t_skip", "t_other")
    }
    feed = Changefeed(
        spark=spark, events_dir=events_dir,
        checkpoint_dir=str(tmp_path / "ckpt"),
        tables=tables, config=cfg,
    )
    feed.run_available_now()
    keep = {r["conv_id"]: r["text"]
            for r in tables["t_keep"][0].snapshot().collect()}
    assert keep == {"a": "hello", "c": "upd"}
    assert tables["t_skip"][0].snapshot().count() == 0
    other = {r["conv_id"]: r["text"]
             for r in tables["t_other"][0].snapshot().collect()}
    assert other == {"y": "plain"}


def test_config_all_ddl_ignore_skips_schema_evolution(spark, tmp_path):
    """'all ddl' in ignore-event drops op='DDL' rows BEFORE registration,
    so the sink schema never evolves — the reference's DDL-filter
    semantics, not just row suppression."""
    import json

    from tiflow_spark.sinks.cow_table import CowTable
    from tiflow_spark.sources.registry import (
        PAYLOAD_V1, PAYLOAD_V2, SchemaVersion,
    )
    from tiflow_spark.streaming.runner import Changefeed

    cfg = load_changefeed_config({
        "filter": {"event-filters": [{
            "matcher": ["transcripts"], "ignore-event": ["all ddl"],
        }]},
    })
    ddl_payload = json.dumps(
        SchemaVersion(2, 15, PAYLOAD_V2).schema.jsonValue()
    )
    rows = [
        _ev("I", 10, "a", "one"),
        ("DDL", 15, 14, "ddl", 0, 2, ddl_payload, None, 0),
        _ev("I", 20, "b", "two"),
    ]
    events_dir = str(tmp_path / "events")
    spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.parquet(
        events_dir)
    table = CowTable(spark, str(tmp_path / "t"), n_buckets=2)
    feed = Changefeed(
        spark=spark, events_dir=events_dir,
        checkpoint_dir=str(tmp_path / "ckpt"), table=table,
        registry=[SchemaVersion(1, 0, PAYLOAD_V1)],
        ddl_in_stream=True, config=cfg,
    )
    feed.run_available_now()
    assert {r["conv_id"] for r in table.snapshot().collect()} == {"a", "b"}
    # v2's 'tool' column never registered nor reached the sink schema
    assert len(feed.registry) == 1
    assert "tool" not in table.snapshot().columns


def test_config_excluding_the_only_table_is_rejected(spark, tmp_path):
    from tiflow_spark.sinks.cow_table import CowTable
    from tiflow_spark.sources.registry import PAYLOAD_V1, SchemaVersion
    from tiflow_spark.streaming.runner import Changefeed

    cfg = load_changefeed_config({"filter": {"rules": ["other_*"]}})
    with pytest.raises(ValueError, match="only table"):
        Changefeed(
            spark=spark, events_dir=str(tmp_path / "e"),
            checkpoint_dir=str(tmp_path / "c"),
            table=CowTable(spark, str(tmp_path / "t"), n_buckets=2),
            registry=[SchemaVersion(1, 0, PAYLOAD_V1)], config=cfg,
        )


# ------------------------------------------------------------ DM task.yaml

DM_TASK = """
name: shard-merge-task
task-mode: all

mysql-instances:
  - source-id: "mysql-replica-01"
    route-rules: ["merge-t"]
    filter-rules: ["no-deletes"]
    block-allow-list: "only-sharding"
    expression-filters: ["skip-bot"]

routes:
  merge-t:
    schema-pattern: "sharding*"
    table-pattern: "t_*"
    target-schema: "merged"
    target-table: "t"

filters:
  no-deletes:
    schema-pattern: "sharding*"
    table-pattern: "t_*"
    events: ["delete"]
    action: Ignore

block-allow-list:
  only-sharding:
    do-dbs: ["sharding*"]
    ignore-tables:
      - db-name: "sharding_1"
        tbl-name: "t_quarantined"

expression-filter:
  skip-bot:
    schema: "merged"
    table: "t"
    insert-value-expr: "role = 'bot'"
"""


def test_dm_task_loader_maps_rules():
    from tiflow_spark.config import load_dm_task

    task = load_dm_task(DM_TASK)
    src = task.source("mysql-replica-01")

    # block-allow: sharding dbs in, other dbs and the ignored table out
    assert not src.table_filter.should_ignore("sharding_1.t_1")
    assert src.table_filter.should_ignore("other.t_1")
    assert src.table_filter.should_ignore("sharding_1.t_quarantined")

    # route: shard tables merge into the dotted target
    assert len(src.route_rules) == 1
    r = src.route_rules[0]
    assert r.target == "merged.t"
    import re
    assert re.match(r.table_regex, "sharding_1.t_2")
    assert not re.match(r.table_regex, "merged.t")

    # binlog ladder: Ignore deletes on the shard tables
    assert src.binlog_rules[0].events == frozenset({"D"})
    assert src.binlog_rules[0].action == "ignore"

    # expression filter resolves on the routed target identity
    assert src.rules_for("merged.t")[0].ignore_insert_expr == "role = 'bot'"
    assert src.rules_for("elsewhere") == []

    with pytest.raises(ValueError, match="no mysql-instance"):
        task.source("nope")


def test_dm_task_loader_fails_loudly():
    from tiflow_spark.config import load_dm_task

    with pytest.raises(ValueError, match="unsupported DM task keys"):
        load_dm_task({"name": "x", "shadow-mode": True})
    with pytest.raises(ValueError, match="unknown route rule"):
        load_dm_task({
            "name": "x",
            "mysql-instances": [
                {"source-id": "s", "route-rules": ["ghost"]}
            ],
        })
    with pytest.raises(ValueError, match="fine-grained"):
        load_dm_task({
            "name": "x",
            "filters": {"f": {"table-pattern": "t", "events": ["drop table"]}},
            "mysql-instances": [{"source-id": "s", "filter-rules": ["f"]}],
        })
    with pytest.raises(ValueError, match="glob"):
        load_dm_task({
            "name": "x",
            "block-allow-list": {"b": {"do-dbs": ["~^test.*"]}},
            "mysql-instances": [
                {"source-id": "s", "block-allow-list": "b"}
            ],
        })


def test_dm_task_drives_shard_merge_feed(spark, tmp_path):
    """The DM bundle runs the REAL runner: two shard tables merge into one
    target, the block-allow list drops a foreign db, the binlog ladder
    ignores deletes, and the expression filter skips bot inserts."""
    from tiflow_spark.config import load_dm_task
    from tiflow_spark.sinks.cow_table import CowTable
    from tiflow_spark.sources.registry import PAYLOAD_V1, SchemaVersion
    from tiflow_spark.streaming.runner import Changefeed

    src = load_dm_task(DM_TASK).source("mysql-replica-01")

    def ev(op, cts, conv, text, role="u"):
        return (op, cts, cts - 1, conv, 0, 1,
                None if op == "D"
                else f'{{"role":"{role}","text":"{text}"}}', None, 0)

    rows = [
        (*ev("I", 10, "a", "one"), "sharding_1.t_1"),
        (*ev("I", 20, "b", "two"), "sharding_2.t_9"),
        (*ev("D", 30, "a", None), "sharding_1.t_1"),        # binlog-ignored
        (*ev("I", 40, "c", "spam", role="bot"), "sharding_1.t_2"),  # expr
        (*ev("I", 50, "z", "foreign"), "other.t_1"),        # block-allow
    ]
    events_dir = str(tmp_path / "events")
    spark.createDataFrame(rows, EV_SCHEMA + ", table_name STRING").coalesce(
        1).write.parquet(events_dir)
    target = CowTable(spark, str(tmp_path / "t"), n_buckets=2)
    feed = Changefeed(
        spark=spark, events_dir=events_dir,
        checkpoint_dir=str(tmp_path / "ckpt"),
        tables={"merged.t": (target, [SchemaVersion(1, 0, PAYLOAD_V1)])},
        route_rules=src.route_rules, config=src,
    )
    feed.run_available_now()
    got = {r["conv_id"]: r["text"] for r in target.snapshot().collect()}
    assert got == {"a": "one", "b": "two"}


# -------------------------------------------------- sync_diff diff_config

DIFF_CONFIG = textwrap.dedent(
    """
    check-thread-count = 2
    export-fix-sql = true

    [data-sources.mysql1]
    host = "127.0.0.1"
    route-rules = ["rule1"]

    [routes.rule1]
    schema-pattern = "test_*"
    table-pattern = "t_*"
    target-schema = "test"
    target-table = "t"

    [task]
    output-dir = "/tmp/out"
    source-instances = ["mysql1"]
    target-instance = "tidb0"
    target-check-tables = ["test.*", "!test.skip_me"]
    target-configs = ["config1"]

    [table-configs.config1]
    target-tables = ["test.t"]
    range = "turn_idx < 100"
    index-fields = [""]
    ignore-columns = ["noisy", ""]
    """
)


def test_diff_config_loader_and_diff(spark, tmp_path):
    """The sync_diff config drives the chunked compare: range and
    ignore-columns from the matching table-config apply, excluded tables
    are refused, and export-fix-sql yields the statement artifact."""
    from tiflow_spark.config import load_diff_config

    p = tmp_path / "diff_config.toml"
    p.write_text(DIFF_CONFIG)
    cfg = load_diff_config(str(p))

    assert cfg.route_rules_by_source["mysql1"][0].target == "test.t"
    assert not cfg.table_filter.should_ignore("test.t")
    assert cfg.table_filter.should_ignore("test.skip_me")

    schema = "conv_id STRING, turn_idx INT, text STRING, noisy STRING"
    expected = spark.createDataFrame(
        [("a", 1, "same", "x"), ("b", 2, "truth", "y"), ("c", 999, "out", "z")],
        schema,
    )
    actual = spark.createDataFrame(
        [("a", 1, "same", "DIFFERENT-NOISY"),   # ignore-columns: not a diff
         ("b", 2, "broken", "y"),               # real diff
         ("c", 999, "also-out", "z")],          # range: out of scope
        schema,
    )
    result, fix = cfg.diff(
        expected, actual, "test.t",
        key_cols=["conv_id", "turn_idx"], data_cols=["text", "noisy"],
    )
    # row_diffs is the symmetric count: the expected and the actual
    # version of the one broken key both land in the mismatched chunk
    assert not result.identical and result.row_diffs == 2
    stmts = [r["fix_sql"] for r in fix.collect()]
    assert stmts == [
        "REPLACE INTO `test`.`t`(`conv_id`,`turn_idx`,`text`) "
        "VALUES ('b',2,'truth');"
    ]

    with pytest.raises(ValueError, match="target-check-tables"):
        cfg.diff(expected, actual, "test.skip_me",
                 key_cols=["conv_id"], data_cols=["text"])


def test_diff_config_fails_loudly():
    from tiflow_spark.config import load_diff_config

    with pytest.raises(ValueError, match="check-struct-only"):
        load_diff_config({"check-struct-only": True})
    with pytest.raises(ValueError, match="index-fields"):
        load_diff_config({
            "table-configs": {"c": {"target-tables": ["t"],
                                    "index-fields": ["idx_a"]}},
        })
    with pytest.raises(ValueError, match="unknown route"):
        load_diff_config({
            "data-sources": {"s": {"route-rules": ["ghost"]}},
        })
    with pytest.raises(ValueError, match="unsupported diff config"):
        load_diff_config({"chunk-size": 1000})


# ----------------------------------------------- round-5 review-2 pins

def test_null_expr_keeps_row_reference_semantics(spark):
    """expr_filter.go semantics: an event is ignored only when the
    predicate is TRUE — a NULL-evaluating expression keeps the row. The
    old three-valued ~drop inverted this and silently discarded every
    insert whose filtered column was NULL."""
    from tiflow_spark.operators.filters import (
        EventFilterRule, apply_event_filter,
    )

    df = spark.createDataFrame(
        [("I", 1, "spam_tool"), ("I", 2, None), ("I", 3, "ok")],
        "op STRING, start_ts LONG, tool STRING",
    )
    rule = EventFilterRule(ignore_insert_expr="tool = 'spam_tool'")
    kept = {r["start_ts"] for r in apply_event_filter(df, rule).collect()}
    assert kept == {2, 3}  # NULL tool row is KEPT, not silently dropped


def test_table_filter_rules_last_match_wins():
    """tidb table-filter grammar: ['*', '!test_*', 'test_keep'] re-includes
    test_keep after the exclusion — a split include/exclude set cannot
    express this."""
    cfg = load_changefeed_config(
        {"filter": {"rules": ["*", "!test_*", "test_keep"]}}
    )
    assert not cfg.table_filter.should_ignore("other")
    assert cfg.table_filter.should_ignore("test_drop")
    assert not cfg.table_filter.should_ignore("test_keep")
    assert cfg.table_filter.should_ignore(None)


def test_dm_schema_only_route_preserves_table_names(spark):
    """A DM schema rename (no target-table) must keep each table's own
    name — collapsing shard_0.orders and shard_0.users into one identity
    would silently LWW-merge unrelated tables."""
    from tiflow_spark.config import load_dm_task
    from tiflow_spark.operators.filters import route_tables

    src = load_dm_task({
        "name": "t",
        "routes": {"r": {"schema-pattern": "shard_*",
                         "target-schema": "merged"}},
        "mysql-instances": [{"source-id": "s", "route-rules": ["r"]}],
    }).source("s")
    frame = spark.createDataFrame(
        [("shard_0.orders",), ("shard_1.users",), ("other.t",)],
        "table_name STRING",
    )
    routed = {r["table_name"]
              for r in route_tables(frame, src.route_rules).collect()}
    assert routed == {"merged.orders", "merged.users", "other.t"}


def test_loader_rejects_unhonorable_exprs_and_unknown_keys():
    from tiflow_spark.config import load_dm_task

    with pytest.raises(ValueError, match="delete-value-expr"):
        load_changefeed_config({"filter": {"event-filters": [
            {"matcher": ["t"], "ignore-delete-value-expr": "id = 3"}]}})
    with pytest.raises(ValueError, match="pre_"):
        load_changefeed_config({"filter": {"event-filters": [
            {"matcher": ["t"],
             "ignore-update-old-value-expr": "balance < 0"}]}})
    with pytest.raises(ValueError, match="delete-value-expr"):
        load_dm_task({"name": "x", "expression-filter": {
            "e": {"schema": "s", "table": "t", "delete-value-expr": "id=1"}},
            "mysql-instances": [
                {"source-id": "s", "expression-filters": ["e"]}]})
    with pytest.raises(ValueError, match="unsupported changefeed"):
        load_changefeed_config({"force-replicate": True})
    with pytest.raises(ValueError, match=r"\[sink\] keys"):
        load_changefeed_config({"sink": {"terminator": "\0"}})
    with pytest.raises(ValueError, match="include-commit-ts"):
        load_changefeed_config(
            {"sink": {"csv": {"include-commit-ts": False}}})


def test_column_selector_accepts_dict_rules_and_validates():
    from tiflow_spark.sinks.mq import ColumnSelector

    sel = ColumnSelector([{"matcher": ["t_*"], "columns": ["*", "!tool"]}])
    assert sel.retained("t_1", ["role", "text", "tool"],
                        ("conv_id", "turn_idx")) == ["role", "text"]
    with pytest.raises(ValueError, match="unsupported column-selector"):
        ColumnSelector([{"matcher": ["t"], "cols": ["*"]}])
    with pytest.raises(ValueError, match="non-empty"):
        ColumnSelector([("t", ["*"])])  # string matcher, not a list


def test_craft_nullable_long_beyond_2_53_fails_loudly(spark):
    """The Arrow→pandas float64 carrier for null-bearing int64 columns
    cannot represent |v| > 2^53; encoding must fail loudly, not round-trip
    a changed value."""
    from tiflow_spark.sinks.codecs import craft_encode

    df = spark.createDataFrame(
        [("I", 10, 9, "c1", 0, 2**53 + 1), ("I", 11, 10, "c2", 1, None)],
        "op STRING, commit_ts LONG, start_ts LONG, conv_id STRING, "
        "turn_idx INT, score LONG",
    ).coalesce(1)
    with pytest.raises(Exception, match="2\\^53"):
        craft_encode(df).collect()


def test_config_dispatchers_drive_run_mq(spark, tmp_path):
    """Per-table dispatcher rules from the config reach the MQ path: the
    matched table gets its rule's partition mode and topic template, the
    unmatched table keeps the feed-level defaults."""
    from tiflow_spark.sinks.cow_table import CowTable
    from tiflow_spark.sources.registry import PAYLOAD_V1, SchemaVersion
    from tiflow_spark.streaming.runner import Changefeed

    cfg = load_changefeed_config({
        "sink": {"dispatchers": [
            {"matcher": ["even"], "partition": "ts",
             "topic": "special_{table}"},
        ]},
    })
    rows = [
        (*_ev("I", 13, "a", "one"), "even"),
        (*_ev("I", 20, "b", "two"), "odd"),
    ]
    events_dir = str(tmp_path / "events")
    spark.createDataFrame(rows, EV_SCHEMA + ", table_name STRING").coalesce(
        1).write.parquet(events_dir)
    reg = [SchemaVersion(1, 0, PAYLOAD_V1)]
    feed = Changefeed(
        spark=spark, events_dir=events_dir,
        checkpoint_dir=str(tmp_path / "ckpt"),
        tables={"even": (None, reg), "odd": (None, reg)},
        max_files_per_trigger=1000,
    )
    feed.run_mq(str(tmp_path / "mq"), n_partitions=4, config=cfg)
    msgs = spark.read.parquet(str(tmp_path / "mq") + "/batch=*")
    data = [
        r for r in msgs.collect()
        if r["value"] and '"type":"INSERT"' in r["value"]
    ]
    by_topic = {r["topic"]: r for r in data}
    assert set(by_topic) == {"special_even", "default_odd"}
    assert by_topic["special_even"]["partition"] == 13 % 4  # rule: ts mode
