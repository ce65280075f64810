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
