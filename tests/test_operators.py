"""Operator-level unit tests, mirroring the reference's colocated unit suites
(compactor_test.go truth table, mounter decode round-trips, sorter ordering —
SURVEY.md §5)."""

import pytest
from pyspark.sql import functions as F

from tiflow_spark.functions.decode import decode_payload, decode_payload_pandas
from tiflow_spark.operators.frontier import partition_frontiers, resolved_ts
from tiflow_spark.operators.lww import (
    compact_net_op,
    lww_latest,
    lww_latest_window,
    with_op_order,
)
from tiflow_spark.operators.ordering import OP_ORDER
from tiflow_spark.sources.datagen import GenSpec, generate_change_events
from tiflow_spark.sources.registry import default_registry

EV_SCHEMA = (
    "op STRING, commit_ts LONG, start_ts LONG, conv_id STRING, turn_idx INT, "
    "payload STRING, source_partition INT"
)


def ev(op, cts, sts, conv="c0", turn=0, payload=None, part=0):
    return (op, cts, sts, conv, turn, payload, part)


def test_op_order_values():
    # delete < update < insert — encoding/key.go:113-120
    assert OP_ORDER == {"D": 1, "U": 2, "I": 3}


def test_lww_picks_newest_by_commit_then_start_then_op(spark):
    rows = [
        ev("I", 100, 90, payload="v1"),
        ev("U", 200, 150, payload="v2"),
        ev("U", 200, 180, payload="v3"),  # same commit_ts, later start_ts
        ev("D", 200, 180, payload=None),  # same (cts, sts): delete loses to update
    ]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    for fn in (lww_latest, lww_latest_window):
        out = fn(df).collect()
        assert len(out) == 1
        assert out[0]["payload"] == "v3" and out[0]["op"] == "U"


def test_lww_delete_insert_tie(spark):
    # at equal (commit_ts, start_ts): insert beats delete (delete sorts first,
    # so the *last* writer is the insert)
    rows = [ev("D", 100, 90), ev("I", 100, 90, payload="alive")]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    out = lww_latest(df).collect()
    assert out[0]["op"] == "I" and out[0]["payload"] == "alive"


def test_lww_window_equals_agg_on_generated_log(spark):
    events = generate_change_events(spark, GenSpec(n_convs=60, seed=11))
    a = {
        (r["conv_id"], r["turn_idx"]): (r["commit_ts"], r["start_ts"], r["op"], r["payload"])
        for r in lww_latest(events).collect()
    }
    b = {
        (r["conv_id"], r["turn_idx"]): (r["commit_ts"], r["start_ts"], r["op"], r["payload"])
        for r in lww_latest_window(events, n_salts=4).collect()
    }
    assert a == b


# DM compactor truth table (dm/syncer/compactor.go:152-162)
@pytest.mark.parametrize(
    "ops,expected",
    [
        (["I"], "I"),
        (["I", "U"], "I"),          # INSERT+UPDATE → INSERT
        (["U", "U"], "U"),
        (["I", "D"], "D"),          # anything+DELETE → DELETE
        (["U", "D"], "D"),
        (["I", "D", "I"], "R"),     # DELETE+INSERT → REPLACE
        (["D", "I"], "R"),
        (["I", "U", "D"], "D"),
    ],
)
def test_compactor_algebra(spark, ops, expected):
    rows = [ev(op, 100 * (i + 1), 100 * (i + 1) - 5) for i, op in enumerate(ops)]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    out = compact_net_op(df).collect()
    assert out[0]["net_op"] == expected


def test_frontier_min_of_partition_max(spark):
    rows = [
        ev("I", 100, 90, part=0),
        ev("I", 500, 490, part=0),
        ev("I", 300, 290, conv="c1", part=1),
    ]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    fr = {r["source_partition"]: r["resolved_ts"] for r in partition_frontiers(df).collect()}
    assert fr == {0: 500, 1: 300}
    assert resolved_ts(df) == 300
    assert resolved_ts(df.limit(0)) is None


DEC_SCHEMA = "schema_version LONG, payload STRING, commit_ts LONG"


def test_decode_versioned_backfill(spark):
    registry = default_registry(ddl_ts=1000)
    rows = [
        # v1 payload: tool absent → NULL
        (1, '{"role":"user","text":"a","ts":"2024-01-01T00:00:00Z"}', 500),
        # v1 payload that SMUGGLES a tool field: registry governs → still NULL
        (1, '{"role":"user","text":"b","tool":"x","ts":"2024-01-01T00:00:00Z"}', 600),
        # v2 payload with tool
        (2, '{"role":"tool","text":"c","tool":"search","ts":"2024-01-01T00:00:01Z"}', 1500),
        # v2 payload missing tool → NULL
        (2, '{"role":"user","text":"d","ts":"2024-01-01T00:00:02Z"}', 1600),
        # delete: NULL payload → all NULL
        (2, None, 1700),
    ]
    df = spark.createDataFrame(rows, DEC_SCHEMA)
    for decode in (decode_payload, decode_payload_pandas):
        out = {r["text"]: r for r in decode(df, registry).collect()}
        assert out["a"]["tool"] is None and out["a"]["role"] == "user"
        assert out["b"]["tool"] is None, "v1 must not expose fields outside its schema"
        assert out["c"]["tool"] == "search" and out["c"]["role"] == "tool"
        assert out["d"]["tool"] is None
        assert out[None]["role"] is None
        assert str(out["a"]["ts"]) == "2024-01-01 00:00:00"


def test_decode_jvm_equals_pandas_on_generated_log(spark):
    spec = GenSpec(n_convs=40, seed=3)
    events = generate_change_events(spark, spec)
    registry = default_registry(spec.ddl_ts)
    key = ["conv_id", "turn_idx", "commit_ts", "start_ts", "op"]
    a = decode_payload(events, registry).select(*key, "role", "text", "tool", "ts")
    b = decode_payload_pandas(events, registry).select(*key, "role", "text", "tool", "ts")
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_datagen_deterministic_and_skewed(spark):
    spec = GenSpec(n_convs=100, seed=5)
    e1 = generate_change_events(spark, spec)
    e2 = generate_change_events(spark, spec)
    assert e1.exceptAll(e2).isEmpty()

    counts = e1.groupBy("conv_id").count().collect()
    total = sum(r["count"] for r in counts)
    stride = spec.n_convs // max(1, int(spec.n_convs * spec.hot_conv_fraction))
    hot = sum(r["count"] for r in counts if int(r["conv_id"][1:]) % stride == 0)
    assert hot / total > 0.15, "hot convs should carry a disproportionate share"

    # source partitions are key-aligned: each conv in exactly one partition
    assert (
        e1.groupBy("conv_id")
        .agg(F.countDistinct("source_partition").alias("n"))
        .filter("n > 1")
        .isEmpty()
    )
