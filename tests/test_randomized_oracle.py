"""Randomized workload vs the independent Python oracle — the reference's
randomized-testing posture (pkg/causality/tests drives random workloads and
asserts the invariant holds; dm/syncer/compactor_test.go is table-driven).

400 random per-key event runs (random ops, colliding commit_ts, full-tuple
ties) evaluated in ONE DataFrame job; the engine's LWW winner and the
compactor's net-op must match a naive per-key Python replay for every key."""

import random

from pyspark.sql import functions as F

from tiflow_spark.operators.lww import compact_net_op, lww_latest
from tiflow_spark.operators.ordering import OP_ORDER


def _gen_runs(seed: int, n_keys: int):
    rng = random.Random(seed)
    runs = {}
    for k in range(n_keys):
        n = rng.randint(1, 8)
        evs = []
        for _ in range(n):
            op = rng.choice("IUD")
            cts = rng.randint(0, 5)          # heavy commit_ts collisions
            sts = cts - rng.randint(1, 3)
            evs.append((op, cts, sts))
        runs[f"r{k}"] = evs
    return runs


def _py_last(evs):
    """The engine's total order: (commit_ts, start_ts, D<U<I), last wins.
    Ties on the full tuple are disambiguated by the op (same tuple + same op
    = redelivery; different ops are distinct events the order ranks)."""
    return max(evs, key=lambda e: (e[1], e[2], OP_ORDER[e[0]]))


def _py_first(evs):
    return min(evs, key=lambda e: (e[1], e[2], OP_ORDER[e[0]]))


def _py_net_op(evs):
    last, first = _py_last(evs), _py_first(evs)
    if last[0] == "D":
        return "D"
    if any(e[0] == "D" for e in evs):
        return "R"
    if first[0] == "I":
        return "I"
    return last[0]


def test_randomized_runs_match_python_oracle(spark):
    runs = _gen_runs(seed=1234, n_keys=400)
    rows = [
        (op, cts, sts, conv, 0, f"{op}|{cts}|{sts}", 0)
        for conv, evs in runs.items()
        for (op, cts, sts) in evs
    ]
    df = spark.createDataFrame(
        rows,
        "op STRING, commit_ts LONG, start_ts LONG, conv_id STRING, "
        "turn_idx INT, text STRING, source_partition INT",
    )

    winners = {
        r["conv_id"]: (r["op"], r["text"])
        for r in lww_latest(df).collect()
    }
    for conv, evs in runs.items():
        op, cts, sts = _py_last(evs)
        assert winners[conv] == (op, f"{op}|{cts}|{sts}"), (
            f"{conv}: engine {winners[conv]} vs oracle {(op, cts, sts)} over {evs}"
        )

    net = {r["conv_id"]: r["net_op"] for r in compact_net_op(df).collect()}
    for conv, evs in runs.items():
        assert net[conv] == _py_net_op(evs), f"{conv}: {net[conv]} vs oracle over {evs}"


def test_randomized_final_state_survivors(spark):
    """Survivor set (keys whose last op is not a delete) matches — the
    bank-style invariant over random histories."""
    runs = _gen_runs(seed=777, n_keys=300)
    rows = [
        (op, cts, sts, conv, 0, "x", 0)
        for conv, evs in runs.items()
        for (op, cts, sts) in evs
    ]
    df = spark.createDataFrame(
        rows,
        "op STRING, commit_ts LONG, start_ts LONG, conv_id STRING, "
        "turn_idx INT, text STRING, source_partition INT",
    )
    engine = {
        r["conv_id"] for r in lww_latest(df).filter(F.col("op") != "D").collect()
    }
    oracle = {conv for conv, evs in runs.items() if _py_last(evs)[0] != "D"}
    assert engine == oracle
