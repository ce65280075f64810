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


def test_randomized_shard_ddl_schedules(spark, tmp_path):
    """Randomized sharding-DDL schedules (the posture of
    dm/pkg/shardddl/pessimism tests): N shards merge into one target; each
    shard executes the v2 DDL at a RANDOM epoch; events interleave
    arbitrarily. Whatever the schedule, both coordination modes must
    converge to the naive per-key replay oracle once every shard has
    executed the DDL."""
    import json as _json

    from pyspark.sql import types as T

    from tiflow_spark.operators.filters import RouteRule
    from tiflow_spark.sinks.cow_table import CowTable
    from tiflow_spark.sources.registry import PAYLOAD_V1, PAYLOAD_V2, SchemaVersion
    from tiflow_spark.streaming.runner import Changefeed

    schema = (
        "op STRING, commit_ts LONG, start_ts LONG, conv_id STRING, turn_idx INT, "
        "schema_version LONG, payload STRING, pre_payload STRING, "
        "source_partition INT, table_name STRING"
    )
    v2_json = PAYLOAD_V2.json()

    for seed, mode in [(71, True), (72, False), (73, True)]:
        rng = random.Random(seed)
        n_shards, n_epochs, n_keys = 3, 6, 30
        ddl_epoch = {s: rng.randint(1, n_epochs - 1) for s in range(n_shards)}
        epochs = {e: [] for e in range(n_epochs)}
        all_events = []
        for s, de in ddl_epoch.items():
            epochs[de].append(
                ("DDL", 100_000 + de, 100_000 + de - 1, None, None, 2,
                 v2_json, None, s, f"sh_{s}")
            )
        eid = 0
        for k in range(n_keys):
            conv = f"k{k}"
            for _ in range(rng.randint(1, 5)):
                s = rng.randrange(n_shards)
                e = rng.randrange(n_epochs)
                ver = 2 if e >= ddl_epoch[s] else 1
                op = rng.choice("IUD")
                cts = rng.randint(0, 500)
                sts = cts - rng.randint(1, 3)
                body = None
                if op != "D":
                    d = {"role": "u", "text": f"t{eid}"}
                    if ver == 2:
                        d["tool"] = f"T{eid}"
                    body = _json.dumps(d)
                epochs[e].append((op, cts, sts, conv, 0, ver, body, None, s, f"sh_{s}"))
                all_events.append((op, cts, sts, conv, ver, eid))
                eid += 1

        events_dir = tmp_path / f"ev_{seed}"
        for e in range(n_epochs):
            spark.createDataFrame(epochs[e], schema).coalesce(1).write.parquet(
                str(events_dir / f"e{e:02d}")
            )

        # naive oracle: per key, (commit_ts, start_ts, D<U<I) last-wins
        oracle = {}
        for conv in {x[3] for x in all_events}:
            evs = [x for x in all_events if x[3] == conv]
            op, cts, sts, _, ver, i = max(
                evs, key=lambda x: (x[1], x[2], OP_ORDER[x[0]])
            )
            if op != "D":
                oracle[conv] = (f"t{i}", f"T{i}" if ver == 2 else None)

        table = CowTable(spark, str(tmp_path / f"t_{seed}"), n_buckets=4,
                         data_schema={"role": "string", "text": "string"})
        feed = Changefeed(
            spark=spark, events_dir=str(events_dir / "e*"),
            checkpoint_dir=str(tmp_path / f"ck_{seed}"),
            tables={"merged": (table, [SchemaVersion(1, 0, PAYLOAD_V1)])},
            route_rules=(RouteRule(table_regex="^sh_.*", target="merged"),),
            ddl_in_stream=True, shard_ddl_barrier=mode, max_files_per_trigger=1,
        )
        feed.run_available_now()
        got = {r["conv_id"]: (r["text"], r["tool"])
               for r in table.snapshot().collect()}
        assert got == oracle, (
            f"seed={seed} mode={'pessimistic' if mode else 'optimistic'} "
            f"ddl_epochs={ddl_epoch}: diff="
            f"{ {k: (got.get(k), oracle.get(k)) for k in set(got) ^ set(oracle) or set(got) if got.get(k) != oracle.get(k)} }"
        )
        pend = table.read_pending()
        assert pend is None or pend.count() == 0
