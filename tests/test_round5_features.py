"""Round-5 feature tests: GC-safepoint carry-forward, pending-store drain on
empty microbatches, craft codec NULL-long fail-loud, near-dup cluster
closure, incremental continuous validation, columns dispatcher + topic
routing, DLQ handling."""

import pytest
from pyspark.sql import functions as F

from tiflow_spark.plans.pipeline import apply_epoch
from tiflow_spark.sinks.cow_table import CowTable
from tiflow_spark.sources.registry import PAYLOAD_V1, SchemaVersion

EV_SCHEMA = (
    "op STRING, commit_ts LONG, start_ts LONG, conv_id STRING, turn_idx INT, "
    "schema_version LONG, payload STRING, pre_payload STRING, source_partition INT"
)


def _ev(op, cts, conv, part=0, ver=1, text=None, sts=None):
    return (op, cts, sts if sts is not None else cts - 1, conv, 0, ver,
            f'{{"role":"u","text":"{text or conv}"}}', None, part)


def _direct_rows(items, spark):
    return spark.createDataFrame(
        items,
        "op STRING, commit_ts LONG, start_ts LONG, source_partition INT, "
        "conv_id STRING, turn_idx INT, role STRING, text STRING, tool STRING",
    )


# ---------------------------------------------------------------- ADVICE high:
# gc_below survives subsequent merges

def test_merge_carries_gc_safepoint_forward(spark, tmp_path):
    """ADVICE r4 (high): merge() used to drop the gc_below safepoint from
    the manifest (only pending/validated_seq/upstream_seq/mq_batch carried),
    so the first merge after gc_tombstones erased it and
    ChangefeedController.resume would accept an overwrite_checkpoint_ts
    below the tombstone-GC horizon — re-replication could resurrect deleted
    rows. The safepoint must carry forward monotonically."""
    table = CowTable(spark, str(tmp_path / "t"), n_buckets=2)
    table.merge(_direct_rows(
        [("I", 10, 9, 0, "c1", 0, "u", "one", None),
         ("I", 10, 9, 0, "c2", 0, "u", "two", None)], spark), batch_id=0)
    table.merge(_direct_rows(
        [("D", 20, 19, 0, "c2", 0, "u", "two", None)], spark), batch_id=1)
    assert table.gc_tombstones(below_resolved_ts=25) == 1
    assert table.current_manifest()["gc_below"] == 25

    # the very next merge must NOT lose the safepoint
    table.merge(_direct_rows(
        [("U", 30, 29, 0, "c1", 0, "u", "one-v2", None)], spark), batch_id=2)
    assert table.current_manifest()["gc_below"] == 25

    # monotone: an explicit manifest_extra below the horizon never lowers it
    table.merge(
        _direct_rows([("U", 40, 39, 0, "c1", 0, "u", "one-v3", None)], spark),
        batch_id=3, manifest_extra={"gc_below": 5},
    )
    assert table.current_manifest()["gc_below"] == 25

    # and the controller's resume guard keeps firing after those merges
    from tiflow_spark.streaming.controller import ChangefeedController

    ctl = ChangefeedController(spark, str(tmp_path / "state"))
    ctl.create("cf", str(tmp_path / "events"), str(tmp_path / "t"),
               [SchemaVersion(1, 0, PAYLOAD_V1)], n_buckets=2)
    with pytest.raises(ValueError, match="GC"):
        ctl.resume("cf", overwrite_checkpoint_ts=10)


# ---------------------------------------------------------------- ADVICE low:
# empty microbatch drains a non-empty pending store (scan AND observe modes)

@pytest.mark.parametrize("mode", ["scan", "observe"])
def test_empty_batch_drains_pending(spark, tmp_path, mode):
    """ADVICE r4 (low): in frontier_mode='observe', an empty microbatch that
    drains a non-empty pending store tripped the lost-metrics invariant
    (observation wraps only the empty new events → fetch()==[], while the
    pending rows make the reduce non-empty). Both modes must apply the
    withheld rows and clear the pending reference."""
    reg = [SchemaVersion(1, 0, PAYLOAD_V1)]
    table = CowTable(spark, str(tmp_path / f"t_{mode}"), n_buckets=2)
    # partition 0 frontier=10, partition 1 delivers ahead at 20/30 →
    # global resolved = 10, the two p1 events are withheld
    batch = spark.createDataFrame(
        [_ev("I", 10, "a", part=0),
         _ev("I", 20, "b", part=1), _ev("I", 30, "c", part=1)],
        EV_SCHEMA,
    )
    r0 = apply_epoch(table, reg, batch, 0, strict_frontier=True)
    assert r0.resolved_ts == 10
    assert {r["conv_id"] for r in table.snapshot().collect()} == {"a"}
    assert table.read_pending().count() == 2

    empty = spark.createDataFrame([], EV_SCHEMA)
    r1 = apply_epoch(table, reg, empty, 1, frontier_mode=mode)
    assert not r1.stats.skipped
    assert {r["conv_id"] for r in table.snapshot().collect()} == {"a", "b", "c"}
    assert table.current_manifest().get("pending") is None
    assert table.read_pending() is None


# ---------------------------------------------------------------- ADVICE low:
# craft codec refuses NULL longs instead of coercing to 0

def test_craft_encode_null_long_raises(spark):
    """ADVICE r4 (low): craft_encode silently coerced NULL long values to 0
    — a null commit_ts would round-trip as 0 and corrupt the replay's LWW
    order. It must fail loudly instead."""
    from tiflow_spark.sinks.codecs import craft_encode

    rows = spark.createDataFrame(
        [("I", None, 9, "c1", 0, "hello")],
        "op STRING, commit_ts LONG, start_ts LONG, conv_id STRING, "
        "turn_idx INT, text STRING",
    )
    with pytest.raises(Exception, match="NULL in long column"):
        craft_encode(rows).collect()


# ---------------------------------------------------------------- VERDICT #1:
# near-dup cluster closure

def test_connected_components_transitive_chain(spark):
    """A-B, B-C, C-D must close into ONE component labeled by the min id —
    transitivity is the whole point (pairwise dedup would keep B,C,D)."""
    from tiflow_spark.functions.dedup import connected_components

    pairs = spark.createDataFrame(
        [(2, 3), (3, 4), (4, 5), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id_a LONG, id_b LONG",
    )
    comp = {r["id"]: r["comp"] for r in connected_components(pairs).collect()}
    assert comp == {2: 2, 3: 2, 4: 2, 5: 2, 10: 10, 11: 10,
                    20: 20, 21: 20, 22: 20}


def test_connected_components_empty_and_representatives(spark):
    from tiflow_spark.functions.dedup import (
        component_representatives, connected_components,
    )

    empty = spark.createDataFrame([], "id_a LONG, id_b LONG")
    assert connected_components(empty).count() == 0

    docs = spark.createDataFrame(
        [(1,), (2,), (3,), (4,), (9,)], "doc_id LONG"
    )
    pairs = spark.createDataFrame([(2, 3), (3, 4)], "id_a LONG, id_b LONG")
    reps = component_representatives(docs, connected_components(pairs))
    rows = {r["doc_id"]: (r["component"], r["is_representative"])
            for r in reps.collect()}
    # docs in no pair are their own singleton component; the cluster keeps
    # only its min id
    assert rows == {1: (1, True), 2: (2, True), 3: (2, False),
                    4: (2, False), 9: (9, True)}
