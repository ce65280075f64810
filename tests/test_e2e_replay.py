"""The minimum end-to-end slice (SURVEY.md §7.2): replay the full change log
through the pipeline and compare the final table to the naive Python oracle —
per-turn text equality under stable (conv_id, turn_idx) ordering
(BASELINE.json input_hint)."""

import pytest

from tiflow_spark.oracle import replay
from tiflow_spark.plans.pipeline import apply_epoch
from tiflow_spark.sinks.cow_table import CowTable
from tiflow_spark.sources.datagen import GenSpec, generate_change_events
from tiflow_spark.sources.registry import default_registry

SPEC = GenSpec(n_convs=120, seed=7)


def oracle_state(spark, spec):
    events = [r.asDict() for r in generate_change_events(spark, spec).collect()]
    version_fields = {1: ("role", "text", "ts"), 2: ("role", "text", "tool", "ts")}
    return replay(events, version_fields)


def table_state(table):
    rows = table.snapshot().collect()
    return {
        (r["conv_id"], r["turn_idx"]): {
            "role": r["role"],
            "text": r["text"],
            "tool": r["tool"],
        }
        for r in rows
    }


def assert_matches_oracle(table, oracle):
    got = table_state(table)
    assert set(got) == set(oracle), (
        f"key sets differ: extra={list(set(got) - set(oracle))[:5]} "
        f"missing={list(set(oracle) - set(got))[:5]}"
    )
    for key in sorted(oracle):
        for f in ("role", "text", "tool"):
            assert got[key][f] == oracle[key][f], f"{key} field {f}: {got[key]} vs {oracle[key]}"


@pytest.mark.parametrize("decoder", ["jvm", "pandas"])
def test_single_epoch_replay_matches_oracle(spark, tmp_table_dir, decoder):
    events = generate_change_events(spark, SPEC)
    table = CowTable(spark, tmp_table_dir, n_buckets=8)
    registry = default_registry(SPEC.ddl_ts)

    res = apply_epoch(table, registry, events, batch_id=0, decoder=decoder)
    assert not res.stats.skipped
    assert res.stats.applied_events > 0
    assert res.resolved_ts is not None

    assert_matches_oracle(table, oracle_state(spark, SPEC))


def test_multi_epoch_replay_matches_oracle(spark, tmp_table_dir):
    """Events split into commit_ts-banded epochs, applied sequentially —
    state after each is consistent; final state equals the oracle."""
    from pyspark.sql import functions as F

    events = generate_change_events(spark, SPEC)
    table = CowTable(spark, tmp_table_dir, n_buckets=8)
    registry = default_registry(SPEC.ddl_ts)

    for k in range(6):
        band = events.filter((F.col("commit_ts") >= k * 1000) & (F.col("commit_ts") < (k + 1) * 1000))
        apply_epoch(table, registry, band, batch_id=k)

    assert_matches_oracle(table, oracle_state(spark, SPEC))


def test_out_of_order_and_redelivered_epochs(spark, tmp_table_dir):
    """Version-conditional MERGE: applying epochs newest-first, then
    re-delivering everything, still converges to the oracle state."""
    from pyspark.sql import functions as F

    events = generate_change_events(spark, SPEC)
    table = CowTable(spark, tmp_table_dir, n_buckets=8)
    registry = default_registry(SPEC.ddl_ts)

    bands = list(range(6))
    for i, k in enumerate(reversed(bands)):  # newest band first
        band = events.filter((F.col("commit_ts") >= k * 1000) & (F.col("commit_ts") < (k + 1) * 1000))
        apply_epoch(table, registry, band, batch_id=i)
    # full redelivery as one more epoch (at-least-once)
    apply_epoch(table, registry, events, batch_id=10)

    assert_matches_oracle(table, oracle_state(spark, SPEC))


def test_epoch_fence_skips_replayed_batch_id(spark, tmp_table_dir):
    events = generate_change_events(spark, SPEC)
    table = CowTable(spark, tmp_table_dir, n_buckets=8)
    registry = default_registry(SPEC.ddl_ts)

    r1 = apply_epoch(table, registry, events, batch_id=5)
    assert not r1.stats.skipped
    r2 = apply_epoch(table, registry, events, batch_id=5)  # same epoch re-run
    assert r2.stats.skipped
    r3 = apply_epoch(table, registry, events, batch_id=4)  # older epoch
    assert r3.stats.skipped

    assert_matches_oracle(table, oracle_state(spark, SPEC))


def test_lineage_and_epochs_tables(spark, tmp_table_dir):
    events = generate_change_events(spark, SPEC)
    table = CowTable(spark, tmp_table_dir, n_buckets=8)
    registry = default_registry(SPEC.ddl_ts)
    res = apply_epoch(table, registry, events, batch_id=0)

    lin = table.lineage()
    assert lin.count() == SPEC.n_source_partitions
    total = lin.groupBy().sum("applied_events").first()[0]
    assert total == res.stats.applied_events

    ep = table.epochs()
    assert ep.count() == 1
    row = ep.first()
    assert row["batch_id"] == 0 and row["resolved_ts"] == res.resolved_ts
