"""Filters, update-split, validation job, and the DDL-barrier schema flow."""

import pytest
from pyspark.sql import functions as F

from tests.test_e2e_replay import SPEC, assert_matches_oracle, oracle_state
from tiflow_spark.operators.filters import EventFilterRule, TableFilter, apply_event_filter
from tiflow_spark.operators.update_split import split_updates
from tiflow_spark.operators.validate import diff_tables
from tiflow_spark.plans.pipeline import apply_epoch
from tiflow_spark.sinks.cow_table import CowTable
from tiflow_spark.sources.datagen import GenSpec, generate_change_events
from tiflow_spark.sources.registry import (
    PAYLOAD_V2,
    SchemaVersion,
    add_version,
    default_registry,
    load_registry,
    save_registry,
)

EV = (
    "op STRING, commit_ts LONG, start_ts LONG, conv_id STRING, turn_idx INT, "
    "payload STRING, pre_payload STRING, source_partition INT, v LONG"
)


def test_event_filter_ops_and_exprs(spark):
    rows = [
        ("I", 1, 0, "c0", 0, None, None, 0, 1),
        ("U", 2, 1, "c0", 0, None, None, 0, 1),
        ("D", 3, 2, "c0", 0, None, None, 0, 1),
        ("I", 4, 3, "c1", 9, None, None, 0, 1),
    ]
    df = spark.createDataFrame(rows, EV)
    out = apply_event_filter(df, EventFilterRule(ignore_ops=frozenset({"D"})))
    assert sorted(r["op"] for r in out.collect()) == ["I", "I", "U"]

    out = apply_event_filter(df, EventFilterRule(ignore_insert_expr="turn_idx > 5"))
    assert ("I", 4) not in {(r["op"], r["commit_ts"]) for r in out.collect()}
    # predicate only applies to inserts — the delete at turn 0 survives
    assert out.count() == 3


def test_table_filter_patterns():
    tf = TableFilter(include=("app_*",), exclude=("app_tmp*",))
    assert not tf.should_ignore("app_users")
    assert tf.should_ignore("app_tmp_1")
    assert tf.should_ignore("other")


def test_split_updates_on_key_change(spark):
    rows = [
        # update that moves the row from turn 0 to turn 1
        ("U", 10, 9, "c0", 1, '{"text":"new"}', '{"text":"old"}', 0, 1),
        # update in place
        ("U", 11, 10, "c0", 2, '{"text":"x"}', '{"text":"y"}', 0, 1),
        ("I", 12, 11, "c0", 3, '{"text":"z"}', None, 0, 1),
    ]
    df = spark.createDataFrame(rows, EV).withColumn(
        "pre_turn_idx",
        F.when(F.col("commit_ts") == 10, F.lit(0)).otherwise(F.col("turn_idx")),
    )
    out = split_updates(df, pre_key_cols={"turn_idx": "pre_turn_idx"}).collect()
    ops = sorted((r["op"], r["turn_idx"], r["commit_ts"]) for r in out)
    # moved update → D at old key (turn 0) + I at new key (turn 1)
    assert ("D", 0, 10) in ops and ("I", 1, 10) in ops
    assert ("U", 2, 11) in ops and ("I", 3, 12) in ops
    assert len(ops) == 4
    # the delete carries no payload
    d = [r for r in out if r["op"] == "D"][0]
    assert d["payload"] is None


def test_split_updates_always_mode_preserves_replay(spark, tmp_table_dir):
    """Safe-mode analog: rewriting every update as delete+insert must not
    change the final replayed state (delete sorts before insert at equal
    commit_ts by op_order)."""
    spec = GenSpec(n_convs=80, seed=13)
    events = generate_change_events(spark, spec)
    split = split_updates(events, pre_key_cols=None, mode="always")
    table = CowTable(spark, tmp_table_dir, n_buckets=8)
    apply_epoch(table, default_registry(spec.ddl_ts), split, batch_id=0)
    assert_matches_oracle(table, oracle_state(spark, spec))


def test_diff_tables_identical_and_mutated(spark):
    a = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).cast("string").alias("v")
    )
    res = diff_tables(a, a, key_cols=["k"], n_chunks=16)
    assert res.identical

    b = a.withColumn("v", F.when(F.col("k") == 500, F.lit("MUT")).otherwise(F.col("v")))
    res = diff_tables(a, b, key_cols=["k"], n_chunks=16)
    assert not res.identical
    assert len(res.mismatched_chunks) == 1
    assert res.row_diffs == 2  # the row differs on both sides

    c = a.filter("k != 999")  # missing row
    res = diff_tables(a, c, key_cols=["k"], n_chunks=16)
    assert not res.identical and res.row_diffs == 1


def test_ddl_barrier_registry_evolution(spark, tmp_path, tmp_table_dir):
    """DDL applied at an epoch boundary (owner/barrier.go analog): epochs
    before the DDL decode with registry v1; the registry gains v2 mid-stream;
    later epochs decode v2 payloads. Final state equals the oracle."""
    spec = GenSpec(n_convs=100, seed=21)
    events = generate_change_events(spark, spec)
    reg_path = str(tmp_path / "registry")
    v1 = default_registry(spec.ddl_ts)[0]
    save_registry(spark, [v1], reg_path)
    table = CowTable(spark, tmp_table_dir, n_buckets=8)

    # epochs strictly below the DDL ts — decoded with v1 only
    for k in range(spec.ddl_step):
        band = events.filter(
            (F.col("commit_ts") >= k * 1000) & (F.col("commit_ts") < (k + 1) * 1000)
        )
        apply_epoch(table, load_registry(spark, reg_path), band, batch_id=k)

    # the DDL barrier: drain, apply DDL, continue with the new registry
    add_version(spark, reg_path, SchemaVersion(2, spec.ddl_ts, PAYLOAD_V2))

    for k in range(spec.ddl_step, 6):
        band = events.filter(
            (F.col("commit_ts") >= k * 1000) & (F.col("commit_ts") < (k + 1) * 1000)
        )
        apply_epoch(table, load_registry(spark, reg_path), band, batch_id=k)

    assert_matches_oracle(table, oracle_state(spark, spec))


def test_verify_changefeed_distributed_sync_diff(spark, tmp_table_dir):
    """check_sync_diff analog: after a full replay, the distributed
    expected-vs-actual chunk diff reports identical; corrupting one row
    makes it report exactly that chunk + row."""
    from tiflow_spark.operators.validate import verify_changefeed
    from tiflow_spark.plans.pipeline import apply_epoch
    from tiflow_spark.sinks.cow_table import CowTable
    from tiflow_spark.sources.datagen import GenSpec, generate_change_events
    from tiflow_spark.sources.registry import default_registry

    spec = GenSpec(n_convs=80, seed=21)
    events = generate_change_events(spark, spec)
    table = CowTable(spark, tmp_table_dir, n_buckets=8)
    registry = default_registry(spec.ddl_ts)
    apply_epoch(table, registry, events, batch_id=0)

    res = verify_changefeed(table, events.drop("pre_payload"), registry)
    assert res.identical, (res.mismatched_chunks, res.row_diffs)

    # corrupt one applied row out-of-band -> the diff must catch it
    import pyspark.sql.functions as F

    snap = table.snapshot(include_tombstones=True)
    corrupted = snap.withColumn(
        "text",
        F.when(F.col("conv_id") == "c0", F.lit("CORRUPTED")).otherwise(F.col("text")),
    )
    bad_dir = f"{tmp_table_dir}/data/corrupt"
    corrupted.withColumn("bucket", table._bucket_col()).write.mode(
        "overwrite"
    ).partitionBy("bucket").parquet(bad_dir)
    m = table.current_manifest()
    m["seq"] += 1
    m["buckets"] = {
        b: f"data/corrupt/bucket={b}" for b in m["buckets"]
    }
    table._commit_manifest(m)
    res2 = verify_changefeed(table, events.drop("pre_payload"), registry)
    assert not res2.identical and res2.row_diffs > 0


def test_verify_changefeed_key_split_equals_one_pass(spark, tmp_table_dir):
    """key_split=K (the bounded-spill mode the 1e9 soak uses) returns the
    SAME verdict as the one-pass diff — identical on a clean replay, and
    the same mismatched chunk set + row-diff count after corruption."""
    import pyspark.sql.functions as F

    from tiflow_spark.operators.validate import verify_changefeed
    from tiflow_spark.plans.pipeline import apply_epoch
    from tiflow_spark.sinks.cow_table import CowTable
    from tiflow_spark.sources.datagen import GenSpec, generate_change_events
    from tiflow_spark.sources.registry import default_registry

    spec = GenSpec(n_convs=80, seed=22)
    events = generate_change_events(spark, spec).drop("pre_payload")
    table = CowTable(spark, tmp_table_dir, n_buckets=8)
    registry = default_registry(spec.ddl_ts)
    apply_epoch(table, registry, events, batch_id=0)

    assert verify_changefeed(table, events, registry, key_split=4).identical

    # corrupt one row out-of-band, then compare both modes' findings
    snap = table.snapshot(include_tombstones=True)
    corrupted = snap.withColumn(
        "text",
        F.when(F.col("conv_id") == "c1", F.lit("X")).otherwise(F.col("text")),
    )
    bad_dir = f"{tmp_table_dir}/data/corrupt"
    corrupted.withColumn("bucket", table._bucket_col()).write.mode(
        "overwrite").partitionBy("bucket").parquet(bad_dir)
    m = table.current_manifest()
    m["seq"] += 1
    m["buckets"] = {b: f"data/corrupt/bucket={b}" for b in m["buckets"]}
    table._commit_manifest(m)

    one = verify_changefeed(table, events, registry)
    split = verify_changefeed(table, events, registry, key_split=4)
    assert not split.identical
    assert split.mismatched_chunks == one.mismatched_chunks
    assert split.row_diffs == one.row_diffs

    with pytest.raises(ValueError, match="divide"):
        verify_changefeed(table, events, registry, n_chunks=10, key_split=4)
