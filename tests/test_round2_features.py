"""Round-2 feature tests: in-stream DDL, pre-image decode, key-change split
on real payloads, vacuum, multi-table changefeeds, LSH-verify parity,
frontier carry-forward, observation overflow, high-dim ANN."""

import glob
import math
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tests.test_e2e_replay import assert_matches_oracle, oracle_state
from tiflow_spark.functions import dedup as dd
from tiflow_spark.functions import similarity as sim
from tiflow_spark.functions.decode import decode_payload, decode_pre_image
from tiflow_spark.operators.frontier import observe_frontiers
from tiflow_spark.operators.update_split import split_updates
from tiflow_spark.sinks.cow_table import CowTable, data_schema_from_registry
from tiflow_spark.sources.datagen import GenSpec, write_epoch_files
from tiflow_spark.sources.registry import SchemaVersion, default_registry
from tiflow_spark.streaming.runner import Changefeed

DDL_SPEC = GenSpec(n_convs=60, seed=11, emit_ddl=True)


# ---------------------------------------------------------------- DDL in-stream

def test_ddl_in_stream(spark, tmp_path):
    """The DDL event travels IN the change log (op='DDL', payload = schema
    JSON); the feed starts knowing only v1. Post-DDL rows must decode with
    v2 (tool populated), pre-DDL rows backfill NULL — ddl_puller.go:190-302
    + barrier.go:22-47 semantics."""
    events_dir = str(tmp_path / "events")
    write_epoch_files(spark, DDL_SPEC, events_dir)
    table = CowTable(spark, str(tmp_path / "table"), n_buckets=8)
    v1 = default_registry(DDL_SPEC.ddl_ts)[0]
    feed = Changefeed(
        spark=spark,
        events_dir=events_dir + "/epoch_*",
        checkpoint_dir=str(tmp_path / "ckpt"),
        table=table,
        registry=[v1],
        ddl_in_stream=True,
        max_files_per_trigger=3,
    )
    feed.run_available_now()
    # the DDL registered v2 mid-stream
    assert [v.schema_version for v in feed.registry] == [1, 2]
    # final state equals the oracle, including v2-decoded tool values
    from dataclasses import replace

    spec_no_ddl = replace(DDL_SPEC, emit_ddl=False)
    assert_matches_oracle(table, oracle_state(spark, spec_no_ddl))
    snap = table.snapshot()
    assert snap.filter(F.col("tool").isNotNull()).count() > 0


def test_unregistered_version_fails_loudly(spark, tmp_path):
    """A DML whose schema_version has no registry entry and no in-batch DDL
    must error, not silently NULL its payload (the reference blocks on
    schema resolved-ts, schema_storage.go:152-178)."""
    events_dir = str(tmp_path / "events")
    # emit WITHOUT the DDL event but with v2 rows in the log
    write_epoch_files(spark, GenSpec(n_convs=20, seed=3), events_dir)
    table = CowTable(spark, str(tmp_path / "table"), n_buckets=4)
    v1 = default_registry(1_000_000_000)[0]  # registry knows only v1
    feed = Changefeed(
        spark=spark,
        events_dir=events_dir + "/epoch_*",
        checkpoint_dir=str(tmp_path / "ckpt"),
        table=table,
        registry=[v1],
        ddl_in_stream=True,
        max_files_per_trigger=100,
    )
    with pytest.raises(Exception, match="schema_version"):
        feed.run_available_now()


# ---------------------------------------------------------------- pre-image

PRE_REG = [
    SchemaVersion(
        1,
        0,
        T.StructType(
            [
                T.StructField("turn", T.IntegerType()),
                T.StructField("text", T.StringType()),
            ]
        ),
    )
]


@pytest.fixture()
def keyed_updates(spark):
    rows = [
        # key-preserving update
        ("U", 100, 99, "c1", 5, 1, '{"turn": 5, "text": "new5"}', '{"turn": 5, "text": "old5"}', 0),
        # key-CHANGING update: turn 4 -> 6
        ("U", 200, 199, "c1", 6, 1, '{"turn": 6, "text": "new6"}', '{"turn": 4, "text": "old4"}', 0),
        # plain insert (no pre-image)
        ("I", 300, 299, "c2", 1, 1, '{"turn": 1, "text": "ins"}', None, 1),
    ]
    schema = (
        "op STRING, commit_ts LONG, start_ts LONG, conv_id STRING, turn_idx INT, "
        "schema_version LONG, payload STRING, pre_payload STRING, source_partition INT"
    )
    return spark.createDataFrame(rows, schema)


def test_pre_image_decode(spark, keyed_updates):
    dec = decode_pre_image(decode_payload(keyed_updates, PRE_REG), PRE_REG)
    got = {r["commit_ts"]: (r["text"], r["pre_text"], r["pre_turn"]) for r in dec.collect()}
    assert got[100] == ("new5", "old5", 5)
    assert got[200] == ("new6", "old4", 4)
    assert got[300] == ("ins", None, None)  # no pre-image -> NULL backfill


def test_key_change_split_on_real_payloads(spark, keyed_updates):
    """ShouldSplitKVEntry on DECODED pre-image key (kv.go:113-130): only the
    key-changing update splits into delete(old key) + insert(new key)."""
    dec = decode_pre_image(decode_payload(keyed_updates, PRE_REG), PRE_REG)
    out = split_updates(dec, pre_key_cols={"turn_idx": "pre_turn"})
    rows = sorted(
        (r["op"], r["conv_id"], r["turn_idx"], r["commit_ts"]) for r in out.collect()
    )
    assert ("U", "c1", 5, 100) in rows          # unchanged key passes through
    assert ("D", "c1", 4, 200) in rows          # delete at the OLD key
    assert ("I", "c1", 6, 200) in rows          # insert at the NEW key
    assert ("U", "c1", 6, 200) not in rows
    assert len(rows) == 4


# ---------------------------------------------------------------- vacuum

def test_vacuum_bounds_data_dir(spark, tmp_path):
    """20 epochs through auto-vacuuming merge: the data dir holds at most
    keep_manifests generations of bucket files (expire_snapshots analog),
    and the final state is still correct."""
    root = str(tmp_path / "table")
    table = CowTable(spark, root, n_buckets=4, auto_vacuum_keep=2)
    schema = (
        "op STRING, commit_ts LONG, start_ts LONG, conv_id STRING, turn_idx INT, "
        "role STRING, text STRING, tool STRING, ts TIMESTAMP, source_partition INT"
    )
    for e in range(20):
        rows = [
            ("I", 100 + e, 99 + e, f"c{k}", 0, "user", f"t{e}", None, None, 0)
            for k in range(6)
        ]
        table.merge(spark.createDataFrame(rows, schema), batch_id=e)
    bucket_dirs = glob.glob(f"{root}/data/*/bucket=*")
    assert len(bucket_dirs) <= 2 * table.n_buckets, bucket_dirs
    snap = {r["conv_id"]: r["text"] for r in table.snapshot().collect()}
    assert snap == {f"c{k}": "t19" for k in range(6)}


# ---------------------------------------------------------------- multi-table

def test_multi_table_changefeed(spark, tmp_path):
    """Two tables with DIFFERENT payload schemas replicate through ONE
    changefeed — routing by table_name (event_router.go:91-132); per-table
    registry and CowTable (round-1 gap: hardcoded single shape)."""
    reg_a = [SchemaVersion(1, 0, T.StructType([
        T.StructField("role", T.StringType()), T.StructField("text", T.StringType())]))]
    reg_b = [SchemaVersion(1, 0, T.StructType([
        T.StructField("note", T.StringType()), T.StructField("amount", T.LongType())]))]

    rows = [
        ("I", 10, 9, "c1", 0, 1, '{"role":"user","text":"hi"}', None, 0, "chats"),
        ("U", 20, 19, "c1", 0, 1, '{"role":"user","text":"hi2"}', None, 0, "chats"),
        ("I", 10, 9, "o1", 0, 1, '{"note":"n1","amount":5}', None, 1, "orders"),
        ("D", 30, 29, "o1", 0, 1, None, None, 1, "orders"),
        ("I", 15, 14, "o2", 1, 1, '{"note":"n2","amount":7}', None, 1, "orders"),
    ]
    schema = (
        "op STRING, commit_ts LONG, start_ts LONG, conv_id STRING, turn_idx INT, "
        "schema_version LONG, payload STRING, pre_payload STRING, "
        "source_partition INT, table_name STRING"
    )
    events_dir = str(tmp_path / "events")
    spark.createDataFrame(rows, schema).write.parquet(events_dir)

    t_a = CowTable(spark, str(tmp_path / "ta"), n_buckets=4,
                   data_schema=data_schema_from_registry(reg_a))
    t_b = CowTable(spark, str(tmp_path / "tb"), n_buckets=4,
                   data_schema=data_schema_from_registry(reg_b))
    feed = Changefeed(
        spark=spark,
        events_dir=events_dir,
        checkpoint_dir=str(tmp_path / "ckpt"),
        tables={"chats": (t_a, reg_a), "orders": (t_b, reg_b)},
    )
    feed.run_available_now()

    a = {(r["conv_id"], r["turn_idx"]): r["text"] for r in t_a.snapshot().collect()}
    assert a == {("c1", 0): "hi2"}
    b = {(r["conv_id"], r["turn_idx"]): (r["note"], r["amount"]) for r in t_b.snapshot().collect()}
    assert b == {("o2", 1): ("n2", 7)}  # o1 deleted by the later D


# ---------------------------------------------------------------- LSH parity

def test_lsh_verify_parity_with_exact(spark):
    """Candidate-driven Jaccard verification returns exactly the exact-path
    values for every candidate pair, and band collisions recover all
    crafted high-similarity pairs."""
    base = "the quick brown fox jumps over the lazy dog again and again "
    docs = spark.createDataFrame(
        [
            (0, base * 4),
            (1, base * 4 + "tail"),          # near-identical to 0
            (2, "completely different words entirely unrelated content"),
            (3, base * 2 + "middle variation " + base * 2),  # similar to 0/1
        ],
        "doc_id LONG, text STRING",
    )
    sh = dd.shingles(docs)
    sigs = dd.minhash_signatures(sh, k=8)
    cand = dd.lsh_candidate_pairs(sigs, k=8, bands=4)
    lsh = {(r["id_a"], r["id_b"]): round(r["jaccard"], 6)
           for r in dd.jaccard_pairs(sh, candidates=cand).collect()}
    exact = {(r["id_a"], r["id_b"]): round(r["jaccard"], 6)
             for r in dd.jaccard_pairs(sh).collect()}
    # every candidate pair's verified value equals the exact value
    for pair, j in lsh.items():
        assert exact[pair] == j
    # the crafted near-dups are recovered by banding
    assert (0, 1) in lsh and lsh[(0, 1)] > 0.9
    assert (0, 3) in lsh


# ------------------------------------------------------- frontier semantics

def test_frontier_carry_forward(spark, tmp_path):
    """A source partition absent from a batch keeps its last frontier: the
    table watermark is min over ALL known partitions (ADVICE round 1 —
    otherwise gc_tombstones could drop a tombstone a straggler partition
    could still out-race)."""
    table = CowTable(spark, str(tmp_path / "t"), n_buckets=4)
    schema = (
        "op STRING, commit_ts LONG, start_ts LONG, conv_id STRING, turn_idx INT, "
        "role STRING, text STRING, tool STRING, ts TIMESTAMP, source_partition INT"
    )
    df = spark.createDataFrame([("I", 1, 0, "c", 0, "u", "x", None, None, 0)], schema)
    table.merge(df, batch_id=0, lineage_rows=[(0, 0, 100, 1), (0, 1, 200, 1)])
    assert table.current_manifest()["resolved_ts"] == 100
    # batch 1: only partition 1 present, far ahead
    df2 = spark.createDataFrame([("I", 2, 1, "c", 1, "u", "y", None, None, 1)], schema)
    table.merge(df2, batch_id=1, lineage_rows=[(1, 1, 900, 1)])
    m = table.current_manifest()
    assert m["resolved_ts"] == 100, "absent partition must hold the watermark"
    assert m["frontiers"] == {"0": 100, "1": 900}
    # partition 0 catches up -> watermark advances to the true min
    df3 = spark.createDataFrame([("I", 3, 2, "c", 2, "u", "z", None, None, 0)], schema)
    table.merge(df3, batch_id=2, lineage_rows=[(2, 0, 850, 1)])
    assert table.current_manifest()["resolved_ts"] == 850


def test_observe_frontiers_overflow_raises(spark):
    df = spark.createDataFrame(
        [(100, 2), (200, 70)], "commit_ts LONG, source_partition INT"
    )
    observed, fetch = observe_frontiers(df, max_partitions=64)
    observed.write.format("noop").mode("overwrite").save()
    with pytest.raises(ValueError, match="source_partition"):
        fetch()


def test_gc_tombstones_returns_real_count(spark, tmp_path):
    table = CowTable(spark, str(tmp_path / "t"), n_buckets=4)
    schema = (
        "op STRING, commit_ts LONG, start_ts LONG, conv_id STRING, turn_idx INT, "
        "role STRING, text STRING, tool STRING, ts TIMESTAMP, source_partition INT"
    )
    rows = [
        ("I", 10, 9, "a", 0, "u", "x", None, None, 0),
        ("D", 20, 19, "b", 0, None, None, None, None, 0),   # old tombstone
        ("D", 90, 89, "c", 0, None, None, None, None, 0),   # recent tombstone
    ]
    table.merge(spark.createDataFrame(rows, schema), batch_id=0)
    removed = table.gc_tombstones(below_resolved_ts=50)
    assert removed == 1
    snap = table.snapshot(include_tombstones=True)
    assert snap.filter("__deleted").count() == 1  # the recent one survives


# ---------------------------------------------------------------- high-dim ANN

def test_ann_high_dim_recall(spark):
    """dim=256: the plane matrix is ONE literal (no per-dim expression
    blowup — round-1 weakness); clustered corpus recall >= 0.9 vs brute
    force with multiprobe."""
    dim, n_clusters = 256, 8
    base = spark.range(200).select(
        F.col("id").alias("vec_id"), (F.col("id") % n_clusters).alias("cl")
    )
    # deterministic cluster center + small per-vector jitter, all JVM exprs
    comp = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: (
            (F.xxhash64(F.col("cl"), d) % 1000).cast("double") / 500.0
            + (F.xxhash64(F.col("vec_id"), d) % 100).cast("double") / 1000.0
        ),
    )
    corpus = base.select("vec_id", comp.alias("embedding"))
    queries = corpus.filter("vec_id < 3").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = sim.topk_cosine(corpus, queries, k=5)
    approx = sim.lsh_bucket_topk(corpus, queries, dim=dim, k=5, n_planes=4)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.9, f"recall {recall}"


# ---------------------------------------------------------------- bootstrap

def test_bootstrap_then_incremental(spark, tmp_path):
    """DM full-load switchover: seed from a snapshot at ts T, then replay
    change events around T — events after T win, redelivered events at/below
    T lose to the snapshot (version-conditional merge does the fencing)."""
    table = CowTable(spark, str(tmp_path / "t"), n_buckets=4)
    snap = spark.createDataFrame(
        [("c1", 0, "user", "snap1", None, None), ("c2", 0, "user", "snap2", None, None)],
        "conv_id STRING, turn_idx INT, role STRING, text STRING, tool STRING, ts TIMESTAMP",
    )
    table.bootstrap(snap, as_of_ts=1000, batch_id=0)

    schema = (
        "op STRING, commit_ts LONG, start_ts LONG, conv_id STRING, turn_idx INT, "
        "role STRING, text STRING, tool STRING, ts TIMESTAMP, source_partition INT"
    )
    changes = [
        # stale redelivery from before the snapshot: must lose
        ("U", 900, 899, "c1", 0, "user", "stale", None, None, 0),
        # post-snapshot update: must win
        ("U", 1500, 1499, "c2", 0, "user", "fresh", None, None, 0),
        # post-snapshot new key
        ("I", 1600, 1599, "c3", 0, "user", "new", None, None, 0),
    ]
    table.merge(spark.createDataFrame(changes, schema), batch_id=1)
    got = {r["conv_id"]: r["text"] for r in table.snapshot().collect()}
    assert got == {"c1": "snap1", "c2": "fresh", "c3": "new"}
    assert table.lag() is not None and table.lag() >= 0


# ------------------------------------------------------- strict frontier

def test_strict_frontier_withholds_above_watermark(spark, tmp_path):
    """Commit-fence mode (engine.go:103-113): an event above the global
    resolved-ts is NOT visible after its epoch; it applies once the lagging
    partition's frontier passes it. Final state matches the eager mode."""
    from tiflow_spark.plans.pipeline import apply_epoch

    table = CowTable(spark, str(tmp_path / "t"), n_buckets=4)
    schema = (
        "op STRING, commit_ts LONG, start_ts LONG, conv_id STRING, turn_idx INT, "
        "schema_version LONG, payload STRING, pre_payload STRING, source_partition INT"
    )

    def ev(op, cts, conv, part):
        return (op, cts, cts - 1, conv, 0, 1,
                f'{{"role":"u","text":"{conv}"}}', None, part)

    # batch 0: partition 0 reaches ts 100; partition 1 only 50 -> resolved=50.
    # the ts-80 event (partition 0) is above the watermark: withheld.
    b0 = [ev("I", 40, "early", 1), ev("I", 50, "edge", 1),
          ev("I", 80, "late", 0), ev("I", 100, "later", 0)]
    r0 = apply_epoch(table, default_registry(10**9)[:1],
                     spark.createDataFrame(b0, schema), batch_id=0, strict_frontier=True)
    assert r0.resolved_ts == 50
    vis0 = {r["conv_id"] for r in table.snapshot().collect()}
    assert vis0 == {"early", "edge"}, vis0
    assert table.read_pending().count() == 2

    # batch 1: partition 1 advances to 90 -> resolved=min(100,90)=90;
    # the withheld ts-80 event becomes visible, ts-100 stays pending.
    b1 = [ev("I", 90, "b1", 1)]
    r1 = apply_epoch(table, default_registry(10**9)[:1],
                     spark.createDataFrame(b1, schema), batch_id=1, strict_frontier=True)
    assert r1.resolved_ts == 90
    vis1 = {r["conv_id"] for r in table.snapshot().collect()}
    assert vis1 == {"early", "edge", "late", "b1"}, vis1
    assert table.read_pending().count() == 1

    # batch 2: both partitions pass 100 -> everything drains.
    b2 = [ev("I", 150, "b2", 0), ev("I", 150, "b2", 1)]
    apply_epoch(table, default_registry(10**9)[:1],
                spark.createDataFrame(b2, schema), batch_id=2, strict_frontier=True)
    vis2 = {r["conv_id"] for r in table.snapshot().collect()}
    assert "later" in vis2 and table.read_pending().count() == 0
    # vacuum reclaims superseded pending generations
    table.vacuum(keep_manifests=1)
    assert len(glob.glob(str(tmp_path / "t" / "pending" / "*"))) <= 1


def test_strict_streaming_matches_oracle(spark, tmp_path):
    """The full streaming changefeed in strict mode converges to the same
    oracle state (events the last epochs leave pending are those above the
    final watermark — the generator's last band, which the oracle also
    treats as applied; so drain until pending is empty via a final
    all-partitions band)."""
    from dataclasses import replace

    spec = replace(DDL_SPEC, emit_ddl=False)
    events_dir = str(tmp_path / "events")
    write_epoch_files(spark, spec, events_dir)
    table = CowTable(spark, str(tmp_path / "table"), n_buckets=8)
    feed = Changefeed(
        spark=spark,
        events_dir=events_dir + "/epoch_*",
        checkpoint_dir=str(tmp_path / "ckpt"),
        table=table,
        registry=default_registry(spec.ddl_ts),
        strict_frontier=True,
        max_files_per_trigger=3,
    )
    feed.run_available_now()
    # whatever is still pending is above the final global watermark; apply
    # the remainder by a drain epoch at +inf frontier (all partitions report)
    pend = table.read_pending()
    if pend is not None and pend.count() > 0:
        from tiflow_spark.plans.pipeline import apply_epoch
        from pyspark.sql import functions as F

        drain = pend.withColumn("commit_ts", F.col("commit_ts"))
        apply_epoch(table, feed.registry, drain,
                    batch_id=table.last_committed_batch() + 1)
    assert_matches_oracle(table, oracle_state(spark, spec))


def test_changefeed_start_ts(spark, tmp_path):
    """changefeed create --start-ts analog: events below start_ts never
    replicate; keys whose whole history predates it are absent, keys
    spanning it replicate only their post-start tail."""
    schema = (
        "op STRING, commit_ts LONG, start_ts LONG, conv_id STRING, turn_idx INT, "
        "schema_version LONG, payload STRING, pre_payload STRING, source_partition INT"
    )
    rows = [
        ("I", 100, 99, "old", 0, 1, '{"role":"u","text":"old"}', None, 0),
        ("I", 100, 99, "span", 0, 1, '{"role":"u","text":"v1"}', None, 0),
        ("U", 900, 899, "span", 0, 1, '{"role":"u","text":"v2"}', None, 0),
        ("I", 950, 949, "new", 0, 1, '{"role":"u","text":"new"}', None, 0),
    ]
    events_dir = str(tmp_path / "events")
    spark.createDataFrame(rows, schema).write.parquet(events_dir)
    table = CowTable(spark, str(tmp_path / "t"), n_buckets=4)
    feed = Changefeed(
        spark=spark, events_dir=events_dir,
        checkpoint_dir=str(tmp_path / "ckpt"),
        table=table, registry=default_registry(10**9)[:1],
        start_ts=500,
    )
    feed.run_available_now()
    got = {r["conv_id"]: r["text"] for r in table.snapshot().collect()}
    assert got == {"span": "v2", "new": "new"}  # 'old' never replicated


# ------------------------------------------------------- crash injection

def test_crash_between_pending_write_and_manifest_commit(spark, tmp_path):
    """sink_hang/crash-chaos analog: kill the epoch AFTER the pending store
    is written but BEFORE the manifest commit. The retry (same batch_id,
    foreachBatch redelivery) must converge: the orphan pending generation is
    ignored (manifest never referenced it) and later vacuumed."""
    from tiflow_spark.plans.pipeline import apply_epoch
    from tiflow_spark.sinks.cow_table import CowTable

    table = CowTable(spark, str(tmp_path / "t"), n_buckets=4)
    schema = (
        "op STRING, commit_ts LONG, start_ts LONG, conv_id STRING, turn_idx INT, "
        "schema_version LONG, payload STRING, pre_payload STRING, source_partition INT"
    )
    rows = [
        ("I", 50, 49, "a", 0, 1, '{"role":"u","text":"a"}', None, 0),
        ("I", 90, 89, "b", 0, 1, '{"role":"u","text":"b"}', None, 1),
        ("I", 120, 119, "c", 0, 1, '{"role":"u","text":"c"}', None, 0),  # above watermark
    ]
    df = spark.createDataFrame(rows, schema)
    reg = default_registry(10**9)[:1]

    orig = CowTable._commit_manifest
    calls = {"n": 0}

    def crashing(self, manifest):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected crash before manifest commit")
        return orig(self, manifest)

    CowTable._commit_manifest = crashing
    try:
        with pytest.raises(RuntimeError, match="injected"):
            apply_epoch(table, reg, df, batch_id=0, strict_frontier=True)
        # nothing committed: fence still open, table empty, pending orphaned
        assert table.last_committed_batch() == -1
        assert table.read_pending() is None  # manifest never referenced it
        # retry the SAME epoch (foreachBatch redelivery)
        r = apply_epoch(table, reg, df, batch_id=0, strict_frontier=True)
        assert not r.stats.skipped
    finally:
        CowTable._commit_manifest = orig
    vis = {r["conv_id"] for r in table.snapshot().collect()}
    assert vis == {"a", "b"} and table.read_pending().count() == 1
    table.vacuum(keep_manifests=1)  # orphan pending generation reclaimed
    import glob as g
    assert len(g.glob(str(tmp_path / "t" / "pending" / "*"))) == 1


# ------------------------------------------------------- bank invariant

def test_bank_invariant_across_epochs(spark, tmp_path):
    """Bank-style invariant (reference tests/integration_tests/bank): every
    update moves value between two accounts in the SAME commit_ts txn, so
    SUM(balance) is constant at every epoch boundary."""
    from tiflow_spark.sinks.cow_table import CowTable

    n_acct, total = 40, 40 * 100
    schema = (
        "op STRING, commit_ts LONG, start_ts LONG, conv_id STRING, turn_idx INT, "
        "role STRING, text STRING, tool STRING, ts TIMESTAMP, balance LONG, "
        "source_partition INT"
    )
    table = CowTable(
        spark, str(tmp_path / "bank"), n_buckets=4,
        data_schema={"role": "string", "text": "string", "tool": "string",
                     "ts": "timestamp", "balance": "bigint"},
    )
    balances = {f"acct{i}": 100 for i in range(n_acct)}
    seed_rows = [
        ("I", 0, -1, k, 0, None, None, None, None, v, i % 4)
        for i, (k, v) in enumerate(balances.items())
    ]
    table.merge(spark.createDataFrame(seed_rows, schema), batch_id=0)

    import random
    rng = random.Random(5)
    for epoch in range(1, 6):
        rows = []
        for t in range(25):  # 25 transfers per epoch
            a, b = rng.sample(list(balances), 2)
            amt = rng.randint(1, balances[a])
            balances[a] -= amt
            balances[b] += amt
            cts = epoch * 1000 + t
            rows.append(("U", cts, cts - 1, a, 0, None, None, None, None, balances[a], 0))
            rows.append(("U", cts, cts - 1, b, 0, None, None, None, None, balances[b], 1))
        table.merge(spark.createDataFrame(rows, schema), batch_id=epoch)
        got = table.snapshot().agg({"balance": "sum"}).first()[0]
        assert got == total, f"epoch {epoch}: sum {got} != {total}"
