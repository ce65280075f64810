"""Codec round-trips + consumer replay verification (the reference's
kafka-consumer/storage-consumer loop: the encoded stream alone must
reconstruct downstream state), plus generated columns and binlog filters."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tiflow_spark.functions.decode import with_generated_columns
from tiflow_spark.operators.filters import (
    BinlogFilterRule,
    apply_binlog_filter,
)
from tiflow_spark.sinks import codecs
from tiflow_spark.sinks.cow_table import CowTable
from tiflow_spark.sinks.mq import canal_json_decode, encode_for_mq, write_mq_files
from tiflow_spark.sources.registry import SchemaVersion

DECODED_SCHEMA = (
    "op STRING, commit_ts LONG, start_ts LONG, conv_id STRING, turn_idx INT, "
    "role STRING, text STRING, tool STRING, source_partition INT"
)


@pytest.fixture()
def decoded(spark):
    rows = [
        ("I", 10, 9, "c1", 0, "user", "hello", None, 0),
        ("U", 20, 19, "c1", 0, "user", "hello again", "T1", 0),
        ("D", 30, 29, "c2", 1, None, None, None, 1),
        ("I", 15, 14, "c3", 2, "assistant", "yo, commas,in,text", "T2", 1),
    ]
    return spark.createDataFrame(rows, DECODED_SCHEMA)


VALUE_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
    ]
)


def test_open_protocol_round_trip(spark, decoded):
    enc = codecs.open_protocol_encode(decoded)
    dec = codecs.open_protocol_decode(enc, VALUE_SCHEMA)
    got = {(r["conv_id"], r["turn_idx"], r["commit_ts"]): (r["op"], r["text"])
           for r in dec.collect()}
    assert got[("c1", 0, 20)] == ("U", "hello again")
    assert got[("c2", 1, 30)][0] == "D"
    assert len(got) == 4


def test_csv_round_trip(spark, decoded):
    # commas/quotes/newlines round-trip via RFC-4180 quoting since round 2
    # (exhaustively exercised in test_codec_fuzz.py) — no filtering needed
    enc = codecs.csv_encode(decoded)
    dec = codecs.csv_decode(enc, VALUE_SCHEMA)
    got = {(r["conv_id"], r["turn_idx"]): (r["op"], r["text"], r["tool"])
           for r in dec.collect()}
    assert got[("c1", 0)] in {("I", "hello", None), ("U", "hello again", "T1")}
    assert got[("c2", 1)] == ("D", None, None)


def test_avro_json_round_trip(spark, decoded):
    ver = SchemaVersion(1, 0, VALUE_SCHEMA)
    enc = codecs.avro_json_encode(decoded, ver)
    assert enc.filter(F.col("value").contains('"tool":null')).count() >= 1
    dec = codecs.avro_json_decode(enc, ver)
    got = {(r["conv_id"], r["turn_idx"]): (r["text"], r["tool"]) for r in dec.collect()}
    assert got[("c3", 2)] == ("yo, commas,in,text", "T2")
    assert got[("c2", 1)] == (None, None)


def test_claim_check(spark, tmp_path, decoded):
    frame = encode_for_mq(decoded, n_partitions=4)
    # threshold below every message size -> everything externalized
    split = codecs.claim_check_split(frame, max_bytes=40, claim_dir=str(tmp_path / "claims"))
    assert split.filter("is_claim").count() >= 1
    small = split.filter("NOT is_claim")
    ptrs = split.filter("is_claim")
    assert ptrs.filter(F.col("value").contains("claimCheckLocation")).count() == ptrs.count()
    resolved = codecs.claim_check_resolve(split, spark, str(tmp_path / "claims"))
    orig = {r["key"]: r["value"] for r in frame.collect()}
    back = {r["key"]: r["value"] for r in resolved.collect()}
    assert back == orig


def test_mq_consumer_replay_reconstructs_state(spark, tmp_path, decoded):
    """Encode the change stream as canal-JSON MQ messages, then a consumer
    re-applies the DECODED messages into a fresh CowTable: final state must
    equal applying the original rows directly (kafka-consumer + sync-diff
    posture)."""
    data_schema = ("conv_id STRING, turn_idx INT, role STRING, text STRING, "
                   "tool STRING")
    # producer
    frame = encode_for_mq(decoded, n_partitions=4)
    write_mq_files(frame, str(tmp_path / "mq"))
    # consumer
    consumed = canal_json_decode(
        spark.read.parquet(str(tmp_path / "mq")), data_schema
    ).withColumn("start_ts", F.col("commit_ts") - 1).withColumn(
        "source_partition", F.lit(0)
    )
    t_direct = CowTable(spark, str(tmp_path / "direct"), n_buckets=4,
                        data_schema={"role": "string", "text": "string", "tool": "string"})
    t_direct.merge(decoded, batch_id=0)
    t_replay = CowTable(spark, str(tmp_path / "replay"), n_buckets=4,
                        data_schema={"role": "string", "text": "string", "tool": "string"})
    t_replay.merge(consumed, batch_id=0)

    def state(t):
        return {
            (r["conv_id"], r["turn_idx"]): (r["role"], r["text"], r["tool"])
            for r in t.snapshot().collect()
        }

    assert state(t_replay) == state(t_direct)
    assert ("c1", 0) in state(t_replay)


def test_generated_columns(spark, decoded):
    out = with_generated_columns(
        decoded, {"text_len": "length(text)", "is_tool_turn": "tool IS NOT NULL"}
    )
    got = {(r["conv_id"], r["turn_idx"], r["commit_ts"]): (r["text_len"], r["is_tool_turn"])
           for r in out.collect()}
    assert got[("c1", 0, 10)] == (5, False)
    assert got[("c3", 2, 15)] == (18, True)


def test_binlog_filter_rules(spark):
    rows = [
        ("I", "app_users", 1), ("D", "app_users", 2),
        ("I", "tmp_scratch", 3), ("DDL", "app_users", 4), ("U", "logs_2024", 5),
    ]
    df = spark.createDataFrame(rows, "op STRING, table_name STRING, commit_ts LONG")
    # ignore deletes+DDL on app_*, ignore everything on tmp_*
    rules = (
        BinlogFilterRule(table_regex="^app_.*", events=frozenset({"D", "DDL"})),
        BinlogFilterRule(table_regex="^tmp_.*"),
    )
    kept = {r["commit_ts"] for r in apply_binlog_filter(df, rules).collect()}
    assert kept == {1, 5}
    # do-rule whitelist is scoped to the tables its regex matches
    # (reference filter.go:341 keeps tables no rule matches): within app_*
    # only inserts survive; tmp_scratch/logs_2024 match no rule -> kept
    do = (BinlogFilterRule(table_regex="^app_.*", events=frozenset({"I"}), action="do"),)
    kept2 = {r["commit_ts"] for r in apply_binlog_filter(df, do).collect()}
    assert kept2 == {1, 3, 5}

def test_shard_merge_routing(spark, tmp_path):
    """DM shard merge: N upstream shard tables route into ONE target
    (route_rules regex -> target); LWW + merge semantics apply across
    shards as one table."""
    from tiflow_spark.operators.filters import RouteRule
    from tiflow_spark.sources.registry import SchemaVersion
    from tiflow_spark.streaming.runner import Changefeed

    reg = [SchemaVersion(1, 0, T.StructType([
        T.StructField("role", T.StringType()), T.StructField("text", T.StringType())]))]
    rows = [
        ("I", 10, 9, "a", 0, 1, '{"role":"u","text":"s0"}', None, 0, "chats_0"),
        ("I", 11, 10, "b", 0, 1, '{"role":"u","text":"s1"}', None, 1, "chats_1"),
        # same key updated across shards: later commit_ts wins post-merge
        ("U", 20, 19, "a", 0, 1, '{"role":"u","text":"s1-new"}', None, 1, "chats_1"),
        ("I", 12, 11, "x", 0, 1, '{"role":"u","text":"other"}', None, 0, "audit"),
    ]
    schema = (
        "op STRING, commit_ts LONG, start_ts LONG, conv_id STRING, turn_idx INT, "
        "schema_version LONG, payload STRING, pre_payload STRING, "
        "source_partition INT, table_name STRING"
    )
    events_dir = str(tmp_path / "events")
    spark.createDataFrame(rows, schema).write.parquet(events_dir)
    from tiflow_spark.sinks.cow_table import data_schema_from_registry

    target = CowTable(spark, str(tmp_path / "chats"), n_buckets=4,
                      data_schema=data_schema_from_registry(reg))
    feed = Changefeed(
        spark=spark, events_dir=events_dir,
        checkpoint_dir=str(tmp_path / "ckpt"),
        tables={"chats": (target, reg)},
        route_rules=(RouteRule(table_regex="^chats_.*", target="chats"),),
    )
    feed.run_available_now()
    got = {(r["conv_id"], r["turn_idx"]): r["text"] for r in target.snapshot().collect()}
    # both shards merged; cross-shard LWW on key 'a'; 'audit' NOT routed
    assert got == {("a", 0): "s1-new", ("b", 0): "s1"}


def test_mq_changefeed_consumer_loop(spark, tmp_path):
    """Full streaming->MQ->consumer loop: changefeed encodes the change
    stream to batch-fenced MQ files; a consumer decodes and replays into a
    fresh CowTable; final state equals the direct-table changefeed
    (kafka-consumer + sync-diff posture, end to end)."""
    import glob

    from tests.test_e2e_replay import SPEC, assert_matches_oracle, oracle_state
    from tiflow_spark.sources.datagen import write_epoch_files
    from tiflow_spark.sources.registry import default_registry
    from tiflow_spark.streaming.runner import Changefeed

    events_dir = str(tmp_path / "events")
    write_epoch_files(spark, SPEC, events_dir)
    feed = Changefeed(
        spark=spark,
        events_dir=events_dir + "/epoch_*",
        checkpoint_dir=str(tmp_path / "ckpt"),
        registry=default_registry(SPEC.ddl_ts),
        max_files_per_trigger=3,
    )
    mq_dir = str(tmp_path / "mq")
    feed.run_mq(mq_dir, n_partitions=4)
    assert len(glob.glob(mq_dir + "/batch=*")) >= 2

    # consumer: decode the envelope and replay into a table
    data_schema = ("conv_id STRING, turn_idx INT, role STRING, text STRING, "
                   "tool STRING, ts TIMESTAMP")
    consumed = canal_json_decode(
        spark.read.parquet(mq_dir + "/batch=*"), data_schema
    ).withColumn("start_ts", F.col("commit_ts") - 1).withColumn(
        "source_partition", F.lit(0)
    )
    table = CowTable(spark, str(tmp_path / "replayed"), n_buckets=8)
    table.merge(consumed, batch_id=0)
    assert_matches_oracle(table, oracle_state(spark, SPEC))
