"""MQ sink encoding/dispatch, storage sink round-trip, multimodal plumbing."""

import json

import pytest
from pyspark.sql import functions as F

from tests.test_e2e_replay import SPEC, assert_matches_oracle, oracle_state
from tiflow_spark.functions.decode import decode_payload
from tiflow_spark.functions.multimodal import (
    extract_features,
    frame_sample_plan,
    synthetic_media,
)
from tiflow_spark.operators.lww import with_op_order
from tiflow_spark.plans.pipeline import apply_epoch
from tiflow_spark.sinks.cow_table import CowTable
from tiflow_spark.sinks.mq import encode_for_mq, write_mq_files
from tiflow_spark.sinks.storage import read_change_files, write_change_files
from tiflow_spark.sources.datagen import generate_change_events
from tiflow_spark.sources.registry import default_registry


@pytest.fixture(scope="module")
def decoded(spark):
    ev = generate_change_events(spark, SPEC)
    return decode_payload(with_op_order(ev), default_registry(SPEC.ddl_ts))


def test_mq_encode_and_dispatch(spark, decoded):
    frame = encode_for_mq(decoded, n_partitions=8, dispatch="index-value")
    rows = frame.limit(50).collect()
    for r in rows:
        key = json.loads(r["key"])
        msg = json.loads(r["value"])
        assert set(key) == {"conv_id", "turn_idx"}
        assert msg["type"] in ("INSERT", "UPDATE", "DELETE")
        assert msg["pkNames"] == ["conv_id", "turn_idx"]
        assert 0 <= r["partition"] < 8

    # index-value dispatch: same key → same partition, always
    parts = (
        frame.select(F.col("key"), F.col("partition"))
        .groupBy("key")
        .agg(F.countDistinct("partition").alias("n"))
        .filter("n > 1")
    )
    assert parts.isEmpty()


def test_mq_dispatch_modes(spark, decoded):
    for mode in ("table", "index-value", "ts", "key"):
        frame = encode_for_mq(decoded.limit(100), n_partitions=4, dispatch=mode)
        assert frame.select("partition").distinct().count() >= 1


def test_mq_file_roundtrip(spark, decoded, tmp_path):
    out = str(tmp_path / "mq")
    write_mq_files(encode_for_mq(decoded, n_partitions=4), out)
    back = spark.read.parquet(out)
    assert back.count() == decoded.count()
    assert back.select("partition").distinct().count() == 4


def test_storage_sink_roundtrip_replays_to_same_state(spark, tmp_path, tmp_table_dir):
    """storage-consumer analog (/root/reference/cmd/storage-consumer): the
    encoded change files alone must reconstruct the final table state."""
    registry = default_registry(SPEC.ddl_ts)
    ev = with_op_order(generate_change_events(spark, SPEC))
    decoded = decode_payload(ev, registry)

    root = str(tmp_path / "storage")
    for v in registry:
        sub = decoded.filter(F.col("schema_version") == v.schema_version).drop(
            "pre_payload", "payload", "op_order"
        )
        # v1 files must not carry post-DDL columns
        if "tool" not in v.field_names:
            sub = sub.drop("tool")
        write_change_files(sub, root, v, batch_id=v.schema_version)

    back = read_change_files(spark, root)
    assert "tool" in back.columns  # schema merge backfills v1 files
    back = back.withColumn("turn_idx", F.col("turn_idx").cast("int")).withColumn(
        "source_partition", F.col("source_partition").cast("int")
    )
    table = CowTable(spark, tmp_table_dir, n_buckets=8)
    table.merge(back, batch_id=0)
    assert_matches_oracle(table, oracle_state(spark, SPEC))


def test_multimodal_features(spark):
    media = synthetic_media(spark, n=60)
    feats = extract_features(media, decode="fake")
    rows = feats.collect()
    assert len(rows) == 60
    for r in rows:
        assert len(r["feature"]) == 8
        assert r["n_bytes"] > 0 and len(r["content_hash"]) == 32
    # determinism
    again = {r["media_id"]: r["content_hash"] for r in extract_features(media).collect()}
    assert all(again[r["media_id"]] == r["content_hash"] for r in rows)


def test_multimodal_decode_stub_raises(spark):
    media = synthetic_media(spark, n=4)
    with pytest.raises(Exception, match="NotImplementedError|codec not available"):
        extract_features(media, decode="none").collect()


def test_frame_sample_plan(spark):
    media = synthetic_media(spark, n=100)
    plan = frame_sample_plan(media, every_ms=1000)
    joined = plan.join(media, "media_id").select("media_id", "frame_idx", "sample_ms", "meta.duration_ms")
    rows = joined.collect()
    assert rows, "expected at least one video"
    for r in rows:
        assert r["sample_ms"] <= max(r["duration_ms"], 0)
