"""Streaming changefeed + restart-from-checkpoint tests (SURVEY.md §7.3).

Mirrors the reference's changefeed_pause_resume / resume_with_checkpoint_ts
integration suites (/root/reference/tests/integration_tests/): run, stop
mid-stream, resume from the SS checkpoint, verify redelivered epochs are
absorbed and the final state equals the oracle."""

import glob

from tests.test_e2e_replay import SPEC, assert_matches_oracle, oracle_state
from tiflow_spark.sinks.cow_table import CowTable
from tiflow_spark.sources.datagen import write_epoch_files
from tiflow_spark.sources.registry import default_registry
from tiflow_spark.streaming.runner import Changefeed


def make_feed(spark, tmp_path, **kw):
    events_dir = str(tmp_path / "events")
    write_epoch_files(spark, SPEC, events_dir)
    # file source reads a flat glob; epoch dirs hold the files
    table = CowTable(spark, str(tmp_path / "table"), n_buckets=8)
    return Changefeed(
        spark=spark,
        events_dir=events_dir + "/epoch_*",
        table=table,
        registry=default_registry(SPEC.ddl_ts),
        checkpoint_dir=str(tmp_path / "ckpt"),
        **kw,
    )


def test_streaming_drain_matches_oracle(spark, tmp_path):
    feed = make_feed(spark, tmp_path, max_files_per_trigger=3)
    feed.run_available_now()
    assert len(feed.batch_log) >= 2, "expected multiple microbatches"
    assert_matches_oracle(feed.table, oracle_state(spark, SPEC))


def test_restart_from_checkpoint(spark, tmp_path):
    """First run processes only part of the log (simulated crash by stopping
    after a bounded run); second run resumes from the checkpoint and drains.
    The epoch fence + idempotent merge absorb any batch replay."""
    feed = make_feed(spark, tmp_path, max_files_per_trigger=2)

    # crash simulation: drain only the first trigger by pointing
    # maxFilesPerTrigger at a subset — run once on a partial glob
    partial = Changefeed(
        spark=spark,
        events_dir=feed.events_dir.replace("epoch_*", "epoch_000[0-2]"),
        table=feed.table,
        registry=feed.registry,
        checkpoint_dir=feed.checkpoint_dir,
        max_files_per_trigger=2,
    )
    partial.run_available_now()
    assert partial.table.last_committed_batch() >= 0

    # resume on the full log with the SAME checkpoint: already-consumed files
    # are not re-read; new ones continue with increasing batch ids
    feed.run_available_now()
    assert_matches_oracle(feed.table, oracle_state(spark, SPEC))

    # lineage has one row-group per committed epoch's partitions
    assert feed.table.lineage().count() > 0
    # epochs strictly increasing
    epochs = [r["batch_id"] for r in feed.table.epochs().orderBy("committed_at").collect()]
    assert epochs == sorted(epochs)


def test_restart_replays_inflight_epoch_idempotently(spark, tmp_path):
    """Delete the sink's fence state mid-run? No — stronger: re-run the SAME
    drained checkpoint; Spark re-delivers nothing, table unchanged. Then
    manually re-merge the last batch (simulating a foreachBatch retry after
    a crash between merge-commit and SS offset-commit) — fence skips it."""
    feed = make_feed(spark, tmp_path, max_files_per_trigger=3)
    feed.run_available_now()
    state_before = feed.table.current_manifest()

    feed.run_available_now()  # nothing new
    assert feed.table.current_manifest()["batch_id"] == state_before["batch_id"]

    # simulate foreachBatch retry with an already-committed batch id
    from tiflow_spark.plans.pipeline import apply_epoch
    from tiflow_spark.sources.datagen import generate_change_events

    events = generate_change_events(spark, SPEC)
    last_id = feed.table.last_committed_batch()
    res = apply_epoch(feed.table, feed.registry, events, batch_id=last_id)
    assert res.stats.skipped
    assert_matches_oracle(feed.table, oracle_state(spark, SPEC))


def test_epoch_files_band_commit_ts(spark, tmp_path):
    events_dir = str(tmp_path / "events")
    paths = write_epoch_files(spark, SPEC, events_dir)
    assert len(glob.glob(events_dir + "/epoch_*")) == len(paths)
    for k, p in enumerate(paths):
        df = spark.read.parquet(p)
        if df.isEmpty():
            continue
        lo, hi = df.selectExpr("min(commit_ts)", "max(commit_ts)").first()
        assert lo >= k * 1000 and hi < (k + 1) * 1000


def test_synced_status(spark, tmp_path):
    from tiflow_spark.sources.datagen import TS_BAND

    feed = make_feed(spark, tmp_path, max_files_per_trigger=4)
    assert not feed.synced()  # nothing applied yet
    feed.run_available_now()
    # after a full drain the applied watermark is within one commit_ts band
    # of the newest source event (the last epoch's frontier)
    assert feed.synced(lag_threshold=TS_BAND)
