"""The deployment contract: the changefeed runs under real `spark-submit
--py-files <zip>` in a FRESH process whose only access to the engine is the
packaged artifact (north rule: spark-submit --py-files on a multi-executor
cluster). Generates a log in-process, then submits the driver script and
checks the applied table."""

import json
import os
import subprocess

import pytest

from tiflow_spark.sources.datagen import GenSpec, write_epoch_files

SPARK_SUBMIT = "/opt/spark/bin/spark-submit"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit")
def test_changefeed_under_spark_submit(spark, tmp_path):
    from scripts.package_pyfiles import build

    spec = GenSpec(n_convs=40, seed=3, emit_ddl=True)
    events_dir = str(tmp_path / "events")
    write_epoch_files(spark, spec, events_dir)
    zip_path = build(str(tmp_path / "tiflow_spark.zip"))

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [
            SPARK_SUBMIT, "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "scripts", "submit_changefeed.py"),
            "--events-dir", events_dir + "/epoch_*",
            "--table-dir", str(tmp_path / "table"),
            "--checkpoint-dir", str(tmp_path / "ckpt"),
            "--ddl-in-stream",
            "--ddl-ts", str(spec.ddl_ts),
            "--max-files-per-trigger", "3",
        ],
        capture_output=True, text=True, timeout=420, cwd=str(tmp_path), env=env,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["rows"] > 0 and summary["batches"] >= 2, summary
    assert summary["resolved_ts"] is not None

    # the submitted job's table is a normal CowTable — readable in-process,
    # with the in-stream DDL's column populated
    from pyspark.sql import functions as F

    from tiflow_spark.sinks.cow_table import CowTable

    table = CowTable(spark, str(tmp_path / "table"), n_buckets=32)
    snap = table.snapshot()
    assert snap.count() == summary["rows"]
    assert snap.filter(F.col("tool").isNotNull()).count() > 0
