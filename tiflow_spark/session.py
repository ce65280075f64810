"""SparkSession construction with scale-appropriate defaults.

Local mode is a stand-in for a multi-executor cluster: every knob below is
chosen so the same code runs unchanged under ``spark-submit --py-files`` on
1000 executors (shuffle partitions and bucket counts are configuration, not
code).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "tiflow_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores`` defaults to ``$SPARK_GRAFT_CPUS`` (driver contract) or ``*``.
    ``shuffle_partitions`` defaults to the core count — on a real cluster
    you would size this to ~2-3x total executor cores and let AQE coalesce.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or None
    master = f"local[{cores}]" if cores else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = cores or 32

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE skew-join split: backstop behind our explicit salting (§2.5).
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("TIFLOW_SPARK_DRIVER_MEM", "16g"))
        # pre-fault the heap and opt out of transparent huge pages: lazy page
        # commit + THP defrag caused multi-10s stalls (3-8x run variance) on
        # shuffle-heavy jobs with large heaps; measured stable 9-10s vs
        # 12-90s swings on the 15M-event LWW job after this change
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:+AlwaysPreTouch -XX:-UseTransparentHugePages",
        )
        .config("spark.ui.enabled", "false")
        # Parquet scan split size — on 100 TB inputs this bounds task size.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    if os.environ.get("TIFLOW_SPARK_LOCAL_DIR"):
        builder = builder.config("spark.local.dir", os.environ["TIFLOW_SPARK_LOCAL_DIR"])
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
