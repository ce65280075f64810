"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query (CDC LWW final state) on sf0.001.
queries()      — operator inventory over /root/testdata tables.
oracle_sql()   — DuckDB-equivalent SQL for each query (same column names).

Implementations live in tiflow_spark/plans/bench_queries.py; the CDC ones
exercise the engine operators (LWW dedup, frontier, compactor algebra,
update split, event filter, checksum validation), the rest cover the
training-data pipeline suite (text analysis, dedup, ANN).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tiflow_spark.plans.bench_queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["cdc_lww_final_state"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
