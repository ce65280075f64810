"""Replicates the driver's correctness gate locally: every queries() entry
runs on Spark and (where an oracle exists) its oracle_sql() runs on DuckDB
over the same parquet tables; row counts, column names, and
order-insensitive values must match."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def normalize(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c] if not isinstance(r, tuple) else r[cols.index(c)]
            if isinstance(v, float):
                v = None if math.isnan(v) else round(v, 6)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql().keys()))
def test_query_matches_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    scols = sdf.columns
    srows = [r.asDict() for r in sdf.collect()]

    ores = ddb.execute(entry_mod.oracle_sql()[name])
    ocols = [d[0] for d in ores.description]
    orows = ores.fetchall()

    assert sorted(scols) == sorted(ocols), f"{name}: columns {scols} vs {ocols}"
    assert len(srows) == len(orows), f"{name}: rowcount {len(srows)} vs {len(orows)}"

    cols = sorted(scols)
    s_norm = normalize(srows, cols)
    o_norm = normalize([dict(zip(ocols, r)) for r in orows], cols)
    mism = [(a, b) for a, b in zip(s_norm, o_norm) if a != b]
    assert not mism, f"{name}: first mismatches {mism[:3]}"


def test_rows_only_queries_run(spark):
    """Queries without an oracle still must run and return a stable schema."""
    oracles = set(entry_mod.oracle_sql())
    for name, q in entry_mod.queries().items():
        if name in oracles:
            continue
        df = q(spark, SF_DIR)
        assert df.columns, name
        assert df.count() >= 0, name
