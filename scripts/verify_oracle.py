"""Pre-verify __spark_entry__ queries against their DuckDB oracles at a
given scale factor, mirroring the driver's compare (rows + schema + value
hash with columns sorted by name).

Usage: python scripts/verify_oracle.py [sf_dir] [name ...]
       (default sf_dir=/root/testdata/sf0.01, default names=all)
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def _hash_frame(rows, cols):
    import hashlib

    order = sorted(range(len(cols)), key=lambda i: cols[i])
    h = hashlib.sha256()
    canon = sorted(
        tuple(_canon(r[i]) for i in order) for r in rows
    )
    for row in canon:
        h.update(repr(row).encode())
    return h.hexdigest()


def _canon(v):
    import datetime
    import decimal
    import math

    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    return v


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as entry

    names = sys.argv[2:] or sorted(entry.oracle_sql())
    from tiflow_spark.session import get_spark

    spark = get_spark("verify_oracle", cores=32, shuffle_partitions=32)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = entry.oracle_sql()
    queries = entry.queries()
    failed = []
    for name in names:
        sdf = queries[name](spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = list(sdf.columns)
        cur = con.execute(oracles[name])
        ocols = [d[0] for d in cur.description]
        orows = [tuple(r) for r in cur.fetchall()]
        ok_rows = len(srows) == len(orows)
        ok_schema = sorted(scols) == sorted(ocols)
        ok_hash = (
            ok_rows
            and ok_schema
            and _hash_frame(srows, scols) == _hash_frame(orows, ocols)
        )
        status = "OK" if (ok_rows and ok_schema and ok_hash) else "FAIL"
        print(
            f"{status:4s} {name}: spark={len(srows)} oracle={len(orows)} "
            f"schema={'ok' if ok_schema else f'{sorted(scols)} vs {sorted(ocols)}'} "
            f"hash={'ok' if ok_hash else 'MISMATCH'}"
        )
        if status == "FAIL":
            failed.append(name)
    if failed:
        print("FAILED:", failed)
        sys.exit(1)
    print(f"all {len(names)} queries match at {sf_dir}")


if __name__ == "__main__":
    main()
