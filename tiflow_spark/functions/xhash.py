"""Cross-engine deterministic hashing & quantization primitives.

Every approximate operator in this engine (MinHash, SimHash, hyperplane LSH)
needs a hash that Spark, DuckDB (the driver's oracle engine), and plain
Python compute identically. xxhash64 is Spark-only, so the shared base is
md5 — bit-identical everywhere — reduced to a 60-bit non-negative integer:

    h60(s) = int(md5(s).hexdigest()[:15], 16)          # Python
           = conv(substring(md5(s), 1, 15), 16, 10)    # Spark SQL
           = ('0x' || substr(md5(s), 1, 15))::BIGINT   # DuckDB

15 hex chars = 60 bits < 2^63: always a valid non-negative BIGINT in both
engines, so modular arithmetic on top of it agrees exactly.

md5 costs ~2x xxhash64, so it is computed ONCE per input token/shingle and
the k MinHash permutations are derived with universal-hash arithmetic
(a*h + b mod P) — integer ops both engines evaluate identically, with all
intermediates < 2^62 (no overflow; DuckDB errors on BIGINT overflow, Spark
wraps — staying under 2^62 keeps them in agreement).

Embedding math: float components are quantized to integers
(floor(x * 1e6) as long). Integer dot products whose partial sums stay
< 2^53 are exact in ANY summation order in both integer and double
arithmetic, which makes LSH bucket signs and cosine ranks bit-reproducible
across engines — floats alone cannot promise that.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne prime 2^31-1: (a % P) * (h % P) < 2^62 — overflow-safe in BIGINT.
P_MH = (1 << 31) - 1

# Fixed-point scale for embedding quantization. |x| <= ~1 -> |q| <= ~1e6;
# dot with 1e3-scale plane coeffs over dim<=4096 stays well under 2^53.
Q_SCALE = 1_000_000


def h60_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def h60(col: Column) -> Column:
    """Spark column form of h60 (see module docstring)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def h60_sql(expr: str) -> str:
    """DuckDB SQL form of h60 over an arbitrary string expression."""
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def minhash_params(k: int) -> list[tuple[int, int]]:
    """k deterministic universal-hash (a, b) pairs, a in [1, P), b in [0, P)."""
    return [
        (h60_py(f"mh_a:{i}") % (P_MH - 1) + 1, h60_py(f"mh_b:{i}") % P_MH)
        for i in range(k)
    ]


def qvec(col: Column) -> Column:
    """Quantize array<float|double> to array<long> fixed-point."""
    return F.transform(
        col.cast("array<double>"),
        lambda x: F.floor(x * Q_SCALE).cast("long"),
    )


def dot_long(a: Column, b: Column) -> Column:
    """Exact integer dot product of two array<long> columns (JVM-side)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


QVEC_SQL = "list_transform({v}, x -> CAST(floor(x::DOUBLE * 1000000) AS BIGINT))"


def qvec_sql(vec_expr: str) -> str:
    """DuckDB SQL form of qvec."""
    return QVEC_SQL.format(v=vec_expr)
