"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exactness baseline, plus two scale paths:

- ``topk_cosine``: query set broadcast against the corpus; dot products via
  `F.zip_with` + `F.aggregate` (JVM higher-order functions, no Python);
  per-query top-k via window rank. Cost O(|corpus| * |queries|) — right
  when |queries| is small (the broadcast side).
- ``lsh_bucket_topk``: random-hyperplane LSH — `n_planes` deterministic
  hyperplanes hash each vector to a bucket; queries only score candidates
  in their bucket (+ multiprobe neighbors at Hamming distance 1). The
  IVF-style scale path: a 100 TB corpus is scanned once to bucket, then
  each query touches |corpus| / 2^n_planes rows.
- ``embedding_near_dups``: all-pairs cosine above a threshold within LSH
  buckets — the embedding near-dup detector for training-data dedup.

Deterministic hyperplanes: components derived from xxhash64(seed, plane,
dim) mapped to [-1, 1] — reproducible across runs/cluster sizes with no RNG
state (same rule as the event generator).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def _as_double(col: str) -> Column:
    return F.col(col).cast("array<double>")


def topk_cosine(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query. `queries` (query_id, embedding) is
    broadcast; corpus scanned once. Output: (query_id, vec_id, rank, sim)."""
    q = queries.select(
        F.col(query_id_col), _as_double(vec_col).alias("qvec")
    )
    c = corpus.select(F.col(id_col), _as_double(vec_col).alias("cvec"))
    sim = cosine(F.col("qvec"), F.col("cvec"))
    scored = c.crossJoin(F.broadcast(q)).select(
        query_id_col, id_col, sim.alias("sim")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplane_bucket(
    vec: Column, dim: int, n_planes: int = 8, seed: int = 42
) -> Column:
    """LSH bucket id: sign pattern of `n_planes` deterministic hyperplanes.

    plane[p][d] = (xxhash64(seed,p,d) % 2001 - 1000) / 1000  in [-1, 1].
    """
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        coeffs = F.array(
            *[
                (
                    (
                        F.xxhash64(F.lit(seed), F.lit(p), F.lit(d)) % 2001
                        + F.lit(2001)
                    )
                    % 2001
                    - 1000
                ).cast("double")
                / 1000.0
                for d in range(dim)
            ]
        )
        proj = _dot(vec, coeffs)
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0)).cast("long")
    return bucket


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 6,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's bucket
    (and, with multiprobe, buckets at Hamming distance 1 — recovers most
    recall lost at bucket boundaries). Output like ``topk_cosine``."""
    c = corpus.select(F.col(id_col), _as_double(vec_col).alias("cvec"))
    c = c.withColumn("bucket", hyperplane_bucket(F.col("cvec"), dim, n_planes, seed))

    q = queries.select(F.col(query_id_col), _as_double(vec_col).alias("qvec"))
    q = q.withColumn("qbucket", hyperplane_bucket(F.col("qvec"), dim, n_planes, seed))
    if multiprobe:
        probes = F.array(
            F.col("qbucket"),
            *[F.col("qbucket").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)],
        )
    else:
        probes = F.array(F.col("qbucket"))
    q = q.select(query_id_col, "qvec", F.explode(probes).alias("bucket"))

    sim = cosine(F.col("qvec"), F.col("cvec"))
    scored = c.join(F.broadcast(q), "bucket").select(
        query_id_col, id_col, sim.alias("sim")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def embedding_near_dups(
    corpus: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold, candidate-limited to
    shared LSH buckets. Output: (id_a, id_b, sim)."""
    c = corpus.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("vec"))
    c = c.withColumn("bucket", hyperplane_bucket(F.col("vec"), dim, n_planes, seed))
    a, b = c.alias("a"), c.alias("b")
    pairs = (
        a.join(b, "bucket")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cosine(F.col("a.vec"), F.col("b.vec")).alias("sim"),
        )
        .distinct()
    )
    return pairs.filter(F.col("sim") >= threshold)
