"""Deduplication suite for training-data pipelines.

Exact (hash-groupBy), MinHash+LSH, SimHash, and n-gram Jaccard near-dup —
each expressed so the heavy lifting is a shuffle Spark already optimizes:

- exact: one partial-aggregating groupBy on a fingerprint — at 100 TB this
  shuffles one row per distinct document, not per input row;
- MinHash/LSH: shingle → k min-hashes → band keys → self-join on band
  (candidates only; |candidates| << |pairs|), verify with true Jaccard;
- SimHash: 60-bit majority signature via bit-count aggregation, block join;
- n-gram Jaccard: exact verification driven BY the candidate pair list
  (two hash joins), or the inverted shingle index for small all-pairs runs.

Hashing (functions/xhash.py): ONE md5 per shingle/token reduced to a 60-bit
int; the k MinHash permutations are integer universal hashes on top of it.
That is both the fast path (round 1 spent 37% of the bench on k md5 strings
per shingle) AND the oracle path — DuckDB evaluates the identical integer
arithmetic, so every function here has an exact cross-engine oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tiflow_spark.functions.text import fingerprint
from tiflow_spark.functions.xhash import P_MH, h60, minhash_params


def _spread(docs: DataFrame) -> DataFrame:
    """Ensure row-expanding work (shingle/token explode) runs wide.

    A small parquet file arrives as ONE input split, so the ~100x explode
    fan-out would run in a single task regardless of cluster size (measured:
    14s single-task vs <1s wide at sf0.1). The repartition shuffles only the
    compact pre-explode rows — negligible — and is skipped when the scan
    already has enough splits (the 100 TB case)."""
    target = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < target:
        return docs.repartition(target)
    return docs


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id document per exact (normalized) text. Returns
    (fp, keep_id, n_dupes)."""
    return (
        docs.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dupes"))
    )


def shingles(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    distinct: bool = True,
) -> DataFrame:
    """Character n-gram shingles per document: (id, shingle). Built with
    sequence+transform (JVM), exploded lazily.

    ``distinct=True`` gives set semantics — REQUIRED for Jaccard (sizes and
    intersections are set-wise) but costs a full shuffle of the exploded
    rows. MinHash consumers should pass ``distinct=False``: min() over a
    multiset equals min() over its set, so the signature is identical and
    the pipeline becomes explode → map-side partial min → one row per doc
    shuffled (round-1 bench spent most of the minhash query in this
    distinct, not in the hashing)."""
    # Project the normalized text ONCE before building the gram array: an
    # expression referenced inside a transform() lambda is re-evaluated per
    # ELEMENT, so inlining `norm` ran regexp_replace once per shingle —
    # 14.8M regexp evaluations at sf1.0 instead of 50k (r6 plan dump;
    # measured 6.1s -> 1.1s for the explode alone).
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    base = _spread(docs).select(F.col(id_col).alias("id"), norm.alias("_norm"))
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length("_norm") - n + 1, F.lit(1))),
        lambda i: F.col("_norm").substr(i, F.lit(n)),
    )
    out = base.select("id", F.explode(grams).alias("shingle"))
    return out.distinct() if distinct else out


def minhash_signatures(sh: DataFrame, k: int = 8) -> DataFrame:
    """k min-hashes per document: one md5 per shingle reduced to a 60-bit
    int, then k universal-hash permutations min()'d in one groupBy
    (map-side combine: one signature row per doc crosses the shuffle).
    Output: (id, h0..h{k-1}) as BIGINT."""
    # hash ONCE via a projected column: inlining `base` into the k min()
    # aggregates re-evaluates md5+conv k times per shingle (the aggregate
    # planner does no subexpression elimination across aggregate functions —
    # confirmed in the r6 plan dump: every partial_min carried its own
    # conv(substring(md5(...)))). Same fix simhash64 carries; measured
    # 5.6s -> 2.0s at sf1.0 (k=4, 50k docs).
    base = (h60(F.col("shingle")) % F.lit(P_MH)).alias("_mh_base")
    sh = sh.select("id", base)
    aggs = [
        F.min((F.lit(a) * F.col("_mh_base") + F.lit(b)) % F.lit(P_MH)).alias(f"h{i}")
        for i, (a, b) in enumerate(minhash_params(k))
    ]
    return sh.groupBy("id").agg(*aggs)


def lsh_candidate_pairs(sigs: DataFrame, k: int = 8, bands: int = 4) -> DataFrame:
    """Band the k-wide signature into `bands` groups of k/bands rows; docs
    sharing any band key are candidates. Output: (id_a, id_b) with a < b."""
    rows_per_band = k // bands
    band_keys = [
        F.concat_ws(
            "|",
            F.lit(str(b)),
            *[
                F.col(f"h{b * rows_per_band + i}").cast("string")
                for i in range(rows_per_band)
            ],
        )
        for b in range(bands)
    ]
    stacked = sigs.select("id", F.explode(F.array(*band_keys)).alias("band_key"))
    left = stacked.alias("a")
    right = stacked.alias("b")
    return (
        left.join(right, "band_key")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def jaccard_pairs(
    sh: DataFrame, candidates: DataFrame | None = None, threshold: float = 0.0
) -> DataFrame:
    """Exact n-gram Jaccard. With ``candidates`` given, the join is DRIVEN by
    the candidate pairs: candidates ⋈ shingles(id_a) ⋈ shingles(id_b, same
    shingle) — cost is sum over candidate pairs of |shingles(a)|, LINEAR in
    the candidate count. (Round 1 ran the full all-pairs inverted-index
    self-join first and semi-joined after — LSH pruned nothing and common
    trigrams made the self-join quadratic; this plan never builds it.)
    Without candidates: the inverted-index all-pairs path, for small inputs
    or verification only. Output: (id_a, id_b, jaccard)."""
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    if candidates is not None:
        inter = (
            candidates.join(
                sh.select(F.col("id").alias("id_a"), "shingle"), "id_a"
            )
            .join(
                sh.select(F.col("id").alias("id_b"), F.col("shingle")),
                ["id_b", "shingle"],
            )
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
    else:
        a = sh.alias("a")
        b = sh.alias("b")
        inter = (
            a.join(b, "shingle")
            .filter(F.col("a.id") < F.col("b.id"))
            .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
    out = (
        inter.join(sizes.withColumnsRenamed({"id": "id_a", "sz": "sz_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "sz": "sz_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")),
        )
        .select("id_a", "id_b", "jaccard")
    )
    return out.filter(F.col("jaccard") >= threshold) if threshold > 0 else out


def winnowing_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    scheme): hash every k-gram, then keep the MINIMUM hash of each sliding
    window of ``window`` consecutive k-grams — a position-robust local
    fingerprint set guaranteeing any shared substring of length
    >= k + window - 1 yields a shared fingerprint. The partial-overlap
    detector that exact/minhash dedup misses (those are whole-document).

    All JVM higher-order functions: one transform builds the k-gram hash
    array, a second takes per-window array_min slices; explode + distinct.
    Cross-engine exact via h60 (DuckDB oracle: list_transform +
    list_min(list_slice)). Output: (id, fp) distinct."""
    # norm and the k-gram hash array are projected as columns stage by
    # stage: referencing them inline inside the transform() lambdas would
    # re-evaluate them per ELEMENT (norm = one regexp per k-gram, hashes =
    # one md5 array rebuild per window) — same per-element re-evaluation
    # trap measured in shingles() (r6).
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    base = _spread(docs).select(F.col(id_col).alias("id"), norm.alias("_norm"))
    n_grams = F.greatest(F.length("_norm") - k + 1, F.lit(1))
    hashes = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: h60(F.col("_norm").substr(i, F.lit(k))),
    )
    hashed = base.select("id", hashes.alias("_hs"))
    n_windows = F.greatest(F.size("_hs") - window + 1, F.lit(1))
    fps = F.transform(
        F.sequence(F.lit(1), n_windows),
        lambda w: F.array_min(F.slice(F.col("_hs"), w, window)),
    )
    return hashed.select("id", F.explode(fps).alias("fp")).distinct()


def simhash64(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """60-bit SimHash per document: per word-token md5-derived hash, majority
    vote per bit. Pure DataFrame math: explode tokens → for each bit, sum ±1
    → reassemble. One groupBy; the 60 aggregates are one vectorized pass.
    60 bits (15 md5 hex chars) keeps the signature cross-engine exact (see
    xhash.py). Output: (id, simhash)."""
    n_bits = 60
    toks = _spread(docs).select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok"),
    ).filter(F.length("tok") > 0)
    # hash ONCE via a projected column — relying on codegen subexpression
    # elimination across the 60 aggregate inputs is not guaranteed
    # (measured: ~20% faster than the inline form)
    toks = toks.withColumn("h", h60(F.col("tok")))
    h = F.col("h")
    aggs = [
        F.sum(
            F.when(F.shiftright(h, bit).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{bit}")
        for bit in range(n_bits)
    ]
    votes = toks.groupBy("id").agg(*aggs)
    sig = F.lit(0).cast("long")
    for bit in range(n_bits):
        sig = sig + F.when(F.col(f"b{bit}") > 0, F.lit(1 << bit)).otherwise(0).cast("long")
    return votes.select("id", sig.alias("simhash"))


def _propagate(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """One min-label-propagation round: every node takes the minimum of its
    own label and its neighbors' labels. Two distributed hash joins + one
    partial-aggregating groupBy — no single-task stage anywhere (pinned by
    tests/test_scale_plans.py)."""
    nbr = (
        edges.join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(F.col("src").alias("id"))
        .agg(F.min("comp").alias("nbr_comp"))
    )
    return labels.join(nbr, "id", "left").select(
        "id", F.least("comp", F.coalesce("nbr_comp", "comp")).alias("comp")
    )


def _shortcut(labels: DataFrame) -> DataFrame:
    """Pointer-doubling round: label(v) ← label(label(v)). A label is always
    the id of a node in the same component (it starts as the node's own id
    and only ever takes other nodes' labels), so following it one hop stays
    in-component and can only lower the label. Each round halves the depth
    of every label-pointer chain, so propagate+shortcut reaches the
    component minimum in O(log diameter) rounds where propagate alone needs
    O(diameter) — the difference between 8 and 10^6 rounds on a chain of
    near-dup docs (versioned/templated pages DO form long chains: each
    revision is near its neighbors but not its distant ancestors). One
    self-join on the label table, no edge scan."""
    ptr = labels.select(
        F.col("id").alias("comp"), F.col("comp").alias("_hop")
    )
    return labels.join(ptr, "comp", "left").select(
        "id", F.least("comp", F.coalesce("_hop", "comp")).alias("comp")
    )


def connected_components(
    pairs: DataFrame,
    left: str = "id_a",
    right: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Transitive closure of near-dup PAIRS into clusters: distributed
    connected components by iterative min-label propagation. Every
    similarity path here (LSH-Jaccard, SimHash, embedding near-dups) emits
    verified pairs; an actual corpus dedup must close them into components
    and keep ONE representative per component before it can drop anything.

    Algorithm: alternate label(v) ← min(label(v), min over neighbors'
    labels) with a pointer-doubling shortcut label(v) ← label(label(v))
    (see ``_shortcut``) to fixpoint — each round is one shuffle join + one
    partial-aggregating groupBy over the EDGE list (never an all-pairs
    product) plus one label-table self-join, converging in O(log diameter)
    rounds; the label of every component is its minimum node id.
    Band-collision cliques close in 2-3 rounds either way; the shortcut is
    for chain-shaped components (revision/template chains), where plain
    propagation needs O(diameter) rounds. Convergence is detected by the sum of
    labels (strictly decreasing until fixpoint — one tiny aggregate per
    round, no extra join), summed as decimal(38,0): node ids here are
    md5-derived 60-bit ints (functions/xhash.py), so an int64 sum would
    overflow after ~8 labels and crash under ANSI mode. Lineage is truncated per round
    (localCheckpoint; on a real cluster set a checkpoint dir and swap in
    .checkpoint() for executor-loss resilience).

    No driver-side union-find: the driver only sees one scalar per round.
    Reference analog is conceptual (sync_diff chunk grouping); the real
    precedent is every production corpus pipeline (e.g. the C4/Gopher dedup
    stages). Output: (id, comp) for every node that appears in ``pairs``;
    comp = min node id of the component.
    """
    edges = (
        pairs.select(F.col(left).alias("src"), F.col(right).alias("dst"))
        .union(
            pairs.select(F.col(right).alias("src"), F.col(left).alias("dst"))
        )
        .distinct()
        .persist()
    )
    labels = edges.select(F.col("src").alias("id")).distinct().select(
        "id", F.col("id").alias("comp")
    ).localCheckpoint()
    def _label_sum(df):
        return df.agg(F.sum(F.col("comp").cast("decimal(38,0)"))).first()[0]

    prev_sum = _label_sum(labels)
    if prev_sum is None:
        edges.unpersist()
        return labels
    for _ in range(max_iter):
        labels = _shortcut(_propagate(edges, labels)).localCheckpoint()
        cur_sum = _label_sum(labels)
        if cur_sum == prev_sum:
            edges.unpersist()
            return labels
        prev_sum = cur_sum
    edges.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        f"with pointer-doubling that bounds diameter by ~2^{max_iter}; "
        "the pair graph is malformed"
    )


def component_representatives(
    docs: DataFrame,
    components: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Representative selection over a cluster closure: each document joins
    its component (docs in no pair are their own singleton component) and
    the LOWEST doc id per component is kept. The closure's label already IS
    the component's minimum node id, so the representative test is a plain
    equality — one hash join, no window, no extra shuffle. Output:
    (doc_id, component, is_representative); filter is_representative to
    drop near-dups."""
    lab = components.select(
        F.col("id").alias(id_col), F.col("comp").alias("component")
    )
    return (
        docs.select(id_col)
        .join(lab, id_col, "left")
        .select(
            id_col, F.coalesce("component", F.col(id_col)).alias("component")
        )
        .withColumn("is_representative", F.col(id_col) == F.col("component"))
    )


def simhash_near_dups(sigs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash: block on (max_hamming + 1) bit-slices of
    the signature — by pigeonhole, any pair within the distance bound agrees
    exactly on at least one slice — then verify true Hamming distance.
    Fewer blocks = cheaper join but tighter guarantee; 4 x 16-bit blocks is
    the classic <=3 configuration. Output: (id_a, id_b, hamming)."""
    n_blocks = min(max_hamming + 1, 32)
    width = -(-64 // n_blocks)  # ceil; last block may be narrower
    blocks = sigs.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.concat(
                        F.lit(f"{i}:"),
                        F.shiftright("simhash", i * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .cast("string"),
                    )
                    for i in range(n_blocks)
                ]
            )
        ).alias("block"),
    )
    a, b = blocks.alias("a"), blocks.alias("b")
    cand = (
        a.join(b, "block")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
