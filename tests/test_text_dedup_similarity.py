"""Training-data pipeline operators: text analysis, dedup suite, ANN."""

import pytest
from pyspark.sql import functions as F

from tiflow_spark.functions.dedup import (
    exact_dedup,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    shingles,
    simhash64,
    simhash_near_dups,
)
from tiflow_spark.functions.similarity import (
    embedding_near_dups,
    lsh_bucket_topk,
    topk_cosine,
)
from tiflow_spark.functions.text import (
    bpe_token_estimate,
    fingerprint,
    lang_id,
    quality_score,
    token_count,
)

DOCS = [
    (0, "The quick brown fox jumps over the lazy dog and the cat."),
    (1, "The quick brown fox jumps over the lazy dog and the cat."),  # exact dup
    (2, "The quick brown fox jumps over the lazy dog and the rat."),  # near dup
    (3, "Der Hund und die Katze spielen in der Sonne und der Wiese."),
    (4, "completely unrelated text about spark engines and shuffles."),
    (5, ""),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id LONG, text STRING")


def test_token_count_and_bpe(spark, docs):
    out = {r["doc_id"]: r for r in docs.select(
        "doc_id", token_count(F.col("text")).alias("toks"),
        bpe_token_estimate(F.col("text")).alias("bpe")).collect()}
    assert out[0]["toks"] == 12
    assert out[5]["toks"] == 0
    assert out[0]["bpe"] >= out[0]["toks"]  # subword units + punctuation


def test_quality_and_lang(spark, docs):
    rows = {r["doc_id"]: r for r in docs.select(
        "doc_id", quality_score(F.col("text")).alias("q"),
        lang_id(F.col("text")).alias("lang")).collect()}
    assert rows[0]["q"] == 1.0
    assert rows[5]["q"] <= 0.4
    assert rows[0]["lang"] == "en"
    assert rows[3]["lang"] == "de"
    assert rows[5]["lang"] == "unknown"


def test_exact_dedup(spark, docs):
    out = exact_dedup(docs).collect()
    by_n = {r["keep_id"]: r["n_dupes"] for r in out}
    assert by_n[0] == 2          # docs 0 and 1 collapse
    assert 1 not in by_n         # doc 1 is the duplicate
    assert sum(by_n.values()) == 6


def test_fingerprint_normalizes_whitespace(spark):
    df = spark.createDataFrame(
        [(0, "a  b\tc"), (1, " A b C ")], "doc_id LONG, text STRING"
    )
    fps = [r[0] for r in df.select(fingerprint(F.col("text"))).collect()]
    assert fps[0] == fps[1]


def test_minhash_lsh_finds_near_dup(spark, docs):
    sh = shingles(docs.filter("text != ''"))
    sigs = minhash_signatures(sh, k=8)
    cand = lsh_candidate_pairs(sigs, k=8, bands=4)
    pairs = {(r["id_a"], r["id_b"]) for r in cand.collect()}
    assert (0, 1) in pairs       # exact dup always a candidate
    assert (0, 2) in pairs       # near dup: shares most shingles
    verified = jaccard_pairs(sh, cand, threshold=0.5)
    v = {(r["id_a"], r["id_b"]): r["jaccard"] for r in verified.collect()}
    assert v[(0, 1)] == 1.0
    assert 0.5 < v[(0, 2)] < 1.0
    assert (0, 4) not in v


def test_jaccard_all_pairs(spark, docs):
    sh = shingles(docs.filter("doc_id in (0,1,4)"))
    out = {(r["id_a"], r["id_b"]): r["jaccard"] for r in jaccard_pairs(sh).collect()}
    assert out[(0, 1)] == 1.0
    assert out[(0, 4)] < 0.2


def test_simhash_near_dups(spark, docs):
    # note: SimHash on ~12-token docs is noisy — a single-word change lands
    # at a small but hash-dependent Hamming distance, so the bound must be
    # generous and the pigeonhole blocking widens accordingly
    # (n_blocks = bound + 1)
    sigs = simhash64(docs.filter("text != ''"))
    assert sigs.count() == 5
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in simhash_near_dups(sigs, max_hamming=12).collect()}
    assert pairs.get((0, 1)) == 0          # identical text → identical simhash
    assert 0 < pairs.get((0, 2)) <= 12     # one word changed → small hamming
    assert (0, 4) not in pairs


def test_simhash_blocking_guarantee(spark):
    """Any pair within the bound MUST be found (pigeonhole completeness):
    craft signatures at known distances and check recall is exact."""
    rows = [(0, 0), (1, 0b111), (2, (1 << 40) | (1 << 20) | 1), (3, -1)]
    sigs = spark.createDataFrame(rows, "id LONG, simhash LONG")
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in simhash_near_dups(sigs, max_hamming=3).collect()}
    assert got == {(0, 1): 3, (0, 2): 3}


@pytest.fixture(scope="module")
def vectors(spark):
    # deterministic unit-ish vectors in 8d: cluster A around e0, cluster B around e1
    rows = []
    for i in range(40):
        base = [0.0] * 8
        base[i % 2] = 1.0
        jitter = [((i * 37 + d * 11) % 19 - 9) / 100.0 for d in range(8)]
        rows.append((i, [float(b + j) for b, j in zip(base, jitter)], i % 2))
    return spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>, label INT")


def test_topk_cosine_exact(spark, vectors):
    queries = vectors.filter("vec_id < 2").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = topk_cosine(vectors, queries, k=5)
    assert out.count() == 10
    for qid in (0, 1):
        got = [r for r in out.collect() if r["query_id"] == qid]
        top1 = min(got, key=lambda r: r["rank"])
        assert top1["vec_id"] == qid and top1["sim"] > 0.999
        # all top-5 from the same parity cluster
        assert all(r["vec_id"] % 2 == qid % 2 for r in got)


def test_lsh_bucket_topk_recall(spark, vectors):
    queries = vectors.filter("vec_id < 4").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = topk_cosine(vectors, queries, k=5)
    approx = lsh_bucket_topk(vectors, queries, dim=8, k=5, n_planes=4)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.6, f"LSH recall too low: {recall}"


def test_embedding_near_dups(spark, vectors):
    dups = embedding_near_dups(vectors, dim=8, threshold=0.95, n_planes=4)
    rows = dups.collect()
    assert len(rows) > 0
    assert all(r["sim"] >= 0.95 for r in rows)
    # near-dup pairs stay within a parity cluster
    assert all(r["id_a"] % 2 == r["id_b"] % 2 for r in rows)


def test_winnowing_shared_substring_guarantee(spark):
    """Winnowing guarantee: any shared substring of length >= k + window - 1
    (= 8 at k=5, w=4) produces at least one shared fingerprint; disjoint
    texts share none."""
    from tiflow_spark.functions.dedup import winnowing_fingerprints

    shared = "a quick brown fox jumped over the lazy dog near the river bank"
    docs = spark.createDataFrame(
        [
            (0, "PREFIX0 " + shared + " SUFFIX0"),
            (1, "totally different beginning " + shared),
            (2, "zzz qqq xxx vvv unrelated words entirely kkk"),
        ],
        "doc_id LONG, text STRING",
    )
    fps = winnowing_fingerprints(docs, k=5, window=4)
    sets = {i: set() for i in range(3)}
    for r in fps.collect():
        sets[r["id"]].add(r["fp"])
    assert sets[0] & sets[1], "shared substring must yield a shared fingerprint"
    assert not (sets[0] & sets[2])
