"""Text analysis for large-scale training-data pipelines.

Not part of the reference (TiCDC replicates rows, it doesn't read them) —
these are the first-class operations a 100 TB document/transcript pipeline
runs between ingest and training: token counting, quality scoring,
language ID, fingerprinting. All pure `pyspark.sql.functions` column
expressions — JVM-side, whole-stage-codegen'd, zero Python in the hot path.

Each function returns Columns so they compose into one projection over the
scan (single pass, column-pruned).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# language-ID marker words (surrounded by spaces so `replace`-count logic is
# portable to any SQL dialect, incl. the DuckDB oracle)
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " et ", " les "],
    "es": [" el ", " que ", " los "],
}


def _count_occurrences(col: Column, needle: str) -> Column:
    """Occurrences of `needle` via length arithmetic — dialect-portable."""
    return (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit("")))) / len(needle)


def token_count(text: Column) -> Column:
    """Whitespace token count (split-based; empty → 0)."""
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def bpe_token_estimate(text: Column) -> Column:
    """BPE-ish token estimate: word tokens + standalone punctuation, with
    long words contributing ceil(len/4) subword units (the ~4-chars/token
    heuristic of byte-pair vocabularies)."""
    words = F.split(F.trim(text), r"\s+")
    subwords = F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.ceil(F.length(w) / 4).cast("long"),
    )
    punct = F.length(F.regexp_replace(text, r"[^.,;:!?()\[\]{}]", ""))
    return (subwords + punct).alias("bpe_tokens")


def quality_features(text: Column) -> dict[str, Column]:
    """Heuristic quality signals (Gopher/C4-style filters), one scan."""
    n_chars = F.length(text)
    n_spaces = _count_occurrences(text, " ")
    n_words = token_count(text)
    n_punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    mean_word_len = F.when(n_words > 0, (n_chars - n_spaces) / n_words).otherwise(F.lit(0.0))
    stop_hits = sum(
        (_count_occurrences(F.lower(text), w) for w in LANG_MARKERS["en"]),
        start=F.lit(0).cast("double"),
    )
    return {
        "n_chars": n_chars,
        "n_words": n_words.cast("long"),
        "punct_ratio": F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0)),
        "mean_word_len": mean_word_len,
        "stopword_ratio": F.when(n_words > 0, stop_hits / n_words).otherwise(F.lit(0.0)),
    }


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality score: length in range, sane word length,
    some stopwords, not punctuation-soup."""
    f = quality_features(text)
    length_ok = (f["n_chars"] >= 20) & (f["n_chars"] <= 100_000)
    word_len_ok = (f["mean_word_len"] >= 2) & (f["mean_word_len"] <= 12)
    punct_ok = f["punct_ratio"] < 0.2
    has_stop = f["stopword_ratio"] > 0.0
    score = (
        length_ok.cast("double") * 0.3
        + word_len_ok.cast("double") * 0.3
        + punct_ok.cast("double") * 0.2
        + has_stop.cast("double") * 0.2
    )
    return score


def lang_id(text: Column) -> Column:
    """Marker-word language ID. Deterministic tie-break by language order
    (en > de > fr > es > unknown at equal scores, min threshold 1 hit)."""
    lowered = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    scores = {
        lang: sum(
            (_count_occurrences(lowered, m) for m in markers),
            start=F.lit(0).cast("double"),
        )
        for lang, markers in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    best = F.greatest(*[scores[lang] for lang in langs])
    expr = F.lit("unknown")
    for lang in reversed(langs):  # earlier langs win ties → apply last
        expr = F.when((scores[lang] >= 1) & (scores[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized, lowercased text.
    (The rolling-hash variant for shingles lives in dedup.py.)"""
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "))
