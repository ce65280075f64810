"""Corpus-assembly operators for large-scale training-data pipelines:
transcript assembly, mixture sampling, and sequence packing.

Not part of the reference (TiCDC replicates rows, it doesn't read them) —
these are the steps a pretraining pipeline runs AFTER the dedup/quality
chain (functions/text.py, functions/dedup.py) and, for transcripts, after
the CDC feed has replicated the turns (this graft's tier is cdc_ingest x
transcripts, so the feed's snapshot IS the corpus source):

- ``assemble_transcripts``: (conv_id, turn_idx, role, text[, tool]) rows →
  one ordered transcript string per conversation. The bridge from the
  CDC-replicated chat-turn table to a trainable document.
- ``mixture_sample``: deterministic per-stratum Bernoulli sampling
  (corpus mixture weighting — "keep 50% of English, 90% of German").
  Reproducible across engines and re-runs via the shared h60 hash
  (functions/xhash.py), so a resumed 100 TB job re-derives the identical
  sample with zero state.
- ``pack_sequences``: greedy token-budget packing of documents into
  training shards, striped so no global sort exists anywhere in the plan.

All three are pure `pyspark.sql.functions` plans — JVM-side, whole-stage
codegen, zero Python in the hot path.

100 TB design notes:
- ``mixture_sample`` is a single projection + filter: no shuffle, no
  state, pushdown-friendly (the filter sits directly over the scan).
- ``assemble_transcripts`` is one hash aggregation keyed by the
  conversation id — the same key the CDC table is bucketed by, so over a
  `CowTable.snapshot()` the shuffle moves each conversation once.
  `collect_list` is bounded by the longest single conversation (turns per
  conversation, NOT corpus size), the same per-key bound the LWW reduce
  already lives with.
- ``pack_sequences`` windows within (stripe) partitions, never globally:
  stripe count scales with the corpus so each sort is bounded, and the
  packing semantics are per-stripe by design (training shards need
  determinism and bounded size, not one global greedy order).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tiflow_spark.functions.xhash import h60

PPM = 1_000_000


def transcript_line(
    role: Column, text: Column, tool: Column | None = None
) -> Column:
    """One rendered transcript line: ``role: text`` with an optional
    ``[tool:T]`` suffix when the (schema-v2, nullable) tool column is
    populated — NULL-safe so v1-decoded rows render without it."""
    line = F.concat(role, F.lit(": "), text)
    if tool is not None:
        line = F.concat(
            line,
            F.when(tool.isNotNull(), F.concat(F.lit(" [tool:"), tool, F.lit("]")))
            .otherwise(F.lit("")),
        )
    return line


def assemble_transcripts(
    turns: DataFrame,
    key: str = "conv_id",
    order: str = "turn_idx",
    line: Column | None = None,
    sep: str = "\n",
    extra_aggs: dict[str, Column] | None = None,
) -> DataFrame:
    """Assemble per-conversation transcripts from turn rows.

    Emits one row per conversation: ``key, n_turns, transcript`` where the
    transcript is every rendered line joined by ``sep`` in ``order``. The
    ordering is done INSIDE the aggregation (collect struct(order, line) →
    array_sort → project → join): one hash-agg shuffle on the conversation
    key, no window, no secondary sort of the whole corpus. ``order`` must
    be unique per key (it is for a CDC snapshot, whose primary key is
    (conv_id, turn_idx)) so the sort is total and deterministic.
    ``extra_aggs`` adds caller aggregate columns (e.g. per-conversation
    tool-turn counts) to the SAME hash aggregation — one shuffle total.
    """
    if line is None:
        cols = dict.fromkeys(turns.columns)
        line = transcript_line(
            F.col("role"), F.col("text"),
            F.col("tool") if "tool" in cols else None,
        )
    pairs = F.collect_list(F.struct(F.col(order).alias("o"), line.alias("l")))
    return turns.groupBy(key).agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.array_join(
            F.transform(F.array_sort(pairs), lambda p: p["l"]), sep
        ).alias("transcript"),
        *[c.alias(n) for n, c in (extra_aggs or {}).items()],
    )


def mixture_sample(
    df: DataFrame,
    stratum: Column,
    rates: dict[str, float],
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """Deterministic stratified Bernoulli sampling for corpus mixture
    weighting: keep a row iff h60('mix:<seed>:<id>') % 1e6 < rate_ppm of
    its stratum. The hash is the cross-engine md5-derived h60
    (functions/xhash.py), so the sample is bit-reproducible in Spark,
    DuckDB, and plain Python — a resumed or re-sharded 100 TB job derives
    the identical subset with no sampling state to persist. Appends
    ``stratum`` and ``sample_key`` columns; pure projection + filter (no
    shuffle; Catalyst pushes the filter to the scan).

    ``rates`` maps stratum value → keep-rate in [0, 1]; unlisted strata
    use ``default_rate``.

    The rate table joins in as a BROADCAST dim (stratum, rate_ppm), not a
    CASE ladder: a ladder would inline the (possibly huge) stratum
    expression once per listed rate — with a marker-based language-ID
    stratum that blows past janino's 64 KB codegen method limit and drops
    the whole stage to interpreted mode. The broadcast join evaluates the
    stratum expression exactly once and is the idiomatic shape anyway
    (rates are a tiny dimension; at 1000 executors the broadcast is a few
    hundred bytes).
    """
    # validate rates and default_rate separately: merging them into one
    # dict would let a stratum literally named "default" shadow (or be
    # shadowed by) default_rate and escape the range check
    for name, rate in rates.items():
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate for {name!r} out of [0,1]: {rate}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate out of [0,1]: {default_rate}")
    key = h60(
        F.concat(F.lit(f"mix:{seed}:"), F.col(id_col).cast("string"))
    ) % PPM
    rates_df = df.sparkSession.createDataFrame(
        [(k, int(round(v * PPM))) for k, v in sorted(rates.items())],
        "stratum STRING, _rate_ppm LONG",
    )
    return (
        df.withColumn("stratum", stratum)
        .withColumn("sample_key", key.cast("long"))
        .join(F.broadcast(rates_df), "stratum", "left")
        .filter(
            F.col("sample_key")
            < F.coalesce("_rate_ppm", F.lit(int(round(default_rate * PPM))))
        )
        .drop("_rate_ppm")
    )


def pack_sequences(
    df: DataFrame,
    tokens: Column,
    budget: int,
    n_stripes: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy token-budget packing of documents into training shards.

    Documents are striped by ``id % n_stripes``; within each stripe, in
    ``id`` order, the running token total assigns each document to shard
    ``floor((running - tokens) / budget)`` — the shard that was still
    below budget when the document arrived (documents may straddle a
    boundary; the NEXT shard starts after the straddler, the standard
    greedy fill). Emits ``id, stripe, n_tokens, shard_idx``.

    Scale: the window partitions by stripe, never globally — no
    Exchange SinglePartition anywhere in the plan. n_stripes scales with
    the corpus (one stripe ≈ one output shard family), so each partition
    sort is bounded; per-stripe packing is the semantics real packers use
    (shards must be deterministic and bounded, not globally sequential).
    """
    if budget <= 0 or n_stripes <= 0:
        raise ValueError("budget and n_stripes must be positive")
    stripe = (F.col(id_col) % n_stripes).cast("int")
    w = (
        Window.partitionBy("stripe")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.select(
            id_col,
            stripe.alias("stripe"),
            tokens.cast("long").alias("n_tokens"),
        )
        .withColumn(
            "shard_idx",
            F.floor(
                (F.sum("n_tokens").over(w) - F.col("n_tokens")) / budget
            ).cast("long"),
        )
    )
