"""End-to-end corpus quality gate — the one-call filtering pass a
training-data run executes before tokenization.

Composes the engine's row-local quality signals into per-document keep
flags with observable reasons (the published recipe family: Gopher
rules for repetition, GPT-3/PaLM-appendix n-gram decontamination,
CCNet LM-perplexity banding, plus exact-duplicate collapse):

  - ``flag_short`` / ``flag_long``   — token-count bounds
  - ``flag_repetitive``              — duplicate-token fraction above a cap
  - ``flag_contaminated``            — shares an n-gram with the benchmark
  - ``flag_lm_low``                  — LM avg logprob below the corpus
                                       ``lm_quantile`` (bottom-band gibberish)
  - ``flag_exact_dup``               — byte-identical text, not the min-id
                                       representative

``keep = 1`` iff no flag fires.  Every flag is its own column so the
dropped mass per reason is one aggregate away — the same observability
discipline as the blocking caps.

Scale notes: every signal is explode → hash-aggregate → join-back on
the 8-byte id (linear, map-side combining, no windows over the corpus
except the exact-dup min which is one hash aggregate); the LM threshold
is a single-row exact percentile broadcast (swap ``exact=False``-style
``approx_percentile`` semantics in at 100 TB by passing a precomputed
``lm_threshold``).  The benchmark gram set rides a broadcast LEFT join
(operators/decontam.py) — the corpus never shuffles on gram keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .decontam import contamination_stats
from .ranking import lm_doc_logprob
from .stats import repetition_stats


def quality_gate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 5,
    max_tokens: int = 100000,
    max_dup_token_frac: float = 0.9,
    ngram: int = 5,
    lm_quantile: float = 0.1,
    lm_threshold: float | None = None,
    storage: str | None = "MEMORY_AND_DISK",
) -> DataFrame:
    """One row per input document:
    ``(id, n_tokens, flag_short, flag_long, flag_repetitive,
    flag_contaminated, flag_lm_low, flag_exact_dup, keep)`` — all flags
    ``long`` 0/1, ``keep = 1`` iff every flag is 0.

    ``lm_threshold`` overrides the corpus-derived exact percentile (the
    100 TB path: compute the threshold once on a sample or a previous
    crawl and pass it, so the gate is a pure map over new data).
    Deterministic: the percentile is Spark's exact ``percentile``
    (linear interpolation == DuckDB ``quantile_cont``) over the rounded
    LM scores of docs that have bigrams.
    """
    base = docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))

    # repetition_stats' n_tokens (sum of per-token counts) == the token
    # count — reuse it instead of tokenizing the corpus a second time
    rep = repetition_stats(base, "id", "text").select(
        "id", "n_tokens", "dup_token_frac"
    )
    cont = contamination_stats(
        base, benchmark, id_col="id", text_col="text", n=ngram
    ).select("id", F.col("contaminated").cast("long").alias("flag_contaminated"))
    lm = lm_doc_logprob(base, "id", "text", storage=storage)

    if lm_threshold is None:
        thr = lm.filter(F.col("n_bigrams") > 0).agg(
            F.percentile("avg_logprob", F.lit(float(lm_quantile))).alias("_thr")
        )
        lm = lm.crossJoin(F.broadcast(thr))
    else:
        lm = lm.withColumn("_thr", F.lit(float(lm_threshold)))
    lm_flag = lm.select(
        "id",
        (
            (F.col("n_bigrams") > 0) & (F.col("avg_logprob") < F.col("_thr"))
        ).cast("long").alias("flag_lm_low"),
    )

    # exact-dup collapse: min id per byte-identical text keeps; NULL
    # text is its own singleton (same null discipline as near_dedup).
    # The group key is md5(text), so the dedup shuffle carries 32-byte
    # digests, never the documents themselves.
    key = F.coalesce(F.md5("text"), F.concat(F.lit("null:"), F.col("id")))
    keyed = base.select("id", key.alias("_k"))
    ex = keyed.groupBy("_k").agg(F.min("id").alias("_rep"))
    dup = keyed.join(ex, "_k").select(
        "id", (F.col("id") != F.col("_rep")).cast("long").alias("flag_exact_dup")
    )

    out = (
        rep.join(cont, "id")
        .join(lm_flag, "id")
        .join(dup, "id")
        .select(
            "id",
            "n_tokens",
            (F.col("n_tokens") < int(min_tokens)).cast("long").alias("flag_short"),
            (F.col("n_tokens") > int(max_tokens)).cast("long").alias("flag_long"),
            (F.col("dup_token_frac") > float(max_dup_token_frac))
            .cast("long")
            .alias("flag_repetitive"),
            "flag_contaminated",
            "flag_lm_low",
            "flag_exact_dup",
        )
    )
    keep = (
        (F.col("flag_short") == 0)
        & (F.col("flag_long") == 0)
        & (F.col("flag_repetitive") == 0)
        & (F.col("flag_contaminated") == 0)
        & (F.col("flag_lm_low") == 0)
        & (F.col("flag_exact_dup") == 0)
    ).cast("long")
    return out.withColumn("keep", keep)
