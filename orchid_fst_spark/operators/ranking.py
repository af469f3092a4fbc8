"""Lexical ranking operators for training-data pipelines: TF-IDF term
weights and BM25 keyword search over a document table.

Both are pure Catalyst (JVM codegen, no Python row path) and fully
oracle-checkable: every similarity number is derived from integer term
statistics (tf, df, dl as BIGINT; exact integer sums divided once), so
the only float ops are the final ln/divide, computed with the same IEEE
doubles in Spark and DuckDB and rounded to 6 decimals on both sides.

Scale notes (100 TB): both operators are explode -> hash-shuffle ->
aggregate, the same shape as the dedup family.  Corpus-level scalars
(N, avgdl) are single-row aggregates broadcast into the scoring
projection; the per-term document-frequency frame for BM25 is bounded
by the query vocabulary (|query_terms| rows) and is broadcast too, so
the only data-sized shuffles are the (doc, term) tf aggregation and —
for TF-IDF — the join against per-term df.  Stopword-like terms with
huge postings lists hit only aggregates (never a pair join), so there
is no O(df**2) blow-up anywhere in this family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.normalize import tokens


def _term_freq(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, term, tf) — one row per distinct (document, term) with
    the in-document occurrence count.  Tokenization = lowercased
    whitespace tokens (functions.normalize.tokens), matching the DuckDB
    oracle twin expression exactly."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )


def tf_idf_terms(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    min_df: int = 1,
) -> DataFrame:
    """Smoothed TF-IDF term weights: (doc_id, term, tf, df, tfidf) with
    ``tfidf = tf * (ln((N + 1) / (df + 1)) + 1)`` (the sklearn
    ``smooth_idf`` form — never negative, never divides by zero),
    rounded to 6 decimals so the Spark and DuckDB engines agree
    bit-for-bit on the emitted value.

    ``min_df`` drops hapax-style noise terms (df < min_df) AFTER the df
    computation, so the surviving weights are unchanged by the filter.

    Plan shape: one explode + (doc, term) hash aggregate for tf, one
    term-keyed aggregate for df, a term-keyed join of the two, and a
    broadcast of the single-row corpus count N — no pair joins, no
    driver collection, linear in total token count."""
    tf = _term_freq(docs, id_col, text_col)
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    if min_df > 1:
        df_ = df_.filter(F.col("df") >= min_df)
    n_docs = docs.select(F.count("*").alias("n_docs"))
    idf = F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))) + F.lit(
        1.0
    )
    return (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            F.round(F.col("tf") * idf, 6).alias("tfidf"),
        )
    )


def vocab_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 100,
    ngram: int = 1,
) -> DataFrame:
    """Corpus vocabulary builder: the global top-``n`` terms by total
    occurrence count, as ``(term, tf, df)`` — ``tf`` the corpus-wide
    occurrence count and ``df`` the number of documents containing the
    term.  ``ngram=2`` counts space-joined token bigrams instead (the
    n-gram LM / tokenizer-training statistic).

    Determinism: ranked by ``(tf DESC, term ASC)`` — a total order, so
    the emitted top-``n`` set is engine-independent.

    Scale notes: explode -> (doc, term) hash aggregate -> term aggregate
    (both with map-side partial combine), then the global cut executes
    as TakeOrderedAndProject (per-partition top-``n`` + single merge on
    the driver of ``partitions * n`` rows) — no full sort, no global
    window, linear in total token count.  Bigrams come from
    ``zip_with(slice(toks, 1, len-1), slice(toks, 2, len-1), concat)``:
    the token array appears only as a plain argument of slice/zip_with,
    never INSIDE a lambda body, so Catalyst's CollapseProject re-inline
    (the recorded O(n²)-per-doc HOF trap) cannot multiply the split."""
    if ngram not in (1, 2):
        raise ValueError("vocab_topk supports ngram in (1, 2)")
    toks = tokens(F.lower(F.col(text_col)))
    if ngram == 1:
        terms = toks
    else:
        m = F.greatest(F.size(toks) - 1, F.lit(0))
        terms = F.zip_with(
            F.slice(toks, 1, m),
            F.slice(toks, 2, m),
            lambda x, y: F.concat(x, F.lit(" "), y),
        )
    t = docs.select(F.col(id_col).alias("doc_id"), F.explode(terms).alias("term"))
    per_doc = t.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    agg = per_doc.groupBy("term").agg(
        F.sum("tf").cast("long").alias("tf"), F.count("*").cast("long").alias("df")
    )
    return (
        agg.orderBy(F.desc("tf"), F.asc("term"))
        .limit(int(n))
        .select("term", "tf", "df")
    )


def bm25_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    topk: int | None = None,
) -> DataFrame:
    """BM25 keyword search: score every document containing at least one
    of ``query_terms`` and return (doc_id, score), optionally cut to the
    global top-``topk`` (ties broken by doc_id, ranked on the ROUNDED
    score so both engines rank identically).

    score(d) = sum over query terms t present in d of
      ``idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))``
    with the classic Robertson/Sparck-Jones ``idf(t) =
    ln(1 + (N - df + 0.5) / (df + 0.5))``.  ``dl`` is the document's
    whitespace-token count and ``avgdl`` the exact corpus mean computed
    as one integer token-count sum divided once (identical double in any
    engine, unlike a float running average).

    Plan shape: the token explode is filtered to the query vocabulary
    BEFORE the tf aggregate (predicate on the generated column, so the
    shuffle carries only query-term hits); df is a |query_terms|-row
    broadcast; N/avgdl a single-row broadcast.  The scoring projection
    is whole-stage-codegen arithmetic over the tf rows."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    # document tokens are lowercased below, so match the query side —
    # otherwise a capitalized query term silently matches nothing
    query_terms = [t.lower() for t in query_terms]
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        tokens(F.lower(F.col(text_col))).alias("toks"),
    ).withColumn("dl", F.size("toks").cast("long"))
    stats = d.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    hits = (
        d.select("doc_id", "dl", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(list(query_terms)))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_ = hits.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    part = (
        idf
        * (F.col("tf") * (F.lit(k1) + 1.0))
        / (
            F.col("tf")
            + F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
    )
    scored = (
        hits.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("part", part)
        .groupBy("doc_id")
        .agg(F.round(F.sum("part"), 6).alias("score"))
    )
    if topk is None:
        return scored
    return (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(int(topk))
        .select("doc_id", "score")
    )


def group_topk(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list,
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-``k`` rows per group under an explicit total order — the
    per-group twin of ``vocab_topk``'s global TakeOrderedAndProject
    (e.g. top documents per domain by quality).

    ``order_cols`` must define a TOTAL order (add a unique id as the
    final tiebreak) or the emitted set is nondeterministic; the rank is
    ``row_number`` (dense, no gaps), returned as ``rank_col``.

    Scale notes: ONE hash shuffle on the group key.  Spark plans the
    ``row_number <= k`` filter as WindowGroupLimit (partial mode runs
    BEFORE the exchange), so each map partition forwards at most ``k``
    rows per group instead of the whole group — a planted-skew group
    costs k rows of shuffle, not its full size.  Asserted in
    tests/test_ranking.py.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= int(k))
    )
