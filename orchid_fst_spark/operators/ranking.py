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
from ..util.storage import maybe_persist as _maybe_persist


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


def lm_doc_logprob(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    alpha: float = 0.5,
    storage: str | None = "MEMORY_AND_DISK",
) -> DataFrame:
    """Bigram language-model quality score per document — the CCNet /
    Wikipedia-LM filtering signal (public practice: score each page
    under a corpus LM and band by perplexity; here the LM is trained on
    the corpus itself in the same pass).

    Returns ``(id, n_bigrams, avg_logprob)`` where ``avg_logprob`` is
    the mean over the document's bigram occurrences of
    ``ln((C(w1,w2) + alpha) / (Cctx(w1) + alpha * V))`` — add-alpha
    smoothed conditional probability with ``C`` corpus bigram counts,
    ``Cctx(w1)`` the context count (total bigrams starting at ``w1``)
    and ``V`` the distinct-successor vocabulary size.  Higher (closer
    to 0) = more typical text; repeated boilerplate scores high,
    gibberish low.  Docs with < 2 tokens report 0 bigrams and 0.0.
    Rounded to 6 dp (integer counts until the final ln/divide — the
    engine-wide float discipline, same as tf_idf/bm25).

    Scale notes: bigrams via the zip_with-over-slices idiom (the token
    array never appears inside a lambda body — the recorded
    CollapseProject trap); one (doc, bigram) hash aggregate, one
    corpus-level (w1, w2) aggregate, a (w1) context aggregate derived
    from it, then two key-shuffled equi-joins back onto the per-doc
    rows and one per-doc aggregate — every stage map-side-combining,
    nothing quadratic, no windows.  V and nothing else is a single-row
    broadcast.  The corpus LM frames are reusable artifacts: persist
    them bucketed (sources/bucketed.py) to score later crawls with no
    recompute and no Exchange on the probability side.
    """
    toks = tokens(F.lower(F.col(text_col)))
    m = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, m),
        F.slice(toks, 2, m),
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
    )
    base = docs.select(F.col(id_col).alias("id"), bigrams.alias("_b"))
    # doc_bg feeds FOUR consumers (corpus counts, ctx counts, the join
    # left side, and the per-doc totals) — without persisting it each
    # one re-scans and re-tokenizes the corpus (measured: 5 parquet
    # scans, 0 ReusedExchange).  It is the compact (id, w1, w2, c)
    # frame, far smaller than the text it came from.
    doc_bg = _maybe_persist(
        base.select("id", F.explode("_b").alias("r"))
        .select("id", "r.w1", "r.w2")
        .groupBy("id", "w1", "w2")
        .agg(F.count("*").alias("c")),
        storage,
    )
    corpus = doc_bg.groupBy("w1", "w2").agg(F.sum("c").cast("long").alias("c2"))
    ctx = corpus.groupBy("w1").agg(F.sum("c2").cast("long").alias("c1"))
    vocab = corpus.agg(
        F.count_distinct("w2").cast("long").alias("v")
    )
    logp = F.log(
        (F.col("c2") + F.lit(float(alpha)))
        / (F.col("c1") + F.lit(float(alpha)) * F.col("v"))
    )
    scored = (
        doc_bg.join(corpus, ["w1", "w2"])
        .join(ctx, ["w1"])
        .crossJoin(F.broadcast(vocab))
        .groupBy("id")
        .agg(
            F.sum("c").cast("long").alias("n_bigrams"),
            F.round(F.sum(F.col("c") * logp) / F.sum("c"), 6).alias("avg_logprob"),
        )
    )
    return (
        base.select("id")
        .join(scored, "id", "left")
        .select(
            "id",
            F.coalesce("n_bigrams", F.lit(0).cast("long")).alias("n_bigrams"),
            F.coalesce("avg_logprob", F.lit(0.0)).alias("avg_logprob"),
        )
    )


def collocations(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    min_count: int = 2,
    top_n: int = 100,
    round_dp: int = 6,
) -> DataFrame:
    """Collocation (phrase) mining by pointwise mutual information
    (Church & Hanks, CL'90) — the phrase-discovery statistic used to
    decide which adjacent token pairs deserve a vocabulary entry when
    preparing tokenizer/LM training data.

    For adjacent token pair (a, b):

        pmi = ln( (c_ab / B) / ((c_a / T) * (c_b / T)) )

    with ``c_ab`` the corpus bigram count, ``c_a``/``c_b`` unigram
    occurrence counts, ``B``/``T`` the total bigram/token counts — all
    EXACT integers aggregated before the one ln, which is computed on
    an identically-shaped double expression in both engines and
    rounded to ``round_dp``.  Returns the global top-``top_n`` pairs
    with ``c_ab >= min_count`` as ``(term_a, term_b, n_ab, n_a, n_b,
    pmi)`` under the total order (pmi DESC, term_a, term_b) — ranked
    on the ROUNDED pmi so the emitted set is engine-independent.

    Scale notes: bigrams come from the zip_with-over-slices idiom (the
    token array is never referenced inside a lambda body); unigram and
    bigram counts are hash aggregates with map-side partial combine;
    the unigram join-backs are plain term-keyed equi-joins (the
    unigram table is vocabulary-sized, NOT corpus-sized, but can
    exceed broadcast limits — so it shuffles); the two corpus totals
    are a broadcast one-row frame and the final cut executes as
    TakeOrderedAndProject (per-partition top-N, no global sort)."""
    toks = tokens(F.lower(F.col(text_col)))
    d = docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
    uni = (
        d.select(F.explode("toks").alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n"))
    )
    m = F.greatest(F.size("toks") - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice("toks", 1, m),
        F.slice("toks", 2, m),
        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
    )
    bi_all = (
        d.select(F.explode(pairs).alias("p"))
        .select(F.col("p.a").alias("term_a"), F.col("p.b").alias("term_b"))
        .groupBy("term_a", "term_b")
        .agg(F.count("*").alias("n_ab"))
    )
    # B counts ALL bigrams (the probability denominator), not just the
    # ones surviving min_count
    bi = bi_all.filter(F.col("n_ab") >= int(min_count))
    totals = F.broadcast(
        uni.agg(F.sum("n").cast("double").alias("tt")).crossJoin(
            bi_all.agg(F.sum("n_ab").cast("double").alias("bt"))
        )
    )
    pmi = F.log(
        F.col("n_ab").cast("double")
        * F.col("tt")
        * F.col("tt")
        / (F.col("bt") * F.col("n_a").cast("double") * F.col("n_b").cast("double"))
    )
    scored = (
        bi.join(uni.select(F.col("term").alias("term_a"), F.col("n").alias("n_a")), "term_a")
        .join(uni.select(F.col("term").alias("term_b"), F.col("n").alias("n_b")), "term_b")
        .crossJoin(totals)
        .select(
            "term_a",
            "term_b",
            F.col("n_ab").cast("long").alias("n_ab"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.round(pmi, round_dp).alias("pmi"),
        )
    )
    return (
        scored.orderBy(F.desc("pmi"), F.asc("term_a"), F.asc("term_b"))
        .limit(int(top_n))
    )


def reciprocal_rank_fusion(
    ranked: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    round_dp: int = 6,
    top_n: int | None = None,
) -> DataFrame:
    """Reciprocal rank fusion (Cormack, Clarke & Büttcher, SIGIR'09) —
    the standard score-free combiner for hybrid retrieval (BM25 +
    embedding ANN + any other ranker):

        rrf(d) = sum over systems s ranking d of 1 / (k + rank_s(d))

    Each input frame carries ``(id_col, rank_col)`` with rank 1-based
    within that system (absent documents simply contribute nothing —
    no outer-join NULL handling needed).  Returns ``(id, rrf,
    n_systems)``, optionally cut to the global ``top_n`` under the
    total order (rrf DESC, id) — ranked on the ROUNDED score, because
    the per-system 1/(k+rank) terms sum in nondeterministic order and
    the published 6-dp recipe absorbs the ulp noise in both engines.

    Scale notes: union-tag + ONE hash aggregate with map-side partial
    combine (inputs are per-system top-k lists, bounded by
    systems × k rows, never corpus-sized); the optional cut is
    TakeOrderedAndProject.  No joins at all — the aggregate IS the
    fusion."""
    if not ranked:
        raise ValueError("need at least one ranked input")
    if k < 0:
        raise ValueError("need k >= 0")
    tagged = [
        df.select(
            F.col(id_col).alias("id"),
            F.col(rank_col).cast("long").alias("r"),
        )
        for df in ranked
    ]
    u = tagged[0]
    for t in tagged[1:]:
        u = u.unionAll(t)
    out = u.groupBy("id").agg(
        F.round(
            F.sum(F.lit(1.0) / (F.lit(float(k)) + F.col("r"))), round_dp
        ).alias("rrf"),
        F.count("*").cast("long").alias("n_systems"),
    )
    if top_n is None:
        return out
    return out.orderBy(F.desc("rrf"), F.asc("id")).limit(int(top_n))


def hashed_classifier_score(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n_features: int = 16384,
    seed: str = "cls1",
    weights: DataFrame | None = None,
    round_dp: int = 6,
) -> DataFrame:
    """Model-based quality scoring with the feature-hashing trick
    (Weinberger et al., ICML'09) — the scoring half of the
    fastText/logistic-regression quality classifiers used to filter
    web corpora (the GPT-3-style "looks like the reference corpus"
    filter): each token hashes into one of ``n_features`` buckets, the
    document score is the mean bucket weight squashed through a
    logistic, and training happens elsewhere.

    Returns one row per input document: ``(id, n_tokens, score)`` with
    ``score = sigmoid(sum_t w[h(t)] / n_tokens)`` rounded to
    ``round_dp`` decimals; an empty document scores sigmoid(0) = 0.5.

    ``weights=None`` (default) uses deterministic md5-derived
    placeholder weights ``w[j] = (hash32(seed|j) - 2^31) / 2^32`` —
    the documented seam for a trained model, chosen so the whole
    operator is engine-reproducible: the per-document accumulation is
    an EXACT integer sum (each token contributes
    ``hash32(seed|feature) - 2^31``), divided once by
    ``n_tokens * 2^32`` at the end, so float noise cannot depend on
    token order or partitioning.  This path is a pure map-side
    projection: tokenize -> sequential ``F.aggregate`` fold over the
    token array (the array is an argument of the fold, never
    referenced inside another lambda — the CollapseProject re-inline
    trap cannot fire) — ZERO exchanges, so scoring a 100 TB corpus is
    embarrassingly parallel with output exactly one row per input row.

    Passing a trained ``weights`` frame ``(feature long, weight
    double)`` switches to explode -> broadcast weight join (the table
    is bounded by ``n_features``, never corpus-sized) -> one (doc)
    hash aggregate; missing features weigh 0.  That path shuffles the
    (doc, weight-sum) pairs once and is float-sum-order dependent, so
    it is not oracle-checked (trained weights aren't reproducible in
    SQL anyway)."""
    if n_features <= 0:
        raise ValueError("need n_features > 0")
    base = docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))
    toks = tokens(F.lower(F.col("t")))

    def _hash32(c) -> F.Column:
        return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")

    def _feat(tok) -> F.Column:
        return _hash32(tok) % F.lit(int(n_features))

    # NULL text => size() is NULL: coalesce to 0 so a NULL-text row
    # keeps the one-row-per-doc contract with n_tokens 0 / score 0.5
    # (identical to the trained-weights path and the DuckDB oracle)
    n = F.coalesce(F.size(toks), F.lit(0))
    if weights is None:
        w_int = lambda tok: _hash32(  # noqa: E731
            F.concat(F.lit(f"{seed}|"), _feat(tok).cast("string"))
        ) - F.lit(2147483648)
        acc = F.aggregate(
            toks, F.lit(0).cast("long"), lambda a, tok: a + w_int(tok)
        )
        s = F.when(n > 0, acc / (n.cast("double") * F.lit(4294967296.0))).otherwise(
            F.lit(0.0)
        )
        return base.select(
            "id",
            n.cast("long").alias("n_tokens"),
            F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-s)), round_dp).alias(
                "score"
            ),
        )
    exploded = base.select("id", F.explode(toks).alias("tok")).select(
        "id", _feat(F.col("tok")).alias("feature")
    )
    agg = (
        exploded.join(F.broadcast(weights), "feature", "left")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.coalesce("weight", F.lit(0.0))).alias("ws"),
        )
    )
    s = F.coalesce(F.col("ws") / F.col("n_tokens"), F.lit(0.0))
    return (
        base.select("id")
        .join(agg, "id", "left")
        .select(
            "id",
            F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
            F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-s)), round_dp).alias(
                "score"
            ),
        )
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
