"""Lexical ranking (TF-IDF / BM25) and span-dedup semantics against
driver-side pure-Python oracles — covers the API surface the entry
contract's DuckDB twins don't (min_df, topk, df_cap > 1, token-less
documents)."""

import math

import pytest

from orchid_fst_spark.operators.dedup import span_dedup, span_hashes
from orchid_fst_spark.operators.ranking import bm25_scores, tf_idf_terms

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the mat"),
    (2, "spark window hash spark"),
    (3, ""),  # token-less: must survive span_dedup with empty output
    (4, "the cat sat on the mat"),  # exact dup of 0
]


@pytest.fixture(scope="module")
def rdocs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def _toks(t):
    return [w for w in t.lower().split() if w]


def test_tf_idf_matches_python_oracle(spark, rdocs):
    got = {
        (r.doc_id, r.term): (r.tf, r.df, r.tfidf)
        for r in tf_idf_terms(rdocs, "doc_id", "text").collect()
    }
    n = len(DOCS)
    tf = {}
    for i, t in DOCS:
        for w in _toks(t):
            tf[(i, w)] = tf.get((i, w), 0) + 1
    df = {}
    for (_, w) in tf:
        df[w] = df.get(w, 0) + 1
    assert set(got) == set(tf)
    for (i, w), (gtf, gdf, gtfidf) in got.items():
        assert gtf == tf[(i, w)]
        assert gdf == df[w]
        exp = round(tf[(i, w)] * (math.log((n + 1) / (df[w] + 1)) + 1), 6)
        assert abs(gtfidf - exp) < 1e-9, (i, w)


def test_tf_idf_min_df_filters_terms_not_weights(spark, rdocs):
    base = {
        (r.doc_id, r.term): r.tfidf
        for r in tf_idf_terms(rdocs, "doc_id", "text").collect()
    }
    filt = {
        (r.doc_id, r.term): r.tfidf
        for r in tf_idf_terms(rdocs, "doc_id", "text", min_df=3).collect()
    }
    assert filt  # 'the' etc. appear in >= 3 docs
    for k, v in filt.items():
        assert base[k] == v  # weights unchanged by the filter
    assert all(k in base for k in filt)
    # exactly the terms with document frequency < 3 are dropped
    df = {}
    for i, t in DOCS:
        for w in set(_toks(t)):
            df[w] = df.get(w, 0) + 1
    dropped_terms = {t for _, t in set(base) - set(filt)}
    kept_terms = {t for _, t in filt}
    assert dropped_terms == {t for t, n in df.items() if n < 3}
    assert kept_terms == {t for t, n in df.items() if n >= 3}


def _bm25_oracle(query, k1=1.2, b=0.75):
    toks = {i: _toks(t) for i, t in DOCS}
    n = len(DOCS)
    dls = {i: len(ts) for i, ts in toks.items()}
    avgdl = sum(dls.values()) / n
    df = {
        t: sum(1 for ts in toks.values() if t in ts) for t in query
    }
    scores = {}
    for i, ts in toks.items():
        s = 0.0
        for t in query:
            f = ts.count(t)
            if not f or not df[t]:
                continue
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * f * (k1 + 1) / (f + k1 * (1 - b + b * dls[i] / avgdl))
        if s:
            scores[i] = round(s, 6)
    return scores


def test_bm25_scores_and_topk(spark, rdocs):
    query = ["spark", "cat", "mat"]
    exp = _bm25_oracle(query)
    got = {
        r.doc_id: r.score
        for r in bm25_scores(rdocs, "doc_id", "text", query).collect()
    }
    assert set(got) == set(exp)
    for i in exp:
        assert abs(got[i] - exp[i]) < 1e-9, i
    top = bm25_scores(rdocs, "doc_id", "text", query, topk=2).collect()
    order = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    assert [(r.doc_id, r.score) for r in
            sorted(top, key=lambda r: (-r.score, r.doc_id))] == order


def test_bm25_empty_query_raises(spark, rdocs):
    with pytest.raises(ValueError):
        bm25_scores(rdocs, "doc_id", "text", [])


def test_span_hashes_window_layout(spark, rdocs):
    rows = {
        (r.doc_id, r.span_id): r.span
        for r in span_hashes(rdocs, "doc_id", "text", span_tokens=4).collect()
    }
    # doc 0 has 6 tokens -> spans [0..3], [4..5]
    assert rows[(0, 0)] == "the cat sat on"
    assert rows[(0, 1)] == "the mat"
    assert (3, 0) not in rows  # empty doc emits no spans


def test_span_dedup_df_cap_and_empty_docs(spark, rdocs):
    # w=4, df_cap=1: docs 0 and 4 are byte-identical, so both their
    # spans have corpus df=2 and are removed; doc 1's first span
    # differs ("the dog sat on") but its tail span "the mat" is shared
    # with docs 0/4 (df=3) and is struck too — exactly the boilerplate
    # semantics (a unique page losing its repeated footer)
    out = {
        r.doc_id: (r.n_spans, r.n_removed, r.clean_text)
        for r in span_dedup(rdocs, "doc_id", "text",
                            span_tokens=4, df_cap=1).collect()
    }
    assert set(out) == {0, 1, 2, 3, 4}
    assert out[0] == (2, 2, "")
    assert out[4] == (2, 2, "")
    assert out[1] == (2, 1, "the dog sat on")
    assert out[2] == (1, 0, "spark window hash spark")
    assert out[3] == (0, 0, "")
    # df_cap=2 tolerates one duplicate: only the df=3 footer span
    # ("the mat", shared by docs 0, 1 and 4) is still removed
    out2 = {
        r.doc_id: r.n_removed
        for r in span_dedup(rdocs, "doc_id", "text",
                            span_tokens=4, df_cap=2).collect()
    }
    assert out2 == {0: 1, 1: 1, 2: 0, 3: 0, 4: 1}


def test_vocab_topk_unigram(spark, rdocs):
    from orchid_fst_spark.operators.ranking import vocab_topk

    rows = vocab_topk(rdocs, "doc_id", "text", n=3).collect()
    # corpus tf: the=6 (2 each in docs 0/1/4), mat=3, on=3, sat=3,
    # cat=2 ... top-3 by (tf DESC, term ASC) = the(6), mat(3), on(3)
    assert [(r.term, r.tf, r.df) for r in rows] == [
        ("the", 6, 3),
        ("mat", 3, 3),
        ("on", 3, 3),
    ]


def test_vocab_topk_bigrams(spark, rdocs):
    from orchid_fst_spark.operators.ranking import vocab_topk

    rows = vocab_topk(rdocs, "doc_id", "text", n=100, ngram=2).collect()
    got = {r.term: (r.tf, r.df) for r in rows}
    # python oracle over the same docs
    tf, df = {}, {}
    for i, t in DOCS:
        ws = _toks(t)
        grams = [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        for g in grams:
            tf[g] = tf.get(g, 0) + 1
        for g in set(grams):
            df[g] = df.get(g, 0) + 1
    assert got == {g: (tf[g], df[g]) for g in tf}
    # empty + single-token docs emit no bigrams and must not error
    one = spark.createDataFrame([(0, "solo"), (1, "")], "doc_id long, text string")
    assert vocab_topk(one, "doc_id", "text", ngram=2).count() == 0


def test_vocab_topk_rejects_bad_ngram(spark, rdocs):
    from orchid_fst_spark.operators.ranking import vocab_topk

    with pytest.raises(ValueError):
        vocab_topk(rdocs, "doc_id", "text", ngram=3)


def test_group_topk_total_order_and_partial_limit(spark):
    import pyspark.sql.functions as F

    from orchid_fst_spark.operators.ranking import group_topk

    # planted skew: group "hot" has 5,000 rows, "cold" has 2
    rows = [(i, "hot", i % 97) for i in range(5000)] + [
        (9001, "cold", 1), (9002, "cold", 2)]
    df = spark.createDataFrame(rows, "id long, g string, score long")
    out = group_topk(df, ["g"], [F.desc("score"), F.asc("id")], 3)
    got = sorted((r["g"], r["rank"], r["id"]) for r in out.collect())
    # hot: score 96 at ids 96, 193, 290 (ascending tiebreak)
    assert got == [
        ("cold", 1, 9002), ("cold", 2, 9001),
        ("hot", 1, 96), ("hot", 2, 193), ("hot", 3, 290),
    ]
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the row_number<=k filter must push a PARTIAL WindowGroupLimit
    # below the exchange: a skewed group ships k rows per map
    # partition, never its full size
    assert "WindowGroupLimit" in plan and "Partial" in plan


def _py_classifier(text, n_features=16384, seed="cls1"):
    import hashlib

    toks = _toks(text)
    acc = 0
    for t in toks:
        h = int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
        feat = h % n_features
        w = int(
            hashlib.md5(f"{seed}|{feat}".encode()).hexdigest()[:8], 16
        ) - 2**31
        acc += w
    s = acc / (len(toks) * 2**32) if toks else 0.0
    return len(toks), round(1.0 / (1.0 + math.exp(-s)), 6)


def test_hashed_classifier_score_matches_python(spark, rdocs):
    from orchid_fst_spark.operators.ranking import hashed_classifier_score

    got = {
        r.id: (r.n_tokens, r.score)
        for r in hashed_classifier_score(rdocs, "doc_id", "text").collect()
    }
    assert len(got) == len(DOCS)  # one row per input, empties included
    for doc_id, text in DOCS:
        n, score = _py_classifier(text)
        assert got[doc_id][0] == n, doc_id
        assert got[doc_id][1] == pytest.approx(score, abs=1e-6), doc_id
    # token-less doc scores exactly sigmoid(0)
    assert got[3] == (0, 0.5)
    # exact-dup docs score identically (content-determined)
    assert got[0] == got[4]


def test_hashed_classifier_score_partitioning_independent(spark, rdocs):
    from orchid_fst_spark.operators.ranking import hashed_classifier_score

    a = sorted(
        map(tuple, hashed_classifier_score(rdocs, "doc_id", "text").collect())
    )
    b = sorted(
        map(
            tuple,
            hashed_classifier_score(
                rdocs.repartition(7), "doc_id", "text"
            ).collect(),
        )
    )
    assert a == b


def test_hashed_classifier_score_trained_weights_path(spark, rdocs):
    import hashlib

    from orchid_fst_spark.operators.ranking import hashed_classifier_score

    # a trained-model stand-in: +10 on the feature "spark" hashes to,
    # 0 elsewhere -> doc 2 (two "spark" tokens of four) scores
    # sigmoid(20/4), all docs without the token score 0.5
    feat = int(hashlib.md5(b"spark").hexdigest()[:8], 16) % 16384
    w = spark.createDataFrame([(feat, 10.0)], "feature long, weight double")
    got = {
        r.id: r.score
        for r in hashed_classifier_score(
            rdocs, "doc_id", "text", weights=w
        ).collect()
    }
    assert got[2] == pytest.approx(
        round(1 / (1 + math.exp(-20.0 / 4)), 6), abs=1e-6
    )
    assert got[0] == got[1] == got[3] == 0.5


def test_hashed_classifier_score_rejects_bad_n_features(spark, rdocs):
    from orchid_fst_spark.operators.ranking import hashed_classifier_score

    with pytest.raises(ValueError):
        hashed_classifier_score(rdocs, "doc_id", "text", n_features=0)


def test_collocations_matches_python(spark, rdocs):
    from collections import Counter

    from orchid_fst_spark.operators.ranking import collocations

    got = [
        (r.term_a, r.term_b, r.n_ab, r.n_a, r.n_b, r.pmi)
        for r in collocations(
            rdocs, "doc_id", "text", min_count=2, top_n=5
        ).collect()
    ]
    uni, bi = Counter(), Counter()
    for _, text in DOCS:
        ts = _toks(text)
        uni.update(ts)
        bi.update(zip(ts, ts[1:]))
    T, B = sum(uni.values()), sum(bi.values())
    want = []
    for (a, b), nab in bi.items():
        if nab >= 2:
            pmi = round(
                math.log(nab * float(T) * T / (B * float(uni[a]) * uni[b])), 6
            )
            want.append((a, b, nab, uni[a], uni[b], pmi))
    want.sort(key=lambda r: (-r[5], r[0], r[1]))
    assert got == want[:5] and len(got) > 0
    # the planted phrase "the cat"/"the mat" repeats across docs, so at
    # least one pair above min_count survives and ranks by rounded pmi
    assert all(got[i][5] >= got[i + 1][5] for i in range(len(got) - 1))


def test_hashed_classifier_score_null_text_row(spark):
    """Regression: size(tokens(NULL)) is NULL under ANSI — a NULL-text
    row must still emit (id, 0, 0.5) on BOTH weight paths."""
    from orchid_fst_spark.operators.ranking import hashed_classifier_score

    df = spark.createDataFrame(
        [(1, "hello world"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    for w in (None, spark.createDataFrame([(0, 1.0)], "feature long, weight double")):
        got = {
            r.id: (r.n_tokens, r.score)
            for r in hashed_classifier_score(
                df, "doc_id", "text", weights=w
            ).collect()
        }
        assert len(got) == 3
        assert got[2] == (0, 0.5) and got[3] == (0, 0.5)


def test_reciprocal_rank_fusion_matches_python(spark):
    from orchid_fst_spark.operators.ranking import reciprocal_rank_fusion

    a = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id long, rank long"
    )
    b = spark.createDataFrame(
        [(3, 1), (1, 2), (9, 3)], "doc_id long, rank long"
    )
    got = {
        r.id: (r.rrf, r.n_systems)
        for r in reciprocal_rank_fusion([a, b], k=60).collect()
    }
    want = {
        1: round(1 / 61 + 1 / 62, 6),
        2: round(1 / 62, 6),
        3: round(1 / 63 + 1 / 61, 6),
        9: round(1 / 63, 6),
    }
    assert {i: v[0] for i, v in got.items()} == want
    assert got[1][1] == 2 and got[2][1] == 1 and got[9][1] == 1
    # top_n cuts under the (rrf DESC, id) total order
    top = [
        r.id
        for r in reciprocal_rank_fusion([a, b], k=60, top_n=2).collect()
    ]
    assert top == [1, 3]  # 1 outranks 3 (1/61+1/62 > 1/61+1/63)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        reciprocal_rank_fusion([])
    with _pytest.raises(ValueError):
        reciprocal_rank_fusion([a], k=-1)
