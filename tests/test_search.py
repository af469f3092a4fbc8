"""Phrase / boolean search vs a trusted pure-Python scan, including
overlapping matches, repeated phrase terms, and must_not exclusion."""

import pytest

from orchid_fst_spark.operators.search import (
    boolean_search,
    phrase_search,
    postings,
)

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "cat sat cat sat cat"),          # overlapping "cat sat cat"
    (2, "the dog sat on the cat"),
    (3, "mat the cat"),
    (4, "completely unrelated words"),
    (5, ""),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _py_phrase(text, phrase):
    toks = text.split()
    m = len(phrase)
    return sum(
        1
        for i in range(len(toks) - m + 1)
        if toks[i : i + m] == phrase
    )


@pytest.mark.parametrize(
    "phrase",
    [
        ["the", "cat"],
        ["cat", "sat", "cat"],  # repeated term + overlap (doc 1: 2 hits)
        ["sat", "on", "the"],
        ["cat"],
        ["missing", "phrase"],
    ],
)
def test_phrase_search_parity(spark, docs_df, phrase):
    got = {
        r.doc_id: r.n_matches
        for r in phrase_search(docs_df, "doc_id", "text", phrase).collect()
    }
    want = {
        i: _py_phrase(t, phrase) for i, t in DOCS if _py_phrase(t, phrase)
    }
    assert got == want


def test_boolean_search(spark, docs_df):
    got = {
        r.doc_id
        for r in boolean_search(
            docs_df, "doc_id", "text", must=["cat", "sat"]
        ).collect()
    }
    assert got == {0, 1, 2}
    got = {
        r.doc_id
        for r in boolean_search(
            docs_df, "doc_id", "text", must=["cat", "sat"], must_not=["dog"]
        ).collect()
    }
    assert got == {0, 1}
    # duplicate must terms collapse (["cat","cat"] == ["cat"])
    got = {
        r.doc_id
        for r in boolean_search(
            docs_df, "doc_id", "text", must=["cat", "cat"]
        ).collect()
    }
    assert got == {0, 1, 2, 3}


def test_postings_positions(spark, docs_df):
    rows = postings(
        docs_df.filter("doc_id = 3"), "doc_id", "text"
    ).collect()
    assert sorted((r.pos, r.term) for r in rows) == [
        (0, "mat"),
        (1, "the"),
        (2, "cat"),
    ]


def test_fuzzy_term_docs_matches_python(spark):
    from orchid_fst_spark.operators.search import fuzzy_term_docs

    docs = spark.createDataFrame(
        [
            (1, "fast merge fast"),
            (2, "last cast FAST"),
            (3, "feast fist nothing"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    got = sorted(
        (r.term, r.dist, r.doc_id, r.tf)
        for r in fuzzy_term_docs(docs, "doc_id", "text", "Fast", k=1).collect()
    )
    # lowercased both sides: fast(0), last/cast/fist(1); feast is 1 too
    assert got == [
        ("cast", 1, 2, 1),
        ("fast", 0, 1, 2),
        ("fast", 0, 2, 1),
        ("feast", 1, 3, 1),
        ("fist", 1, 3, 1),
        ("last", 1, 2, 1),
    ]
    # k=0 degrades to exact match
    exact = sorted(
        (r.term, r.doc_id)
        for r in fuzzy_term_docs(docs, "doc_id", "text", "fast", k=0).collect()
    )
    assert exact == [("fast", 1), ("fast", 2)]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        fuzzy_term_docs(docs, "doc_id", "text", "x", k=-1)
