"""Composable matcher combinators (reference automaton.h:138-304) —
JVM-path and Python-path parity against brute-force evaluation."""

import pytest

from orchid_fst_spark.automata.matchers import (
    Always,
    Fuzzy,
    GreaterThan,
    LessThan,
    Not,
    Prefix,
    StartsWith,
    Str,
    match,
)
from orchid_fst_spark.functions.distance import levenshtein, osa
from orchid_fst_spark.sources.fixtures import gen_dict_words


@pytest.fixture(scope="module")
def words():
    return gen_dict_words(800)


@pytest.fixture(scope="module")
def dict_df(spark, words):
    return spark.createDataFrame([(w,) for w in words], "key string").cache()


def _run(dict_df, m):
    return [r.key for r in match(dict_df, m).collect()]


def test_leaves_jvm(spark, dict_df, words):
    sw = sorted(words)
    assert _run(dict_df, Always()) == sw
    assert _run(dict_df, Str(words[5])) == [words[5]]
    assert _run(dict_df, Prefix("st")) == [w for w in sw if w.startswith("st")]
    lo = sw[100]
    assert _run(dict_df, GreaterThan(lo, inclusive=False)) == [
        w for w in sw if w > lo
    ]
    assert _run(dict_df, LessThan(lo)) == [w for w in sw if w <= lo]


def test_fuzzy_composition_jvm(spark, dict_df, words):
    # fuzzy ∩ prefix = the reference's samePrefixLen (fst.cpp:541-551)
    m = Fuzzy("hair", 2) & Prefix("ha")
    exp = sorted(
        w for w in words if levenshtein(w, "hair") <= 2 and w.startswith("ha")
    )
    assert m.jvm_ok
    assert _run(dict_df, m) == exp


def test_union_not_python_path(spark, dict_df, words):
    # OSA leaf forces the Python path for the whole tree
    m = (Fuzzy("hair", 1, damerau=True) | Str(words[3])) & ~Prefix("zzz")
    assert not m.jvm_ok
    exp = sorted(
        w
        for w in words
        if (osa(w, "hair") <= 1 or w == words[3]) and not w.startswith("zzz")
    )
    assert _run(dict_df, m) == exp


def test_bare_fuzzy_osa_sorted_walk(spark, dict_df, words):
    # a bare OSA Fuzzy runs the shared-prefix sorted DFA walk — results
    # must equal brute-force OSA
    m = Fuzzy("hair", 2, damerau=True)
    assert not m.jvm_ok
    exp = sorted(w for w in words if osa(w, "hair") <= 2)
    assert _run(dict_df, m) == exp


def test_startswith_jvm_closed_forms(spark, dict_df, words):
    # prefix-closed inner matchers compile to Catalyst predicates
    sw = sorted(words)
    cases = [
        (StartsWith(Str("sta")), lambda w: w.startswith("sta")),
        (StartsWith(Prefix("st")), lambda w: w.startswith("st")),
        (StartsWith(Always()), lambda w: True),
        (StartsWith(GreaterThan("m")), lambda w: w >= "m"),
        (StartsWith(LessThan("m")), lambda w: True),  # '' <= 'm'
        (StartsWith(LessThan("", inclusive=False)), lambda w: False),
        (
            StartsWith(Str("sta") | Prefix("ha")),
            lambda w: w.startswith("sta") or w.startswith("ha"),
        ),
    ]
    for m, ref in cases:
        assert m.jvm_ok, m
        assert _run(dict_df, m) == [w for w in sw if ref(w)], m
    # brute-force prefix-enumeration parity on the Python predicate too
    for m, _ in cases:
        for w in words[:50]:
            brute = any(m.inner.accepts(w[:i]) for i in range(len(w) + 1))
            assert m.accepts(w) == brute, (m, w)


def test_startswith_fuzzy_incremental_parity(words):
    # the O(len) match-seen DFA walk equals brute-force prefix checks
    m = StartsWith(Fuzzy("sta", 1))
    assert not m.jvm_ok
    for w in words[:200]:
        brute = any(levenshtein(w[:i], "sta") <= 1 for i in range(len(w) + 1))
        assert m.accepts(w) == brute, w


def test_startswith(spark, dict_df, words):
    # "some prefix of the key matches" — here: key starts with something
    # within distance 1 of 'sta'
    m = StartsWith(Fuzzy("sta", 1))
    exp = sorted(
        w
        for w in words
        if any(levenshtein(w[:i], "sta") <= 1 for i in range(len(w) + 1))
    )
    assert _run(dict_df, m) == exp


def test_startswith_intersect_not_closed_forms(spark, dict_df, words):
    """StartsWith over Intersect/Not of extension-closed inners runs on
    the JVM path (round-2 gap: those compositions fell back to Python),
    with brute-force prefix-enumeration parity."""
    sw = sorted(words)
    cases = [
        # Prefix ∩ GreaterThan: conjunction of the startswith forms
        (
            StartsWith(Prefix("st") & GreaterThan("sta")),
            lambda w: w.startswith("st") and w >= "sta",
        ),
        # nested: (Prefix ∪ Prefix) ∩ GreaterThan stays extension-closed
        (
            StartsWith((Prefix("st") | Prefix("ha")) & GreaterThan("h")),
            lambda w: (w.startswith("st") or w.startswith("ha")) and w >= "h",
        ),
        # Not of extension-closed: constant (inner rejects '' -> True)
        (StartsWith(Not(Prefix("st"))), lambda w: True),
        (StartsWith(Not(Always())), lambda w: False),
        (StartsWith(Not(GreaterThan(""))), lambda w: False),  # '' >= ''
    ]
    for m, ref in cases:
        assert m.jvm_ok, m
        assert _run(dict_df, m) == [w for w in sw if ref(w)], m
        for w in words[:50]:
            brute = any(m.inner.accepts(w[:i]) for i in range(len(w) + 1))
            assert m.accepts(w) == brute, (m, w)
    # non-extension-closed compositions still fall back to Python
    assert not StartsWith(Prefix("st") & LessThan("sz")).jvm_ok
    assert not StartsWith(Not(Str("sta"))).jvm_ok
