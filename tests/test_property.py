"""Hypothesis property tests for the distance kernels and caches —
randomized differential coverage with automatic shrinking (complements
the fixed-seed randomized suites in test_distance.py / test_caches.py).
"""

from functools import lru_cache

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from orchid_fst_spark.functions.distance import (
    batch_levenshtein,
    levenshtein,
    osa,
)
from orchid_fst_spark.util.caches import LFUCache, LRUCache

# small alphabet maximizes collisions/transpositions per example; mixed
# ASCII + CJK exercises the char-level (not byte-level) semantics
WORD = st.text(alphabet="abAB中一!", max_size=7)


def _lev_ref(a: str, b: str) -> int:
    @lru_cache(maxsize=None)
    def d(i, j):
        if i == 0:
            return j
        if j == 0:
            return i
        return min(
            d(i - 1, j) + 1,
            d(i, j - 1) + 1,
            d(i - 1, j - 1) + (a[i - 1] != b[j - 1]),
        )

    return d(len(a), len(b))


def _osa_ref(a: str, b: str) -> int:
    @lru_cache(maxsize=None)
    def d(i, j):
        if i == 0:
            return j
        if j == 0:
            return i
        best = min(
            d(i - 1, j) + 1,
            d(i, j - 1) + 1,
            d(i - 1, j - 1) + (a[i - 1] != b[j - 1]),
        )
        if i > 1 and j > 1 and a[i - 1] == b[j - 2] and a[i - 2] == b[j - 1]:
            best = min(best, d(i - 2, j - 2) + 1)
        return best

    return d(len(a), len(b))


@given(WORD, WORD)
@settings(max_examples=300, deadline=None)
def test_levenshtein_matches_reference_recursion(a, b):
    assert levenshtein(a, b) == _lev_ref(a, b)


@given(WORD, WORD)
@settings(max_examples=300, deadline=None)
def test_osa_matches_reference_recursion(a, b):
    d = osa(a, b)
    assert d == _osa_ref(a, b)
    # metric sandwich: osa <= lev <= 2*osa (a transposition is two edits)
    lv = levenshtein(a, b)
    assert d <= lv <= 2 * d if d > 0 else lv == 0
    assert (d == 0) == (a == b)
    assert d == osa(b, a)


@given(st.lists(st.tuples(WORD, WORD), min_size=1, max_size=12))
@settings(max_examples=100, deadline=None)
def test_batch_kernel_matches_scalar(pairs):
    left = [a for a, _ in pairs]
    right = [b for _, b in pairs]
    got = batch_levenshtein(left, right, transpositions=True)
    exp = np.array([osa(a, b) for a, b in pairs])
    assert (got == exp).all()
    # clamped variant: values above the clamp may saturate, never under
    got2 = batch_levenshtein(left, right, clamp=2, transpositions=True)
    for g, e in zip(got2, exp):
        if e <= 2:
            assert g == e
        else:
            assert g > 2


OPS = st.lists(
    st.tuples(
        st.sampled_from(["get", "put"]),
        st.integers(0, 9),
        st.text(alphabet="xy", max_size=4),
    ),
    max_size=60,
)


@given(OPS)
@settings(max_examples=150, deadline=None)
def test_lru_never_exceeds_budget_and_serves_truth(ops):
    cache = LRUCache(24)
    truth = {}
    for op, key, val in ops:
        k = f"k{key}"
        if op == "put":
            cache.put(k, val)
            truth[k] = val
        else:
            got = cache.get(k)
            # a hit must return the last value written
            if got is not None:
                assert got == truth.get(k)
    assert cache.size_bytes <= 24 + 12  # at most one oversize resident


@given(OPS)
@settings(max_examples=150, deadline=None)
def test_lfu_hit_values_are_truthful(ops):
    cache = LFUCache(24)
    truth = {}
    for op, key, val in ops:
        k = f"k{key}"
        if op == "put":
            cache.put(k, val)
            truth[k] = val
        else:
            got = cache.get(k)
            if got is not None:
                assert got == truth.get(k)
    # internal structures stay consistent
    assert set(cache.data) == set(cache.freq)
    assert sum(len(b) for b in cache.buckets.values()) == len(cache.data)
