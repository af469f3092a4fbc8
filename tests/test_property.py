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


# --------------------------------------------------------------------------
# Spark-operator properties (few examples — every example runs real jobs)
# --------------------------------------------------------------------------

_IV = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),       # key
        st.integers(0, 50),                # start minute
        st.integers(0, 25),                # duration minutes (0 = empty)
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=8, deadline=None)
@given(left=_IV, right=_IV, bucket_min=st.sampled_from([1, 3, 7, 60]))
def test_interval_overlap_join_matches_bruteforce(spark, left, right, bucket_min):
    from datetime import datetime, timedelta

    from orchid_fst_spark.operators.interval import interval_overlap_join

    base = datetime(2024, 1, 1)

    def rows(data):
        return [
            (i, k, base + timedelta(minutes=s), base + timedelta(minutes=s + d))
            for i, (k, s, d) in enumerate(data)
        ]

    lr, rr = rows(left), rows(right)
    ldf = spark.createDataFrame(lr, "lid long, k string, ls timestamp, le timestamp")
    rdf = spark.createDataFrame(rr, "rid long, k string, rs timestamp, re timestamp")
    got = sorted(
        (r.lid, r.rid)
        for r in interval_overlap_join(
            ldf, rdf, ["k"], "ls", "le", "rs", "re",
            bucket_seconds=bucket_min * 60,
        ).collect()
    )
    want = sorted(
        (li, rj)
        for (li, lk, s1, e1) in lr
        for (rj, rk, s2, e2) in rr
        if lk == rk and s1 < e2 and s2 < e1 and e1 > s1 and e2 > s2
    )
    assert got == want


@settings(max_examples=5, deadline=None)
@given(
    values=st.lists(st.text(alphabet="abc中!", min_size=1, max_size=6),
                    min_size=1, max_size=30, unique=True)
)
def test_bloom_sketch_matches_python_model(spark, values):
    import hashlib

    from orchid_fst_spark.operators.sketch import bloom_collect, bloom_sketch

    m_bits, k = 1 << 10, 3
    df = spark.createDataFrame([(v,) for v in values], "v string")
    words = bloom_collect(bloom_sketch(df, "v", m_bits=m_bits, k_hashes=k), m_bits)

    model = [0] * (m_bits // 32)
    for v in values:
        for i in range(k):
            h = int(hashlib.md5(f"bloom{i}|{v}".encode()).hexdigest()[:8], 16)
            b = h % m_bits
            model[b // 32] |= 1 << (b % 32)
    assert words == model


@given(
    st.lists(
        st.tuples(
            st.booleans(), st.booleans(), st.booleans(),
            st.integers(min_value=1, max_value=10**7),
        ),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[:3],
    ),
    st.integers(min_value=1, max_value=12),
)
@settings(max_examples=40, deadline=None)
def test_fs_em_python_matches_duckdb_replay(pats, iters):
    """The EM determinism contract, fuzzed: _em_fit over a random
    contingency table must reproduce the unrolled-CTE DuckDB replay
    bit-for-bit — any float op out of lockstep (product order, clamp
    literal, floor/round) flips some (pattern, iters) combination."""
    import duckdb

    from __spark_entry__ import _fs_em_sql
    from orchid_fst_spark.er.scoring import _em_fit

    lam, m, u = _em_fit(
        [((a, b, c), n) for a, b, c, n in pats], 3, iters=iters
    )
    values = ", ".join(
        f"({str(a).lower()}, {str(b).lower()}, {str(c).lower()}, {n})"
        for a, b, c, n in pats
    )
    pat_cte = (
        "pat AS (SELECT * FROM (VALUES " + values + ") "
        "t(agree_dist, agree_jw, agree_jaccard, n_pairs))"
    )
    sql = "WITH " + _fs_em_sql(iters=iters, pat_sql=pat_cte)
    con = duckdb.connect()
    row = con.sql(
        "SELECT DISTINCT lam, m_dist, u_dist, m_jw, u_jw, m_jaccard,"
        " u_jaccard FROM (" + sql + ")"
    ).fetchall()
    con.close()
    assert len(row) == 1
    got = row[0]
    exp = (lam, m[0], u[0], m[1], u[1], m[2], u[2])
    assert got == exp, f"params diverged: duck={got} py={exp}"


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1),
            st.integers(min_value=0, max_value=2),
            st.integers(min_value=0, max_value=2),
            st.integers(min_value=1, max_value=10**7),
        ),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[:3],
    ),
    st.integers(min_value=1, max_value=12),
)
@settings(max_examples=40, deadline=None)
def test_fs_em_leveled_python_matches_duckdb_replay(pats, iters):
    """The multi-level EM determinism contract, fuzzed: _em_fit_leveled
    over a random level-pattern table must reproduce the unrolled-CTE
    DuckDB replay bit-for-bit (same lockstep property as the binary
    twin, now over per-level parameter vectors)."""
    import duckdb

    from __spark_entry__ import _fs_em_leveled_sql
    from orchid_fst_spark.er.scoring import _em_fit_leveled

    lam, m, u = _em_fit_leveled(
        [((a, b, c), n) for a, b, c, n in pats], [2, 3, 3], iters=iters
    )
    values = ", ".join(f"({a}, {b}, {c}, {n})" for a, b, c, n in pats)
    pat_cte = (
        "pat AS (SELECT * FROM (VALUES " + values + ") "
        "t(lvl_dist, lvl_jw, lvl_jaccard, n_pairs))"
    )
    sql = "WITH " + _fs_em_leveled_sql(iters=iters, pat_sql=pat_cte)
    cols = ["lam"]
    for name, nl in (("dist", 2), ("jw", 3), ("jaccard", 3)):
        for lv in range(nl):
            cols += [f"m_{name}_{lv}", f"u_{name}_{lv}"]
    con = duckdb.connect()
    row = con.sql(
        "SELECT DISTINCT " + ", ".join(cols) + " FROM (" + sql + ")"
    ).fetchall()
    con.close()
    assert len(row) == 1
    exp = [lam]
    for k, nl in enumerate((2, 3, 3)):
        for lv in range(nl):
            exp += [m[k][lv], u[k][lv]]
    assert list(row[0]) == exp, f"params diverged: duck={row[0]} py={exp}"


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=20),
        ),
        min_size=1,
        max_size=25,
    ),
    st.integers(min_value=8, max_value=8),
)
@settings(max_examples=30, deadline=None)
def test_greedy_match_sql_equals_sequential_greedy(raw, rounds):
    """The unrolled mutual-best-rounds SQL == sequential greedy matching
    under the (-score, a, b) edge order, fuzzed over random scored
    graphs (ties included by construction: scores live on a 21-value
    grid)."""
    import duckdb

    from __spark_entry__ import _greedy_match_sql

    edges = {}
    for i, j, s in raw:
        if i == j:
            continue
        a, b = (f"n{min(i, j)}", f"n{max(i, j)}")
        edges[(a, b)] = max(edges.get((a, b), -1.0), round(s / 20.0, 6))
    if not edges:
        return
    values = ", ".join(
        f"('{a}', '{b}', {s!r})" for (a, b), s in sorted(edges.items())
    )
    head = (
        "WITH ge0 AS MATERIALIZED (SELECT * FROM (VALUES "
        + values
        + ") t(key_a, key_b, s))"
    )
    sql = _greedy_match_sql(rounds=rounds, head=head)
    con = duckdb.connect()
    got = {(r[0], r[1], float(r[2])) for r in con.sql(sql).fetchall()}
    con.close()
    used, exp = set(), set()
    for (a, b), s in sorted(edges.items(), key=lambda kv: (-kv[1], kv[0])):
        if a not in used and b not in used:
            used |= {a, b}
            exp.add((a, b, s))
    assert got == exp, f"duck={got} py={exp}"
