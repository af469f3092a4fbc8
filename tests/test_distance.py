"""Differential tests of the distance kernels (mirrors the reference's
randomized differential cache tests, cache_unittest.cpp:41-96)."""

import itertools
import random

import pytest

from orchid_fst_spark.functions.distance import (
    batch_levenshtein,
    batch_levenshtein_py,
    damerau_levenshtein,
    levenshtein,
    osa,
)
from orchid_fst_spark.functions.similarity import jaro, jaro_winkler


def _rand_pairs(n, seed, alpha="abcdef", maxlen=12):
    rng = random.Random(seed)
    return [
        (
            "".join(rng.choice(alpha) for _ in range(rng.randint(0, maxlen))),
            "".join(rng.choice(alpha + "g") for _ in range(rng.randint(0, maxlen))),
        )
        for _ in range(n)
    ]


def test_known_values():
    assert levenshtein("hair", "hare") == 2
    assert levenshtein("kitten", "sitting") == 3
    assert osa("ca", "abc") == 3  # restricted: no overlapping edits
    assert damerau_levenshtein("ca", "abc") == 2  # unrestricted
    assert osa("crate", "trace") == 2  # two substitutions, no transposition needed
    assert osa("ab", "ba") == 1
    assert levenshtein("ab", "ba") == 2


def test_unicode_char_granularity():
    # one CJK char = one edit (reference utf8 semantics, utf8_util.cpp:78-90)
    assert levenshtein("中国", "中国人") == 1
    assert levenshtein("中国", "美国") == 1
    assert osa("北京", "京北") == 1


def test_astral_plane_jvm_matches_code_points(spark):
    """Pin that Spark 4's JVM ``levenshtein`` counts CODE POINTS above
    the BMP — an emoji (surrogate pair in UTF-16) is ONE edit, matching
    the reference's UTF-8 char granularity (utf8_util.cpp:78-90) and
    our Python/numpy kernels — on both the full and the banded
    (threshold) form, differentially over random astral-heavy strings.
    This is what licenses F.levenshtein as the exact fast path with no
    non-BMP routing (VERDICT r3 missing #3: verified, no gap exists)."""
    import random

    from pyspark.sql import functions as F

    from orchid_fst_spark.operators.dictionary import fuzzy_lookup

    jvm = (
        spark.range(1)
        .select(F.levenshtein(F.lit("\U0001F389"), F.lit("x")).alias("d"))
        .first()
        .d
    )
    assert jvm == 1 == levenshtein("\U0001F389", "x")
    assert batch_levenshtein(["\U0001F389"], ["x"])[0] == 1

    alpha = ["a", "b", "\U0001F389", "\U0001F600", "中", "\U00010348"]
    rng = random.Random(7)
    pairs = [
        (
            "".join(rng.choices(alpha, k=rng.randint(0, 6))),
            "".join(rng.choices(alpha, k=rng.randint(0, 6))),
        )
        for _ in range(200)
    ]
    rows = (
        spark.createDataFrame(pairs, "a string, b string")
        .select(
            "a",
            "b",
            F.levenshtein("a", "b").alias("d"),
            F.levenshtein("a", "b", 2).alias("db"),
        )
        .collect()
    )
    for r in rows:
        exp = levenshtein(r.a, r.b)
        assert r.d == exp
        assert (r.db >= 0) == (exp <= 2)

    # the builtin fuzzy path is therefore exact on astral data
    words = ["ha\U0001F389r", "hair", "zzzz"]
    df = spark.createDataFrame([(w,) for w in words], "key string")
    got = [
        r.key
        for r in fuzzy_lookup(df, "ha\U0001F389r", 1, impl="builtin").collect()
    ]
    assert got == sorted(["ha\U0001F389r", "hair"])


def test_batch_kernel_matches_oracle():
    pairs = _rand_pairs(5000, 42)
    left = [a for a, _ in pairs]
    right = [b for _, b in pairs]
    for trans in (False, True):
        for clamp in (None, 1, 2):
            got = batch_levenshtein(left, right, clamp=clamp, transpositions=trans)
            exp = batch_levenshtein_py(left, right, clamp=clamp, transpositions=trans)
            assert (got == exp).all()


def test_affine_gap_known_values():
    from orchid_fst_spark.functions.distance import affine_gap

    # identity / empty boundaries (gap of length L costs 3 + (L-1)*1)
    assert affine_gap("", "") == 0
    assert affine_gap("abc", "abc") == 0
    assert affine_gap("abc", "") == 5
    assert affine_gap("", "abcd") == 6
    # one substitution = mismatch cost
    assert affine_gap("scan", "scat") == 2
    # the Bilenko-Mooney motivation: ONE long gap (truncation) is
    # cheaper than the same chars as two scattered gaps
    assert affine_gap("street", "st") == 3 + 3 * 1  # one gap of 4
    one_gap = affine_gap("abcdef", "af")       # gap "bcde": 3+3
    two_gaps = affine_gap("abcdef", "acf")     # gaps "b","de": (3)+(3+1)
    assert one_gap == 6 and two_gaps == 7
    # symmetry
    for a, b in _rand_pairs(200, 11):
        assert affine_gap(a, b) == affine_gap(b, a)


def test_affine_gap_unit_costs_is_levenshtein():
    from orchid_fst_spark.functions.distance import affine_gap

    for a, b in _rand_pairs(1000, 13):
        assert affine_gap(
            a, b, mismatch=1, gap_open=1, gap_extend=1
        ) == levenshtein(a, b)


def test_affine_gap_no_sub_is_lcs_distance():
    # with substitution priced out and unit gaps, the optimum is
    # indel-only: distance == len(a) + len(b) - 2*LCS(a, b)
    from orchid_fst_spark.functions.distance import affine_gap

    def lcs(a, b):
        prev = [0] * (len(b) + 1)
        for ca in a:
            cur = [0]
            for j, cb in enumerate(b, 1):
                cur.append(
                    prev[j - 1] + 1 if ca == cb else max(prev[j], cur[j - 1])
                )
            prev = cur
        return prev[-1]

    for a, b in _rand_pairs(500, 17, maxlen=9):
        got = affine_gap(a, b, mismatch=10**6, gap_open=1, gap_extend=1)
        assert got == len(a) + len(b) - 2 * lcs(a, b)


def test_affine_gap_lower_bounded_by_levenshtein():
    # every affine op costs >= 1 under the defaults, so unit-cost
    # Levenshtein is an exact JVM prefilter for affine thresholds
    from orchid_fst_spark.functions.distance import affine_gap

    for a, b in _rand_pairs(1000, 19):
        assert affine_gap(a, b) >= levenshtein(a, b)


def test_affine_gap_batch_matches_oracle():
    from orchid_fst_spark.functions.distance import affine_gap, batch_affine_gap

    pairs = _rand_pairs(5000, 23)
    left = [a for a, _ in pairs]
    right = [b for _, b in pairs]
    for costs in (
        dict(mismatch=2, gap_open=3, gap_extend=1),
        dict(mismatch=1, gap_open=1, gap_extend=1),
        dict(mismatch=3, gap_open=5, gap_extend=2),
    ):
        got = batch_affine_gap(left, right, **costs)
        exp = [affine_gap(a, b, **costs) for a, b in pairs]
        assert got.tolist() == exp


def test_affine_gap_rejects_inverted_costs():
    from orchid_fst_spark.functions.distance import affine_gap, batch_affine_gap

    with pytest.raises(ValueError):
        affine_gap("a", "b", gap_open=1, gap_extend=2)
    with pytest.raises(ValueError):
        batch_affine_gap(["a"], ["b"], gap_open=1, gap_extend=2)


def test_osa_vs_true_damerau_relationship():
    for a, b in _rand_pairs(2000, 7):
        dl = damerau_levenshtein(a, b)
        o = osa(a, b)
        lev = levenshtein(a, b)
        assert dl <= o <= lev


def test_jaro_winkler_known():
    assert jaro("martha", "marhta") == pytest.approx(0.9444444444444445)
    assert jaro_winkler("martha", "marhta") == pytest.approx(0.9611111111111111)
    assert jaro_winkler("", "") == 0.0
    assert jaro_winkler("ab", "ba") == 0.0
    # boost threshold 0.7: no prefix boost below it
    assert jaro_winkler("abcdef", "abczzzzzz") == pytest.approx(0.611111111111111)


def test_jaro_winkler_matches_duckdb():
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    for a, b in _rand_pairs(500, 99, alpha="abcde "):
        jd, jwd = con.execute(
            "select jaro_similarity(?,?), jaro_winkler_similarity(?,?)", [a, b, a, b]
        ).fetchone()
        assert jaro(a, b) == pytest.approx(jd, abs=1e-12)
        assert jaro_winkler(a, b) == pytest.approx(jwd, abs=1e-12)


def test_damerau_matches_duckdb():
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    for a, b in _rand_pairs(500, 13):
        (exp,) = con.execute("select damerau_levenshtein(?,?)", [a, b]).fetchone()
        assert damerau_levenshtein(a, b) == exp

def test_monge_elkan_known():
    from orchid_fst_spark.functions.similarity import monge_elkan

    # identical token sets in any order score 1.0
    assert monge_elkan("john smith", "smith john") == 1.0
    # extra right-side token only dents the b->a direction; symmetric
    # max keeps the a->b average of perfect matches
    assert monge_elkan("john smith", "john smith jr") == 1.0
    # empty / blank inputs
    assert monge_elkan("", "john") == 0.0
    assert monge_elkan("  ", "") == 0.0
    # '/-' separators tokenize like score_pairs
    assert monge_elkan("john-smith", "smith/john") == 1.0


def test_monge_elkan_matches_duckdb():
    """The 6dp integer-fixpoint kernel must hash-match the DuckDB nested
    list-comprehension twin (the er_monge_elkan oracle) exactly — no
    approx, the driver compare hashes raw doubles."""
    duckdb = pytest.importorskip("duckdb")
    from orchid_fst_spark.functions.similarity import monge_elkan

    con = duckdb.connect()
    sql = r"""
WITH t AS (
  SELECT list_filter(string_split_regex(trim(regexp_replace(?, '[/-]', ' ', 'g')), '\s+'), x -> x <> '') AS ta,
         list_filter(string_split_regex(trim(regexp_replace(?, '[/-]', ' ', 'g')), '\s+'), x -> x <> '') AS tb
)
SELECT greatest(
  CASE WHEN len(ta) = 0 OR len(tb) = 0 THEN 0.0 ELSE
    list_sum([list_max([cast(floor(jaro_winkler_similarity(x, y)*1e6 + 0.5) AS BIGINT) for y in tb]) for x in ta])::DOUBLE / (1e6 * len(ta)) END,
  CASE WHEN len(ta) = 0 OR len(tb) = 0 THEN 0.0 ELSE
    list_sum([list_max([cast(floor(jaro_winkler_similarity(y, x)*1e6 + 0.5) AS BIGINT) for x in ta]) for y in tb])::DOUBLE / (1e6 * len(tb)) END
) FROM t"""
    rng = random.Random(77)
    words = ["john", "jon", "smith", "smyth", "mary", "anne", "ann", "lee", "li", "x"]
    for _ in range(300):
        a = " ".join(rng.choices(words, k=rng.randint(0, 4)))
        b = " ".join(rng.choices(words, k=rng.randint(0, 4)))
        (exp,) = con.execute(sql, [a, b]).fetchone()
        got = monge_elkan(a, b)
        assert got == exp, (a, b, got, exp)


def test_soft_tfidf_known():
    from orchid_fst_spark.functions.similarity import soft_tfidf

    # exact single-token match: V(a,S)·V(a,T)·1.0 with unit norms = 1.0
    assert soft_tfidf(["abc"], [2.5], ["abc"], [0.7]) == 1.0
    # below-theta best match contributes nothing
    assert soft_tfidf(["abc"], [1.0], ["zzz"], [1.0]) == 0.0
    # empty sides
    assert soft_tfidf([], [], ["abc"], [1.0]) == 0.0
    assert soft_tfidf(None, None, ["abc"], [1.0]) == 0.0
    # hand-computed: left [abc(1), xyz(2)] vs right [abc(1.5), zzz(0.5)]:
    # only abc matches (jw=1.0), term = (1/sqrt(5))·(1.5/sqrt(2.5))·1.0
    import math

    exp = math.floor(
        (1.0 / math.sqrt(5.0)) * (1.5 / math.sqrt(2.5)) * 1.0 * 1e9 + 0.5
    ) / 1e9
    assert soft_tfidf(["abc", "xyz"], [1.0, 2.0], ["abc", "zzz"], [1.5, 0.5]) == exp


def test_soft_tfidf_matches_duckdb():
    """The 1e9 term-fixpoint kernel must hash-match the DuckDB
    relational twin (the er_soft_tfidf oracle's per-pair core) exactly
    — including the first-maximum (lexicographically smallest) best-
    match tie-break over the sorted token arrays."""
    duckdb = pytest.importorskip("duckdb")
    from orchid_fst_spark.functions.similarity import soft_tfidf

    con = duckdb.connect()
    sql = r"""
WITH t AS (SELECT ? AS ta, ? AS wa, ? AS tb, ? AS wb),
n AS (
  SELECT sqrt(list_reduce(list_transform(wa, w -> w * w), (a, b) -> a + b)) AS na,
         sqrt(list_reduce(list_transform(wb, w -> w * w), (a, b) -> a + b)) AS nb,
         ta, wa, tb, wb
  FROM t
),
lt AS (SELECT na, nb, tb, wb, unnest(ta) AS x, unnest(wa) AS wx FROM n),
sc AS (
  SELECT na, nb, wx,
         list_max([cast(floor(jaro_winkler_similarity(x, y)*1e6 + 0.5) AS BIGINT) for y in tb]) AS best6,
         wb[list_position([cast(floor(jaro_winkler_similarity(x, y)*1e6 + 0.5) AS BIGINT) for y in tb], best6)] AS wy
  FROM lt
)
SELECT coalesce(sum(CASE WHEN best6 >= 900000
  THEN cast(floor(((wx / na) * (wy / nb)) * (best6 / 1e6) * 1e9 + 0.5) AS BIGINT)
  ELSE 0 END)::BIGINT, 0) / 1e9 FROM sc"""
    rng = random.Random(41)
    words = ["john", "jon", "smith", "smyth", "mary", "ann", "anne", "lee"]
    for _ in range(200):
        ka = rng.randint(1, 4)
        kb = rng.randint(1, 4)
        ta = sorted(set(rng.choices(words, k=ka)))
        tb = sorted(set(rng.choices(words, k=kb)))
        wa = [round(rng.uniform(0.1, 3.0), 6) for _ in ta]
        wb = [round(rng.uniform(0.1, 3.0), 6) for _ in tb]
        (exp,) = con.execute(sql, [ta, wa, tb, wb]).fetchone()
        got = soft_tfidf(ta, wa, tb, wb)
        assert got == exp, (ta, wa, tb, wb, got, exp)


def test_batch_jw_family_matches_scalar_kernels():
    """The numpy padded-batch JW family (batch_jaro_winkler /
    batch_monge_elkan / batch_soft_tfidf) must be BIT-IDENTICAL to the
    scalar reference kernels — the 6dp/1e9 fixpoints and therefore the
    DuckDB oracle hashes depend on it.  5k random pairs incl. unicode,
    astral-plane chars, empties, and near-duplicates (the dedup-gather
    path must still cover every distinct pair)."""
    import numpy as np

    from orchid_fst_spark.functions.similarity import (
        batch_jaro_winkler,
        batch_monge_elkan,
        batch_soft_tfidf,
        jaro_winkler,
        monge_elkan,
        soft_tfidf,
    )

    rng = random.Random(4242)
    alpha = "abcdefgh /-éß\U0001F600"

    def rnd(maxlen):
        return "".join(
            rng.choice(alpha) for _ in range(rng.randint(0, maxlen))
        )

    pairs = [(rnd(20), rnd(20)) for _ in range(3000)]
    for _ in range(2000):  # near-duplicates: heavy pair collisions
        a = rnd(15)
        b = list(a)
        for _ in range(rng.randint(0, 3)):
            if b:
                b[rng.randrange(len(b))] = rng.choice(alpha)
        pairs.append((a, "".join(b)))
    left = [p[0] for p in pairs]
    right = [p[1] for p in pairs]

    got = batch_jaro_winkler(left, right)
    exp = np.array([jaro_winkler(a, b) for a, b in pairs])
    assert (got == exp).all()

    got = batch_monge_elkan(left, right)
    exp = np.array([monge_elkan(a, b) for a, b in pairs])
    assert (got == exp).all()

    def mk():
        toks = sorted({rnd(8).strip() or "x" for _ in range(rng.randint(0, 5))})
        return toks, [round(rng.uniform(0.1, 5.0), 6) for _ in toks]

    TA, WA, TB, WB = [], [], [], []
    for _ in range(2000):
        t1, w1 = mk()
        t2, w2 = mk()
        TA.append(t1), WA.append(w1), TB.append(t2), WB.append(w2)
    TA.append(None), WA.append(None), TB.append(["a"]), WB.append([1.0])
    got = batch_soft_tfidf(TA, WA, TB, WB)
    exp = np.array(
        [soft_tfidf(TA[i], WA[i], TB[i], WB[i]) for i in range(len(TA))]
    )
    assert (got == exp).all()
