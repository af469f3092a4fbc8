"""Sketch-family tests: HyperLogLog accuracy/merge, Count-Min
overestimate/merge, URL canonicalization, bigram LM scoring sanity."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from orchid_fst_spark.functions.normalize import canonical_url  # noqa: E402
from orchid_fst_spark.operators.ranking import lm_doc_logprob  # noqa: E402
from orchid_fst_spark.operators.sketch import (  # noqa: E402
    cms_lookup,
    cms_sketch,
    hll_error_bound,
    hll_estimate,
    hll_registers,
    hll_summary,
)


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n", [200, 5000])
def test_hll_accuracy(spark, n):
    df = spark.range(n).select(F.concat(F.lit("v"), F.col("id")).alias("v"))
    est = hll_estimate(hll_summary(hll_registers(df, "v", p=9), p=9), p=9)
    got = est.collect()[0]["est"]
    # 5 standard errors of the published bound — deterministic hashes,
    # so this is a fixed fact about the seed, not a flaky draw
    assert abs(got - n) / n < 5 * hll_error_bound(9)


def test_hll_duplicates_dont_count(spark):
    uniq = spark.range(300).select(F.concat(F.lit("u"), F.col("id")).alias("v"))
    dup = uniq.union(uniq).union(uniq)
    a = hll_summary(hll_registers(uniq, "v"), p=9).collect()[0]
    b = hll_summary(hll_registers(dup, "v"), p=9).collect()[0]
    assert a.asDict() == b.asDict()


def test_hll_merge_by_max(spark):
    """Registers of a union == per-slice registers merged by max —
    the property that makes day-over-day incremental counting work."""
    s1 = spark.range(0, 400).select(F.concat(F.lit("k"), F.col("id")).alias("v"))
    s2 = spark.range(200, 700).select(F.concat(F.lit("k"), F.col("id")).alias("v"))
    whole = hll_registers(s1.union(s2), "v", p=8)
    merged = (
        hll_registers(s1, "v", p=8)
        .union(hll_registers(s2, "v", p=8))
        .groupBy("register")
        .agg(F.max("rho").alias("rho"))
    )
    assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))


def test_hll_p_validation(spark):
    df = spark.range(3).select(F.col("id").cast("string").alias("v"))
    with pytest.raises(ValueError):
        hll_registers(df, "v", p=2)


# ---------------------------------------------------------------------------
# Count-Min
# ---------------------------------------------------------------------------


def test_cms_never_underestimates(spark):
    # planted zipf-ish frequencies: term t_i appears i times
    rows = [(f"t{i}",) for i in range(1, 40) for _ in range(i)]
    df = spark.createDataFrame(rows, "term string")
    sk = cms_sketch(df, "term", depth=4, width=64)  # narrow -> collisions
    est = {r["term"]: r["est"] for r in cms_lookup(
        sk, [f"t{i}" for i in range(1, 40)], depth=4, width=64).collect()}
    for i in range(1, 40):
        assert est[f"t{i}"] >= i


def test_cms_exact_when_wide(spark):
    rows = [(f"t{i}",) for i in range(1, 20) for _ in range(i)]
    df = spark.createDataFrame(rows, "term string")
    sk = cms_sketch(df, "term", depth=4, width=4096)
    est = {r["term"]: r["est"] for r in cms_lookup(
        sk, [f"t{i}" for i in range(1, 20)], depth=4, width=4096).collect()}
    assert est == {f"t{i}": i for i in range(1, 20)}


def test_cms_merge_by_sum(spark):
    s1 = spark.createDataFrame([("a",)] * 5 + [("b",)] * 2, "term string")
    s2 = spark.createDataFrame([("a",)] * 3 + [("c",)] * 4, "term string")
    whole = cms_sketch(s1.union(s2), "term", depth=3, width=128)
    merged = (
        cms_sketch(s1, "term", depth=3, width=128)
        .union(cms_sketch(s2, "term", depth=3, width=128))
        .groupBy("depth", "bucket")
        .agg(F.sum("c").cast("long").alias("c"))
    )
    assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))
    est = {r["term"]: r["est"] for r in cms_lookup(
        whole, ["a", "b", "c"], depth=3, width=128).collect()}
    assert est == {"a": 8, "b": 2, "c": 4}


def test_cms_bounded_size(spark):
    df = spark.range(10000).select(F.concat(F.lit("t"), F.col("id")).alias("term"))
    sk = cms_sketch(df, "term", depth=4, width=256)
    assert sk.count() <= 4 * 256


# ---------------------------------------------------------------------------
# canonical_url
# ---------------------------------------------------------------------------


CANON_CASES = [
    "HTTPS://WWW.Example.com/A/b/?utm_source=x&q=1#frag",
    "http://example.com/a/b?q=1",
    "https://example.com/a/b/?utm_campaign=z",
    "example.com/plain/",
    "https://www.example.com/?utm_a=1",
    "https://site.org/p?x=1&utm_medium=m&y=2",
    "https://site.org/p?fbclid=abc",
    "ftp://site.org/file",
    "https://site.org",
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame([(u,) for u in CANON_CASES], "url string")
    got = [r["c"] for r in df.select(canonical_url("url").alias("c")).collect()]
    want = [
        "example.com/a/b?q=1",
        "example.com/a/b?q=1",
        "example.com/a/b",
        "example.com/plain",
        "example.com",
        "site.org/p?x=1&y=2",
        "site.org/p",
        "site.org/file",
        "site.org",
    ]
    assert got == want


def test_canonical_url_collapses_variants(spark):
    variants = [
        "https://www.shop.example/item/42",
        "http://shop.example/item/42/",
        "https://shop.example/item/42?utm_source=mail",
        "HTTPS://Shop.example/item/42#reviews",
    ]
    df = spark.createDataFrame([(u,) for u in variants], "url string")
    assert (
        df.select(canonical_url("url").alias("c")).distinct().count() == 1
    )


# ---------------------------------------------------------------------------
# bigram LM scoring
# ---------------------------------------------------------------------------


def test_lm_boilerplate_scores_above_gibberish(spark):
    # 10 identical boilerplate docs + 1 doc of unseen-bigram gibberish:
    # the boilerplate's bigrams dominate the LM, so its avg logprob must
    # be far above the gibberish doc's
    rows = [(i, "terms of service apply to all pages") for i in range(10)]
    rows.append((99, "qq zz xx qq yy aa"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r["avg_logprob"] for r in
           lm_doc_logprob(df, "doc_id", "text").collect()}
    assert got[0] > got[99] + 1.0


def test_lm_short_docs_report_zero(spark):
    df = spark.createDataFrame(
        [(1, "single"), (2, ""), (3, "two tokens")],
        "doc_id long, text string",
    )
    got = {r["id"]: (r["n_bigrams"], r["avg_logprob"]) for r in
           lm_doc_logprob(df, "doc_id", "text").collect()}
    assert got[1] == (0, 0.0)
    assert got[2] == (0, 0.0)
    assert got[3][0] == 1


def test_lm_every_doc_appears_once(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = lm_doc_logprob(docs, "doc_id", "text")
    assert out.count() == docs.count()
    assert out.select("id").distinct().count() == docs.count()


def test_hll_grouped_matches_per_group(spark):
    """A grouped sketch must equal the sketch of each group filtered
    independently."""
    from orchid_fst_spark.operators.sketch import hll_registers, hll_summary

    df = spark.range(600).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.concat(F.lit("v"), (F.col("id") % 250)).alias("v"),
    )
    grouped = {
        r["g"]: (r["m"], r["n_zero"], r["s_num"])
        for r in hll_summary(
            hll_registers(df, "v", p=8, group_cols=["g"]), p=8, group_cols=["g"]
        ).collect()
    }
    for g in ("0", "1", "2"):
        solo = hll_summary(
            hll_registers(df.filter(F.col("g") == g), "v", p=8), p=8
        ).collect()[0]
        assert grouped[g] == (solo["m"], solo["n_zero"], solo["s_num"]), g


def test_bloom_no_false_negatives_and_absent_mostly_clean(spark):
    from orchid_fst_spark.operators.sketch import bloom_probe, bloom_sketch

    df = spark.range(500).select(F.concat(F.lit("key"), "id").alias("v"))
    sk = bloom_sketch(df, "v", m_bits=1 << 14, k_hashes=4).cache()
    present = [f"key{i}" for i in range(0, 500, 37)]
    absent = [f"nope{i}" for i in range(40)]
    got = {
        r.value: r.maybe_present
        for r in bloom_probe(
            sk, present + absent, m_bits=1 << 14, k_hashes=4
        ).collect()
    }
    # one-sided error: EVERY inserted key answers maybe_present
    assert all(got[v] == 1 for v in present)
    # at 500 keys in 16384 bits / 4 hashes the fp rate is ~1e-4 — the
    # deterministic probe set must come back overwhelmingly clean
    assert sum(got[v] for v in absent) <= 2
    sk.unpersist()


def test_bloom_merge_by_bit_or_equals_full_build(spark):
    from orchid_fst_spark.operators.sketch import bloom_sketch

    df = spark.range(400).select(F.concat(F.lit("k"), "id").alias("v"))
    a = bloom_sketch(df.filter(F.col("id") < 200), "v", m_bits=1 << 12)
    b = bloom_sketch(df.filter(F.col("id") >= 200), "v", m_bits=1 << 12)
    merged = {
        r.word: r.bits
        for r in a.unionAll(b)
        .groupBy("word")
        .agg(F.bit_or("bits").alias("bits"))
        .collect()
    }
    full = {
        r.word: r.bits
        for r in bloom_sketch(df, "v", m_bits=1 << 12).collect()
    }
    assert merged == full and len(full) > 0


def test_bloom_partitioning_independent_and_rejects_bad_params(spark):
    import pytest as _pytest

    from orchid_fst_spark.operators.sketch import bloom_sketch

    df = spark.range(300).select(F.concat(F.lit("x"), "id").alias("v"))
    a = sorted(map(tuple, bloom_sketch(df, "v").collect()))
    b = sorted(map(tuple, bloom_sketch(df.repartition(7), "v").collect()))
    assert a == b
    with _pytest.raises(ValueError):
        bloom_sketch(df, "v", m_bits=16)


def test_bloom_probe_duplicate_values_no_false_negative(spark):
    """Regression: a duplicated probe value used to trip the sum==k
    verdict into a false negative; the min-over-bits form is immune and
    the probe list is deduplicated (one row per distinct value)."""
    from orchid_fst_spark.operators.sketch import bloom_probe, bloom_sketch

    df = spark.range(100).select(F.concat(F.lit("key"), "id").alias("v"))
    sk = bloom_sketch(df, "v", m_bits=1 << 12, k_hashes=4)
    got = {
        r.value: r.maybe_present
        for r in bloom_probe(
            sk, ["key1", "key1", "key2", "nope", "nope"],
            m_bits=1 << 12, k_hashes=4,
        ).collect()
    }
    assert got["key1"] == 1 and got["key2"] == 1
    assert len(got) == 3  # deduplicated output


def test_bloom_contains_matches_probe_and_plan_is_map_side(spark):
    from orchid_fst_spark.operators.sketch import (
        bloom_collect,
        bloom_contains,
        bloom_probe,
        bloom_sketch,
    )

    df = spark.range(200).select(F.concat(F.lit("k"), "id").alias("v"))
    sk = bloom_sketch(df, "v", m_bits=1 << 12, k_hashes=4).cache()
    words = bloom_collect(sk, 1 << 12)
    probes = [f"k{i}" for i in range(0, 200, 17)] + [f"absent{i}" for i in range(10)]
    via_probe = {
        r.value: r.maybe_present
        for r in bloom_probe(sk, probes, m_bits=1 << 12, k_hashes=4).collect()
    }
    pf = spark.createDataFrame([(p,) for p in probes], "value string")
    ann = pf.withColumn(
        "m", bloom_contains(F.col("value"), words, m_bits=1 << 12, k_hashes=4)
    )
    via_col = {r.value: r.m for r in ann.collect()}
    assert via_col == via_probe
    # the membership column is pure map-side: no exchange, no Python
    plan = ann._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan
    sk.unpersist()


def test_bloom_contains_guards_and_null_policy(spark):
    import pytest as _pytest

    from orchid_fst_spark.operators.sketch import (
        bloom_collect,
        bloom_contains,
        bloom_sketch,
    )

    df = spark.range(50).select(F.concat(F.lit("k"), "id").alias("v"))
    sk = bloom_sketch(df, "v", m_bits=1 << 12, k_hashes=4)
    words = bloom_collect(sk, 1 << 12)
    # mismatched m_bits vs word-list length raises loudly
    with _pytest.raises(ValueError):
        bloom_contains(F.col("v"), words, m_bits=1 << 16, k_hashes=4)
    # NULL values answer 0 (definitely not inserted), never NULL
    pf = spark.createDataFrame([("k1",), (None,)], "value string")
    got = {
        r.value: r.m
        for r in pf.withColumn(
            "m", bloom_contains(F.col("value"), words, m_bits=1 << 12)
        ).collect()
    }
    assert got["k1"] == 1 and got[None] == 0
