"""Quality-gate tests: every flag fires on a planted document and the
keep rule is the conjunction of all of them."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from orchid_fst_spark.operators.cleaning import quality_gate  # noqa: E402


@pytest.fixture(scope="module")
def planted(spark):
    normal = "the quick brown fox jumps over the lazy dog near the riverbank today"
    rows = [
        (1, normal),                                  # clean
        (2, "too short"),                             # flag_short
        (3, " ".join(f"w{i % 97}" for i in range(600))),  # flag_long
        (4, "spam " * 40 + "spam"),                   # flag_repetitive (1 distinct)
        (5, "leaked benchmark question about rivers and foxes in autumn rain"),
        (6, normal),                                  # flag_exact_dup of 1
        (7, "zz qq xx vv kk jj pp ww mm nn oo rr tt uu yy aa bb cc dd ee"),  # gibberish
    ] + [
        # filler docs so the LM has a typical-language mass and the
        # 10th-percentile threshold separates the gibberish doc
        (100 + i, normal + f" extra words number {i % 5} appear here")
        for i in range(20)
    ]
    bench = spark.createDataFrame(
        [("benchmark question about rivers and foxes in autumn",)], "text string"
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return docs, bench


def test_every_flag_fires(spark, planted):
    docs, bench = planted
    out = {
        r["id"]: r.asDict()
        for r in quality_gate(
            docs, bench,
            min_tokens=5, max_tokens=100, max_dup_token_frac=0.8,
            ngram=5, lm_quantile=0.1,
        ).collect()
    }
    assert len(out) == docs.count()
    assert out[2]["flag_short"] == 1
    assert out[3]["flag_long"] == 1
    assert out[4]["flag_repetitive"] == 1
    assert out[5]["flag_contaminated"] == 1
    assert out[7]["flag_lm_low"] == 1
    assert out[6]["flag_exact_dup"] == 1 and out[1]["flag_exact_dup"] == 0
    assert out[1]["keep"] == 1
    for i in (2, 3, 4, 5, 6, 7):
        assert out[i]["keep"] == 0, i


def test_keep_is_conjunction(spark, planted):
    docs, bench = planted
    for r in quality_gate(docs, bench, min_tokens=5, max_tokens=100).collect():
        flags = [v for k, v in r.asDict().items() if k.startswith("flag_")]
        assert r["keep"] == (1 if all(v == 0 for v in flags) else 0)


def test_fixed_lm_threshold_is_map_only(spark, planted):
    """Passing lm_threshold skips the corpus percentile (the 100 TB
    path) and flags exactly the docs below the given value."""
    docs, bench = planted
    scored = quality_gate(docs, bench, lm_threshold=-100.0)
    assert scored.agg(F.sum("flag_lm_low")).collect()[0][0] == 0


def test_null_text_is_short_singleton(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, None), (3, "a real document with enough tokens here")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([("nothing",)], "text string")
    out = {r["id"]: r.asDict() for r in quality_gate(docs, bench).collect()}
    assert len(out) == 3
    # NULL texts are their own singletons — never exact-dups of each other
    assert out[1]["flag_exact_dup"] == 0 and out[2]["flag_exact_dup"] == 0
    assert out[1]["flag_short"] == 1 and out[1]["n_tokens"] == 0


def test_custom_column_names(spark):
    docs = spark.createDataFrame(
        [(1, "a real document with plenty of distinct tokens to pass")],
        "pk long, body string",
    )
    bench = spark.createDataFrame([("nothing here",)], "text string")
    out = quality_gate(docs, bench, id_col="pk", text_col="body").collect()
    assert len(out) == 1 and out[0]["id"] == 1
