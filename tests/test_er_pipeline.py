"""End-to-end ER golden tests (FIXTURES.md F4): planted duplicate
clusters -> resolve -> pairwise F1 >= 0.99 vs truth, byte-identical
text pass-through, deterministic + resumable output."""

import pytest
from pyspark.sql import functions as F

from orchid_fst_spark.er import (
    connected_components,
    pairwise_f1,
    resolve,
)
from orchid_fst_spark.er.blocking import blocking_metrics, normalize_pages
from orchid_fst_spark.sources.fixtures import gen_pages

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


@pytest.fixture(scope="module")
def pages_and_truth(spark):
    pages, truth = gen_pages(n_clusters=150, seed=42)
    pdf = spark.createDataFrame(pages, PAGES_SCHEMA).cache()
    tdf = spark.createDataFrame(truth, "url string, cluster_id long").cache()
    return pdf, tdf


def test_connected_components_chain_and_star(spark):
    # chain a-b-c-d plus isolated pair x-y: CC must label by min node
    edges = spark.createDataFrame(
        [("b", "a"), ("b", "c"), ("c", "d"), ("x", "y"), ("d", "d")],
        "src string, dst string",
    )
    got = {
        (r.node, r.component) for r in connected_components(edges).collect()
    }
    assert got == {
        ("a", "a"), ("b", "a"), ("c", "a"), ("d", "a"), ("x", "x"), ("y", "x"),
    }


def test_connected_components_long_chain(spark):
    n = 64
    edges = spark.createDataFrame(
        [(f"n{i:03d}", f"n{i+1:03d}") for i in range(n)], "src string, dst string"
    )
    comps = connected_components(edges).collect()
    assert {r.component for r in comps} == {"n000"}
    assert len(comps) == n + 1


def test_resolve_f1(spark, pages_and_truth):
    pages, truth = pages_and_truth
    pred = resolve(pages, k=2, damerau=True)
    m = pairwise_f1(pred, truth)
    assert m["f1"] >= 0.99, m
    assert m["precision"] == 1.0, m  # separation guarantee -> no false merges


def test_text_byte_identical(spark, pages_and_truth):
    pages, _ = pages_and_truth
    pred = resolve(pages, k=2)
    joined = pages.alias("p").join(pred.alias("r"), "url")
    # text column is carried from the source only; verify pass-through by
    # re-joining and comparing to the original values
    n_bad = (
        joined.join(pages.select("url", F.col("text").alias("text0")), "url")
        .filter(F.col("text") != F.col("text0"))
        .count()
    )
    assert n_bad == 0
    assert pred.count() == pages.count()


def test_resolve_deterministic(spark, pages_and_truth):
    pages, _ = pages_and_truth
    a = sorted((r.url, r.cluster_id) for r in resolve(pages, k=2).collect())
    b = sorted((r.url, r.cluster_id) for r in resolve(pages, k=2).collect())
    assert a == b


def test_resolve_checkpoint_resume(spark, pages_and_truth, tmp_path):
    pages, truth = pages_and_truth
    ck = str(tmp_path / "ck")
    first = sorted(
        (r.url, r.cluster_id)
        for r in resolve(pages, k=2, checkpoint_dir=ck).collect()
    )
    # resumed run must reuse every stage and reproduce identical output
    resumed = sorted(
        (r.url, r.cluster_id)
        for r in resolve(pages, k=2, checkpoint_dir=ck, resume=True).collect()
    )
    assert first == resumed
    metrics = spark.read.parquet(f"{ck}/metrics")
    rows = {r.stage: r.resumed for r in metrics.collect()}
    assert rows["candidate_pairs"] is True
    assert rows["match_edges"] is True


def test_blocking_metrics(spark, pages_and_truth):
    pages, _ = pages_and_truth
    m = blocking_metrics(normalize_pages(pages)).collect()[0]
    assert m.n_signatures > 0
    assert m.max_block >= 1


def test_sig_cap_observable_recall_loss(spark, pages_and_truth):
    pages, truth = pages_and_truth
    # deletes scheme: cap=1 drops every shared signature -> recall 0
    pred = resolve(pages, k=2, sig_cap=1, algo="deletes")
    m = pairwise_f1(pred, truth)
    assert m["recall"] == 0.0
    # passjoin: cap=1 drops every multi-key index group; only pairs with
    # a singleton index group (unequal lengths) can survive -> recall
    # strictly below the uncapped run, never silently complete
    pred_pj = resolve(pages, k=2, sig_cap=1, algo="passjoin")
    full = resolve(pages, k=2, algo="passjoin")
    m_pj = pairwise_f1(pred_pj, truth)
    m_full = pairwise_f1(full, truth)
    assert m_pj["recall"] < m_full["recall"]
