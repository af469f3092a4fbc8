"""Blocking stage: key normalization + candidate-pair generation.

The reference's fuzzy query with a pinned prefix (``samePrefixLen``,
fst.cpp:530-553) *is* a blocking key: only keys sharing the prefix are
compared.  At web scale a single prefix block is both too coarse (hot
hosts) and too brittle (typos in the first chars escape the block), so
the default candidate generator here is the deletion-neighborhood
signature join (operators/dictionary.fuzzy_self_pairs): every key within
edit distance k <= 2 of another key shares at least one signature, the
join is a plain shuffle on the signature, and AQE's skew-join handles hot
signatures.  A per-signature frequency cap bounds the quadratic blow-up
of degenerate blocks (the skew story the reference never needed,
SURVEY.md §7.4) — capped signatures are counted in the metrics so recall
loss is observable, never silent.

All plan-side logic is Catalyst expressions; Python only inside the
Arrow-batched signature/verify UDFs.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..automata.trie import deletion_variants
from ..functions.distance import batch_levenshtein
from ..functions.normalize import HOST_RE, norm_key

# path (title) part of a URL: everything between host and ?/#
PATH_RE = "^[a-z][a-z0-9+.-]*://[^/?#]+/([^?#]*)"
TITLE_RE = "<title>([^<]*)</title>"


def normalize_pages(pages: DataFrame, use_html_title: bool = False) -> DataFrame:
    """Add ``host``, ``title_key`` and the blocking ``norm_key`` (host +
    '/' + normalized title).  ``text`` is carried through untouched
    (byte-identical invariant).  Pure Catalyst — inlines into the scan."""
    host = F.regexp_extract("url", HOST_RE, 1)
    if use_html_title:
        title = F.regexp_extract(F.col("html").cast("string"), TITLE_RE, 1)
        title = F.when(F.length(title) > 0, title).otherwise(
            F.regexp_extract("url", PATH_RE, 1)
        )
    else:
        title = F.regexp_extract("url", PATH_RE, 1)
    return (
        pages.withColumn("host", F.lower(host))
        .withColumn("title_key", norm_key(title))
        .withColumn("norm_key", F.concat_ws("/", F.lower(host), norm_key(title)))
    )


def candidate_pairs(
    normalized: DataFrame,
    k: int = 2,
    max_len: int = 96,
    sig_cap: int = 1000,
    damerau: bool = True,
) -> DataFrame:
    """Candidate url pairs whose norm_keys are within edit distance k.

    Plan: distinct keys -> explode deletion signatures (mapInPandas) ->
    self equi-join on signature (shuffle; AQE skew-join) -> distinct key
    pairs -> vectorized banded-DP verify -> join urls back.

    ``sig_cap`` drops signatures shared by more than cap keys (a
    degenerate block would contribute O(cap²) pairs); dropped mass is
    observable via ``blocking_metrics``.  Returns
    (key_a, key_b, dist) over *keys*; join back to urls downstream so the
    quadratic work happens on distinct keys, not urls.
    """
    keys = normalized.select(F.col("norm_key").alias("key")).distinct()

    sig_schema = StructType(
        [StructField("key", StringType()), StructField("sig", StringType())]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ks: list[str] = []
            sigs: list[str] = []
            for s in pdf["key"].tolist():
                if not s:
                    continue
                for v in deletion_variants(s, k, max_len):
                    ks.append(s)
                    sigs.append(v)
            yield pd.DataFrame({"key": ks, "sig": sigs})

    variants = keys.mapInPandas(gen, schema=sig_schema)

    # skew guard: drop signatures hotter than the cap (observable, not
    # silent).  The hot-signature list is tiny, so it broadcasts and the
    # filter is a map-side anti-join — no extra shuffle of the variants.
    hot_sigs = (
        variants.groupBy("sig")
        .agg(F.count("*").alias("sig_n"))
        .filter(F.col("sig_n") > sig_cap)
        .select("sig")
    )
    variants = variants.join(F.broadcast(hot_sigs), "sig", "left_anti")

    a = variants.select(F.col("key").alias("key_a"), "sig")
    b = variants.select(F.col("key").alias("key_b"), "sig")
    cand = (
        a.join(b, "sig")
        .filter(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b")
        .distinct()
    )

    out_schema = StructType(
        [
            StructField("key_a", StringType()),
            StructField("key_b", StringType()),
            StructField("dist", LongType()),
        ]
    )

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            d = batch_levenshtein(
                pdf["key_a"].tolist(),
                pdf["key_b"].tolist(),
                clamp=k,
                transpositions=damerau,
            )
            res = pdf[["key_a", "key_b"]].copy()
            res["dist"] = d
            yield res[res["dist"] <= k]

    return cand.mapInPandas(verify, schema=out_schema)


def blocking_metrics(normalized: DataFrame, k: int = 2, max_len: int = 96) -> DataFrame:
    """Per-signature block-size stats (keys per signature) — the skew
    observability table (mirrors the reference sorter's line counters,
    large_file_sorter.h:139-141)."""
    keys = normalized.select(F.col("norm_key").alias("key")).distinct()

    sig_schema = StructType(
        [StructField("key", StringType()), StructField("sig", StringType())]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ks, sigs = [], []
            for s in pdf["key"].tolist():
                if not s:
                    continue
                for v in deletion_variants(s, k, max_len):
                    ks.append(s)
                    sigs.append(v)
            yield pd.DataFrame({"key": ks, "sig": sigs})

    return (
        keys.mapInPandas(gen, schema=sig_schema)
        .groupBy("sig")
        .agg(F.count("*").alias("block_size"))
        .agg(
            F.count("*").alias("n_signatures"),
            F.max("block_size").alias("max_block"),
            F.avg("block_size").alias("avg_block"),
            F.sum(F.col("block_size") * (F.col("block_size") - 1) / 2).alias(
                "candidate_pairs_upper_bound"
            ),
        )
    )
