"""Blocking stage: key normalization + candidate-pair generation.

The reference's fuzzy query with a pinned prefix (``samePrefixLen``,
fst.cpp:530-553) *is* a blocking key: only keys sharing the prefix are
compared.  At web scale a single prefix block is both too coarse (hot
hosts) and too brittle (typos in the first chars escape the block), so
the default candidate generator is segment/pigeonhole blocking
(operators/passjoin): every key within edit distance k <= 2 of another
shares one exactly-matching segment, found by a plain equi-join on O(1)
signature rows per key; deletion-neighborhood signatures
(operators/dictionary.variant_sigs) remain as the high-precision option
for short keys.

Skew design (the story the reference never needed, SURVEY.md §7.4):
explicit per-signature frequency caps bound the quadratic blow-up of
degenerate blocks and are *observable* via the metrics tables, never
silent; AQE's skew-join splits oversized-but-legitimate join partitions
at runtime.  Salting is deliberately NOT used for candidate generation —
salting a hot signature group would require cross-salt-bucket joins to
stay complete (defeating the point); capping + AQE is the correct
mechanism when in-group pair completeness matters.

All plan-side logic is Catalyst expressions; Python appears only in the
Arrow-batched OSA verify over near-pairs that survive the JVM banded
Levenshtein prefilter.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..functions.distance import batch_levenshtein
from ..functions.normalize import HOST_RE, norm_key
from ..operators.dictionary import (
    _variants_df,
    _verified_pairs,
    grouped_self_candidates,
    variant_sigs,
)
from ..operators.passjoin import passjoin_self_candidates

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
    algo: str = "passjoin",
    sig_scheme: str = "full",
    sig_window: int = 16,
) -> DataFrame:
    """Candidate url pairs whose norm_keys are within edit distance k.

    Plan: distinct keys -> signature explode (JVM-side) -> equi-join /
    in-group pair explode -> distinct key pairs -> vectorized banded-DP
    verify -> join urls back.

    ``algo`` picks the blocking signature family (both exact for k<=2):
      'passjoin'  segment/pigeonhole blocking (operators/passjoin):
                  ~40 signature rows per key *independent of key
                  length* — the default and the scheme that survives
                  10^12 long web keys.
      'deletes'   deletion-neighborhood signatures
                  (dictionary.variant_sigs, ``sig_scheme``/'window'
                  ``sig_window`` control full vs windowed deletes):
                  O(len²) rows/key but the tightest precision; right
                  for short keys (word dictionaries).

    ``sig_cap`` drops signatures shared by more than cap keys (a
    degenerate block would contribute O(cap²) pairs); dropped mass is
    observable via ``blocking_metrics``/``passjoin_metrics``.  Returns
    (key_a, key_b, dist) over *keys*; join back to urls downstream so the
    quadratic work happens on distinct keys, not urls.
    """
    # all heavy shuffles move 8-byte ids, not key strings: keys get an
    # xxhash64 id (collisions at realistic key counts are ~2^-64·n²/2 and
    # only ever produce extra verify work after the id->key join-back,
    # never a wrong pair, since pairs are DP-verified on the strings)
    # distinct() already hash-distributes on key — no extra repartition
    keys = (
        normalized.select(F.col("norm_key").alias("key"))
        .filter(F.length("norm_key") > 0)
        .distinct()
    )
    keymap = keys.select("key", F.xxhash64("key").alias("kid"))

    if algo == "passjoin":
        cand_ids = passjoin_self_candidates(
            keymap, k=k, max_len=max_len, sig_cap=sig_cap
        )
    elif algo == "deletes":
        variants = variant_sigs(
            keymap, "key", k, max_len, scheme=sig_scheme, window=sig_window
        ).select(F.col("kid").alias("key"), "sig")
        # single-shuffle candidate generation: groupBy(sig) + in-group
        # pair explode over (long sig, long id) rows, skew-capped groups
        cand_ids = grouped_self_candidates(variants, sig_cap)
    else:
        raise ValueError(f"unknown blocking algo: {algo}")
    # id -> key join-back.  No broadcast hint: building a broadcast of a
    # large keymap is a *serial* driver cost that caps scaling (measured:
    # ~2x wall on a 1M-key run); AQE picks broadcast when the keymap is
    # genuinely small and a parallel shuffle join otherwise.
    cand = (
        cand_ids.join(
            keymap.select(F.col("kid").alias("key_a"), F.col("key").alias("ka")),
            "key_a",
        )
        .join(
            keymap.select(F.col("kid").alias("key_b"), F.col("key").alias("kb")),
            "key_b",
        )
        .select(
            F.least("ka", "kb").alias("key_a"), F.greatest("ka", "kb").alias("key_b")
        )
    )

    # exact verify: JVM banded Levenshtein (plain k, or 2k prefilter +
    # vectorized OSA for damerau) — see dictionary._verified_pairs
    return _verified_pairs(cand, k, damerau)


def blocking_metrics(normalized: DataFrame, k: int = 2, max_len: int = 96) -> DataFrame:
    """Per-signature block-size stats (keys per signature) — the skew
    observability table (mirrors the reference sorter's line counters,
    large_file_sorter.h:139-141)."""
    return (
        _variants_df(normalized, "norm_key", k, max_len)
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
