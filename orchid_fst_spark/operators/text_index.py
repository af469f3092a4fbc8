"""Persisted positional inverted-index artifact: build once, serve
phrase / boolean / term queries many times off a term-bucketed parquet
layout — the build-once/query-many discipline of the FST artifact
(`operators/index.py`, mirroring the reference's mmap'd index file,
fst_cmd.cpp:174-177) applied to the token-search surface.

Layout: postings (doc_id, pos, term) are hashed into ``n_buckets``
partitions (`bucket = pmod(xxhash64(term), n_buckets)`) and written
``partitionBy("bucket")``, sorted by term within each file.  A query
for k terms therefore
  1. prunes to at most k bucket DIRECTORIES at planning time (literal
     `bucket IN (...)` on the partition column — nothing else is even
     listed), and
  2. pushes `term IN (...)` into the parquet scan, where the per-file
     term ordering makes row-group min/max stats selective.
At 100 TB a phrase query reads a few buckets' worth of postings instead
of re-tokenizing the corpus — the same scan-vs-artifact trade the FST
index makes for fuzzy lookups.

The bucket count is recorded in a ``_n_buckets`` file inside the
artifact (underscore-prefixed → invisible to parquet discovery, like
``_SUCCESS``), so queries recompute each term's bucket with the exact
build-time mapping.  Like the FST artifact, paths must be absolute
local/shared-filesystem paths (asserted at build/load).
"""

from __future__ import annotations

import os
from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession, functions as F

from .search import postings


class TextIndex(NamedTuple):
    path: str
    n_buckets: int


def _check_path(path: str) -> str:
    if "://" in path:
        raise ValueError(
            "text index artifacts require plain filesystem paths "
            "(URI schemes are not openable for the _n_buckets sidecar)"
        )
    return os.path.abspath(path)


def build_text_index(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    path: str,
    n_buckets: int = 64,
) -> None:
    """Write the term-bucketed positional-postings artifact.  One
    shuffle (hash on bucket) + a per-partition term sort; every bucket's
    postings land in term-ordered parquet row groups under their own
    ``bucket=`` directory."""
    path = _check_path(path)
    p = postings(docs, id_col, text_col).withColumn(
        "bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets))
    )
    (
        p.repartition(n_buckets, "bucket")
        .sortWithinPartitions("bucket", "term")
        .write.mode("error")
        .partitionBy("bucket")
        .parquet(path)
    )
    with open(os.path.join(path, "_n_buckets"), "w") as f:
        f.write(str(n_buckets))


def load_text_index(spark: SparkSession, path: str) -> TextIndex:
    """Validate the artifact (must carry _SUCCESS and the _n_buckets
    sidecar) and return its handle.  No data is read."""
    path = _check_path(path)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        raise FileNotFoundError(f"no published text index at {path}")
    with open(os.path.join(path, "_n_buckets")) as f:
        return TextIndex(path, int(f.read().strip()))


def _term_buckets(
    spark: SparkSession, idx: TextIndex, terms: list[str]
) -> dict[str, int]:
    """Each term's bucket under the build-time mapping, computed with
    the same JVM xxhash64 (one |terms|-row local job — bounded by the
    query size, never the corpus)."""
    rows = (
        spark.createDataFrame([(t,) for t in terms], "term string")
        .select(
            "term",
            F.pmod(F.xxhash64("term"), F.lit(idx.n_buckets)).alias("b"),
        )
        .collect()
    )
    return {r.term: r.b for r in rows}


def indexed_postings(
    spark: SparkSession, idx: TextIndex, terms: list[str]
) -> DataFrame:
    """Postings of ``terms`` off the artifact: literal bucket IN-list →
    partition-directory pruning; term IN-list → parquet row-group
    pruning via the per-file term sort."""
    terms = sorted(set(terms))
    if not terms:
        raise ValueError("terms must be non-empty")
    buckets = sorted(set(_term_buckets(spark, idx, terms).values()))
    return (
        spark.read.parquet(idx.path)
        .filter(F.col("bucket").isin(buckets))
        .filter(F.col("term").isin(terms))
        .select("doc_id", "pos", "term")
    )


def indexed_phrase_search(
    spark: SparkSession, idx: TextIndex, phrase: list[str]
) -> DataFrame:
    """Exact token-phrase matches served from the artifact; identical
    semantics and output to ``search.phrase_search`` (doc_id,
    n_matches), but the corpus is never re-tokenized — only the phrase
    terms' buckets are scanned."""
    if not phrase:
        raise ValueError("phrase must be non-empty")
    p = indexed_postings(spark, idx, phrase)
    out = None
    for i, term in enumerate(phrase):
        side = p.filter(F.col("term") == term).select(
            "doc_id", (F.col("pos") - i).alias("anchor")
        )
        out = side if out is None else out.join(side, ["doc_id", "anchor"])
    return out.groupBy("doc_id").agg(F.count("*").alias("n_matches"))


def indexed_boolean_search(
    spark: SparkSession,
    idx: TextIndex,
    must: list[str],
    must_not: list[str] | None = None,
) -> DataFrame:
    """AND / AND-NOT retrieval off the artifact; identical semantics to
    ``search.boolean_search``."""
    if not must:
        raise ValueError("must terms required")
    must_set = sorted(set(must))
    not_set = sorted(set(must_not or []))
    hits = (
        indexed_postings(spark, idx, must_set + not_set)
        .select("doc_id", "term")
        .distinct()
    )
    keep = (
        hits.filter(F.col("term").isin(must_set))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit"))
        .filter(F.col("n_hit") == len(must_set))
        .select("doc_id")
    )
    if not_set:
        bad = hits.filter(F.col("term").isin(not_set)).select("doc_id").distinct()
        keep = keep.join(bad, "doc_id", "left_anti")
    return keep
