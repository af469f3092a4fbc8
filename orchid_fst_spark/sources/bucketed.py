"""Bucketed-table helpers: co-located joins without a shuffle.

At 100 TB the dominant recurring cost of the ER pipeline is the shuffle
of (key, id) frames onto their join keys.  When the same dictionary /
key store is joined repeatedly (nightly incremental runs, repeated
fuzzy-join batches against a stable reference table), persisting it
BUCKETED by the join key pays the shuffle once at write time:
``bucketBy(n, key)`` + ``sortBy(key)`` records the hash-partitioning in
the table metadata, and every later equi-join or aggregation on ``key``
against a table bucketed the same way runs with NO Exchange on either
side (Catalyst recognizes the output partitioning as satisfying the
join's distribution requirement; see the plan assertion in
tests/test_bucketed.py).

This is the persistent-table twin of the index artifact in
operators/index.py: the index serves point/fuzzy lookups off a frozen
DAG; the bucketed table serves JOIN-shaped reuse of the same keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed+sorted managed table (overwrites)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    w = w.sortBy(*(sort_cols or bucket_cols))
    w.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
