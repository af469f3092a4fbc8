"""Pages-table source/sink — Iceberg-first with a parquet fallback.

The target deployment (BASELINE.json ``north_rule``) reads the
Common-Crawl-style pages table — (url string, warc_ts timestamp,
html binary, text string, lang string) — from an Iceberg table, which
gives the scan partition pruning + min-max file skipping (the scale
analog of the reference FST's SeekMin/ExceededBy bound seek,
fst.cpp:428-468) plus snapshot isolation for exact resume.  This
sandbox ships no Iceberg runtime jar, so the source is format-gated:
``iceberg:`` table identifiers use the Iceberg DataSource when loadable,
everything else is a plain parquet path — same DataFrame out, identical
downstream plan either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)

ICEBERG_PREFIX = "iceberg:"


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg DataSource is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def read_pages(spark: SparkSession, source: str, fmt: str = "auto") -> DataFrame:
    """Load the pages table.

    ``source``: an ``iceberg:catalog.db.table`` identifier or a parquet
    path/glob.  ``fmt``: 'auto' | 'iceberg' | 'parquet'.  The returned
    frame is column-pruned to the pages schema so downstream projection
    pushdown starts from the canonical five columns.
    """
    if fmt == "auto":
        fmt = "iceberg" if source.startswith(ICEBERG_PREFIX) else "parquet"
    if fmt == "iceberg":
        table = source[len(ICEBERG_PREFIX):] if source.startswith(ICEBERG_PREFIX) else source
        if not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg DataSource not on the classpath; submit with "
                "--packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13 "
                "and a catalog config, or pass a parquet path"
            )
        df = spark.read.format("iceberg").load(table)
    else:
        df = spark.read.schema(PAGES_SCHEMA).parquet(source)
    return df.select([f.name for f in PAGES_SCHEMA.fields])


def write_table(df: DataFrame, target: str, fmt: str = "auto", mode: str = "overwrite") -> None:
    """Write a result/checkpoint table to Iceberg (``iceberg:`` target)
    or parquet.  Iceberg writes use ``writeTo`` (v2, atomic replace) so a
    resumed run never observes a half-written stage."""
    if fmt == "auto":
        fmt = "iceberg" if target.startswith(ICEBERG_PREFIX) else "parquet"
    if fmt == "iceberg":
        table = target[len(ICEBERG_PREFIX):] if target.startswith(ICEBERG_PREFIX) else target
        w = df.writeTo(table)
        (w.createOrReplace() if mode == "overwrite" else w.append())
    else:
        df.write.mode(mode).parquet(target)
