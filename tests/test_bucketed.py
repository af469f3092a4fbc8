"""Bucketed co-located joins: the write-once shuffle removes the
per-join Exchange (sources/bucketed.py)."""

from pyspark.sql import functions as F

from orchid_fst_spark.sources.bucketed import read_table, write_bucketed


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.range(0, 5000).select(
            F.concat(F.lit("k"), F.col("id")).alias("key"),
            F.col("id").alias("va"),
        )
        b = spark.range(0, 5000, 3).select(
            F.concat(F.lit("k"), F.col("id")).alias("key"),
            F.col("id").alias("vb"),
        )
        write_bucketed(a, "bk_a", ["key"], n_buckets=8)
        write_bucketed(b, "bk_b", ["key"], n_buckets=8)
        ta, tb = read_table(spark, "bk_a"), read_table(spark, "bk_b")

        joined = ta.join(tb, "key")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # co-located: no shuffle either side

        # and a groupBy on the bucket key needs no exchange either
        agg_plan = (
            ta.groupBy("key")
            .agg(F.sum("va"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in agg_plan

        # correctness unchanged vs the shuffled join
        exp = a.join(b, "key").count()
        assert joined.count() == exp

        # contrast: the plain parquet frames DO exchange
        plain = a.join(b, "key")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bk_a")
        spark.sql("DROP TABLE IF EXISTS bk_b")
