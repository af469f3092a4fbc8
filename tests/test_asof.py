"""asof_join tests: differential vs DuckDB's native ASOF JOIN on the
testdata events, plus edge cases (tolerance, forward direction, empty
right side, equal-timestamp inclusivity, no-match rows) and a plan
assertion (one key shuffle, no range self-join)."""

import datetime as dt
import os
import sys

import duckdb
import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from orchid_fst_spark.operators.asof import asof_join  # noqa: E402


def _sides(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    left = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    right = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("r_id"))
    )
    return left, right


def _duck(sf_dir, op):
    return duckdb.sql(f"""
WITH l AS (SELECT event_id, user_id, ts
           FROM '{sf_dir}/events.parquet' WHERE event_type = 'click'),
r AS (SELECT user_id, ts, max(event_id) AS r_id
      FROM '{sf_dir}/events.parquet' WHERE event_type = 'view'
      GROUP BY user_id, ts)
SELECT l.event_id, r.ts, r.r_id
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts {op} r.ts
ORDER BY l.event_id""").fetchall()


def test_backward_matches_duckdb_asof(spark, sf_dir):
    left, right = _sides(spark, sf_dir)
    got = [
        (r["event_id"], r["ts_r"], r["r_id_r"])
        for r in asof_join(left, right, ["user_id"], "ts", "ts", ["r_id"])
        .orderBy("event_id")
        .collect()
    ]
    assert got == [tuple(r) for r in _duck(sf_dir, ">=")]
    assert any(r[2] is not None for r in got)  # non-trivial matches exist


def test_forward_matches_duckdb_asof(spark, sf_dir):
    left, right = _sides(spark, sf_dir)
    got = [
        (r["event_id"], r["ts_r"], r["r_id_r"])
        for r in asof_join(
            left, right, ["user_id"], "ts", "ts", ["r_id"],
            direction="forward",
        )
        .orderBy("event_id")
        .collect()
    ]
    assert got == [tuple(r) for r in _duck(sf_dir, "<=")]


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_equal_ts_inclusive_and_no_match(spark):
    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = _mk(
        spark,
        [(1, "k", t), (2, "k", t - dt.timedelta(hours=2)), (3, "x", t)],
        "event_id long, k string, ts timestamp",
    )
    right = _mk(
        spark, [("k", t, 100)], "k string, ts timestamp, r_id long"
    )
    out = {
        r["event_id"]: r["r_id_r"]
        for r in asof_join(left, right, ["k"], "ts", "ts", ["r_id"]).collect()
    }
    assert out[1] == 100      # equal timestamp matches (inclusive)
    assert out[2] is None     # right row is in the future
    assert out[3] is None     # key never appears on the right
    assert len(out) == 3      # left rows preserved exactly


def test_tolerance_voids_stale_matches(spark):
    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = _mk(
        spark,
        [(1, "k", t), (2, "k", t + dt.timedelta(days=2))],
        "event_id long, k string, ts timestamp",
    )
    right = _mk(
        spark,
        [("k", t - dt.timedelta(minutes=30), 7)],
        "k string, ts timestamp, r_id long",
    )
    out = {
        r["event_id"]: (r["r_id_r"], r["ts_r"])
        for r in asof_join(
            left, right, ["k"], "ts", "ts", ["r_id"],
            tolerance=F.expr("INTERVAL 1 HOUR"),
        ).collect()
    }
    assert out[1][0] == 7
    assert out[2] == (None, None)  # match exists but is too stale


def test_empty_right_side(spark):
    t = dt.datetime(2024, 1, 1)
    left = _mk(spark, [(1, "k", t)], "event_id long, k string, ts timestamp")
    right = _mk(spark, [], "k string, ts timestamp, r_id long")
    rows = asof_join(left, right, ["k"], "ts", "ts", ["r_id"]).collect()
    assert len(rows) == 1 and rows[0]["r_id_r"] is None


def test_plan_one_key_shuffle_no_range_join(spark, sf_dir):
    left, right = _sides(spark, sf_dir)
    plan = (
        asof_join(left, right, ["user_id"], "ts", "ts", ["r_id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    # the union shuffles once on the join key only
    assert plan.count("hashpartitioning(user_id") >= 1
