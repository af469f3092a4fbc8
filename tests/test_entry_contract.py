"""Self-check of the driver contract: every queries() entry runs, and
every oracle_sql() twin produces the identical row multiset in DuckDB
(mimics the driver's CORRECTNESS gate: row-count + schema + value
compare, order-insensitive)."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@pytest.fixture(scope="module")
def sf():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def duck(sf):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    return con


def _canon(rows, cols):
    """Order-insensitive canonical form: rows as tuples in sorted column
    order, floats rounded."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 6)
                if math.isnan(v):
                    v = "nan"
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


ALL_QUERIES = sorted(entrymod.queries().keys())


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert set(df.columns) == {"url", "norm_key", "cluster_id"}


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_query_vs_oracle(spark, duck, sf, name):
    qfn = entrymod.queries()[name]
    sdf = qfn(spark, sf)
    spark_rows = [tuple(r) for r in sdf.collect()]
    oracles = entrymod.oracle_sql()
    if name not in oracles:
        assert len(spark_rows) >= 0  # rows-only check (driver's weak mode)
        return
    res = duck.sql(oracles[name])
    duck_cols = [c.lower() for c in res.columns]
    spark_cols = [c.lower() for c in sdf.columns]
    assert sorted(duck_cols) == sorted(spark_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    duck_rows = res.fetchall()
    a = _canon(spark_rows, spark_cols)
    b = _canon(duck_rows, duck_cols)
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    if a != b:
        diff_a = [r for r in a if r not in set(map(tuple, b))][:5]
        diff_b = [r for r in b if r not in set(map(tuple, a))][:5]
        raise AssertionError(f"{name}: value mismatch; spark-only={diff_a} duck-only={diff_b}")


def test_memoized_fixtures_are_lineage_cut_and_context_keyed(spark, sf):
    """The entry-fixture memo contract (_VDICT_CC_CACHE): every cached
    frame must be lineage-cut (localCheckpoint leaf — checkpoint blocks
    die with the Spark context) and keyed by (applicationId, sf, ...)
    so a future entry can never capture a dead checkpoint from another
    context or scale factor."""
    from pyspark.sql import DataFrame

    entrymod._VDICT_CC_CACHE.clear()
    qs = entrymod.queries()
    # populate both memo families through entries that read them
    qs["er_cluster_metrics"](spark, sf).collect()
    qs["er_pair_metrics"](spark, sf).collect()
    cache = entrymod._VDICT_CC_CACHE
    assert cache, "memo never populated — fixture wiring changed?"
    app_id = spark.sparkContext.applicationId
    for key, value in cache.items():
        assert isinstance(key, tuple) and key[0] == app_id, key
        assert key[1] == sf, key
        frames = value if isinstance(value, tuple) else (value,)
        for f in frames:
            if not isinstance(f, DataFrame):
                continue
            plan = f._jdf.queryExecution().optimizedPlan().toString()
            # a localCheckpoint'd frame optimizes to a bare scan of the
            # checkpointed RDD — any Join/Aggregate here means the
            # lineage was NOT cut and the memo re-plans per consumer
            assert "LogicalRDD" in plan, (key, plan)
            assert "Join" not in plan and "Aggregate" not in plan, (
                key, plan,
            )
    # memo hit: a fresh queries() invocation (the pytest contract)
    # must return the SAME checkpointed objects, not rebuild
    before = {k: tuple(map(id, v if isinstance(v, tuple) else (v,)))
              for k, v in cache.items()}
    qs2 = entrymod.queries()
    qs2["er_cluster_metrics"](spark, sf).collect()
    qs2["er_pair_metrics"](spark, sf).collect()
    after = {k: tuple(map(id, v if isinstance(v, tuple) else (v,)))
             for k, v in cache.items()}
    assert before == after
