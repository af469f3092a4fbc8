"""Link-graph operators: degree stats and fixed-iteration PageRank vs a
trusted pure-Python power-iteration oracle (dangling node included)."""

import pytest

from orchid_fst_spark.operators.graph import degree_stats, pagerank

# small digraph: node 4 is dangling (no out-edges), node 5 is a source
# only (no in-edges)
EDGES = [
    (0, 1),
    (0, 2),
    (1, 2),
    (2, 0),
    (3, 2),
    (3, 4),
    (5, 0),
    (5, 4),
]


def _py_pagerank(edges, iterations=5, alpha=0.85):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    outdeg = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        dangling = sum(r for v, r in rank.items() if v not in outdeg)
        contrib = {v: 0.0 for v in nodes}
        for u, v in edges:
            contrib[v] += rank[u] / outdeg[u]
        rank = {
            v: (1 - alpha) / n + alpha * (contrib[v] + dangling / n)
            for v in nodes
        }
    return rank


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(EDGES, "src long, dst long")


def test_degree_stats(spark, edges_df):
    got = {
        r.node: (r.out_degree, r.in_degree)
        for r in degree_stats(edges_df).collect()
    }
    assert got == {
        0: (2, 2),
        1: (1, 1),
        2: (1, 3),
        3: (2, 0),
        4: (0, 2),
        5: (2, 0),
    }


def test_pagerank_matches_power_iteration(spark, edges_df):
    got = {
        r.node: r.rank
        for r in pagerank(edges_df, iterations=5, round_dp=None).collect()
    }
    want = _py_pagerank(EDGES, iterations=5)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12), v
    # total rank mass is conserved (dangling redistribution works)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_no_dangling_single_cycle(spark):
    # a pure cycle is the fixed point: every node keeps rank 1/n
    cyc = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], "src long, dst long"
    )
    got = {r.node: r.rank for r in pagerank(cyc, iterations=3).collect()}
    assert got == {0: pytest.approx(1 / 3), 1: pytest.approx(1 / 3), 2: pytest.approx(1 / 3)}


def test_pagerank_storage_released(spark, edges_df):
    from orchid_fst_spark.util.storage import release_persisted

    release_persisted()
    pagerank(edges_df, iterations=2).collect()
    # iteration internals were registered; release drains them
    assert release_persisted() > 0
    assert release_persisted() == 0
