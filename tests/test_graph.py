"""Link-graph operators: degree stats and fixed-iteration PageRank vs a
trusted pure-Python power-iteration oracle (dangling node included)."""

import pytest

from orchid_fst_spark.operators.graph import degree_stats, hits, pagerank

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


def _py_hits(edges, iterations):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    hub = {v: 1.0 / n for v in nodes}
    auth = {v: 0.0 for v in nodes}
    for _ in range(iterations):
        ar = {v: 0.0 for v in nodes}
        for u, v in edges:
            ar[v] += hub[u]
        sa = sum(ar.values())
        auth = {v: (ar[v] / sa if sa else 0.0) for v in nodes}
        hr = {v: 0.0 for v in nodes}
        for u, v in edges:
            hr[u] += auth[v]
        sh = sum(hr.values())
        hub = {v: (hr[v] / sh if sh else 0.0) for v in nodes}
    return hub, auth


def test_hits_matches_power_iteration(spark, edges_df):
    got = {
        r.node: (r.hub, r.auth)
        for r in hits(edges_df, iterations=3, round_dp=None).collect()
    }
    hub, auth = _py_hits(EDGES, iterations=3)
    assert set(got) == set(hub)
    for v in hub:
        assert got[v][0] == pytest.approx(hub[v], abs=1e-12), v
        assert got[v][1] == pytest.approx(auth[v], abs=1e-12), v
    # L1 normalization: both score vectors sum to exactly 1
    assert sum(h for h, _ in got.values()) == pytest.approx(1.0, abs=1e-9)
    assert sum(a for _, a in got.values()) == pytest.approx(1.0, abs=1e-9)
    # node 4 is dangling (no out-edges) -> hub 0; node 5 has no
    # in-edges -> auth 0
    assert got[4][0] == 0.0 and got[5][1] == 0.0


def test_hits_one_iteration_closed_form(spark):
    # 1->2, 1->3, 3->2: after one iteration auth = (0, 2/3, 1/3),
    # hub = (3/5, 0, 2/5) under L1 normalization
    df = spark.createDataFrame([(1, 2), (1, 3), (3, 2)], "src long, dst long")
    got = {
        r.node: (r.hub, r.auth)
        for r in hits(df, iterations=1, round_dp=None).collect()
    }
    assert got[1] == (pytest.approx(0.6), pytest.approx(0.0))
    assert got[2] == (pytest.approx(0.0), pytest.approx(2 / 3))
    assert got[3] == (pytest.approx(0.4), pytest.approx(1 / 3))


def test_hits_partitioning_independent(spark, edges_df):
    a = {
        r.node: (r.hub, r.auth)
        for r in hits(edges_df, iterations=3).collect()
    }
    b = {
        r.node: (r.hub, r.auth)
        for r in hits(edges_df.repartition(7), iterations=3).collect()
    }
    assert a == b


def test_extract_links_rows_and_hosts(spark):
    from orchid_fst_spark.operators.graph import extract_links

    df = spark.createDataFrame(
        [
            (1, "see https://a.org/x and http://b.net/y?z=1 done"),
            (2, "no links here"),
            (3, None),
            (4, "dup https://a.org/x https://a.org/x"),
        ],
        "doc_id long, text string",
    )
    got = sorted(
        (r.src_doc, r.url, r.host) for r in extract_links(df, "doc_id", "text").collect()
    )
    assert got == [
        (1, "http://b.net/y?z=1", "b.net"),
        (1, "https://a.org/x", "a.org"),
        (4, "https://a.org/x", "a.org"),
        (4, "https://a.org/x", "a.org"),
    ]
