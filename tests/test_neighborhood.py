"""Sorted-neighborhood blocking + meta-blocking (er/neighborhood.py):
brute-force differentials, cap semantics, and the no-theta-join plan
pin for the banded bucket self-join."""

import collections
import itertools

from pyspark.sql import functions as F

from orchid_fst_spark.er.neighborhood import (
    block_graph,
    ranked_records,
    sorted_neighborhood_pairs,
    wep_prune,
    wnp_prune,
)

WORDS = [
    "apple", "apply", "banana", "band", "bandit", "cat", "catalog",
    "dog", "dodge", "door", "zebra", "zeal", "yarn", "xylophone",
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta",
]


def _brute_snm(keys, window):
    s = sorted(keys)
    return sorted(
        (s[i], s[j], j - i)
        for i in range(len(s))
        for j in range(i + 1, min(i + window, len(s)))
    )


def test_snm_matches_brute_force(spark):
    df = spark.createDataFrame([(w,) for w in WORDS], "key string")
    for window in (2, 3, 5, 8):
        got = sorted(
            (r.key_a, r.key_b, r.gap)
            for r in sorted_neighborhood_pairs(df, window=window).collect()
        )
        assert got == _brute_snm(WORDS, window), f"window={window}"


def test_snm_duplicate_keys_need_ids(spark):
    # duplicate keys with explicit ids: (key, id) is the total order
    rows = [("aa", 1), ("aa", 2), ("ab", 3), ("aa", 4), ("b", 5)]
    df = spark.createDataFrame(rows, "key string, id long")
    got = sorted(
        (r.id_a, r.id_b, r.gap)
        for r in sorted_neighborhood_pairs(
            df, key_col="key", id_col="id", window=3
        ).collect()
    )
    order = [i for _, i in sorted((k, i) for k, i in rows)]  # 1,2,4,3,5
    exp = sorted(
        (order[i], order[j], j - i)
        for i in range(len(order))
        for j in range(i + 1, min(i + 3, len(order)))
    )
    assert got == exp


def test_snm_rejects_degenerate_window(spark):
    df = spark.createDataFrame([("a",)], "key string")
    try:
        sorted_neighborhood_pairs(df, window=1)
        assert False, "window=1 must raise"
    except ValueError:
        pass


def test_snm_empty_input(spark):
    df = spark.createDataFrame([], "key string")
    assert sorted_neighborhood_pairs(df, window=3).count() == 0


def test_ranked_records_is_dense_and_ordered(spark):
    df = spark.createDataFrame([(w,) for w in WORDS], "key string")
    got = sorted((r.rank, r.key) for r in ranked_records(df).collect())
    assert [k for _, k in got] == sorted(WORDS)
    assert [r for r, _ in got] == list(range(1, len(WORDS) + 1))


def test_snm_plan_has_no_theta_join(spark):
    # the banded bucket join must plan as a plain equi-join: a theta-
    # join (Cartesian / BroadcastNestedLoop) would be O(n^2) at scale
    df = spark.createDataFrame([(w,) for w in WORDS], "key string")
    plan = sorted_neighborhood_pairs(df, window=4)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def _blocks_df(spark, assignments):
    return spark.createDataFrame(assignments, "id string, block string")


def _brute_edges(assignments, cap=1000):
    bl = collections.defaultdict(set)
    for i, b in set(assignments):
        bl[b].add(i)
    w = collections.Counter()
    for b, mem in bl.items():
        if len(mem) > cap:
            continue
        for a, c in itertools.combinations(sorted(mem), 2):
            w[(a, c)] += 1
    return dict(w)


def test_block_graph_cbs_weights(spark):
    asg = [(w, w[:2]) for w in WORDS] + [(w, w[::-1][:2]) for w in WORDS]
    got = {
        (r.id_a, r.id_b): r.weight
        for r in block_graph(_blocks_df(spark, asg)).collect()
    }
    assert got == _brute_edges(asg)


def test_block_graph_cap_drops_hot_block(spark):
    # a planted block holding every record is purged before the pair
    # explode; the remaining edges are exactly the uncapped graph of
    # the small blocks
    asg = [(w, w[:2]) for w in WORDS] + [(w, "ALL") for w in WORDS]
    got = {
        (r.id_a, r.id_b): r.weight
        for r in block_graph(_blocks_df(spark, asg), block_cap=10).collect()
    }
    assert got == _brute_edges([(w, w[:2]) for w in WORDS])


def test_block_graph_dedups_assignments(spark):
    # duplicate (id, block) rows must not inflate weights
    asg = [("a", "x"), ("a", "x"), ("b", "x"), ("a", "y"), ("b", "y")]
    got = {
        (r.id_a, r.id_b): r.weight
        for r in block_graph(_blocks_df(spark, asg)).collect()
    }
    assert got == {("a", "b"): 2}


def test_wep_wnp_match_integer_model(spark):
    asg = [(w, w[:2]) for w in WORDS] + [(w, w[::-1][:2]) for w in WORDS] + [
        (w, f"l{len(w)}") for w in WORDS
    ]
    edges_df = block_graph(_blocks_df(spark, asg))
    exp = _brute_edges(asg)

    sw, ne = sum(exp.values()), len(exp)
    exp_wep = {p: w for p, w in exp.items() if w * ne > sw}
    got_wep = {
        (r.id_a, r.id_b): r.weight for r in wep_prune(edges_df).collect()
    }
    assert got_wep == exp_wep
    assert exp_wep, "fixture must exercise a non-trivial WEP cut"
    assert len(exp_wep) < len(exp), "WEP must actually prune"

    nsum, ndeg = collections.Counter(), collections.Counter()
    for (a, c), w in exp.items():
        nsum[a] += w
        nsum[c] += w
        ndeg[a] += 1
        ndeg[c] += 1
    exp_wnp = {
        (a, c): w
        for (a, c), w in exp.items()
        if w * ndeg[a] >= nsum[a] or w * ndeg[c] >= nsum[c]
    }
    got_wnp = {
        (r.id_a, r.id_b): r.weight for r in wnp_prune(edges_df).collect()
    }
    assert got_wnp == exp_wnp
    assert len(exp_wnp) < len(exp), "WNP must actually prune"


def test_wep_empty_edges(spark):
    edges = spark.createDataFrame([], "id_a string, id_b string, weight long")
    assert wep_prune(edges).count() == 0
    assert wnp_prune(edges).count() == 0


def test_multipass_snm_union_of_passes(spark):
    from orchid_fst_spark.er.neighborhood import multipass_snm_pairs

    df = spark.createDataFrame(
        [(w, w, w[::-1]) for w in WORDS], "id string, kf string, kr string"
    )
    got = sorted(
        (r.id_a, r.id_b)
        for r in multipass_snm_pairs(
            df, key_cols=["kf", "kr"], id_col="id", window=3
        ).collect()
    )

    def pass_pairs(keyed):
        order = [i for _, i in sorted(keyed)]
        return {
            tuple(sorted((order[i], order[j])))
            for i in range(len(order))
            for j in range(i + 1, min(i + 3, len(order)))
        }

    exp = sorted(
        pass_pairs([(w, w) for w in WORDS])
        | pass_pairs([(w[::-1], w) for w in WORDS])
    )
    assert got == exp
    # the reversed pass must contribute pairs the forward pass misses
    fwd = pass_pairs([(w, w) for w in WORDS])
    assert any(p not in fwd for p in got)


def test_multipass_snm_rejects_empty_keys(spark):
    from orchid_fst_spark.er.neighborhood import multipass_snm_pairs

    df = spark.createDataFrame([("a", "a")], "id string, k string")
    try:
        multipass_snm_pairs(df, key_cols=[], id_col="id")
        assert False, "empty key_cols must raise"
    except ValueError:
        pass


def test_suffix_blocking_matches_brute_force(spark):
    from orchid_fst_spark.er.neighborhood import suffix_blocking_pairs

    words = ["table", "atble", "cable", "fable", "tab", "xyz", "stable"]
    df = spark.createDataFrame([(w,) for w in words], "key string")

    def sfx(w, minlen=4, maxn=None):
        n = len(w) - minlen + 1
        if maxn is not None:
            n = min(n, maxn)
        return {w[i:] for i in range(max(n, 0))}

    def brute(maxn=None):
        w = collections.Counter()
        for a, b in itertools.combinations(sorted(words), 2):
            shared = len(sfx(a, 4, maxn) & sfx(b, 4, maxn))
            if shared:
                w[(a, b)] = shared
        return dict(w)

    got = {
        (r.id_a, r.id_b): r.weight
        for r in suffix_blocking_pairs(df, min_suffix_len=4).collect()
    }
    assert got == brute()
    # the head-insertion pair ("stable"/"table") is caught via the
    # shared "table"/"able" tails (weight 2) — no prefix block joins it
    assert got[("stable", "table")] == 2

    got2 = {
        (r.id_a, r.id_b): r.weight
        for r in suffix_blocking_pairs(
            df, min_suffix_len=4, max_suffixes=1
        ).collect()
    }
    assert got2 == brute(maxn=1)


def test_phonetic_key_goldens(spark):
    from orchid_fst_spark.functions.normalize import phonetic_key

    rows = [
        ("robert", "R163"), ("rupert", "R163"), ("tymczak", "T522"),
        ("pfister", "P236"), ("ashcraft", "A226"), ("honeyman", "H555"),
        ("", ""), ("123", ""), ("a-b c", "A120"),
    ]
    df = spark.createDataFrame([(k,) for k, _ in rows], "key string")
    got = {
        r.key: r.code
        for r in df.select("key", phonetic_key("key").alias("code")).collect()
    }
    assert got == dict(rows)


def test_phonetic_blocking_pairs_sound_alikes(spark):
    from orchid_fst_spark.er.neighborhood import phonetic_blocking_pairs

    recs = spark.createDataFrame(
        [("robert",), ("rupert",), ("tymczak",), ("zzz",)], "key string"
    )
    got = {
        (r.id_a, r.id_b): r.weight
        for r in phonetic_blocking_pairs(recs).collect()
    }
    # robert/rupert share R163; edit distance between them is 3 — a pair
    # every k<=2 segment blocker misses
    assert got == {("robert", "rupert"): 1}


def test_phonetic_blocking_cap_purges_hot_code(spark):
    from orchid_fst_spark.er.neighborhood import phonetic_blocking_pairs

    recs = spark.createDataFrame(
        [(f"robert{i}",) for i in range(5)] + [("tymczak",), ("tymzak",)],
        "key string",
    )
    got = phonetic_blocking_pairs(recs, block_cap=4).collect()
    # the 5-member R163 block is purged; the 2-member T522 block stays
    assert {(r.id_a, r.id_b) for r in got} == {("tymczak", "tymzak")}


def test_token_blocking_pairs_hand_built(spark):
    from orchid_fst_spark.er.neighborhood import token_blocking_pairs

    recs = spark.createDataFrame(
        [
            ("d1", "quick brown fox"),
            ("d2", "quick brown dog"),
            ("d3", "lazy dog"),
            ("d4", "unrelated text"),
        ],
        "id string, text string",
    )
    got = {
        (r.id_a, r.id_b): r.weight
        for r in token_blocking_pairs(recs).collect()
    }
    assert got == {("d1", "d2"): 2, ("d2", "d3"): 1}


def test_token_blocking_cap_purges_stopword(spark):
    from orchid_fst_spark.er.neighborhood import token_blocking_pairs

    # 'the' appears in all 5 docs -> purged at cap 4; the rare token
    # 'zebra' (2 docs) survives
    recs = spark.createDataFrame(
        [(f"d{i}", "the zebra" if i < 2 else "the") for i in range(5)],
        "id string, text string",
    )
    got = {
        (r.id_a, r.id_b): r.weight
        for r in token_blocking_pairs(recs, block_cap=4).collect()
    }
    assert got == {("d0", "d1"): 1}


def test_qgram_blocking_pairs_brute_force(spark):
    import collections
    import itertools

    from orchid_fst_spark.er.neighborhood import qgram_blocking_pairs

    words = ["table", "atble", "cable", "tab", "xy", "stable", "tables"]
    df = spark.createDataFrame([(w,) for w in words], "key string")
    got = {
        (r.id_a, r.id_b): r.weight
        for r in qgram_blocking_pairs(df, q=3).collect()
    }
    grams = {
        w: {w[i:i + 3] for i in range(len(w) - 2)}
        for w in words
        if len(w) >= 3
    }
    exp = {}
    for a, b in itertools.combinations(sorted(grams), 2):
        shared = len(grams[a] & grams[b])
        if shared:
            exp[(a, b)] = shared
    assert got == exp
    # the head-typo variant still pairs with its source
    assert ("atble", "table") in got


def test_qgram_blocking_cap_and_short_keys(spark):
    from orchid_fst_spark.er.neighborhood import qgram_blocking_pairs

    # 'abc' gram shared by 5 keys -> purged at cap 4; short keys (<q)
    # emit nothing
    recs = spark.createDataFrame(
        [(f"abc{i}",) for i in range(5)] + [("xy",), ("zq",)],
        "key string",
    )
    got = qgram_blocking_pairs(recs, q=3, block_cap=4).collect()
    # surviving grams: 'bc0'..'bc4'? no — each 'bc<i>' is unique; only
    # 'abc' was shared and it is purged
    assert got == []


def test_progressive_pairs_budget_and_order(spark):
    from orchid_fst_spark.er.neighborhood import progressive_pairs

    rows = [
        ("a", "B1"), ("a", "B2"),
        ("b", "B1"), ("b", "B2"),   # (a,b) co-occur in 2 blocks
        ("c", "B3"), ("d", "B3"),   # weight 1
        ("e", "B4"), ("f", "B4"),   # weight 1 (tie with (c,d))
    ]
    blocks = spark.createDataFrame(rows, "id string, block string")
    got = [tuple(r) for r in progressive_pairs(blocks, budget=2).collect()]
    # highest evidence first; the (weight, id_a, id_b) total order breaks
    # the (c,d)/(e,f) tie toward (c,d)
    assert got == [("a", "b", 2), ("c", "d", 1)]

    # budget >= all pairs returns everything, still in schedule order
    all_got = [
        tuple(r) for r in progressive_pairs(blocks, budget=100).collect()
    ]
    assert all_got == [("a", "b", 2), ("c", "d", 1), ("e", "f", 1)]


def test_progressive_pairs_partitioning_invariant(spark):
    from orchid_fst_spark.er.neighborhood import progressive_pairs

    rows = [(w, w[:2]) for w in WORDS] + [(w, w[-2:]) for w in WORDS]
    blocks = spark.createDataFrame(rows, "id string, block string")
    a = [tuple(r) for r in progressive_pairs(blocks, budget=7).collect()]
    b = [
        tuple(r)
        for r in progressive_pairs(blocks.repartition(13), budget=7).collect()
    ]
    assert a == b and len(a) == 7


def test_block_split_completeness_vs_naive(spark):
    # planted skew: one 200-member block, small blocks, a pair sharing
    # two blocks, a singleton — the pair set must equal the naive
    # all-intra-block join exactly (BlockSplit trades nothing away)
    import itertools
    from collections import defaultdict

    from orchid_fst_spark.er.neighborhood import block_split_pairs

    rows = [(f"g{i:03d}", "BIG") for i in range(200)]
    rows += [(f"s{i}", f"blk{i % 5}") for i in range(23)]
    rows += [("s0", "extra"), ("s1", "extra")]
    rows += [("lone", "single")]
    df = spark.createDataFrame(rows, "id string, block string")
    got = {
        (r.id_a, r.id_b)
        for r in block_split_pairs(df, max_block=16).collect()
    }
    blocks = defaultdict(set)
    for i, b in rows:
        blocks[b].add(i)
    truth = {
        pair
        for ms in blocks.values()
        for pair in itertools.combinations(sorted(ms), 2)
    }
    assert got == truth


def test_block_split_exactly_once_and_m1_path(spark):
    from orchid_fst_spark.er.neighborhood import block_split_pairs

    big = spark.createDataFrame(
        [(f"g{i:03d}", "B") for i in range(200)], "id string, block string"
    )
    # distinct=False: within one block every unordered pair surfaces in
    # exactly one comparison task
    assert block_split_pairs(big, max_block=16, distinct=False).count() == (
        200 * 199 // 2
    )
    # m=1 path: a block under the cap flows through the same plan
    small = spark.createDataFrame(
        [(f"s{i}", "B") for i in range(5)], "id string, block string"
    )
    assert block_split_pairs(small, max_block=16, distinct=False).count() == 10


def test_block_split_spreads_giant_block(spark):
    # the load-balancing claim itself: with AQE coalescing off, the
    # giant block's pairs come from many shuffle partitions and no
    # partition holds more than a small multiple of the fair share
    # (the explicit task-key repartition is load-bearing — block-only
    # partitioning would put every task in ONE partition)
    from pyspark.sql import functions as F

    from orchid_fst_spark.er.neighborhood import block_split_pairs

    key = "spark.sql.adaptive.coalescePartitions.enabled"
    old = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        df = spark.createDataFrame(
            [(f"g{i:03d}", "B") for i in range(200)],
            "id string, block string",
        )
        p = block_split_pairs(df, max_block=16, distinct=False)
        parts = (
            p.withColumn("_p", F.spark_partition_id())
            .groupBy("_p")
            .count()
            .collect()
        )
        total = 200 * 199 // 2
        assert len(parts) >= 4, parts
        assert max(r["count"] for r in parts) <= total * 0.3, parts
    finally:
        spark.conf.set(key, old)


def test_block_split_plan_two_exchanges(spark):
    import contextlib
    import io

    from orchid_fst_spark.er.neighborhood import block_split_pairs

    df = spark.createDataFrame(
        [(f"g{i}", "B") for i in range(50)], "id string, block string"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        block_split_pairs(df, max_block=8, distinct=False).explain("formatted")
    # formatted names each node twice (tree line + detail header):
    # 4 mentions == TWO Exchange nodes (block window + task-key
    # repartition), nothing else
    assert buf.getvalue().count("Exchange") == 4, buf.getvalue()


def test_learn_blocking_scheme_greedy_order(spark):
    from orchid_fst_spark.er.neighborhood import learn_blocking_scheme

    # truth: (a1,a2) covered by prefix only; (b1,b2) covered by suffix
    # only; (c1,c2) covered by BOTH.  prefix covers 2 pairs, suffix 2 —
    # prefix is cheaper (fewer comparisons) if its blocks are smaller.
    recs = spark.createDataFrame(
        [("aX1",), ("aX2",), ("1Yb",), ("2Yb",), ("cZ1",), ("cZ2",)],
        "id string",
    )
    rules = [
        ("pre", F.expr("substring(id, 1, 1)")),
        ("suf", F.expr("substring(id, 3, 1)")),
    ]
    truth = spark.createDataFrame(
        [("aX1", "aX2"), ("1Yb", "2Yb"), ("cZ1", "cZ2")],
        "key_a string, key_b string",
    )
    out = learn_blocking_scheme(recs, truth, rules, id_col="id").collect()
    # pre covers (aX1,aX2) [block 'a'] and (cZ1,cZ2) [block 'c'] = 2;
    # suf covers (1Yb,2Yb) [block 'b'] and (cZ1,cZ2) [block '1'? no —
    # third char: aX1->1, aX2->2, 1Yb->b, 2Yb->b, cZ1->1, cZ2->2]
    # so suf covers only (1Yb,2Yb) = 1.  pre first, then suf.
    assert [(r.step, r.rule, r.new_tp, r.cum_tp) for r in out] == [
        (1, "pre", 2, 2),
        (2, "suf", 1, 3),
    ]
    assert out[-1].completeness == 1.0
    # cum_comparisons = sum of the selected rules' own pair counts
    assert out[0].cum_comparisons == out[0].comparisons
    assert out[1].cum_comparisons == out[0].comparisons + out[1].comparisons


def test_learn_blocking_scheme_tie_breaks_and_zero_gain(spark):
    from orchid_fst_spark.er.neighborhood import learn_blocking_scheme

    recs = spark.createDataFrame(
        [("ab",), ("ac",), ("zz1",), ("zz2",), ("zz3",)], "id string"
    )
    truth = spark.createDataFrame([("ab", "ac")], "key_a string, key_b string")
    rules = [
        # both cover the single truth pair; 'wide' also blocks the zz
        # trio so it costs 3 extra comparisons -> 'narrow' must win
        ("wide", F.expr("CASE WHEN id LIKE 'a%' THEN 'A' ELSE 'Z' END")),
        ("narrow", F.expr("CASE WHEN id LIKE 'a%' THEN 'A' END")),
        ("useless", F.expr("id")),  # singleton blocks: zero coverage
    ]
    out = learn_blocking_scheme(recs, truth, rules, id_col="id").collect()
    # narrow picked first (same gain, 1 vs 4 comparisons); wide adds
    # nothing new; useless never covers -> exactly one row
    assert [(r.step, r.rule) for r in out] == [(1, "narrow")]
    assert out[0].new_tp == 1 and out[0].comparisons == 1


def test_learn_blocking_scheme_block_cap(spark):
    from orchid_fst_spark.er.neighborhood import learn_blocking_scheme

    recs = spark.createDataFrame(
        [(f"h{i}",) for i in range(10)], "id string"
    )
    truth = spark.createDataFrame(
        [("h1", "h2")], "key_a string, key_b string"
    )
    rules = [("first", F.expr("substring(id, 1, 1)"))]  # one hot block
    capped = learn_blocking_scheme(
        recs, truth, rules, id_col="id", block_cap=5
    ).collect()
    assert capped == []  # the only covering block was purged
    uncapped = learn_blocking_scheme(
        recs, truth, rules, id_col="id", block_cap=100
    ).collect()
    assert [(r.rule, r.new_tp, r.comparisons) for r in uncapped] == [
        ("first", 1, 45)
    ]


def test_learn_blocking_scheme_conjunctions(spark):
    from orchid_fst_spark.er.neighborhood import learn_blocking_scheme

    # the truth pair agrees on BOTH first and last char; each atom also
    # blocks a noisy crowd (extra comparisons), the conjunction blocks
    # the pair alone — equal gain, cheaper -> conjunction wins step 1
    recs = spark.createDataFrame(
        [("axz",), ("ayz",), ("aq1",), ("aq2",), ("p1z",), ("p2z",)],
        "id string",
    )
    truth = spark.createDataFrame(
        [("axz", "ayz")], "key_a string, key_b string"
    )
    rules = [
        ("first", F.expr("substring(id, 1, 1)")),
        ("last", F.expr("substring(id, 3, 1)")),
    ]
    atoms = learn_blocking_scheme(recs, truth, rules, id_col="id").collect()
    conj = learn_blocking_scheme(
        recs, truth, rules, id_col="id", conjunctions=2
    ).collect()
    assert atoms[0].rule in ("first", "last")
    assert conj[0].rule == "first&last"
    assert conj[0].new_tp == 1
    # conjunction comparisons: only (axz, ayz) share key 'a\x1fz' -> 1,
    # vs 'first' which also pairs the aq crowd (4 records -> 6)
    assert conj[0].comparisons < atoms[0].comparisons
    # null in either side opts out: a record with a null-producing atom
    nrecs = spark.createDataFrame([("ax",), ("ay",)], "id string")
    nrules = [
        ("first", F.expr("substring(id, 1, 1)")),
        ("third", F.expr("CASE WHEN length(id) >= 3 THEN substring(id, 3, 1) END")),
    ]
    out = learn_blocking_scheme(
        nrecs,
        spark.createDataFrame([("ax", "ay")], "key_a string, key_b string"),
        nrules,
        id_col="id",
        conjunctions=2,
    ).collect()
    # only 'first' can cover (third is null on both): conjunction absent
    assert [r.rule for r in out] == ["first"]


def test_grid_blocking_matches_brute_force(spark):
    import math
    import random

    from orchid_fst_spark.er.neighborhood import grid_blocking_pairs

    rng = random.Random(29)
    pts = [(f"p{i:03d}", rng.uniform(-5, 5), rng.uniform(-5, 5))
           for i in range(120)]
    df = spark.createDataFrame(pts, "id string, x double, y double")
    for radius, cell in ((0.8, None), (0.8, 1.5), (2.0, 2.0)):
        got = {
            (r.id_a, r.id_b): r.dist
            for r in grid_blocking_pairs(
                df, id_col="id", radius=radius, cell=cell
            ).collect()
        }
        exp = {}
        for (ia, xa, ya) in pts:
            for (ib, xb, yb) in pts:
                if ia < ib:
                    d = math.hypot(xa - xb, ya - yb)
                    if d <= radius:
                        exp[(ia, ib)] = round(d, 6)
        assert got == exp, (radius, cell, len(got), len(exp))


def test_grid_blocking_cap_and_guards(spark):
    import pytest as _pytest

    from orchid_fst_spark.er.neighborhood import grid_blocking_pairs

    # 10 coincident points in one cell: cap purges the whole cell
    df = spark.createDataFrame(
        [(f"h{i}", 0.5, 0.5) for i in range(10)] + [("far", 9.0, 9.0)],
        "id string, x double, y double",
    )
    assert grid_blocking_pairs(df, id_col="id", radius=1.0,
                               cell_cap=5).count() == 0
    assert grid_blocking_pairs(df, id_col="id", radius=1.0).count() == 45
    with _pytest.raises(ValueError):
        grid_blocking_pairs(df, id_col="id", radius=1.0, cell=0.5)
    with _pytest.raises(ValueError):
        grid_blocking_pairs(df, id_col="id", radius=0.0)


# ---------------------------------------------------------------------------
# ANN (embedding / IVF-cell) blocking
# ---------------------------------------------------------------------------

def _brute_ann_blocking(vecs, n_centroids, n_probe, cap=1000):
    """Pure-python replica of ann_blocking_pairs: hash-sample centroids
    (md5-ordered ids), 6dp-rounded cosine, (ccos desc, cid asc)
    top-n_probe assignment, cell cap, shared-cell pair weights."""
    import hashlib

    def cos(a, b):
        dot = 0.0
        for x, y in zip(a, b):
            dot += x * y
        na = nb = 0.0
        for x in a:
            na += x * x
        for y in b:
            nb += y * y
        return dot / (na ** 0.5 * nb ** 0.5)

    ids = sorted(vecs, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    cents = ids[:n_centroids]
    cells = collections.defaultdict(set)
    for i, v in vecs.items():
        scored = sorted(
            ((round(cos(v, vecs[c]), 6), c) for c in cents),
            key=lambda t: (-t[0], t[1]),
        )
        for _, c in scored[:n_probe]:
            cells[c].add(i)
    w = collections.Counter()
    for mem in cells.values():
        if len(mem) > cap:
            continue
        for a, c in itertools.combinations(sorted(mem), 2):
            w[(a, c)] += 1
    return dict(w)


def _ann_vecs():
    import random

    rng = random.Random(7)
    vecs = {}
    # 4 planted clusters of 5 near-identical vectors + 6 loners
    for ci in range(4):
        base = [rng.uniform(-1, 1) for _ in range(8)]
        for j in range(5):
            vecs[ci * 5 + j] = [
                x + rng.uniform(-0.01, 0.01) for x in base
            ]
    for k in range(6):
        vecs[100 + k] = [rng.uniform(-1, 1) for _ in range(8)]
    return vecs


def test_ann_blocking_matches_brute_force(spark):
    from orchid_fst_spark.er.neighborhood import ann_blocking_pairs

    vecs = _ann_vecs()
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "id long, vec array<double>",
    )
    got = {
        (r.id_a, r.id_b): r.weight
        for r in ann_blocking_pairs(
            df, n_centroids=6, n_probe=2
        ).collect()
    }
    exp = _brute_ann_blocking(vecs, n_centroids=6, n_probe=2)
    assert got == exp


def test_ann_blocking_multi_probe_pairs_planted_clusters(spark):
    # every planted intra-cluster pair must survive blocking (the
    # pair-completeness property the blocker exists for), and weights
    # compose as meta-blocking CBS evidence
    from orchid_fst_spark.er.neighborhood import ann_blocking_pairs

    vecs = _ann_vecs()
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "id long, vec array<double>",
    )
    pairs = {
        (r.id_a, r.id_b)
        for r in ann_blocking_pairs(df, n_centroids=6, n_probe=2).collect()
    }
    for ci in range(4):
        mem = [ci * 5 + j for j in range(5)]
        for a, b in itertools.combinations(mem, 2):
            assert (a, b) in pairs, f"lost intra-cluster pair {(a, b)}"


def test_ann_blocking_cap_and_guards(spark):
    from orchid_fst_spark.er.neighborhood import ann_blocking_pairs

    vecs = _ann_vecs()
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "id long, vec array<double>",
    )
    # cap=3 purges every cell bigger than 3 members before the explode
    got = {
        (r.id_a, r.id_b): r.weight
        for r in ann_blocking_pairs(
            df, n_centroids=6, n_probe=2, block_cap=3
        ).collect()
    }
    exp = _brute_ann_blocking(vecs, n_centroids=6, n_probe=2, cap=3)
    assert got == exp
    import pytest

    with pytest.raises(ValueError, match="n_probe"):
        ann_blocking_pairs(df, n_probe=0)


def test_ann_blocking_plan_broadcasts_centroids(spark):
    # the centroid join must be a broadcast (the bounded side), never a
    # shuffle or nested-loop of the corpus against centroids
    from orchid_fst_spark.er.neighborhood import ann_blocking_pairs

    vecs = _ann_vecs()
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "id long, vec array<double>",
    )
    plan = (
        ann_blocking_pairs(df, n_centroids=6, n_probe=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
