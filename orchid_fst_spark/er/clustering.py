"""Transitive clustering: connected components over the match-edge list.

Alternating large-star / small-star (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14 — public literature, see
PAPERS.md): pure DataFrame groupBy/join rounds, converges in
O(log n) rounds even for pathological chain graphs (hash-min label
propagation needs O(diameter)).  Each round is one shuffle on node id;
intermediate frames are checkpointed (localCheckpoint or parquet) to
truncate lineage so the iteration count never bloats the plan.

Node ids are kept as their natural strings (urls / norm_keys) and
compared lexicographically — no id re-mapping pass, deterministic
cluster representatives (min key in the component), no 64-bit hash
collision risk at 10^12 nodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _canonical(edges: DataFrame) -> DataFrame:
    """Orient every edge small -> large, drop self loops, dedup."""
    return (
        edges.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .filter(F.col("src") < F.col("dst"))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Return (node, component) with component = lexicographic min node
    id reachable — deterministic, iteration-order independent.

    Implementation: alternate large-star (every neighbor > v links to
    v's minimum neighborhood node) and small-star (neighbors <= v link to
    the minimum), checking convergence via the edge-set change count.
    """
    spark = edges.sparkSession
    e = _canonical(edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )

    def _persist(df: DataFrame, name: str, i: int) -> DataFrame:
        if checkpoint_dir:
            path = f"{checkpoint_dir}/cc_{name}_{i}"
            df.write.mode("overwrite").parquet(path)
            return spark.read.parquet(path)
        return df.localCheckpoint(eager=True)

    e = _persist(e, "edges", 0)

    def _fp(df: DataFrame):
        # edge-set fingerprint: count + order-insensitive xor of row
        # hashes — one aggregation job per iteration instead of two
        # exceptAll passes (xor never overflows under ANSI mode; edges are
        # distinct so xor cancellation cannot hide a change of the same
        # cardinality except by 64-bit collision; max_iter is the backstop)
        row = df.agg(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64("src", "dst")).alias("h"),
        ).collect()[0]
        return (row.n, row.h)

    fp_prev = _fp(e)

    for i in range(1, max_iter + 1):
        # -- large-star --------------------------------------------------
        # neighborhood of v including v; m = min; link every neighbor > v to m
        nbrs = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        mins = nbrs.groupBy("src").agg(F.min("dst").alias("m"))
        mins = mins.withColumn("m", F.least("src", "m"))
        large = (
            nbrs.join(mins, "src")
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("m").alias("src"), F.col("dst").alias("dst"))
        )
        e1 = _canonical(large)
        # -- small-star --------------------------------------------------
        # for each v: neighbors <= v (plus v) all link to the minimum
        directed = e1  # already small -> large as (src < dst)
        nbr_small = directed.select(
            F.col("dst").alias("v"), F.col("src").alias("u")
        )
        mins2 = nbr_small.groupBy("v").agg(F.min("u").alias("m"))
        small = (
            nbr_small.join(mins2, "v")
            .select(F.col("m").alias("src"), F.col("u").alias("dst"))
            .union(mins2.select(F.col("m").alias("src"), F.col("v").alias("dst")))
        )
        e2 = _canonical(small)
        e2 = _persist(e2, "edges", i)

        fp_new = _fp(e2)
        e = e2
        if fp_new == fp_prev:
            break
        fp_prev = fp_new

    # after convergence every edge is (root, member)
    comp = e.select(F.col("dst").alias("node"), F.col("src").alias("component"))
    roots = e.select(F.col("src").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    singletons = nodes.join(
        comp.select("node").union(roots.select("node")).distinct(), "node", "left_anti"
    ).withColumn("component", F.col("node"))
    return comp.union(roots).union(singletons).groupBy("node").agg(
        F.min("component").alias("component")
    )


def star_clusters(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """One-pass deterministic star clustering — the standard
    chaining-free alternative to transitive closure for ER cluster
    formation (Aslam, Pelekhov & Rus, "The Star Clustering Algorithm",
    JGAA 2004; evaluated for record linkage by Hassanzadeh et al.,
    "Framework for Evaluating Clustering Algorithms in Duplicate
    Detection", VLDB 2009 — public literature, see PAPERS.md).

    Where ``connected_components`` merges everything reachable (one bad
    edge chains two big entities together), star clustering only groups
    records around locally dominant hub records:

    - ``deg(v)`` = number of match-edge neighbors.
    - ``v`` is a CENTER iff it beats every neighbor under the total
      order (deg DESC, node ASC) — the parallel local-maximum variant
      of the paper's sequential highest-degree-first greedy sweep, so
      two adjacent nodes are never both centers (star property).
    - Every non-center attaches to its best adjacent center under the
      same order; a non-center with NO adjacent center stays a
      singleton (the documented trade vs the greedy sweep, which would
      promote it in a later pass — at web scale one pass, no chaining).

    Deterministic under any partitioning: the order (deg DESC, node
    ASC) is total, so centers and assignments are unique — no float
    scores involved.  Returns ``(node, center)`` for every node that
    appears in the edge list; callers left-join the full record set and
    coalesce to self for isolated records, exactly like
    ``connected_components`` consumers.

    Plan shape: one degree aggregate, two node-keyed equi-joins to
    decorate edge endpoints, and two ``min(struct)`` aggregates with
    map-side partial combine (the struct ``(-deg, node)`` makes MIN
    implement "highest degree, then smallest node") — no windows, no
    iteration, no driver collection; every shuffle is on node id.
    Reference grounding: consumes the same match-edge list the
    reference's fuzzy semantics define (fst_core/fst.h:16-22 fuzzy
    match contract); clustering policy itself is from the public ER
    literature, the reference stops at lookup hits.
    """
    e = _canonical(edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")))
    sym = e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).select(F.col("src").alias("v"), F.col("dst").alias("u"))
    deg = sym.groupBy(F.col("v").alias("node")).agg(
        F.count("*").cast("long").alias("deg")
    )
    # decorate both endpoints with degree; rank = (-deg, node) so MIN
    # picks highest degree with smallest-node tie-break
    nb = (
        sym.join(deg.select(F.col("node").alias("v"), F.col("deg").alias("deg_v")), "v")
        .join(deg.select(F.col("node").alias("u"), F.col("deg").alias("deg_u")), "u")
    )
    best_nbr = nb.groupBy("v", "deg_v").agg(
        F.min(F.struct((-F.col("deg_u")).alias("nd"), F.col("u").alias("n"))).alias(
            "bn"
        )
    )
    centers = best_nbr.filter(
        F.struct((-F.col("deg_v")).alias("nd"), F.col("v").alias("n")) < F.col("bn")
    ).select(F.col("v").alias("c"))
    # attach every node to its best adjacent center (centers attach to
    # themselves below; non-centers with no adjacent center fall out of
    # the join and resolve to self)
    att = (
        nb.join(centers, nb["u"] == centers["c"])
        .groupBy("v")
        .agg(
            F.min(
                F.struct((-F.col("deg_u")).alias("nd"), F.col("u").alias("n"))
            ).alias("bc")
        )
        .select("v", F.col("bc.n").alias("center"))
    )
    nodes = deg.select(F.col("node").alias("v"))
    return (
        nodes.join(centers.withColumnRenamed("c", "v"), "v", "left_semi")
        .select(F.col("v").alias("node"), F.col("v").alias("center"))
        .unionByName(
            nodes.join(centers, nodes["v"] == centers["c"], "left_anti")
            .join(att, "v", "left")
            .select(
                F.col("v").alias("node"),
                F.coalesce("center", F.col("v")).alias("center"),
            )
        )
    )


def _hash_local_minima(sym: DataFrame, pi) -> DataFrame:
    """Active nodes whose hash beats every active neighbor's — the
    per-round pivot/center selection shared by ``pivot_clusters`` and
    ``canopy_clusters`` (one neighbor-min aggregate + a filter;
    eagerly checkpointed since every consumer reads it >= twice)."""
    nbmin = sym.groupBy("v").agg(F.min(pi(F.col("u"))).alias("mn"))
    return (
        nbmin.filter(pi(F.col("v")) < F.col("mn"))
        .select(F.col("v").alias("c"))
        .localCheckpoint(eager=True)
    )


def pivot_clusters(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 8,
    seed: str = "pivot",
) -> DataFrame:
    """Round-synchronous pivot (correlation) clustering — the third
    cluster-formation policy next to ``connected_components`` (chains)
    and ``star_clusters`` (degree hubs), from the KwikCluster line of
    work (Ailon, Charikar & Newman, JACM 2008; parallel rounds per
    Chierichetti, Dalvi & Kumar, KDD 2014; lock-free round-synchronous
    assignment as in ClusterWild!, Pan et al., NIPS 2015 — public
    literature, see PAPERS.md).  Every cluster is a pivot plus a subset
    of its DIRECT neighbors (radius 1 by construction), and the pivot
    order is a hash — unbiased by degree, the property the 3-approx
    analysis of KwikCluster rests on.

    Deterministic variant: the random order is ``pi(v) = md5('{seed}|'
    || v)`` (identical hex in any engine).  Per round, over the still-
    active subgraph:

    - pivots  = nodes whose pi beats every active neighbor's pi (the
      parallel local-minima sweep — per Blelloch, Fineman & Shun,
      PPoPP 2012, iterating local minima yields EXACTLY the sequential
      greedy pivot set under pi);
    - every active non-pivot adjacent to a pivot joins its min-pi
      adjacent pivot THIS round (the round-synchronous rule: a node
      adjacent to both a round-r pivot and a lower-pi round-(r+1) pivot
      goes to the round-r one, where sequential KwikCluster would pick
      the later lower-pi pivot — the documented ClusterWild!-style
      deviation, made deterministic);
    - clustered nodes leave the graph.

    After ``rounds`` rounds (md5 order is effectively random, so the
    expected round count is O(log n); 8 covers graphs far beyond any
    realistic blocking output — the loop also exits early the moment
    the active graph drains) any still-active node becomes a singleton,
    a bounded-compute contract the unrolled-CTE oracle replays exactly.

    Plan shape per round: one neighbor-min aggregate, one pivot
    equi-join + min_by aggregate, two anti-joins to shrink the edge
    frame — every shuffle on node id, no windows; ``sym`` and the
    per-round output are ``localCheckpoint``-cut so the plan tree stays
    constant-size across rounds (the pagerank-loop lesson).  Returns
    ``(node, cluster)`` for every node in the edge list; callers
    left-join the full record set and coalesce to self, exactly like
    ``connected_components`` / ``star_clusters`` consumers."""
    if rounds < 1:
        raise ValueError("need rounds >= 1")

    def _pi(c) -> F.Column:
        return F.md5(F.concat(F.lit(f"{seed}|"), c))

    e = _canonical(edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")))
    sym = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .select(F.col("src").alias("v"), F.col("dst").alias("u"))
        .localCheckpoint(eager=True)
    )
    all_nodes = sym.select("v").distinct().localCheckpoint(eager=True)

    clustered: list[DataFrame] = []
    for _ in range(rounds):
        if sym.isEmpty():
            break
        pivots = _hash_local_minima(sym, _pi)
        assigned = (
            sym.join(pivots, sym["u"] == pivots["c"])
            .groupBy("v")
            .agg(
                F.min(F.struct(_pi(F.col("c")).alias("h"), F.col("c").alias("c"))).alias("bc")
            )
            .select("v", F.col("bc.c").alias("cluster"))
        )
        this_round = (
            pivots.select(F.col("c").alias("node"), F.col("c").alias("cluster"))
            .unionByName(assigned.select(F.col("v").alias("node"), "cluster"))
            .localCheckpoint(eager=True)
        )
        clustered.append(this_round)
        gone = this_round.select("node")
        sym = (
            sym.join(gone, sym["v"] == gone["node"], "left_anti")
            .join(gone, sym["u"] == gone["node"], "left_anti")
            .localCheckpoint(eager=True)
        )

    out = clustered[0] if clustered else None
    for fr in clustered[1:]:
        out = out.unionByName(fr)
    leftovers = all_nodes
    if out is not None:
        leftovers = all_nodes.join(
            out, all_nodes["v"] == out["node"], "left_anti"
        )
    leftovers = leftovers.select(
        F.col("v").alias("node"), F.col("v").alias("cluster")
    )
    return leftovers if out is None else out.unionByName(leftovers)


def golden_records(
    df: DataFrame,
    cluster_col: str = "component",
    prefer: list | None = None,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Survivorship (golden-record selection): ONE canonical record per
    cluster, chosen by the ``prefer`` ordering — the stage after
    transitive clustering where duplicates collapse into the record the
    downstream pipeline keeps (longest text, freshest timestamp,
    highest quality...).

    ``prefer``: list of Columns compared lexicographically where LARGER
    wins; make the final element unique within a cluster (e.g. the key
    itself, or ``-id`` for smallest-id-wins on numeric ids) so the
    choice is deterministic under any partitioning.  String columns
    cannot be inverted — if you need smallest-string-wins ahead of
    other keys, precompute an orderable surrogate.

    Plan: a single ``max_by(struct(row), struct(prefer))`` aggregate —
    guaranteed map-side partial combine (each task keeps one candidate
    per cluster, the shuffle carries one row per (task, cluster)),
    unlike a row_number window which must sort full clusters after the
    exchange.  Output: (cluster, n_members, <record columns>).
    """
    if prefer is None:
        raise ValueError("prefer: need at least one ordering column")
    cols = keep_cols if keep_cols is not None else [
        c for c in df.columns if c != cluster_col
    ]
    clash = {cluster_col, "n_members"} & set(cols)
    if clash:
        raise ValueError(
            f"record columns {sorted(clash)} collide with the output's "
            "cluster/n_members columns — rename or exclude via keep_cols"
        )
    rec = F.max_by(F.struct(*[F.col(c) for c in cols]), F.struct(*prefer))
    out = df.groupBy(cluster_col).agg(
        rec.alias("_rec"), F.count("*").cast("long").alias("n_members")
    )
    return out.select(cluster_col, "n_members", "_rec.*")


def repair_clusters(
    assignment: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    cluster_col: str = "cluster_id",
    src: str = "src",
    dst: str = "dst",
    min_density_num: int = 1,
    min_density_den: int = 2,
) -> DataFrame:
    """Cohesion-gated cluster repair: clusters whose direct-edge density
    falls below ``min_density_num/min_density_den`` are RE-FORMED with
    ``star_clusters`` over their own intra-cluster edges; dense clusters
    pass through untouched.  This operationalizes the Hassanzadeh
    VLDB'09 reading of the density lens — transitive closure for the
    near-cliques, a chaining-free policy exactly where chaining is the
    diagnosed failure — without paying star formation over the whole
    graph.

    Returns ``(node, cluster, repaired)`` covering every assigned node:
    kept nodes carry their original cluster id, repaired nodes their
    star center (isolated-in-subgraph nodes become singletons labeled
    by themselves).  The density gate is the exact integer
    cross-multiplication ``n_edges · den < num · possible`` — float-
    free, bit-identical in any engine; singletons and 2-member clusters
    (density 1 by construction) are never repaired.

    Precondition: cluster ids are drawn from member node ids (the
    CC/star/pivot labeling convention) — repaired labels are member
    node ids of LOW clusters, so they can never collide with a kept
    cluster's label.

    Plan shape: one ``cluster_cohesion`` pass (cluster-count-sized
    after its endpoint joins), a broadcast-sized low-cluster semi-join
    to split the assignment, star formation over the low subgraph only,
    and a union — no iteration.
    """
    coh = cluster_cohesion(
        assignment, edges, node_col=node_col, cluster_col=cluster_col,
        src=src, dst=dst,
    )
    low = coh.filter(
        F.col("n_edges") * F.lit(int(min_density_den))
        < F.lit(int(min_density_num)) * F.col("possible")
    ).select(F.col(cluster_col).alias("_lc"))
    asg = assignment.select(
        F.col(node_col).alias("node"), F.col(cluster_col).alias("cluster")
    )
    low_nodes = asg.join(low, asg["cluster"] == low["_lc"]).select(
        "node", "cluster"
    )
    kept = asg.join(low, asg["cluster"] == low["_lc"], "left_anti").select(
        "node", "cluster", F.lit(False).alias("repaired")
    )
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    intra = (
        e.join(low_nodes.withColumnRenamed("node", "_s"), "_s")
        .withColumnRenamed("cluster", "_ca")
        .join(low_nodes.withColumnRenamed("node", "_d"), "_d")
        .filter(F.col("_ca") == F.col("cluster"))
        .select(F.col("_s").alias("src"), F.col("_d").alias("dst"))
    )
    stars = star_clusters(intra, src="src", dst="dst")
    rebuilt = (
        low_nodes.join(stars, "node", "left")
        .select(
            "node",
            F.coalesce("center", "node").alias("cluster"),
            F.lit(True).alias("repaired"),
        )
    )
    return kept.unionByName(rebuilt)


def fuse_attributes(
    df: DataFrame,
    cluster_col: str = "component",
    attrs: list[str] | None = None,
    weight_col: str | None = None,
) -> DataFrame:
    """Attribute-level data fusion: resolve each attribute's value per
    cluster by (weighted) majority vote — the conflict-resolution stage
    of record linkage (Bleiholder & Naumann, "Data Fusion", ACM CSUR
    2008; Dong & Naumann VLDB'09 tutorial).  Complements
    ``golden_records``: that keeps one whole record, this builds a
    composite — each attribute fused independently, so the entity can
    carry r1's name and r2's phone.

    One LONG-form row per (cluster, attr): ``(cluster, attr, value,
    votes, total_votes, support)`` with ``value`` the winner under
    (votes DESC, value ASC — deterministic tie-break), ``support`` =
    votes/total_votes rounded 6dp.  Null attribute values do not vote
    (the standard convention); a (cluster, attr) whose values are all
    null emits no row.

    ``weight_col``: optional INTEGER per-row source weight (a source-
    reliability prior); integer weights keep the vote counts exact in
    any engine.  Default: one row, one vote.

    Plan shape: one melt (explode(array(struct…))) over the clustered
    frame, ONE (cluster, attr, value) count aggregate, then the winner
    as ONE ``min_by(struct(value, votes), struct(-votes, value))``
    aggregate per (cluster, attr) — map-side partial combine, no
    window sort (the ``golden_records`` argument); total votes ride
    the same aggregate as a ``sum``.  Attribute values are cast to
    string for the melt (document per-attr types upstream); at web
    scale the only shuffles carry (cluster, attr, value) counts.
    """
    if not attrs:
        raise ValueError("attrs: need at least one attribute column")
    w = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    melted = df.select(
        F.col(cluster_col).alias("cluster"),
        w.alias("_w"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(a).alias("attr"),
                        F.col(a).cast("string").alias("value"),
                    )
                    for a in attrs
                ]
            )
        ).alias("_m"),
    ).select("cluster", "_m.attr", "_m.value", "_w")
    counted = (
        melted.filter(F.col("value").isNotNull())
        .groupBy("cluster", "attr", "value")
        .agg(F.sum("_w").cast("long").alias("votes"))
    )
    fused = counted.groupBy("cluster", "attr").agg(
        F.min_by(
            F.struct(F.col("value"), F.col("votes")),
            F.struct((-F.col("votes")).alias("nv"), F.col("value")),
        ).alias("win"),
        F.sum("votes").cast("long").alias("total_votes"),
    )
    return fused.select(
        "cluster",
        "attr",
        F.col("win.value").alias("value"),
        F.col("win.votes").alias("votes"),
        "total_votes",
        F.round(F.col("win.votes") / F.col("total_votes"), 6).alias(
            "support"
        ),
    )


def fusion_em(
    df: DataFrame,
    cluster_col: str = "component",
    attrs: list[str] | None = None,
    source_col: str = "source",
    iters: int = 3,
) -> DataFrame:
    """Truth discovery: iterative source-reliability fusion (the
    TruthFinder / AccuVote construction — Yin, Han & Yu KDD'07; Dong,
    Berti-Équille & Srivastava VLDB'09).  ``fuse_attributes`` counts
    every row equally; here sources EARN weight: a value's confidence
    is the sum of its supporting sources' trust, the per-cell winner is
    the max-confidence value, and a source's trust is the fraction of
    its claims that agree with the current winners — iterated a fixed
    ``iters`` times from uniform trust (iteration 1 is therefore plain
    plurality; by iteration 3 a source that keeps disagreeing with the
    consensus has lost its vote weight).

    Claims are the DISTINCT (cluster, attr, source, value) assertions
    with non-null values.  One row per (cluster, attr):
    ``(cluster, attr, value, confidence, support)`` — ``confidence``
    the winner's integer trust-sum (micro-units), ``support`` its
    share of the cell's total confidence (6dp).

    Determinism (cross-engine): trust is held in integer MICRO-units —
    start 500000, update ``(2·matches·10⁶ + total) div (2·total)``
    (exact half-up integer rounding of matches/total), clamped to
    [1, 999999] (the EM clamp discipline: a source never hits hard 0,
    which would freeze it out irrecoverably); confidences are exact
    integer sums; winners break ties (confidence DESC, value ASC);
    ``support`` is ONE IEEE division rounded 6dp.  No float exists
    anywhere in the loop, so a DuckDB replay is a mechanical unrolled
    CTE (the ``er_fs_em`` pattern).

    Scale shape per iteration: claims ⋈ trust (source-count-sized —
    AQE broadcasts it), one (cluster, attr, value) confidence
    aggregate, one ``min_by`` winner aggregate, one source-agreement
    aggregate; the trust frame is ``localCheckpoint``-cut per
    iteration (the iterative-loop lesson), so every iteration plans a
    constant tree.
    """
    if not attrs:
        raise ValueError("attrs: need at least one attribute column")
    claims = (
        df.select(
            F.col(cluster_col).alias("cluster"),
            F.col(source_col).cast("string").alias("src"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(a).alias("attr"),
                            F.col(a).cast("string").alias("value"),
                        )
                        for a in attrs
                    ]
                )
            ).alias("_m"),
        )
        .select("cluster", "_m.attr", "_m.value", "src")
        .filter(F.col("value").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    trust = (
        claims.select("src")
        .distinct()
        .withColumn("t", F.lit(500000).cast("long"))
        .localCheckpoint(eager=True)
    )

    def _winners(tr: DataFrame) -> DataFrame:
        conf = (
            claims.join(tr, "src")
            .groupBy("cluster", "attr", "value")
            .agg(F.sum("t").cast("long").alias("conf"))
        )
        return conf.groupBy("cluster", "attr").agg(
            F.min_by(
                F.struct(F.col("value"), F.col("conf")),
                F.struct((-F.col("conf")).alias("nc"), F.col("value")),
            ).alias("win"),
            F.sum("conf").cast("long").alias("total_conf"),
        )

    win = None
    for _ in range(iters):
        win = _winners(trust)
        agree = (
            claims.join(
                win.select(
                    "cluster", "attr", F.col("win.value").alias("wv")
                ),
                ["cluster", "attr"],
            )
            .groupBy("src")
            .agg(
                F.count("*").cast("long").alias("total"),
                F.sum(
                    F.when(F.col("value") == F.col("wv"), 1).otherwise(0)
                ).cast("long").alias("matches"),
            )
        )
        trust = agree.select(
            "src",
            F.least(
                F.greatest(
                    F.call_function(
                        "div",
                        2 * F.col("matches") * F.lit(1000000)
                        + F.col("total"),
                        2 * F.col("total"),
                    ),
                    F.lit(1),
                ),
                F.lit(999999),
            ).cast("long").alias("t"),
        ).localCheckpoint(eager=True)

    return win.select(
        "cluster",
        "attr",
        F.col("win.value").alias("value"),
        F.col("win.conf").alias("confidence"),
        F.round(F.col("win.conf") / F.col("total_conf"), 6).alias(
            "support"
        ),
    )


def cluster_cohesion(
    assignment: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    cluster_col: str = "cluster_id",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-cluster cohesion report: how much direct match evidence holds
    each transitive cluster together.  Connected components certify only
    a spanning tree — a chained cluster (a~b, b~c, but a and c share
    nothing) has density near the n−1 tree floor, a genuine entity's
    near-clique sits near 1.0.  This is the report you read to decide
    which clusters to re-form with ``star_clusters`` or route to
    clerical review (Hassanzadeh et al. VLDB'09 use exactly this
    density lens to compare dedup cluster generators).

    One row per non-singleton cluster: ``(cluster_id, n_members,
    n_edges, possible, density, is_tree)`` — ``n_edges`` counts distinct
    within-cluster match edges, ``possible`` = nC2, ``density`` their
    6dp ratio, ``is_tree`` flags the n−1 chain floor.

    Plan shape: edges canonicalized, each endpoint resolved by one
    node-keyed equi-join against the assignment (broadcast when the
    assignment is small, AQE otherwise), one per-cluster count, one join
    with cluster sizes.  Everything after the endpoint joins is
    cluster-count-sized.  Cross-cluster edges (endpoints resolved to
    different clusters — e.g. edges pruned away before clustering) are
    dropped; edges with an unassigned endpoint raise no error, they
    simply cannot pair.

    Determinism: counts are exact longs; density is one double division
    of two exact longs rounded 6dp (no accumulation order anywhere).
    """
    asg = assignment.select(
        F.col(node_col).alias("_n"), F.col(cluster_col).alias("_c")
    )
    e = _canonical(edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")))
    within = (
        e.join(asg.withColumnRenamed("_n", "src"), "src")
        .withColumnRenamed("_c", "_ca")
        .join(asg.withColumnRenamed("_n", "dst"), "dst")
        .withColumnRenamed("_c", "_cb")
        .filter(F.col("_ca") == F.col("_cb"))
        .select(F.col("_ca").alias(cluster_col))
    )
    edge_counts = within.groupBy(cluster_col).agg(
        F.count("*").cast("long").alias("n_edges")
    )
    sizes = (
        asg.groupBy(F.col("_c").alias(cluster_col))
        .agg(F.count("*").cast("long").alias("n_members"))
        .filter(F.col("n_members") >= 2)
    )
    joined = sizes.join(edge_counts, cluster_col, "left").withColumn(
        "n_edges", F.coalesce("n_edges", F.lit(0)).cast("long")
    )
    possible = F.call_function(
        "div", F.col("n_members") * (F.col("n_members") - 1), F.lit(2)
    )
    out = joined.withColumn("possible", possible.cast("long"))
    return out.select(
        cluster_col,
        "n_members",
        "n_edges",
        "possible",
        F.round(F.col("n_edges") / F.col("possible"), 6).alias("density"),
        (F.col("n_edges") == F.col("n_members") - 1).alias("is_tree"),
    )


def canopy_clusters(
    edges_loose: DataFrame,
    edges_tight: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 8,
    seed: str = "canopy",
) -> DataFrame:
    """Canopy clustering (McCallum, Nigam & Ungar, KDD 2000) — the
    classic cheap-metric pre-clustering: canopies OVERLAP (a record may
    belong to several), so the expensive comparison stage runs within
    canopies without the hard-partition recall loss of exclusive
    blocking.  Edge-based like the rest of the clustering menu: the
    caller supplies the LOOSE graph (cheap similarity >= T1 —
    membership) and the TIGHT graph (>= T2 — removal), from any blocker
    + cheap score; ``edges_tight`` must be a subset of ``edges_loose``
    (T2 >= T1 in similarity terms — the union is taken internally so a
    violating tight edge still grants membership).

    Deterministic sequential contract: under the md5 order ``pi(v) =
    md5('{seed}|' || v)``, sequential canopy processing (next unremoved
    point becomes a center; every point within T1 joins its canopy;
    points within T2 leave the pool) picks EXACTLY the iterated
    local-minima pivot set of the tight graph — the same
    Blelloch/Fineman/Shun argument as ``pivot_clusters``, since removal
    is "adjacent to an earlier center in E2".  So: centers = pivot
    rounds on ``edges_tight`` (one neighbor-min aggregate + two
    anti-joins per round, ``localCheckpoint``-cut), then ONE semi-join
    of the symmetrized loose graph against the center set emits the
    overlapping memberships.  After ``rounds`` rounds any still-active
    node simply never centers: it keeps whatever memberships its loose
    edges to centers grant, and only if NO center is loose-adjacent
    does it fall back to a ``(v, v)`` self row (the bounded-compute
    contract the unrolled-CTE oracle replays; the loop exits early when
    the tight graph drains).

    Returns ``(node, canopy)`` — one row per membership, centers
    included as ``(c, c)``; nodes outside every canopy get ``(v, v)``."""
    if rounds < 1:
        raise ValueError("need rounds >= 1")

    def _pi(c) -> F.Column:
        return F.md5(F.concat(F.lit(f"{seed}|"), c))

    loose = _canonical(
        edges_loose.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    ).unionByName(
        _canonical(
            edges_tight.select(
                F.col(src).alias("src"), F.col(dst).alias("dst")
            )
        )
    ).distinct()
    tight = _canonical(
        edges_tight.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    )
    lsym = (
        loose.select(F.col("src").alias("v"), F.col("dst").alias("u"))
        .union(loose.select(F.col("dst").alias("v"), F.col("src").alias("u")))
        .localCheckpoint(eager=True)
    )
    tsym = (
        tight.select(F.col("src").alias("v"), F.col("dst").alias("u"))
        .union(tight.select(F.col("dst").alias("v"), F.col("src").alias("u")))
        .localCheckpoint(eager=True)
    )
    all_nodes = lsym.select("v").distinct().localCheckpoint(eager=True)

    # tight-graph pivot rounds: centers + removal, no assignment
    sym = tsym
    # a node with loose edges but NO tight edges is never removed and
    # never blocked: it is a center by construction (sequential canopy
    # reaches it eventually) — seed the center set with them
    isolated = all_nodes.join(
        tsym.select("v").distinct(), "v", "left_anti"
    ).select(F.col("v").alias("c"))
    centers = isolated.localCheckpoint(eager=True)
    for _ in range(rounds):
        if sym.isEmpty():
            break
        pivots = _hash_local_minima(sym, _pi)
        centers = centers.unionByName(pivots)
        removed = (
            pivots.select(F.col("c").alias("node"))
            .unionByName(
                sym.join(pivots, sym["u"] == pivots["c"])
                .select(F.col("v").alias("node"))
                .distinct()
            )
            .localCheckpoint(eager=True)
        )
        prev_nodes = sym.select("v").distinct()
        sym = (
            sym.join(removed, sym["v"] == removed["node"], "left_anti")
            .join(removed, sym["u"] == removed["node"], "left_anti")
            .localCheckpoint(eager=True)
        )
        # a node whose every tight neighbor was just removed (without
        # being removed itself) can never be blocked again: sequential
        # canopy centers it when reached — add it now (removed nodes
        # never center, so these are mutually consistent)
        newly_isolated = (
            prev_nodes.join(
                removed, prev_nodes["v"] == removed["node"], "left_anti"
            )
            .join(sym.select("v").distinct(), "v", "left_anti")
            .select(F.col("v").alias("c"))
            .localCheckpoint(eager=True)
        )
        centers = centers.unionByName(newly_isolated)
    centers = centers.localCheckpoint(eager=True)

    member = lsym.join(
        centers, lsym["u"] == centers["c"]
    ).select(F.col("v").alias("node"), F.col("c").alias("canopy"))
    self_rows = centers.select(
        F.col("c").alias("node"), F.col("c").alias("canopy")
    )
    covered = member.select("node").unionByName(
        self_rows.select("node")
    ).distinct()
    stranded = all_nodes.join(
        covered, all_nodes["v"] == covered["node"], "left_anti"
    ).select(F.col("v").alias("node"), F.col("v").alias("canopy"))
    return member.unionByName(self_rows).unionByName(stranded).distinct()


def merge_center_clusters(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 8,
    seed: str = "pivot",
) -> DataFrame:
    """Merge-Center clustering (Hassanzadeh, Chiang, Lee & Miller,
    "Framework for Evaluating Clustering Algorithms in Duplicate
    Detection", VLDB 2009) — the middle ground between center/pivot
    clustering (radius 1, may over-split an entity whose records spread
    past one center) and connected components (radius unbounded, chains
    entities): start from the deterministic ``pivot_clusters``
    assignment, then MERGE clusters whenever a member is match-adjacent
    to ANOTHER cluster's center, taking the transitive closure of those
    merges.  A singleton cluster's center is itself (MC semantics: every
    cluster has a center), so the center set is exactly
    ``{c : assign(c) = c}``.

    Plan: the pivot rounds, one equi-join of the symmetrized edge list
    against the center set + one assignment join to emit cluster-merge
    edges (a CLUSTER-count-sized graph, not record-sized), then
    ``connected_components`` over it and one relabel join.  Clusters
    touched by no merge edge keep their pivot label (left join +
    coalesce).  Deterministic end-to-end: pivot order is md5, merged
    labels are the lexicographic min cluster id.

    Returns ``(node, cluster)`` for every node in the edge list, same
    consumer contract as the rest of the clustering menu."""
    assign = pivot_clusters(
        edges, src=src, dst=dst, rounds=rounds, seed=seed
    ).localCheckpoint(eager=True)
    e = _canonical(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    )
    sym = e.select(F.col("src").alias("v"), F.col("dst").alias("u")).union(
        e.select(F.col("dst").alias("v"), F.col("src").alias("u"))
    )
    centers = assign.filter(F.col("node") == F.col("cluster")).select(
        F.col("node").alias("c")
    )
    to_center = sym.join(centers, sym["u"] == centers["c"]).select("v", "u")
    merge_edges = (
        to_center.join(assign, to_center["v"] == assign["node"])
        .filter(F.col("cluster") != F.col("u"))
        .select(F.col("cluster").alias("src"), F.col("u").alias("dst"))
        .distinct()
    )
    merged = connected_components(merge_edges)
    out = (
        assign.join(
            merged, assign["cluster"] == merged["node"], "left"
        )
        .select(
            assign["node"].alias("node"),
            F.coalesce(merged["component"], assign["cluster"]).alias(
                "cluster"
            ),
        )
    )
    return out
