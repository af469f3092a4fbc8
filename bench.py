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
runs the ER candidate+cluster job at local[8] and local[32] in fresh
subprocesses, computes candidate-pairs/sec at both, writes BENCH.md, and
prints the one-line JSON with the scaling numbers included.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# pages synthesized deterministically from documents: each doc yields the
# base page + 2 typo'd variants (1 deletion; 1 transposition), so ground
# truth clusters have size 3 and the ER job has real fuzzy work to do.
N_VARIANTS = 3


def _spark(cores: str):
    from orchid_fst_spark.session import get_spark

    return get_spark(
        app_name=f"bench_local_{cores}",
        cores=cores,
        shuffle_partitions=max(int(cores) * 2, 8),
    )


def _pages(spark, sf_dir: str):
    """Deterministic bench pages table (url, warc_ts, html, text, lang)
    derived from documents: base + deletion variant + transposition
    variant of a 24-char title slug — pure Catalyst, no Python."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    title = F.regexp_replace(F.substring("text", 1, 24), " ", "-")
    t_del = F.concat(F.substring(title, 1, 7), F.substring(title, 9, 24))
    t_swap = F.concat(
        F.substring(title, 1, 4),
        F.substring(title, 6, 1),
        F.substring(title, 5, 1),
        F.substring(title, 7, 24),
    )
    variants = [("0", title), ("1", t_del), ("2", t_swap)][:N_VARIANTS]
    parts = []
    for tag, t in variants:
        parts.append(
            docs.select(
                F.concat(
                    F.lit("https://"), F.col("source"), F.lit(".example.com/"),
                    t, F.lit("?id="), F.col("doc_id"), F.lit("&v=" + tag),
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
    pages = _pages(spark, sf_dir).cache()
    pages.count()
    norm = normalize_pages(pages).select("url", "norm_key")

    # warm-up (untimed): same plan shape, full data
    n_pairs = candidate_pairs(norm, k=2, damerau=True).count()

    times = []
    for _ in range(trials):
        t0 = time.time()
        candidate_pairs(norm, k=2, damerau=True).count()
        times.append(time.time() - t0)
    t_pairs = statistics.median(times)

    t1 = time.time()
    clusters = resolve(pages, k=2, damerau=True)
    n_rows = clusters.count()
    t_resolve = time.time() - t1
    pages.unpersist()
    return {
        "pages": n_rows,
        "candidate_pairs": n_pairs,
        "pairs_per_sec": round(n_pairs / t_pairs, 1) if t_pairs else None,
        "candidate_sec": round(t_pairs, 3),
        "candidate_sec_all_trials": [round(t, 3) for t in times],
        "resolve_sec": round(t_resolve, 3),
    }


def bench_queries(spark, sf_dir: str) -> dict:
    """Headline per-operator timings (seconds)."""
    import __spark_entry__ as entrymod

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
        "cosine_lsh_pairs",
        "token_stats",
        "lang_id_counts",
    ]
    out = {}
    for name in headline:
        t0 = time.time()
        qs[name](spark, sf_dir).count()
        out[name] = round(time.time() - t0, 3)
    return out


def run_single(cores: str, sf_dir: str, er_only: bool = False) -> dict:
    spark = _spark(cores)
    try:
        t0 = time.time()
        er = bench_er(spark, sf_dir)
        res = {"er_pipeline": er}
        if not er_only:
            res["queries"] = bench_queries(spark, sf_dir)
        res["total_sec"] = round(time.time() - t0, 3)
        return res
    finally:
        spark.stop()


def run_scaling(sf_dir: str) -> dict:
    """Same job at local[8] and local[32]; efficiency = speedup / 4."""
    results = {}
    for cores in ("8", "32"):
        env = dict(os.environ)
        env.update(
            SPARK_GRAFT_SF_DIR=sf_dir,
            SPARK_GRAFT_CPUS=cores,
            _BENCH_CHILD="er_only",
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            timeout=1800,
        )
        line = out.stdout.strip().splitlines()[-1]
        results[cores] = json.loads(line)["er_pipeline"]
    tp8 = results["8"]["pairs_per_sec"]
    tp32 = results["32"]["pairs_per_sec"]
    eff = round((tp32 / tp8) / 4.0, 3) if tp8 else None
    scaling = {
        "local8_pairs_per_sec": tp8,
        "local32_pairs_per_sec": tp32,
        "local8_candidate_sec": results["8"]["candidate_sec"],
        "local32_candidate_sec": results["32"]["candidate_sec"],
        "local8_resolve_sec": results["8"]["resolve_sec"],
        "local32_resolve_sec": results["32"]["resolve_sec"],
        "speedup_8_to_32": round(tp32 / tp8, 3) if tp8 else None,
        "scaling_efficiency": eff,
    }
    _write_bench_md(sf_dir, scaling)
    return scaling


def _write_bench_md(sf_dir: str, s: dict) -> None:
    md = f"""# BENCH — measured throughput and scaling

Two-parallelism-level evidence for the BASELINE.json scaling criterion
(no real cluster in this sandbox: `local[8]` vs `local[32]` on the same
input stand in for N and 4N executors).

Input: pages synthesized deterministically from `{sf_dir}/documents.parquet`
(base + 2 typo variants per doc); job = deletion-signature blocking ->
banded-DP verify (candidate pairs), then full resolve (score + connected
components).

| metric | local[8] | local[32] |
|---|---|---|
| candidate-pairs/sec | {s['local8_pairs_per_sec']} | {s['local32_pairs_per_sec']} |
| candidate stage sec | {s['local8_candidate_sec']} | {s['local32_candidate_sec']} |
| full resolve sec | {s['local8_resolve_sec']} | {s['local32_resolve_sec']} |

Speedup 8 -> 32 cores: **{s['speedup_8_to_32']}x**  ->  scaling
efficiency (speedup / 4): **{s['scaling_efficiency']}** (target >= 0.8).
"""
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.md"), "w") as f:
        f.write(md)


def main() -> None:
    if os.environ.get("_BENCH_CHILD") == "er_only":
        res = run_single(CPUS, SF_DIR, er_only=True)
        print(json.dumps(res))
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
    }
    if scaling:
        payload["scaling"] = run_scaling(SF_DIR)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
