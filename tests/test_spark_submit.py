"""Deployment-shape test: the pipeline runs via ``spark-submit
--py-files`` with the package shipped as a zip, from a foreign cwd —
the exact invocation the north_rule requires on a real cluster (here at
local[2] / local[4] standing in for two cluster sizes).  Also covers
checkpoint/resume through the CLI surface."""

import json
import os
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _zip_package(tmp_path) -> str:
    zpath = str(tmp_path / "orchid_fst_spark.zip")
    pkg = os.path.join(REPO, "orchid_fst_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


@pytest.fixture(scope="module")
def pages_parquet(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    out = str(tmp_path_factory.mktemp("submit") / "pages")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(120)
    title = F.regexp_replace(F.substring("text", 1, 24), " ", "-")
    t_del = F.concat(F.substring(title, 1, 7), F.substring(title, 9, 24))
    base = docs.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/"), title,
            F.lit("?id="), F.col("doc_id"),
        ).alias("url"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("doc_id")).alias("warc_ts"),
        F.encode("text", "utf-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )
    dup = docs.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/"), t_del,
            F.lit("?id="), F.col("doc_id"), F.lit("&v=1"),
        ).alias("url"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("doc_id")).alias("warc_ts"),
        F.encode("text", "utf-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )
    base.unionAll(dup).write.mode("overwrite").parquet(out)
    return out


def _submit(zpath, pages, out_dir, ckpt, extra=(), master="local[2]", cwd="/tmp"):
    cmd = [
        "spark-submit",
        "--master", master,
        "--driver-memory", "4g",
        "--py-files", zpath,
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.ui.showConsoleProgress=false",
        os.path.join(REPO, "scripts", "run_er.py"),
        "--input", pages,
        "--output", out_dir,
        "--checkpoint-dir", ckpt,
        *extra,
    ]
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # prove the zip is the only source of the pkg
    env["PYSPARK_PYTHON"] = sys.executable
    r = subprocess.run(
        cmd, cwd=cwd, env=env, capture_output=True, text=True, timeout=600
    )
    assert r.returncode == 0, r.stderr[-3000:]
    report = json.loads(r.stdout.strip().splitlines()[-1])
    return report


def test_spark_submit_pyfiles_and_resume(tmp_path, pages_parquet):
    zpath = _zip_package(tmp_path)
    out_dir = str(tmp_path / "clusters")
    ckpt = str(tmp_path / "ckpt")

    rep = _submit(zpath, pages_parquet, out_dir, ckpt)
    assert rep["rows"] == 240
    assert 0 < rep["clusters"] <= 120
    assert rep["parallelism"] == 2

    # resume from checkpoint at the second "cluster size": identical output
    out_dir2 = str(tmp_path / "clusters2")
    rep2 = _submit(
        zpath, pages_parquet, out_dir2, ckpt, extra=("--resume",), master="local[4]"
    )
    assert rep2["parallelism"] == 4
    assert (rep2["rows"], rep2["clusters"]) == (rep["rows"], rep["clusters"])
    # metrics/lineage table exists and marks stages as resumed
    import pandas as pd

    metrics_files = [
        os.path.join(ckpt, "metrics", f)
        for f in os.listdir(os.path.join(ckpt, "metrics"))
        if f.endswith(".parquet")
    ]
    m = pd.concat([pd.read_parquet(f) for f in metrics_files])
    assert set(m[m.stage == "candidate_pairs"].resumed) == {True}
