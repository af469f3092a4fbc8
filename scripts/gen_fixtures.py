#!/usr/bin/env python
"""Regenerate checked-in oracle fixture tables.

fixtures/osa_scan_k2_sf001.parquet: the OSA (restricted-Damerau) <= 2
neighborhood of 'scan' over the sf0.01 token dictionary, computed with
the pure-Python DP ``functions.distance.osa`` — the implementation the
randomized differential suite (tests/test_distance.py) validates against
brute force.  DuckDB has no OSA function, so its oracle for the
``fuzzy_osa_k2`` entry joins this precomputed truth instead; the Spark
side still computes OSA live (JVM banded-Levenshtein prefilter + numpy
kernel), so the cross-check is DP-truth vs engine, not engine vs itself.

Deterministic: depends only on /root/testdata/sf0.01/documents.parquet
(read-only driver data) and the DP.  Rerun after any testdata refresh:

    python scripts/gen_fixtures.py
"""

import os
import re
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from orchid_fst_spark.functions.distance import osa  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "fixtures", "osa_scan_k2_sf001.parquet")


def main() -> None:
    docs = pq.read_table(os.path.join(SF_DIR, "documents.parquet"), columns=["text"])
    toks = set()
    for text in docs.column("text").to_pylist():
        # same tokenization as __spark_entry__._dict: split on \s+, drop ''
        toks.update(t for t in re.split(r"\s+", text.strip()) if t)
    rows = sorted(
        (t, osa(t, "scan")) for t in toks if osa(t, "scan") <= 2
    )
    table = pa.table(
        {
            "key": pa.array([k for k, _ in rows], pa.string()),
            "dist": pa.array([d for _, d in rows], pa.int64()),
        }
    )
    pq.write_table(table, OUT)
    print(f"wrote {OUT}: {len(rows)} rows ({rows})")


if __name__ == "__main__":
    main()
