#!/usr/bin/env python
"""Regenerate checked-in oracle fixture tables.

fixtures/osa_scan_k2.parquet: the OSA (restricted-Damerau) <= 2
neighborhood of 'scan' over the UNION of every sf dir's token
vocabulary, computed with the pure-Python DP ``functions.distance.osa``
— the implementation the randomized differential suite
(tests/test_distance.py) validates against brute force.  DuckDB has no
OSA function, so its oracle for the ``fuzzy_osa_k2`` entry joins this
precomputed truth instead; the Spark side still computes OSA live
(JVM banded-Levenshtein prefilter + numpy kernel), so the cross-check
is DP-truth vs engine, not engine vs itself.

The fixture is a SUPERSET table: it holds (key, dist) for matching
tokens from sf0.001, sf0.01 AND sf0.1, and the oracle INNER-joins it
with whichever dictionary the run builds — so the same static SQL is
correct at any of the repo's scale factors (the driver gates at
sf0.01).  Tokenization matches the engines' `\\s+` split: Python's
re.ASCII whitespace class equals Java's \\s ([ \\t\\n\\x0b\\f\\r]).

Deterministic: depends only on the read-only driver testdata and the
DP.  Rerun after any testdata refresh:

    python scripts/gen_fixtures.py
"""

import os
import re
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from orchid_fst_spark.functions.distance import osa  # noqa: E402

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "fixtures", "osa_scan_k2.parquet")


def main() -> None:
    toks = set()
    for sf in SF_DIRS:
        p = os.path.join(sf, "documents.parquet")
        if not os.path.exists(p):
            continue
        docs = pq.read_table(p, columns=["text"])
        for text in docs.column("text").to_pylist():
            # ASCII \s+ split == Java/Spark \s semantics (see module doc)
            toks.update(
                t for t in re.split(r"\s+", text.strip(), flags=re.ASCII) if t
            )
    rows = []
    for t in sorted(toks):
        d = osa(t, "scan")
        if d <= 2:
            rows.append((t, d))
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
