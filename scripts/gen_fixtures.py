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

from orchid_fst_spark.functions.distance import affine_gap, osa  # noqa: E402
from orchid_fst_spark.operators.bpe import reference_bpe  # noqa: E402

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]
_FIXDIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures"
)
OUT = os.path.join(_FIXDIR, "osa_scan_k2.parquet")
BPE_OUT = os.path.join(_FIXDIR, "bpe_merges.parquet")
AG_OUT = os.path.join(_FIXDIR, "affine_strm_k4.parquet")

#: affine_gap_scan entry parameters (must match __spark_entry__.py)
AG_THRESHOLD = 4


def gen_affine_fixture() -> None:
    """fixtures/affine_strm_k4.parquet: the affine-gap (Gotoh, default
    integer costs mismatch=2/open=3/extend=1) <= 4 neighborhood of
    'strm' over the union vocabulary — same superset-fixture pattern as
    the OSA oracle (DuckDB has no affine-gap function; the Spark side
    computes it live via the numpy batch kernel)."""
    import re as _re

    toks = set()
    for sf in SF_DIRS:
        p = os.path.join(sf, "documents.parquet")
        if not os.path.exists(p):
            continue
        docs = pq.read_table(p, columns=["text"])
        for text in docs.column("text").to_pylist():
            toks.update(
                t
                for t in _re.split(r"\s+", text.strip(), flags=_re.ASCII)
                if t
            )
    rows = []
    for t in sorted(toks):
        d = affine_gap(t, "strm")
        if d <= AG_THRESHOLD:
            rows.append((t, d))
    table = pa.table(
        {
            "key": pa.array([k for k, _ in rows], pa.string()),
            "dist": pa.array([d for _, d in rows], pa.int64()),
        }
    )
    pq.write_table(table, AG_OUT)
    print(f"wrote {AG_OUT}: {len(rows)} rows ({rows})")

#: bpe_merges entry parameters (must match __spark_entry__.py)
BPE_NUM_MERGES = 12
BPE_MIN_FREQ = 2


def gen_bpe_fixture() -> None:
    """fixtures/bpe_merges.parquet: the BPE merge table of each sf
    dir's documents corpus, computed with the trusted pure-Python
    ``reference_bpe`` (differentially tested vs bpe_train).  Rows carry
    the corpus's TOTAL WORD COUNT as the scale discriminator (document
    counts collide: sf0.001 and sf0.01 both hold 500 docs): the static
    oracle SQL joins on the corpus's own word count so the same SQL is
    correct at any sf (the superset-fixture pattern of the OSA oracle,
    keyed by corpus instead of by token).  Asserts the discriminator is
    unique across sf dirs."""
    import re as _re

    from collections import Counter

    n_words_col, rank_col, a_col, b_col, n_col = [], [], [], [], []
    seen_discriminators = set()
    for sf in SF_DIRS:
        p = os.path.join(sf, "documents.parquet")
        if not os.path.exists(p):
            continue
        docs = pq.read_table(p, columns=["text"])
        texts = docs.column("text").to_pylist()
        wf = Counter(
            t
            for text in texts
            for t in _re.split(r"\s+", text.strip(), flags=_re.ASCII)
            if t
        )
        n_words = sum(wf.values())
        assert n_words not in seen_discriminators, (
            f"word-count discriminator collision at {sf}: {n_words}"
        )
        seen_discriminators.add(n_words)
        merges = reference_bpe(
            dict(wf), BPE_NUM_MERGES, min_freq=BPE_MIN_FREQ
        )
        for rank, a, b, n in merges:
            n_words_col.append(n_words)
            rank_col.append(rank)
            a_col.append(a)
            b_col.append(b)
            n_col.append(n)
    table = pa.table(
        {
            "n_words": pa.array(n_words_col, pa.int64()),
            "rank": pa.array(rank_col, pa.int32()),
            "sym_a": pa.array(a_col, pa.string()),
            "sym_b": pa.array(b_col, pa.string()),
            "n": pa.array(n_col, pa.int64()),
        }
    )
    pq.write_table(table, BPE_OUT)
    print(f"wrote {BPE_OUT}: {len(rank_col)} rows over word counts "
          f"{sorted(seen_discriminators)}")


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
    gen_bpe_fixture()
    gen_affine_fixture()
