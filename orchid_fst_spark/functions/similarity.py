"""String-similarity kernels for the pairwise scoring stage.

``jaro_winkler`` mirrors DuckDB's ``jaro_winkler_similarity`` exactly
(standard Jaro; Winkler boost p=0.1 over up to 4 common prefix chars,
applied only when Jaro > 0.7; empty input -> 0.0) so the DuckDB oracle
can cross-check the scoring stage value-for-value.
"""

from __future__ import annotations

import numpy as np


def jaro(a: str, b: str) -> float:
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    if a == b:
        return 1.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    b_taken = [False] * lb
    a_match = []
    for i, ca in enumerate(a):
        lo = max(0, i - window)
        hi = min(lb, i + window + 1)
        for j in range(lo, hi):
            if not b_taken[j] and b[j] == ca:
                b_taken[j] = True
                a_match.append(ca)
                break
    m = len(a_match)
    if m == 0:
        return 0.0
    b_match = [b[j] for j in range(lb) if b_taken[j]]
    # transpositions floored (mismatches // 2) — matches DuckDB/RapidFuzz,
    # verified by differential test against duckdb on 5000 random pairs
    t = sum(ca != cb for ca, cb in zip(a_match, b_match)) // 2
    return (m / la + m / lb + (m - t) / m) / 3.0


def jaro_winkler(a: str, b: str, p: float = 0.1, max_prefix: int = 4, boost_threshold: float = 0.7) -> float:
    sim = jaro(a, b)
    if sim <= boost_threshold:
        return sim
    prefix = 0
    for ca, cb in zip(a, b):
        if ca != cb or prefix >= max_prefix:
            break
        prefix += 1
    return sim + prefix * p * (1.0 - sim)


def batch_jaro_winkler(left, right) -> np.ndarray:
    """Per-pair loop inside an Arrow batch; pair counts are post-blocking
    so this stays off the full-table hot path."""
    out = np.empty(len(left), dtype=np.float64)
    for i, (a, b) in enumerate(zip(left, right)):
        out[i] = jaro_winkler(a or "", b or "")
    return out
