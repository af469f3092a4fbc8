"""String-similarity kernels for the pairwise scoring stage.

``jaro_winkler`` mirrors DuckDB's ``jaro_winkler_similarity`` exactly
(standard Jaro; Winkler boost p=0.1 over up to 4 common prefix chars,
applied only when Jaro > 0.7; empty input -> 0.0) so the DuckDB oracle
can cross-check the scoring stage value-for-value.
"""

from __future__ import annotations

import math
import re

import numpy as np

_ME_SEP = re.compile(r"[/-]")


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


def _me_tokens(s: str) -> list[str]:
    """score_pairs' tokenization: '/-' -> space, split on whitespace runs
    (DuckDB twin: string_split_regex(trim(regexp_replace(s,'[/-]',' ','g')),
    '\\s+') filtered of empties)."""
    return _ME_SEP.sub(" ", s or "").split()


def _me_oneway(xs: list[str], ys: list[str]) -> float:
    """mean over x in xs of max over y in ys of JW(x, y).

    Cross-engine determinism (the CLAUDE.md integer-fixpoint recipe):
    each inner JW is fixed to a 6dp integer via floor(jw*1e6 + 0.5) —
    jw itself is bit-exact vs DuckDB's jaro_winkler_similarity — the
    per-token maxima and their sum are exact integer arithmetic, and the
    single final division of identical integers is IEEE-deterministic,
    so no float rounding is ever needed and the oracle hash-matches."""
    if not xs or not ys:
        return 0.0
    total = 0
    for x in xs:
        best = 0
        for y in ys:
            v = math.floor(jaro_winkler(x, y) * 1e6 + 0.5)
            if v > best:
                best = v
        total += best
    return total / (1e6 * len(xs))


def monge_elkan(a: str, b: str) -> float:
    """Symmetric Monge-Elkan similarity (Monge & Elkan, KDD 1996): token
    both strings, average each left token's best Jaro-Winkler match on
    the right, and take the max of the two directions — the classic ER
    hybrid measure for multi-word names where token order and extra
    tokens (middle names, suffixes) break whole-string edit distance.
    The reference's fuzzy matching is whole-key (automaton.cpp); this is
    the field-level companion the derived ER pipeline adds."""
    ta, tb = _me_tokens(a), _me_tokens(b)
    return max(_me_oneway(ta, tb), _me_oneway(tb, ta))


def batch_monge_elkan(left, right) -> np.ndarray:
    """Per-pair loop inside an Arrow batch — post-blocking pairs only;
    cost is O(|ta|*|tb|) JW calls per pair."""
    out = np.empty(len(left), dtype=np.float64)
    for i, (a, b) in enumerate(zip(left, right)):
        out[i] = monge_elkan(a or "", b or "")
    return out


_SOFT_TFIDF_THETA6 = 900000  # theta = 0.9, the paper's setting, as a 6dp int


def _l2_norm(ws) -> float:
    """sqrt of the sequential left fold of squares over the array order
    (0.0 + w0² + w1² + ...) — the 0.0 seed is an exact no-op on the
    non-negative squares, so this equals DuckDB's seedless
    ``list_reduce([w*w ...], (x,y) -> x+y)`` bit-for-bit; IEEE sqrt is
    correctly rounded in both engines."""
    acc = 0.0
    for w in ws:
        acc = acc + w * w
    return math.sqrt(acc)


def soft_tfidf(ta, wa, tb, wb, theta6: int = _SOFT_TFIDF_THETA6) -> float:
    """Soft TF-IDF similarity (Cohen, Ravikumar & Fienberg, IJCAI 2003
    workshop — the best-performing hybrid in their name-matching study):
    over L2-normalized TF-IDF token weights, every left token whose best
    Jaro-Winkler match on the right reaches theta contributes
    ``V(w,S) · V(v*,T) · JW(w,v*)``.  Corpus-frequency weighting is what
    Monge-Elkan lacks: a shared stopword ("inc", "ltd") contributes
    almost nothing while a shared rare surname dominates.

    Inputs are PARALLEL arrays: tokens sorted ascending with their
    6dp-rounded raw TF-IDF weights aligned (er/scoring.weighted_tokens
    builds them).  Determinism contract (cross-engine): norms via the
    sequential fold (``_l2_norm``); the best match maximizes the 6dp
    integer fixpoint of JW with the FIRST maximum in token order kept
    (arrays sorted ⇒ lexicographically smallest tie-break); each term is
    ``((wx/na) * (wy/nb)) * (jw6/1e6)`` fixed to a 1e9 integer; the sum
    is exact-integer, one final IEEE division."""
    if ta is None or tb is None or len(ta) == 0 or len(tb) == 0:
        return 0.0
    na, nb = _l2_norm(wa), _l2_norm(wb)
    total = 0
    for x, wx in zip(ta, wa):
        best = -1
        best_w = 0.0
        for y, wy in zip(tb, wb):
            v = math.floor(jaro_winkler(x, y) * 1e6 + 0.5)
            if v > best:
                best = v
                best_w = wy
        if best >= theta6:
            term = ((wx / na) * (best_w / nb)) * (best / 1e6)
            total += math.floor(term * 1e9 + 0.5)
    return total / 1e9


def batch_soft_tfidf(ta, wa, tb, wb) -> np.ndarray:
    """Per-pair loop inside an Arrow batch over parallel token/weight
    arrays — post-blocking pairs only (O(|ta|·|tb|) JW calls each)."""
    out = np.empty(len(ta), dtype=np.float64)
    for i in range(len(ta)):
        out[i] = soft_tfidf(ta[i], wa[i], tb[i], wb[i])
    return out
