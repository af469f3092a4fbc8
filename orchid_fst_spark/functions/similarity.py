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


# ---------------------------------------------------------------------------
# numpy padded-batch kernels
# ---------------------------------------------------------------------------
# The scalar functions above are the REFERENCE kernels (bit-exact vs
# DuckDB's jaro_winkler_similarity); the batch entry points below
# vectorize the match-window scan across the whole Arrow batch (the
# batch_levenshtein pattern in functions/distance.py) and are pinned
# bit-identical to the scalar kernels by a randomized differential test
# (tests/test_distance.py).  Every float operation below reproduces the
# scalar kernel's IEEE evaluation order exactly, so the 6dp/1e9 integer
# fixpoints — and therefore the DuckDB oracle hashes — are unchanged.


def _encode_codes(strs: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Pad a batch of strings into an int32 code-point matrix (pad -1)
    plus a length vector — one C-level utf-32 encode for the whole
    batch, no per-character Python."""
    n = len(strs)
    lens = np.fromiter((len(s) for s in strs), np.int64, n)
    total = int(lens.sum())
    width = max(int(lens.max()) if n else 0, 1)
    out = np.full((n, width), -1, dtype=np.int32)
    if total:
        codes = np.frombuffer(
            "".join(strs).encode("utf-32-le"), dtype="<u4"
        ).astype(np.int32)
        rows = np.repeat(np.arange(n), lens)
        offsets = np.concatenate(([0], np.cumsum(lens)[:-1]))
        cols = np.arange(total) - np.repeat(offsets, lens)
        out[rows, cols] = codes
    return out, lens


def _batch_jaro_codes(ca, la, cb, lb) -> np.ndarray:
    """Jaro over pre-encoded code matrices, vectorized across the batch.

    The greedy match loop runs over (a-position i, b-position j) exactly
    as the scalar kernel does — j ascending within the window, first
    untaken equal char wins — but each (i, j) step is one boolean
    vector op over all pairs at once; post-blocking pairs are near
    matches, so the per-i inner scan usually exits after 1-2 steps
    (``pending.any()``)."""
    n, Ma = ca.shape
    Mb = cb.shape[1]
    sim = np.zeros(n, dtype=np.float64)
    if n == 0:
        return sim
    window = np.maximum(np.maximum(la, lb) // 2 - 1, 0)
    W = int(window.max())
    ca = np.asfortranarray(ca)  # kernel reads columns
    cb = np.asfortranarray(cb)
    taken = np.zeros((n, Mb), dtype=bool, order="F")
    amask = np.zeros((n, Ma), dtype=bool, order="F")
    for i in range(Ma):
        pending = la > i
        if not pending.any():
            break
        lo = np.maximum(i - window, 0)
        hi = np.minimum(lb, i + window + 1)
        ai = ca[:, i]
        for j in range(max(0, i - W), min(Mb, i + W + 1)):
            cond = cb[:, j] == ai
            cond &= pending
            cond &= ~taken[:, j]
            cond &= j >= lo
            cond &= j < hi
            if cond.any():
                taken[:, j] |= cond
                amask[:, i] |= cond
                pending &= ~cond
                if not pending.any():
                    break
    m = amask.sum(axis=1).astype(np.int64)
    mmax = int(m.max()) if n else 0
    if mmax == 0:
        return sim
    # align the k-th matched a-char against the k-th taken b-char via
    # cumsum-rank scatter, then floored transposition count
    A = np.full((n, mmax), -1, dtype=np.int32)
    B = np.full((n, mmax), -1, dtype=np.int32)
    ar, ac = np.nonzero(amask)
    A[ar, (np.cumsum(amask, axis=1) - 1)[ar, ac]] = ca[ar, ac]
    br, bc = np.nonzero(taken)
    B[br, (np.cumsum(taken, axis=1) - 1)[br, bc]] = cb[br, bc]
    t = ((A != B) & (A != -1)).sum(axis=1) // 2
    ok = m > 0
    with np.errstate(divide="ignore", invalid="ignore"):
        # exact scalar-kernel order: ((m/la + m/lb) + (m-t)/m) / 3.0
        s = m / la
        s = s + m / lb
        s = s + (m - t) / m
        s = s / 3.0
    sim[ok] = s[ok]
    return sim


def _batch_jw_codes(
    ca, la, cb, lb, p: float = 0.1, max_prefix: int = 4,
    boost_threshold: float = 0.7,
) -> np.ndarray:
    sim = _batch_jaro_codes(ca, la, cb, lb)
    k = min(max_prefix, ca.shape[1], cb.shape[1])
    if k > 0:
        eq = (ca[:, :k] == cb[:, :k]) & (
            np.arange(k) < np.minimum(la, lb)[:, None]
        )
        prefix = np.cumprod(eq, axis=1).sum(axis=1)
    else:
        prefix = np.zeros(len(la), dtype=np.int64)
    # scalar order: sim + (prefix * p) * (1.0 - sim), boost only > 0.7
    return np.where(
        sim > boost_threshold, sim + (prefix * p) * (1.0 - sim), sim
    )


def _intern_ids(pool: dict, strs: list[str]) -> np.ndarray:
    """Map strings to dense ids against a shared pool (insertion order
    = id order), so duplicate strings encode once and duplicate PAIRS
    compute JW once."""
    return np.fromiter(
        (pool.setdefault(s, len(pool)) for s in strs), np.int64, len(strs)
    )


def _jw_by_pair_ids(
    C: np.ndarray, L: np.ndarray, ia: np.ndarray, ib: np.ndarray,
    npool: int,
) -> np.ndarray:
    """JW over (ia[k], ib[k]) pairs of interned string ids, deduped:
    the kernel runs once per DISTINCT pair and the result is gathered
    back by inverse index.  Post-blocking ER batches repeat token
    pairs massively (shared name tokens, colliding slugs), so this is
    the big constant factor on real data — and a pure gather, so
    bit-identical to computing every row directly."""
    key = ia * np.int64(npool) + ib
    ukey, inv = np.unique(key, return_inverse=True)
    ua = ukey // npool
    ub = ukey % npool
    return _batch_jw_codes(C[ua], L[ua], C[ub], L[ub])[inv]


def batch_jaro_winkler(left, right) -> np.ndarray:
    """Whole-batch numpy Jaro-Winkler (bit-identical to the scalar
    kernel); pair counts are post-blocking so this stays off the
    full-table hot path."""
    pool: dict[str, int] = {}
    ia = _intern_ids(pool, [a or "" for a in left])
    ib = _intern_ids(pool, [b or "" for b in right])
    C, L = _encode_codes(list(pool))
    return _jw_by_pair_ids(C, L, ia, ib, len(pool))


def _me_tokens(s: str) -> list[str]:
    """score_pairs' tokenization: '/-' -> space, split on whitespace runs
    (DuckDB twin: string_split_regex(trim(regexp_replace(s,'[/-]',' ','g')),
    '\\s+') filtered of empties)."""
    return _ME_SEP.sub(" ", s or "").split()


def _me_oneway(xs: list[str], ys: list[str]) -> float:
    """mean over x in xs of max over y in ys of JW(x, y).

    Cross-engine determinism (integer-fixpoint recipe — round every
    float to a scaled integer BEFORE any max/sum so both engines
    compare identical ints):
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


def _cross_indices(nx: np.ndarray, ny: np.ndarray):
    """Flat cross-product index plumbing for per-pair token grids.

    For pairs with nx[i] x-tokens and ny[i] y-tokens (all > 0), returns
    ``(a_idx, b_idx, xg_sizes, xstarts, pstarts)`` where ``a_idx`` /
    ``b_idx`` index the FLATTENED x-/y-token arrays so that row k of
    the cross batch is (x-token a_idx[k], y-token b_idx[k]), grouped
    first by pair then by x-token with y ascending within each group —
    exactly the scalar kernels' loop order, so first-max tie-breaks
    survive vectorization."""
    cross = nx * ny
    tot = int(cross.sum())
    yoff = np.concatenate(([0], np.cumsum(ny)[:-1]))
    a_idx = np.repeat(np.arange(int(nx.sum())), np.repeat(ny, nx))
    pos = np.arange(tot) - np.repeat(
        np.concatenate(([0], np.cumsum(cross)[:-1])), cross
    )
    b_idx = np.repeat(yoff, cross) + pos % np.repeat(ny, cross)
    xg_sizes = np.repeat(ny, nx)
    xstarts = np.concatenate(([0], np.cumsum(xg_sizes)[:-1]))
    pstarts = np.concatenate(([0], np.cumsum(nx)[:-1]))
    return a_idx, b_idx, xg_sizes, xstarts, pstarts


def _me_dir_batch(TX: list[list[str]], TY: list[list[str]]) -> np.ndarray:
    """Vectorized ``_me_oneway`` over a batch of token-list pairs: one
    flat JW6 kernel call over every (pair, x, y) grid cell, per-x max
    and per-pair sum via ``reduceat``."""
    npairs = len(TX)
    res = np.zeros(npairs, dtype=np.float64)
    nx = np.fromiter((len(t) for t in TX), np.int64, npairs)
    ny = np.fromiter((len(t) for t in TY), np.int64, npairs)
    valid = (nx > 0) & (ny > 0)
    if not valid.any():
        return res
    vi = np.nonzero(valid)[0]
    nxv, nyv = nx[vi], ny[vi]
    pool: dict[str, int] = {}
    idsx = _intern_ids(pool, [t for i in vi for t in TX[i]])
    idsy = _intern_ids(pool, [t for i in vi for t in TY[i]])
    C, L = _encode_codes(list(pool))
    a_idx, b_idx, _, xstarts, pstarts = _cross_indices(nxv, nyv)
    jw = _jw_by_pair_ids(C, L, idsx[a_idx], idsy[b_idx], len(pool))
    jw6 = np.floor(jw * 1e6 + 0.5).astype(np.int64)
    # scalar starts best=0 and jw6 >= 0, so segment max == loop best
    bestx = np.maximum.reduceat(jw6, xstarts)
    totals = np.add.reduceat(bestx, pstarts)
    res[vi] = totals / (1e6 * nxv)
    return res


def batch_monge_elkan(left, right) -> np.ndarray:
    """Whole-batch numpy symmetric Monge-Elkan — post-blocking pairs
    only; one flat JW6 grid per direction instead of O(|ta|·|tb|)
    interpreted JW calls per pair.  Bit-identical to the scalar
    ``monge_elkan`` (differential-pinned)."""
    TA = [_me_tokens(a or "") for a in left]
    TB = [_me_tokens(b or "") for b in right]
    return np.maximum(_me_dir_batch(TA, TB), _me_dir_batch(TB, TA))


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


def _fold_norms(weights: list, idx: np.ndarray) -> np.ndarray:
    """Vectorized ``_l2_norm`` for the selected rows: pad each weight
    list into a matrix and fold column-by-column in sequence — padded
    zeros add ``+ 0.0*0.0``, an exact bitwise no-op on the non-negative
    accumulator, so this equals the scalar sequential fold."""
    rows = [np.asarray(weights[i], dtype=np.float64) for i in idx]
    width = max((len(r) for r in rows), default=0)
    acc = np.zeros(len(rows), dtype=np.float64)
    pad = np.zeros((len(rows), width), dtype=np.float64)
    for k, r in enumerate(rows):
        pad[k, : len(r)] = r
    for j in range(width):
        acc = acc + pad[:, j] * pad[:, j]
    return np.sqrt(acc)


def batch_soft_tfidf(ta, wa, tb, wb) -> np.ndarray:
    """Whole-batch numpy Soft TF-IDF over parallel token/weight arrays
    — post-blocking pairs only; one flat JW6 grid with first-max
    ``reduceat`` argmax instead of O(|ta|·|tb|) interpreted JW calls
    per pair.  Bit-identical to the scalar ``soft_tfidf``
    (differential-pinned); all fixpoints unchanged."""
    npairs = len(ta)
    res = np.zeros(npairs, dtype=np.float64)
    nx = np.fromiter(
        (0 if t is None else len(t) for t in ta), np.int64, npairs
    )
    ny = np.fromiter(
        (0 if t is None else len(t) for t in tb), np.int64, npairs
    )
    valid = (nx > 0) & (ny > 0)
    if not valid.any():
        return res
    vi = np.nonzero(valid)[0]
    nxv, nyv = nx[vi], ny[vi]
    pool: dict[str, int] = {}
    idsx = _intern_ids(pool, [t for i in vi for t in ta[i]])
    idsy = _intern_ids(pool, [t for i in vi for t in tb[i]])
    C, L = _encode_codes(list(pool))
    wx_flat = np.concatenate(
        [np.asarray(wa[i], dtype=np.float64) for i in vi]
    )
    wy_flat = np.concatenate(
        [np.asarray(wb[i], dtype=np.float64) for i in vi]
    )
    a_idx, b_idx, xg_sizes, xstarts, pstarts = _cross_indices(nxv, nyv)
    jw = _jw_by_pair_ids(C, L, idsx[a_idx], idsy[b_idx], len(pool))
    jw6 = np.floor(jw * 1e6 + 0.5).astype(np.int64)
    bestx = np.maximum.reduceat(jw6, xstarts)
    # FIRST index attaining the max in y order (scalar keeps the first
    # strict maximum; arrays are sorted so this is the lexicographically
    # smallest tie-break): min position among cells equal to the max
    tot = len(jw6)
    pos_in_group = np.arange(tot) - np.repeat(xstarts, xg_sizes)
    cand = np.where(
        jw6 == np.repeat(bestx, xg_sizes), pos_in_group, tot
    )
    first = np.minimum.reduceat(cand, xstarts)
    best_w = wy_flat[b_idx[xstarts + first]]
    na = _fold_norms(wa, vi)
    nb = _fold_norms(wb, vi)
    # scalar term order: ((wx/na) * (best_w/nb)) * (best/1e6), 1e9 fix
    per_x_pair = np.repeat(np.arange(len(vi)), nxv)
    t1 = wx_flat / na[per_x_pair]
    t2 = best_w / nb[per_x_pair]
    term = (t1 * t2) * (bestx / 1e6)
    int9 = np.floor(term * 1e9 + 0.5).astype(np.int64)
    int9 = np.where(bestx >= _SOFT_TFIDF_THETA6, int9, 0)
    res[vi] = np.add.reduceat(int9, pstarts) / 1e9
    return res
