"""Edit-distance kernels.

Three distance flavors, all at Unicode *code-point* granularity (the
reference measures edits in UTF-8 characters, not bytes — see
/root/reference/src/main/common/common/util/utf8_util.cpp:78-90 and the
per-char automaton stepping in automaton.cpp:22-38):

- ``levenshtein``            insert / delete / substitute
- ``osa``                    restricted Damerau-Levenshtein (optimal string
                             alignment): + adjacent transposition, but a
                             substring may not be edited twice.  This is
                             the recurrence the reference's
                             DamerauLevenshteinAutomaton implements
                             (transposition term ``prevEdits[k-2] + 1`` at
                             automaton.cpp:425-430).
- ``damerau_levenshtein``    unrestricted (true) Damerau-Levenshtein.
                             Matches DuckDB's ``damerau_levenshtein`` —
                             used for DuckDB-oracle-checked queries.

Pure-Python implementations here serve as the trusted oracle for
differential tests (mirrors the reference's differential cache tests,
cache_unittest.cpp:41-96).  The numpy batch kernels are the executor-side
fast path, vectorized across a whole Arrow batch of pairs.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Pure-Python DP oracles (trusted; O(n*m) per pair)
# ---------------------------------------------------------------------------


def levenshtein(a: str, b: str) -> int:
    """Plain Levenshtein distance over code points."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def osa(a: str, b: str) -> int:
    """Restricted Damerau-Levenshtein (optimal string alignment).

    Adjacent transposition counts as one edit, but edited substrings do
    not overlap: osa("ca","abc") == 3 while true DL == 2.
    """
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if not la:
        return lb
    if not lb:
        return la
    prev2: list[int] | None = None
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i]
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            d = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if (
                i > 1
                and j > 1
                and a[i - 1] == b[j - 2]
                and a[i - 2] == b[j - 1]
            ):
                d = min(d, prev2[j - 2] + 1)  # type: ignore[index]
            cur.append(d)
        prev2, prev = prev, cur
    return prev[-1]


def damerau_levenshtein(a: str, b: str) -> int:
    """Unrestricted (true) Damerau-Levenshtein distance.

    Classic Lowrance-Wagner DP with last-occurrence bookkeeping; agrees
    with DuckDB's ``damerau_levenshtein`` (dl("ca","abc") == 2).
    """
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if not la:
        return lb
    if not lb:
        return la
    maxdist = la + lb
    da: dict[str, int] = {}
    d = [[0] * (lb + 2) for _ in range(la + 2)]
    d[0][0] = maxdist
    for i in range(la + 1):
        d[i + 1][0] = maxdist
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[0][j + 1] = maxdist
        d[1][j + 1] = j
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            k = da.get(b[j - 1], 0)
            ell = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,
                d[i + 1][j] + 1,
                d[i][j + 1] + 1,
                d[k][ell] + (i - k - 1) + 1 + (j - ell - 1),
            )
        da[a[i - 1]] = i
    return d[la + 1][lb + 1]


def affine_gap(
    a: str,
    b: str,
    *,
    mismatch: int = 2,
    gap_open: int = 3,
    gap_extend: int = 1,
) -> int:
    """Affine-gap edit distance over code points (Gotoh 1982; the
    string comparator Bilenko & Mooney KDD'03 train for duplicate
    detection): a length-L gap costs ``gap_open + (L-1)*gap_extend``,
    so one long gap — a truncation/abbreviation like "Street" → "St"
    — is cheaper than the same characters as scattered indels, which
    plain Levenshtein charges identically.

    ALL-INTEGER costs (defaults mismatch=2 < gap_open=3, extend=1) so
    results are exact in any engine — no float DP anywhere.  Requires
    ``gap_open >= gap_extend`` (the standard affine regime; the batch
    kernel's prefix-scan derivation relies on it).  With unit costs
    everywhere (mismatch=gap_open=gap_extend=1) this IS plain
    Levenshtein — the differential anchor in tests.
    """
    if gap_open < gap_extend:
        raise ValueError("affine gap requires gap_open >= gap_extend")
    la, lb = len(a), len(b)
    if la == 0:
        return 0 if lb == 0 else gap_open + (lb - 1) * gap_extend
    if lb == 0:
        return gap_open + (la - 1) * gap_extend
    big = 1 << 60
    # D/X/Y rows over j: best total, best ending in an a-gap (deletion),
    # best ending in a b-gap (insertion)
    d_prev = [0] + [gap_open + (j - 1) * gap_extend for j in range(1, lb + 1)]
    y_prev = [big] + d_prev[1:]
    x_prev = [big] * (lb + 1)
    for i in range(1, la + 1):
        ca = a[i - 1]
        x0 = gap_open + (i - 1) * gap_extend
        d_cur = [x0]
        x_cur = [x0]
        y_cur = [big]
        for j in range(1, lb + 1):
            m = d_prev[j - 1] + (0 if ca == b[j - 1] else mismatch)
            x = min(x_prev[j] + gap_extend, d_prev[j] + gap_open)
            y = min(y_cur[j - 1] + gap_extend, d_cur[j - 1] + gap_open)
            x_cur.append(x)
            y_cur.append(y)
            d_cur.append(min(m, x, y))
        d_prev, x_prev, y_prev = d_cur, x_cur, y_cur
    return d_prev[-1]


# ---------------------------------------------------------------------------
# numpy batch kernels (executor-side; vectorized across a batch of pairs)
# ---------------------------------------------------------------------------


def _encode_batch(strs) -> tuple[np.ndarray, np.ndarray]:
    """Encode a sequence of strings into a (batch, maxlen) int32 codepoint
    matrix (padded with -1) plus a length vector."""
    n = len(strs)
    lens = np.fromiter((len(s) for s in strs), dtype=np.int64, count=n)
    maxlen = int(lens.max()) if n else 0
    mat = np.full((n, maxlen), -1, dtype=np.int32)
    for i, s in enumerate(strs):
        if s:
            mat[i, : len(s)] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
    return mat, lens


def batch_levenshtein(
    left, right, *, clamp: int | None = None, transpositions: bool = False
) -> np.ndarray:
    """Levenshtein (or OSA when ``transpositions``) distance for a batch of
    string pairs, vectorized with numpy across the batch dimension.

    The DP iterates ``maxlen(left)`` row steps; each step is a handful of
    numpy ops over the whole batch — no per-row Python in the hot loop.
    When ``clamp`` is given, all cells are clamped at ``clamp + 1`` (the
    automaton's k-clamp, reference automaton.cpp:290-299) so the result
    saturates at ``clamp + 1``; use for threshold predicates.
    """
    left = list(left)
    right = list(right)
    n = len(left)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    amat, alens = _encode_batch(left)
    bmat, blens = _encode_batch(right)
    la, lb = amat.shape[1], bmat.shape[1]
    big = np.iinfo(np.int32).max // 2
    cap = big if clamp is None else clamp + 1

    # row[j] = D[i][j] over the batch; start row: D[0][j] = j (masked past blens)
    j_idx = np.arange(lb + 1, dtype=np.int32)
    prev = np.broadcast_to(j_idx, (n, lb + 1)).copy()
    np.minimum(prev, cap, out=prev)
    prev2 = None
    prev_a = None  # a[i-2] per batch element

    result = np.where(alens == 0, np.minimum(blens, cap), -1)

    rows = np.arange(n)
    for i in range(1, la + 1):
        active = alens >= i
        if not active.any():
            break
        ai = amat[:, i - 1]  # (n,)
        cost = (bmat != ai[:, None]).astype(np.int32)  # (n, lb)
        # del/sub (+ transposition) terms are batch-parallel
        base = np.minimum(prev[:, 1:] + 1, prev[:, :-1] + cost)  # (n, lb)
        if transpositions and prev2 is not None and lb >= 2:
            # a[i-1]==b[j-2] and a[i-2]==b[j-1]  ->  prev2[j-2] + 1
            tmask = np.zeros_like(cost, dtype=bool)
            tmask[:, 1:] = (bmat[:, :-1] == ai[:, None]) & (
                bmat[:, 1:] == prev_a[:, None]
            )
            tval = np.full_like(cost, big)
            tval[:, 1:] = prev2[:, :-2] + 1
            base = np.where(tmask, np.minimum(base, tval), base)
        # The insert term cur[j] = min(base[j], cur[j-1] + 1) is a prefix
        # recurrence along j: cur[j] = j + min(cur[0],
        # min_{1<=t<=j}(base[t] - t)).  Resolved with one running-min scan
        # so the whole row stays vectorized across the batch.
        g = np.concatenate(
            [np.full((n, 1), i, dtype=np.int32), base - j_idx[None, 1:]], axis=1
        )
        cur = np.minimum.accumulate(g, axis=1) + j_idx[None, :]
        np.minimum(cur, cap, out=cur)
        prev2, prev = prev, cur
        prev_a = ai
        done = alens == i
        if done.any():
            result = np.where(done, np.minimum(prev[rows, blens], cap), result)

    return result.astype(np.int64)


def batch_affine_gap(
    left,
    right,
    *,
    mismatch: int = 2,
    gap_open: int = 3,
    gap_extend: int = 1,
) -> np.ndarray:
    """Affine-gap (Gotoh) distance for a batch of string pairs,
    vectorized with numpy across the batch dimension — the
    ``batch_levenshtein`` structure with an extra X (deletion-gap) row
    carried between steps.

    The insertion-gap recurrence ``Y[j] = min(Y[j-1]+e, D[j-1]+o)``
    unrolls to ``Y[j] = min_{t<j}(D[t] + o + (j-1-t)·e)``; with
    ``o >= e`` (asserted) the combined row
    ``D[j] = min(P[j], (o-e) + j·e + min_{t<j}(D[t] - t·e))`` is ONE
    ``minimum.accumulate`` prefix scan over ``P[j] - j·e``, so each DP
    row is a handful of whole-batch numpy ops — no per-row Python in
    the hot loop.  Integer costs throughout; exact.
    """
    if gap_open < gap_extend:
        raise ValueError("affine gap requires gap_open >= gap_extend")
    left = list(left)
    right = list(right)
    n = len(left)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    amat, alens = _encode_batch(left)
    bmat, blens = _encode_batch(right)
    la, lb = amat.shape[1], bmat.shape[1]
    big = np.int64(1) << 50
    m, o, e = np.int64(mismatch), np.int64(gap_open), np.int64(gap_extend)

    j_idx = np.arange(lb + 1, dtype=np.int64)
    # row 0: D[0][j] = o + (j-1)e (j>=1); X undefined (big)
    gap0 = np.where(j_idx > 0, o + (j_idx - 1) * e, 0)
    d_prev = np.broadcast_to(gap0, (n, lb + 1)).copy()
    x_prev = np.full((n, lb + 1), big, dtype=np.int64)

    # empty-a answers up front
    result = np.where(
        alens == 0, np.where(blens > 0, o + (blens - 1) * e, 0), -1
    )

    rows = np.arange(n)
    for i in range(1, la + 1):
        if not (alens >= i).any():
            break
        ai = amat[:, i - 1]  # (n,)
        cost = np.where(bmat != ai[:, None], m, 0)  # (n, lb)
        mterm = d_prev[:, :-1] + cost  # (n, lb), j>=1
        xterm = np.minimum(x_prev[:, 1:] + e, d_prev[:, 1:] + o)  # j>=1
        p = np.minimum(mterm, xterm)  # (n, lb)
        x0 = o + (i - 1) * e  # D[i][0] == X[i][0]
        # prefix scan: g[j] = P[j] - j*e seeded with D[i][0]
        g = np.concatenate(
            [np.full((n, 1), x0, dtype=np.int64), p - j_idx[None, 1:] * e],
            axis=1,
        )
        racc = np.minimum.accumulate(g, axis=1)
        d_cur = np.empty_like(d_prev)
        d_cur[:, 0] = x0
        d_cur[:, 1:] = np.minimum(
            p, (o - e) + j_idx[None, 1:] * e + racc[:, :-1]
        )
        x_cur = np.empty_like(x_prev)
        x_cur[:, 0] = x0
        x_cur[:, 1:] = xterm
        d_prev, x_prev = d_cur, x_cur
        done = alens == i
        if done.any():
            result = np.where(done, d_prev[rows, blens], result)

    return result.astype(np.int64)


def batch_levenshtein_py(
    left, right, *, clamp: int | None = None, transpositions: bool = False
) -> np.ndarray:
    """Reference fallback: per-pair Python DP (used for differential tests
    and as a safe path for odd inputs)."""
    fn = osa if transpositions else levenshtein
    out = np.empty(len(left), dtype=np.int64)
    for i, (a, b) in enumerate(zip(left, right)):
        d = fn(a or "", b or "")
        out[i] = d if clamp is None else min(d, clamp + 1)
    return out
