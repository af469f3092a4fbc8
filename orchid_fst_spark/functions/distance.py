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
