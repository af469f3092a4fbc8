"""Driver-side Levenshtein / Damerau(OSA) DFA compiler.

Re-implements, in pure Python over Unicode code points, the semantics of
the reference's eager DFA construction (powerset over k-clamped DP rows):

- Levenshtein automaton:    /root/reference/.../automaton.cpp:261-326
- Damerau (OSA) automaton:  /root/reference/.../automaton.cpp:394-478
- k-clamp of DP cells at k+1 and the "wildcard = any char not in the
  query" alphabet reduction: automaton.cpp:283-285, 303-320
- CanMatch = any DP cell <= k: automaton.cpp:231-238
- IsMatch  = last DP cell <= k: automaton.cpp:225-229

The compiled object is a plain-Python table (lists + dicts), cheap to
pickle into a Spark closure / broadcast and to run inside an Arrow UDF.
This is the "query -> DFA constant folding" step Catalyst cannot do for
us (SURVEY.md §4), executed once per query on the driver.

The Damerau flavor is the *restricted* (OSA) recurrence, exactly as the
reference: the transposition term consults the previous DP row at k-2
(automaton.cpp:425-430) so edited substrings never overlap.  State
identity follows the reference's relaxed equality
(automaton.h:550-579): the previous row only distinguishes states when a
transposition is actually pending, which we realize by masking prevEdits
down to the positions a future transposition could read.
"""

from __future__ import annotations

from dataclasses import dataclass, field

WILDCARD = "\0"  # stands in for "any char not in the query alphabet"


@dataclass
class LevenshteinDFA:
    """Compiled DFA.  States are integers; ``trans[s]`` maps a char (or
    WILDCARD) to the next state; missing entry + missing wildcard = dead
    (prune the subtree: CanMatch is false for every extension)."""

    query: str
    k: int
    damerau: bool
    start: int
    is_match: list[bool] = field(default_factory=list)
    trans: list[dict[str, int]] = field(default_factory=list)

    def step(self, state: int, ch: str) -> int | None:
        t = self.trans[state]
        nxt = t.get(ch)
        if nxt is None:
            nxt = t.get(WILDCARD)
        return nxt

    def accepts(self, s: str) -> bool:
        st: int | None = self.start
        for ch in s:
            st = self.step(st, ch)
            if st is None:
                return False
        return self.is_match[st]

    def accepts_any_prefix(self, s: str) -> bool:
        """True iff some prefix of ``s`` (incl. '' and s itself) is
        accepted — ONE incremental walk, O(len(s)), instead of
        re-running ``accepts`` per prefix (O(len²)); this is what the
        reference's StartsWithAutomaton does with its match-seen flag
        (automaton.h:235-297)."""
        st: int | None = self.start
        if self.is_match[st]:
            return True
        for ch in s:
            st = self.step(st, ch)
            if st is None:
                return False
            if self.is_match[st]:
                return True
        return False


def dfa_mask_sorted(keys, dfa: "LevenshteinDFA") -> list[bool]:
    """Acceptance mask for a SORTED key batch, reusing DFA states along
    shared prefixes (the trie ∩ DFA walk without materializing a trie):
    for each key only the suffix after the longest common prefix with
    the previous key is stepped — on sorted dictionary batches this cuts
    the per-key work from O(len) DFA restarts to O(suffix)."""
    mask: list[bool] = []
    prev = ""
    # states[i] = DFA state after consuming prev[:i] (None = dead)
    states: list[int | None] = [dfa.start]
    for s in keys:
        lcp = 0
        m = min(len(prev), len(s))
        while lcp < m and prev[lcp] == s[lcp]:
            lcp += 1
        del states[lcp + 1 :]
        st = states[-1]
        for ch in s[lcp:]:
            st = dfa.step(st, ch) if st is not None else None
            states.append(st)
        mask.append(st is not None and dfa.is_match[st])
        prev = s
    return mask


def _lev_next_row(row: tuple[int, ...], query: str, ch: str | None, cap: int):
    """One DP step: row over query positions 0..m, clamped at cap=k+1.
    ch=None means the wildcard (matches nothing in the query)."""
    m = len(query)
    new = [min(row[0] + 1, cap)]
    for j in range(1, m + 1):
        cost = 0 if (ch is not None and query[j - 1] == ch) else 1
        d = min(row[j] + 1, new[j - 1] + 1, row[j - 1] + cost)
        new.append(min(d, cap))
    return tuple(new)


def _osa_next_row(
    row: tuple[int, ...],
    prev_row: tuple[int, ...] | None,
    prev_ch: str | None,
    query: str,
    ch: str | None,
    cap: int,
):
    """OSA step: adds the transposition term prev_row[j-2]+1 when the
    incoming char equals query[j-2] and the previous char equals
    query[j-1] (reference automaton.cpp:421-430)."""
    m = len(query)
    new = [min(row[0] + 1, cap)]
    for j in range(1, m + 1):
        cost = 0 if (ch is not None and query[j - 1] == ch) else 1
        d = min(row[j] + 1, new[j - 1] + 1, row[j - 1] + cost)
        if (
            j > 1
            and prev_row is not None
            and prev_ch is not None
            and ch is not None
            and ch == query[j - 2]
            and prev_ch == query[j - 1]
        ):
            d = min(d, prev_row[j - 2] + 1)
        new.append(min(d, cap))
    return tuple(new)


def _osa_state_key(row, prev_row, prev_ch, query):
    """Canonical state identity for the OSA automaton.

    prev_ch matters only if it occurs in the query (it can enable a
    future transposition); prev_row matters only at the positions j-2
    where a pending transposition could read it, i.e. positions p with
    query[p+1] == prev_ch (mirrors the reference's relaxed equality,
    automaton.h:561-579, but keyed structurally)."""
    if prev_ch is None or prev_ch not in query:
        return (row, None, None)
    mask = tuple(
        prev_row[p] if (prev_row is not None and query[p + 1] == prev_ch) else -1
        for p in range(len(query) - 1)
    )
    return (row, prev_ch, mask)


def compile_dfa(query: str, k: int, damerau: bool = False) -> LevenshteinDFA:
    """Powerset-compile the edit-distance automaton for ``query`` at
    max distance ``k`` into a DFA over alphabet = set(query) + wildcard."""
    cap = k + 1
    m = len(query)
    alphabet = sorted(set(query))
    start_row = tuple(min(j, cap) for j in range(m + 1))

    dfa = LevenshteinDFA(query=query, k=k, damerau=damerau, start=0)

    if not damerau:
        key0 = start_row
        states: dict = {key0: 0}
        dfa.is_match.append(start_row[m] <= k)
        dfa.trans.append({})
        payload = [start_row]  # per-state DP row
        stack = [0]
        while stack:
            sid = stack.pop()
            row = payload[sid]
            for ch in alphabet + [None]:
                new = _lev_next_row(row, query, ch, cap)
                if min(new) > k:
                    continue  # CanMatch false -> dead transition
                nid = states.get(new)
                if nid is None:
                    nid = len(payload)
                    states[new] = nid
                    payload.append(new)
                    dfa.is_match.append(new[m] <= k)
                    dfa.trans.append({})
                    stack.append(nid)
                dfa.trans[sid][WILDCARD if ch is None else ch] = nid
        return dfa

    # --- OSA / Damerau flavor ---
    key0 = _osa_state_key(start_row, None, None, query)
    states = {key0: 0}
    payload = [(start_row, None, None)]  # (row, prev_row, prev_ch)
    dfa.is_match.append(start_row[m] <= k)
    dfa.trans.append({})
    stack = [0]
    while stack:
        sid = stack.pop()
        row, prev_row, prev_ch = payload[sid]
        for ch in alphabet + [None]:
            new = _osa_next_row(row, prev_row, prev_ch, query, ch, cap)
            # CanMatch: a transposition can still rescue a row whose cells
            # all exceed k (it reads the *previous* row), so keep the state
            # if either the new row or a reachable transposition cell
            # stays within k (reference GetPossibleTranspositionStrs,
            # automaton.cpp:360-389).
            alive = min(new) <= k
            if not alive and ch is not None:
                for j in range(2, m + 1):
                    # the next char could be query[j-2], completing a
                    # transposition that reads row[j-2]
                    if query[j - 1] == ch and row[j - 2] <= k:
                        alive = True
                        break
            if not alive:
                continue
            nkey = _osa_state_key(new, row, ch, query)
            nid = states.get(nkey)
            if nid is None:
                nid = len(payload)
                states[nkey] = nid
                payload.append((new, row, ch))
                dfa.is_match.append(new[m] <= k)
                dfa.trans.append({})
                stack.append(nid)
            dfa.trans[sid][WILDCARD if ch is None else ch] = nid
    return dfa
