"""Per-partition sorted-key trie + DFA intersection, and the
deletion-neighborhood signature generator.

The trie is the executor-side stand-in for the reference's mmap'd FST
(/root/reference/.../fst.h:275-324): a shared-prefix structure over the
sorted keys of one partition/block, traversed in lockstep with a compiled
edit-distance DFA (the reference's automaton ∩ FST DFS,
fst.cpp:471-524).  Children are kept in sorted order so enumeration is
lexicographic, matching the reference's emission order.

``deletion_variants`` powers the shuffle-native candidate generator
(SymSpell-style): two strings within (Damerau-)Levenshtein distance k
share at least one variant obtained by deleting <= k chars from each —
so a join on variants is a complete candidate filter, verified exactly
afterwards.  This is the path that scales: it is pure explode + equi-join
+ dedup, no per-query DFA compile.
"""

from __future__ import annotations

from itertools import combinations

from .lev_dfa import LevenshteinDFA


class Trie:
    """Plain dict-based trie over code points; values optional (map mode
    carries the reference's uint64 value, fst.h:131)."""

    __slots__ = ("root", "n_keys")

    def __init__(self) -> None:
        self.root: dict = {}
        self.n_keys = 0

    def insert(self, key: str, value=None) -> None:
        node = self.root
        for ch in key:
            node = node.setdefault(ch, {})
        # terminal marker: empty-string slot (cannot collide with a char);
        # duplicate key overwrites -> last-wins upsert (fst.cpp:180-189)
        node[""] = value
        self.n_keys += 1

    @classmethod
    def from_sorted(cls, keys, values=None) -> "Trie":
        t = cls()
        if values is None:
            for k in keys:
                t.insert(k)
        else:
            for k, v in zip(keys, values):
                t.insert(k, v)
        return t


def trie_dfa_matches(trie: Trie, dfa: LevenshteinDFA, with_values: bool = False):
    """DFS the trie ∩ DFA product; yields matching keys (or (key, value))
    in lexicographic order (reference Iterator::Next, fst.cpp:471-524:
    prune on CanMatch-dead transitions, emit on final ∧ IsMatch).
    Iterative (explicit stack): key length never hits the Python
    recursion limit — web keys can exceed 1000 chars."""
    out: list = []
    is_match = dfa.is_match
    prefix: list = []
    # stack frames: (node, dfa_state, sorted child chars, next child idx)
    stack = [[trie.root, dfa.start, None, 0]]
    while stack:
        frame = stack[-1]
        node, state, chars, idx = frame
        if chars is None:
            chars = frame[2] = sorted(k for k in node if k)
            if "" in node and is_match[state]:
                key = "".join(prefix)
                out.append((key, node[""]) if with_values else key)
        if idx >= len(chars):
            stack.pop()
            if prefix:
                prefix.pop()
            continue
        frame[3] += 1
        ch = chars[idx]
        nxt = dfa.step(state, ch)
        if nxt is None:
            continue
        prefix.append(ch)
        stack.append([node[ch], nxt, None, 0])
    return out


def minimize(trie: Trie, cache_budget_bytes: int | None = None):
    """Suffix-sharing minimization of a built trie into a DAG (the
    reference's FreezeNode dedup, fst.cpp:96-115: identical frozen nodes
    are reused via a node-signature map).  With an unbounded map the
    result is the minimal acyclic automaton; with a byte-budgeted LRU map
    (``cache_budget_bytes``, the analog of FstBuildNodeMapType's LRU,
    fst.h:197-206) memory stays bounded and the result is *approximately*
    minimal — smaller budget => fewer shared suffixes (README.md:53-55).

    Returns (root_id, nodes, n_unique) where ``nodes[id]`` is a dict
    {char: child_id, "": value-or-None-if-terminal-marker-absent...};
    terminal info is carried in the signature so equivalence is exact.
    """
    from ..util.caches import LRUCache

    sig_map = LRUCache(cache_budget_bytes) if cache_budget_bytes else {}
    nodes: list = []
    is_dict = isinstance(sig_map, dict)

    def _freeze_done(node: dict, chars: list, child_ids: list) -> int:
        term = "" in node
        sig = (term, node.get(""), tuple(zip(chars, child_ids)))
        key = repr(sig)
        hit = sig_map.get(key)
        if hit is not None:
            return hit
        nid = len(nodes)
        frozen = dict(zip(chars, child_ids))
        if term:
            frozen[""] = node.get("")
        nodes.append(frozen)
        if is_dict:
            sig_map[key] = nid
        else:
            sig_map.put(key, nid)
        return nid

    # iterative post-order (explicit stack — key length never hits the
    # Python recursion limit): frames are
    # [node, sorted child chars, next child idx, collected child ids]
    root_node = trie.root
    stack = [[root_node, sorted(k for k in root_node if k), 0, []]]
    root = None
    while stack:
        frame = stack[-1]
        node, chars, idx, child_ids = frame
        if idx < len(chars):
            frame[2] += 1
            child = node[chars[idx]]
            stack.append([child, sorted(k for k in child if k), 0, []])
            continue
        nid = _freeze_done(node, chars, child_ids)
        stack.pop()
        if stack:
            stack[-1][3].append(nid)
        else:
            root = nid
    return root, nodes, len(nodes)


def deletion_variants(s: str, k: int, max_len: int = 64) -> list[str]:
    """All distinct strings obtained by deleting up to ``k`` code points
    from ``s`` (including ``s`` itself).  Long keys are truncated to
    ``max_len`` first — both sides of a join must use the same cap, and
    candidates are always verified with an exact DP afterwards, so the
    cap only (slightly) loosens the filter for near-identical long keys.
    """
    s = s[:max_len]
    n = len(s)
    out = {s}
    if k >= 1:
        for i in range(n):
            out.add(s[:i] + s[i + 1 :])
    if k >= 2 and n >= 2:
        for i, j in combinations(range(n), 2):
            out.add(s[:i] + s[i + 1 : j] + s[j + 1 :])
    return list(out)


def to_dot(root_id, nodes) -> str:
    """Graphviz rendering of a (minimized) trie DAG — the debug sink the
    reference ships as FstReader::DotDraw (fst.cpp:336-411).  Terminal
    nodes are doublecircle; edges are labeled with their character (and
    the value on terminal markers in map mode)."""
    lines = ["digraph fst {", "  rankdir=LR;", '  node [shape=circle];']
    for nid, node in enumerate(nodes):
        if "" in node:
            val = node[""]
            label = f"{nid}" if val is None else f"{nid}/{val}"
            lines.append(f'  n{nid} [shape=doublecircle, label="{label}"];')
    for nid, node in enumerate(nodes):
        for ch in sorted(kk for kk in node if kk):
            lines.append(f'  n{nid} -> n{node[ch]} [label="{ch}"];')
    lines.append(f'  start [shape=point]; start -> n{root_id};')
    lines.append("}")
    return "\n".join(lines)
