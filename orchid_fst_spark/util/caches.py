"""Byte-budgeted LRU / LFU caches (reference C1/C2, SURVEY.md §2.5).

The reference bounds FST-build memory with a byte-budgeted LRU node map
(lru_cache.h:109-358) and ships an LFU twin (lfu_cache.h:25-503); the
cache budget trades memory for FST minimality (README.md:53-55).  In the
Spark engine the same role appears *inside executors*: bounding per-
partition memoization state in Arrow UDFs (e.g. the suffix-dedup map of
``automata.trie.minimize`` — build-side node sharing) so a hot partition
can never OOM a worker.  Pure Python, no Spark dependency; the
randomized differential test mirrors the reference's cache_unittest
(cache_unittest.cpp:41-152: identical op streams driven into LRU, LFU
and an unbounded map, stats compared).

API (reference lru_cache.h naming): ``get``/``put``/``hit_ratio``;
``size_bytes`` approximates entry cost as len(key)+len(value) the way
the reference charges string bytes.
"""

from __future__ import annotations

from collections import OrderedDict


def _cost(key, value) -> int:
    out = 0
    for v in (key, value):
        if isinstance(v, (str, bytes)):
            out += len(v)
        else:
            out += 8
    return out


class _StatsMixin:
    def hit_ratio(self) -> float:
        total = self.hits + self.misses
        return self.hits / total if total else 0.0


class LRUCache(_StatsMixin):
    """Least-recently-used, evicting until under the byte budget."""

    def __init__(self, budget_bytes: int) -> None:
        self.budget = budget_bytes
        self.data: OrderedDict = OrderedDict()
        self.size_bytes = 0
        self.hits = 0
        self.misses = 0

    def __len__(self) -> int:
        return len(self.data)

    def get(self, key, default=None):
        if key in self.data:
            self.hits += 1
            self.data.move_to_end(key)
            return self.data[key][0]
        self.misses += 1
        return default

    def put(self, key, value) -> None:
        if key in self.data:
            old_cost = self.data[key][1]
            self.size_bytes -= old_cost
            del self.data[key]
        c = _cost(key, value)
        self.data[key] = (value, c)
        self.size_bytes += c
        while self.size_bytes > self.budget and len(self.data) > 1:
            _, (_, evicted) = self.data.popitem(last=False)
            self.size_bytes -= evicted


class LFUCache(_StatsMixin):
    """Least-frequently-used with LRU tie-break (frequency-list scheme of
    lfu_cache.h — here freq counters + an OrderedDict per access order,
    same eviction policy, simpler bookkeeping)."""

    def __init__(self, budget_bytes: int) -> None:
        self.budget = budget_bytes
        self.data: dict = {}
        self.freq: dict = {}
        self.order: OrderedDict = OrderedDict()  # recency among all keys
        self.size_bytes = 0
        self.hits = 0
        self.misses = 0
        self._tick = 0

    def __len__(self) -> int:
        return len(self.data)

    def get(self, key, default=None):
        if key in self.data:
            self.hits += 1
            self.freq[key] += 1
            self.order.move_to_end(key)
            return self.data[key][0]
        self.misses += 1
        return default

    def put(self, key, value) -> None:
        if key in self.data:
            self.size_bytes -= self.data[key][1]
            c = _cost(key, value)
            self.data[key] = (value, c)
            self.size_bytes += c
            self.freq[key] += 1
            self.order.move_to_end(key)
        else:
            c = _cost(key, value)
            self.data[key] = (value, c)
            self.size_bytes += c
            self.freq[key] = 1
            self.order[key] = None
        while self.size_bytes > self.budget and len(self.data) > 1:
            # victim: lowest frequency; ties broken by least recency
            # (self.order iterates oldest-first)
            minf = min(self.freq.values())
            victim = next(k2 for k2 in self.order if self.freq[k2] == minf)
            self.size_bytes -= self.data[victim][1]
            del self.data[victim]
            del self.freq[victim]
            del self.order[victim]
