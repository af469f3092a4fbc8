"""Composable matcher API — the reference's automaton combinator surface.

The reference's extension point is the ``Automaton`` interface
(automaton.h:84-99): users compose Str / Prefix / GreaterThan /
LessThan / Levenshtein / Always with Intersect / Union / Not /
StartsWith (automaton.h:138-304) and hand the tree to the FST iterator.
This module is the Spark-first twin: a ``Matcher`` is a small
declarative object that

- compiles to a **Catalyst Column predicate** (``col_predicate``) so the
  common cases run JVM-side with pushdown (exact/prefix/range become
  scan filters; plain Levenshtein uses the built-in banded function);
- and to a **plain-Python predicate** (``accepts``) for use inside
  Arrow UDFs — the OSA/Damerau path, or any composition thereof, where
  no JVM builtin exists.

``match(df, matcher)`` picks the JVM path when every leaf is
JVM-expressible, else evaluates the Python predicate in one
``mapInPandas`` over the key column.  Results are ordered by key
(reference enumeration order, fst.cpp:471-524).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F

from .lev_dfa import compile_dfa


class Matcher:
    """Base: boolean predicate over a key string."""

    jvm_ok = True

    def col_predicate(self, c: Column) -> Column:
        raise NotImplementedError

    def accepts(self, s: str) -> bool:
        raise NotImplementedError

    # combinators (reference automaton.h:138-232)
    def __and__(self, other: "Matcher") -> "Matcher":
        return Intersect(self, other)

    def __or__(self, other: "Matcher") -> "Matcher":
        return Union(self, other)

    def __invert__(self) -> "Matcher":
        return Not(self)


@dataclass
class Always(Matcher):
    """AlwaysAutomaton (automaton.h:307-325)."""

    def col_predicate(self, c: Column) -> Column:
        return F.lit(True)

    def accepts(self, s: str) -> bool:
        return True


@dataclass
class Str(Matcher):
    """Exact match (StrAutomaton, automaton.cpp:53-82)."""

    query: str

    def col_predicate(self, c: Column) -> Column:
        return c == F.lit(self.query)

    def accepts(self, s: str) -> bool:
        return s == self.query


@dataclass
class Prefix(Matcher):
    """PrefixAutomaton (automaton.cpp:185-213)."""

    prefix: str

    def col_predicate(self, c: Column) -> Column:
        return c.startswith(self.prefix)

    def accepts(self, s: str) -> bool:
        return s.startswith(self.prefix)


@dataclass
class GreaterThan(Matcher):
    """Lexicographic lower bound (automaton.cpp:85-129)."""

    bound: str
    inclusive: bool = True

    def col_predicate(self, c: Column) -> Column:
        return c >= F.lit(self.bound) if self.inclusive else c > F.lit(self.bound)

    def accepts(self, s: str) -> bool:
        return s >= self.bound if self.inclusive else s > self.bound


@dataclass
class LessThan(Matcher):
    """Lexicographic upper bound (automaton.cpp:132-181)."""

    bound: str
    inclusive: bool = True

    def col_predicate(self, c: Column) -> Column:
        return c <= F.lit(self.bound) if self.inclusive else c < F.lit(self.bound)

    def accepts(self, s: str) -> bool:
        return s <= self.bound if self.inclusive else s < self.bound


class Fuzzy(Matcher):
    """LevenshteinAutomaton / DamerauLevenshteinAutomaton
    (automaton.cpp:216-326, 328-524).  Plain Levenshtein is
    JVM-expressible via the banded builtin; OSA needs the compiled DFA
    (Python path)."""

    def __init__(self, query: str, k: int, damerau: bool = False):
        self.query, self.k, self.damerau = query, k, damerau
        self.jvm_ok = not damerau
        self._dfa = compile_dfa(query, k, damerau)

    def col_predicate(self, c: Column) -> Column:
        if self.damerau:
            raise NotImplementedError("OSA has no JVM builtin")
        d = F.levenshtein(c, F.lit(self.query), self.k)
        return (d >= 0) & (d <= self.k)

    def accepts(self, s: str) -> bool:
        return self._dfa.accepts(s)


@dataclass
class Intersect(Matcher):
    """IntersectAutomaton (automaton.h:138-163)."""

    left: Matcher
    right: Matcher

    @property
    def jvm_ok(self) -> bool:  # type: ignore[override]
        return self.left.jvm_ok and self.right.jvm_ok

    def col_predicate(self, c: Column) -> Column:
        return self.left.col_predicate(c) & self.right.col_predicate(c)

    def accepts(self, s: str) -> bool:
        return self.left.accepts(s) and self.right.accepts(s)


@dataclass
class Union(Matcher):
    """UnionAutomaton (automaton.h:166-191)."""

    left: Matcher
    right: Matcher

    @property
    def jvm_ok(self) -> bool:  # type: ignore[override]
        return self.left.jvm_ok and self.right.jvm_ok

    def col_predicate(self, c: Column) -> Column:
        return self.left.col_predicate(c) | self.right.col_predicate(c)

    def accepts(self, s: str) -> bool:
        return self.left.accepts(s) or self.right.accepts(s)


@dataclass
class Not(Matcher):
    """NotAutomaton (automaton.h:212-232)."""

    inner: Matcher

    @property
    def jvm_ok(self) -> bool:  # type: ignore[override]
        return self.inner.jvm_ok

    def col_predicate(self, c: Column) -> Column:
        return ~self.inner.col_predicate(c)

    def accepts(self, s: str) -> bool:
        return not self.inner.accepts(s)


@dataclass
class StartsWith(Matcher):
    """StartsWithAutomaton (automaton.h:235-297): the inner matcher
    accepts some prefix of the key.  Python path only (requires prefix
    enumeration) except for inner matchers that are prefix-closed."""

    inner: Matcher
    jvm_ok = False

    def col_predicate(self, c: Column) -> Column:
        raise NotImplementedError("StartsWith runs on the Python path")

    def accepts(self, s: str) -> bool:
        return any(self.inner.accepts(s[:i]) for i in range(len(s) + 1))


def match(dict_df: DataFrame, matcher: Matcher, key_col: str = "key") -> DataFrame:
    """Enumerate dictionary rows accepted by ``matcher`` in key order.

    JVM path (all leaves JVM-expressible): a single Catalyst predicate —
    pushdown-friendly, whole-stage codegen.  Python path: one
    ``mapInPandas`` evaluating the composed predicate per key."""
    c = F.col(key_col)
    if matcher.jvm_ok:
        return dict_df.filter(matcher.col_predicate(c)).orderBy(key_col)

    schema = dict_df.schema

    def gen(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            mask = [
                (s is not None) and matcher.accepts(s)
                for s in pdf[key_col].tolist()
            ]
            yield pdf[mask]

    return dict_df.mapInPandas(gen, schema=schema).orderBy(key_col)
