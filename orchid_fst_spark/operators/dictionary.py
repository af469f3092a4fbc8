"""Dictionary query API — the reference's query surface, Spark-first.

Reference semantics re-expressed as Catalyst plans wherever a built-in
exists (exact/prefix/range lookups are pushed-down predicates; parquet
min-max row-group skipping plays the role of the FST's SeekMin /
ExceededBy bound seek, fst.cpp:428-468, 511-514).  Only fuzzy matching
needs custom compute:

- single-query fuzzy: compiled Levenshtein/OSA DFA (driver-side, cheap)
  shipped in a closure and intersected with a per-partition trie inside
  ``mapInPandas`` (the reference's automaton ∩ FST DFS, fst.cpp:471-524);
  or, for plain Levenshtein, the JVM built-in ``F.levenshtein`` with
  threshold (banded) — Catalyst-only, usually the fastest at scale.

- fuzzy *join* / self-pairs (the ER candidate generator): SymSpell-style
  deletion-neighborhood signatures + equi-join + exact DP verify.  Pure
  shuffle ops: explode -> join -> dedup -> vectorized verify; no per-key
  DFA compile, linear in data size, AQE/salting-friendly — this is the
  path that survives 100 TB.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..automata.lev_dfa import compile_dfa
from ..automata.trie import Trie, deletion_variants, trie_dfa_matches
from ..functions.distance import batch_levenshtein


# ---------------------------------------------------------------------------
# build side
# ---------------------------------------------------------------------------

def build_dict(
    df: DataFrame,
    key_col: str,
    value_col: str | None = None,
    dedup: str = "max",
    order_col: str | None = None,
) -> DataFrame:
    """Build the logical dictionary: distinct keys, blank keys dropped
    (reference skips empty lines, fst_cmd.cpp:144), duplicate keys
    collapsed.  The reference's own policy is last-wins in file order
    (FstBuilder::Insert updates the value in place on a repeated key,
    fst.cpp:180-189): pass ``dedup='last'`` with an ``order_col``
    carrying the input order (e.g. a line id) to reproduce it exactly —
    one ``max_by(value, order)`` aggregate, still map-side combinable.
    In a bare DataFrame there is no insertion order, so without an
    order column the caller picks a deterministic policy instead:
    'max' | 'min' | 'sum' over the value."""
    out = df.select(
        F.col(key_col).alias("key"),
        *([F.col(value_col).cast(LongType()).alias("value")] if value_col else []),
        *([F.col(order_col).alias("_ord")] if order_col else []),
    )
    out = out.filter(F.length(F.trim(F.col("key"))) > 0)
    if value_col:
        if dedup == "last":
            if order_col is None:
                raise ValueError("dedup='last' requires an order_col")
            return out.groupBy("key").agg(
                F.max_by("value", "_ord").alias("value")
            )
        agg = {"max": F.max, "min": F.min, "sum": F.sum}[dedup]
        return out.groupBy("key").agg(agg("value").alias("value"))
    return out.drop("_ord").distinct() if order_col else out.distinct()


# ---------------------------------------------------------------------------
# Catalyst-native lookups (Q2-Q5, E4-E6)
# ---------------------------------------------------------------------------

def match_lookup(dict_df: DataFrame, query: str) -> DataFrame:
    """Exact match (reference StrAutomaton, automaton.cpp:53-82)."""
    return dict_df.filter(F.col("key") == F.lit(query))


def prefix_lookup(dict_df: DataFrame, prefix: str) -> DataFrame:
    """Prefix enumeration (PrefixAutomaton, automaton.cpp:185-213);
    startswith is pushed to the parquet scan as a StringStartsWith filter."""
    return dict_df.filter(F.col("key").startswith(prefix)).orderBy("key")


def range_lookup(
    dict_df: DataFrame,
    lo: str | None = None,
    hi: str | None = None,
    lo_inclusive: bool = True,
    hi_inclusive: bool = True,
) -> DataFrame:
    """Range enumeration with the reference's 4 bound flavors
    (gt/ge/lt/le, fst_cmd.cpp:96-101; FstIterBound fst.h:329-388)."""
    out = dict_df
    if lo is not None:
        out = out.filter(
            F.col("key") >= F.lit(lo) if lo_inclusive else F.col("key") > F.lit(lo)
        )
    if hi is not None:
        out = out.filter(
            F.col("key") <= F.lit(hi) if hi_inclusive else F.col("key") < F.lit(hi)
        )
    return out.orderBy("key")


# ---------------------------------------------------------------------------
# fuzzy lookup (Q6, Q7, E7)
# ---------------------------------------------------------------------------

def fuzzy_lookup(
    dict_df: DataFrame,
    query: str,
    k: int,
    prefix_len: int = 0,
    damerau: bool = False,
    impl: str = "auto",
) -> DataFrame:
    """Enumerate keys within edit distance ``k`` of ``query``; result in
    lexicographic key order (reference GetFuzzyIterator, fst.cpp:530-553;
    enumeration order fst.cpp:471-524).

    ``prefix_len`` pins the first chars exactly (samePrefixLen) — that
    predicate is a plain ``startswith`` so Catalyst pushes it into the
    scan before any fuzzy work happens.

    impl:
      'builtin'  plain Levenshtein via JVM F.levenshtein(threshold) —
                 whole-stage codegen, zero Python.
      'dfa'      compiled DFA ∩ per-partition trie in mapInPandas —
                 reference-parity path, required for Damerau.
      'auto'     builtin for plain Levenshtein, dfa for Damerau.

    Non-BMP note: Spark 4's ``levenshtein`` (UTF8String) counts CODE
    POINTS, matching the reference's UTF-8 char granularity
    (utf8_util.cpp:78-90) even for astral-plane chars (emoji /
    surrogate pairs) — pinned by a differential test against the Python
    kernel in tests/test_distance.py, on both the full and the banded
    (threshold) form, so the builtin fast path is exact everywhere.
    """
    out = dict_df
    if prefix_len > 0:
        out = out.filter(F.col("key").startswith(query[:prefix_len]))
    if impl == "auto":
        impl = "dfa" if damerau else "builtin"

    if impl == "builtin":
        if damerau:
            raise ValueError("builtin impl supports plain Levenshtein only")
        # banded built-in: returns -1 when distance exceeds the threshold
        d = F.levenshtein(F.col("key"), F.lit(query), k)
        return out.filter((d >= 0) & (d <= k)).orderBy("key")

    dfa = compile_dfa(query, k, damerau)  # driver-side constant folding
    schema = out.schema

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..automata.lev_dfa import dfa_mask_sorted

        for pdf in batches:
            if pdf.empty:
                continue
            # sort the batch and reuse DFA states along shared prefixes
            # (the trie ∩ DFA walk without materializing a trie) — on
            # dictionary batches this replaces per-key DFA restarts with
            # per-suffix stepping; output order is restored by the final
            # orderBy anyway
            pdf = pdf[pdf["key"].notna()].sort_values("key")
            mask = dfa_mask_sorted(pdf["key"].tolist(), dfa)
            yield pdf[mask]

    return out.mapInPandas(gen, schema=schema).orderBy("key")


def fuzzy_lookup_many(
    dict_df: DataFrame,
    queries: list[str],
    k: int,
    damerau: bool = False,
) -> DataFrame:
    """Batch of fuzzy point lookups in ONE job: every query's DFA is
    compiled driver-side and all of them are evaluated against each
    sorted partition batch in a single ``mapInPandas`` pass
    (shared-prefix state reuse per query, dictionary scanned once).
    Returns (query, key[, value]) rows.

    This is the right shape when a workload has tens of point queries:
    one Spark job total, instead of paying per-job scheduling (the
    local-mode floor alone is ~0.1-0.2 s/job) once per query."""
    qs = list(dict.fromkeys(queries))
    dfas = [(q, compile_dfa(q, k, damerau)) for q in qs]
    has_value = "value" in dict_df.columns
    fields = [StructField("query", StringType()), StructField("key", StringType())]
    if has_value:
        fields.append(StructField("value", LongType()))
    schema = StructType(fields)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..automata.lev_dfa import dfa_mask_sorted

        for pdf in batches:
            if pdf.empty:
                continue
            pdf = pdf[pdf["key"].notna()].sort_values("key")
            keys = pdf["key"].tolist()
            for q, dfa in dfas:
                mask = dfa_mask_sorted(keys, dfa)
                hit = pdf[mask]
                if hit.empty:
                    continue
                out = {"query": [q] * len(hit), "key": hit["key"].tolist()}
                if has_value:
                    out["value"] = hit["value"].tolist()
                yield pd.DataFrame(out)

    return dict_df.mapInPandas(gen, schema=schema).orderBy("query", "key")


def fuzzy_enumerate_trie(
    dict_df: DataFrame,
    query: str,
    k: int,
    prefix_len: int = 0,
    damerau: bool = False,
) -> DataFrame:
    """Reference-parity enumeration: per-partition sorted trie ∩ DFA DFS
    (emits within-partition in lexicographic order like the FST iterator).
    Functionally identical to fuzzy_lookup(impl='dfa'); kept as the
    structural twin of the reference read path for the golden tests."""
    out = dict_df
    if prefix_len > 0:
        out = out.filter(F.col("key").startswith(query[:prefix_len]))
    has_value = "value" in out.columns
    dfa = compile_dfa(query, k, damerau)
    fields = [StructField("key", StringType())] + (
        [StructField("value", LongType())] if has_value else []
    )
    schema = StructType(fields)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            pdf = pdf.sort_values("key")
            trie = Trie.from_sorted(
                pdf["key"].tolist(),
                pdf["value"].tolist() if has_value else None,
            )
            hits = trie_dfa_matches(trie, dfa, with_values=has_value)
            if has_value:
                yield pd.DataFrame(hits, columns=["key", "value"])
            else:
                yield pd.DataFrame({"key": hits})

    return out.mapInPandas(gen, schema=schema).orderBy("key")


# ---------------------------------------------------------------------------
# fuzzy join / self-pairs — the scale path (candidate generation)
# ---------------------------------------------------------------------------

def _variants_df(
    df: DataFrame,
    key_col: str,
    k: int,
    max_len: int,
    scheme: str = "full",
    window: int = 16,
) -> DataFrame:
    """(key, sig: long) deletion-signature frame — fully JVM-side.

    Built as a UNION of three flat explode+project stages (0, 1, 2
    deletions) instead of one nested higher-order-function expression:
    the nested form generated pathological whole-stage code (~2.5 min of
    one-time Janino/JIT compilation per JVM, profiled at sf0.1); the
    flat form compiles instantly and runs at the same steady-state speed.

    May emit duplicate (key, sig) rows when a key has repeated chars —
    harmless: candidate pair-gen filters self-pairs and dedups pairs."""
    par = df.sparkSession.sparkContext.defaultParallelism * 2
    src = (
        df.select(F.col(key_col).alias("key"))
        .filter(F.col(key_col).isNotNull())
        .distinct()
        .repartition(par)
    )
    return variant_sigs(src, "key", k, max_len, scheme=scheme, window=window)


def variant_sigs(
    src: DataFrame,
    key_col: str,
    k: int,
    max_len: int,
    scheme: str = "full",
    window: int = 16,
) -> DataFrame:
    """Append deletion signatures: output = all ``src`` columns plus
    ``sig`` (long), one row per (row, variant).  ``key_col`` may be any
    column (string key or precomputed id is carried through untouched;
    signatures hash the truncated key).

    scheme='full': deletes of <=k chars of the whole (truncated) key —
    O(len²) signatures per key at k=2.  Best precision; right for short
    keys (word dictionaries).

    scheme='window': deletes of <=k chars of the first ``window`` chars
    PLUS deletes of <=k chars of the last ``window`` chars (salted so the
    two windows never cross-match).  O(window²) signatures per key
    regardless of key length — the scheme that survives 100 TB of long
    URL keys.  Complete for k<=2: in any alignment with <=k edits, each
    edit removes at most one char of a window's common subsequence
    (substitution/deletion directly, insertion via boundary shift), so
    LCS(s_window, t_window) >= window-k and both windows reach a common
    string with <=k deletions — i.e. two keys within distance k always
    share a window signature.  Coarser than 'full' (keys agreeing on a
    window collide), so pair precision is lower; the exact DP verify
    downstream restores correctness and ``sig_cap`` bounds hot windows.
    """
    if k > 2:
        raise ValueError("deletion signatures support k <= 2")
    if scheme not in ("full", "window"):
        raise ValueError(f"unknown signature scheme: {scheme}")
    cols = src.columns

    def _delete_parts(base: DataFrame, expr: str, salt: int) -> list[DataFrame]:
        """Sigs for <=k deletions of the string expression ``expr``
        (evaluated once into _w); salted hash keeps windows disjoint."""
        t = base.selectExpr(*cols, f"{expr} AS _w")
        parts = [t.selectExpr(*cols, f"xxhash64(_w, {salt}) AS sig")]
        if k >= 1:
            parts.append(
                t.selectExpr(
                    *cols,
                    "_w",
                    "explode(slice(sequence(1, greatest(length(_w), 1)), 1, length(_w))) AS i",
                ).selectExpr(
                    *cols,
                    "xxhash64(concat(substring(_w, 1, i-1), "
                    f"substring(_w, i+1, length(_w))), {salt}) AS sig",
                )
            )
        if k >= 2:
            parts.append(
                t.selectExpr(
                    *cols,
                    "_w",
                    "explode(slice(sequence(1, greatest(length(_w) - 1, 1)), 1, "
                    "greatest(length(_w) - 1, 0))) AS i",
                )
                .selectExpr(*cols, "_w", "i", "explode(sequence(i+1, length(_w))) AS j")
                .selectExpr(
                    *cols,
                    "xxhash64(concat(substring(_w, 1, i-1), "
                    "substring(_w, i+1, j-i-1), "
                    f"substring(_w, j+1, length(_w))), {salt}) AS sig",
                )
            )
        return parts

    base = src.selectExpr(*cols, f"substring({key_col}, 1, {max_len}) AS _kt")
    base_cols = cols + ["_kt"]
    saved_cols, cols = cols, base_cols
    if scheme == "full":
        parts = _delete_parts(base, "_kt", 0)
    else:
        w = window
        parts = _delete_parts(base, f"substring(_kt, 1, {w})", 1)
        # suffix window only when it differs from the prefix window
        tail = base.filter(f"length(_kt) > {w}")
        parts += _delete_parts(
            tail, f"substring(_kt, length(_kt) - {w} + 1, {w})", 2
        )
    cols = saved_cols
    out = parts[0].select(*cols, "sig")
    for p in parts[1:]:
        out = out.unionAll(p.select(*cols, "sig"))
    return out


def _verified_pairs(
    cand: DataFrame, k: int, damerau: bool, left: str = "key_a", right: str = "key_b"
) -> DataFrame:
    """Exact verify on candidate pairs.

    Plain Levenshtein: entirely JVM — the built-in banded
    ``F.levenshtein(a, b, k)`` (returns -1 above the threshold) IS the
    exact distance; no Python at all.

    OSA (damerau): a transposition costs at most 2 plain edits, so
    ``osa <= k  =>  lev <= 2k``; a JVM banded ``lev <= 2k`` prefilter
    eliminates the bulk of false candidates (hot blocks of similar
    titles) at codegen speed before the vectorized numpy OSA verify —
    Python only ever sees near-pairs.
    """
    a, b = F.col(left), F.col(right)
    if not damerau:
        d = F.levenshtein(a, b, k)
        return (
            cand.select(left, right, d.cast(LongType()).alias("dist"))
            .filter((F.col("dist") >= 0) & (F.col("dist") <= k))
        )

    cand = cand.filter(F.levenshtein(a, b, 2 * k) >= 0)

    out_schema = StructType(
        [
            StructField(left, StringType()),
            StructField(right, StringType()),
            StructField("dist", LongType()),
        ]
    )

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            d = batch_levenshtein(
                pdf[left].tolist(), pdf[right].tolist(), clamp=k, transpositions=True
            )
            res = pdf[[left, right]].copy()
            res["dist"] = d
            yield res[res["dist"] <= k]

    # no repartition: the upstream join/filter already distributes the
    # surviving near-pairs; an extra exchange is one more full shuffle
    return cand.mapInPandas(verify, schema=out_schema)


def _banded_routing(algo: str, k: int) -> str:
    """Resolve the blocking algo for the requested k, warning when the
    asked-for path can't carry it (reference CLI accepts -d up to 100,
    fst_cmd.cpp:103-111 — no k may be a hard reject).  deletes holds to
    k<=2, segment blocking (passjoin) to k<=MAX_K=8, anything larger
    runs the length-banded brute-force block (complete for any k; the
    O(n·m) join is the honest cost of a 9+-edit radius)."""
    import warnings

    from .passjoin import MAX_K

    if algo == "deletes" and k > 2:
        new = "passjoin" if k <= MAX_K else "banded"
        warnings.warn(
            f"deletion signatures support k<=2; routing k={k} through "
            f"{'segment blocking' if new == 'passjoin' else 'length-banded brute force'}"
        )
        return new
    if algo == "passjoin" and k > MAX_K:
        warnings.warn(
            f"segment blocking supports k<={MAX_K}; routing k={k} through "
            "length-banded brute force"
        )
        return "banded"
    return algo


def _banded_join_candidates(lk: DataFrame, rk: DataFrame, k: int) -> DataFrame:
    """Brute-force-within-length-band candidate ids for k beyond the
    segment-blocking ceiling: every right key fans out to the 2k+1
    length buckets its partners can occupy, then an equi-join on bucket.
    O((2k+1)·|right|) fan-out and O(n·m) worst-case join rows within a
    band — the documented fallback, not the scale path."""
    lb = lk.select(F.col("kid").alias("kid_l"), F.length("key").alias("b"))
    rb = rk.select(
        F.col("kid").alias("kid_r"),
        F.explode(
            F.sequence(
                F.greatest(F.length("key") - k, F.lit(0)), F.length("key") + k
            )
        ).alias("b"),
    )
    return lb.join(rb, "b").select("kid_l", "kid_r").distinct()


def fuzzy_join(
    left_df: DataFrame,
    right_df: DataFrame,
    left_key: str,
    right_key: str,
    k: int = 2,
    damerau: bool = False,
    max_len: int = 64,
    algo: str = "deletes",
    scheme: str = "full",
    window: int = 16,
    sig_cap: int = 1000,
    assume_unique: bool = False,
) -> DataFrame:
    """All (left, right) key pairs within edit distance k.  Returns
    (key_a, key_b, dist).

    ``assume_unique=True`` skips the defensive per-side ``distinct()``
    when the caller's key columns are already unique (e.g. outputs of a
    groupBy) — at corpus scale each skipped distinct is a full shuffle
    of the side.  Duplicate keys under the flag produce duplicate pairs.

    algo='deletes' (default; short keys): explode deletion signatures
    both sides -> hot-sig cap -> equi-join on signature -> distinct
    pairs -> verify.  algo='passjoin' (long keys / streaming
    increments): segment blocking both directions
    (operators/passjoin.passjoin_join_candidates) — O(1) signature rows
    per key.  Both paths shuffle 8-byte xxhash64 key ids, never the key
    strings (the strings rejoin only for the final verify), and both cap
    hot signatures at ``sig_cap`` per side — a degenerate signature
    (e.g. the empty-string delete of 1-char keys, or a crawl-dominating
    segment) would otherwise blow up the equi-join O(nl·nr).

    k routing: deletes carries k<=2, passjoin k<=8; a larger k warns and
    falls back to the length-banded brute-force block (complete for any
    k — mirrors the reference CLI's -d 0..100 range)."""
    algo = _banded_routing(algo, k)
    lk = left_df.select(F.col(left_key).alias("key")).filter(
        F.col(left_key).isNotNull()
    )
    rk = right_df.select(F.col(right_key).alias("key")).filter(
        F.col(right_key).isNotNull()
    )
    if not assume_unique:
        lk, rk = lk.distinct(), rk.distinct()
    lk = lk.withColumn("kid", F.xxhash64("key"))
    rk = rk.withColumn("kid", F.xxhash64("key"))
    if algo == "banded":
        cand_ids = _banded_join_candidates(lk, rk, k)
    elif algo == "passjoin":
        from .passjoin import passjoin_join_candidates

        cand_ids = passjoin_join_candidates(
            lk, rk, k=k, max_len=max_len, sig_cap=sig_cap
        )
    else:
        # single-shuffle grouped candidates (mirror of
        # grouped_self_candidates): both sides' signature explodes union
        # into ONE frame, groupBy(sig) collects per-side id arrays as
        # REAL aggregate outputs (collect_list skips the nulls the
        # other side's when() produces), the per-side hot cap applies
        # on those attributes, and the cross-side pair expansion is two
        # successive explodes — each array referenced exactly once,
        # outside any lambda.  The previous shape (F.filter('xs', ...)
        # arrays referenced inside nested F.transform lambdas) hit the
        # CollapseProject HOF re-inline trap: Catalyst re-evaluated the
        # filter once per element of the outer array, O(|lefts|·|xs|)
        # per group — measured as the 2x fuzzy_join_parts regression in
        # BENCH_r02.
        lv = variant_sigs(
            lk.select("kid", "key"), "key", k, max_len, scheme=scheme, window=window
        ).select("sig", F.col("kid").alias("id"), F.lit(0).alias("side"))
        rv = variant_sigs(
            rk.select("kid", "key"), "key", k, max_len, scheme=scheme, window=window
        ).select("sig", F.col("kid").alias("id"), F.lit(1).alias("side"))
        grouped = (
            lv.unionAll(rv)
            .groupBy("sig")
            .agg(
                F.array_distinct(
                    F.collect_list(F.when(F.col("side") == 0, F.col("id")))
                ).alias("lefts"),
                F.array_distinct(
                    F.collect_list(F.when(F.col("side") == 1, F.col("id")))
                ).alias("rights"),
            )
        )
        # per-side hot-signature cap (observable recall trade, mirror of
        # the passjoin/self-pairs caps): a sig carried by > sig_cap keys
        # on either side drops the whole group
        grouped = grouped.filter(
            (F.size("lefts") >= 1)
            & (F.size("rights") >= 1)
            & (F.size("lefts") <= sig_cap)
            & (F.size("rights") <= sig_cap)
        )
        cand_ids = (
            grouped.select(F.explode("lefts").alias("kid_l"), "rights")
            .select("kid_l", F.explode("rights").alias("kid_r"))
            .distinct()
        )
    cand = (
        cand_ids.join(
            lk.select(F.col("kid").alias("kid_l"), F.col("key").alias("key_a")),
            "kid_l",
        )
        .join(
            rk.select(F.col("kid").alias("kid_r"), F.col("key").alias("key_b")),
            "kid_r",
        )
        .select("key_a", "key_b")
    )
    return _verified_pairs(cand, k, damerau)


def grouped_self_candidates(variants: DataFrame, sig_cap: int = 1000) -> DataFrame:
    """Candidate pairs from a (key, sig) variants frame in ONE shuffle:
    groupBy(sig) -> collect keys -> explode in-group pairs.  Groups
    hotter than ``sig_cap`` are dropped (skew cap — a degenerate
    signature would contribute O(cap²) pairs); the drop is observable
    via blocking metrics, never silent.

    Delegates to ``operators.dedup.grouped_bucket_pairs`` (the one
    definition of the grouped cap-and-expand shape): its two-Generate
    expansion streams pairs row-by-row instead of materializing the
    O(cap²) pair array per group that the previous nested-transform
    flatten built, and self-pairs from duplicate variants of one key
    are filtered the same way."""
    from .dedup import grouped_bucket_pairs

    return grouped_bucket_pairs(
        variants.select(F.col("key").alias("id"), F.col("sig").alias("bucket")),
        sig_cap,
    ).select(F.col("id_a").alias("key_a"), F.col("id_b").alias("key_b"))


def fuzzy_self_pairs(
    df: DataFrame,
    key_col: str,
    k: int = 2,
    damerau: bool = False,
    max_len: int = 64,
    sig_cap: int = 1000,
    scheme: str = "full",
    window: int = 16,
    algo: str = "deletes",
) -> DataFrame:
    """Distinct unordered key pairs (a < b) within edit distance k — the
    ER blocking candidate generator over one table.  algo='passjoin'
    switches to segment blocking (O(1) signatures per key; long keys);
    its blocking shuffles carry 8-byte xxhash64 ids, not key strings
    (long web keys would make every shuffle ~10x heavier; a hash
    collision only ever costs an extra DP verify after the id->key
    join-back, never a wrong pair).

    k routing: deletes carries k<=2, passjoin k<=8; a larger k warns and
    falls back to the length-banded brute-force block (complete for any
    k — mirrors the reference CLI's -d 0..100 range)."""
    algo = _banded_routing(algo, k)
    if algo in ("passjoin", "banded"):
        keymap = (
            df.select(F.col(key_col).alias("key"))
            .filter(F.col(key_col).isNotNull())
            .distinct()
            .withColumn("kid", F.xxhash64("key"))
        )
        if algo == "banded":
            cand_ids = (
                _banded_join_candidates(keymap, keymap, k)
                .filter(F.col("kid_l") < F.col("kid_r"))
                .select(
                    F.col("kid_l").alias("key_a"), F.col("kid_r").alias("key_b")
                )
            )
        else:
            from .passjoin import passjoin_self_candidates

            cand_ids = passjoin_self_candidates(
                keymap, k=k, max_len=max_len, sig_cap=sig_cap
            )
        cand = (
            cand_ids.join(
                keymap.select(F.col("kid").alias("key_a"), F.col("key").alias("ka")),
                "key_a",
            )
            .join(
                keymap.select(F.col("kid").alias("key_b"), F.col("key").alias("kb")),
                "key_b",
            )
            .select(
                F.least("ka", "kb").alias("key_a"),
                F.greatest("ka", "kb").alias("key_b"),
            )
        )
        return _verified_pairs(cand, k, damerau)
    v = _variants_df(df, key_col, k, max_len, scheme=scheme, window=window)
    cand = grouped_self_candidates(v, sig_cap)
    return _verified_pairs(cand, k, damerau)
