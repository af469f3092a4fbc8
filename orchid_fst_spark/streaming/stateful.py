"""Custom stateful streaming operator: incremental fuzzy matching with
``applyInPandasWithState``.

The reference's incremental build (sorted keys stream in, frozen nodes
accumulate — fst.h:16-22) becomes, in streaming terms, *keyed state
holding the dictionary seen so far* that every arriving key is fuzzily
matched against.  ``foreachBatch`` incremental ER (streaming/ingest.py)
re-reads the accumulated store per batch; this operator instead keeps
the store INSIDE the engine's managed state — no external table, state
colocated with its blocking group, checkpointed and restored by
Structured Streaming itself.

Design (same discipline as the batch blocking paths):

- each arriving key explodes into its deletion signatures
  (dictionary.variant_sigs — pure Catalyst, streaming-safe): two keys
  within Levenshtein distance k <= 2 always share a signature, so
  grouping by ``sig`` gives COMPLETE candidate generation;
- ``applyInPandasWithState`` groups by signature; per-group state is
  the (bounded) list of keys that produced this signature; each new key
  is exact-DP verified against the remembered ones, emitting
  (key_a, key_b, dist) matches, then appended to state;
- a pair sharing several signatures is emitted by several groups —
  consumers ``distinct()`` (same contract as the batch candidate
  generators);
- ``state_cap`` bounds per-signature state exactly like ``sig_cap``
  bounds batch blocks: once a group holds ``state_cap`` keys, further
  arrivals in that group neither match nor accumulate (bounding BOTH
  state width and per-key DP work) — observable through emitted
  ``capped`` marker rows carrying the group's signature, never silent.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.distance import levenshtein, osa
from ..operators.dictionary import variant_sigs

MATCH_SCHEMA = StructType(
    [
        StructField("key_a", StringType()),
        StructField("key_b", StringType()),
        StructField("dist", LongType()),
        StructField("capped", BooleanType()),
        StructField("sig", LongType()),  # which group hit the cap (marker rows)
    ]
)

STATE_SCHEMA = StructType([StructField("ks", ArrayType(StringType()))])


def streaming_fuzzy_match(
    keys: DataFrame,
    key_col: str = "key",
    k: int = 2,
    damerau: bool = False,
    max_len: int = 64,
    scheme: str = "window",
    window: int = 8,
    state_cap: int = 500,
    state_ttl_minutes: int | None = None,
) -> DataFrame:
    """Match every arriving key against all previously seen keys within
    edit distance ``k``, using engine-managed keyed state.

    Returns a streaming frame of (key_a, key_b, dist, capped, sig) rows —
    key_a < key_b, duplicates possible across signature groups (consumer
    dedups; the per-pair dist is deterministic).  ``capped`` marker rows
    (null keys) report WHICH signature group hit ``state_cap`` via the
    ``sig`` column.

    Works only on streaming inputs (applyInPandasWithState is a
    streaming-only physical operator); the batch twin with identical
    pair semantics is ``operators.dictionary.fuzzy_self_pairs``.

    ``state_ttl_minutes`` bounds state LIFETIME the way ``state_cap``
    bounds its width: a signature group idle longer than the TTL is
    dropped by a processing-time timeout (keys seen before it no longer
    match — crawl-recency semantics, like the watermark in
    stream_dedup).  None keeps state forever."""
    dist_fn = osa if damerau else levenshtein
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_minutes
        else GroupStateTimeout.NoTimeout
    )

    src = keys.select(F.col(key_col).alias("key")).filter(F.col("key").isNotNull())
    sigs = variant_sigs(src, "key", k, max_len, scheme=scheme, window=window).select(
        "sig", "key"
    )

    def fn(
        group_key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        seen: list = list(state.get[0]) if state.exists else []
        ka, kb, ds, capped = [], [], [], []
        hit_cap = False
        for pdf in pdfs:
            for s in pdf["key"].tolist():
                if s in seen:
                    continue
                if len(seen) >= state_cap:
                    # capped group: stop matching AND stop accumulating —
                    # a degenerate signature must not keep paying
                    # O(state_cap) DP per arriving key (the whole point
                    # of the cap); the loss is reported via the marker
                    hit_cap = True
                    continue
                for t in seen:
                    d = dist_fn(s, t)
                    if d <= k:
                        ka.append(min(s, t))
                        kb.append(max(s, t))
                        ds.append(d)
                        capped.append(False)
                seen.append(s)
        if hit_cap:
            ka.append(None)
            kb.append(None)
            ds.append(None)
            capped.append(True)
        state.update((seen,))
        if state_ttl_minutes:
            state.setTimeoutDuration(state_ttl_minutes * 60 * 1000)
        if ka:
            sig = int(group_key[0])
            yield pd.DataFrame(
                {
                    "key_a": ka,
                    "key_b": kb,
                    "dist": ds,
                    "capped": capped,
                    # attribute marker rows to their signature group
                    "sig": [sig if c else None for c in capped],
                }
            )

    return sigs.groupBy("sig").applyInPandasWithState(
        fn,
        outputStructType=MATCH_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout_conf,
    )


# -- streaming MinHash near-dup ----------------------------------------------

NEAR_SCHEMA = StructType(
    [
        StructField("id_a", LongType()),
        StructField("id_b", LongType()),
        StructField("shared", LongType()),  # matching signature components
        StructField("capped", BooleanType()),
        StructField("bucket", StringType()),  # which bucket hit the cap
    ]
)

NEAR_STATE_SCHEMA = StructType(
    [
        StructField("ids", ArrayType(LongType())),
        StructField("sigs", ArrayType(StringType())),
    ]
)


def minhash_row_signature(text_col, n: int = 3, num_hashes: int = 8) -> list:
    """Per-row MinHash signature columns ``mh0..mh{n-1}`` as pure
    Catalyst expressions over the row's OWN shingle array — no
    explode/groupBy, so the stage is streaming-stateless and can sit
    in front of a keyed stateful operator (a streaming aggregation
    here would hit the multiple-stateful-operator restrictions).

    Componentwise EQUAL to ``operators.dedup.minhash_signatures``: min
    over a multiset equals min over its distinct set, and array_min on
    md5 hex strings is the same lexicographic min the batch aggregate
    takes.  Docs with fewer than ``n`` tokens produce NULL components
    (no shingles — the batch groupBy drops them the same way); filter
    ``mh0 IS NOT NULL`` before banding.

    Cost note: Catalyst re-inlines the shingle-array expression once
    per hash column — a bounded ``num_hashes``x recompute of the
    tokenize (constant-factor; NOT the per-element O(n²) HOF re-inline
    trap, because the array is only ever the transform's input
    collection, never referenced inside another lambda's body)."""
    from ..functions.normalize import tokens

    toks = tokens(F.col(text_col) if isinstance(text_col, str) else text_col)
    sh = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - n + 1),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return [
        F.array_min(
            F.transform(sh, lambda x: F.md5(F.concat(F.lit(f"{s}|"), x)))
        ).alias(f"mh{s}")
        for s in range(num_hashes)
    ]


def streaming_minhash_candidates(
    docs: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    state_cap: int = 5000,
    state_ttl_minutes: int | None = None,
) -> DataFrame:
    """Streaming near-duplicate candidate pairs: every arriving doc is
    banded into the SAME MinHash band buckets as the batch
    ``minhash_lsh_pairs`` and compared against all docs previously seen
    in each bucket, held as engine-managed keyed state.

    Returns a streaming frame of (id_a, id_b, shared, capped, bucket)
    rows — id_a < id_b, ``shared`` = number of equal signature
    components out of ``num_hashes`` (a deterministic Jaccard estimate;
    exact-verify survivors downstream in batch, exactly like the batch
    operator verifies its band join).  A pair sharing several bands is
    emitted by several groups — consumers ``distinct()`` on (id_a,
    id_b).  ``state_cap`` is the streaming twin of the batch
    ``bucket_cap``: a bucket already holding ``state_cap`` docs neither
    matches nor accumulates further arrivals, reported via ``capped``
    marker rows carrying the bucket id (never silent).
    ``state_ttl_minutes`` drops idle buckets (crawl-recency semantics),
    like streaming_fuzzy_match.

    The batch twin for equivalence testing is the same-bucket self-join
    over ``operators.dedup._minhash_stacked``."""
    assert num_hashes % bands == 0, "num_hashes must divide into bands"
    r = num_hashes // bands
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_minutes
        else GroupStateTimeout.NoTimeout
    )

    sig = docs.select(
        F.col(id_col).alias("id"),
        *minhash_row_signature(text_col, n, num_hashes),
    ).filter(F.col("mh0").isNotNull())
    # bucket strings identical to _minhash_stacked: "b|mh#mh#..."
    buckets = [
        F.concat_ws(
            "|",
            F.lit(str(b)),
            F.concat_ws("#", *[F.col(f"mh{b * r + i}") for i in range(r)]),
        )
        for b in range(bands)
    ]
    stacked = sig.select(
        "id",
        F.concat_ws("#", *[F.col(f"mh{s}") for s in range(num_hashes)]).alias(
            "sig"
        ),
        F.explode(F.array(*buckets)).alias("bucket"),
    )

    def fn(
        group_key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            ids, sigs_seen = list(state.get[0]), list(state.get[1])
        else:
            ids, sigs_seen = [], []
        known = set(ids)
        ia, ib, sh_n, capped = [], [], [], []
        hit_cap = False
        for pdf in pdfs:
            for i, s in zip(pdf["id"].tolist(), pdf["sig"].tolist()):
                if i in known:
                    continue  # re-delivery of a doc this bucket knows
                if len(ids) >= state_cap:
                    hit_cap = True
                    continue
                comps = s.split("#")
                for j, t in zip(ids, sigs_seen):
                    shared = sum(
                        a == b for a, b in zip(comps, t.split("#"))
                    )
                    ia.append(min(i, j))
                    ib.append(max(i, j))
                    sh_n.append(shared)
                    capped.append(False)
                ids.append(i)
                sigs_seen.append(s)
                known.add(i)
        if hit_cap:
            ia.append(None)
            ib.append(None)
            sh_n.append(None)
            capped.append(True)
        state.update((ids, sigs_seen))
        if state_ttl_minutes:
            state.setTimeoutDuration(state_ttl_minutes * 60 * 1000)
        if ia:
            bucket = str(group_key[0])
            yield pd.DataFrame(
                {
                    "id_a": ia,
                    "id_b": ib,
                    "shared": sh_n,
                    "capped": capped,
                    "bucket": [bucket if c else None for c in capped],
                }
            )

    return stacked.groupBy("bucket").applyInPandasWithState(
        fn,
        outputStructType=NEAR_SCHEMA,
        stateStructType=NEAR_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout_conf,
    )
