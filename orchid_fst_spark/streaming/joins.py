"""Watermarked stream-stream joins: the Structured Streaming twin of
the batch ``operators.interval.interval_join``.

The batch operator realizes the reference's half-open range-bound
semantics (fst.h:329-388) by bucket decomposition; in a stream the
engine's own symmetric stream-stream join is the native realization:
both sides carry event-time watermarks, the range predicate doubles as
the state-cleanup constraint, and Spark's incremental join state
replaces the bucket explode.  Used for continuous attribution (clicks
joining the error/campaign window they fall into, as WARC drops / event
streams arrive).

State-boundedness contract: Spark can only garbage-collect join state
when the condition bounds the two event-time columns against each
other.  The caller therefore declares ``max_span`` — an upper bound on
interval length — and the operator adds ``point_ts <= start + max_span``
to the join condition.  An interval longer than ``max_span`` matches
only its first ``max_span`` worth of points (loudly documented, the
streaming analog of the batch operator's ``max_span_buckets`` guard);
state per key is then bounded by ``watermark + max_span`` of events.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F


def stream_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    ts_col: str,
    start_col: str,
    end_col: str,
    max_span: str = "2 hours",
    watermark: str = "2 hours",
) -> DataFrame:
    """Inner-join a stream of ``points`` (event time ``ts_col``) to the
    stream of ``intervals`` ``[start_col, end_col)`` sharing the ``on``
    keys — half-open containment, identical row semantics to the batch
    ``interval_join`` whenever every interval's span is ≤ ``max_span``
    (stream==batch equivalence pinned by test).

    Both inputs may be streaming or batch frames; streaming inputs get
    ``watermark`` applied to their event-time column (late rows beyond
    it are dropped, matching the engine's other watermarked paths).
    Output columns: the points side's columns plus the intervals
    side's non-key columns — non-key names must be disjoint (rename
    first), like the batch operator.

    Scale notes: Spark plans this as a symmetric hash join keyed on
    the equi keys — ONE shuffle per side, no bucket fan-out at all
    (the join state plays the bucket's role), and state is purged once
    the watermark passes ``start + max_span``.  Hot keys concentrate
    on one state partition (the batch operator's bucket spreading has
    no streaming twin); interval streams with mega-hot keys should be
    pre-aggregated per (key, start)."""
    p = points
    if p.isStreaming:
        p = p.withWatermark(ts_col, watermark)
    i = intervals
    if i.isStreaming:
        i = i.withWatermark(start_col, watermark)
    p = p.alias("l")
    i = i.alias("r")
    lts = F.col(f"l.{ts_col}")
    rs, re = F.col(f"r.{start_col}"), F.col(f"r.{end_col}")
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"l.{k}") == F.col(f"r.{k}") for k in on],
        (lts >= rs)
        & (lts < re)
        & (lts <= rs + F.expr(f"INTERVAL {max_span}")),
    )
    right_keep = [
        F.col(f"r.{c}") for c in intervals.columns if c not in set(on)
    ]
    return p.join(i, cond, "inner").select(
        *[F.col(f"l.{c}") for c in points.columns], *right_keep
    )
