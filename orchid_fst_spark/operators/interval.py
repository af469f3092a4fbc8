"""Bucketed interval (range) join — point events against ``[start,
end)`` intervals sharing equi-key columns.

Spark has no range-join optimization for ``l.key = r.key AND l.ts >=
r.start AND l.ts < r.end``: the built-in plan is a key-only equi-join
with a post-filter (every event meets every interval of its key — hot
keys go quadratic), or a broadcast-nested-loop when the planner gives
up.  The standard fix (public pattern used by time-series engines and
documented Spark folklore) is BUCKET DECOMPOSITION: quantize time into
fixed buckets, explode each interval to the buckets it covers, tag each
event with its single bucket, and equi-join on ``(key…, bucket)``.

Scale design (100 TB):

* both sides shuffle ONCE on ``(key…, bucket)``; a hot key's traffic is
  subdivided across its active time buckets instead of colliding on one
  reducer, and AQE skew-join splits whatever residual skew remains;
* each qualifying (event, interval) pair is produced EXACTLY once —
  the event has one bucket and an interval emits each covered bucket
  once — so no distinct pass is needed;
* the fan-out is ``interval_span / bucket_seconds`` rows per interval:
  choose ``bucket_seconds`` near the typical interval length (a span
  cap guards against a pathological interval exploding to millions of
  rows — it raises, never silently truncates).

All bucket/bound arithmetic is on ``unix_micros`` (exact integers), so
the DuckDB oracle twin (a plain non-equi join) matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _us(name: str):
    """Exact integer event time.  unix_micros rejects TIMESTAMP_NTZ;
    the cast applies the same session-zone interpretation to every
    column, so compares and bucket arithmetic stay mutually
    consistent."""
    return F.unix_micros(F.col(name).cast("timestamp"))


def _bucket_of(e, b_us: int):
    """floor(e / b_us) in EXACT long arithmetic: integral ``div`` of
    ``e - pmod(e, b)`` (divisible by ``b``, so truncation == floor,
    including for negative pre-epoch timestamps) — long `/` in Spark
    is DOUBLE division, which silently mis-buckets once |e| exceeds
    2^53 µs (verified: (2^53+1-pmod)/3 via `/` is off by one)."""
    return F.call_function(
        "div", e - F.pmod(e, F.lit(b_us)), F.lit(b_us)
    ).cast("long")


def _explode_buckets(
    df: DataFrame,
    start_col: str,
    end_col: str,
    b_us: int,
    max_span_buckets: int,
    op_name: str,
) -> DataFrame:
    """One row per bucket the half-open interval ``[start, end)``
    covers, as ``_bkt``; empty/inverted intervals are dropped, and an
    interval spanning more than ``max_span_buckets`` buckets raises at
    run time (deliberately loud — never a silent truncation).  Shared
    by both interval joins so the bucket/guard arithmetic has one
    definition."""
    su, eu = _us(start_col), _us(end_col)
    first_b = _bucket_of(su, b_us)
    last_b = _bucket_of(eu - 1, b_us)  # end-exclusive
    span_ok = F.when(
        last_b - first_b < max_span_buckets, F.lit(True)
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"{op_name}: interval spans more than "),
                F.lit(str(max_span_buckets)),
                F.lit(" buckets; raise bucket_seconds or max_span_buckets"),
            )
        )
    )
    return (
        df.filter(eu > su)
        .filter(span_ok)
        .withColumn("_bkt", F.explode(F.sequence(first_b, last_b)))
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_start: str,
    right_end: str,
    bucket_seconds: int = 3600,
    max_span_buckets: int = 100_000,
) -> DataFrame:
    """Inner-join ``left`` rows (point timestamp ``left_ts``) to
    ``right`` rows (interval ``[right_start, right_end)``) matching on
    the ``on`` key columns — the half-open containment the reference's
    range iterators use (ts >= start AND ts < end).

    Column contract: ``left`` and ``right`` must not share non-key
    column names (rename before calling); the result carries every
    column of both sides.  Empty or inverted intervals (``end <=
    start``) match nothing.  An interval spanning more than
    ``max_span_buckets`` buckets raises at run time (a deliberately
    loud guard — see module docstring).
    """
    if bucket_seconds <= 0:
        raise ValueError("need bucket_seconds > 0")
    b_us = int(bucket_seconds) * 1_000_000

    lt = _us(left_ts)
    rs = _us(right_start)
    re = _us(right_end)
    r_bucketed = _explode_buckets(
        right, right_start, right_end, b_us, max_span_buckets, "interval_join"
    )
    l_bucketed = left.withColumn("_bkt", _bucket_of(lt, b_us))
    return (
        l_bucketed.join(r_bucketed, [*on, "_bkt"])
        .filter((lt >= rs) & (lt < re))
        .drop("_bkt")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_seconds: int = 3600,
    max_span_buckets: int = 100_000,
) -> DataFrame:
    """Inner-join ``left`` intervals ``[left_start, left_end)`` to
    ``right`` intervals ``[right_start, right_end)`` that OVERLAP
    (``ls < re AND rs < le``, half-open) and share the ``on`` keys —
    the interval-interval sibling of :func:`interval_join`'s
    point-in-interval containment (session overlap, concurrent-crawl
    windows, ad/impression attribution).

    Same bucket decomposition, both sides exploded: each interval emits
    its covered buckets once, the equi-join runs on ``(key…, bucket)``,
    and each qualifying pair is produced EXACTLY once without a
    distinct pass — the pair is kept only in the bucket of the overlap
    region's start, ``greatest(floor(ls/b), floor(rs/b))`` (floor is
    monotone, so that equals ``floor(max(ls, rs)/b)``; both intervals
    provably cover that bucket whenever they overlap).  Shuffle cost:
    one exchange per side, fan-out ``span / bucket_seconds`` rows per
    interval with the same loud ``max_span_buckets`` guard; a hot key's
    pairs spread across its active buckets instead of one reducer.

    Column contract: no shared non-key column names (rename first);
    empty/inverted intervals match nothing."""
    if bucket_seconds <= 0:
        raise ValueError("need bucket_seconds > 0")
    b_us = int(bucket_seconds) * 1_000_000

    ls, le = _us(left_start), _us(left_end)
    rs, re = _us(right_start), _us(right_end)
    joined = _explode_buckets(
        left, left_start, left_end, b_us, max_span_buckets,
        "interval_overlap_join",
    ).join(
        _explode_buckets(
            right, right_start, right_end, b_us, max_span_buckets,
            "interval_overlap_join",
        ),
        [*on, "_bkt"],
    )
    return (
        joined.filter((ls < re) & (rs < le))
        .filter(
            F.col("_bkt")
            == F.greatest(_bucket_of(ls, b_us), _bucket_of(rs, b_us))
        )
        .drop("_bkt")
    )
