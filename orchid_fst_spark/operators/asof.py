"""As-of (nearest-timestamp) join — an operator Spark's DataFrame API
lacks natively, composed from existing relational pieces (public
pattern: the union-tag-window formulation used by time-series engines;
DuckDB ships it as ``ASOF JOIN``, which is the oracle twin).

For every left row, attach the single right row with the same key and
the greatest right timestamp ``<=`` the left timestamp (``backward``,
the default) or the smallest ``>=`` (``forward``), optionally within a
``tolerance``.

Scale design: ONE hash shuffle of the union on the join key and one
per-key sort — no range self-join (which would be O(|L|·|R|) per key),
no driver-side loop.  The window is ``rows unbounded preceding``, so it
streams: Spark's WindowExec evaluates ``last(..., ignorenulls)``
incrementally without buffering the frame.  Per-key skew is bounded by
the keys themselves (same profile as any groupBy over the key); a
hot-key salt is deliberately NOT built in because correctness of the
carry-forward requires seeing the key's full timeline in order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
    direction: str = "backward",
    tolerance=None,
    suffix: str = "_r",
) -> DataFrame:
    """All left columns, plus for each name in ``payload`` a
    ``{name}{suffix}`` column carrying the matched right row's value
    (NULL when no right row qualifies), plus ``{right_ts}{suffix}`` —
    the matched right timestamp.

    ``direction='backward'``: match the latest right row with
    ``right_ts <= left_ts``; ``'forward'``: the earliest with
    ``right_ts >= left_ts``.  ``tolerance`` (a Column-compatible
    interval/number matching the ts type's arithmetic) voids matches
    further than that from the left timestamp.

    Right rows must be unique per ``(on…, right_ts)`` — pre-aggregate
    duplicates (e.g. with ``dedup.keep_latest``) or the carried value
    is whichever duplicate sorted last.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    out_ts = f"{right_ts}{suffix}"
    out_payload = [f"{c}{suffix}" for c in payload]

    lcols = left.columns
    # tag = 0 sorts right rows BEFORE left rows at equal timestamps, so
    # an exactly-equal right timestamp is visible to the left row
    # (matching DuckDB ASOF's inclusive bound) in both directions.
    l_tag = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(right.schema[right_ts].dataType).alias(out_ts),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(o)
            for c, o in zip(payload, out_payload)
        ],
    )
    r_tag = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in on],
        *[F.col(k) for k in on],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        F.col(right_ts).alias(out_ts),
        *[F.col(c).alias(o) for c, o in zip(payload, out_payload)],
    ).select(*l_tag.columns)  # align column order for the union

    if direction == "backward":
        w = (
            Window.partitionBy(*on)
            .orderBy(F.asc("_ts"), F.asc("_tag"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy(*on)
            .orderBy(F.desc("_ts"), F.asc("_tag"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    carried = l_tag.unionByName(r_tag).select(
        *[F.col(c) for c in lcols],
        "_tag",
        "_ts",
        F.last(out_ts, ignorenulls=True).over(w).alias(out_ts),
        *[
            F.last(o, ignorenulls=True).over(w).alias(o)
            for o in out_payload
        ],
    )
    out = carried.filter(F.col("_tag") == 1).drop("_tag", "_ts")

    if tolerance is not None:
        far = (
            (F.col(left_ts) - F.col(out_ts)) > tolerance
            if direction == "backward"
            else (F.col(out_ts) - F.col(left_ts)) > tolerance
        )
        out = out.select(
            *[F.col(c) for c in lcols],
            *[
                F.when(far, F.lit(None)).otherwise(F.col(o)).alias(o)
                for o in [out_ts, *out_payload]
            ],
        )
    return out
