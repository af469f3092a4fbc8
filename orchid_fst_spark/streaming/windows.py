"""Event-time windowed operators over the events table.

These close the streaming gap left by the reference (batch-only —
SURVEY.md §2.6): tumbling-window aggregation, gap-based sessionization
and JSON property extraction, written against the *unbound* DataFrame
API so the identical function runs in batch (driver-contract oracle
checks) and under Structured Streaming (``readStream`` + watermark —
see tests/test_streaming.py for the batch/stream equivalence check).

Output columns are integers/timestamps only: cross-engine float
aggregation order would otherwise make oracle value-hashes flaky.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling event-time window x event_type counts:
    (window_start, event_type, n_events, n_users).

    Streaming: pass ``watermark`` (e.g. '2 hours') — late events beyond
    it are dropped and window state is garbage-collected; in batch the
    same plan is a plain groupBy."""
    src = events
    if watermark:
        # watermarks need TIMESTAMP (ltz); session TZ is UTC so the cast
        # from the parquet TIMESTAMP_NTZ column is exact
        src = events.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
            "ts", watermark
        )
    agg = F.count("*").alias("n_events")
    users = (
        F.approx_count_distinct("user_id")
        if watermark
        else F.countDistinct("user_id")
    )
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(agg, users.alias("n_users"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            F.col("n_users").cast("long").alias("n_users"),
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the time
    since the user's previous event exceeds ``gap_minutes``.  Returns
    (user_id, session_seq, n_events, first_event_id, last_event_id).

    Batch formulation (lag + running sum over a user-partitioned window —
    one shuffle on user_id); the streaming twin of this semantics is
    ``F.session_window`` with a watermark."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # TIMESTAMP_NTZ has no direct long cast; session TZ is pinned to UTC
    # so the ltz round-trip is exact epoch seconds (truncated)
    epoch = F.unix_timestamp(F.col("ts").cast("timestamp"))
    gap = epoch - F.lag(epoch).over(w)
    new_sess = F.when(
        gap.isNull() | (gap > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    with_seq = events.withColumn(
        "session_seq", F.sum(new_sess).over(w).cast("long")
    )
    return (
        with_seq.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min("event_id").alias("first_event_id"),
            F.max("event_id").alias("last_event_id"),
        )
    )


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str | None = None,
) -> DataFrame:
    """Native ``session_window`` sessionization — the streaming-capable
    twin of ``sessionize`` (dynamic-gap session state, merged and GC'd
    by the engine under a watermark; in batch the same plan is a
    session-window groupBy).  Returns (user_id, session_start,
    session_end, n_events, first_event_id, last_event_id).

    Session identity differs from ``sessionize`` only in labeling
    (window bounds vs a per-user ordinal); the *membership* semantics —
    events closer than the gap share a session — are identical, which
    tests/test_streaming.py asserts by comparing (n_events,
    first_event_id, last_event_id) multisets per user."""
    # second-truncated event time: the batch twin measures gaps on
    # floor(epoch) seconds, so sub-second components must not influence
    # the split decision here either
    src = events.withColumn(
        "ts", F.timestamp_seconds(F.unix_timestamp(F.col("ts").cast("timestamp")))
    )
    if watermark:
        src = src.withWatermark("ts", watermark)
    # session_window merges inclusively (an event exactly gap seconds
    # after the previous one still joins; split only at diff > gap) —
    # the same strictness as the batch twin's `gap > threshold` test,
    # so the plain gap is the exact equivalent (pinned by the synthetic
    # boundary test test_session_window_gap_boundary_semantics)
    gap = f"{gap_minutes * 60} seconds"
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("event_id").alias("first_event_id"),
            F.max("event_id").alias("last_event_id"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "first_event_id",
            "last_event_id",
        )
    )


def extract_event_props(events: DataFrame, field: str = "k") -> DataFrame:
    """JSON property extraction from the ``props`` column:
    (event_id, k) with k as a long — the scan stays columnar and the
    JSON path evaluates in the JVM (no UDF)."""
    return events.select(
        "event_id",
        F.get_json_object("props", f"$.{field}").cast("long").alias(field),
    )
