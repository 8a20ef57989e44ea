"""Watermarked event-time window aggregations for the events stream
(SURVEY.md §2.1: the reference batches by processing time and ignores
late data entirely; a streaming analytics engine must expose event-time
windows + watermarks, so they are first-class here).

These return *streaming* DataFrames; callers attach a sink. In batch
mode the same expressions are valid (minus the watermark), which is what
the oracle-checked ``takuan_hourly_window`` / ``q_sliding_window`` /
``q_session_window`` queries prove.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    events: DataFrame,
    *,
    time_col: str = "created_at",
    key_cols: tuple[str, ...] = ("sensor", "rule"),
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Tumbling (or sliding, when ``slide`` is set) windowed counts with a
    watermark: state for windows older than the watermark is dropped, so
    state size is bounded by (watermark / slide) x keys — the property
    that keeps this runnable forever at 100 TB/day."""
    w = (
        F.window(time_col, window, slide)
        if slide
        else F.window(time_col, window)
    )
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(w.alias("w"), *key_cols)
        .agg(F.count("*").alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *key_cols,
            "cnt",
        )
    )


def sessionized_counts(
    events: DataFrame,
    *,
    time_col: str = "created_at",
    key_col: str = "address",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Session windows per key with a watermark (the streaming form of
    the gaps-and-islands query ``q_session_window``)."""
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(F.session_window(time_col, gap).alias("sw"), key_col)
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(key_col),
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


def deduped_stream(
    events: DataFrame,
    *,
    key_cols: tuple[str, ...] = ("address", "payload"),
    time_col: str = "created_at",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: drop repeats of the same key seen within
    the watermark horizon (``dropDuplicatesWithinWatermark``).

    This is the streaming tier of the dedup family (batch tiers live in
    operators/dedup.py): state holds one entry per key and is evicted
    once the watermark passes it, so memory is bounded by key arrival
    rate x horizon — the property that lets it run forever, unlike an
    unbounded ``dropDuplicates`` whose state only grows. Typical use:
    log shippers re-sending the same lines after reconnects/rotations
    (SURVEY.md O2) — replays arrive well inside the horizon.
    """
    return events.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_time: str = "created_at",
    right_time: str = "created_at",
    max_delay: str = "5 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream interval join: pair each left event
    with right events for the same key whose time falls in
    ``[left_time - max_delay, left_time]``.

    Both sides carry watermarks and the join condition is time-bounded
    in both directions, so Spark can discard buffered state once the
    watermark passes the interval — the requirement that makes a
    stream-stream join runnable forever (an unbounded-time join would
    buffer both streams in full). The reference correlates events only
    by batch re-scans of MySQL; this is the streaming-native form of
    "which rule fired near this event".

    ``how`` extends the same plan to the outer variants (``leftOuter``
    / ``rightOuter`` / ``fullOuter``): an unmatched buffered row emits
    its NULL-padded result only once the watermark passes its interval
    and state eviction runs — matched pairs still emit as soon as both
    sides have arrived. That eviction-driven emission is the semantics
    a "left event that never got its right partner" detection depends
    on, and it is why outer results trail the watermark rather than the
    arrival clock.
    """
    lw = left.withWatermark(left_time, watermark)
    rw = right.withWatermark(right_time, watermark)
    l_t, r_t = F.col(f"l.{left_time}"), F.col(f"r.{right_time}")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (r_t >= l_t - F.expr(f"INTERVAL {max_delay}"))
        & (r_t <= l_t)
    )
    return lw.alias("l").join(rw.alias("r"), cond, how)
