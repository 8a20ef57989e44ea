"""Incrementally-maintained session windows — the merge algebra that
Structured Streaming's native ``session_window`` state store performs,
implemented as an epoch-partitioned maintained table any reader can
fold.

Why this exists: session windows are the one windowed aggregate whose
partials are NOT disjoint — a session's events can straddle any number
of micro-batches, and two partial sessions must MERGE when they land
within the gap of each other. Counts and sketches fold by simple sums
(``report_stream.py``, ``sketch_stream.py``); sessions fold by interval
union. This module writes one set of partial session intervals per
epoch (rows = sessions observed inside that batch alone, tiny) and the
reader reconstructs the exact global sessionization with one
gaps-and-islands pass over the interval rows.

The fold is correct for ANY split of events into batches — including
out-of-order and interleaved arrival — not just time-contiguous ones,
because the reader merges on the RUNNING MAX of session ends, not the
previous row's end:

* every pair of adjacent events (by time) of a true global session has
  gap <= g, so when the sweep reaches a partial interval, some already
  swept interval ends within g of it (connectivity);
* intervals of different global sessions are separated by > g from the
  running max by definition (no over-merge).

A plain LAG-based merge is WRONG here (a long batch-1 session can
shadow a short batch-2 interval whose end the lag then compares
against); ``tests/test_session_stream.py`` pins the distinction with an
interleaved split.

At 100 TB of events this is session freshness at O(batch) cost: the
maintained table holds (epochs x active sessions) interval rows, and
the reader's shuffle is keyed by user — never a re-scan of event
history. Exactly-once on replay comes from dynamic epoch-partition
overwrite, same as every maintainer in this package.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def partial_sessions(
    batch: DataFrame,
    *,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-batch session intervals: (user, s_start, s_end, n_events)
    with TRUE event-time bounds (``max(ts)``, not the gap-padded
    ``session_window.end``) so the reader's merge rule compares event
    distances, not padded window edges."""
    sw = F.session_window(ts_col, f"{gap_minutes} minutes")
    return batch.groupBy(sw.alias("sw"), user_col).agg(
        F.min(ts_col).alias("s_start"),
        F.max(ts_col).alias("s_end"),
        F.count("*").alias("n_events"),
    ).drop("sw")


def session_sink(
    table_path: str,
    *,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` sink appending each epoch's partial sessions
    (epoch replay overwrites its own partition — idempotent)."""

    def _sink(batch: DataFrame, epoch_id: int) -> None:
        (
            partial_sessions(
                batch,
                gap_minutes=gap_minutes,
                user_col=user_col,
                ts_col=ts_col,
            )
            .withColumn("epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(table_path)
        )

    return _sink


def start_session_stream(
    events: DataFrame,
    table_path: str,
    checkpoint_path: str,
    *,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    available_now: bool = False,
    trigger_secs: int = 10,
):
    writer = events.writeStream.foreachBatch(
        session_sink(
            table_path,
            gap_minutes=gap_minutes,
            user_col=user_col,
            ts_col=ts_col,
        )
    ).option("checkpointLocation", checkpoint_path)
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_secs} seconds")
    return writer.start()


def merged_sessions(
    spark,
    table_path: str,
    *,
    gap_minutes: int = 30,
    user_col: str = "user_id",
) -> DataFrame:
    """The current global sessionization, identical to running
    ``session_window`` over every event ingested: per user, sweep the
    partial intervals by start time, open a new session when the start
    exceeds the RUNNING MAX of swept ends by more than the gap, then
    union the member intervals (min start / max end / summed counts)."""
    gap = F.expr(f"INTERVAL {int(gap_minutes)} MINUTES")
    partials = spark.read.parquet(table_path).drop("epoch")
    sweep = (
        Window.partitionBy(user_col)
        .orderBy("s_start", "s_end")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # timestamp-interval arithmetic: exact at any precision and valid
    # for both TIMESTAMP and TIMESTAMP_NTZ inputs (a seconds-truncating
    # unix_timestamp would mis-merge intervals within 1 s of the gap
    # boundary; unix_micros rejects NTZ columns)
    prev_max_end = F.max("s_end").over(sweep)
    opens = F.when(
        prev_max_end.isNull() | (F.col("s_start") > prev_max_end + gap),
        1,
    ).otherwise(0)
    number = (
        Window.partitionBy(user_col)
        .orderBy("s_start", "s_end")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        partials.withColumn("new_s", opens)
        .withColumn("sid", F.sum("new_s").over(number))
        .groupBy(user_col, "sid")
        .agg(
            F.min("s_start").alias("s_start"),
            F.max("s_end").alias("s_end"),
            F.sum("n_events").alias("n_events"),
        )
        .drop("sid")
    )
