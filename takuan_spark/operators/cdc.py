"""Change-data-capture and event-stream hygiene operators.

A 100 TB ingestion pipeline consumes changelogs (Debezium-style
I/U/D streams) and at-least-once event feeds; these operators are the
batch-relational forms of the standard repairs:

- :func:`latest_snapshot` — last-writer-wins compaction of a keyed
  changelog into its current-state table (the MERGE INTO read side).
- :func:`merge_snapshot` — full I/U/D replay: a delete tombstone
  resets the key; only keys with live activity after their last
  tombstone survive, carrying the post-tombstone aggregate.
- :func:`dedup_within_window` — drop near-time duplicate deliveries of
  the same logical event (at-least-once transport, retry storms): an
  event is a duplicate if the same key fired within ``window_secs``
  before it.
- :func:`last_touch` — attribute each conversion event to the most
  recent preceding non-conversion touch of the same key within a
  horizon (last-touch attribution).

All four are single-shuffle window plans: one exchange on the entity
key, then per-partition ordered evaluation — no self-joins, no
driver state. Orderings use (ts, id) so replays are deterministic
under duplicate timestamps.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _order_window(key_col: str, ts_col: str, id_col: str) -> Window:
    return Window.partitionBy(key_col).orderBy(ts_col, id_col)


def _micros(col: Column) -> Column:
    """Integer epoch microseconds. The parquet timestamps load as
    TIMESTAMP_NTZ, which unix_micros rejects; the session TZ is pinned
    UTC (session.py) so the cast is an identity relabel."""
    return F.unix_micros(col.cast("timestamp"))


def latest_snapshot(
    log: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Current state per key: the values of the chronologically last
    row (ties broken by ``id_col``) plus the change count.

    One hash aggregate, not a rank-then-filter window: ``max`` over a
    (ts, id, values...) struct is the last-writer row, computes with a
    map-side partial (the window form cannot), and shuffles one struct
    per key per input partition — the right compaction shape when the
    changelog is 100 TB and keys are millions."""
    last = F.max(
        F.struct(
            F.col(ts_col).alias("ts"),
            F.col(id_col).alias("id"),
            *[F.col(c).alias(c) for c in value_cols],
        )
    )
    agg = log.groupBy(key_col).agg(
        F.count("*").alias("n_changes"), last.alias("_last")
    )
    return agg.select(
        key_col,
        F.col("_last.ts").alias(ts_col),
        *[F.col(f"_last.{c}").alias(c) for c in value_cols],
        "n_changes",
    )


def merge_snapshot(
    log: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    id_col: str,
    op_col: Column,
    value_col: str,
) -> DataFrame:
    """Replay an I/U/D changelog to its surviving snapshot.

    ``op_col`` must evaluate to 'I', 'U' or 'D' per row. A key's last
    'D' (in (ts, id) order) tombstones everything before it; the key
    appears in the snapshot iff any non-D row follows, with:
    ``n_live_ops`` (rows after the tombstone), ``last_ts`` /
    ``last_op`` / ``last_value`` from the final row.

    Shape: one window rank + one bounded per-key aggregate (the max
    tombstone rank), one groupBy — the tombstone aggregate rides the
    same hash partitioning as the rank's exchange, so AQE coalesces
    this to a single effective shuffle of the log.
    """
    w = _order_window(key_col, ts_col, id_col)
    tagged = log.withColumn("_op", op_col).withColumn(
        "_rn", F.row_number().over(w)
    )
    # max tombstone rank per key; keys without a 'D' get 0
    tomb = F.max(F.when(F.col("_op") == "D", F.col("_rn")).otherwise(0)).over(
        Window.partitionBy(key_col)
    )
    live = tagged.withColumn("_tomb", tomb).where(
        (F.col("_rn") > F.col("_tomb")) & (F.col("_op") != "D")
    )
    last = F.max(
        F.struct(
            F.col("_rn").alias("rn"),
            F.col(ts_col).alias("ts"),
            F.col("_op").alias("op"),
            F.col(value_col).alias("val"),
        )
    )
    return live.groupBy(key_col).agg(
        F.count("*").alias("n_live_ops"),
        last.getField("ts").alias("last_ts"),
        last.getField("op").alias("last_op"),
        last.getField("val").alias("last_value"),
    )


def dedup_within_window(
    events: DataFrame,
    *,
    key_cols: list[str],
    ts_col: str,
    id_col: str,
    window_secs: int,
) -> DataFrame:
    """Tag each event ``_dup`` when the same key combination fired
    within ``window_secs`` before it. The at-least-once repair with
    session-burst semantics: consecutive same-key events with gaps
    <= ``window_secs`` form one burst, the first delivery of each
    burst survives, every later delivery in the burst is a duplicate.
    A gap longer than the window starts a new burst (a legitimately
    new event). Note the chaining: a steady drip spaced just inside
    the window is ONE burst with one survivor — that is the session
    semantics; per-survivor-window semantics would need a stateful
    scan (the streaming form in ``streaming/dedup_stream.py``)."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col, id_col)
    prev_ts = F.lag(ts_col).over(w)
    # integer microseconds, not cast("long") (which truncates to whole
    # seconds) and not double seconds (1e-7 ulp at current epochs —
    # a gap exactly at the window boundary could flip per engine)
    gap = _micros(F.col(ts_col)) - _micros(prev_ts)
    # A run of same-key events: walk it once, carrying the last kept
    # ts. Expressible without iteration: an event is kept iff its gap
    # to the previous KEPT event > window. With monotone ts per key,
    # "previous kept" = the max kept ts so far; a session-style reset
    # computes it as a running sum of "gap exceeded" flags defining
    # burst groups, first row of each burst survives.
    burst_start = (
        prev_ts.isNull() | (gap > window_secs * 1_000_000)
    ).cast("int")
    burst_id = F.sum(burst_start).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    in_burst_rn = F.row_number().over(
        Window.partitionBy(*key_cols, "_burst").orderBy(ts_col, id_col)
    )
    return (
        events.withColumn("_burst", burst_id)
        .withColumn("_dup", in_burst_rn > 1)
        .drop("_burst")
    )


def last_touch(
    events: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    id_col: str,
    is_conversion: Column,
    touch_col: str,
    horizon_secs: int,
) -> DataFrame:
    """Conversion rows with their attributed touch: the most recent
    strictly-preceding non-conversion event of the same key, if it
    happened within ``horizon_secs``; otherwise touch is NULL
    ('organic'). Output = the conversion rows plus (touch_type,
    touch_ts)."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_touch = F.last(
        F.when(
            ~is_conversion,
            F.struct(
                F.col(ts_col).alias("ts"), F.col(touch_col).alias("t")
            ),
        ),
        ignorenulls=True,
    ).over(w)
    tagged = events.withColumn("_pt", prev_touch).where(is_conversion)
    in_horizon = (
        _micros(F.col(ts_col)) - _micros(F.col("_pt.ts"))
    ) <= horizon_secs * 1_000_000
    return tagged.select(
        "*",
        F.when(F.col("_pt").isNotNull() & in_horizon, F.col("_pt.t")).alias(
            "touch_type"
        ),
        F.when(F.col("_pt").isNotNull() & in_horizon, F.col("_pt.ts")).alias(
            "touch_ts"
        ),
    ).drop("_pt")
