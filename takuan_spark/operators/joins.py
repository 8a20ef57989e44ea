"""As-of (point-in-time) join — an operator Spark lacks natively.

Reference scope note: evilsocket/takuan has no as-of join (its only
joins are broadcast enrichments, core/aggregator.go:62-66); this is a
north-star extension for time-series/training-data pipelines (e.g.
"state of X as of event time T").

Implementation is the union-tag pattern, which is how you'd run it on
100 TB:

1. tag right rows 0 / left rows 1 and ``unionByName`` them;
2. one hash shuffle on the join key partitions both sides together;
3. within each partition, a window sorted by (time, side) computes a
   running ``last(right_payload, ignorenulls=True)`` — each left row
   sees exactly the latest right row at-or-before it (backward) or the
   earliest at-or-after (forward).

Cost: ONE shuffle of left+right (same as a plain sort-merge join), no
range-explosion, no per-row lookups, and skew behaves like any keyed
window. Equal timestamps: right sorts before left, so a right row at
exactly the left time matches; ties among right rows resolve to the
largest payload struct (deterministic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_time: str,
    right_time: str,
    right_values: dict[str, str],
    direction: str = "backward",
) -> DataFrame:
    """Point-in-time join: every left row + the matching right row's
    values (null when no right row qualifies — left-outer semantics).

    ``right_values`` maps right-side column -> output name (output names
    must not collide with left columns). ``direction='backward'`` takes
    the latest right row with ``right_time <= left_time``; ``'forward'``
    the earliest with ``right_time >= left_time``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    payload = F.struct(
        F.col(right_time).alias("_rt"),
        *[F.col(src).alias(out) for src, out in right_values.items()],
    )
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        payload.alias("_rv"),
    )
    l = left.withColumn("_k", F.col(on)).withColumn(
        "_t", F.col(left_time)
    ).withColumn("_side", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)
    t_order: Column = F.col("_t").asc() if direction == "backward" else F.col("_t").desc()
    w = (
        Window.partitionBy("_k")
        .orderBy(t_order, F.col("_side").asc(), F.col("_rv").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # materialize the window result BEFORE filtering to left rows — the
    # frame must see the right rows that the filter removes.
    u = u.withColumn("_m", F.last("_rv", ignorenulls=True).over(w))
    out_cols = [F.col(c) for c in left.columns] + [
        F.col("_m")[out].alias(out) for out in right_values.values()
    ]
    return u.where(F.col("_side") == 1).select(*out_cols)
