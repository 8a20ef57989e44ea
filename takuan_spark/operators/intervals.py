"""Interval-overlap join: pair every interval in A with the intervals
in B it overlaps (a_start <= b_end AND b_start <= a_end) — the join
type behind concurrency analysis, resource-contention windows, and
time-range reconciliation. Spark has no native interval join; the naive
formulation is a cross join with a range predicate (O(|A| x |B|)
comparisons, no partitioning).

Scale shape — the bucketed expansion: every interval explodes into the
fixed-width time buckets it spans, the join becomes an EQUI-join on the
bucket key (hash-partitionable, AQE-skew-splittable), and the exact
overlap predicate then filters the bucket-collision candidates. Two
intervals overlap iff they share at least one bucket, so recall is
exact; a pair sharing several buckets appears several times, so pairs
are deduped on their identity keys. Cost: |A| + |B| rows multiplied by
mean span/bucket_width, traded against never shipping all of B to every
A partition. Pick the bucket near the median interval span.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucketed(
    df: DataFrame, start_col: str, end_col: str, bucket_secs: int
) -> DataFrame:
    # integer epoch buckets: floor(unix/width) aligns BOTH sides to one
    # global grid for any width (truncation-based bucketing only aligns
    # at its own calendar granularity). Internal join key only — never
    # compared across engines.
    s = F.expr(f"unix_timestamp({start_col}) div {bucket_secs}")
    e = F.expr(f"unix_timestamp({end_col}) div {bucket_secs}")
    return df.withColumn("_bk", F.explode(F.sequence(s, e)))


def overlap_pairs(
    a: DataFrame,
    b: DataFrame,
    *,
    a_keys: list[str],
    b_keys: list[str],
    a_start: str = "a_start",
    a_end: str = "a_end",
    b_start: str = "b_start",
    b_end: str = "b_end",
    bucket_secs: int = 3600,
) -> DataFrame:
    """Distinct overlapping (A, B) interval pairs via the bucketed
    equi-join. ``a_keys``/``b_keys`` identify an interval on each side
    (dedup keys for multi-bucket collisions). Output carries all four
    endpoint columns plus both key sets.

    The two sides must use DISJOINT column names (rename the b side
    before calling, as the ``b_*`` defaults suggest) — validated here
    because the alternative is an ambiguous-reference failure deep in
    the join."""
    shared = set(a.columns) & set(b.columns)
    if shared:
        raise ValueError(
            f"overlap join requires disjoint column names; shared: "
            f"{sorted(shared)} — rename one side (e.g. prefix b_)"
        )
    for side in (a, b):
        if "_bk" in side.columns:
            raise ValueError("'_bk' is reserved by the bucketed overlap join")
    ab = _bucketed(a, a_start, a_end, bucket_secs)
    bb = _bucketed(b, b_start, b_end, bucket_secs)
    overlap = (F.col(a_start) <= F.col(b_end)) & (
        F.col(b_start) <= F.col(a_end)
    )
    return (
        ab.join(bb, on="_bk")
        .where(overlap)
        .drop("_bk")
        .dropDuplicates(a_keys + b_keys)
    )


def overlap_counts(
    a: DataFrame,
    b: DataFrame,
    *,
    a_keys: list[str],
    b_keys: list[str],
    a_start: str = "a_start",
    a_end: str = "a_end",
    b_start: str = "b_start",
    b_end: str = "b_end",
    bucket_secs: int = 3600,
) -> DataFrame:
    """Per-A-interval overlap count, INCLUDING zero rows (left-join
    semantics): (a_keys..., a_start, a_end, n_overlap). The count
    aggregation keeps output size |A| however dense the overlaps.

    A feeds two plan branches (the bucketed join and the final
    zero-preserving left join); it is materialized here so the caller's
    upstream work — often a full sessionization — runs once."""
    from takuan_spark.operators.skew import materialize

    a = materialize(a)
    pairs = overlap_pairs(
        a,
        b,
        a_keys=a_keys,
        b_keys=b_keys,
        a_start=a_start,
        a_end=a_end,
        b_start=b_start,
        b_end=b_end,
        bucket_secs=bucket_secs,
    )
    counts = pairs.groupBy(*a_keys).agg(F.count("*").alias("n_overlap"))
    # endpoint columns may already be key columns — project each once
    cols = list(dict.fromkeys([*a_keys, a_start, a_end]))
    return a.join(counts, a_keys, "left").select(
        *cols,
        F.coalesce("n_overlap", F.lit(0)).cast("bigint").alias("n_overlap"),
    )
