"""Quantile (equal-frequency) binning — feature discretization.

The ML-preprocessing discretizer: bin a numeric column so each bin
holds ~equal row counts within its group. Implemented on
``percent_rank`` (rank-based, tie-stable: equal values always share a
bin, unlike ``ntile``'s row-split which assigns tied rows to different
bins depending on partition order — nondeterministic under shuffle).

One exchange on the group key; the rank and the bin label evaluate in
the same window stage. At 100 TB the per-group sort is the cost — the
same cost any exact quantile computation pays; approximate pipelines
swap in the histogram sketch (operators/sketches.py) upstream and keep
this operator for the final labeled output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def quantile_bins(
    df: DataFrame,
    *,
    value_col: str,
    group_cols: list[str],
    nbins: int,
) -> DataFrame:
    """Input rows + ``bin`` in [0, nbins): ``floor(percent_rank *
    nbins)`` clamped at the top (the max row has rank exactly 1.0)."""
    w = Window.partitionBy(*group_cols).orderBy(value_col)
    pr = F.percent_rank().over(w)
    return df.withColumn(
        "bin",
        F.least(
            F.floor(pr * nbins), F.lit(nbins - 1)
        ).cast("int"),
    )


def bin_profile(
    df: DataFrame,
    *,
    value_col: str,
    group_cols: list[str],
    nbins: int,
) -> DataFrame:
    """Per-(group, bin) profile: n, lo, hi, mean — the cutpoint table a
    feature store persists alongside the discretizer."""
    binned = quantile_bins(
        df, value_col=value_col, group_cols=group_cols, nbins=nbins
    )
    return binned.groupBy(*group_cols, "bin").agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(F.min(value_col), 2).alias("lo"),
        F.round(F.max(value_col), 2).alias("hi"),
        F.round(F.avg(value_col), 4).alias("mean_val"),
    )
