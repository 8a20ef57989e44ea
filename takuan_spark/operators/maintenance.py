"""Table-maintenance planners: small-file compaction binning and
zone-map prune estimation (SURVEY.md §2.2 scale tooling).

At 100 TB a table is tens of millions of files, and the two levers that
keep scans cheap are (1) compacting small files into target-sized ones
so the scheduler isn't drowned in splits, and (2) laying rows out so
file-level min/max statistics (zone maps) prune most files for common
predicates. Both levers need PLANNERS that run as queries over file
metadata — which is itself a (much smaller) table — before any rewrite
job is launched. These operators are those planners:

- :func:`compaction_bins` assigns files to compaction output bins by a
  deterministic running-sum split per partition: files are taken in a
  stable order and a new bin starts whenever the accumulated size
  crosses the target. One window over (partition, order) — the window
  state is a running sum per partition, never the file list.
- :func:`zonemap_stats` computes per-file min/max zone maps with one
  hash aggregate, and :func:`prune_estimate` counts the files a range
  predicate could skip (prunable iff ``max < lo OR min > hi``). Run it
  against two candidate layouts (e.g. natural insert order vs a
  Z-order key from :mod:`takuan_spark.operators.layout`) and the
  difference IS the scan cost the re-layout buys.

Everything is built-in expressions (windows + aggregates) — no UDFs,
no driver materialization; both planners scale to a 100 M-file
manifest because they shuffle only (partition key, size) pairs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def compaction_bins(
    files: DataFrame,
    *,
    size_col: str,
    order_cols: Sequence[str],
    partition_cols: Sequence[str],
    target_bytes: int,
) -> DataFrame:
    """Assign each file a compaction ``bin`` per partition.

    Files are ordered by ``order_cols`` within each partition; the bin
    id is ``floor(exclusive_running_sum / target_bytes)`` — the
    deterministic sequential packing every compactor (Delta OPTIMIZE,
    Iceberg rewrite_data_files) uses, expressed as one window. A bin
    may exceed the target by at most one file, never undershoot-split.

    The running sum uses an explicit ROWS frame, so the packing
    invariant holds even when ``order_cols`` has ties; for a fully
    DETERMINISTIC assignment (same file -> same bin across runs and
    engines) callers must include a unique tiebreak column in
    ``order_cols``, as the registered queries do with the file id.
    """
    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be positive, got {target_bytes}")
    # ROWS frame, not the default RANGE frame: with RANGE, tied
    # order_cols values all receive the same inclusive running sum,
    # which breaks the at-most-one-file overshoot invariant whenever
    # order_cols are not unique (and diverges from the ROWS-framed
    # oracle).
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum(size_col).over(w) - F.col(size_col)
    return files.withColumn(
        "bin", F.floor(running / F.lit(target_bytes)).cast("bigint")
    )


def compaction_plan(
    files: DataFrame,
    *,
    size_col: str,
    order_cols: Sequence[str],
    partition_cols: Sequence[str],
    target_bytes: int,
) -> DataFrame:
    """Roll :func:`compaction_bins` up to one row per output bin:
    input-file count and total bytes — the job manifest a rewrite
    stage consumes."""
    binned = compaction_bins(
        files,
        size_col=size_col,
        order_cols=order_cols,
        partition_cols=partition_cols,
        target_bytes=target_bytes,
    )
    return binned.groupBy(*partition_cols, "bin").agg(
        F.count("*").cast("bigint").alias("n_files"),
        F.sum(size_col).cast("bigint").alias("bytes"),
    )


def zonemap_stats(
    rows: DataFrame, *, file_col: str, value_cols: Sequence[str]
) -> DataFrame:
    """Per-file min/max zone maps: one hash aggregate keyed by the
    file id (map-side partials bound shuffle volume at one row per
    file per value column pair)."""
    aggs = []
    for c in value_cols:
        aggs.append(F.min(c).alias(f"{c}_min"))
        aggs.append(F.max(c).alias(f"{c}_max"))
    return rows.groupBy(file_col).agg(*aggs)


def prune_estimate(
    zonemaps: DataFrame, *, col: str, lo: Column, hi: Column
) -> DataFrame:
    """Count files a ``col BETWEEN lo AND hi`` predicate can skip:
    prunable iff the file's zone map proves no overlap. Returns one
    row: n_files, n_prunable, scan_fraction (the number that matters
    in the 100 TB cost model)."""
    prunable = (F.col(f"{col}_max") < lo) | (F.col(f"{col}_min") > hi)
    return zonemaps.agg(
        F.count("*").cast("bigint").alias("n_files"),
        F.sum(prunable.cast("bigint")).cast("bigint").alias("n_prunable"),
        F.round(
            1.0 - F.sum(prunable.cast("bigint")) / F.count("*"), 6
        ).alias("scan_fraction"),
    )
