"""Streaming sketch maintenance: per-micro-batch KMV sketches appended
to an epoch-partitioned sketch table, merged at read time.

The sketch property that makes this trivial: KMV state (the k smallest
distinct hashes) merges associatively — the sketch of a union is the
merge of the sketches. So streaming "state" needs no read-modify-write:
each epoch writes its own batch's sketches (k values per group, bytes
not gigabytes), and any reader folds all epochs with one
``kmv_merge`` + ``kmv_estimate``. A periodic compaction can fold old
epochs into one row per group, but correctness never requires it.

Exactly-once mirrors the ANN index stream: dynamic partition overwrite
on ``epoch=<id>`` makes a replayed micro-batch rewrite its own subtree
(sketches are deterministic functions of the batch), never duplicate —
and because the merge dedups hashes, even a hypothetical double-counted
epoch could not bias the estimate. That double safety is the reason to
store sketches, not counters, for streaming distincts.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from takuan_spark.operators import sketches


def kmv_sketch_sink(
    table_path: str,
    *,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 64,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` sink: reduce the micro-batch to per-group KMV
    sketches and land them under ``epoch=<id>``, idempotently."""
    groups = list(group_cols)

    def _sink(batch: DataFrame, epoch_id: int) -> None:
        sk = sketches.kmv_sketches(
            batch, group_cols=groups, value_col=value_col, k=k
        ).withColumn("epoch", F.lit(epoch_id))
        (
            sk.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(table_path)
        )

    return _sink


def start_kmv_sketch_stream(
    stream: DataFrame,
    table_path: str,
    checkpoint_path: str,
    *,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 64,
    available_now: bool = False,
    trigger_secs: int = 10,
):
    """Maintain the sketch table over a streaming DataFrame."""
    writer = stream.writeStream.foreachBatch(
        kmv_sketch_sink(
            table_path, group_cols=group_cols, value_col=value_col, k=k
        )
    ).option("checkpointLocation", checkpoint_path)
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_secs} seconds")
    return writer.start()


def kmv_stream_estimate(
    spark,
    table_path: str,
    *,
    group_cols: Sequence[str],
    k: int = 64,
) -> DataFrame:
    """Current distinct-count estimates: fold every epoch's sketches.
    Input size is (groups x epochs x k) hashes — reading the sketch
    table never touches the raw stream data."""
    groups = list(group_cols)
    sk = spark.read.parquet(table_path).drop("epoch")
    return sketches.kmv_estimate(
        sketches.kmv_merge(sk, group_cols=groups, k=k),
        group_cols=groups,
        k=k,
    )


def _swap_in(table_path: str, staged: str) -> None:
    """Directory-rename swap: stage -> live with the old table kept
    until the new one is in place. Same-filesystem renames are atomic
    on POSIX; a crash between the two renames leaves `.old` beside an
    empty live path — recoverable by hand, never silently wrong."""
    old = table_path + ".old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(table_path, old)
    os.rename(staged, table_path)
    shutil.rmtree(old, ignore_errors=True)


def compact_kmv_epochs(
    spark, table_path: str, *, group_cols: Sequence[str], k: int = 64
) -> None:
    """Fold all epochs into one (epoch=0). File listing and read-side
    merge cost grow with epoch count on a long-running stream; the
    merge is associative so compaction never changes any estimate.
    SINGLE-WRITER op: run while the maintainer stream is stopped (the
    epoch writer and the swap race otherwise)."""
    groups = list(group_cols)
    merged = sketches.kmv_merge(
        spark.read.parquet(table_path).drop("epoch"), group_cols=groups, k=k
    ).withColumn("epoch", F.lit(0))
    staged = table_path + ".compacting"
    shutil.rmtree(staged, ignore_errors=True)
    merged.write.mode("overwrite").partitionBy("epoch").parquet(staged)
    _swap_in(table_path, staged)


def compact_cms_epochs(
    spark, table_path: str, *, group_cols: Sequence[str]
) -> None:
    """CMS twin of :func:`compact_kmv_epochs`: sum the epoch grids into
    one. Same single-writer contract."""
    groups = list(group_cols)
    merged = sketches.cms_merge(
        spark.read.parquet(table_path).drop("epoch"), group_cols=groups
    ).withColumn("epoch", F.lit(0))
    staged = table_path + ".compacting"
    shutil.rmtree(staged, ignore_errors=True)
    merged.write.mode("overwrite").partitionBy("epoch").parquet(staged)
    _swap_in(table_path, staged)


def cms_sketch_sink(
    table_path: str,
    *,
    group_cols: Sequence[str],
    value_col: str,
    depth: int = 4,
    width: int = 256,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` sink for count-min grids: each epoch lands its
    batch's (group, row, bucket, c) counters; CMS is linear, so the
    union's grid is the SUM of epoch grids at read time."""
    groups = list(group_cols)

    def _sink(batch: DataFrame, epoch_id: int) -> None:
        grid = sketches.cms_counters(
            batch, group_cols=groups, value_col=value_col,
            depth=depth, width=width,
        ).withColumn("epoch", F.lit(epoch_id))
        (
            grid.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(table_path)
        )

    return _sink


def start_cms_sketch_stream(
    stream: DataFrame,
    table_path: str,
    checkpoint_path: str,
    *,
    group_cols: Sequence[str],
    value_col: str,
    depth: int = 4,
    width: int = 256,
    available_now: bool = False,
    trigger_secs: int = 10,
):
    writer = stream.writeStream.foreachBatch(
        cms_sketch_sink(
            table_path, group_cols=group_cols, value_col=value_col,
            depth=depth, width=width,
        )
    ).option("checkpointLocation", checkpoint_path)
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_secs} seconds")
    return writer.start()


def cms_stream_estimate(
    spark,
    table_path: str,
    probes: DataFrame,
    *,
    group_cols: Sequence[str],
    probe_col: str = "term",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Frequency estimates over everything ingested: sum the epoch
    grids (cms_merge), then the standard min-over-rows point estimate."""
    groups = list(group_cols)
    grids = spark.read.parquet(table_path).drop("epoch")
    merged = sketches.cms_merge(grids, group_cols=groups)
    return sketches.cms_estimate(
        merged, probes, group_cols=groups, probe_col=probe_col,
        depth=depth, width=width,
    )
