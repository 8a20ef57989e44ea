"""Pipeline observability via Spark's ``observe`` API.

At 100 TB you cannot afford a second scan to learn what a job just did
— ``observe`` computes named aggregate metrics DURING the action that
was already running (they ride the same tasks, like accumulators but
with full aggregate expressions). Batch callers get a
``pyspark.sql.Observation`` to read after any action; streaming callers
get the metrics in every progress event under ``observedMetrics``.

The canonical use here is parse-quality accounting on the log pipeline:
total rows, quarantined rows (``_parse_error`` side channel,
SURVEY.md §2 O29), and the error rate — without a separate count job
over the quarantine output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quality_metrics_exprs(error_col: str = "_parse_error"):
    """The metric expressions shared by both attachment modes.
    ``error_col`` is the pipeline's BOOLEAN quarantine marker
    (plans/compiler.py: true = row failed to parse); NULL counts as
    not-quarantined."""
    return [
        F.count(F.lit(1)).alias("rows_total"),
        # outer coalesce: SUM over an EMPTY frame/micro-batch is NULL,
        # and a metrics consumer dividing or thresholding on None
        # breaks — an empty batch quarantined 0 rows, say 0.
        F.coalesce(
            F.sum(F.coalesce(F.col(error_col), F.lit(False)).cast("long")),
            F.lit(0),
        ).alias("rows_quarantined"),
    ]


def observe_batch_quality(
    df: DataFrame, *, error_col: str = "_parse_error"
):
    """Attach parse-quality metrics to a BATCH frame. Returns
    ``(df, observation)``; after any action on ``df`` (or a descendant
    that keeps the observed node), ``observation.get`` yields
    ``{"rows_total": ..., "rows_quarantined": ...}`` at no extra scan
    cost."""
    from pyspark.sql import Observation

    obs = Observation("parse_quality")
    return df.observe(obs, *quality_metrics_exprs(error_col)), obs


def observe_stream_quality(
    df: DataFrame, *, name: str = "parse_quality", error_col: str = "_parse_error"
) -> DataFrame:
    """Streaming variant: metrics appear per micro-batch in
    ``query.lastProgress["observedMetrics"][name]`` (and in every
    progress listener event) — the feed a lag/error-rate alert reads."""
    return df.observe(name, *quality_metrics_exprs(error_col))
