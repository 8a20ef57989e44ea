"""Streaming pipeline: the reference's running service as one
Structured Streaming query (SURVEY.md §2 O1-O3, O14-O15, O29, O30; §3.1).

The mapping, operator by operator:

- file tail + offset checkpoint (O1/O3, ref core/sensor.go:42-123,
  models/state.go): ``readStream.text(dir)`` over a directory of log
  chunks; consumed-file tracking lives in the checkpointLocation. Log
  rotation (O2) is a non-event: a rotated file is a new file.
- micro-batch buffer + periodic flush (O14, ref core/aggregator.go:43-88,
  219-225): ``trigger(processingTime=...)`` with the flush period.
- row-at-a-time DB sink → set-oriented ``foreachBatch`` append (O15).
- error side channel (O29, ref ErrorBus core/aggregator.go:24): rows that
  parse but carry an unparseable datetime keep flowing with
  ``_parse_error = true``; the sink splits them to a quarantine path
  instead of killing the query.
- multi-sensor union (O30): one streaming DF per sensor, unioned, so one
  query/checkpoint drives all sensors — same as the reference's single
  aggregator loop.

The *plan* is byte-identical to the batch one (compile_sensor); only the
source binding differs. That is the whole point of building on
DataFrames: batch replay and live tail share semantics by construction.

Exactly-once report marking (O16/O17): not reimplemented — the streaming
checkpoint already guarantees each micro-batch is delivered to
``foreachBatch`` once per epoch; with an idempotent sink that is the
reference's ``reported_at`` protocol with zero code.
"""

from __future__ import annotations

from collections.abc import Callable
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from takuan_spark.config import PipelineConfig
from takuan_spark.operators.enrich import geo_enrich
from takuan_spark.plans.compiler import EVENT_COLUMNS, compile_sensor


def compile_stream(
    spark: SparkSession,
    config: PipelineConfig,
    *,
    paths: dict[str, str] | None = None,
    geo_dim: DataFrame | None = None,
    max_files_per_trigger: int | None = None,
    tail_files: bool = False,
) -> DataFrame:
    """Streaming events DataFrame: union of all enabled sensors with the
    error-quarantine column (``_parse_error``) retained.

    ``tail_files=False`` (default): each sensor path is a chunk
    DIRECTORY consumed by the built-in file source — the scale path
    (parallel scans, many files). ``tail_files=True``: each path is ONE
    live log file consumed by the byte-offset ``filetail`` source
    (``sources/tail_source.py``) — the reference sensor's exact
    single-file semantics including truncation reset (O1/O2/O3).
    """
    if tail_files:
        from takuan_spark.sources.tail_source import register_filetail

        register_filetail(spark)
    parts = []
    for sensor in config.enabled_sensors():
        path = (paths or {}).get(sensor.name, sensor.filename)
        if tail_files:
            lines = (
                spark.readStream.format("filetail")
                .option("path", path)
                .load()
                .select("value")
            )
        else:
            reader = spark.readStream
            if max_files_per_trigger is not None:
                reader = reader.option(
                    "maxFilesPerTrigger", max_files_per_trigger
                )
            lines = reader.text(path)
        parts.append(
            compile_sensor(
                lines,
                sensor,
                node_name=config.node_name,
                year=config.year,
                quarantine=True,
            )
        )
    if not parts:
        raise ValueError("no enabled sensors")
    events = reduce(lambda a, b: a.unionByName(b), parts)
    if geo_dim is not None:
        events = geo_enrich(
            events.drop("country_code", "country_name"), geo_dim
        ).select(*EVENT_COLUMNS, "_parse_error")
    return events


def split_sink(
    events_path: str,
    quarantine_path: str,
    *,
    post_hook: Callable[[DataFrame, int], None] | None = None,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch sink: good rows → date-partitioned events table,
    parse errors → quarantine (O29). ``post_hook`` is the report-job
    attachment point (the reference's reporter goroutine)."""

    def _sink(batch: DataFrame, epoch_id: int) -> None:
        batch = batch.persist()
        try:
            good = batch.where(~F.col("_parse_error")).drop("_parse_error")
            (
                good.withColumn("event_date", F.to_date("created_at"))
                .write.mode("append")
                .partitionBy("event_date")
                .parquet(events_path)
            )
            bad = batch.where(F.col("_parse_error")).drop("_parse_error")
            if not bad.isEmpty():
                bad.write.mode("append").parquet(quarantine_path)
            if post_hook is not None:
                post_hook(good, epoch_id)
        finally:
            batch.unpersist()

    return _sink


def start_pipeline(
    spark: SparkSession,
    config: PipelineConfig,
    *,
    events_path: str,
    quarantine_path: str,
    checkpoint_path: str,
    paths: dict[str, str] | None = None,
    geo_dim: DataFrame | None = None,
    available_now: bool = False,
    post_hook: Callable[[DataFrame, int], None] | None = None,
    tail_files: bool = False,
) -> StreamingQuery:
    """Start the service. ``available_now=True`` drains the current
    backlog and stops (tests, catch-up runs); otherwise the trigger is
    the config's flush period, exactly the reference's DB-flush ticker.
    ``tail_files=True`` tails single live log files byte-by-byte
    (see :func:`compile_stream`).
    """
    events = compile_stream(
        spark, config, paths=paths, geo_dim=geo_dim, tail_files=tail_files
    )
    writer = events.writeStream.foreachBatch(
        split_sink(events_path, quarantine_path, post_hook=post_hook)
    ).option("checkpointLocation", checkpoint_path)
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{config.flush_period_secs} seconds")
    return writer.start()
