"""Config → DataFrame plan compiler (SURVEY.md §3.1).

The reference's startup compiles YAML into a tree of compiled regexes and
runs goroutines over it (ref: core/config.go:19-54, core/sensor.go:27-40,
core/aggregator.go:153-255). Here the compile target is a Spark logical
plan: per sensor ``read → tokenize → rules → datetime → stamp → union``,
and Catalyst is the analyzer/optimizer. The same builder serves batch
(``spark.read.text``) and streaming (``spark.readStream.text``) — the plan
is identical, only the source binding differs.

Event schema (ref: models/event.go:7-20, storage artifacts dropped per
FIXTURES.md §2): created_at, detected_at, node_name, address,
country_code, country_name, sensor, rule, payload, reported_at.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from takuan_spark.config import PipelineConfig, SensorSpec
from takuan_spark.operators.enrich import geo_enrich, stamp_metadata
from takuan_spark.operators.parse import parse_datetime, tokenize
from takuan_spark.operators.rules import apply_rules

EVENT_COLUMNS = [
    "created_at",
    "detected_at",
    "node_name",
    "address",
    "country_code",
    "country_name",
    "sensor",
    "rule",
    "payload",
    "reported_at",
]


def compile_sensor(
    lines: DataFrame,
    sensor: SensorSpec,
    *,
    node_name: str,
    year: int,
    quarantine: bool = False,
) -> DataFrame:
    """One sensor's lines → event rows (the §3.2 hot path, set-oriented).

    ``quarantine=True`` keeps rows whose datetime failed to parse (NULL
    ``created_at``) with a ``_parse_error`` marker instead of dropping
    them — the error side channel, O29 (ref: core/sensor.go:100-101).
    """
    tokens = tokenize(lines, sensor.parser)
    matched = apply_rules(tokens, sensor.rules)
    timed = parse_datetime(matched, sensor.parser, year=year)
    stamped = stamp_metadata(timed, sensor=sensor.name, node_name=node_name)
    events = stamped.select(
        "created_at",
        "detected_at",
        "node_name",
        "address",
        F.lit(None).cast("string").alias("country_code"),
        F.lit(None).cast("string").alias("country_name"),
        "sensor",
        "rule",
        "payload",
        F.lit(None).cast("timestamp").alias("reported_at"),
    )
    if quarantine:
        return events.withColumn("_parse_error", F.col("created_at").isNull())
    return events.where(F.col("created_at").isNotNull())


def compile_batch(
    spark: SparkSession,
    config: PipelineConfig,
    *,
    geo_dim: DataFrame | None = None,
    paths: dict[str, str] | None = None,
) -> DataFrame:
    """Batch plan: union of all enabled sensors (O30), geo-enriched.

    ``paths`` overrides each sensor's configured file/dir (tests point at
    tmp dirs). The union is by name over identical Event schemas.
    """
    parts = []
    for sensor in config.enabled_sensors():
        path = (paths or {}).get(sensor.name, sensor.filename)
        lines = spark.read.text(path)
        parts.append(
            compile_sensor(
                lines, sensor, node_name=config.node_name, year=config.year
            )
        )
    if not parts:
        raise ValueError("no enabled sensors")
    events = reduce(lambda a, b: a.unionByName(b), parts)
    if geo_dim is not None:
        events = geo_enrich(
            events.drop("country_code", "country_name"), geo_dim
        ).select(*EVENT_COLUMNS)
    return events
