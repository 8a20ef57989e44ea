"""Loaders for the driver test tables (TESTDATA.md).

One parquet file per table under ``{sf_dir}``. Loading stays lazy —
``spark.read.parquet`` only binds the schema; scans happen when a query
runs, so Catalyst can push filters/projections into the parquet reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects ([PARQUET_TYPE_ILLEGAL]). We read nanos as long via the
    runtime conf and rebuild the timestamp at microsecond precision —
    lossless here (the generator emits µs-aligned values) and matching
    DuckDB, which also reads this column at µs precision.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        # Rebuild as TIMESTAMP_NTZ (naive, like DuckDB reads it) so every
        # downstream date_trunc/date_format is session-timezone-independent
        # — the driver's own SparkSession may not run in UTC.
        return df.withColumn(
            "ts",
            F.timestamp_add(
                "MICROSECOND",
                F.floor(F.col("ts") / 1000).cast("long"),
                F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
            ),
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` queries work."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
