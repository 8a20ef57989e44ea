"""Source readers (batch + streaming)."""

from takuan_spark.sources.readers import (  # noqa: F401
    read_csv,
    read_json,
    read_parquet,
    read_text,
    stream_text,
)
