"""Structured Streaming wrap of the compiled pipeline."""

from takuan_spark.streaming.pipeline import (  # noqa: F401
    compile_stream,
    start_pipeline,
)
