"""Incremental attack report: the merged streaming view must equal the
batch address_report over everything ingested, and replays must not
double-count."""

from __future__ import annotations

import pandas as pd
import pytest

from takuan_spark.operators.reports import address_report
from takuan_spark.streaming.report_stream import (
    merged_report,
    report_sink,
    start_report_stream,
)

SCHEMA = (
    "address string, sensor string, rule string, "
    "country_code string, country_name string"
)


def _events(start, n):
    rows = []
    for i in range(start, start + n):
        ip = f"10.0.0.{i % 7}"
        rows.append(
            {
                "address": ip,
                "sensor": "ssh" if i % 3 else "http",
                "rule": "auth-failure" if i % 2 else "enum",
                "country_code": "US" if i % 7 < 4 else "DE",
                "country_name": "United States" if i % 7 < 4 else "Germany",
            }
        )
    return pd.DataFrame(rows)


@pytest.fixture()
def env(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    return {
        "src": src,
        "table": str(tmp_path / "report"),
        "ckpt": str(tmp_path / "ckpt"),
    }


def _drain(spark, env):
    stream = spark.readStream.schema(SCHEMA).parquet(str(env["src"]))
    q = start_report_stream(
        stream, env["table"], env["ckpt"], available_now=True
    )
    q.awaitTermination(120)


def test_merged_report_equals_batch_report(spark, env):
    _events(0, 60).to_parquet(env["src"] / "b1.parquet")
    _drain(spark, env)
    _events(60, 45).to_parquet(env["src"] / "b2.parquet")
    _drain(spark, env)
    got = [tuple(r) for r in merged_report(spark, env["table"]).collect()]
    want = [
        tuple(r)
        for r in address_report(
            spark.read.parquet(str(env["src"]))
        ).collect()
    ]
    assert got == want


def test_replayed_epoch_does_not_double_count(spark, env):
    batch = spark.createDataFrame(_events(0, 30))
    sink = report_sink(env["table"])
    sink(batch, 5)
    first = [tuple(r) for r in merged_report(spark, env["table"]).collect()]
    sink(batch, 5)  # replay
    second = [tuple(r) for r in merged_report(spark, env["table"]).collect()]
    assert first == second
