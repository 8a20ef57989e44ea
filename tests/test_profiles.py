"""transformWithStateInPandas per-address profile operator: state
carries across micro-batches, counters use the reference's sorted
encoding, snapshots emit per batch (Update mode)."""

from __future__ import annotations

import pandas as pd
import pytest

from takuan_spark.streaming.profiles import address_profiles

try:  # transformWithState's control channel needs a working protobuf
    from google.protobuf import descriptor  # noqa: F401

    _HAS_PROTOBUF = True
except ImportError:  # pragma: no cover - environment-dependent
    _HAS_PROTOBUF = False

pytestmark = pytest.mark.skipif(
    not _HAS_PROTOBUF,
    reason="transformWithStateInPandas requires google.protobuf, "
    "which this environment lacks (see streaming/profiles.py docstring)",
)


@pytest.fixture()
def stream_env(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    return {
        "src": src,
        "out": str(tmp_path / "out"),
        "ckpt": str(tmp_path / "ckpt"),
    }


def _write_chunk(path, rows):
    pdf = pd.DataFrame(rows, columns=["address", "created_at", "rule"])
    pdf["created_at"] = pd.to_datetime(pdf["created_at"]).astype("datetime64[us]")
    pdf.to_parquet(path)


def _drain(spark, env):
    # transformWithState supports only the RocksDB state store
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    stream = spark.readStream.schema(
        "address string, created_at timestamp, rule string"
    ).parquet(str(env["src"]))
    q = (
        address_profiles(stream, ttl_idle_secs=3600)
        .writeStream.format("parquet")
        .option("path", env["out"])
        .option("checkpointLocation", env["ckpt"])
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_profiles_accumulate_across_batches(spark, stream_env):
    _write_chunk(
        stream_env["src"] / "c1.parquet",
        [
            ("1.1.1.1", "2026-08-13 06:00:00", "auth-failure"),
            ("1.1.1.1", "2026-08-13 06:00:10", "auth-failure"),
            ("1.1.1.1", "2026-08-13 06:00:20", "user-enumeration"),
            ("2.2.2.2", "2026-08-13 06:01:00", "auth-failure"),
        ],
    )
    _drain(spark, stream_env)
    snap1 = {
        r["address"]: r
        for r in spark.read.parquet(stream_env["out"]).collect()
    }
    assert snap1["1.1.1.1"]["n_events"] == 3
    assert snap1["1.1.1.1"]["counters"] == "auth-failure:2|user-enumeration:1"
    assert snap1["2.2.2.2"]["n_events"] == 1

    # second batch: state carries, counts accumulate, first_seen sticks
    _write_chunk(
        stream_env["src"] / "c2.parquet",
        [
            ("1.1.1.1", "2026-08-13 06:05:00", "user-enumeration"),
        ],
    )
    _drain(spark, stream_env)
    rows = [
        r
        for r in spark.read.parquet(stream_env["out"]).collect()
        if r["address"] == "1.1.1.1"
    ]
    latest = max(rows, key=lambda r: r["n_events"])
    assert latest["n_events"] == 4
    assert latest["counters"] == "auth-failure:2|user-enumeration:2"
    assert latest["first_seen"] == int(
        pd.Timestamp("2026-08-13 06:00:00").timestamp()
    )
    assert latest["last_seen"] == int(
        pd.Timestamp("2026-08-13 06:05:00").timestamp()
    )
