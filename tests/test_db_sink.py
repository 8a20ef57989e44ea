"""Streaming → DuckDB exactly-once sink tests (O15/O17): batches land in
a real transactional DB table once each, replays are no-ops."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from takuan_spark.sinks.db import (
    EPOCH_TABLE,
    duckdb_exactly_once_sink,
    duckdb_staged_sink,
)


@pytest.fixture()
def env(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    return {
        "src": src,
        "db": str(tmp_path / "events.duckdb"),
        "ckpt": str(tmp_path / "ckpt"),
    }


def _write_chunk(path, n, offset=0):
    pdf = pd.DataFrame(
        {
            "address": [f"10.0.0.{i % 5}" for i in range(offset, offset + n)],
            "rule": ["auth-failure"] * n,
        }
    )
    pdf.to_parquet(path)


def _drain(spark, env):
    stream = spark.readStream.schema("address string, rule string").parquet(
        str(env["src"])
    )
    q = (
        stream.writeStream.foreachBatch(
            duckdb_exactly_once_sink(env["db"], "events")
        )
        .option("checkpointLocation", env["ckpt"])
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_batches_land_exactly_once_across_restarts(spark, env):
    _write_chunk(env["src"] / "c1.parquet", 20)
    _drain(spark, env)
    con = duckdb.connect(env["db"])
    assert con.sql("SELECT COUNT(*) FROM events").fetchone()[0] == 20
    con.close()

    # restart with no new data: no new epochs with rows, no duplicates
    _drain(spark, env)
    # second chunk: only the delta lands
    _write_chunk(env["src"] / "c2.parquet", 15, offset=100)
    _drain(spark, env)
    con = duckdb.connect(env["db"])
    assert con.sql("SELECT COUNT(*) FROM events").fetchone()[0] == 35
    con.close()


def test_replayed_epoch_is_skipped(spark, env):
    """Simulate the crash-between-sink-and-checkpoint replay: the same
    (batch, epoch_id) delivered twice must insert once."""
    sink = duckdb_exactly_once_sink(env["db"], "events")
    batch = spark.createDataFrame(
        [("1.1.1.1", "r"), ("2.2.2.2", "r")], "address string, rule string"
    )
    sink(batch, 7)
    sink(batch, 7)  # replay
    sink(batch, 8)  # genuinely new epoch
    con = duckdb.connect(env["db"])
    assert con.sql("SELECT COUNT(*) FROM events").fetchone()[0] == 4
    epochs = con.sql(
        f"SELECT epoch_id FROM {EPOCH_TABLE} ORDER BY epoch_id"
    ).fetchall()
    con.close()
    assert [e[0] for e in epochs] == [7, 8]


def _drain_staged(spark, env):
    stream = spark.readStream.schema("address string, rule string").parquet(
        str(env["src"])
    )
    q = (
        stream.writeStream.foreachBatch(
            duckdb_staged_sink(env["db"], "events", env["ckpt"] + "_stage")
        )
        .option("checkpointLocation", env["ckpt"])
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_staged_sink_lands_exactly_once_across_restarts(spark, env):
    """The executor-parallel staged variant holds the same exactly-once
    contract end-to-end: restart with no data is a no-op, deltas land
    once, and the stage spool is cleaned after commit."""
    import os

    _write_chunk(env["src"] / "c1.parquet", 20)
    _drain_staged(spark, env)
    _drain_staged(spark, env)  # restart, no new data
    _write_chunk(env["src"] / "c2.parquet", 15, offset=100)
    _drain_staged(spark, env)
    con = duckdb.connect(env["db"])
    assert con.sql("SELECT COUNT(*) FROM events").fetchone()[0] == 35
    con.close()
    stage = env["ckpt"] + "_stage"
    leftover = (
        [d for d in os.listdir(stage) if d.startswith("epoch=")]
        if os.path.isdir(stage)
        else []
    )
    assert leftover == []  # spool removed after successful commits


def test_staged_sink_replay_is_skipped(spark, env, tmp_path):
    sink = duckdb_staged_sink(env["db"], "events", str(tmp_path / "stage"))
    batch = spark.createDataFrame(
        [("1.1.1.1", "r"), ("2.2.2.2", "r")], "address string, rule string"
    )
    sink(batch, 3)
    sink(batch, 3)  # replay after a simulated checkpoint-commit crash
    sink(batch, 4)
    con = duckdb.connect(env["db"])
    assert con.sql("SELECT COUNT(*) FROM events").fetchone()[0] == 4
    epochs = con.sql(
        f"SELECT epoch_id FROM {EPOCH_TABLE} ORDER BY epoch_id"
    ).fetchall()
    con.close()
    assert [e[0] for e in epochs] == [3, 4]


def test_staged_sink_survives_empty_batch(spark, tmp_path):
    """An empty micro-batch stages zero part files; the sink must
    register the epoch and move on instead of wedging the stream on a
    matchless read_parquet glob forever."""
    import duckdb

    from takuan_spark.sinks.db import duckdb_staged_sink

    db = str(tmp_path / "t.db")
    stage = str(tmp_path / "stage")
    sink = duckdb_staged_sink(db, "events", stage)
    empty = spark.createDataFrame([], "id long, v string")
    sink(empty, 0)  # must not raise
    sink(empty, 0)  # replay of the registered empty epoch: no-op
    full = spark.createDataFrame([(1, "a")], "id long, v string")
    sink(full, 1)
    con = duckdb.connect(db)
    assert con.execute("SELECT COUNT(*) FROM events").fetchone()[0] == 1
    assert con.execute(
        "SELECT COUNT(*) FROM _sink_epochs WHERE tbl = 'events'"
    ).fetchone()[0] == 2
