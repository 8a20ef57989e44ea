"""JDBC sink/source over embedded Derby (ref: core/aggregator.go:159-171
MySQL connect + auto-migrate; 77-88 flush loop)."""

from __future__ import annotations

import pytest

from takuan_spark.sinks.jdbc import (
    derby_url,
    jdbc_exactly_once_sink,
    read_jdbc_partitioned,
    write_jdbc,
)


@pytest.fixture()
def url(tmp_path):
    return derby_url(str(tmp_path / "db"))


def test_write_read_roundtrip(spark, url):
    df = spark.range(100).selectExpr(
        "id", "cast(id % 7 as int) grp", "cast(id * 1.5 as double) v"
    )
    write_jdbc(df, url, "events", num_partitions=2)
    back = read_jdbc_partitioned(
        spark, url, "events",
        partition_column="id", lower_bound=0, upper_bound=100,
        num_partitions=4,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 100
    assert back.agg({"v": "sum"}).first()[0] == pytest.approx(
        sum(i * 1.5 for i in range(100))
    )


def test_partitioned_read_bounds_do_not_drop_rows(spark, url):
    write_jdbc(spark.range(50).selectExpr("id"), url, "t")
    # Bounds narrower than the data: rows outside land in edge partitions.
    back = read_jdbc_partitioned(
        spark, url, "t",
        partition_column="id", lower_bound=10, upper_bound=40,
        num_partitions=3,
    )
    assert back.count() == 50


def test_exactly_once_replayed_epoch_is_skipped(spark, url):
    sink = jdbc_exactly_once_sink(url, "events")
    batch = spark.range(10).selectExpr("id", "cast(id as double) v")
    sink(batch, 0)
    sink(batch, 0)  # replay of the same epoch — must not duplicate
    sink(batch, 1)  # a new epoch appends

    back = spark.read.format("jdbc").options(
        url=url, dbtable="events",
        driver="org.apache.derby.jdbc.EmbeddedDriver",
    ).load()
    assert back.count() == 20


def test_exactly_once_streaming_end_to_end(spark, url, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.jsonl").write_text(
        "\n".join('{"id": %d}' % i for i in range(5))
    )
    stream = (
        spark.readStream.schema("id long").json(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(jdbc_exactly_once_sink(url, "s_events"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    back = spark.read.format("jdbc").options(
        url=url, dbtable="s_events",
        driver="org.apache.derby.jdbc.EmbeddedDriver",
    ).load()
    assert back.count() == 5


def test_exactly_once_survives_kill_and_resume(spark, url, tmp_path):
    """Restart-replay gate for O17: a run is killed mid-epoch AFTER the
    sink promoted epoch 0 into Derby but BEFORE Spark wrote the epoch's
    commit marker — the exact crash window the staging+guard protocol
    exists for. The crash state is constructed directly (epoch 0
    delivered through the sink, checkpoint holding no commit for it);
    the restarted query then replays epoch 0 through foreachBatch and
    the guard must skip the promote. A second run delivers new data as
    epoch 1. Derby must hold each row exactly once.

    (The crash cannot be simulated by deleting commits/0 from a
    finished checkpoint: Spark 4's commit-log tamper check aborts with
    'multiple streaming queries are concurrently using' instead of
    replaying.)"""
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    (src / "a.jsonl").write_text(
        "\n".join('{"id": %d}' % i for i in range(5))
    )
    sink = jdbc_exactly_once_sink(url, "k_events")

    # the killed run: epoch 0 promoted, no commit marker ever written
    sink(spark.read.schema("id long").json(str(src / "a.jsonl")), 0)

    def run_once():
        q = (
            spark.readStream.schema("id long")
            .json(str(src))
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # restart: replays the same data as epoch 0 -> guard must skip
    run_once()
    # then normal progress: new file arrives, delivered as epoch 1
    (src / "b.jsonl").write_text(
        "\n".join('{"id": %d}' % i for i in range(100, 103))
    )
    run_once()

    back = spark.read.format("jdbc").options(
        url=url, dbtable="k_events",
        driver="org.apache.derby.jdbc.EmbeddedDriver",
    ).load()
    rows = sorted(r["id"] for r in back.collect())
    assert rows == [0, 1, 2, 3, 4, 100, 101, 102]
