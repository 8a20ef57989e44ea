"""Continuously deduplicated corpus: the streaming form of incremental
dedup (SURVEY.md §2.2 north-star; batch form operators/dedup.py:
dedup_incremental).

Production shape for continuously-arriving training data: each
micro-batch is (a) self-deduped (min-id survivor per content
fingerprint), (b) anti-joined against the corpus fingerprint table, and
the novel remainder is appended to the corpus with its fingerprint
delta appended to the fp table. The fp table carries 32-byte md5 keys —
at 100 TB of corpus it is the only state, it is bucketable by fp at
rest, and the anti-join is a sort-merge that co-locates when both sides
are bucketed.

Delivery semantics: content-level idempotence FOR FREE — if an epoch is
replayed after a crash that landed its fp delta, the replayed batch
anti-joins against fingerprints that now include its own content and
contributes zero novel rows. No epoch registry needed (contrast
sinks/db.py, which needs one because SQL appends are not content-keyed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from takuan_spark.operators.dedup import dedup_incremental

FP_SCHEMA = "fp string"


def _read_fps(spark: SparkSession, fp_path: str) -> DataFrame:
    try:
        return spark.read.schema(FP_SCHEMA).parquet(fp_path)
    except Exception:  # first batch: no fp table yet
        return spark.createDataFrame([], FP_SCHEMA)


def dedup_batch_sink(
    spark: SparkSession,
    *,
    corpus_path: str,
    fp_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """``foreachBatch`` sink implementing the incremental-dedup protocol.
    Exposed separately so batch backfills can reuse it."""

    def _sink(batch: DataFrame, epoch_id: int) -> None:
        seen = _read_fps(spark, fp_path)
        novel, new_fps = dedup_incremental(
            batch, seen, text_col=text_col, id_col=id_col
        )
        # Persist: novel feeds two writes; without it the batch
        # self-dedup + anti-join would execute twice.
        novel = novel.persist()
        try:
            novel.write.mode("append").parquet(corpus_path)
            new_fps.write.mode("append").parquet(fp_path)
        finally:
            novel.unpersist()

    return _sink


def start_dedup_stream(
    docs_stream: DataFrame,
    *,
    corpus_path: str,
    fp_path: str,
    checkpoint_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    available_now: bool = False,
    trigger_secs: int = 30,
) -> StreamingQuery:
    """Run the continuously-deduplicating ingest over a docs stream."""
    spark = docs_stream.sparkSession
    writer = docs_stream.writeStream.foreachBatch(
        dedup_batch_sink(
            spark,
            corpus_path=corpus_path,
            fp_path=fp_path,
            text_col=text_col,
            id_col=id_col,
        )
    ).option("checkpointLocation", checkpoint_path)
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_secs} seconds")
    return writer.start()
