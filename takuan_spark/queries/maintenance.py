"""Table-maintenance planner queries: compaction binning and zone-map
prune estimation (operators/maintenance.py).

These are the queries a 100 TB deployment runs BEFORE rewrite jobs:
the compaction planner turns a small-file manifest into an output-bin
manifest, and the prune estimator quantifies — from zone maps alone —
how much scan a candidate re-layout would save. The documents table
stands in for the file manifest (one row per file, n_chars as bytes)
and the events table for the row population being laid out; the
operators themselves take any frame with the right columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from takuan_spark.operators import maintenance
from takuan_spark.operators.layout import sql_zorder_key2, zorder_key2
from takuan_spark.queries import query
from takuan_spark.tables import load_table


@query(
    "q_compaction_bins",
    """
    WITH binned AS (
        SELECT source,
               CAST(floor(
                   (SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    - n_chars) / 4096.0
               ) AS BIGINT) AS bin,
               n_chars
        FROM documents
    )
    SELECT source, bin,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(n_chars) AS BIGINT) AS bytes
    FROM binned GROUP BY source, bin ORDER BY source, bin
    """,
    "Small-file compaction planner: sequential running-sum packing of "
    "each partition's files into ~4 KiB output bins — the Delta "
    "OPTIMIZE / Iceberg rewrite_data_files bin-pack as ONE window over "
    "(partition, order). The window state is a running sum, so a "
    "100 M-file manifest plans in a single shuffle keyed by the "
    "table partition; no file list ever sits in one place.",
)
def q_compaction_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    files = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars"
    )
    return maintenance.compaction_plan(
        files,
        size_col="n_chars",
        order_cols=["doc_id"],
        partition_cols=["source"],
        target_bytes=4096,
    ).orderBy("source", "bin")


_Z = sql_zorder_key2("a", "b", bits=8)


@query(
    "q_zonemap_prune_compare",
    f"""
    WITH dims AS (
        SELECT event_id,
               CAST(user_id % 256 AS BIGINT) AS a,
               CAST(least(greatest(floor(value / 2.0), 0), 255)
                    AS BIGINT) AS b
        FROM events
    ),
    keyed AS (SELECT event_id, a, b, {_Z} AS z FROM dims),
    nat AS (
        SELECT CAST(floor(event_id / 4096.0) AS BIGINT) AS f,
               MIN(b) AS b_min, MAX(b) AS b_max
        FROM keyed GROUP BY 1
    ),
    zod AS (
        SELECT CAST(floor(z / 256.0) AS BIGINT) AS f,
               MIN(b) AS b_min, MAX(b) AS b_max
        FROM keyed GROUP BY 1
    )
    SELECT 'natural' AS layout,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(CASE WHEN b_max < 32 OR b_min > 47 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_prunable,
           ROUND(1.0 - SUM(CASE WHEN b_max < 32 OR b_min > 47
                                THEN 1 ELSE 0 END) / COUNT(*), 6)
               AS scan_fraction
    FROM nat
    UNION ALL
    SELECT 'zorder',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN b_max < 32 OR b_min > 47 THEN 1 ELSE 0 END)
                AS BIGINT),
           ROUND(1.0 - SUM(CASE WHEN b_max < 32 OR b_min > 47
                                THEN 1 ELSE 0 END) / COUNT(*), 6)
    FROM zod
    ORDER BY layout
    """,
    "Zone-map prune estimator: per-file min/max over the SAME rows "
    "under two layouts — natural insert order (key-range files by "
    "event_id) vs Z-order (key-range files by the Morton key) — then "
    "the file count a `b BETWEEN 32 AND 47` predicate can skip. "
    "Quantifies, from metadata-sized aggregates alone, the scan a "
    "re-layout buys BEFORE paying for the rewrite: natural files span "
    "all of b (scan fraction ~1.0), Z-order files confine b to a "
    "16-wide band (most files pruned). Two hash aggregates, no sort.",
)
def q_zonemap_prune_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    dims = ev.select(
        "event_id",
        (F.col("user_id") % 256).cast("bigint").alias("a"),
        F.least(
            F.greatest(F.floor(F.col("value") / 2.0), F.lit(0)), F.lit(255)
        )
        .cast("bigint")
        .alias("b"),
    )
    keyed = dims.select(
        "event_id", "b", zorder_key2(F.col("a"), F.col("b"), bits=8).alias("z")
    )
    lo, hi = F.lit(32), F.lit(47)

    def estimate(file_col, layout: str) -> DataFrame:
        zm = maintenance.zonemap_stats(
            keyed.select(file_col.alias("f"), "b"),
            file_col="f",
            value_cols=["b"],
        )
        est = maintenance.prune_estimate(zm, col="b", lo=lo, hi=hi)
        return est.select(
            F.lit(layout).alias("layout"),
            "n_files",
            "n_prunable",
            "scan_fraction",
        )

    nat = estimate(F.floor(F.col("event_id") / 4096.0).cast("bigint"), "natural")
    zod = estimate(F.floor(F.col("z") / 256.0).cast("bigint"), "zorder")
    return nat.unionAll(zod).orderBy("layout")


@query(
    "ns_deletion_cascade",
    """
    WITH flagged AS (
        SELECT doc_id, text, doc_id % 37 = 0 AS del FROM documents
    ),
    toks AS (
        SELECT doc_id, del,
               list_filter(string_split_regex(text, '\\s+'),
                           x -> x <> '') AS t
        FROM flagged
    ),
    chunks AS (
        SELECT doc_id, del
        FROM toks,
             UNNEST(generate_series(1, greatest(len(t), 1), 48)) AS g(i)
        WHERE i <= len(t)
    ),
    fps AS (
        SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                   AS fp,
               MAX(CASE WHEN del THEN 0 ELSE 1 END) AS retained
        FROM flagged GROUP BY 1
    ),
    per AS (
        SELECT 'documents' AS artifact,
               CAST(COUNT(*) AS BIGINT) AS rows_before,
               CAST(SUM(CASE WHEN del THEN 0 ELSE 1 END) AS BIGINT)
                   AS rows_after
        FROM flagged
        UNION ALL
        SELECT 'chunks', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN del THEN 0 ELSE 1 END) AS BIGINT)
        FROM chunks
        UNION ALL
        SELECT 'fingerprints', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(retained) AS BIGINT)
        FROM fps
    )
    SELECT artifact, rows_before, rows_after,
           CAST(rows_before - rows_after AS BIGINT) AS rows_deleted
    FROM per ORDER BY artifact
    """,
    "Right-to-be-forgotten cascade audit: before/after counts for the "
    "corpus, its derived RAG chunks (anti-join delete), and the dedup "
    "fingerprint table — where a fingerprint survives iff any RETAINED "
    "doc still carries it (shared-content semantics: over-deleting "
    "breaks future dedup, under-deleting retains an ownerless hash). "
    "Delete set = doc_id % 37 = 0. All conditional aggregates; the "
    "only wide exchange is the fingerprint groupBy.",
)
def ns_deletion_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return maintenance.deletion_cascade(
        docs, F.col("doc_id") % 37 == 0
    )
