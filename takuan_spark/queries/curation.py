"""Corpus-curation queries: the quality-gate / decontamination /
packing stages of a training-data pipeline (operators/curation.py),
each with a DuckDB oracle over the same documents table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from takuan_spark.operators import curation
from takuan_spark.queries import query
from takuan_spark.tables import load_table


@query(
    "ns_repetition_filter",
    """
    WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\\s+'),
                                   x -> x <> '') AS t
        FROM documents
    ),
    base AS (
        SELECT doc_id, len(t) AS n_words, len(list_distinct(t)) AS n_distinct, t
        FROM toks
    ),
    bg AS (
        SELECT doc_id, n_words, n_distinct, t[i] || ' ' || t[i+1] AS bg
        FROM base, UNNEST(generate_series(1, greatest(len(t) - 1, 0))) AS g(i)
    ),
    counts AS (
        SELECT doc_id, n_words, n_distinct, bg, COUNT(*) AS c
        FROM bg GROUP BY ALL
    ),
    per_doc AS (
        SELECT doc_id, n_words, n_distinct,
               MAX(c) AS top_bg, SUM(c) AS n_bg
        FROM counts GROUP BY doc_id, n_words, n_distinct
    )
    SELECT doc_id,
           CAST(n_words AS INT) AS n_words,
           ROUND(1 - n_distinct * 1.0 / n_words, 6) AS dup_word_frac,
           ROUND(top_bg * 1.0 / n_bg, 6) AS top_bigram_frac,
           (ROUND(1 - n_distinct * 1.0 / n_words, 6) <= 0.6
            AND ROUND(top_bg * 1.0 / n_bg, 6) <= 0.1) AS keep
    FROM per_doc
    ORDER BY doc_id
    """,
    "Gopher/C4-style repetition quality gate: duplicate-word fraction + "
    "top-bigram fraction per document, with the keep decision. One "
    "explode + two-level agg; shuffle carries distinct (doc, bigram).",
)
def ns_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return curation.repetition_stats(
        docs, max_dup_word_frac=0.6, max_top_bigram_frac=0.1
    ).orderBy("doc_id")


@query(
    "ns_decontaminate",
    """
    WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\\s+'),
                                   x -> x <> '') AS t
        FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
        FROM toks, UNNEST(generate_series(1, greatest(len(t) - 2, 0))) AS g(i)
    ),
    t AS (SELECT doc_id AS train_id, shingle FROM sh WHERE doc_id % 2 = 1),
    b AS (SELECT doc_id AS bench_id, shingle FROM sh WHERE doc_id % 2 = 0),
    shared AS (
        SELECT train_id, bench_id, COUNT(*) AS shared
        FROM t JOIN b USING (shingle)
        GROUP BY 1, 2
        HAVING COUNT(*) >= 3
    )
    SELECT train_id AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bench_hits,
           CAST(MAX(shared) AS BIGINT) AS max_shared
    FROM shared GROUP BY train_id
    ORDER BY doc_id
    """,
    "Benchmark decontamination: odd-id docs are the training set, "
    "even-id docs the held-out benchmark; flag training docs sharing "
    ">= 3 distinct 3-gram shingles with any benchmark doc. Inverted-"
    "index join on hashed shingles — linear, never all-pairs.",
)
def ns_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return curation.contamination_flags(
        docs.where(F.col("doc_id") % 2 == 1),
        docs.where(F.col("doc_id") % 2 == 0),
        n=3,
        min_shared=3,
    ).orderBy("doc_id")


@query(
    "ns_pack_sequences",
    """
    WITH nt AS (
        SELECT doc_id, lang,
               len(list_filter(string_split_regex(text, '\\s+'),
                               x -> x <> '')) AS n_tok
        FROM documents
    ),
    c AS (
        SELECT doc_id, lang, n_tok,
               COALESCE(SUM(n_tok) OVER (
                   PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        FROM nt
    )
    SELECT doc_id, lang, CAST(n_tok AS INT) AS n_tok,
           CAST(cb // 256 AS BIGINT) AS seq_id,
           CAST(cb % 256 AS BIGINT) AS seq_offset
    FROM c
    ORDER BY doc_id
    """,
    "Sequence packing (concat-then-chunk): deterministic assignment of "
    "docs to 256-token training sequences via a per-language running "
    "token total — rerun/partitioning-invariant; windows sort within "
    "strata only, so no global sort exists at scale.",
)
def ns_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return curation.pack_sequences(docs, budget=256).orderBy("doc_id")
