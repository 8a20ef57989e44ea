"""Sketch-aggregate queries: KMV distinct estimation and count-min
frequency estimation over the documents token stream — APPROXIMATE
answers that are still hash-match oracle-checkable, because the sketch
state derives from the portable md5 hash family and the estimator is
integer/double arithmetic both engines evaluate identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from takuan_spark.operators import sketches
from takuan_spark.operators.hashing import sql_md5_int
from takuan_spark.operators.text import words
from takuan_spark.queries import query
from takuan_spark.tables import load_table

#: Probe terms for the CMS query — fixed literals (present or not; an
#: absent term estimates from collision counts alone, possibly 0).
_CMS_TERMS = [
    "the", "a", "of", "to", "and", "in", "data", "for", "is", "quantum"
]

_TOKS_CTE = """
    toks AS (
        SELECT source,
               unnest(list_filter(string_split_regex(text, '\\s+'),
                                  x -> x <> '')) AS tok
        FROM documents
    )
"""


@query(
    "ns_kmv_distinct",
    f"""
    WITH {_TOKS_CTE}
    {sketches.kmv_oracle_sql(source_expr="toks", group_col="source",
                             value_col="tok", k=16).replace("WITH ", ", ", 1)}
    ORDER BY source
    """,
    "KMV (k-minimum-values, k=16 — below the per-source vocabulary, so "
    "the ESTIMATOR path is what the oracle checks) distinct-token "
    "estimate per source: "
    "the mergeable cardinality sketch — each partition reduces to at "
    "most k hashes per group before the exchange (the map-side combine "
    "an exact distinct cannot have), and the merged k-minimum set is "
    "partitioning-invariant, so the approximate answer is exactly "
    "reproducible by the oracle's global row_number formulation.",
)
def ns_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("source", F.explode(words(F.col("text"))).alias("tok"))
    return sketches.kmv_distinct(
        toks, group_cols=["source"], value_col="tok", k=16
    ).orderBy("source")


@query(
    "ns_hll_distinct",
    f"""
    WITH {_TOKS_CTE}
    {sketches.hll_oracle_sql(source_expr="toks", group_col="source",
                             value_col="tok").replace("WITH ", ", ", 1)}
    ORDER BY source
    """,
    "HyperLogLog (m=64 registers, md5-derived 60-bit hashes) distinct-"
    "token estimate per source — the fixed-size max-sketch: every "
    "partition collapses to <= 64 (reg, max rho) rows per group before "
    "the exchange, merges are cell-wise max (associative, partitioning-"
    "invariant), and the harmonic sum stays in exact integer fixed-"
    "point so the approximate answer is bit-reproducible by the "
    "oracle's global formulation. Complements KMV: registers never "
    "grow with k and the state is 64 ints however large the corpus.",
)
def ns_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("source", F.explode(words(F.col("text"))).alias("tok"))
    return sketches.hll_distinct(
        toks, group_cols=["source"], value_col="tok"
    ).orderBy("source")


@query(
    "ns_cms_heavy_hitters",
    f"""
    WITH {_TOKS_CTE},
    plane AS (
        SELECT source, tok, r.j AS row
        FROM toks CROSS JOIN UNNEST(generate_series(0, 3)) AS r(j)
    ),
    counters AS (
        SELECT source, row,
               CAST({sql_md5_int("CAST(row AS VARCHAR) || ':' || tok",
                                 hex_chars=15)} % 256 AS INT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM plane GROUP BY 1, 2, 3
    ),
    probes AS (
        SELECT t.term, r.j AS row,
               CAST({sql_md5_int("CAST(r.j AS VARCHAR) || ':' || t.term",
                                 hex_chars=15)} % 256 AS INT) AS bucket
        FROM (VALUES {", ".join(f"('{t}')" for t in _CMS_TERMS)}) AS t(term)
        CROSS JOIN UNNEST(generate_series(0, 3)) AS r(j)
    ),
    grid AS (
        SELECT g.source, p.term, p.row, p.bucket
        FROM (SELECT DISTINCT source FROM counters) g CROSS JOIN probes p
    )
    SELECT grid.source, grid.term,
           CAST(MIN(COALESCE(c.c, 0)) AS BIGINT) AS est_count
    FROM grid LEFT JOIN counters c
      ON c.source = grid.source AND c.row = grid.row
     AND c.bucket = grid.bucket
    GROUP BY grid.source, grid.term
    ORDER BY grid.source, grid.term
    """,
    "Count-min sketch (4 x 256) per source with point estimates for 10 "
    "probe terms: bounded counter-grid state built by one partial+final "
    "hash aggregation regardless of distinct cardinality; estimates are "
    "min-over-rows with empty buckets counting 0 (probe grid LEFT-joins "
    "the counters). md5-derived bucket hashes make the approximate "
    "counts bit-reproducible by the oracle.",
)
def ns_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("source", F.explode(words(F.col("text"))).alias("tok"))
    counters = sketches.cms_counters(
        toks, group_cols=["source"], value_col="tok", depth=4, width=256
    )
    probes = docs.sparkSession.createDataFrame(
        [(t,) for t in _CMS_TERMS], "term string"
    )
    return sketches.cms_estimate(
        counters, probes, group_cols=["source"], depth=4, width=256
    ).orderBy("source", "term")
