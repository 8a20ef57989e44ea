"""Production hash-family queries — the xxhash64 fast path.

The oracle-gate queries (q_bloom_prefilter, ns_minhash_lsh_neardup)
deliberately pay an md5-per-row portability tax so DuckDB can reproduce
their hashes bit-for-bit. A production deployment swaps the bucket
family to Spark-native ``xxhash64`` behind the same interface
(``operators/bloom.py``, ``operators/dedup.py:minhash_signatures``) —
no string digests, everything stays inside whole-stage codegen. These
queries ARE that swap, registered so the bench measures the production
cost and (where possible) the driver still verifies exactness:

- ``q_bloom_prefilter_prod`` keeps a FULL oracle despite the
  non-portable hash: the bloom pre-filter is followed by the real join,
  and a Bloom filter never false-negatives, so the post-join aggregate
  is exact under ANY family — the oracle checks the join answer, not
  the filter's (family-specific) false-positive set.
- ``ns_minhash_prod_mode`` has no SQL oracle (DuckDB cannot compute
  xxhash64): the driver records the weaker rows-only check, and
  tests/test_northstar.py asserts pair-level parity between the two
  families on a corpus with known near-dups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from takuan_spark.operators import bloom, dedup
from takuan_spark.queries import query
from takuan_spark.tables import load_table

_MBITS = 1024
_K = 3


@query(
    "q_bloom_prefilter_prod",
    """
    WITH eu AS (
        SELECT s_suppkey FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(SUM(l_extendedprice), 2) AS revenue
    FROM lineitem WHERE l_suppkey IN (SELECT s_suppkey FROM eu)
    """,
    "Bloom runtime pre-filter, PRODUCTION family (xxhash64, no md5 "
    "string digests — the bucket probe is a pure integer codegen "
    "expression): filter lineitem before the shuffle, then the REAL "
    "semi-join. Oracle-exact because blooms never false-negative: the "
    "post-join aggregate equals the unfiltered semi-join under any "
    "family; only wasted shuffle rows (false positives) differ. "
    "Benchmarks the md5-vs-xxhash64 cost delta against "
    "q_bloom_prefilter.",
)
def q_bloom_prefilter_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    eu = (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("s_suppkey")
    )
    bl = bloom.bloom_build(
        eu, key_col="s_suppkey", mbits=_MBITS, k=_K, family="xxhash64"
    )
    # bitmap form, not the crossJoin form: a literal predicate cannot
    # be join-reordered above the semi join it protects (the crossJoin
    # probe WAS — Catalyst moved it past the lineitem shuffle), and the
    # probe is O(1) per hash instead of an array scan
    passed = bloom.bloom_bitmap_prefilter(
        li.select("l_suppkey", "l_extendedprice"),
        bl,
        key_col="l_suppkey",
        mbits=_MBITS,
        k=_K,
        family="xxhash64",
    )
    return (
        passed.join(eu, passed.l_suppkey == eu.s_suppkey, "left_semi")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
    )


@query(
    "ns_minhash_prod_mode",
    None,  # xxhash64 is not SQL-expressible in DuckDB; rows-only check
    "MinHash(64) + LSH(16 bands) near-dup pairs, PRODUCTION family: "
    "base shingle hash is Spark-native xxhash64 (no md5 digest per "
    "shingle — the signature pipeline never leaves whole-stage "
    "codegen). Same banding, estimator, and threshold as "
    "ns_minhash_lsh_neardup; pair-level family parity is asserted in "
    "tests/test_northstar.py on a corpus with planted near-dups.",
)
def ns_minhash_prod_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(
        docs, num_hashes=64, bands=16, threshold=0.7, family="xxhash64"
    ).orderBy("id_a", "id_b")
