"""Deterministic sampling for training-data pipelines (SURVEY.md §2.2
north-star family).

``df.sample()`` draws from a per-partition RNG: the sample changes with
partitioning, retries, and cluster layout — useless for reproducible
corpus construction. These operators hash the *content key* instead, so
membership is a pure function of (seed, key): stable across runs,
engines, partition counts, and incremental reruns over grown data (a
row's membership never flips when other rows arrive). That is how
training mixtures stay reproducible at 100 TB.

Hash: first 8 hex chars of md5(seed:key) as an integer, bucketed mod
10_000 — portable to any engine with md5 (the DuckDB oracle re-derives
it in SQL).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 10_000


def _bucket(key_col: str, seed: int) -> Column:
    h = F.md5(F.concat(F.lit(f"{seed}:"), F.col(key_col).cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % _BUCKETS


def hash_sample(
    df: DataFrame, *, key_col: str, fraction: float, seed: int = 42
) -> DataFrame:
    """Keep rows whose key hashes below ``fraction`` of the bucket space
    — a deterministic, engine-portable Bernoulli sample."""
    return df.where(_bucket(key_col, seed) < int(fraction * _BUCKETS))


def stratified_hash_sample(
    df: DataFrame,
    *,
    key_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum sampling rates (e.g. upweight rare languages in a
    corpus mix): one hash, a CASE-mapped threshold per stratum. Rows in
    unlisted strata use ``default_fraction``."""
    threshold: Column = F.lit(int(default_fraction * _BUCKETS))
    for value, frac in fractions.items():
        threshold = F.when(
            F.col(stratum_col) == value, F.lit(int(frac * _BUCKETS))
        ).otherwise(threshold)
    return df.where(_bucket(key_col, seed) < threshold)
