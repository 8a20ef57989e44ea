"""The declared query registry — the engine's public query surface.

Every operator from SURVEY.md §2 (and the §2.2 north-star extensions) is
exposed as a named query: a Spark DataFrame builder plus, when the
semantics are ANSI-SQL-expressible, the equivalent DuckDB oracle SQL.
The driver runs both sides at sf0.01 and hash-compares (row-count +
schema + order-insensitive value hash), so:

- every computed column is aliased identically in both dialects;
- double aggregates are rounded in both (summation order differs between
  engines; the true values agree to ~1e-8 relative, far inside the
  rounding guard);
- counts are CAST to BIGINT in DuckDB (its SUM(int) widens to HUGEINT);
- orderings carry stable tiebreak keys, and string encodings (counter
  segments, fingerprints) are defined deterministically.

Queries whose semantics are not reasonably SQL-expressible (MinHash LSH
banding, SimHash) are registered without oracle SQL — the driver records
a weaker rows-only check, and tests/test_northstar.py pins their
semantics against independent Python implementations instead.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: QueryFn
    oracle_sql: str | None
    description: str


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle_sql: str | None, description: str = ""):
    """Register a (spark builder, oracle sql) pair under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name, fn, oracle_sql, description or fn.__doc__ or "")
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _load()
    return {n: s.builder for n, s in REGISTRY.items()}


def all_oracle_sql() -> dict[str, str]:
    _load()
    return {n: s.oracle_sql for n, s in REGISTRY.items() if s.oracle_sql is not None}


_loaded = False


def _load() -> None:
    """Import the query modules (registration side effect), once."""
    global _loaded
    if _loaded:
        return
    from takuan_spark.queries import (  # noqa: F401
        advanced,
        multimodal,
        northstar,
        relational,
        takuan,
    )

    _loaded = True
