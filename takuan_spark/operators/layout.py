"""Data-layout keys for multi-dimensional scan locality (SURVEY.md
§2.2 scale tooling).

At 100 TB the scan you avoid is the cheapest scan: parquet row-group
min/max statistics prune files only when rows with similar values sit
together. Sorting by one column clusters that column and scatters every
other; a Z-ORDER (Morton) key bit-interleaves two dimensions so sorting
by the single key clusters BOTH — each contiguous key range maps to a
small rectangle in (a, b) space, and filters on either dimension skip
most row groups (the Delta/Iceberg `OPTIMIZE ZORDER BY` primitive).

The key is pure integer arithmetic (shifts expressed as multiplies, so
the identical expression runs in any SQL engine), built for the common
two-dimension case; higher dimensions compose by interleaving the
result with the next column at the caller's chosen bit budget.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key2(a: Column, b: Column, *, bits: int = 8) -> Column:
    """Morton-interleave the low ``bits`` of two non-negative int
    columns: result bit (2i+1) = a's bit i, bit (2i) = b's bit i.
    Inputs must already be bucketed into [0, 2^bits) — the caller
    chooses the bucketing (modulo, range bin, date part); this function
    only interleaves. One codegen'd expression, no UDF."""
    out = F.lit(0).cast("bigint")
    for i in range(bits):
        abit = F.floor(a / F.lit(1 << i)).cast("bigint") % 2
        bbit = F.floor(b / F.lit(1 << i)).cast("bigint") % 2
        out = (
            out
            + abit * F.lit(1 << (2 * i + 1))
            + bbit * F.lit(1 << (2 * i))
        )
    return out


def sql_zorder_key2(a_expr: str, b_expr: str, *, bits: int = 8) -> str:
    """The DuckDB spelling of :func:`zorder_key2` — same
    multiply-based shifts, bit-identical by construction."""
    terms = []
    for i in range(bits):
        terms.append(
            f"(CAST(floor(({a_expr}) / {1 << i}) AS BIGINT) % 2)"
            f" * {1 << (2 * i + 1)}"
        )
        terms.append(
            f"(CAST(floor(({b_expr}) / {1 << i}) AS BIGINT) % 2)"
            f" * {1 << (2 * i)}"
        )
    return "(" + " + ".join(terms) + ")"
