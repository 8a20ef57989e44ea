"""Report queries (SURVEY.md §2 O16-O27, §3.3).

The reference's hourly report job is, semantically, two aggregate queries
over the unreported slice of the events table:

1. per-address report (ref: core/reporter.go:97-173): group by address →
   total count, first country, and a ``sensor/rule:count`` counters string —
   sorted descending by count, written to CSV.
2. per-country top-k (ref: core/twitter.go:44-95): group by country →
   count desc → limit 5.

Determinism: the reference builds the counters string from a Go map whose
iteration order is random (core/reporter.go:148-161). We define the engine
semantics as *sorted* segments (`sort_array` before `concat_ws`), and all
orderings get stable tiebreak keys — required for oracle hashing and the
right call for any engine.

Scale notes: both queries are two-level hash aggregations — partial
(map-side) aggregation happens before the shuffle on the group key, so at
100 TB the shuffle carries one row per (address, sensor, rule), not one
per event. No driver-side state; the only ``limit`` is the final top-k,
which Spark plans as TakeOrderedAndProject (per-partition heap + merge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unreported(events: DataFrame, *, col: str = "reported_at") -> DataFrame:
    """The unreported slice: ``WHERE reported_at IS NULL`` (O16,
    ref: core/aggregator.go:94)."""
    return events.where(F.col(col).isNull())


def mark_reported(events: DataFrame, *, col: str = "reported_at") -> DataFrame:
    """Batch analog of the exactly-once marker (O17, ref:
    core/aggregator.go:109-115): set ``reported_at`` on every unreported
    row in one set-oriented pass (caller overwrites the table). In
    streaming this is unnecessary — the checkpoint guarantees each batch
    is reported once.
    """
    return events.withColumn(
        col, F.coalesce(F.col(col), F.current_timestamp())
    )


def address_report(
    events: DataFrame,
    *,
    address_col: str = "address",
    sensor_col: str = "sensor",
    rule_col: str = "rule",
    country_cols: tuple[str, str] | None = ("country_code", "country_name"),
    seen_col: str | None = None,
) -> DataFrame:
    """Per-address attack report (O18-O23).

    Output: ``address, [country_code, country_name,] total_events,
    counters`` sorted by total_events desc (stable tiebreak on address).
    ``counters`` is the reference's ``sensor/rule:count|...`` encoding with
    deterministic (sorted) segment order.

    ``seen_col`` (a timestamp column, e.g. ``created_at``) appends
    ``first_seen`` / ``last_seen`` per address — min/max fold through
    BOTH aggregation levels, so the extra fields ride the existing
    shuffle chain instead of a second scan + self-join of the fact
    (the composition cost that matters at 100 TB).

    Two-level aggregation in one shuffle chain:
    ``groupBy(address, sensor, rule).count()`` (inner, map-side combined)
    → ``groupBy(address)`` re-aggregate. The second groupBy reuses the
    hash partitioning on ``address`` from the first shuffle's key prefix.
    """
    inner_keys = [address_col, sensor_col, rule_col]
    if country_cols:
        # country is constant per address (one geo row per IP) → first()
        # matches the reference's addrEvents[0] (core/reporter.go:165-166).
        # NOTE: first() here rides on the inner agg needing the columns; we
        # instead carry them through the inner groupBy for determinism.
        inner_keys += list(country_cols)
    inner_aggs = [F.count("*").alias("cnt")]
    if seen_col:
        inner_aggs += [
            F.min(seen_col).alias("_first_seen"),
            F.max(seen_col).alias("_last_seen"),
        ]
    inner = events.groupBy(*inner_keys).agg(*inner_aggs)
    segment = F.concat_ws(
        ":", F.concat_ws("/", F.col(sensor_col), F.col(rule_col)), F.col("cnt")
    )
    aggs = [
        F.sum("cnt").alias("total_events"),
        F.concat_ws("|", F.sort_array(F.collect_list(segment))).alias("counters"),
    ]
    if country_cols:
        aggs = [
            F.min(country_cols[0]).alias(country_cols[0]),
            F.min(country_cols[1]).alias(country_cols[1]),
            *aggs,
        ]
    if seen_col:
        aggs += [
            F.min("_first_seen").alias("first_seen"),
            F.max("_last_seen").alias("last_seen"),
        ]
    report = inner.groupBy(address_col).agg(*aggs)
    return report.orderBy(F.desc("total_events"), F.asc(address_col))


def country_topk(
    events: DataFrame,
    *,
    country_col: str = "country_code",
    k: int = 5,
) -> DataFrame:
    """Per-country event counts, top-k (O26, ref: core/twitter.go:48-80).

    ``orderBy(...).limit(k)`` plans as TakeOrderedAndProject — a true
    distributed top-k, no global sort materialized. Tiebreak on the
    country code keeps the result deterministic (the reference's
    sort.Slice is not stable under ties).
    """
    counts = events.groupBy(country_col).agg(F.count("*").alias("total_events"))
    return counts.orderBy(F.desc("total_events"), F.asc(country_col)).limit(k)


def country_flag(code: str | None) -> str:
    """ISO-3166 alpha-2 code → emoji flag (O27, ref: core/twitter.go:88
    ``emoji.CountryFlag``): each letter maps to its regional-indicator
    symbol (U+1F1E6..U+1F1FF); no lookup table needed. Unknown/missing
    codes render as the white flag, matching the reference's fallback of
    not crashing on unmapped countries."""
    if (
        not code
        or len(code) != 2
        or not code.isascii()
        or not code.isalpha()
    ):
        # isascii() matters: a non-ASCII "letter" would otherwise map
        # outside the regional-indicator block (mojibake, not a flag)
        return "\U0001F3F3"  # white flag
    return "".join(chr(0x1F1E6 + ord(c) - ord("A")) for c in code.upper())


def format_country_summary(topk_rows: list, total: int) -> str:
    """Scalar formatting of the tweet text (O27, ref: core/twitter.go:
    69-90) — cosmetic, driver-side over the tiny top-k result."""
    parts = [
        f"{r['total_events']} from {country_flag(r[0])} {r[0] or 'unknown'}"
        for r in topk_rows
    ]
    plural = "s" if total != 1 else ""
    return f"{total} event{plural}: " + ", ".join(parts) + ("..." if parts else "")
