"""Per-attacker rolling profiles via ``transformWithStateInPandas`` —
the Spark 4 arbitrary-stateful-processing API (SURVEY.md §2.1
streaming-only surface; complements ``stateful.py``'s
``applyInPandasWithState`` detector).

The operator maintains, per address, a running profile across
micro-batches: total event count, first/last seen, and per-rule counts
held in typed **MapState** (one map entry per rule — the state store
schema the reference keeps implicitly in its SQL events table,
ref: core/reporter.go:148-161 counter building). Each batch emits the
updated profile snapshot (Update mode), with the counters string in the
reference's sorted ``rule:count|...`` encoding.

Why this API over ``applyInPandasWithState``: typed composite state
(value + map) instead of one tuple blob, per-entry TTL (idle profiles
age out without timers — no drain stall under ``availableNow``), and
the same processor works unchanged under event-time or processing-time
semantics. State is partitioned by address in the state store (RocksDB
at scale) — no driver-side accumulation, scales with executors.

Environment requirements: ``transformWithState`` needs (a) the RocksDB
state store provider (``spark.sql.streaming.stateStore.providerClass``
= ``...state.RocksDBStateStoreProvider``) and (b) a working
``google.protobuf`` install for its control-channel messages. This
container ships a broken protobuf (no ``descriptor`` module), so the
operator is exercised by a test that SKIPS cleanly when protobuf is
unavailable; ``stateful.py``'s ``applyInPandasWithState`` detector is
the environment-independent stateful path.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

PROFILE_SCHEMA = StructType(
    [
        StructField("address", StringType(), False),
        StructField("n_events", LongType(), False),
        StructField("first_seen", LongType(), False),
        StructField("last_seen", LongType(), False),
        StructField("counters", StringType(), False),
    ]
)

_TOTALS_SCHEMA = StructType(
    [
        StructField("n_events", LongType(), True),
        StructField("first_seen", LongType(), True),
        StructField("last_seen", LongType(), True),
    ]
)


class AddressProfileProcessor(StatefulProcessor):
    """Running per-address profile: ValueState totals + MapState
    per-rule counts, both with the same idle TTL."""

    def __init__(self, ttl_ms: int | None = None):
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState(
            "totals", _TOTALS_SCHEMA, ttlDurationMs=self._ttl_ms
        )
        self._rule_counts = handle.getMapState(
            "rule_counts",
            "rule string",
            "cnt bigint",
            ttlDurationMs=self._ttl_ms,
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        (address,) = key
        n_new = 0
        t_min = None
        t_max = None
        new_rule_counts: dict[str, int] = {}
        for pdf in rows:
            n_new += len(pdf)
            ts = pd.to_datetime(pdf["created_at"])
            lo, hi = int(ts.min().timestamp()), int(ts.max().timestamp())
            t_min = lo if t_min is None else min(t_min, lo)
            t_max = hi if t_max is None else max(t_max, hi)
            for rule, cnt in pdf["rule"].value_counts().items():
                new_rule_counts[rule] = new_rule_counts.get(rule, 0) + int(cnt)

        if self._totals.exists():
            n0, f0, l0 = self._totals.get()
            totals = (
                n0 + n_new,
                min(f0, t_min) if t_min is not None else f0,
                max(l0, t_max) if t_max is not None else l0,
            )
        else:
            totals = (n_new, t_min, t_max)
        self._totals.update(totals)

        for rule, cnt in new_rule_counts.items():
            prev = (
                self._rule_counts.getValue((rule,))[0]
                if self._rule_counts.containsKey((rule,))
                else 0
            )
            self._rule_counts.updateValue((rule,), (prev + cnt,))

        counters = "|".join(
            f"{rule}:{self._rule_counts.getValue((rule,))[0]}"
            for (rule,) in sorted(self._rule_counts.keys())
        )
        yield pd.DataFrame(
            {
                "address": [address],
                "n_events": [totals[0]],
                "first_seen": [totals[1]],
                "last_seen": [totals[2]],
                "counters": [counters],
            }
        )

    def close(self) -> None:
        pass


def address_profiles(
    events: DataFrame,
    *,
    address_col: str = "address",
    ttl_idle_secs: int | None = 3600,
) -> DataFrame:
    """events stream → per-address rolling profile snapshots (one row
    per address per micro-batch it appears in). ``ttl_idle_secs`` ages
    out idle addresses' state lazily (no timers, so availableNow drains
    do not stall waiting for them)."""
    ttl_ms = ttl_idle_secs * 1000 if ttl_idle_secs is not None else None
    return (
        events.select(address_col, "created_at", "rule")
        .groupBy(address_col)
        .transformWithStateInPandas(
            statefulProcessor=AddressProfileProcessor(ttl_ms),
            outputStructType=PROFILE_SCHEMA,
            outputMode="Update",
            timeMode="ProcessingTime",
        )
    )
