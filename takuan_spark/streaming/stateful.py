"""Custom stateful streaming operators (SURVEY.md §2.1 streaming-only;
task north star: ``applyInPandasWithState`` for operators Spark lacks).

The flagship here is the thing the reference *almost* is: a brute-force
attack detector. The reference only counts events per address offline in
its hourly report (core/reporter.go); a real-time detector needs running
per-address state across micro-batches — exactly what
``applyInPandasWithState`` provides: state is partitioned by key
(address), lives in the state store (RocksDB at scale), and is updated
with Arrow-batched pandas groups. No driver-side state, so the operator
scales with executors like any shuffle.

Alert semantics: emit one alert row the moment an address accumulates
``threshold`` events inside a sliding ``window_secs`` window (tracked as
a per-address deque of recent event times); re-arm after ``cooldown_secs``
so a persistent attacker re-alerts at a bounded rate rather than per
event.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

ALERT_SCHEMA = StructType(
    [
        StructField("address", StringType(), False),
        StructField("n_events", IntegerType(), False),
        StructField("window_start", TimestampType(), False),
        StructField("window_end", TimestampType(), False),
    ]
)

# state: recent event epoch-seconds + last alert epoch-second
_STATE_SCHEMA = StructType(
    [
        StructField("recent", StringType(), True),  # csv of epoch seconds
        StructField("last_alert", LongType(), True),
    ]
)


def brute_force_alerts(
    events: DataFrame,
    *,
    address_col: str = "address",
    time_col: str = "created_at",
    threshold: int = 5,
    window_secs: int = 60,
    cooldown_secs: int = 300,
) -> DataFrame:
    """events stream → alert stream via per-address sliding-window state.

    Works on both a streaming DataFrame (real detector) and, because
    ``applyInPandasWithState`` requires a stream, tests drive it with
    ``availableNow`` over file chunks.
    """

    def update(
        key: tuple[str],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (address,) = key
        if state.exists:
            recent_csv, last_alert = state.get
            recent = [int(x) for x in recent_csv.split(",") if x]
        else:
            recent, last_alert = [], None

        times: list[int] = []
        for pdf in pdfs:
            ts = pd.to_datetime(pdf[time_col])
            times.extend(int(t.timestamp()) for t in ts)

        alerts: list[dict[str, Any]] = []
        for t in sorted(times):
            recent.append(t)
            recent = [x for x in recent if x > t - window_secs]
            armed = last_alert is None or t - last_alert >= cooldown_secs
            if len(recent) >= threshold and armed:
                alerts.append(
                    {
                        "address": address,
                        "n_events": len(recent),
                        "window_start": pd.Timestamp(recent[0], unit="s"),
                        "window_end": pd.Timestamp(t, unit="s"),
                    }
                )
                last_alert = t

        state.update((",".join(str(x) for x in recent[-threshold * 4 :]), last_alert))
        if alerts:
            yield pd.DataFrame(alerts)

    return (
        events.select(address_col, time_col)
        .groupBy(address_col)
        .applyInPandasWithState(
            update,
            outputStructType=ALERT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
