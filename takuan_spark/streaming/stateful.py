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

import bisect
from collections.abc import Iterable, Iterator
from typing import Any

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType,
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

# buffer-and-seal variant: the sealed alert state plus pending event
# times (little-endian int64 epoch seconds packed into one binary
# column — same encoding trade as _GAP_BUF_STATE_SCHEMA)
_ALERT_BUF_STATE_SCHEMA = StructType(
    [
        StructField("recent", StringType(), True),
        StructField("last_alert", LongType(), True),
        StructField("buf", BinaryType(), True),
    ]
)


def _epoch_secs(col: pd.Series) -> list[int]:
    """Vectorized epoch-second extraction of a datetime column — plain
    Python ints out. Replaces the per-element
    ``int(Timestamp.timestamp())`` path, which built one Python
    Timestamp object per event (measured 91 us vs 8 us per ~3-row
    group call; the per-group Python invocation is the dominant cost
    of every applyInPandasWithState micro-batch, and at scale the gap
    grows linearly with events per key). The ``datetime64[s]`` cast
    floors exactly like ``int(timestamp())`` does for the post-1970
    event times these feeds carry."""
    if getattr(col.dtype, "tz", None) is not None:
        # tz-aware input (engine delivers session-tz-naive, but the
        # unit-testable surface accepts either): normalize to UTC-naive
        # so the epoch arithmetic matches Timestamp.timestamp().
        col = col.dt.tz_convert("UTC").dt.tz_localize(None)
    return col.to_numpy(dtype="datetime64[s]").astype(np.int64).tolist()


def _alerts_frame(alerts: list[tuple]) -> pd.DataFrame:
    """Columnar alert-frame construction from (address, n, start_sec,
    end_sec) tuples — one vectorized datetime conversion instead of
    two Python Timestamp objects per alert plus a list-of-dicts
    DataFrame build per group call."""
    addr, n, ws, we = zip(*alerts)
    return pd.DataFrame(
        {
            "address": list(addr),
            "n_events": np.asarray(n, dtype=np.int32),
            "window_start": np.asarray(ws, dtype="datetime64[s]").astype(
                "datetime64[ns]"
            ),
            "window_end": np.asarray(we, dtype="datetime64[s]").astype(
                "datetime64[ns]"
            ),
        }
    )


def _fold_alerts(
    address: str,
    recent: list[int],
    last_alert: int | None,
    sorted_times: list[int],
    *,
    threshold: int,
    window_secs: int,
    cooldown_secs: int,
    max_state_events: int | None,
) -> tuple[list[int], int | None, list[tuple]]:
    """Fold a SORTED run of event epoch-seconds into the detector's
    (recent, last_alert) state, returning the alerts fired as
    (address, n_events, window_start_sec, window_end_sec) tuples
    (:func:`_alerts_frame` renders them) — the sequential
    order-dependent step shared by the ordered fold
    (:func:`make_update_fn`, batch-sorted runs under the ordered-
    arrival contract) and the buffer-and-seal fold
    (:func:`make_alert_buffer_update_fn`, watermark-sealed runs)."""
    alerts: list[tuple] = []
    for t in sorted_times:
        recent.append(t)
        recent = [x for x in recent if x > t - window_secs]
        if max_state_events is not None and len(recent) > max_state_events:
            # keep the MOST RECENT K: the threshold check below only
            # needs K >= threshold entries, so capping cannot
            # suppress an alert — it saturates the census.
            recent = recent[-max_state_events:]
        armed = last_alert is None or t - last_alert >= cooldown_secs
        if len(recent) >= threshold and armed:
            alerts.append((address, len(recent), recent[0], t))
            last_alert = t
    return recent, last_alert, alerts


def make_update_fn(
    *,
    time_col: str,
    threshold: int,
    window_secs: int,
    cooldown_secs: int,
    idle_timeout_secs: int | None,
    max_state_events: int | None = None,
):
    """The per-group state-update function, exposed module-level so the
    eviction/carry semantics are unit-testable with a fake GroupState
    (no streaming query needed).

    ``max_state_events`` hard-caps the per-address timestamp list: a hot
    key at very high rate otherwise grows state linearly within
    ``window_secs`` (documented bound: rate x window). With a cap of
    K >= threshold the alert predicate is unaffected — fire needs only
    ``threshold`` in-window events and the K MOST RECENT are kept — but
    ``n_events`` saturates at K and ``window_start`` reflects the
    oldest RETAINED event, the standard truncation a bounded detector
    accepts to survive adversarial floods. ``None`` keeps the exact
    window census."""

    def update(
        key: tuple[str],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (address,) = key
        if state.hasTimedOut:
            # Idle address: past window+cooldown with no new events the
            # carried state cannot influence any future alert — evict,
            # so the store is bounded by *active* addresses, not all
            # addresses ever seen.
            state.remove()
            return
        if state.exists:
            recent_csv, last_alert = state.get
            recent = [int(x) for x in recent_csv.split(",") if x]
        else:
            recent, last_alert = [], None

        times: list[int] = []
        for pdf in pdfs:
            times.extend(_epoch_secs(pdf[time_col]))

        recent, last_alert, alerts = _fold_alerts(
            address,
            recent,
            last_alert,
            sorted(times),
            threshold=threshold,
            window_secs=window_secs,
            cooldown_secs=cooldown_secs,
            max_state_events=max_state_events,
        )

        # Keep EVERY timestamp still inside the sliding window of the
        # latest event (the loop's window filter already bounds the list)
        # unless max_state_events caps it: an uncapped census is exact
        # but grows with the in-window event rate; the cap trades census
        # precision above K for a hard per-key state bound under floods.
        state.update((",".join(str(x) for x in recent), last_alert))
        if idle_timeout_secs is not None:
            # re-arm the idle-eviction clock
            state.setTimeoutDuration(idle_timeout_secs * 1000)
        if alerts:
            yield _alerts_frame(alerts)

    return update


def make_alert_buffer_update_fn(
    *,
    threshold: int,
    window_secs: int,
    cooldown_secs: int,
    flush_at_ms: int,
    max_state_events: int | None = None,
):
    """Per-group update function for the UNORDERED-arrival variant of
    the detector (:func:`brute_force_alerts_unordered`) — module-level
    so the seal/flush semantics are unit-testable with a fake
    GroupState.

    The detector's fold is doubly order-dependent: the sliding-window
    census tracks the times within ``window_secs`` of the LATEST seen
    event, and the cooldown re-arm compares each event against the
    last alert — both wrong if a batch arrives behind one already
    folded. Same cure as :func:`make_gap_buffer_update_fn`: buffer
    event epoch-seconds in state and let the WATERMARK decide what is
    safe to fold. Each call

    1. appends the batch's times to the pending buffer,
    2. sorts the buffer and SEALS the prefix strictly below the
       current watermark through :func:`_fold_alerts` — the exact
       fold the ordered path runs, so sealed-prefix-at-a-time equals
       all-at-once by construction — emitting that prefix's alerts
       in THIS batch (append mode allows emission any time; alerts
       trail the watermark rather than the data clock, the price of
       tolerated disorder),
    3. keeps the unsealed suffix buffered (packed int64 seconds).

    Final flush via event-time timeout at ``flush_at_ms`` (the gap
    rows' sentinel protocol): the timeout sweep seals whatever remains
    buffered, emits its alerts, and removes the state. State per key =
    the in-window census + 8 bytes per PENDING event, bounded by
    watermark delay x per-key rate — the watermark delay IS the state
    budget, as in every buffer-and-seal operator here."""

    def update(
        key: tuple[str],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (address,) = key

        def _load() -> tuple[list[int], int | None, list[int]]:
            if state.exists:
                recent_csv, last_alert, buf = state.get
                recent = [int(x) for x in recent_csv.split(",") if x]
                return recent, last_alert, _unpack_times(buf)
            return [], None, []

        if state.hasTimedOut:
            recent, last_alert, pending = _load()
            _, _, alerts = _fold_alerts(
                address,
                recent,
                last_alert,
                sorted(pending),
                threshold=threshold,
                window_secs=window_secs,
                cooldown_secs=cooldown_secs,
                max_state_events=max_state_events,
            )
            state.remove()
            if alerts:
                yield _alerts_frame(alerts)
            return

        recent, last_alert, pending = _load()
        for pdf in pdfs:
            pending.extend(_epoch_secs(pdf["ts"]))
        pending.sort()
        # seal strictly below floor(watermark): the census works on
        # TRUNCATED seconds, and a future arrival at true time >= wm
        # can truncate down to floor(wm) — so floor(wm) itself must
        # stay buffered or a late same-second peer would be folded
        # out of order (for whole-second feeds this is exactly
        # "strictly below the watermark")
        wm_sec = int(state.getCurrentWatermarkMs() // 1000)
        cut = bisect.bisect_left(pending, wm_sec)
        recent, last_alert, alerts = _fold_alerts(
            address,
            recent,
            last_alert,
            pending[:cut],
            threshold=threshold,
            window_secs=window_secs,
            cooldown_secs=cooldown_secs,
            max_state_events=max_state_events,
        )
        state.update(
            (
                ",".join(str(x) for x in recent),
                last_alert,
                _pack_times(pending[cut:]),
            )
        )
        state.setTimeoutTimestamp(
            max(flush_at_ms, state.getCurrentWatermarkMs() + 1)
        )
        if alerts:
            yield _alerts_frame(alerts)

    return update


def gap_output_schema(key_col: str) -> StructType:
    """Output schema of :func:`interarrival_stats` for a bigint key."""
    return StructType(
        [
            StructField(key_col, LongType(), False),
            StructField("n_events", LongType(), False),
            StructField("first_us", LongType(), False),
            StructField("last_us", LongType(), False),
            StructField("max_gap_us", LongType(), True),
        ]
    )


# state: running ordered fold over one key's event times (micros)
_GAP_STATE_SCHEMA = StructType(
    [
        StructField("first_us", LongType(), True),
        StructField("last_us", LongType(), True),
        StructField("max_gap_us", LongType(), True),
        StructField("n", LongType(), True),
    ]
)

# buffer-and-sort variant: the sealed fold plus the pending event times
# (little-endian int64 micros, packed into one binary column — compact
# in the state store and immune to Arrow list-column round-trip quirks)
_GAP_BUF_STATE_SCHEMA = StructType(
    [
        StructField("first_us", LongType(), True),
        StructField("last_us", LongType(), True),
        StructField("max_gap_us", LongType(), True),
        StructField("n", LongType(), True),
        StructField("buf", BinaryType(), True),
    ]
)


def _fold_gap(
    first_us: int | None,
    last_us: int | None,
    max_gap_us: int | None,
    n: int,
    sorted_times,
) -> tuple[int | None, int | None, int | None, int]:
    """Fold a SORTED run of event times (micros) into the running
    (first, last, max_gap, n) interarrival state — the order-dependent
    step shared by both arrival protocols. The fold over a sorted run
    reduces to max-of-consecutive-differences (plus the carry gap from
    the previous run's last time), so it vectorizes: one ``np.diff``
    over the run instead of a Python loop per event — the loop's cost
    grows with events per key, which at 100 TB/day is the hot axis.
    Accepts a list or an int64 ndarray."""
    m = len(sorted_times)
    if m == 0:
        return first_us, last_us, max_gap_us, n
    arr = np.asarray(sorted_times, dtype=np.int64)
    best = int(np.diff(arr).max()) if m > 1 else None
    if last_us is not None:
        carry = int(arr[0]) - last_us
        if best is None or carry > best:
            best = carry
    if best is not None and (max_gap_us is None or best > max_gap_us):
        max_gap_us = best
    if first_us is None:
        first_us = int(arr[0])
    return first_us, int(arr[-1]), max_gap_us, n + m


def _pack_times(times: list[int]) -> bytes:
    import numpy as np

    return np.asarray(times, dtype="<i8").tobytes()


def _unpack_times(buf) -> list[int]:
    import numpy as np

    if not buf:
        return []
    return np.frombuffer(bytes(buf), dtype="<i8").tolist()


def make_gap_update_fn(key_col: str, flush_at_ms: int):
    """Per-group update function for :func:`interarrival_stats`,
    module-level so the carry/flush semantics are unit-testable with a
    fake GroupState (no streaming query needed).

    Each call folds the batch's event times (int64 micros, pre-computed
    in the ``ts_us`` column so no pandas datetime-unit ambiguity can
    leak in) into (first, last, max_gap, n) state, sorted WITHIN the
    batch; correctness across batches relies on the arrival protocol
    delivering batches in event-time order, which is exactly what the
    caller's time-quartile epoch files guarantee. Emission happens only
    on event-time timeout — the append-mode-compatible pattern — armed
    at ``flush_at_ms`` (past the whole corpus, so no key flushes while
    it may still receive events) and clamped above the current
    watermark because Spark rejects a timeout at or behind it (the
    sentinel key's own re-arm in the final batch would otherwise
    throw)."""

    def update(
        key: tuple[int],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (uid,) = key
        if state.hasTimedOut:
            first_us, last_us, max_gap_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        key_col: uid,
                        "n_events": n,
                        "first_us": first_us,
                        "last_us": last_us,
                        "max_gap_us": max_gap_us,
                    }
                ]
            )
            return
        chunks = [pdf["ts_us"].to_numpy(np.int64) for pdf in pdfs]
        times = np.sort(
            chunks[0]
            if len(chunks) == 1
            else np.concatenate(chunks or [np.empty(0, np.int64)])
        )
        if state.exists:
            first_us, last_us, max_gap_us, n = state.get
        else:
            first_us = last_us = max_gap_us = None
            n = 0
        first_us, last_us, max_gap_us, n = _fold_gap(
            first_us, last_us, max_gap_us, n, times
        )
        state.update((first_us, last_us, max_gap_us, n))
        state.setTimeoutTimestamp(
            max(flush_at_ms, state.getCurrentWatermarkMs() + 1)
        )

    return update


def make_gap_buffer_update_fn(key_col: str, flush_at_ms: int):
    """Per-group update function for the UNORDERED-arrival variant of
    :func:`interarrival_stats` — module-level so the seal/flush
    semantics are unit-testable with a fake GroupState.

    Where :func:`make_gap_update_fn` folds each batch immediately (and
    is therefore only correct when batches arrive in event-time order),
    this one buffers event times and lets the WATERMARK decide what is
    safe to fold: a time strictly below the current watermark can never
    be preceded by a future arrival, because the engine drops late rows
    below the watermark before they reach the state operator (the same
    filter ``numRowsDroppedByWatermark`` counts). Each call therefore

    1. appends the batch's times to the pending buffer,
    2. sorts the buffer and SEALS the prefix ``t < watermark_us`` into
       the running (first, last, max_gap, n) fold,
    3. keeps the unsealed suffix buffered (packed int64 micros).

    State per key is the four fold int64s plus 8 bytes per *pending*
    event — bounded by the watermark delay times the key's event rate,
    the canonical state bound of every watermarked streaming operator
    (a larger tolerated disorder costs proportionally more state; the
    ordered variant is the zero-buffer special case). Emission happens
    only on event-time timeout at ``flush_at_ms``, sealing whatever
    remains buffered — callers guarantee the flush point is past any
    time the key may still receive, exactly as in the ordered variant.
    """

    def update(
        key: tuple[int],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (uid,) = key
        if state.hasTimedOut:
            first_us, last_us, max_gap_us, n, buf = state.get
            first_us, last_us, max_gap_us, n = _fold_gap(
                first_us, last_us, max_gap_us, n,
                sorted(_unpack_times(buf)),
            )
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        key_col: uid,
                        "n_events": n,
                        "first_us": first_us,
                        "last_us": last_us,
                        "max_gap_us": max_gap_us,
                    }
                ]
            )
            return
        parts = [pdf["ts_us"].to_numpy(np.int64) for pdf in pdfs]
        if state.exists:
            first_us, last_us, max_gap_us, n, buf = state.get
            if buf:
                parts.append(np.frombuffer(bytes(buf), dtype="<i8"))
        else:
            first_us = last_us = max_gap_us = None
            n = 0
        pending = np.sort(
            parts[0]
            if len(parts) == 1
            else np.concatenate(parts or [np.empty(0, np.int64)])
        )
        # seal strictly below the watermark; a tie stays buffered (the
        # engine's late filter makes no promise about the boundary row)
        wm_us = state.getCurrentWatermarkMs() * 1000
        cut = int(np.searchsorted(pending, wm_us, side="left"))
        first_us, last_us, max_gap_us, n = _fold_gap(
            first_us, last_us, max_gap_us, n, pending[:cut]
        )
        state.update(
            (first_us, last_us, max_gap_us, n, _pack_times(pending[cut:]))
        )
        state.setTimeoutTimestamp(
            max(flush_at_ms, state.getCurrentWatermarkMs() + 1)
        )

    return update


def interarrival_stats(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    time_col: str = "ts",
    watermark: str = "1 hour",
    flush_at_ms: int,
    assume_ordered_arrival: bool = True,
) -> DataFrame:
    """Per-key ordered interarrival fold under the real streaming engine:
    n_events, first/last event time (micros) and the MAX gap between
    consecutive events — an ORDER-DEPENDENT fold no built-in streaming
    aggregate expresses (max-gap needs the previous event time, i.e.
    sequential state, not a commutative monoid over rows), which is the
    class ``applyInPandasWithState`` exists for.

    In the default ordered mode, state per key is four int64s
    regardless of event count — at 100 TB/day the store is O(active
    keys), partitioned by the grouping key across executors like any
    shuffle, with no driver state (the unordered mode below adds 8
    bytes per PENDING event, bounded by watermark delay x per-key
    rate). Results
    flush via EventTimeTimeout once the watermark passes ``flush_at_ms``
    (epoch millis; callers pick a point past the last real event and
    advance the watermark there with sentinel rows under a reserved
    key). A live deployment would instead re-arm a rolling idle timeout
    per key, as :func:`brute_force_alerts` does.

    ``assume_ordered_arrival`` picks the arrival contract. True (the
    default): batches reach each key in event-time order and the fold
    is immediate — zero buffer, four int64s per key — the right mode
    behind a replayed log or time-partitioned epoch files. False: the
    source may deliver batches in ANY order within the watermark
    tolerance; event times are buffered in state and sealed into the
    fold only once the watermark passes them (see
    :func:`make_gap_buffer_update_fn`), trading state size — 8 bytes
    per pending event, bounded by watermark delay x per-key rate — for
    order-independence. Same output, same flush protocol."""
    if assume_ordered_arrival:
        update = make_gap_update_fn(key_col, flush_at_ms)
        state_schema = _GAP_STATE_SCHEMA
    else:
        update = make_gap_buffer_update_fn(key_col, flush_at_ms)
        state_schema = _GAP_BUF_STATE_SCHEMA
    from pyspark.sql import functions as F

    return (
        events.withWatermark(time_col, watermark)
        .withColumn("ts_us", F.unix_micros(time_col))
        .select(key_col, time_col, "ts_us")
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=gap_output_schema(key_col),
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def brute_force_alerts(
    events: DataFrame,
    *,
    address_col: str = "address",
    time_col: str = "created_at",
    threshold: int = 5,
    window_secs: int = 60,
    cooldown_secs: int = 300,
    idle_timeout_secs: int | str | None = "auto",
    max_state_events: int | None = None,
) -> DataFrame:
    """events stream → alert stream via per-address sliding-window state.

    Works on both a streaming DataFrame (real detector) and, because
    ``applyInPandasWithState`` requires a stream, tests drive it with
    ``availableNow`` over file chunks.

    ``idle_timeout_secs`` bounds the state store: an address silent for
    that long is evicted (its state can no longer affect any alert once
    past window+cooldown — the ``"auto"`` default). Pass ``None`` for
    drain-and-stop runs (``availableNow``): a processing-time timeout
    makes the drain trigger wait out pending timers before terminating,
    which turns a seconds-long catch-up run into minutes.

    ``max_state_events`` (>= threshold) hard-caps per-address state for
    deployments fronting adversarial floods — see
    :func:`make_update_fn` for the exact saturation semantics.
    """
    if idle_timeout_secs == "auto":
        idle_timeout_secs = window_secs + cooldown_secs
    if max_state_events is not None and max_state_events < threshold:
        raise ValueError(
            f"max_state_events ({max_state_events}) must be >= threshold "
            f"({threshold}): a smaller cap could suppress alerts"
        )
    update = make_update_fn(
        time_col=time_col,
        threshold=threshold,
        window_secs=window_secs,
        cooldown_secs=cooldown_secs,
        idle_timeout_secs=idle_timeout_secs,
        max_state_events=max_state_events,
    )
    timeout_conf = (
        GroupStateTimeout.NoTimeout
        if idle_timeout_secs is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return (
        events.select(address_col, time_col)
        .groupBy(address_col)
        .applyInPandasWithState(
            update,
            outputStructType=ALERT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout_conf,
        )
    )


def brute_force_alerts_unordered(
    events: DataFrame,
    *,
    address_col: str = "address",
    time_col: str = "created_at",
    threshold: int = 5,
    window_secs: int = 60,
    cooldown_secs: int = 300,
    watermark: str = "10 minutes",
    flush_at_ms: int,
    max_state_events: int | None = None,
) -> DataFrame:
    """UNORDERED-arrival variant of :func:`brute_force_alerts`: the
    same per-address alert state machine behind a source that may
    deliver micro-batches in ANY order within the watermark tolerance
    (see :func:`make_alert_buffer_update_fn` for the buffer-and-seal
    mechanics and the state-size trade; :func:`brute_force_alerts` is
    the zero-buffer special case for replayed logs / time-partitioned
    epoch feeds, and emits on the data clock where this variant's
    alerts trail the watermark).

    ``flush_at_ms`` arms the final event-time-timeout sweep (sealing
    whatever the in-stream watermark never passed) — callers must
    place it past any time a key may still receive and advance the
    watermark beyond it, the same sentinel protocol as
    :func:`interarrival_stats`. Idle eviction needs no separate timer
    here: every key's timeout IS the flush sweep, after which its
    state is removed."""
    if max_state_events is not None and max_state_events < threshold:
        raise ValueError(
            f"max_state_events ({max_state_events}) must be >= threshold "
            f"({threshold}): a smaller cap could suppress alerts"
        )
    update = make_alert_buffer_update_fn(
        threshold=threshold,
        window_secs=window_secs,
        cooldown_secs=cooldown_secs,
        flush_at_ms=flush_at_ms,
        max_state_events=max_state_events,
    )
    from pyspark.sql import functions as F

    return (
        # rename BEFORE attaching the watermark: the watermark rides
        # the column it was declared on, and a later alias would
        # detach it
        events.select(
            F.col(address_col).alias("address"),
            F.col(time_col).alias("ts"),
        )
        .withWatermark("ts", watermark)
        .groupBy("address")
        .applyInPandasWithState(
            update,
            outputStructType=ALERT_SCHEMA,
            stateStructType=_ALERT_BUF_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def brute_force_alerts_batch(
    events: DataFrame,
    *,
    address_col: str = "address",
    time_col: str = "created_at",
    threshold: int = 5,
    window_secs: int = 60,
) -> DataFrame:
    """Batch analog of :func:`brute_force_alerts` with cooldown
    disabled: one output row per event whose trailing
    ``(t - window_secs, t]`` count at its address reaches ``threshold``
    — exactly the alert set the streaming detector emits with
    ``cooldown_secs=0`` over second-distinct event times (the detector
    tracks whole seconds; same-second ties are peers here but
    sequential there).

    This is the SQL-expressible core of the stateful operator — a
    RANGE-frame window over per-address epoch seconds, so the batch
    form shuffles once on the address key and keeps window state
    bounded by the in-window event rate, mirroring the state-store
    bound of the streaming form. Output columns are epoch seconds
    (bigint) for engine-portable comparison.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    sec = F.timestamp_diff(
        "SECOND",
        epoch,
        F.date_trunc("second", F.col(time_col).cast("timestamp_ntz")),
    )
    base = events.select(
        F.col(address_col).alias("address"), sec.alias("sec")
    )
    win = (
        Window.partitionBy("address")
        .orderBy("sec")
        .rangeBetween(-(window_secs - 1), Window.currentRow)
    )
    return (
        base.select(
            "address",
            F.col("sec").alias("window_end_sec"),
            F.count("*").over(win).alias("n_events"),
            F.min("sec").over(win).alias("window_start_sec"),
        )
        .where(F.col("n_events") >= threshold)
        .select("address", "n_events", "window_start_sec", "window_end_sec")
    )
