"""Custom stateful streaming (SURVEY.md §2.9 T10).

The reference recomputes per-room booking counts in a separate batch job
(processing.scala:84-86). Here the count is maintained incrementally as the
stream runs:

- ``running_counts``: the built-in path — streaming ``groupBy().agg()`` in
  update mode. Spark keeps per-key partial aggregates in the state store;
  each micro-batch emits only changed keys. Right answer for pure
  aggregates at any scale.
- ``running_stats_stateful``: the arbitrary-state path —
  ``applyInPandasWithState`` with an explicit per-key (count, sum) state
  tuple and a processing-time timeout that expires idle keys, so state
  can't grow without bound on a high-cardinality key space. Use this shape
  when the per-key logic is genuinely not an aggregate (sessionization with
  side effects, model state, alert latches).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATS_SCHEMA = "user_id long, n_events long, sum_value double"
STATE_SCHEMA = "n long, s double"


def running_counts(events: DataFrame) -> DataFrame:
    """Built-in incremental aggregate: per-key running (count, sum)."""
    return events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


def _update_stats(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        # timeout invocation: no data. Drop the idle key's state WITHOUT
        # re-arming the timeout or emitting a row — otherwise idle keys
        # would live (and emit phantom updates) forever, unbounded state.
        state.remove()
        return
    (n, s) = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    # idle keys expire after an hour of no traffic — bounded state
    state.setTimeoutDuration(3600 * 1000)
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [round(s, 6)]}
    )


def running_stats_stateful(events: DataFrame) -> DataFrame:
    """Arbitrary-state per-key running stats via ``applyInPandasWithState``.
    Emits the updated (count, sum) for every key seen in the micro-batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_stats,
        outputStructType=STATS_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Spark 4 transformWithState variant of the same per-key running stats:
# the successor API to applyInPandasWithState — named state variables on a
# handle (value/list/map state, optional TTL, timers) instead of one state
# tuple. Requires the RocksDB state store provider.
# ---------------------------------------------------------------------------

try:  # Spark >= 4.0
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RunningStatsProcessor(StatefulProcessor):
        """Per-key (count, sum) with a named ValueState and a TTL that
        expires idle keys — the declarative replacement for the manual
        timeout branch in :func:`_update_stats`. State layout, emissions,
        and TTL semantics match the applyInPandasWithState twin, which the
        agreement test asserts batch by batch."""

        STATE_TTL_MS = 3600 * 1000

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._stats = handle.getValueState(
                "stats", STATE_SCHEMA, ttlDurationMs=self.STATE_TTL_MS
            )

        def handleInputRows(self, key, rows, timer_values):
            n, s = self._stats.get() if self._stats.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                s += float(pdf["value"].sum())
            self._stats.update((n, s))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "sum_value": [round(s, 6)]}
            )

        def close(self) -> None:
            pass

    def running_stats_tws(events: DataFrame) -> DataFrame:
        """T10 on the Spark 4 ``transformWithStateInPandas`` API. Needs
        ``spark.sql.streaming.stateStore.providerClass`` set to the RocksDB
        provider (transformWithState's storage backend)."""
        return events.groupBy("user_id").transformWithStateInPandas(
            RunningStatsProcessor(),
            outputStructType=STATS_SCHEMA,
            outputMode="update",
            timeMode="none",
        )

except ImportError:  # pragma: no cover - pre-4.0 fallback documented
    RunningStatsProcessor = None

    def running_stats_tws(events: DataFrame) -> DataFrame:
        raise NotImplementedError(
            "transformWithStateInPandas requires Spark >= 4.0; use "
            "running_stats_stateful (applyInPandasWithState) instead"
        )


# ---------------------------------------------------------------------------
# Stateful sessionizer (T10): arbitrary per-key session state with
# event-time timeout — the streaming complement of the batch gaps-and-islands
# sessionize (operators/sessions.py) and the built-in session_window (T9).
# Use this shape when a closing session must trigger custom logic the
# built-in window can't express.
# ---------------------------------------------------------------------------

SESSION_OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, sum_value double"
)
SESSION_STATE_SCHEMA = "start_ms long, last_ms long, n long, s double"
SESSION_GAP_MS = 30 * 60 * 1000


def _session_row(key, start_ms, last_ms, n, s):
    return pd.DataFrame(
        {
            "user_id": [key[0]],
            "session_start": [pd.Timestamp(start_ms, unit="ms")],
            "session_end": [pd.Timestamp(last_ms, unit="ms")],
            "n_events": [n],
            "sum_value": [round(s, 6)],
        }
    )


def _update_session(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        # watermark passed last_event + gap: the open session is final
        (start_ms, last_ms, n, s) = state.get
        state.remove()
        yield _session_row(key, start_ms, last_ms, n, s)
        return

    rows = []
    for pdf in pdfs:
        # normalize to ns first — Arrow may deliver datetime64 in us or ns
        # depending on pandas/Arrow versions, and int64 ticks follow the unit
        ms = (
            pdf["ts"].astype("datetime64[ns]").astype("int64") // 1_000_000
        ).tolist()
        rows.extend(zip(ms, pdf["value"].tolist()))
    rows.sort()

    cur = list(state.get) if state.exists else None
    out = []
    for ts_ms, v in rows:
        if cur is None:
            cur = [ts_ms, ts_ms, 0, 0.0]
        elif ts_ms - cur[1] > SESSION_GAP_MS:
            out.append(tuple(cur))
            cur = [ts_ms, ts_ms, 0, 0.0]
        cur[1] = max(cur[1], ts_ms)
        cur[2] += 1
        cur[3] += float(v)
    state.update(tuple(cur))
    # the open session finalizes when the WATERMARK (not wall clock) passes
    # its gap horizon — late events within the watermark still extend it
    state.setTimeoutTimestamp(cur[1] + SESSION_GAP_MS)
    for start_ms, last_ms, n, s in out:
        yield _session_row(key, start_ms, last_ms, n, s)


def sessionize_stateful(events: DataFrame, watermark: str = "15 minutes") -> DataFrame:
    """Streaming sessionization with explicit state: sessions closed by an
    in-batch gap emit immediately; the open session emits when the event-time
    watermark passes its gap horizon. State per key is one 4-tuple — bounded
    regardless of traffic."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_session,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming funnel: the stateful twin of operators/behavior.funnel_conversion
# ---------------------------------------------------------------------------

FUNNEL_OUT_SCHEMA = "user_id long, depth int"
# first-occurrence epoch-ms per stage; -1 = stage not seen yet
FUNNEL_STATE_SCHEMA = "t0 long, t1 long, t2 long, t3 long"
_FUNNEL_STAGES = ("signup", "click", "view", "purchase")


def funnel_depth(ts: tuple[int, int, int, int]) -> int:
    """Depth under min-ts ordering — the same semantics as the batch
    funnel_conversion: stage k is reached iff every earlier stage's FIRST
    occurrence strictly precedes this stage's first occurrence."""
    t0, t1, t2, t3 = ts
    if t0 < 0:
        return 0
    if t1 < 0 or t1 <= t0:
        return 1
    if t2 < 0 or t2 <= t1:
        return 2
    if t3 < 0 or t3 <= t2:
        return 3
    return 4


def _update_funnel(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    ts = list(state.get) if state.exists else [-1, -1, -1, -1]
    for pdf in pdfs:
        ms = (pdf["ts"].astype("datetime64[ms]").astype("int64")).tolist()
        for stage, m in zip(pdf["event_type"].tolist(), ms):
            try:
                i = _FUNNEL_STAGES.index(stage)
            except ValueError:
                continue  # non-funnel event types pass through
            if ts[i] < 0 or m < ts[i]:
                ts[i] = m
    state.update(tuple(ts))
    state.setTimeoutDuration(24 * 3600 * 1000)  # idle users expire in a day
    yield pd.DataFrame(
        {"user_id": [key[0]], "depth": [funnel_depth(tuple(ts))]}
    )


def funnel_stateful(events: DataFrame) -> DataFrame:
    """Per-user live funnel depth via ``applyInPandasWithState``: state is
    ONE 4-long tuple per user (first-occurrence time of each stage), so
    state size is user-count-bounded regardless of traffic; each
    micro-batch emits the updated depth for users it touched (update
    mode). Late/out-of-order events are handled by taking the MIN per
    stage — arrival order cannot change the converged answer, matching
    the batch funnel_conversion exactly (agreement-tested)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_funnel,
        outputStructType=FUNNEL_OUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Threshold alert latch with hysteresis (T10 family)
# ---------------------------------------------------------------------------

ALERT_HIGH = 8.0   # value >= HIGH arms an alert (once, until reset)
ALERT_LOW = 4.0    # value <= LOW resets the latch

ALERT_OUTPUT_SCHEMA = (
    "user_id long, event_id long, alert_value double, n_alerts long"
)
ALERT_STATE_SCHEMA = "latched boolean, n_alerts long"


def _update_latch(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    latched, n_alerts = state.get if state.exists else (False, 0)
    out = []
    for pdf in pdfs:
        # ordering within the batch: event time then id — deterministic
        for row in pdf.sort_values(["ts", "event_id"]).itertuples():
            v = float(row.value)
            if not latched and v >= ALERT_HIGH:
                latched = True
                n_alerts += 1
                out.append((key[0], int(row.event_id), v, n_alerts))
            elif latched and v <= ALERT_LOW:
                latched = False
    state.update((latched, int(n_alerts)))
    state.setTimeoutDuration(3600 * 1000)
    if out:
        yield pd.DataFrame(
            out, columns=["user_id", "event_id", "alert_value", "n_alerts"]
        )


def alert_latch_stateful(events: DataFrame) -> DataFrame:
    """Per-key threshold alarm with HYSTERESIS — the alert-latch shape the
    module docstring promises: one alert row the moment a key's value
    crosses ALERT_HIGH, then silence (however high values go) until the
    value falls back through ALERT_LOW re-arming the latch. Plain
    streaming filters can't express this (whether a row alerts depends on
    the key's history); the state is two scalars per key, expired after
    an idle hour — bounded at any key cardinality. Emits only alert rows
    (update mode): output traffic scales with ALERTS, not events."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_latch,
        outputStructType=ALERT_OUTPUT_SCHEMA,
        stateStructType=ALERT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming CUSUM level-shift alarm (T10 family): the sequential-detection
# twin of the retrospective batch scan operators/timeseries.cusum_changepoint
# ---------------------------------------------------------------------------

CUSUM_TARGET = 5.0     # in-control mean mu_0
CUSUM_SLACK = 0.5      # k: half the smallest shift worth detecting
CUSUM_THRESHOLD = 8.0  # h: alarm when either one-sided statistic exceeds it

CUSUM_OUT_SCHEMA = (
    "user_id long, event_id long, direction string, statistic double, "
    "n_events long, n_alarms long"
)
CUSUM_STATE_SCHEMA = "s_pos double, s_neg double, n_events long, n_alarms long"


def cusum_scan(rows, state=(0.0, 0.0, 0, 0)):
    """Tabular two-sided CUSUM over ``rows`` (iterable of (event_id, value))
    from ``state`` = (s_pos, s_neg, n_events, n_alarms).

    S+ = max(0, S+ + (x - mu - k)) catches upward level shifts,
    S- = max(0, S- + (mu - x - k)) downward; crossing h emits an alarm row
    and RESTARTS both statistics (the standard post-alarm reset, so one
    sustained shift raises one alarm, not one per subsequent point).

    Pure function shared verbatim by the streaming state update, the batch
    twin, and the tests' driver-side replay — the agreement is by
    construction, the tests check the plumbing around it."""
    s_pos, s_neg, n_events, n_alarms = state
    alarms = []
    for eid, v in rows:
        n_events += 1
        s_pos = max(0.0, s_pos + (v - CUSUM_TARGET - CUSUM_SLACK))
        s_neg = max(0.0, s_neg + (CUSUM_TARGET - v - CUSUM_SLACK))
        if s_pos > CUSUM_THRESHOLD or s_neg > CUSUM_THRESHOLD:
            up = s_pos > CUSUM_THRESHOLD
            n_alarms += 1
            alarms.append(
                (
                    int(eid),
                    "up" if up else "down",
                    round(s_pos if up else s_neg, 6),
                    n_events,
                    n_alarms,
                )
            )
            s_pos = s_neg = 0.0
    return alarms, (s_pos, s_neg, n_events, n_alarms)


def _cusum_rows(pdf: pd.DataFrame):
    """(event_id, value) pairs in deterministic event-time order."""
    ordered = pdf.sort_values(["ts", "event_id"])
    return zip(ordered["event_id"].tolist(), ordered["value"].astype(float).tolist())


def _scan_update_fn(kernel, init_state, columns):
    """applyInPandasWithState update function for a pure per-key scan
    kernel ``(rows, state) -> (alarms, state)`` — the state plumbing
    (timeout expiry, cross-batch carry, 24h idle eviction, alarm frame
    assembly) shared by the CUSUM and Holt monitoring twins."""

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        cur = tuple(state.get) if state.exists else init_state
        alarms = []
        for pdf in pdfs:
            batch_alarms, cur = kernel(_cusum_rows(pdf), cur)
            alarms.extend(batch_alarms)
        state.update(cur)
        state.setTimeoutDuration(24 * 3600 * 1000)  # idle keys expire in a day
        if alarms:
            yield pd.DataFrame(
                [(key[0], *a) for a in alarms], columns=columns
            )

    return update


def _scan_batch_fn(kernel, init_state, columns, schema):
    """applyInPandas batch twin for the same kernel: the full per-key
    history in event-time order through one scan — one shuffle on the
    key, used by the streaming-vs-batch agreement tests."""

    def batch(events: DataFrame) -> DataFrame:
        def scan(key, pdf):
            alarms, _ = kernel(_cusum_rows(pdf), init_state)
            return pd.DataFrame(
                [(key[0], *a) for a in alarms], columns=columns
            )

        return events.groupBy("user_id").applyInPandas(scan, schema)

    return batch


_CUSUM_COLS = [
    "user_id", "event_id", "direction", "statistic", "n_events", "n_alarms",
]
_update_cusum = _scan_update_fn(cusum_scan, (0.0, 0.0, 0, 0), _CUSUM_COLS)


def cusum_alarm_stateful(events: DataFrame) -> DataFrame:
    """Per-key streaming CUSUM level-shift alarm via
    ``applyInPandasWithState``: the monitoring counterpart of the batch
    ``cusum_changepoint`` scan (which locates a shift retrospectively;
    this one ALARMS as soon as the running evidence crosses h). The
    pointwise ``alert_latch_stateful`` cannot see a persistent SMALL
    shift — CUSUM accumulates it.

    State per key is four scalars regardless of traffic; idle keys expire
    after a day. Emits only alarm rows (update mode), so output traffic
    scales with ALARMS, not events. Rows are ordered by event time within
    a micro-batch; across micro-batches the scan runs in arrival order —
    the inherent contract of sequential detection (an alarm cannot be
    un-raised by a late arrival)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_cusum,
        outputStructType=CUSUM_OUT_SCHEMA,
        stateStructType=CUSUM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def cusum_alarm_batch(events: DataFrame) -> DataFrame:
    """Batch twin: the SAME ``cusum_scan`` kernel over each key's full
    history in event-time order via ``applyInPandas`` — one shuffle on the
    key, per-key work linear and parallel across keys. Used by the
    agreement test: streaming the same data in event-time-ordered
    micro-batches must emit exactly these rows."""

    def scan(key, pdf):
        alarms, _ = cusum_scan(_cusum_rows(pdf))
        return pd.DataFrame(
            [(key[0], *a) for a in alarms],
            columns=[
                "user_id", "event_id", "direction", "statistic",
                "n_events", "n_alarms",
            ],
        )

    return events.groupBy("user_id").applyInPandas(scan, CUSUM_OUT_SCHEMA)


# ---------------------------------------------------------------------------
# Streaming Holt forecast-drift alarm (T10 family): the sequential twin of
# the retrospective batch smoother operators/timeseries.holt_linear_forecast
# ---------------------------------------------------------------------------

HOLT_DRIFT_ALPHA = 0.5   # level gain (matches the batch smoother)
HOLT_DRIFT_BETA = 0.3    # trend gain
HOLT_DRIFT_THRESHOLD = 6.0  # alarm when |value - one-step forecast| exceeds it

HOLT_OUT_SCHEMA = (
    "user_id long, event_id long, forecast double, value double, "
    "abs_err double, n_events long, n_alarms long"
)
HOLT_STATE_SCHEMA = "l double, b double, n_events long, n_alarms long"


def holt_scan(rows, state=(0.0, 0.0, 0, 0)):
    """Holt level/trend recurrence over ``rows`` (iterable of
    (event_id, value)) from ``state`` = (l, b, n_events, n_alarms).

    Each point is first scored against the one-step forecast l + b; a
    miss beyond HOLT_DRIFT_THRESHOLD emits an alarm row and RE-ANCHORS
    the smoother at the observed value (the CUSUM post-alarm reset: one
    regime break raises one alarm, and the smoother doesn't spend the
    next dozen points slewing toward the new level). In-threshold points
    update the textbook recurrence. The first point only anchors.

    Pure function shared verbatim by the streaming state update, the
    batch twin, and the tests' driver-side replay — where CUSUM detects
    a persistent shift in the MEAN, this detects a break from the
    TREND a drifting series had established."""
    l, b, n_events, n_alarms = state
    alarms = []
    for eid, v in rows:
        n_events += 1
        if n_events == 1:
            l, b = v, 0.0
            continue
        f = l + b
        err = abs(v - f)
        if err > HOLT_DRIFT_THRESHOLD:
            n_alarms += 1
            alarms.append(
                (int(eid), round(f, 6), v, round(err, 6), n_events, n_alarms)
            )
            l, b = v, 0.0
        else:
            l_new = HOLT_DRIFT_ALPHA * v + (1.0 - HOLT_DRIFT_ALPHA) * (l + b)
            b = HOLT_DRIFT_BETA * (l_new - l) + (1.0 - HOLT_DRIFT_BETA) * b
            l = l_new
    return alarms, (l, b, n_events, n_alarms)


_HOLT_COLS = [
    "user_id", "event_id", "forecast", "value",
    "abs_err", "n_events", "n_alarms",
]
_update_holt = _scan_update_fn(holt_scan, (0.0, 0.0, 0, 0), _HOLT_COLS)


def holt_drift_stateful(events: DataFrame) -> DataFrame:
    """Per-key streaming forecast-drift alarm via
    ``applyInPandasWithState``: the monitoring counterpart of the batch
    ``holt_linear_forecast`` backtest. CUSUM (above) flags a sustained
    level shift against a FIXED target; this flags a break from each
    key's own smoothed trajectory — a series climbing 2/event that
    suddenly flatlines alarms here long before a fixed-target CUSUM
    notices.

    State per key is four scalars regardless of traffic; idle keys
    expire after a day. Emits only alarm rows (update mode). Rows are
    ordered by event time within a micro-batch; across micro-batches the
    recurrence runs in arrival order — the sequential-detection
    contract shared with the CUSUM twin."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_holt,
        outputStructType=HOLT_OUT_SCHEMA,
        stateStructType=HOLT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def holt_drift_batch(events: DataFrame) -> DataFrame:
    """Batch twin: the SAME ``holt_scan`` kernel over each key's full
    history in event-time order via ``applyInPandas`` — one shuffle on
    the key. Used by the agreement test."""
    return _scan_batch_fn(
        holt_scan, (0.0, 0.0, 0, 0), _HOLT_COLS, HOLT_OUT_SCHEMA
    )(events)
