"""Custom stateful streaming operators (applyInPandasWithState and the
Spark-4 arbitrary-state API, transformWithStateInPandas).

The reference has no streaming engine (SURVEY.md §2.13) — this is the
Spark-native superset: per-key state maintained across micro-batches with
timeout-based finalization. The running-aggregate shape mirrors ITERATE/
PROCESS (§2.2) lifted onto an unbounded stream: state = the RIGHT record,
each batch folds new rows into it. ``session_close_stream`` adds the
arbitrary-state shape: value state + event-time timers, emitting a session
row only when the watermark proves the session closed.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_totals_stream(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key running (count, sum) across micro-batches.

    State is one (count, sum) pair per key — O(distinct keys), the
    streaming analogue of a partial aggregate that never finalizes. Emits
    the updated running totals for every key seen in each batch.
    """

    out_schema = f"{key_col} long, n_events long, total double"
    state_schema = "n long, s double"

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            n, s = state.get
        else:
            n, s = 0, 0.0
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf[value_col].sum())
        state.update((n, s))
        yield pd.DataFrame({key_col: [key[0]], "n_events": [n], "total": [round(s, 4)]})

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def tws_available() -> bool:
    """Capability probe: is the Spark-4 transformWithStateInPandas path
    usable here? Its state server speaks protobuf to the JVM, so the
    ``protobuf`` Python package is the gating dependency. Probed once per
    process; used by session_close_stream_auto to choose the engine
    LOUDLY (r6 VERDICT ask #9) instead of silently degrading."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def session_close_stream_auto(
    events: DataFrame,
    gap_seconds: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    workunit=None,
):
    """Emit-on-close sessionize on the best available stateful engine:
    transformWithStateInPandas (value state + event-time timers) when the
    protobuf state server can run, else the applyInPandasWithState
    GroupState fallback — SAME semantics, announced via warnings and, when
    a Workunit facade is passed, recorded in its message log so the
    degradation is visible in the job's postmortem."""
    import warnings

    if tws_available():
        if workunit is not None:
            workunit.log.information(
                "stateful engine: transformWithStateInPandas"
            )
        return session_close_stream(
            events, gap_seconds, key_col, ts_col, value_col
        )
    msg = (
        "transformWithStateInPandas unavailable (python 'protobuf' package "
        "missing): falling back to the applyInPandasWithState GroupState "
        "engine — identical session semantics, no state-server features"
    )
    warnings.warn(msg, RuntimeWarning, stacklevel=2)
    if workunit is not None:
        workunit.log.warning(msg)
    return session_close_stream_gs(
        events, gap_seconds, key_col, ts_col, value_col
    )


def session_close_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Streaming sessionize that emits a session row ONLY when the session
    CLOSES — the arbitrary-state shape (Spark 4 transformWithStateInPandas:
    value state + event-time timers).

    NOTE: the transformWithState protocol needs the ``protobuf`` Python
    package (its state server speaks protobuf to the JVM); in environments
    without it, use ``session_close_stream_gs`` — identical semantics on
    the applyInPandasWithState API, no protobuf dependency. Both share the
    same fold; the parity test drives whichever the environment supports.

    Per key, state holds the open session (start, end, n, sum). Each batch
    folds its rows in event-time order: a gap > ``gap_seconds`` closes the
    current session (emitted immediately — its closure is proven by data),
    otherwise the session extends. The still-open tail session is parked in
    state with an event-time timer at end+gap; when the WATERMARK passes
    that point (no more in-gap data can arrive), the timer fires and the
    session is emitted closed. Stale timers are deleted on every extension
    so an old expiry can't close a session that has since grown.

    Batch parity: equals gap-based sessionize over the same data for every
    session whose close the final watermark reaches
    (tests/test_streaming.py drives both paths).
    """
    from pyspark.sql.streaming.stateful_processor import (
        ExpiredTimerInfo,
        StatefulProcessor,
        StatefulProcessorHandle,
        TimerValues,
    )

    gap_ms = gap_seconds * 1000
    out_schema = (
        f"{key_col} long, session_start timestamp, session_end timestamp, "
        "n_events long, total double"
    )
    out_cols = [key_col, "session_start", "session_end", "n_events", "total"]

    def session_df(key, start_ms, end_ms, n, s):
        return pd.DataFrame(
            {
                key_col: [key],
                "session_start": [pd.Timestamp(start_ms, unit="ms")],
                "session_end": [pd.Timestamp(end_ms, unit="ms")],
                "n_events": [n],
                "total": [round(s, 4)],
            },
            columns=out_cols,
        )

    class SessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._state = handle.getValueState(
                "open_session", "start long, end long, n long, s double"
            )

        def handleInputRows(self, key, rows, timerValues: TimerValues):
            pdfs = [pdf for pdf in rows if len(pdf)]
            if not pdfs:
                return
            batch = pd.concat(pdfs, ignore_index=True)
            # ms since epoch regardless of the Arrow batch's ns/us unit
            ts_ms = (
                batch[ts_col].astype("datetime64[ms]").astype("int64").to_numpy()
            )
            vals = batch[value_col].to_numpy()
            order = ts_ms.argsort(kind="stable")

            cur = self._state.get() if self._state.exists() else None
            closed, cur = _fold_sessions(
                cur, [(int(ts_ms[i]), float(vals[i])) for i in order], gap_ms
            )
            for sess in closed:
                yield session_df(key[0], *sess)

            # Park the open tail; re-arm the close timer at end+gap,
            # dropping any stale timer from a previous batch.
            self._state.update(cur)
            for old in self._handle.listTimers():
                self._handle.deleteTimer(old)
            self._handle.registerTimer(cur[1] + gap_ms)

        def handleExpiredTimer(
            self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
        ):
            if not self._state.exists():
                return
            cur = self._state.get()
            # Deletion discipline means the only live timer is end+gap for
            # the CURRENT open session; the watermark has passed it, so no
            # in-gap event can still arrive: the session is closed.
            if expiredTimerInfo.getExpiryTimeInMs() >= cur[1] + gap_ms:
                self._state.clear()
                yield session_df(key[0], *cur)

        def close(self) -> None:
            pass

    return (
        events.withWatermark(ts_col, f"{gap_seconds} seconds")
        .groupBy(key_col)
        .transformWithStateInPandas(
            SessionProcessor(),
            outputStructType=out_schema,
            outputMode="append",
            timeMode="EventTime",
        )
    )


def _fold_sessions(cur, ts_ms_sorted_with_vals, gap_ms):
    """Shared gap fold: returns (closed_sessions, open_tail). A session is
    (start_ms, end_ms, n, sum)."""
    closed = []
    for t, v in ts_ms_sorted_with_vals:
        if cur is None:
            cur = (t, t, 1, v)
        elif t - cur[1] > gap_ms:
            closed.append(cur)
            cur = (t, t, 1, v)
        else:
            cur = (cur[0], max(cur[1], t), cur[2] + 1, cur[3] + v)
    return closed, cur


def session_close_stream_gs(
    events: DataFrame,
    gap_seconds: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """``session_close_stream`` semantics on the applyInPandasWithState API
    (GroupState + EventTimeTimeout) — no protobuf state server needed, so
    it runs in minimal environments. Per key: fold the batch's rows in
    event-time order, emit sessions closed by an in-stream gap, park the
    open tail in state with ``setTimeoutTimestamp(end + gap)``; when the
    watermark passes that, the function is re-invoked with
    ``hasTimedOut`` and emits the parked session closed."""
    gap_ms = gap_seconds * 1000
    out_schema = (
        f"{key_col} long, session_start timestamp, session_end timestamp, "
        "n_events long, total double"
    )
    state_schema = "start long, end long, n long, s double"
    out_cols = [key_col, "session_start", "session_end", "n_events", "total"]

    def to_row(key, sess):
        start_ms, end_ms, n, s = sess
        return {
            key_col: key,
            "session_start": pd.Timestamp(start_ms, unit="ms"),
            "session_end": pd.Timestamp(end_ms, unit="ms"),
            "n_events": n,
            "total": round(s, 4),
        }

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            # Watermark passed end+gap for the parked session: closed.
            sess = tuple(state.get)
            state.remove()
            yield pd.DataFrame([to_row(key[0], sess)], columns=out_cols)
            return
        batch = pd.concat([pdf for pdf in pdfs if len(pdf)], ignore_index=True)
        ts_ms = batch[ts_col].astype("datetime64[ms]").astype("int64").to_numpy()
        vals = batch[value_col].to_numpy()
        order = ts_ms.argsort(kind="stable")
        cur = tuple(state.get) if state.exists else None
        closed, cur = _fold_sessions(
            cur, [(int(ts_ms[i]), float(vals[i])) for i in order], gap_ms
        )
        state.update(cur)
        # Clamp: a timeout below the current watermark is rejected by
        # Spark; if the watermark already passed end+gap the timer fires
        # on the next (possibly no-data) micro-batch and emission uses
        # the STATE's end, so the clamp never changes the output.
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(cur[1] + gap_ms, wm + 1))
        if closed:
            yield pd.DataFrame([to_row(key[0], c) for c in closed], columns=out_cols)

    return (
        events.withWatermark(ts_col, f"{gap_seconds} seconds")
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
