"""Gap-based sessionization on Spark 4's ``transformWithStateInPandas``
with EVENT-TIME TIMERS — the capability the TWS API adds over
``applyInPandasWithState``'s single timeout slot, exercised end to end
now that the state protocol runs in this environment
(vendor/sitecustomize.py protobuf alias, round 7).

Semantics (the ``session_window`` contract, expressed as user state):
events of one user belong to one session while consecutive event times
are within ``gap``; a session CLOSES when the event-time watermark
passes session_end + gap, at which point exactly one row
(user_id, session_start, session_end, n_events, total_value) is
emitted — either from ``handleExpiredTimer`` (no further events
arrived: the timer registered at end+gap fires when the watermark
passes it) or from ``handleInputRows`` (a later-than-gap event closes
the previous session in-line and starts a new one).

Engine comparison: ``streaming/events.py::sessionize`` gets exactly
this from the built-in ``session_window`` — the built-in remains the
production default (state in the engine, merge handled by Catalyst);
this operator exists for the semantics session_window canNOT express
(custom close conditions, per-session side state, emitting partial
session snapshots), with the PLAIN gap rule kept here so a batch twin
can pin its output exactly (tests/test_tws_sessions.py).

Scale shape: state is one fixed-width value per user plus at most one
live timer; each micro-batch touches only keys present in the batch
(plus expired timers) — the standard TWS cost model. RocksDB state
store required (the API rejects the HDFS-backed default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["gap_sessions_tws"]

_OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double"
)


def gap_sessions_tws(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """``events`` must carry (user_id, ts, value) and an event-time
    watermark on ``ts`` (timeMode='eventTime' derives timer progress
    from it). Output: one row per CLOSED session, Append mode."""
    import pandas as pd

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    gap_ms = gap_minutes * 60_000

    class _Sessions(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            # epoch-ms longs: integer state, no timestamp-codec surface
            self._sess = handle.getValueState(
                "sess", "start long, end long, n long, total double"
            )

        @staticmethod
        def _row(key, start, end, n, total):
            return pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start": [pd.Timestamp(start, unit="ms")],
                    "session_end": [pd.Timestamp(end, unit="ms")],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                }
            )

        def handleInputRows(self, key, rows, timerValues):
            state = self._sess.get() if self._sess.exists() else None
            events = []
            for pdf in rows:
                ts_ms = (pdf["ts"].astype("int64") // 1_000_000).tolist()
                events.extend(zip(ts_ms, pdf["value"].astype(float).tolist()))
            events.sort()
            for t, v in events:
                if state is None:
                    state = (t, t, 1, v)
                elif t - state[1] > gap_ms:
                    yield self._row(key, *state)  # close the old session
                    state = (t, t, 1, v)
                else:
                    state = (
                        min(state[0], t),
                        max(state[1], t),
                        state[2] + 1,
                        state[3] + v,
                    )
            if state is not None:
                self._sess.update(state)
                # exactly one live timer: the close-out at end + gap
                for old in list(self._handle.listTimers()):
                    self._handle.deleteTimer(old)
                self._handle.registerTimer(state[1] + gap_ms)

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            if self._sess.exists():
                state = self._sess.get()
                # the timer that fired is end+gap for the CURRENT state
                # (stale timers were deleted on every update)
                if expiredTimerInfo.getExpiryTimeInMs() >= state[1] + gap_ms:
                    self._sess.clear()
                    yield self._row(key, *state)

        def close(self) -> None:
            pass

    return events.select("user_id", "ts", "value").groupBy(
        "user_id"
    ).transformWithStateInPandas(
        statefulProcessor=_Sessions(),
        outputStructType=_OUT_SCHEMA,
        outputMode="Append",
        timeMode="eventTime",
    )
