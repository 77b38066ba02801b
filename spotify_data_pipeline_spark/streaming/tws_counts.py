"""Per-user event-type counters on ``transformWithStateInPandas`` with
MAP STATE — the third TWS state primitive, completing the set the
engine exercises end to end (ValueState: the round-7 TWS twin;
ListState + event-time timers: streaming/tws_sessions.py; MapState:
here). The map key is the event type, so one user's hot type updates
one map entry instead of rewriting a whole list/value blob — the
RocksDB-backed shape for high-cardinality per-key sub-state
(per-user feature counters, per-session page tallies).

Semantics: Update-mode running counts. Every micro-batch emits one row
(user_id, event_type, n_events, total_value) per (user, type) TOUCHED
in that batch, carrying the running totals so far; the LATEST row per
key therefore equals the batch groupBy answer over everything
ingested — the equivalence tests/test_tws_counts.py pins.

Scale shape: state is |types-seen| map entries per user, each updated
point-wise; a micro-batch touches only the (user, type) pairs present
in it. No timers, no list rewrites.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["type_counts_tws"]

_OUT_SCHEMA = "user_id long, event_type string, n_events long, total_value double"


def type_counts_tws(events: DataFrame) -> DataFrame:
    """``events`` must carry (user_id, event_type, value). Output: one
    running-total row per (user, type) touched per micro-batch,
    Update mode."""
    import pandas as pd

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _Counts(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            # map key = event type; value = running (n, total)
            self._m = handle.getMapState(
                "counts", "event_type string", "n long, total double"
            )

        def handleInputRows(self, key, rows, timerValues):
            batch: dict[str, tuple[int, float]] = {}
            for pdf in rows:
                for et, v in zip(
                    pdf["event_type"].tolist(), pdf["value"].astype(float).tolist()
                ):
                    n, t = batch.get(et, (0, 0.0))
                    batch[et] = (n + 1, t + v)
            out_t, out_n, out_v = [], [], []
            for et in sorted(batch):
                dn, dv = batch[et]
                if self._m.containsKey((et,)):
                    old_n, old_v = self._m.getValue((et,))
                else:
                    old_n, old_v = 0, 0.0
                n, v = old_n + dn, old_v + dv
                self._m.updateValue((et,), (n, v))
                out_t.append(et)
                out_n.append(n)
                out_v.append(round(v, 2))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(out_t),
                    "event_type": out_t,
                    "n_events": out_n,
                    "total_value": out_v,
                }
            )

        def close(self) -> None:
            pass

    return events.select("user_id", "event_type", "value").groupBy(
        "user_id"
    ).transformWithStateInPandas(
        statefulProcessor=_Counts(),
        outputStructType=_OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
