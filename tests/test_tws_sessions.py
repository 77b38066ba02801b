"""streaming/tws_sessions.py — timer-based sessionization on
transformWithStateInPandas, equivalence-pinned against a pure batch
gap-sessionization twin (the session close-out discipline of the
existing session_window tests, now on the TWS surface with event-time
timers)."""

from __future__ import annotations

import datetime as dt
import uuid

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.streaming.tws_sessions import gap_sessions_tws

pytest.importorskip(
    "google.protobuf",
    reason="TWS state protocol needs protobuf (vendor shim absent?)",
)

_TS = dt.datetime
_SCHEMA = "event_id long, ts timestamp, user_id long, value double"

# user 10: two sessions (10:01-10:14, then 11:30 after a >30m gap);
# user 11: one session; the final file advances the watermark far past
# every end+gap so ALL sessions close via timers before the comparison.
_ROWS1 = [
    (1, _TS(2024, 1, 1, 10, 1), 10, 1.0),
    (2, _TS(2024, 1, 1, 10, 4), 10, 2.0),
    (3, _TS(2024, 1, 1, 10, 12), 11, 3.0),
]
_ROWS2 = [
    (4, _TS(2024, 1, 1, 10, 14), 10, 4.0),
    (5, _TS(2024, 1, 1, 11, 30), 10, 5.0),  # > gap later: starts session 2
    (6, _TS(2024, 1, 1, 10, 20), 11, 1.5),  # late-ish but within watermark
]
_ROWS3 = [
    (7, _TS(2024, 1, 1, 18, 0), 12, 9.0),  # watermark mover + its own session
    (8, _TS(2024, 1, 1, 23, 0), 12, 1.0),  # far ahead: everything earlier closes
]


@pytest.fixture(scope="module")
def sessions_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tws_sessions") / "ev")
    for i, rows in enumerate((_ROWS1, _ROWS2, _ROWS3)):
        spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(d)
    return d


def _run_stream(spark, stream_df, name: str) -> list:
    q = (
        stream_df.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", f"/tmp/ckpt_{name}_{uuid.uuid4().hex}")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}").collect()


def _batch_twin(spark, rows, gap_minutes, final_wm):
    """Pure batch gap sessionization: lag + cumsum session ids; only
    sessions closed before the final watermark count (end + gap < wm)."""
    df = spark.createDataFrame(rows, _SCHEMA)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = dt.timedelta(minutes=gap_minutes)
    sess = (
        df.withColumn("_prev", F.lag("ts").over(w))
        .withColumn(
            "_new",
            (
                F.col("_prev").isNull()
                | (F.col("ts").cast("long") - F.col("_prev").cast("long") > gap_minutes * 60)
            ).cast("int"),
        )
        .withColumn("_sid", F.sum("_new").over(w))
        .groupBy("user_id", "_sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    return {
        (r.user_id, r.session_start, r.session_end): (r.n_events, r.total_value)
        for r in sess.collect()
        if r.session_end + gap < final_wm
    }


def test_tws_sessions_match_batch_twin(spark, sessions_dir):
    prior = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema(_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(sessions_dir)
            .withWatermark("ts", "10 minutes")
        )
        got = {
            (r.user_id, r.session_start, r.session_end): (r.n_events, r.total_value)
            for r in _run_stream(spark, gap_sessions_tws(stream, 30), "t_tws_sessions")
        }
    finally:
        if prior is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prior)

    final_wm = _TS(2024, 1, 1, 23, 0) - dt.timedelta(minutes=10)
    twin = _batch_twin(spark, _ROWS1 + _ROWS2 + _ROWS3, 30, final_wm)
    assert got == twin
    # the comparison is non-vacuous: sessions ended by a later-than-gap
    # event AND sessions with no successor both closed (all closes are
    # timer-driven since the round-8 ADVICE fix — emission waits for the
    # watermark to pass end + gap)
    assert len(twin) >= 3
    assert (10, _TS(2024, 1, 1, 10, 1), _TS(2024, 1, 1, 10, 14)) in got
    assert (11, _TS(2024, 1, 1, 10, 12), _TS(2024, 1, 1, 10, 20)) in got


# --- cross-batch out-of-order (ADVICE r07) -------------------------------
# Watermark delay (2h) is LARGER than the gap (30m), so a within-
# watermark event can arrive more than one gap EARLIER than an open
# session — the two divergences the round-7 single-session operator had:
#   user 20: 12:00 arrives first; 11:00 arrives a batch later (60m
#     earlier than the open session's start). session_window SPLITS
#     (gap 60m > 30m); the old merge rule (t - end > gap only) merged.
#   user 21: 10:00 then 10:50 (> gap: the old code closed [10:00] in-
#     line) then late 10:20, which BRIDGES both into one session
#     [10:00, 10:50] — the old code emitted [10:00] early and a
#     spurious second session; watermark-gated close + interval merge
#     lands on the batch-twin answer.
_OOO1 = [
    (1, _TS(2024, 1, 1, 12, 0), 20, 1.0),
    (2, _TS(2024, 1, 1, 10, 0), 21, 2.0),
]
_OOO2 = [
    (3, _TS(2024, 1, 1, 11, 0), 20, 4.0),  # 60m EARLIER than open session
    (4, _TS(2024, 1, 1, 10, 50), 21, 8.0),
]
_OOO3 = [
    (5, _TS(2024, 1, 1, 10, 20), 21, 16.0),  # bridges [10:00] and [10:50]
]
_OOO4 = [
    (6, _TS(2024, 1, 1, 20, 0), 22, 0.5),  # watermark mover: wm -> 18:00
]


@pytest.fixture(scope="module")
def ooo_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tws_ooo") / "ev")
    for i, rows in enumerate((_OOO1, _OOO2, _OOO3, _OOO4)):
        spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(d)
    return d


def test_tws_sessions_cross_batch_out_of_order(spark, ooo_dir):
    prior = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema(_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(ooo_dir)
            .withWatermark("ts", "2 hours")
        )
        got = {
            (r.user_id, r.session_start, r.session_end): (r.n_events, r.total_value)
            for r in _run_stream(spark, gap_sessions_tws(stream, 30), "t_tws_ooo")
        }
    finally:
        if prior is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prior)

    final_wm = _TS(2024, 1, 1, 20, 0) - dt.timedelta(hours=2)
    twin = _batch_twin(spark, _OOO1 + _OOO2 + _OOO3 + _OOO4, 30, final_wm)
    assert got == twin
    # the split the old merge rule got wrong:
    assert (20, _TS(2024, 1, 1, 11, 0), _TS(2024, 1, 1, 11, 0)) in got
    assert (20, _TS(2024, 1, 1, 12, 0), _TS(2024, 1, 1, 12, 0)) in got
    # the bridge the old in-line close got wrong (one session, not two):
    assert got[(21, _TS(2024, 1, 1, 10, 0), _TS(2024, 1, 1, 10, 50))] == (3, 26.0)
    assert not any(k[0] == 22 for k in got)  # mover's session still open
