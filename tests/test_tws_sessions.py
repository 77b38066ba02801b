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
    (5, _TS(2024, 1, 1, 11, 30), 10, 5.0),  # closes session 1 in-line
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
    # the comparison is non-vacuous: both in-line closes and
    # timer-expiry closes occurred
    assert len(twin) >= 3
    assert (10, _TS(2024, 1, 1, 10, 1), _TS(2024, 1, 1, 10, 14)) in got  # in-line close
    assert (11, _TS(2024, 1, 1, 10, 12), _TS(2024, 1, 1, 10, 20)) in got  # timer close
