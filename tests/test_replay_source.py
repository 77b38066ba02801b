"""sources/replay.py — the streaming replay DataSource: exact replay,
multi-batch chunking, deterministic restart offsets."""

from __future__ import annotations

import pytest

from spotify_data_pipeline_spark.sources.replay import (
    EventReplayDataSource,
    _ReplayStreamReader,
    register_replay_source,
)

SF_DIR = "/root/testdata/sf0.001"


def test_stream_replays_recording_exactly(spark, tmp_path):
    register_replay_source(spark)
    stream = (
        spark.readStream.format("events_replay")
        .option("path", f"{SF_DIR}/events.parquet")
        .option("batch_rows", "300")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("replayed")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM replayed")
    batch = spark.read.parquet(f"{SF_DIR}/events.parquet")
    assert got.count() == batch.count()
    # exact content equality (event_id is unique here)
    g = {r.event_id: (r.ts, r.user_id, r.event_type) for r in got.collect()}
    b = {r.event_id: (r.ts, r.user_id, r.event_type) for r in batch.collect()}
    assert g == b


def test_reader_chunks_and_offsets_are_deterministic():
    opts = {"path": f"{SF_DIR}/events.parquet", "batch_rows": "400"}
    r1, r2 = _ReplayStreamReader(opts), _ReplayStreamReader(opts)
    off = r1.initialOffset()
    seen = 0
    while True:
        rows, nxt = r1.read(off)
        rows = list(rows)
        rows2 = list(r2.readBetweenOffsets(off, nxt))
        assert rows == rows2  # restart path replays identically
        if not rows:
            assert nxt == off
            break
        # time-ordered within and across batches
        ts = [t for _, t, *_ in rows]
        assert ts == sorted(ts)
        seen += len(rows)
        off = nxt
    assert seen == 1000  # sf0.001 events row count


def test_missing_path_raises():
    with pytest.raises(ValueError, match="path"):
        _ReplayStreamReader({})
    with pytest.raises(ValueError, match="batch_rows"):
        _ReplayStreamReader({"path": "x", "batch_rows": "0"})


def test_replay_drives_streaming_operator_to_batch_parity(spark, tmp_path):
    """The point of the source: an EXISTING streaming operator
    (watermarked tumbling counts) fed by the replay stream produces
    the batch twin's counts for every window the final watermark
    closed — recorded-data regression testing without Kafka."""
    from pyspark.sql import functions as F

    from spotify_data_pipeline_spark.streaming.events import tumbling_counts

    register_replay_source(spark)
    stream = (
        spark.readStream.format("events_replay")
        .option("path", f"{SF_DIR}/events.parquet")
        .option("batch_rows", "250")
        .load()
    )
    q = (
        tumbling_counts(stream, window="1 hour", watermark="1 hour")
        .writeStream.format("memory")
        .queryName("replay_tumbling")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.window_start, r.event_type): r.n_events
        for r in spark.sql("SELECT * FROM replay_tumbling").collect()
    }
    assert got, "no windows closed"
    batch = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "event_type", "n")
    )
    want = {(r.ws, r.event_type): r.n for r in batch.collect()}
    # append-mode emits only watermark-closed windows: every emitted
    # window must match the batch twin exactly, and the tail the
    # watermark still holds open is the ONLY difference
    for k, v in got.items():
        assert want[k] == v, k
    missing = set(want) - set(got)
    if missing:
        max_emitted = max(s for s, _ in got)
        assert all(s >= max_emitted for s, _ in missing)
