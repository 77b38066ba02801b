"""Streaming tests: drive each streaming pipeline synchronously with the
memory sink (processAllAvailable) and check against the batch twin —
the §2.10 'no DuckDB oracle' test rig (SURVEY §7.2 hard-point 3)."""

from __future__ import annotations

import datetime as dt
import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.streaming.events import (
    dedup_within_watermark,
    session_aggregate,
    tumbling_counts,
)

_TS = dt.datetime


@pytest.fixture()
def events_dir(spark, tmp_path):
    """A small on-disk parquet events table the file-source stream reads.
    Two files => two micro-batches with maxFilesPerTrigger=1."""
    rows1 = [
        (1, _TS(2024, 1, 1, 10, 1), 10, "click", 1.0),
        (2, _TS(2024, 1, 1, 10, 4), 10, "click", 2.0),
        (3, _TS(2024, 1, 1, 10, 12), 11, "view", 3.0),
        (3, _TS(2024, 1, 1, 10, 12), 11, "view", 3.0),  # duplicate event_id
    ]
    rows2 = [
        (4, _TS(2024, 1, 1, 10, 14), 10, "click", 4.0),
        (5, _TS(2024, 1, 1, 11, 30), 10, "click", 5.0),  # new session (>30m gap)
        (3, _TS(2024, 1, 1, 10, 12), 11, "view", 3.0),  # dup again, later batch
    ]
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    d = tmp_path / "events_stream"
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode("overwrite").parquet(str(d / "f1"))
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(str(d / "f1"))
    return str(d / "f1")


def _run_stream(spark, stream_df, name: str, mode: str) -> list:
    q = (
        stream_df.writeStream.outputMode(mode)
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


def _read_stream(spark, path: str):
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    return spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(path)


def test_tumbling_counts_matches_batch(spark, events_dir):
    stream = tumbling_counts(_read_stream(spark, events_dir))
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in _run_stream(spark, stream, "t_tumble", "complete")
    }
    batch = spark.read.parquet(events_dir)
    expect = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in (
            batch.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
            .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
        ).collect()
    }
    assert got == expect
    # sanity: the 10:00-10:10 click window holds events 1,2
    w0 = _TS(2024, 1, 1, 10, 0)
    assert got[(w0, "click")][0] == 2


def test_session_aggregate_splits_on_gap(spark, events_dir):
    stream = session_aggregate(_read_stream(spark, events_dir))
    rows = _run_stream(spark, stream, "t_sess", "complete")
    u10 = sorted(
        [(r.session_start, r.n_events) for r in rows if r.user_id == 10]
    )
    # user 10: events at 10:01,10:04,10:14 chain into one session
    # (each gap < 30m); 11:30 starts a new one
    assert len(u10) == 2
    assert u10[0][1] == 3 and u10[1][1] == 1


def test_dedup_within_watermark_suppresses_dups(spark, events_dir):
    stream = dedup_within_watermark(_read_stream(spark, events_dir))
    rows = _run_stream(spark, stream, "t_dedup", "append")
    ids = sorted(r.event_id for r in rows)
    assert ids == [1, 2, 3, 4, 5]  # event 3 emitted exactly once


def test_read_events_stream_reads_only_events_files(spark):
    """Round-1 ADVICE regression: read_events_stream must stream from
    {sf_dir}/events.parquet, not the parent sf_dir — streaming the
    parent would ingest all ten tables' parquet under the events
    schema."""
    from spotify_data_pipeline_spark.streaming.events import read_events_stream

    sf_dir = "/root/testdata/sf0.001"
    stream = read_events_stream(spark, sf_dir)
    rows = _run_stream(
        spark, stream.groupBy().count(), "t_events_src", "complete"
    )
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert rows[0][0] == n_events  # exactly the events rows, nothing else


def test_running_user_totals_stateful(spark, events_dir):
    from spotify_data_pipeline_spark.streaming.events import running_user_totals

    stream = running_user_totals(_read_stream(spark, events_dir))
    rows = _run_stream(spark, stream, "t_state", "update")
    # memory sink keeps one row per (micro-batch, user) emission; the
    # LAST emission per user must equal the batch ground truth
    last = {}
    for r in rows:
        last[r.user_id] = (r.n_events, r.total_value)
    batch = spark.read.parquet(events_dir)
    expect = {
        r.user_id: (r.n, round(r.s, 2))
        for r in batch.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert last == expect
    # state accumulated ACROSS micro-batches: user 10 appears in both
    # files, so some emission for user 10 must show a partial count
    u10_counts = sorted({r.n_events for r in rows if r.user_id == 10})
    assert u10_counts[-1] == 4 and len(u10_counts) >= 2


def test_merge_stream_into_parquet_upserts(spark, events_dir, tmp_path):
    """Streaming MERGE sink: duplicate event_ids across micro-batches
    collapse to one row in the parquet target (the reference's gold
    double-append failure mode, fixed)."""
    from spotify_data_pipeline_spark.streaming.events import merge_stream_into_parquet

    target = str(tmp_path / "gold_events")
    writer = merge_stream_into_parquet(
        _read_stream(spark, events_dir), target, keys=["event_id"], order_by=[F.col("ts").desc()]
    )
    q = writer.option("checkpointLocation", str(tmp_path / "ckpt")).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.read.parquet(target)
    ids = sorted(r.event_id for r in out.collect())
    assert ids == [1, 2, 3, 4, 5]  # dup event 3 (twice in batch 1, once in batch 2) upserted once
    batch = spark.read.parquet(events_dir)
    assert out.count() == batch.select("event_id").distinct().count()


def test_purchase_window_join_matches_batch(spark, tmp_path):
    """Stream-stream interval join ≡ the batch theta join on the same
    rows (and ≡ the batch binned range join's semantics)."""
    from spotify_data_pipeline_spark.streaming.events import purchase_window_join

    rows = [
        (1, _TS(2024, 1, 1, 10, 0), 10, "click", 1.0),
        (2, _TS(2024, 1, 1, 10, 30), 10, "view", 1.0),
        (3, _TS(2024, 1, 1, 10, 45), 11, "purchase", 9.0),
        (4, _TS(2024, 1, 1, 11, 44), 11, "click", 1.0),
        (5, _TS(2024, 1, 1, 11, 45), 11, "purchase", 9.0),
        (6, _TS(2024, 1, 1, 23, 0), 12, "purchase", 9.0),  # nothing in window
    ]
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    d = str(tmp_path / "pw_events")
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(d)

    stream = purchase_window_join(_read_stream(spark, d))
    got = {(r.purchase_id, r.event_id) for r in _run_stream(spark, stream, "t_pwjoin", "append")}

    batch = spark.createDataFrame(rows, schema)
    p = batch.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    want = {
        (r.purchase_id, r.event_id)
        for r in batch.join(
            p,
            F.expr("ts > p_ts - interval 1 hour AND ts <= p_ts AND event_id != purchase_id"),
        ).collect()
    }
    assert got == want
    # purchase 3 @10:45 sees events 1 (10:00) and 2 (10:30); purchase 5
    # @11:45 sees event 4 (11:44) but NOT event 3 (10:45 — exactly on
    # the open lower boundary); purchase 6 sees nothing
    assert got == {(3, 1), (3, 2), (5, 4)}


def test_streaming_sketch_fold_equals_batch_build(spark, events_dir):
    """Mergeable-state refresh through the real streaming rig: each
    micro-batch's quantile-sketch partial folds into running state via
    foreachBatch; the folded state is BIT-equal to a one-shot build
    over all rows (the operators/quantiles.py merge guarantee, here
    exercised across actual micro-batch boundaries)."""
    import uuid as _uuid

    from spotify_data_pipeline_spark.operators.quantiles import hdr_build, hdr_merge

    partials = []

    def fold(batch_df, batch_id):
        rows = hdr_build(
            batch_df.select("user_id", (F.col("value") * 100).cast("long").alias("cents")),
            ["user_id"],
            "cents",
        ).collect()
        partials.append(rows)

    q = (
        _read_stream(spark, events_dir)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", f"/tmp/ckpt_fold_{_uuid.uuid4().hex}")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert len(partials) >= 2  # maxFilesPerTrigger=1 => multiple batches
    schema = "user_id long, bucket_lo long, cnt long"
    states = [spark.createDataFrame(p, schema) for p in partials if p]
    folded = hdr_merge(["user_id"], *states)

    batch = spark.read.parquet(events_dir).select(
        "user_id", (F.col("value") * 100).cast("long").alias("cents")
    )
    full = hdr_build(batch, ["user_id"], "cents")
    a = {(r.user_id, r.bucket_lo, r.cnt) for r in folded.collect()}
    b = {(r.user_id, r.bucket_lo, r.cnt) for r in full.collect()}
    assert a == b


def test_purchase_window_join_long_window(spark, tmp_path):
    """Regression for the r03 ADVICE bug: the bin width was hardcoded
    to 1 hour, so a 2-hour window silently dropped matches older than
    the two covered hour-bins. The bin width now IS the window, so an
    event 1.5 h before the purchase must match."""
    from spotify_data_pipeline_spark.streaming.events import purchase_window_join

    rows = [
        (1, _TS(2024, 1, 1, 9, 15), 10, "click", 1.0),   # 1.5h before -> in 2h window
        (2, _TS(2024, 1, 1, 10, 30), 10, "view", 1.0),   # 15min before
        (3, _TS(2024, 1, 1, 10, 45), 11, "purchase", 9.0),
        (4, _TS(2024, 1, 1, 8, 44), 11, "click", 1.0),   # 2h01m before -> out
    ]
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    d = str(tmp_path / "pw_events_2h")
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(d)

    stream = purchase_window_join(
        _read_stream(spark, d), watermark="2 hours", window="2 hours"
    )
    got = {
        (r.purchase_id, r.event_id)
        for r in _run_stream(spark, stream, "t_pwjoin2h", "append")
    }
    assert got == {(3, 1), (3, 2)}


def test_purchase_window_join_rejects_unparseable_window(spark, tmp_path):
    import pytest

    from spotify_data_pipeline_spark.streaming.events import _interval_micros

    assert _interval_micros("2 hours") == 7_200_000_000
    assert _interval_micros("30 minutes") == 1_800_000_000
    with pytest.raises(ValueError, match="window must look like"):
        _interval_micros("1 fortnight")


def test_purchase_window_join_outer_emits_unmatched(spark, tmp_path):
    """Left-outer stream-stream interval join: purchases with an empty
    preceding window emit exactly ONE null-event row (the exploded-side
    flip prevents per-bin phantom nulls), matched purchases emit their
    match rows, and the result equals the batch left theta join."""
    from spotify_data_pipeline_spark.streaming.events import (
        purchase_window_join_outer,
    )

    rows1 = [
        (1, _TS(2024, 1, 1, 10, 0), 10, "click", 1.0),
        (2, _TS(2024, 1, 1, 10, 45), 11, "purchase", 9.0),   # sees event 1
        (3, _TS(2024, 1, 1, 14, 0), 12, "purchase", 9.0),    # lonely purchase
    ]
    # Later batches must contain PURCHASES, not just clicks: both join
    # sides read the same stream and the global watermark is the MIN of
    # the two side watermarks (multipleWatermarkPolicy default) — the
    # purchase side's only advances when new purchases arrive, so a
    # click-only tail batch would pin the watermark and no null row
    # would ever emit. rows3 exists because eviction uses the watermark
    # computed at the PREVIOUS batch's end.
    rows2 = [
        (4, _TS(2024, 1, 3, 12, 0), 13, "purchase", 9.0),
    ]
    rows3 = [
        (5, _TS(2024, 1, 5, 12, 0), 13, "purchase", 9.0),
    ]
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    d = tmp_path / "pw_outer"
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode("overwrite").parquet(str(d))
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(str(d))
    spark.createDataFrame(rows3, schema).coalesce(1).write.mode("append").parquet(str(d))

    stream = purchase_window_join_outer(_read_stream(spark, str(d)))
    got = {
        (r.purchase_id, r.event_id)
        for r in _run_stream(spark, stream, "t_pwjoin_outer", "append")
    }

    # The batch twin, restricted to purchases whose windows the final
    # watermark has passed (5 is still buffered in join state at stream
    # end — its null row is correctly WITHHELD, not dropped; 4 sits
    # exactly on the eviction bound p_ts = watermark + delay and Spark
    # evicts at equality).
    batch = spark.createDataFrame(rows1 + rows2 + rows3, schema)
    p = batch.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    want = {
        (r.purchase_id, r.event_id)
        for r in p.join(
            batch,
            F.expr("ts > p_ts - interval 1 hour AND ts <= p_ts AND event_id != purchase_id"),
            "left_outer",
        ).collect()
        if r.purchase_id <= 4
    }
    assert got == want
    assert (2, 1) in got          # matched pair
    assert (3, None) in got       # lonely purchase: exactly one null row
    assert sum(1 for pid, eid in got if pid == 3) == 1


def test_session_close_stats_timeout_eviction(spark, tmp_path):
    """EventTimeTimeout custom-state operator: sessions close in-batch
    on a gap, and by TIMEOUT (watermark passage) for quiet users —
    state evicted, session emitted exactly once. Checked against the
    batch lag-gap sessionization twin restricted to
    watermark-closed sessions."""
    from spotify_data_pipeline_spark.streaming.events import session_close_stats

    rows1 = [
        (1, _TS(2024, 1, 1, 10, 0), 10, "click", 1.0),
        (2, _TS(2024, 1, 1, 10, 10), 10, "click", 2.0),
        (3, _TS(2024, 1, 1, 11, 30), 10, "view", 3.0),   # >30m gap: closes s1 in-batch
        (4, _TS(2024, 1, 1, 10, 5), 11, "click", 4.0),   # user 11 session opens
    ]
    rows2 = [
        # advances the watermark to ~(13:00 - 1h) = 12:00, which passes
        # user 11's (10:05 + 30m) timeout AND user 10's (11:30 + 30m)
        (5, _TS(2024, 1, 1, 13, 0), 12, "click", 5.0),
    ]
    rows3 = [
        # one more batch so the previous batch's watermark takes effect
        (6, _TS(2024, 1, 1, 13, 30), 12, "click", 6.0),
    ]
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    d = tmp_path / "sess_close"
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode("overwrite").parquet(str(d))
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(str(d))
    spark.createDataFrame(rows3, schema).coalesce(1).write.mode("append").parquet(str(d))

    stream = session_close_stats(_read_stream(spark, str(d)))
    got = {
        (r.user_id, r.session_start, r.session_end): (r.n_events, r.total_value)
        for r in _run_stream(spark, stream, "t_sess_close", "append")
    }

    # user 10 session 1 closed IN-BATCH by the 11:30 event; user 10
    # session 2 (11:30) and user 11's session closed by TIMEOUT once
    # the watermark reached 12:00+. User 12's session is still open
    # (watermark 12:30 < 13:30 + 30m) — correctly NOT emitted.
    want = {
        (10, _TS(2024, 1, 1, 10, 0), _TS(2024, 1, 1, 10, 10)): (2, 3.0),
        (10, _TS(2024, 1, 1, 11, 30), _TS(2024, 1, 1, 11, 30)): (1, 3.0),
        (11, _TS(2024, 1, 1, 10, 5), _TS(2024, 1, 1, 10, 5)): (1, 4.0),
    }
    assert got == want

    # batch twin: lag-gap sessionization over the same rows, restricted
    # to sessions whose (end + gap) the final watermark passed
    batch = spark.read.parquet(str(d))
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    sess = (
        batch.withColumn("_prev", F.lag("ts").over(w))
        .withColumn(
            "_new",
            (F.col("_prev").isNull())
            | (F.col("ts").cast("long") - F.col("_prev").cast("long") > 1800),
        )
        .withColumn("_sid", F.sum(F.col("_new").cast("int")).over(w))
        .groupBy("user_id", "_sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    final_wm = _TS(2024, 1, 1, 12, 30)  # max ts 13:30 - 1h watermark
    twin = {
        (r.user_id, r.session_start, r.session_end): (r.n_events, r.total_value)
        for r in sess.collect()
        if r.session_end + dt.timedelta(minutes=30) < final_wm
    }
    assert got == twin


def test_transform_with_state_matches_legacy_operator(spark, events_dir):
    """Spark 4 transformWithStateInPandas twin: identical per-batch
    output to the applyInPandasWithState running totals on the same
    micro-batches. The new API's state protocol needs google.protobuf,
    which this container does not ship (pip install is off-limits) —
    the operator is gated exactly like the image/audio decoder seams:
    plumbing real and reviewed, execution skipped where the dependency
    is absent."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithStateInPandas state protocol needs protobuf "
        "(not shipped in this container; no pip install allowed)",
    )
    from spotify_data_pipeline_spark.streaming.events import (
        running_user_totals,
        running_user_totals_tws,
    )

    prior = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        new = {
            (r.user_id, r.n_events, r.total_value)
            for r in _run_stream(
                spark, running_user_totals_tws(_read_stream(spark, events_dir)),
                "t_tws_totals", "update",
            )
        }
        old = {
            (r.user_id, r.n_events, r.total_value)
            for r in _run_stream(
                spark, running_user_totals(_read_stream(spark, events_dir)),
                "t_legacy_totals", "update",
            )
        }
    finally:
        if prior is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prior)
    assert new == old
    # final lifetime totals present for both users
    assert (10, 4, 12.0) in new and (11, 2, 6.0) in new


def test_stream_static_enrichment_matches_batch(spark, events_dir):
    """Stream-static join — Structured Streaming's built-in dimension
    enrichment: the static side joins per micro-batch with no state
    store and no watermark requirement. Pinned against the batch twin
    on the same files."""
    dim = spark.createDataFrame(
        [("click", 1.0), ("purchase", 5.0), ("view", 0.5)],
        "event_type string, weight double",
    )
    enriched = _read_stream(spark, events_dir).join(dim, "event_type")
    got = _run_stream(spark, enriched, "t_static_join", "append")
    want = spark.read.parquet(events_dir).join(dim, "event_type").collect()
    assert len(got) == len(want)
    assert {(r.event_id, r.weight) for r in got} == {
        (r.event_id, r.weight) for r in want
    }


def test_purchase_window_join_full_both_null_sides(spark, tmp_path):
    """Full-outer stream-stream interval join: matched pairs once,
    exactly ONE null row per lonely purchase AND per uncovered event,
    equal to the batch FULL theta join (restricted to rows the final
    watermark released)."""
    from spotify_data_pipeline_spark.streaming.events import (
        purchase_window_join_full,
    )

    rows1 = [
        (1, _TS(2024, 1, 1, 10, 0), 10, "click", 1.0),    # covered by 2
        (2, _TS(2024, 1, 1, 10, 45), 11, "purchase", 9.0),
        (3, _TS(2024, 1, 1, 14, 0), 12, "purchase", 9.0),  # lonely purchase
        (6, _TS(2024, 1, 1, 16, 0), 14, "click", 1.0),     # uncovered event
    ]
    # purchase-bearing tail batches keep BOTH side watermarks moving
    # (min-of-watermarks policy), releasing the buffered null rows
    rows2 = [(4, _TS(2024, 1, 3, 12, 0), 13, "purchase", 9.0)]
    rows3 = [(5, _TS(2024, 1, 5, 12, 0), 13, "purchase", 9.0)]
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    d = tmp_path / "pw_full"
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode("overwrite").parquet(str(d))
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(str(d))
    spark.createDataFrame(rows3, schema).coalesce(1).write.mode("append").parquet(str(d))

    stream = purchase_window_join_full(_read_stream(spark, str(d)))
    got = {
        (r.purchase_id, r.event_id)
        for r in _run_stream(spark, stream, "t_pwjoin_full", "append")
    }

    batch = spark.createDataFrame(rows1 + rows2 + rows3, schema)
    p = batch.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    full = p.join(
        batch,
        F.expr("ts > p_ts - interval 1 hour AND ts <= p_ts AND event_id != purchase_id"),
        "full_outer",
    ).collect()
    # restrict to rows the final watermark (from batch-2 end: 1/3 12:00
    # minus 1h) has released on BOTH sides; 5's own rows stay buffered
    want = {
        (r.purchase_id, r.event_id)
        for r in full
        if (r.purchase_id is None or r.purchase_id <= 4)
        and (r.event_id is None or r.event_id <= 4 or r.event_id == 6)
    }
    assert got == want
    assert (2, 1) in got            # matched pair, exactly once
    assert (3, None) in got         # lonely purchase: one null row
    assert (None, 6) in got         # uncovered event: one null row
    assert sum(1 for pid, eid in got if pid == 3) == 1
    assert sum(1 for pid, eid in got if eid == 6) == 1
    # purchases 2/3/4 are events too: covered by nothing -> each also
    # appears exactly once on the event side of the full join
    for eid in (2, 3, 4):
        assert sum(1 for pid, e in got if e == eid) >= 1


def test_stream_static_enrichment_matches_batch(spark, events_dir):
    """enrich_with_dim: stream-static broadcast join, stateless — the
    streamed result equals the batch twin, and stream rows without a
    dim match survive the LEFT join with NULL attributes."""
    from spotify_data_pipeline_spark.streaming.events import enrich_with_dim

    dim = spark.createDataFrame(
        [(10, "gold")], "user_id long, tier string"
    )  # user 11 deliberately absent
    stream = _read_stream(spark, events_dir)
    out = _run_stream(
        spark,
        enrich_with_dim(stream, dim, on="user_id", how="left"),
        "enriched",
        "append",
    )
    batch = (
        spark.read.parquet(events_dir)
        .join(dim, on="user_id", how="left")
        .collect()
    )
    key = lambda r: (r.event_id, r.ts, r.user_id, r.tier)
    assert sorted(map(key, out)) == sorted(map(key, batch))
    # the unmatched user's rows are present with a NULL tier
    assert any(r.user_id == 11 and r.tier is None for r in out)
    assert all(r.tier == "gold" for r in out if r.user_id == 10)
