"""Streaming event pipelines (SURVEY.md §2.10).

Each builder takes an *unbounded* events DataFrame (``readStream``) and
returns the transformed streaming DataFrame; the caller attaches a sink.
The SAME transformations run in batch mode (plans/events_queries.py) —
that is how their semantics are DuckDB-hash-checked; these streaming
twins add watermarking/state and are validated by the synchronous
memory-sink tests in tests/test_streaming.py.

Scale notes: streaming state is keyed by (window, event_type) /
(session, user) / event_id respectively; watermarks bound state size —
without them windowed state grows forever at 100 TB/day. Shuffle
partitions size the state store; AQE does not apply to streaming, so
``spark.sql.shuffle.partitions`` matters at stream start.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.plans.parity import rnd


def read_events_stream(spark, sf_dir: str, schema=None) -> DataFrame:
    """File-source stream over the events parquet files (and ONLY the
    events files — streaming the parent sf_dir would ingest the other
    nine tables' parquet under the events schema).

    maxFilesPerTrigger=1 keeps micro-batches small in tests. The NANOS
    timestamp issue (io.py) applies here too: read ts as long and
    convert with integer division. NOTE: the legacy nanosAsLong conf
    stays set for the session — a streaming query re-reads it per
    micro-batch, so it cannot be scoped the way io._load_events scopes
    its batch read.
    """
    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if schema is None:
        schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    reader = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
    events_path = f"{sf_dir}/events.parquet"
    if os.path.isdir(events_path):
        raw = reader.parquet(events_path)
    else:
        # single-file layout: the file-source needs a directory, so
        # stream the parent restricted to exactly the events file
        raw = reader.option("pathGlobFilter", "events.parquet").parquet(sf_dir)
    ts_type = dict((f.name, f.dataType.simpleString()) for f in schema.fields).get("ts")
    if ts_type == "bigint":
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif ts_type == "timestamp_ntz":
        # newer testdata generations write TIMESTAMP(MICROS) without UTC
        # adjustment; normalize to session-TZ TIMESTAMP like io.load_table
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def tumbling_counts(events: DataFrame, window: str = "10 minutes", watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of events_tumbling_window: watermarked tumbling
    aggregate. Late rows beyond the watermark are dropped; state for a
    window is freed once the watermark passes its end."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), rnd(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


def session_aggregate(events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour") -> DataFrame:
    """Streaming sessionization via session_window — the stateful twin of
    the batch lag+cumsum plan (plans/events_queries.py)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("user_id"),
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Stateful streaming dedup by event_id: duplicates arriving within
    the watermark horizon are suppressed, and state is bounded by it
    (SURVEY §2.10 'stateful dedup')."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def merge_stream_into_parquet(
    stream_df: DataFrame,
    target_dir: str,
    keys: list[str],
    order_by=None,
):
    """Streaming MERGE sink: each micro-batch is upserted into a parquet
    target via ``foreachBatch`` + ``merge_upsert`` (operators/upsert.py)
    — the streaming twin of the reference's gold load made idempotent
    (its BigQuery WRITE_APPEND double-appends on retry; SURVEY §4.2).

    The merged result is written to a temp dir and swapped in (the
    write-temp-then-swap pattern upsert.py documents), so a crashed
    batch leaves the previous target intact and a replayed micro-batch
    (same data, same keys) converges to the same state — at-least-once
    delivery becomes effectively idempotent at the key level.

    Returns a DataStreamWriter; caller sets checkpointLocation and
    ``.start()``s it.
    """
    import os
    import shutil

    from spotify_data_pipeline_spark.operators.upsert import merge_upsert  # noqa: PLC0415

    def _merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if os.path.exists(target_dir):
            current = spark.read.parquet(target_dir)
            merged = merge_upsert(current, batch_df, keys, order_by)
        else:
            merged = (
                merge_upsert(batch_df.limit(0), batch_df, keys, order_by)
            )  # dedup-within-batch via the same winner rule
        # Swap order matters: rename the CURRENT target aside first,
        # rename tmp in, delete the aside LAST — at every instant either
        # the old or the new state exists under a recoverable name (a
        # crash between the renames leaves `.old-{batch_id}` intact; the
        # previous rmtree-then-rename had a window where the target was
        # simply gone). Local-FS sink: os.rename atomicity does not hold
        # on object stores — there, use a transactional table format
        # instead of this directory swap.
        tmp = target_dir.rstrip("/") + f".tmp-{batch_id}"
        aside = target_dir.rstrip("/") + f".old-{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.exists(target_dir):
            os.rename(target_dir, aside)
        os.rename(tmp, target_dir)
        if os.path.exists(aside):
            shutil.rmtree(aside)

    return stream_df.writeStream.outputMode("append").foreachBatch(_merge_batch)


_INTERVAL_US = {
    "second": 1_000_000,
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
}


def _interval_micros(interval: str) -> int:
    """Parse a '<n> <unit>' interval string to microseconds. Restricted
    to the forms the bin arithmetic supports; anything else raises
    rather than silently mis-binning."""
    m = re.fullmatch(r"\s*(\d+)\s+(second|minute|hour|day)s?\s*", interval)
    if m is None:
        raise ValueError(
            f"window must look like '<n> second|minute|hour|day(s)', got {interval!r}"
        )
    return int(m.group(1)) * _INTERVAL_US[m.group(2)]


def purchase_window_join(
    events: DataFrame, watermark: str = "1 hour", window: str = "1 hour"
) -> DataFrame:
    """Stream-stream interval join: every event is matched to each
    'purchase' event whose preceding ``window`` contains it — the
    streaming twin of the batch range join
    (operators/rangejoin.point_in_interval_join, staged query
    ``events_window_count``).

    Structured Streaming refuses a stream-stream join without an
    equality predicate (state would be all-pairs), so this uses the
    SAME binning device as the batch operator: both sides carry an
    hour-bin key derived from event time — each purchase interval
    covers ≤2 bins, so the purchase side explodes to 2 rows — and the
    join is bin-equality plus the exact time-range predicate. The
    range condition bounds event time on both sides, which lets the
    state store EVICT buffered rows once the other side's watermark
    passes their constraint range; without it state grows with the
    full stream history — the streaming equivalent of the batch
    BroadcastNestedLoopJoin scale-killer.

    The bin width is ``window`` itself (parsed to µs), so every
    purchase interval (p_ts − window, p_ts] spans at most 2 bins and
    the 2-bin explode is exact for ANY window length — previously the
    bins were hardcoded to 1 hour and a longer window silently dropped
    matches older than the two covered bins. Output: (purchase_id,
    event_id, ts, p_ts) match rows; aggregate downstream as needed (a
    windowed count over this join is the streaming
    ``events_window_count``).
    """
    from spotify_data_pipeline_spark.operators.rangejoin import _floordiv_sql

    bin_w = _interval_micros(window)  # bin width == window length
    ev = (
        events.select("event_id", "ts")
        .withWatermark("ts", watermark)
        .withColumn("_bin", F.expr(_floordiv_sql("unix_micros(ts)", bin_w)))
    )
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", watermark)
        .withColumn(
            "_bin",
            F.explode(
                F.array(
                    F.expr(_floordiv_sql("unix_micros(p_ts)", bin_w) + " - 1"),
                    F.expr(_floordiv_sql("unix_micros(p_ts)", bin_w)),
                )
            ),
        )
    )
    cond = F.expr(
        f"ev._bin = p._bin AND ts > p_ts - interval {window}"
        " AND ts <= p_ts AND event_id != purchase_id"
    )
    return (
        ev.alias("ev")
        .join(purchases.alias("p"), cond)
        .select("purchase_id", "event_id", "ts", "p_ts")
    )


def purchase_window_join_outer(
    events: DataFrame, watermark: str = "1 hour", window: str = "1 hour"
) -> DataFrame:
    """LEFT-OUTER twin of ``purchase_window_join``: every purchase
    emits, with NULL ``event_id``/``ts`` when its preceding ``window``
    contained no other event — the form a conversion-attribution or
    monitoring pipeline needs (a purchase with an empty context is a
    signal, not a row to drop). Unmatched purchases emit once the
    event-side watermark passes their window — standard outer-join
    late-data semantics.

    The explode flips sides versus the inner form: outer-joining the
    EXPLODED purchase side would emit one null row per non-matching
    bin (2 per lonely purchase, plus phantom nulls for matched ones).
    Instead each event advertises into its own bin and the NEXT one
    (the two bins whose purchases can cover it), and the purchase side
    keeps ONE row at its own bin — so an unmatched purchase is exactly
    one null row, and a matching event meets each purchase through
    exactly one of its two advertised bins (no dedup needed). Note the
    state tradeoff: the 2× explode sits on the (bigger) event side
    here, the price of clean outer multiplicity.

    Operational caveat: both sides derive from the SAME input stream
    and the query watermark is the MIN of the two side watermarks
    (``spark.sql.streaming.multipleWatermarkPolicy`` default), so null
    rows only flush while new PURCHASES keep arriving — a purchase
    drought pins the purchase-side watermark and defers (not drops)
    the unmatched emissions. Monitor ``eventTime.watermark`` in query
    progress if downstream latency matters.
    """
    from spotify_data_pipeline_spark.operators.rangejoin import _floordiv_sql

    bin_w = _interval_micros(window)
    ev = (
        events.select("event_id", "ts")
        .withWatermark("ts", watermark)
        .withColumn(
            "_bin",
            F.explode(
                F.array(
                    F.expr(_floordiv_sql("unix_micros(ts)", bin_w)),
                    F.expr(_floordiv_sql("unix_micros(ts)", bin_w) + " + 1"),
                )
            ),
        )
    )
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", watermark)
        .withColumn("_bin", F.expr(_floordiv_sql("unix_micros(p_ts)", bin_w)))
    )
    cond = F.expr(
        f"ev._bin = p._bin AND ts > p_ts - interval {window}"
        " AND ts <= p_ts AND event_id != purchase_id"
    )
    return (
        purchases.alias("p")
        .join(ev.alias("ev"), cond, "left_outer")
        .select("purchase_id", "event_id", "ts", "p_ts")
    )


def purchase_window_join_full(
    events: DataFrame, watermark: str = "1 hour", window: str = "1 hour"
) -> DataFrame:
    """FULL-OUTER twin — the one interval-join mode the family still
    lacked: every purchase emits (null event when its window was
    empty) AND every event emits (null purchase when no later purchase
    window covered it). A single full_outer over either binned side
    would break one null multiplicity (the 2x-advertised side yields
    one phantom null per unmatched copy), so the form is the UNION of
    two LEFT-OUTER joins, each with the exploded side flipped to keep
    its preserved side's multiplicity exact:

    - (a) the declared left-outer form: purchases keep one row, events
      advertise into {bin, bin+1} -> inner pairs + exactly one null
      row per lonely purchase;
    - (b) the mirror: events keep one row at their own bin, purchases
      advertise into {bin-1, bin} (e matches p iff e_bin is in
      {p_bin-1, p_bin}), left-join, then FILTER to unmatched events
      only — their matched rows already came from (a).

    Each join keeps its own state store (multiple stateful operators,
    append mode); same min-of-watermarks operational caveat as the
    left-outer form, now on both sides."""
    from spotify_data_pipeline_spark.operators.rangejoin import _floordiv_sql

    left = purchase_window_join_outer(events, watermark, window)
    bin_w = _interval_micros(window)
    ev_own = (
        events.select("event_id", "ts")
        .withWatermark("ts", watermark)
        .withColumn("_bin", F.expr(_floordiv_sql("unix_micros(ts)", bin_w)))
    )
    pur_adv = (
        events.where(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", watermark)
        .withColumn(
            "_bin",
            F.explode(
                F.array(
                    F.expr(_floordiv_sql("unix_micros(p_ts)", bin_w) + " - 1"),
                    F.expr(_floordiv_sql("unix_micros(p_ts)", bin_w)),
                )
            ),
        )
    )
    cond = F.expr(
        f"ev._bin = p._bin AND ts > p_ts - interval {window}"
        " AND ts <= p_ts AND event_id != purchase_id"
    )
    right_nulls = (
        ev_own.alias("ev")
        .join(pur_adv.alias("p"), cond, "left_outer")
        .where(F.col("purchase_id").isNull())
        .select("purchase_id", "event_id", "ts", "p_ts")
    )
    return left.unionByName(right_nulls)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState`` (SURVEY
    §2.10): per-user lifetime running totals (event count + value sum),
    emitted once per micro-batch per active user.

    This is the escape hatch for stateful semantics the built-in
    windowed aggregates can't express (cross-window lifetime state,
    custom eviction). State is one small tuple per user — bounded by
    |users|, not by stream length; pair with a timeout policy for
    unbounded key spaces.
    """
    from pyspark.sql.streaming.state import GroupState

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def session_close_stats(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Closed-session statistics via ``applyInPandasWithState`` with
    EVENT-TIME TIMEOUT eviction — the custom-state shape an unbounded
    key space needs at 100 TB: state for a quiet user is not merely
    unused, it is EVICTED (and its session emitted) once the watermark
    passes ``last_ts + gap``, so state size tracks ACTIVE users, not
    all users ever seen. ``running_user_totals`` next door shows the
    NoTimeout form; this is the production companion.

    Emits one row per CLOSED session: (user_id, session_start,
    session_end, n_events, total_value). A session closes either
    in-batch (a same-user event arrives more than ``gap`` later) or by
    timeout (watermark passes the open session's end + gap — the
    'user went quiet' signal no data-driven operator can give).

    Ordering caveat (documented contract, asserted by the batch-twin
    test): rows are processed in event-time order WITHIN each
    (micro-batch, user) group; an event older than a session already
    CLOSED in an earlier batch starts a new (late) session rather than
    reopening the emitted one — the standard at-watermark tradeoff.
    The built-in ``session_aggregate`` (F.session_window) handles
    within-watermark reordering natively; this operator exists for
    custom per-session state beyond what the built-in can carry.
    """
    from pyspark.sql.streaming.state import GroupState

    gap_us = _interval_micros(gap)

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        closed: list[tuple] = []
        if state.hasTimedOut:
            if state.exists:
                start_us, last_us, n, total = state.get
                closed.append((key[0], start_us, last_us, n, total))
            state.remove()
        else:
            cur = list(state.get) if state.exists else None
            rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
            # r13 (guide §4): one vectorized ns→µs conversion for the
            # whole batch instead of a pd.Timestamp object per row —
            # the loop itself is per-session state and stays.
            ts_us_all = (rows["ts"].astype("datetime64[ns]").astype("int64") // 1_000).tolist()
            for ts_us, value in zip(ts_us_all, rows["value"]):
                if cur is None:
                    cur = [ts_us, ts_us, 0, 0.0]
                elif ts_us - cur[1] > gap_us:
                    closed.append((key[0], cur[0], cur[1], cur[2], cur[3]))
                    cur = [ts_us, ts_us, 0, 0.0]
                cur[1] = max(cur[1], ts_us)
                cur[2] += 1
                cur[3] += float(value)
            state.update(tuple(cur))
            # evict when the watermark passes session end + gap; clamped
            # a tick past the current watermark (Spark rejects timeouts
            # at-or-before it — reachable when processing late rows)
            state.setTimeoutTimestamp(
                max((cur[1] + gap_us) // 1_000, state.getCurrentWatermarkMs() + 1)
            )
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": [pd.Timestamp(c[1] * 1_000) for c in closed],
                    "session_end": [pd.Timestamp(c[2] * 1_000) for c in closed],
                    "n_events": [c[3] for c in closed],
                    "total_value": [round(c[4], 2) for c in closed],
                }
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=(
                "user_id long, session_start timestamp, session_end timestamp,"
                " n_events long, total_value double"
            ),
            stateStructType="start_us long, last_us long, n long, total double",
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """``running_user_totals`` re-expressed on Spark 4's
    ``transformWithStateInPandas`` (the typed-state successor API to
    ``applyInPandasWithState``): the same per-user lifetime totals,
    but state lives in a named ValueState managed by the RocksDB state
    store — schema-evolvable, TTL-capable, with timers instead of a
    single timeout slot. Kept semantically identical to the legacy
    operator (equivalence-tested batch-for-batch) so the engine
    documents BOTH stateful surfaces; requires the RocksDB state store
    provider (set in the test/session conf — the API rejects the
    default HDFS-backed store).

    ENVIRONMENT SEAM: the new API's Python↔JVM state protocol imports
    ``google.protobuf``, which this container does not ship — the
    equivalence test importorskips on it (same gating policy as the
    image/audio decoder seams). On a cluster with protobuf present the
    operator runs as-is.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _Totals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", "n long, total double")

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            n, total = self._state.get() if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_Totals(),
        outputStructType="user_id long, n_events long, total_value double",
        outputMode="Update",
        timeMode="None",
    )


def enrich_with_dim(
    events: DataFrame, dim: DataFrame, on: str, how: str = "left"
) -> DataFrame:
    """Stream-static enrichment — the stateless join every streaming
    pipeline starts with (attach user tier / device class / geo to an
    event stream before any stateful work).

    Semantics worth pinning (tests/test_streaming.py):

    - The join is STATELESS: each micro-batch joins against the static
      side's CURRENT snapshot; no watermark is needed and no state
      store is created (unlike the stream-stream interval joins above).
    - Spark re-plans the static side per micro-batch, so a dim that is
      itself a lazily-read table reflects updates between batches; the
      broadcast below pins the intended physical shape (dim is the
      small side at any scale — the stream side must never build the
      hash table).
    - Stream-side rows without a dim match survive a LEFT join with
      NULLs (tested) — inner/left_semi/left_anti are the streaming-
      supported directions with a stream on the left; right/full are
      rejected by Spark's UnsupportedOperationChecker because the
      static side would need to emit unmatched rows at end-of-stream,
      which never comes.
    """
    from pyspark.sql import functions as F

    return events.join(F.broadcast(dim), on=on, how=how)
