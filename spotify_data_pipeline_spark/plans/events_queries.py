"""Declared event-stream queries in *batch* mode (SURVEY.md §2.10).

The reference has no streaming — its incrementality is daily macro-
batch. The engine exposes real Structured Streaming pipelines in
``streaming/events.py``; the SAME window semantics are declared here as
batch queries over the events table so the DuckDB oracle can hash-check
them (`F.window` works on static DataFrames; DuckDB `time_bucket` is the
oracle — SURVEY §2.10 "batch analogs").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.io import load_table
from spotify_data_pipeline_spark.plans.parity import rnd
from spotify_data_pipeline_spark.plans.registry import declare


@declare(
    "events_tumbling_window",
    oracle="""
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           floor((sum(value)) * 100 + 0.5) / 100 AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    headline=True,
    tags=("events", "window"),
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute window aggregate per event type."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), rnd(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value"
        )
    )


@declare(
    "events_sliding_window",
    oracle="""
    SELECT time_bucket(INTERVAL '5 minutes', ts) - to_minutes(off.m) AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events
    CROSS JOIN (VALUES (0), (5)) off(m)
    GROUP BY 1, 2
    """,
    tags=("events", "window"),
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window: 10-minute length, 5-minute slide. Every event
    falls in exactly two windows — the DuckDB oracle materializes the
    same assignment by unioning two offset bucketings."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


@declare(
    "events_sessionization",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '30 minutes'
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM events
    ), sessioned AS (
      SELECT user_id, ts, event_id,
             sum(is_start) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      FROM marked
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           min(ts) AS session_start, max(ts) AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM sessioned
    GROUP BY user_id, session_seq
    """,
    tags=("events", "session"),
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: 30-minute inactivity gap splits sessions.
    lag + cumulative-sum-of-starts — the classic two-window plan; both
    windows share the same (user_id, ts) shuffle so Spark plans ONE
    exchange. Streaming twin: session_window in streaming/events.py."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    marked = ev.withColumn(
        "is_start", F.when(gap.isNull() | (gap > 30 * 60), 1).otherwise(0)
    )
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sessioned = marked.withColumn("session_seq", F.sum("is_start").over(cum).cast("long"))
    return sessioned.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
    )


@declare(
    "events_json_extract",
    oracle="""
    SELECT event_type,
           floor((avg(CAST(json_extract_string(props, '$.k') AS BIGINT))) * 100 + 0.5) / 100 AS avg_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    GROUP BY event_type
    """,
    tags=("events", "json"),
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-path extraction from the props string column (SURVEY §2.9 F5:
    the reference json-decodes whole blobs; the engine exposes
    get_json_object for field-level access)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        rnd(F.avg(k), 2).alias("avg_k"),
        F.max(k).cast("long").alias("max_k"),
    )


@declare(
    "events_asof_join",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id AS user_id, p.ts AS purchase_ts,
           c.last_click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN LATERAL (
      SELECT max(ts) AS last_click_ts
      FROM events c
      WHERE c.event_type = 'click' AND c.user_id = p.user_id AND c.ts <= p.ts
    ) c ON TRUE
    """,
    headline=True,
    tags=("events", "asof", "join"),
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (SURVEY §2.3 J6): for each purchase, the most recent
    click by the same user at-or-before the purchase. Implemented with
    the union+running-last operator (one shuffle on user_id, linear) —
    see operators/asof.py.
    """
    from spotify_data_pipeline_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts")
    joined = asof_join(purchases, clicks, on="ts", by="user_id", value_cols=[])
    return joined.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("ts_right").alias("last_click_ts"),
    )


@declare(
    "events_props_map",
    oracle="""
    SELECT event_id,
           array_to_string(json_keys(props), ',') AS prop_keys,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
           CAST(len(json_keys(props)) AS BIGINT) AS n_props
    FROM events
    """,
    tags=("events", "map", "json"),
)
def events_props_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type function surface (SURVEY §2.9 F8: map_keys / element_at /
    size) over the JSON props column parsed into map<string,bigint>."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return ev.select(
        "event_id",
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("prop_keys"),
        F.element_at(m, "k").alias("k_value"),
        F.size(F.map_keys(m)).cast("long").alias("n_props"),
    )
