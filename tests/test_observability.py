"""observe()-based zero-extra-scan metrics (operators/observability.py)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Observation
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from spotify_data_pipeline_spark.io import load_table
from spotify_data_pipeline_spark.operators.observability import observed_quality

SF_DIR = os.environ.get("ORACLE_SF", "/root/testdata/sf0.001")


def test_metrics_ride_the_existing_action(spark):
    """One action produces both the query result AND the metrics; the
    metric values match a dedicated aggregation job exactly."""
    ev = load_table(spark, SF_DIR, "events")
    observed, obs = observed_quality(ev, "value")
    # the caller's own job: rows per type (the action that pays for
    # the metrics)
    result = observed.groupBy("event_type").count().collect()
    assert result
    got = obs.get
    expect = ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("value").isNull().cast("long")).alias("n_null"),
        F.min("value").alias("min"),
        F.max("value").alias("max"),
    ).collect()[0]
    assert got["n_rows"] == expect["n_rows"]
    assert got["n_null"] == expect["n_null"]
    assert got["min"] == expect["min"]
    assert got["max"] == expect["max"]


def test_extra_named_aggregates(spark):
    ev = load_table(spark, SF_DIR, "events")
    observed, obs = observed_quality(
        ev,
        "value",
        extra={
            "n_purchases": F.sum((F.col("event_type") == "purchase").cast("long")),
            "n_users_approx": F.approx_count_distinct("user_id"),
        },
    )
    observed.count()
    got = obs.get
    assert got["n_purchases"] == ev.where(F.col("event_type") == "purchase").count()
    assert got["n_users_approx"] > 0


def test_extra_name_collision_rejected(spark):
    """An extra named like a default metric would silently drop one of
    the two aggregates from the Observation dict — must raise
    (VERDICT r07 item 5, landed once the module left every evidence
    closure)."""
    ev = load_table(spark, SF_DIR, "events")
    with pytest.raises(ValueError, match="collide"):
        observed_quality(ev, "value", extra={"n_rows": F.count(F.lit(1))})
    with pytest.raises(ValueError, match="collide"):
        observed_quality(
            ev,
            "value",
            extra={"max": F.max("value"), "n_ok": F.count(F.lit(1))},
        )


def test_distinct_aggregates_rejected(spark):
    """Pinned Spark contract: CollectMetrics forbids DISTINCT
    aggregates (INVALID_OBSERVED_METRICS...DISTINCT_UNSUPPORTED) — the
    sketch-backed approx_count_distinct is the supported spelling, the
    same exact-vs-mergeable tradeoff as the engine's HLL/KMV sketches."""
    ev = load_table(spark, SF_DIR, "events")
    with pytest.raises(Exception, match="DISTINCT"):
        observed, obs = observed_quality(
            ev, "value", extra={"n_users": F.countDistinct("user_id")}
        )
        observed.count()


def test_non_aggregate_metric_fails_loudly(spark):
    ev = load_table(spark, SF_DIR, "events")
    obs = Observation()
    with pytest.raises(Exception):  # Spark raises AnalysisException
        df = ev.observe(obs, F.col("value") + 1)
        df.count()


def test_observation_is_single_use(spark):
    """Spark ties an Observation to one plan — reusing it on a second
    DataFrame must fail rather than silently mix metrics."""
    ev = load_table(spark, SF_DIR, "events")
    observed, obs = observed_quality(ev, "value")
    observed.count()
    with pytest.raises(Exception):
        ev.limit(5).observe(obs, F.count(F.lit(1)).alias("n"))
