"""Skew-mitigation equivalence tests: salted plans must produce exactly
the plain plans' results on a pathologically skewed fixture."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.operators.skew import salted_aggregate, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    """99% of rows share one hot key."""
    hot = spark.range(50_000).select(
        F.lit(7).alias("k"), (F.col("id") % 100).cast("double").alias("v")
    )
    cold = spark.range(500).select(
        (F.col("id") % 50).alias("k"), F.col("id").cast("double").alias("v")
    )
    return hot.unionByName(cold)


def test_salted_aggregate_matches_plain(spark, skewed):
    plain = {
        (r.k): (r.total, r.n, r.mn, r.mx)
        for r in skewed.groupBy("k")
        .agg(
            F.sum("v").alias("total"),
            F.count("v").alias("n"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r.k): (r.total, r.n, r.mn, r.mx)
        for r in salted_aggregate(
            skewed,
            ["k"],
            {
                "total": ("sum", "v"),
                "n": ("count", "v"),
                "mn": ("min", "v"),
                "mx": ("max", "v"),
            },
            salt_factor=8,
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.range(60).select(
        F.col("id").alias("k"), F.concat(F.lit("name_"), F.col("id")).alias("k_name")
    )
    plain = (
        skewed.join(dim, "k")
        .groupBy("k", "k_name")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
    )
    salted = (
        salted_join(skewed, dim, "k", salt_factor=8)
        .groupBy("k", "k_name")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
    )
    a = {(r.k, r.k_name): (r.n, r.s) for r in plain.collect()}
    b = {(r.k, r.k_name): (r.n, r.s) for r in salted.collect()}
    assert a == b


def test_salted_join_left_keeps_unmatched(spark, skewed):
    dim = spark.range(5).select(F.col("id").alias("k"), F.lit("x").alias("k_name"))
    plain = skewed.join(dim, "k", "left").count()
    salted = salted_join(skewed, dim, "k", salt_factor=4, how="left").count()
    assert plain == salted


def test_salted_join_rejects_unsupported_how(spark, skewed):
    import pytest

    dim = spark.range(5).select(F.col("id").alias("k"), F.lit("x").alias("k_name"))
    for how in ("right", "full", "left_semi", "left_anti"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(skewed, dim, "k", salt_factor=4, how=how)


def test_aqe_skew_join_engages_on_hot_partition(spark):
    """The session config promises AQE skew-join handling
    (session.py: spark.sql.adaptive.skewJoin.enabled) — prove it
    actually ENGAGES: a 90%-hot-key join, with the detector thresholds
    lowered to toy scale, must carry skew=true in the FINALIZED
    adaptive plan (driven via this DataFrame's own execution — noop
    writes execute a clone and never finalize it). The result stays
    exact: hot key contributes 0, the 20 cold keys 5000·2k each."""
    from pyspark.sql import functions as F

    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        big = spark.range(1_000_000).select(
            (F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 200)).alias("k"),
            F.col("id").alias("v"),
        )
        dim = spark.range(200).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        agg = big.join(dim, "k").agg(F.sum("w").alias("s"))
        assert agg.collect()[0].s == 20_800_000
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, "AQE skew-join did not engage"
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
