"""Bucketed-table co-located joins (operators/bucketing.py): the
write-once-shuffle, join-many-times-free storage layout. Asserts the
physical plans, not just results — the point of bucketing IS the plan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.io import load_table
from spotify_data_pipeline_spark.operators.bucketing import (
    _no_broadcast,
    bucketed_join,
    join_is_exchange_free,
    write_bucketed,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    lineitem = load_table(spark, SF, "lineitem")
    orders = load_table(spark, SF, "orders")
    write_bucketed(
        lineitem, "wh_lineitem_b", "l_orderkey", 8, sort_cols=["l_orderkey"]
    )
    write_bucketed(orders, "wh_orders_b", "o_orderkey", 8, sort_cols=["o_orderkey"])
    yield "wh_lineitem_b", "wh_orders_b"
    spark.sql("DROP TABLE IF EXISTS wh_lineitem_b")
    spark.sql("DROP TABLE IF EXISTS wh_orders_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    with _no_broadcast(spark):
        joined = bucketed_join(spark, left, right, "l_orderkey", "o_orderkey")
        assert join_is_exchange_free(joined), (
            "bucketed join should not shuffle:\n"
            + joined._jdf.queryExecution().executedPlan().toString()
        )


def test_unbucketed_join_does_shuffle(spark):
    """Control: the same join off the raw parquet HAS an Exchange —
    proves the assertion above is detecting bucketing, not vacuous."""
    lineitem = load_table(spark, SF, "lineitem")
    orders = load_table(spark, SF, "orders")
    with _no_broadcast(spark):
        joined = lineitem.join(
            orders, lineitem["l_orderkey"] == orders["o_orderkey"]
        )
        assert not join_is_exchange_free(joined)


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    left, right = bucketed_tables
    lineitem = load_table(spark, SF, "lineitem")
    orders = load_table(spark, SF, "orders")
    with _no_broadcast(spark):
        got = (
            bucketed_join(spark, left, right, "l_orderkey", "o_orderkey")
            .groupBy()
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("l_quantity")).alias("q"),
            )
            .collect()[0]
        )
    want = (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .groupBy()
        .agg(F.count("*").alias("n"), F.sum(F.col("l_quantity")).alias("q"))
        .collect()[0]
    )
    assert got["n"] == want["n"] and got["q"] == want["q"]


def test_bucket_key_aggregation_has_no_exchange(spark, bucketed_tables):
    """Aggregation on the bucket key also rides the pre-placed layout —
    the second big win of paying the shuffle at write time."""
    left, _ = bucketed_tables
    agg = (
        spark.table(left)
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    assert join_is_exchange_free(agg), (
        "bucket-key aggregation should not shuffle:\n"
        + agg._jdf.queryExecution().executedPlan().toString()
    )
