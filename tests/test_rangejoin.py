"""Binned range joins (operators/rangejoin.py): exact agreement with
the naive theta join, exactly-once pair emission, floor correctness on
negative values, fail-fast guard, and the plan discipline the operator
exists for — the binned path must be an equi-join (no
BroadcastNestedLoopJoin / CartesianProduct), while the naive control
demonstrably is not.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.operators.rangejoin import (
    interval_overlap_join,
    point_in_interval_join,
)


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def pi_data(spark):
    # points straddle bin boundaries, negatives, and exact endpoints
    points = spark.createDataFrame(
        [(i, v) for i, v in enumerate([-250, -100, -1, 0, 1, 99, 100, 101, 250, 999, 1000])],
        "pid long, p long",
    )
    intervals = spark.createDataFrame(
        [
            (0, -300, -50),   # negative span
            (1, -100, 100),   # crosses zero
            (2, 0, 0),        # degenerate single point
            (3, 100, 250),    # endpoints on bin boundaries
            (4, 150, 1500),   # spans many bins
            (5, 2000, 3000),  # matches nothing
        ],
        "iid long, lo long, hi long",
    )
    return points, intervals


def _naive_pairs(points, intervals, closed="both"):
    p, lo, hi = F.col("p"), F.col("lo"), F.col("hi")
    pred = {
        "both": (p >= lo) & (p <= hi),
        "left": (p >= lo) & (p < hi),
        "right": (p > lo) & (p <= hi),
        "neither": (p > lo) & (p < hi),
    }[closed]
    return {(r.pid, r.iid) for r in points.crossJoin(intervals).where(pred).collect()}


@pytest.mark.parametrize("closed", ["both", "left", "right", "neither"])
@pytest.mark.parametrize("bin_width", [7, 100, 1000])
def test_point_in_interval_matches_naive(spark, pi_data, closed, bin_width):
    points, intervals = pi_data
    out = point_in_interval_join(
        points, intervals, "p", "lo", "hi", bin_width=bin_width, closed=closed
    )
    rows = [(r.pid, r.iid) for r in out.collect()]
    assert len(rows) == len(set(rows)), "duplicate (point, interval) emission"
    assert set(rows) == _naive_pairs(points, intervals, closed)


def test_overlap_join_matches_naive(spark):
    a = spark.createDataFrame(
        [(0, -500, -400), (1, -50, 49), (2, 0, 1000), (3, 300, 310), (4, 5000, 5001)],
        "aid long, alo long, ahi long",
    )
    b = spark.createDataFrame(
        [(0, -450, -450), (1, 40, 60), (2, 100, 2000), (3, -1000, 7000), (4, 311, 312)],
        "bid long, blo long, bhi long",
    )
    for w in (7, 100, 1000):
        out = interval_overlap_join(a, b, ("alo", "ahi"), ("blo", "bhi"), bin_width=w)
        rows = [(r.aid, r.bid) for r in out.collect()]
        assert len(rows) == len(set(rows)), f"duplicate pair at bin_width={w}"
        naive = {
            (r.aid, r.bid)
            for r in a.crossJoin(b)
            .where((F.col("alo") <= F.col("bhi")) & (F.col("blo") <= F.col("ahi")))
            .collect()
        }
        assert set(rows) == naive


def test_equi_keys_scope_matches(spark):
    points = spark.createDataFrame(
        [(1, "u1", 50), (2, "u2", 50)], "pid long, user string, p long"
    )
    intervals = spark.createDataFrame(
        [(10, "u1", 0, 100)], "iid long, user string, lo long, hi long"
    )
    out = point_in_interval_join(
        points, intervals, "p", "lo", "hi", bin_width=64, equi_keys=("user",)
    )
    assert [(r.pid, r.iid) for r in out.collect()] == [(1, 10)]


def test_binned_plan_is_equi_join_naive_is_not(spark, pi_data):
    points, intervals = pi_data
    binned = point_in_interval_join(points, intervals, "p", "lo", "hi", bin_width=100)
    plan = plan_of(binned)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    naive = points.join(
        intervals, (F.col("p") >= F.col("lo")) & (F.col("p") <= F.col("hi"))
    )
    naive_plan = plan_of(naive)
    assert "BroadcastNestedLoopJoin" in naive_plan or "CartesianProduct" in naive_plan


def test_runaway_interval_fails_fast(spark):
    points = spark.createDataFrame([(1, 5)], "pid long, p long")
    intervals = spark.createDataFrame([(1, 0, 10_000_000)], "iid long, lo long, hi long")
    out = point_in_interval_join(
        points, intervals, "p", "lo", "hi", bin_width=10, max_bins_per_interval=1000
    )
    with pytest.raises(Exception, match="rangejoin|USER_RAISED"):
        out.collect()


def test_events_window_count_plan_and_shape(spark):
    """The staged range-join query: equi-join plan (no BNLJ/Cartesian),
    and every purchase appears exactly once (zeros kept)."""
    from spotify_data_pipeline_spark.plans.roundfour import (
        events_window_count_query,
    )

    df = events_window_count_query(spark, "/root/testdata/sf0.001")
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    rows = df.collect()
    n_purch = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .where(F.col("event_type") == "purchase")
        .count()
    )
    assert len(rows) == n_purch
    assert len({r.purchase_id for r in rows}) == n_purch


def test_suggest_bin_width_covers_p99(spark):
    from spotify_data_pipeline_spark.operators.rangejoin import suggest_bin_width

    # 990 short intervals (len ~100) + 10 outliers (len 100_000)
    rows = [(i, i * 1000, i * 1000 + 99) for i in range(990)]
    rows += [(1000 + i, 0, 99_999) for i in range(10)]
    iv = spark.createDataFrame(rows, "iid long, lo long, hi long")
    w = suggest_bin_width(iv, "lo", "hi")
    # must cover the typical interval (>=100) without being dragged to
    # the outlier scale
    assert 100 <= w < 10_000

    # and the suggested width keeps the join correct
    points = spark.createDataFrame([(1, 500), (2, 50)], "pid long, p long")
    out = point_in_interval_join(points, iv, "p", "lo", "hi", bin_width=w)
    naive = points.crossJoin(iv).where(
        (F.col("p") >= F.col("lo")) & (F.col("p") <= F.col("hi"))
    )
    assert {(r.pid, r.iid) for r in out.collect()} == {
        (r.pid, r.iid) for r in naive.collect()
    }


def test_suggest_bin_width_covers_p99_for_any_sub_bits(spark):
    """ADVICE r03: the upper-edge bump must use the SAME sub_bits as
    the sketch build — for each setting, the suggested width must
    cover the p99 interval length."""
    from pyspark.sql import functions as F

    from spotify_data_pipeline_spark.operators.rangejoin import suggest_bin_width

    iv = spark.range(1000).select(
        F.col("id").alias("lo"), (F.col("id") + 5000).alias("hi")
    )
    for sb in (2, 3, 5):
        w = suggest_bin_width(iv, "lo", "hi", q=0.99, sub_bits=sb)
        assert w >= 5001, (sb, w)
