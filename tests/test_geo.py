"""Geo radius join (operators/geo.py): wrapped-grid candidates + exact
haversine verify, pinned against brute force and the classic
coordinate edge cases."""

from __future__ import annotations

import itertools
import math

import pytest
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.operators.geo import geo_neighbor_pairs


def _hav(a, b):
    R = 6371.0088
    la1, lo1, la2, lo2 = map(math.radians, (a[0], a[1], b[0], b[1]))
    x = (
        math.sin((la2 - la1) / 2) ** 2
        + math.cos(la1) * math.cos(la2) * math.sin((lo2 - lo1) / 2) ** 2
    )
    return 2 * R * math.asin(math.sqrt(x))


def _brute(rows, radius):
    return {
        (a[0], b[0])
        for a, b in itertools.combinations(sorted(rows), 2)
        if round(_hav(a[1:], b[1:]), 3) <= radius
    }


def _run(spark, rows, radius, **kw):
    df = spark.createDataFrame(rows, "id long, lat double, lon double")
    return {
        (r.id_a, r.id_b)
        for r in geo_neighbor_pairs(df, "id", "lat", "lon", radius, **kw).collect()
    }


def test_known_distances(spark):
    rows = [
        (1, 0.0, 0.0),
        (2, 1.0, 0.0),     # ~111.2 km due north
        (3, 0.0, 1.0),     # ~111.32 km due east
        (4, 10.0, 10.0),   # far
    ]
    got = _run(spark, rows, 150.0)
    assert got == {(1, 2), (1, 3)}


def test_dateline_wrap_pair_found(spark):
    rows = [(1, -27.0, -179.9), (2, -27.2, 179.9), (3, -27.0, 170.0)]
    got = _run(spark, rows, 100.0)
    assert (1, 2) in got          # 0.2° apart across the seam
    assert not any(3 in p for p in got)


def test_matches_brute_force_scatter(spark):
    rows = [
        (k, float((k * 79) % 120 - 60) + 0.01 * k, float((k * k) % 360 - 180) + 0.003 * k)
        for k in range(1, 120)
    ]
    assert _run(spark, rows, 300.0) == _brute(rows, 300.0)


def test_polar_latitude_fails_in_plan(spark):
    rows = [(1, 75.0, 0.0), (2, 10.0, 0.0)]
    with pytest.raises(Exception) as ei:
        _run(spark, rows, 100.0)  # default max_abs_lat=60
    assert "outside the flat-grid domain" in str(ei.value)
    # raising the domain bound accepts the same data
    assert _run(spark, rows, 100.0, max_abs_lat=80.0) == set()


def test_plan_no_cartesian(spark):
    df = spark.createDataFrame([(1, 0.0, 0.0), (2, 1.0, 1.0)], "id long, lat double, lon double")
    plan = (
        geo_neighbor_pairs(df, "id", "lat", "lon", 100.0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@given(
    pts=st.lists(
        st.tuples(
            st.integers(-5900, 5900),   # lat in 0.01-degree ticks
            st.integers(-18000, 17999),  # lon in 0.01-degree ticks
        ),
        min_size=0,
        max_size=25,
        unique=True,
    ),
    radius=st.sampled_from([50.0, 500.0, 3000.0]),
)
@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_matches_brute_force_hypothesis(spark, pts, radius):
    """Random global scatters at three radii (including one where the
    lon cell ring is coarse) — candidate generation must never miss a
    brute-force pair."""
    rows = [(i, la / 100.0, lo / 100.0) for i, (la, lo) in enumerate(pts)]
    assert _run(spark, rows, radius) == _brute(rows, radius)
