"""operators/allocation.py — largest-remainder allocation: exact-sum
and quota invariants, pinned directly and by hypothesis."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spotify_data_pipeline_spark.operators.allocation import (
    largest_remainder_allocation,
)


def _alloc(spark, weights, budget):
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(weights)], "k long, w long"
    )
    rows = largest_remainder_allocation(df, "k", "w", budget).collect()
    return {r.k: r.alloc for r in rows}


def test_sums_exactly_and_quota(spark):
    weights = [3, 3, 3]  # 100/3 each — the textbook drift case
    got = _alloc(spark, weights, 100)
    assert sum(got.values()) == 100
    # quota: every part is floor(ideal) or ceil(ideal); ideal = 33.33
    assert sorted(got.values()) == [33, 33, 34]
    # deterministic tiebreak: equal remainders -> smallest key gets +1
    assert got[0] == 34


def test_zero_weight_groups_get_zero_unless_remainder(spark):
    got = _alloc(spark, [10, 0, 10], 21)
    assert sum(got.values()) == 21
    assert got[1] == 0  # rem of a 0-weight row is 0 — never ranked first


def test_budget_smaller_than_groups(spark):
    got = _alloc(spark, [1, 1, 1, 1, 1], 2)
    assert sum(got.values()) == 2
    assert sorted(got.values()) == [0, 0, 0, 1, 1]


def test_negative_budget_raises(spark):
    df = spark.createDataFrame([(1, 1)], "k long, w long")
    with pytest.raises(ValueError):
        largest_remainder_allocation(df, "k", "w", -1)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    weights=st.lists(st.integers(0, 10_000), min_size=1, max_size=12).filter(
        lambda ws: sum(ws) > 0
    ),
    budget=st.integers(0, 1_000_000),
)
def test_invariants_hold(spark, weights, budget):
    got = _alloc(spark, weights, budget)
    total = sum(weights)
    assert sum(got.values()) == budget
    for i, w in enumerate(weights):
        ideal = budget * w / total
        assert got[i] in (math.floor(ideal), math.ceil(ideal))


# ---- per-group variant -------------------------------------------------


def _alloc_groups(spark, groups):
    """groups: {g: (budget, [w0, w1, ...])} -> {g: {k: alloc}}"""
    from spotify_data_pipeline_spark.operators.allocation import (
        largest_remainder_allocation_per_group,
    )

    rows = [
        (g, i, w, budget)
        for g, (budget, ws) in groups.items()
        for i, w in enumerate(ws)
    ]
    df = spark.createDataFrame(rows, "g long, k long, w long, b long")
    out = largest_remainder_allocation_per_group(df, "g", "k", "w", "b").collect()
    res: dict = {}
    for r in out:
        res.setdefault(r.g, {})[r.k] = r.alloc
    return res


def test_per_group_sums_and_quota(spark):
    groups = {1: (100, [3, 3, 3]), 2: (21, [10, 0, 10]), 3: (7, [1])}
    got = _alloc_groups(spark, groups)
    for g, (budget, ws) in groups.items():
        assert sum(got[g].values()) == budget, g
        total = sum(ws)
        for i, w in enumerate(ws):
            ideal = budget * w / total
            assert got[g][i] in (math.floor(ideal), math.ceil(ideal)), (g, i)
    # the global form's deterministic tiebreak carries over per group
    assert got[1][0] == 34


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.dictionaries(
        st.integers(0, 5),
        st.tuples(
            st.integers(0, 100_000),
            st.lists(st.integers(0, 1_000), min_size=1, max_size=6).filter(
                lambda ws: sum(ws) > 0
            ),
        ),
        min_size=1,
        max_size=4,
    )
)
def test_per_group_invariants_hold(spark, data):
    got = _alloc_groups(spark, data)
    for g, (budget, ws) in data.items():
        assert sum(got[g].values()) == budget
        total = sum(ws)
        for i, w in enumerate(ws):
            ideal = budget * w / total
            assert got[g][i] in (math.floor(ideal), math.ceil(ideal))
