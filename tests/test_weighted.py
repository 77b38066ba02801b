"""Systematic PPS sampling (operators/weighted.py): integer-exact
weight-proportional selection, pinned against an independent Python
model plus its structural invariants."""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.operators.weighted import pps_systematic_sample


def _model(rows, k, seed):
    order = sorted(
        [(i, w) for i, w in rows if w > 0],
        key=lambda t: (hashlib.md5(f"{seed}:{t[0]}".encode()).hexdigest(), t[0]),
    )
    total = sum(w for _, w in order)

    def cnt(x):
        return 0 if 2 * k * x < total else min(k, (2 * k * x - total) // (2 * total) + 1)

    want, c = {}, 0
    for i, w in order:
        p, c = c, c + w
        n = cnt(c) - cnt(p)
        if n >= 1:
            want[i] = (w, n)
    return want


def _run(spark, rows, k, seed, **kw):
    df = spark.createDataFrame(rows, "id long, w long")
    return {
        r.id: (r.weight, r.n_picks)
        for r in pps_systematic_sample(df, "id", "w", k, seed, **kw).collect()
    }


@given(
    weights=st.lists(st.integers(0, 10**6), min_size=1, max_size=25),
    k=st.sampled_from([1, 3, 10]),
    seed=st.sampled_from([0, 7]),
)
@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_matches_python_model(spark, weights, k, seed):
    rows = [(i, w) for i, w in enumerate(weights)]
    if not any(w > 0 for w in weights):
        return  # empty line: nothing to sample
    got = _run(spark, rows, k, seed)
    want = _model(rows, k, seed)
    assert got == want
    assert sum(n for _, n in got.values()) == k  # exactly k picks, always


def test_heavy_row_gets_multiplicity(spark):
    """A row heavier than W/k must be picked more than once — the
    mixture-repeat semantics."""
    rows = [(1, 1000), (2, 1), (3, 1), (4, 1)]
    got = _run(spark, rows, 5, 7)
    assert got[1][1] >= 4  # ~1000/1003 of the mass, 5 picks


def test_scalable_variant_identical(spark):
    rows = [(i, (i * 37) % 100 + 1) for i in range(200)]
    assert _run(spark, rows, 17, 3) == _run(spark, rows, 17, 3, scalable=True)


def test_negative_weight_fails_in_plan(spark):
    df = spark.createDataFrame([(1, 5), (2, -1)], "id long, w long")
    with pytest.raises(Exception) as ei:
        pps_systematic_sample(df, "id", "w", 2, 0).collect()
    assert "negative weight" in str(ei.value)


def test_expected_inclusion_proportional(spark):
    """Across seeds, pick frequency tracks weight: the heaviest row is
    picked in every seed, a 1% row only occasionally."""
    rows = [(1, 900), (2, 50), (3, 25), (4, 25)]
    hits = {i: 0 for i, _ in rows}
    for seed in range(8):
        got = _run(spark, rows, 4, seed)
        for i, (_, n) in got.items():
            hits[i] += n
    assert hits[1] >= 8 * 3  # ≥3 of 4 picks every time (w/W = 0.9 ⇒ ⌊3.6⌋)
    assert hits[2] < hits[1]
