"""Round-17 staging area (plans/roundseventeen_pending.py): the
product-metric quartet — driver-shaped oracle checks plus semantic
pins."""

from __future__ import annotations

import os

import pytest

from spotify_data_pipeline_spark.plans.roundseventeen_pending import PENDING
from tests.oracle_check import compare, run_oracle

SF_DIR = os.environ.get("ORACLE_SF", "/root/testdata/sf0.001")


@pytest.mark.parametrize("pq", PENDING, ids=lambda pq: pq.name)
def test_pending_oracle_match(spark, pq):
    result = pq.fn(spark, SF_DIR)
    oracle = run_oracle(pq.oracle, SF_DIR)
    errs = compare(result, oracle)
    assert not errs, f"{pq.name}: " + "; ".join(errs)
    assert len(oracle) > 0, f"{pq.name}: vacuous (0 oracle rows) at {SF_DIR}"


def test_pending_registered(spark):
    """Round-9 activated the whole module (window positions 36-39)."""
    from spotify_data_pipeline_spark.plans import all_queries
    from spotify_data_pipeline_spark.plans.active import R17_ACTIVATED

    qs = all_queries()
    assert set(R17_ACTIVATED) == {pq.name for pq in PENDING}
    for pq in PENDING:
        assert pq.name in qs and qs[pq.name].fn is pq.fn
        assert qs[pq.name].oracle == pq.oracle


def test_pending_names_unique_and_oracle_bearing():
    names = [pq.name for pq in PENDING]
    assert len(names) == len(set(names))
    assert all(pq.oracle for pq in PENDING)


def _plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# 1-row min/max-day bounds broadcast (the anchor precedent)
_BNLJ_OK = {"events_dau_wau_stickiness"}


@pytest.mark.parametrize("pq", PENDING, ids=lambda pq: pq.name)
def test_plans_no_unexpected_nested_loop(spark, pq):
    plan = _plan_of(pq.fn(spark, SF_DIR))
    if pq.name in _BNLJ_OK:
        return
    assert "BroadcastNestedLoopJoin" not in plan, pq.name
    assert "CartesianProduct" not in plan, pq.name


def test_stickiness_bounds_and_python_recount(spark):
    """DAU <= WAU always (ratio <= 1M ppm), and one sampled day's WAU
    equals a pure-Python recount of distinct users over its trailing 7
    days."""
    from spotify_data_pipeline_spark.io import load_table
    from spotify_data_pipeline_spark.plans.roundseventeen_pending import (
        events_dau_wau_stickiness_query,
    )

    rows = events_dau_wau_stickiness_query(spark, SF_DIR).collect()
    assert rows
    assert all(r.dau <= r.wau and 0 < r.stickiness_ppm <= 1_000_000 for r in rows)

    import datetime as dt

    ud = {
        (r[0], r[1])
        for r in load_table(spark, SF_DIR, "events")
        .selectExpr("user_id", "CAST(ts AS DATE) AS day")
        .distinct()
        .collect()
    }
    mid = rows[len(rows) // 2]
    day = dt.date.fromisoformat(mid.day)
    window = {day - dt.timedelta(days=i) for i in range(7)}
    wau = len({u for (u, d) in ud if d in window})
    dau = len({u for (u, d) in ud if d == day})
    assert (mid.dau, mid.wau) == (dau, wau)


def test_order_size_ppms_account_everything(spark):
    from spotify_data_pipeline_spark.plans.roundseventeen_pending import (
        orders_order_size_distribution_query,
    )

    rows = orders_order_size_distribution_query(spark, SF_DIR).collect()
    assert rows
    assert sum(r.orders_ppm for r in rows) <= 1_000_000
    assert sum(r.orders_ppm for r in rows) > 1_000_000 - len(rows)
    assert sum(r.revenue_ppm for r in rows) <= 1_000_000
    sizes = [r.n_lines for r in rows]
    assert sizes == sorted(sizes) and min(sizes) >= 1


def test_discount_profile_identity(spark):
    """realized share falls as the discount band rises, and the 0%
    band gives back nothing."""
    from spotify_data_pipeline_spark.plans.roundseventeen_pending import (
        lineitem_discount_profile_query,
    )

    rows = lineitem_discount_profile_query(spark, SF_DIR).collect()
    by_band = {r.discount_pct: r for r in rows}
    assert 0 in by_band and by_band[0].discount_cents == 0
    assert by_band[0].realized_ppm == 1_000_000
    ppms = [r.realized_ppm for r in rows]  # rows ordered by band
    assert ppms == sorted(ppms, reverse=True)
    for r in rows:
        assert 0 <= r.discount_cents <= r.gross_cents


def test_priority_mix_shift_reconciles(spark):
    """Per month the shares sum to ~1M; per priority the shift column
    equals the difference of consecutive months' shares (recounted in
    Python); first month shifts are 0."""
    from spotify_data_pipeline_spark.plans.roundseventeen_pending import (
        orders_priority_mix_shift_query,
    )

    rows = orders_priority_mix_shift_query(spark, SF_DIR).collect()
    assert rows
    by_month = {}
    share = {}
    for r in rows:
        by_month.setdefault(r.month_idx, []).append(r.share_ppm)
        share[(r.o_orderpriority, r.month_idx)] = r.share_ppm
    for m, ppms in by_month.items():
        assert sum(ppms) <= 1_000_000 and sum(ppms) > 1_000_000 - len(ppms), m
    first_month = min(by_month)
    for r in rows:
        prev = share.get((r.o_orderpriority, r.month_idx - 1))
        expect = (r.share_ppm - prev) if prev is not None else 0
        assert r.mom_shift_ppm == expect, (r.o_orderpriority, r.month_idx)
        if r.month_idx == first_month:
            assert r.mom_shift_ppm == 0
