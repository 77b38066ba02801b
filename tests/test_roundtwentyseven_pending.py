"""Round-27 staging area (plans/roundtwentyseven_pending.py): the
objective-plumbing wave — driver-shaped oracle checks, plan hygiene,
and pure-Python recounts (span layout replay with the budget law,
randomized-response estimator algebra, funnel sweep with window
monotonicity)."""

from __future__ import annotations

import hashlib
import os

import pytest

from spotify_data_pipeline_spark.plans.roundtwentyseven_pending import (
    _FW_HOURS,
    _RR_FLIP_MOD,
    _RR_SENSITIVE_MOD,
    _SC_LEN_MOD,
    _SC_MAX_REACH,
    _SC_START_MOD,
    PENDING,
)
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
    """Round-10 activated the whole module (plans/active.py,
    NOTES_r09 §9 order)."""
    from spotify_data_pipeline_spark.plans import all_queries
    from spotify_data_pipeline_spark.plans.active import R27_ACTIVATED

    qs = all_queries()
    assert set(R27_ACTIVATED) == {pq.name for pq in PENDING}
    for pq in PENDING:
        assert pq.name in qs and qs[pq.name].fn is pq.fn
        assert qs[pq.name].oracle == pq.oracle


def test_pending_names_unique_and_oracle_bearing():
    names = [pq.name for pq in PENDING]
    assert len(names) == len(set(names))
    assert all(pq.oracle for pq in PENDING)
    import importlib

    for mod in (
        "roundtwentyone_pending",
        "roundtwentytwo_pending",
        "roundtwentythree_pending",
        "roundtwentyfour_pending",
        "roundtwentyfive_pending",
        "roundtwentysix_pending",
    ):
        earlier = importlib.import_module(
            f"spotify_data_pipeline_spark.plans.{mod}"
        ).PENDING
        assert not set(names) & {pq.name for pq in earlier}


def _plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("pq", PENDING, ids=lambda pq: pq.name)
def test_plans_no_unexpected_nested_loop(spark, pq):
    plan = _plan_of(pq.fn(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan, pq.name
    assert "CartesianProduct" not in plan, pq.name


# ---------------------------------------------------------------------------
# recounts
# ---------------------------------------------------------------------------


def _q(name):
    return next(p for p in PENDING if p.name == name)


def _rows(spark, tbl):
    from spotify_data_pipeline_spark.io import load_table

    return load_table(spark, SF_DIR, tbl).collect()


def _py_tokens(text: str) -> list[str]:
    t = " ".join(text.split()).strip().lower()
    return t.split(" ") if t else []


def _md5_head15(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_span_corruption_python_recount_and_budget(spark):
    rows = _q("llm_span_corruption_plan").fn(spark, SF_DIR).collect()
    assert rows
    agg: dict = {}
    for d in _rows(spark, "documents"):
        if d.text is None or not d.text.strip():
            continue
        toks = _py_tokens(d.text)
        n = len(toks)
        reach = [-1] * n
        starts = 0
        for i in range(n):
            if _md5_head15(f"sc:{d.doc_id}:{i}") % _SC_START_MOD == 0:
                starts += 1
                reach[i] = i + 2 + _md5_head15(
                    f"sl:{d.doc_id}:{i}"
                ) % _SC_LEN_MOD - 1
        corrupted = sum(
            1
            for i in range(n)
            if max(
                reach[max(0, i - _SC_MAX_REACH) : i + 1], default=-1
            )
            >= i
        )
        a = agg.setdefault(d.source, [0, 0, 0])
        a[0] += n
        a[1] += corrupted
        a[2] += starts
    expect = {
        src: (a[0], a[1], a[2], (a[1] * 1_000_000) // a[0])
        for src, a in agg.items()
    }
    got = {
        r.source: (
            r.n_tokens,
            r.corrupted_tokens,
            r.span_starts,
            r.corruption_ppm,
        )
        for r in rows
    }
    assert got == expect
    # the 5% x mean-3 design lands near the 15% corruption budget
    total = sum(a[0] for a in agg.values())
    corr = sum(a[1] for a in agg.values())
    assert 0.08 < corr / total < 0.22, corr / total


def test_randomized_response_recount_and_estimator_law(spark):
    rows = _q("privacy_randomized_response").fn(spark, SF_DIR).collect()
    assert rows
    ev = sorted(
        _rows(spark, "events"),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    first_type: dict = {}
    for r in ev:
        first_type.setdefault(r.user_id, r.event_type)
    groups: dict = {}
    for uid, grp in first_type.items():
        truth = uid % _RR_SENSITIVE_MOD == 0
        flip = _md5_head15(f"rr:{uid}") % _RR_FLIP_MOD == 0
        reported = truth != flip
        g = groups.setdefault(grp, [0, 0, 0])
        g[0] += 1
        g[1] += 1 if truth else 0
        g[2] += 1 if reported else 0
    expect = {
        grp: (
            g[0],
            g[1],
            g[2],
            4 * g[2] - g[0],
            4 * g[2] - g[0] - 2 * g[1],
        )
        for grp, g in groups.items()
    }
    got = {
        r.grp: (r.n_users, r.true_cnt, r.reported_cnt, r.est_x2, r.err_x2)
        for r in rows
    }
    assert got == expect
    # the estimator is unbiased in expectation — on a finite seeded
    # sample the pooled error must at least stay inside the standard
    # binomial envelope: |err| <= 4 * sqrt(n) per 2x scale (generous)
    n_tot = sum(g[0] for g in groups.values())
    err_tot = sum(v[4] for v in got.values())
    assert abs(err_tot) <= 8 * max(1, int(n_tot**0.5)), (err_tot, n_tot)


def test_funnel_sweep_recount_and_window_monotonicity(spark):
    rows = _q("events_funnel_window_sweep").fn(spark, SF_DIR).collect()
    assert len(rows) == len(_FW_HOURS)
    import datetime as dt

    epoch = dt.datetime(1970, 1, 1)

    def to_us(ts):
        td = ts.replace(tzinfo=None) - epoch
        return (td.days * 86_400 + td.seconds) * 1_000_000 + td.microseconds

    by_user: dict = {}
    for r in _rows(spark, "events"):
        by_user.setdefault(r.user_id, []).append(
            (r.event_type, to_us(r.ts))
        )
    expect = {}
    for h in _FW_HOURS:
        lim = h * 3_600_000_000
        with_view = clicked = full = 0
        for evs in by_user.values():
            views = [t for e, t in evs if e == "view"]
            if not views:
                continue
            with_view += 1
            t_view = min(views)
            cands = [
                t
                for e, t in evs
                if e == "click" and t_view <= t <= t_view + lim
            ]
            if not cands:
                continue
            clicked += 1
            t_click = min(cands)
            buys = [
                t
                for e, t in evs
                if e == "purchase" and t_click <= t <= t_click + lim
            ]
            if buys:
                full += 1
        expect[h] = (
            with_view,
            clicked,
            full,
            (clicked * 1_000_000) // with_view,
            (full * 1_000_000) // with_view,
        )
    got = {
        r.window_h: (
            r.users_with_view,
            r.click_converted,
            r.fully_converted,
            r.click_ppm,
            r.full_ppm,
        )
        for r in rows
    }
    assert got == expect
    # wider windows can only convert more (the anchor view is fixed,
    # so the candidate click set grows monotonically; the purchase
    # window anchors on the chosen click, which can only move EARLIER
    # or stay — keeping full conversions non-decreasing here too, a
    # property the recount equality already pins; assert the ppm curve)
    hs = sorted(got)
    clicks = [got[h][1] for h in hs]
    assert clicks == sorted(clicks)
