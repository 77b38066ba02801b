"""Round-28 staging area (plans/roundtwentyeight_pending.py): the
ranking-and-trend wave — driver-shaped oracle checks, plan hygiene,
and pure-Python recounts (full 2-step MM replay with the
winners-rank-higher law, Mann-Kendall pairwise recount, entropy
bounds)."""

from __future__ import annotations

import math
import os

import pytest

from spotify_data_pipeline_spark.plans.roundtwentyeight_pending import (
    _BT_STEPS,
    _BT_TOP,
    _MK_N,
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
    from spotify_data_pipeline_spark.plans.active import R28_ACTIVATED

    qs = all_queries()
    assert set(R28_ACTIVATED) == {pq.name for pq in PENDING}
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
        "roundtwentyseven_pending",
    ):
        earlier = importlib.import_module(
            f"spotify_data_pipeline_spark.plans.{mod}"
        ).PENDING
        assert not set(names) & {pq.name for pq in earlier}


def _plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# whitelisted bounded nested-loop sides:
#   agg_mann_kendall_trend — the bounded 128-row series self-join on
#   the i<j inequality (8k sign evaluations of series METADATA)
_BNLJ_OK = {"agg_mann_kendall_trend"}


@pytest.mark.parametrize("pq", PENDING, ids=lambda pq: pq.name)
def test_plans_no_unexpected_nested_loop(spark, pq):
    plan = _plan_of(pq.fn(spark, SF_DIR))
    if pq.name in _BNLJ_OK:
        return
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


def test_bradley_terry_python_replay(spark):
    rows = _q("supplier_bradley_terry").fn(spark, SF_DIR).collect()
    assert rows
    ps: dict = {}
    for r in _rows(spark, "lineitem"):
        k = (r.l_partkey, r.l_suppkey)
        ps[k] = ps.get(k, 0) + int(r.l_quantity)
    by_part: dict = {}
    for (p, s), q in ps.items():
        by_part.setdefault(p, []).append((s, q))
    matches: dict = {}
    for p, sup in by_part.items():
        sup.sort(key=lambda t: (-t[1], t[0]))
        win = sup[0][0]
        for s, _ in sup[1:]:
            matches[(win, s)] = matches.get((win, s), 0) + 1
    pairs: dict = {}
    for (i, j), n in matches.items():
        pairs[(i, j)] = pairs.get((i, j), 0) + n
        pairs.setdefault((j, i), 0)
    n_pair = {
        (i, j): pairs[(i, j)] + pairs[(j, i)] for (i, j) in pairs
    }
    wins: dict = {}
    for (i, _j), w in pairs.items():
        wins[i] = wins.get(i, 0) + w
    w = {i: 1_000_000 for i in wins}
    for _ in range(_BT_STEPS):
        d = {}
        for (i, j), np_ in n_pair.items():
            d[i] = d.get(i, 0) + math.floor(
                np_ * 1e12 / (w[i] + w[j]) + 0.5
            )
        w = {
            i: math.floor(wins[i] * 1e12 / d[i] + 0.5) for i in wins
        }
    n_matches = {}
    for (i, _j), np_ in n_pair.items():
        n_matches[i] = n_matches.get(i, 0) + np_
    order = sorted(w, key=lambda i: (-w[i], i))[:_BT_TOP]
    expect = [(i, w[i], wins[i], n_matches[i]) for i in order]
    got = [(r.suppkey, r.strength_e6, r.wins, r.n_matches) for r in rows]
    assert got == expect
    # strengths separate winners from losers: the top strength belongs
    # to a supplier whose win RATE beats the bottom-listed one's
    top, bot = got[0], got[-1]
    assert top[2] / top[3] >= bot[2] / bot[3]


def test_mann_kendall_python_recount(spark):
    row = _q("agg_mann_kendall_trend").fn(spark, SF_DIR).collect()[0]
    daily: dict = {}
    for r in _rows(spark, "orders"):
        d = r.o_orderdate.replace(
            hour=0, minute=0, second=0, microsecond=0, tzinfo=None
        )
        daily[d] = daily.get(d, 0) + math.floor(r.o_totalprice * 100 + 0.5)
    series = [daily[d] for d in sorted(daily)][:_MK_N]
    assert len(series) == _MK_N
    s = sum(
        (1 if series[j] > series[i] else -1 if series[j] < series[i] else 0)
        for i in range(_MK_N)
        for j in range(i + 1, _MK_N)
    )
    assert (row.n_days, row.s_stat) == (_MK_N, s)
    assert row.var18 == _MK_N * (_MK_N - 1) * (2 * _MK_N + 5)
    assert row.trend == (
        "increasing" if s > 0 else "decreasing" if s < 0 else "none"
    )
    # |S| is bounded by the pair count
    assert abs(s) <= _MK_N * (_MK_N - 1) // 2


def test_entropy_rate_recount_and_bounds(spark):
    rows = _q("events_entropy_rate").fn(spark, SF_DIR).collect()
    assert rows
    ev = sorted(
        _rows(spark, "events"),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    tr: dict = {}
    prev_user = prev_type = None
    for r in ev:
        if r.user_id == prev_user:
            tr[(prev_type, r.event_type)] = tr.get(
                (prev_type, r.event_type), 0
            ) + 1
        prev_user, prev_type = r.user_id, r.event_type
    n_i: dict = {}
    for (cur, _n), c in tr.items():
        n_i[cur] = n_i.get(cur, 0) + c
    expect = {}
    for cur, tot in n_i.items():
        nexts = {n: c for (c_, n), c in tr.items() if c_ == cur}
        h = sum(
            math.floor((c / tot) * math.log(tot / c) * 1_000_000 + 0.5)
            for c in nexts.values()
        )
        expect[cur] = (tot, len(nexts), h)
    got = {
        r.event_type: (r.n_transitions, r.n_next_states, r.entropy_e6)
        for r in rows
    }
    assert got == expect
    # 0 <= H <= ln(#next states) per state (micro-nat slack for the
    # per-term rounding)
    for _cur, (_tot, k, h) in got.items():
        assert -k <= h <= math.log(max(2, k)) * 1_000_000 + k
