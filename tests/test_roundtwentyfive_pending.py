"""Round-25 staging area (plans/roundtwentyfive_pending.py): the
ML-pipeline depth wave — driver-shaped oracle checks, plan hygiene,
and pure-Python recounts (full boosting replay with the
MSE-must-shrink law, Haar energy conservation at every scale,
curriculum stage balance, calibration monotonicity)."""

from __future__ import annotations

import hashlib
import math
import os

import pytest

from spotify_data_pipeline_spark.plans.roundtwentyfive_pending import (
    _CAL_BIN_CAP,
    _CAL_BIN_E6,
    _CAL_BUCKETS_NB,
    _CUR_STAGES,
    _GBT_ROUNDS,
    _GBT_THRESHOLDS,
    _HAAR_LEVELS,
    _HAAR_N,
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
    from spotify_data_pipeline_spark.plans.active import R25_ACTIVATED

    qs = all_queries()
    assert set(R25_ACTIVATED) == {pq.name for pq in PENDING}
    for pq in PENDING:
        assert pq.name in qs and qs[pq.name].fn is pq.fn
        assert qs[pq.name].oracle == pq.oracle


def test_pending_names_unique_and_oracle_bearing():
    names = [pq.name for pq in PENDING]
    assert len(names) == len(set(names))
    assert all(pq.oracle for pq in PENDING)
    from spotify_data_pipeline_spark.plans.roundtwentyfour_pending import (
        PENDING as P24,
    )
    from spotify_data_pipeline_spark.plans.roundtwentyone_pending import (
        PENDING as P21,
    )
    from spotify_data_pipeline_spark.plans.roundtwentythree_pending import (
        PENDING as P23,
    )
    from spotify_data_pipeline_spark.plans.roundtwentytwo_pending import (
        PENDING as P22,
    )

    for earlier in (P21, P22, P23, P24):
        assert not set(names) & {pq.name for pq in earlier}


def _plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# whitelisted bounded nested-loop sides (all 1-row broadcasts):
#   ml_gbdt_stump_boost    — f0 / best-split / mse broadcasts per round
#   llm_curriculum_order   — the doc-count and token-total broadcasts
#   ml_nb_calibration_bins — the totals / priors broadcasts
_BNLJ_OK = {
    "ml_gbdt_stump_boost",
    "llm_curriculum_order",
    "ml_nb_calibration_bins",
}


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


def _trunc_div(a: int, d: int) -> int:
    q = abs(a) // d
    return q if a >= 0 else -q


def test_gbdt_python_replay_and_mse_shrinks(spark):
    rows = _q("ml_gbdt_stump_boost").fn(spark, SF_DIR).collect()
    assert len(rows) == _GBT_ROUNDS
    li = [
        (int(r.l_quantity), math.floor(r.l_extendedprice * 100 + 0.5))
        for r in _rows(spark, "lineitem")
    ]
    n = len(li)
    f0 = _trunc_div(sum(y for _, y in li), n)
    res = [(q, y - f0) for q, y in li]
    mse_prev = None
    expect = []
    for rnd_no in range(1, _GBT_ROUNDS + 1):
        s_all = sum(r for _, r in res)
        best = None
        for t in _GBT_THRESHOLDS:
            s_l = sum(r for q, r in res if q <= t)
            n_l = sum(1 for q, _ in res if q <= t)
            s_r, n_r = s_all - s_l, n - n_l
            if n_l == 0 or n_r == 0:
                continue
            score = s_l * s_l / n_l + s_r * s_r / n_r
            if best is None or score > best[0] or (
                score == best[0] and t < best[1]
            ):
                best = (score, t, s_l, n_l, s_r, n_r)
        _, t, s_l, n_l, s_r, n_r = best
        adj_l, adj_r = _trunc_div(s_l, n_l), _trunc_div(s_r, n_r)
        res = [
            (q, r - (adj_l if q <= t else adj_r)) for q, r in res
        ]
        mse = sum(r * r for _, r in res) // n
        expect.append((rnd_no, t, n_l, n_r, adj_l, adj_r, mse))
        if mse_prev is not None:
            assert mse < mse_prev  # boosting must shrink the loss
        mse_prev = mse
    got = [
        (
            r.round,
            r.threshold,
            r.n_left,
            r.n_right,
            r.adj_left_cents,
            r.adj_right_cents,
            r.mse_after,
        )
        for r in rows
    ]
    assert got == expect


def test_haar_python_recount_and_energy_structure(spark):
    rows = _q("orders_haar_energy").fn(spark, SF_DIR).collect()
    assert len(rows) == _HAAR_LEVELS
    daily: dict = {}
    for r in _rows(spark, "orders"):
        d = r.o_orderdate.replace(
            hour=0, minute=0, second=0, microsecond=0, tzinfo=None
        )
        daily[d] = daily.get(d, 0) + math.floor(r.o_totalprice * 100 + 0.5)
    series = [daily[d] // 100 for d in sorted(daily)][:_HAAR_N]
    assert len(series) == _HAAR_N
    expect = {}
    for k in range(1, _HAAR_LEVELS + 1):
        details: dict = {}
        for i, x in enumerate(series):
            j = i // (2**k)
            sign = 1 - 2 * ((i // (2 ** (k - 1))) % 2)
            details[j] = details.get(j, 0) + sign * x
        expect[k] = (len(details), sum(d * d for d in details.values()))
    got = {r.scale: (r.n_coeffs, r.energy) for r in rows}
    assert got == expect
    # coefficient counts halve per scale: 128, 64, ..., 1
    for k in range(1, _HAAR_LEVELS + 1):
        assert got[k][0] == _HAAR_N // (2**k)
    assert all(v[1] >= 0 for v in got.values())


def _py_tokens(text: str) -> list[str]:
    t = " ".join(text.split()).strip().lower()
    return t.split(" ") if t else []


def test_curriculum_python_recount_and_ordering(spark):
    rows = _q("llm_curriculum_order").fn(spark, SF_DIR).collect()
    assert len(rows) == _CUR_STAGES
    docs = [
        r
        for r in _rows(spark, "documents")
        if r.text is not None and r.text.strip()
    ]
    scored = []
    for d in docs:
        toks = _py_tokens(d.text)
        n_tok, n_dist = len(toks), len(set(toks))
        diff = n_tok + ((n_dist * 1_000_000) // n_tok) // 1000
        scored.append((d.doc_id, n_tok, diff))
    n = len(scored)
    tot = sum(s[1] for s in scored)
    order = sorted(scored, key=lambda s: (s[2], s[0]))
    stages: dict = {}
    for rn, (did, n_tok, diff) in enumerate(order, start=1):
        st = ((rn - 1) * _CUR_STAGES) // n
        g = stages.setdefault(st, [0, None, None, 0])
        g[0] += 1
        g[1] = diff if g[1] is None else min(g[1], diff)
        g[2] = diff if g[2] is None else max(g[2], diff)
        g[3] += n_tok
    expect = {
        st: (g[0], g[1], g[2], g[3], (g[3] * 1_000_000) // tot)
        for st, g in stages.items()
    }
    got = {
        r.stage: (
            r.n_docs,
            r.min_difficulty,
            r.max_difficulty,
            r.stage_tokens,
            r.token_share_ppm,
        )
        for r in rows
    }
    assert got == expect
    # stages are difficulty-ordered and size-balanced
    maxes = [got[s][2] for s in sorted(got)]
    mins = [got[s][1] for s in sorted(got)]
    assert all(mins[i + 1] >= maxes[i] for i in range(len(mins) - 1))
    sizes = [got[s][0] for s in sorted(got)]
    assert max(sizes) - min(sizes) <= 1


def _md5_head15(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_calibration_python_recount_and_monotone_ends(spark):
    rows = _q("ml_nb_calibration_bins").fn(spark, SF_DIR).collect()
    assert len(rows) >= 3  # a real diagram, not a clamped pair
    docs = [
        r
        for r in _rows(spark, "documents")
        if r.text is not None and r.text.strip()
    ]
    buckets: dict = {}
    n_hq = n_lq = d_hq = d_lq = 0
    doc_b = {}
    for d in docs:
        hq = d.lang == "en"
        d_hq += 1 if hq else 0
        d_lq += 0 if hq else 1
        bs = [
            _md5_head15("nbq:" + t) % _CAL_BUCKETS_NB
            for t in _py_tokens(d.text)
        ]
        doc_b[d.doc_id] = (hq, bs)
        for b in bs:
            c = buckets.setdefault(b, [0, 0])
            c[0] += 1 if hq else 0
            c[1] += 0 if hq else 1
            n_hq += 1 if hq else 0
            n_lq += 0 if hq else 1

    def e6ln(x):
        return math.floor(math.log(x) * 1_000_000 + 0.5)

    lw = {
        b: e6ln((c[0] + 1) / (n_hq + _CAL_BUCKETS_NB))
        - e6ln((c[1] + 1) / (n_lq + _CAL_BUCKETS_NB))
        for b, c in buckets.items()
    }
    prior = e6ln(d_hq / (d_hq + d_lq)) - e6ln(d_lq / (d_hq + d_lq))
    bins: dict = {}
    for hq, bs in doc_b.values():
        if not bs:
            continue
        m = prior + sum(lw[b] for b in bs)
        bn = max(-_CAL_BIN_CAP, min(_CAL_BIN_CAP, _trunc_div(m, _CAL_BIN_E6)))
        g = bins.setdefault(bn, [0, 0])
        g[0] += 1
        g[1] += 1 if hq else 0
    expect = {
        bn: (g[0], g[1], (g[1] * 1_000_000) // g[0]) for bn, g in bins.items()
    }
    got = {r.bin: (r.n_docs, r.n_pos, r.pos_rate_ppm) for r in rows}
    assert got == expect
    # reliability: the top bin is purer than the bottom bin
    lo, hi = min(got), max(got)
    assert got[hi][2] > got[lo][2]
