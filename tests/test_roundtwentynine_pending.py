"""Round-29 staging area (plans/roundtwentynine_pending.py): the
depth-cuts wave — driver-shaped oracle checks, plan hygiene, and
pure-Python recounts (full Burrows' Delta replay, Yannakakis
reduction laws incl. the equal-to-direct-join theorem, Hodges-Lehmann
order statistics)."""

from __future__ import annotations

import math
import os

import pytest

from spotify_data_pipeline_spark.plans.roundtwentynine_pending import (
    _BD_TOP_PAIRS,
    _BD_WORDS,
    _HL_N,
    _YK_PRIORITY,
    _YK_REGION,
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
    from spotify_data_pipeline_spark.plans.active import R29_ACTIVATED

    qs = all_queries()
    assert set(R29_ACTIVATED) == {pq.name for pq in PENDING}
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
        "roundtwentyeight_pending",
    ):
        earlier = importlib.import_module(
            f"spotify_data_pipeline_spark.plans.{mod}"
        ).PENDING
        assert not set(names) & {pq.name for pq in earlier}


def _plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# whitelisted bounded nested-loop sides:
#   text_burrows_delta        — the 30-row vocabulary broadcast grid
#   join_yannakakis_reduction — the six 1-row count-pair assemblies
#   agg_hodges_lehmann        — the bounded 101-row series self-join
#                               on i <= j plus the 1-row median pair
_BNLJ_OK = {
    "text_burrows_delta",
    "join_yannakakis_reduction",
    "agg_hodges_lehmann",
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


def _py_tokens(text: str) -> list[str]:
    t = " ".join(text.split()).strip().lower()
    return t.split(" ") if t else []


def test_burrows_delta_python_replay(spark):
    rows = _q("text_burrows_delta").fn(spark, SF_DIR).collect()
    assert len(rows) == _BD_TOP_PAIRS
    docs = [
        r
        for r in _rows(spark, "documents")
        if r.text is not None and r.text.strip()
    ]
    tf: dict = {}
    per_source: dict = {}
    for d in docs:
        toks = _py_tokens(d.text)
        per_source.setdefault(d.source, []).extend(toks)
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
    vocab = sorted(tf, key=lambda t: (-tf[t], t))[:_BD_WORDS]
    sources = sorted(per_source)
    rel = {}
    for s in sources:
        toks = per_source[s]
        tot = len(toks)
        cnt: dict = {}
        for t in toks:
            if t in set(vocab):
                cnt[t] = cnt.get(t, 0) + 1
        for wd in vocab:
            rel[(s, wd)] = (cnt.get(wd, 0) * 1_000_000_000) // tot
    n = len(sources)
    z = {}
    for wd in vocab:
        vals = [rel[(s, wd)] for s in sources]
        sum_r = sum(vals)
        sumsq = sum(v * v for v in vals)
        var_num = n * sumsq - sum_r * sum_r
        for s in sources:
            z[(s, wd)] = math.floor(
                (rel[(s, wd)] * n - sum_r)
                * 1_000_000.0
                / math.sqrt(float(var_num))
                + 0.5
            )
    deltas = {}
    for i, sa in enumerate(sources):
        for sb in sources[i + 1 :]:
            d = sum(abs(z[(sa, wd)] - z[(sb, wd)]) for wd in vocab)
            deltas[(sa, sb)] = d // _BD_WORDS
    order = sorted(deltas, key=lambda k: (deltas[k], k))[:_BD_TOP_PAIRS]
    expect = [(a, b, deltas[(a, b)]) for a, b in order]
    got = [(r.source_a, r.source_b, r.delta_e6) for r in rows]
    assert got == expect
    assert all(v >= 0 for _, _, v in got)


def test_yannakakis_reduction_laws(spark):
    rows = _q("join_yannakakis_reduction").fn(spark, SF_DIR).collect()
    got = {r.stage: (r.rows_before, r.rows_after, r.kept_ppm) for r in rows}
    assert len(got) == 6
    # reductions never grow
    for st, (nb, na, ppm) in got.items():
        if st != "6_final_join":
            assert na <= nb
            assert ppm == (na * 1_000_000) // nb if nb else ppm == 0
    # Yannakakis' theorem: the final join count equals the direct
    # 4-way join computed independently in Python
    region = {
        r.r_regionkey for r in _rows(spark, "region") if r.r_name == _YK_REGION
    }
    nations = {
        r.n_nationkey
        for r in _rows(spark, "nation")
        if r.n_regionkey in region
    }
    custs = {
        r.c_custkey
        for r in _rows(spark, "customer")
        if r.c_nationkey in nations
    }
    direct = sum(
        1
        for o in _rows(spark, "orders")
        if o.o_orderpriority == _YK_PRIORITY and o.o_custkey in custs
    )
    assert got["6_final_join"][0] == direct
    # the semi-joined orders count equals the final join count here
    # (every surviving order joins exactly one customer and nation)
    assert got["3_orders_by_customer"][1] == direct


def test_hodges_lehmann_python_recount(spark):
    row = _q("agg_hodges_lehmann").fn(spark, SF_DIR).collect()[0]
    daily: dict = {}
    for r in _rows(spark, "orders"):
        d = r.o_orderdate.replace(
            hour=0, minute=0, second=0, microsecond=0, tzinfo=None
        )
        daily[d] = daily.get(d, 0) + math.floor(r.o_totalprice * 100 + 0.5)
    series = [daily[d] for d in sorted(daily)][:_HL_N]
    assert len(series) == _HL_N
    walsh = sorted(
        series[i - 1] + series[j - 1]
        for i in range(1, _HL_N + 1)
        for j in range(i, _HL_N + 1)
    )
    n_pairs = _HL_N * (_HL_N + 1) // 2
    hl = walsh[(n_pairs + 1) // 2 - 1]
    med = sorted(series)[(_HL_N + 1) // 2 - 1] * 2
    assert (row.n_days, row.n_walsh, row.hl_x2, row.median_x2) == (
        _HL_N,
        n_pairs,
        hl,
        med,
    )
    # HL lies within the Walsh range and near the median (robustness:
    # both are location estimates of the same series)
    assert walsh[0] <= row.hl_x2 <= walsh[-1]
