"""Round-30 staging area (plans/roundthirty_pending.py): the
hypothesis-testing closure wave — driver-shaped oracle checks, plan
hygiene, and pure-Python recounts cross-checked against scipy-free
closed forms (tie-corrected rank identities, the F ratio rebuilt
from raw moments)."""

from __future__ import annotations

import math
import os

import pytest

from spotify_data_pipeline_spark.plans.roundthirty_pending import PENDING
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
    """Round-10 activated agg_kruskal_wallis (window position 49);
    round 11 activated agg_levene_variance (the backlog-zero slot) —
    both queries of this module are now registered, kruskal on its
    intact r10 pin at the tail, levene inside the r11 window."""
    from spotify_data_pipeline_spark.plans import all_queries
    from spotify_data_pipeline_spark.plans.active import (
        R30_ACTIVATED,
        R30_REMAINDER,
        R30B_ACTIVATED,
    )

    qs = all_queries()
    by_name = {pq.name: pq for pq in PENDING}
    assert set(R30_ACTIVATED) | set(R30B_ACTIVATED) == set(by_name)
    assert R30_REMAINDER == ()
    for name in (*R30_ACTIVATED, *R30B_ACTIVATED):
        pq = by_name[name]
        assert name in qs and qs[name].fn is pq.fn
        assert qs[name].oracle == pq.oracle


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
        "roundtwentynine_pending",
    ):
        earlier = importlib.import_module(
            f"spotify_data_pipeline_spark.plans.{mod}"
        ).PENDING
        assert not set(names) & {pq.name for pq in earlier}


def _plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# whitelisted bounded nested-loop sides (1-row assembly broadcasts)
_BNLJ_OK = {"agg_kruskal_wallis", "agg_levene_variance"}


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


def _cents_by_group(spark):
    from spotify_data_pipeline_spark.io import load_table

    groups: dict = {}
    for r in load_table(spark, SF_DIR, "orders").collect():
        groups.setdefault(r.o_orderpriority, []).append(
            math.floor(r.o_totalprice * 100 + 0.5)
        )
    return groups


def test_kruskal_wallis_python_recount(spark):
    rows = _q("agg_kruskal_wallis").fn(spark, SF_DIR).collect()
    groups = _cents_by_group(spark)
    allv = sorted(v for vs in groups.values() for v in vs)
    n = len(allv)
    # doubled average rank per distinct value
    rank2: dict = {}
    i = 0
    while i < n:
        j = i
        while j < n and allv[j] == allv[i]:
            j += 1
        # positions i+1 .. j (1-based); doubled average = 2(i+1)+(j-i)-1
        rank2[allv[i]] = 2 * (i + 1) + (j - i) - 1
        i = j
    r2 = {g: sum(rank2[v] for v in vs) for g, vs in groups.items()}
    s = sum(float(r2[g]) * float(r2[g]) / len(groups[g]) for g in groups)
    h_e6 = math.floor((3.0 * s / (n * (n + 1)) - 3.0 * (n + 1)) * 1_000_000 + 0.5)
    got = {
        r.o_orderpriority: (r.n_g, r.r2_sum, r.mean_rank2, r.n_total, r.h_e6)
        for r in rows
    }
    expect = {
        g: (len(vs), r2[g], r2[g] // len(vs), n, h_e6)
        for g, vs in groups.items()
    }
    assert got == expect
    # sanity: rank2 sums over all groups = 2 * N(N+1)/2
    assert sum(v[1] for v in got.values()) == n * (n + 1)
    assert h_e6 >= 0


def test_levene_python_recount(spark):
    rows = _q("agg_levene_variance").fn(spark, SF_DIR).collect()
    groups = _cents_by_group(spark)
    med = {
        g: sorted(vs)[(len(vs) + 1) // 2 - 1] for g, vs in groups.items()
    }
    z = {g: [abs(v - med[g]) for v in vs] for g, vs in groups.items()}
    k = len(groups)
    n = sum(len(vs) for vs in groups.values())
    z_tot = sum(sum(zs) for zs in z.values())
    ss_within = sum(
        float(sum(v * v for v in zs))
        - float(sum(zs)) * float(sum(zs)) / len(zs)
        for zs in z.values()
    )
    sum_sq_over_n = sum(
        float(sum(zs)) * float(sum(zs)) / len(zs) for zs in z.values()
    )
    f_e6 = math.floor(
        (
            (n - k)
            / (k - 1.0)
            * (sum_sq_over_n - float(z_tot) * float(z_tot) / n)
            / ss_within
        )
        * 1_000_000
        + 0.5
    )
    got = {
        r.o_orderpriority: (
            r.n_g,
            r.median_cents,
            r.mean_z_ppm_cents,
            r.n_groups,
            r.n_total,
            r.f_e6,
        )
        for r in rows
    }
    expect = {
        g: (
            len(groups[g]),
            med[g],
            (sum(z[g]) * 1_000_000) // len(groups[g]),
            k,
            n,
            f_e6,
        )
        for g in groups
    }
    assert got == expect
    assert f_e6 >= 0
