"""Round-7 staged queries (plans/roundseven_pending.py) get the SAME
driver-shaped oracle check as declared queries — activation in round 7
is registration-only (after the evidence-hash refresh)."""

from __future__ import annotations

import os

import pytest

from spotify_data_pipeline_spark.plans.roundseven_pending import PENDING
from tests.oracle_check import compare, run_oracle

SF_DIR = os.environ.get("ORACLE_SF", "/root/testdata/sf0.001")


# staged queries allowed to be empty at the default sf0.001 (none currently)
_EMPTY_OK = set()


@pytest.mark.parametrize("pq", PENDING, ids=lambda pq: pq.name)
def test_pending_oracle_match(spark, pq):
    result = pq.fn(spark, SF_DIR)
    oracle = run_oracle(pq.oracle, SF_DIR)
    errs = compare(result, oracle)
    assert not errs, f"{pq.name}: " + "; ".join(errs)
    # vacuousness guard (the Q7 / duplicate-screen lesson): an
    # empty-vs-empty oracle match proves nothing, so a staged query
    # must produce rows at this SF unless explicitly allowlisted.
    if pq.name not in _EMPTY_OK:
        assert len(oracle) > 0, f"{pq.name}: vacuous (0 oracle rows) at {SF_DIR}"


def test_pending_all_registered(spark):
    """Round-6 activation (plans/active.py manifest): every round-7
    staged query is declared, oracle intact, fn identical — the
    manifest declares FROM this module so the pending file itself
    never changes at activation."""
    from spotify_data_pipeline_spark.plans import all_queries

    qs = all_queries()
    for pq in PENDING:
        assert pq.name in qs, pq.name
        assert qs[pq.name].fn is pq.fn, pq.name
        assert qs[pq.name].oracle == pq.oracle, pq.name


def test_pending_names_unique_and_oracle_bearing():
    names = [pq.name for pq in PENDING]
    assert len(names) == len(set(names))
    assert all(pq.oracle for pq in PENDING)
    # and no collision with the round-6 staging area either
    from spotify_data_pipeline_spark.plans.roundsix import PENDING as P6

    assert not set(names) & {pq.name for pq in P6}


def _plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# broadcast-1-row patterns, documented at the call site; these join the
# plan-hygiene whitelist (with the same reasons) at activation
_BNLJ_OK = {
    "orders_basket_lift",  # 1-row broadcast basket-count aggregate
    # |sources| x |distinct-length| grid: a cross join of two SMALL
    # AGGREGATES (20 x few-thousand rows), never the corpus
    "llm_ks_drift",
    # 1-row broadcast positive-balance aggregate under the
    # cross-multiplied threshold compare (Q22's scalar subquery)
    "join_sales_opportunity",
    # 1-row broadcast region-total aggregate under the cross-multiplied
    # HAVING threshold (Q11's global-aggregate subquery)
    "agg_important_parts",
    # 1-row broadcast corpus-totals (N docs, T tokens) aggregate under
    # the BM25 length normalization / rare-flag threshold
    "text_bm25_topk",
    "text_typicality",
}


def test_plans_no_nested_loop(spark):
    for pq in PENDING:
        if pq.name in _BNLJ_OK:
            continue
        plan = _plan_of(pq.fn(spark, SF_DIR))
        assert "BroadcastNestedLoopJoin" not in plan, pq.name
        assert "CartesianProduct" not in plan, pq.name


def test_session_paths_two_window_passes_no_self_join(spark):
    """The scale claim in the docstring: sessionize + lead grams are
    window passes, never an events-against-events join."""
    from spotify_data_pipeline_spark.plans.roundseven_pending import (
        events_session_paths_query,
    )

    plan = _plan_of(events_session_paths_query(spark, SF_DIR))
    assert "Join" not in plan


def test_cusum_identity_matches_textbook_recursion(spark):
    """The load-bearing trick: S_d = P_d - min(0, min_{j<=d} P_j) must
    equal the textbook S_d = max(0, S_{d-1} + r_d) exactly, including
    a reset after a quiet stretch and an alarm under a planted drift."""
    from pyspark.sql import functions as F

    residuals = [5, -3, -9, 2, 4, 4, -1, 7, 7, 7, -30, 1, 1]
    # textbook recursion in plain Python
    want, s = [], 0
    for r in residuals:
        s = max(0, s + r)
        want.append(s)
    df = spark.createDataFrame(
        [(i, r) for i, r in enumerate(residuals)], "i long, r long"
    )
    from pyspark.sql import Window as W

    w = W.partitionBy().orderBy("i").rowsBetween(W.unboundedPreceding, W.currentRow)
    p = F.sum("r").over(w)
    got = [
        r.s
        for r in df.select(
            "i", (p - F.least(F.min(p).over(w), F.lit(0))).alias("s")
        )
        .orderBy("i")
        .collect()
    ]
    assert got == want
