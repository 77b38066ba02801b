"""Round-7 staged queries (plans/roundseven_pending.py) get the SAME
driver-shaped oracle check as declared queries — activation in round 7
is registration-only (after the evidence-hash refresh)."""

from __future__ import annotations

import os

import pytest

from spotify_data_pipeline_spark.plans.roundseven_pending import PENDING
from tests.oracle_check import compare, run_oracle

SF_DIR = os.environ.get("ORACLE_SF", "/root/testdata/sf0.001")


@pytest.mark.parametrize("pq", PENDING, ids=lambda pq: pq.name)
def test_pending_oracle_match(spark, pq):
    result = pq.fn(spark, SF_DIR)
    oracle = run_oracle(pq.oracle, SF_DIR)
    errs = compare(result, oracle)
    assert not errs, f"{pq.name}: " + "; ".join(errs)


def test_pending_not_registered(spark):
    from spotify_data_pipeline_spark.plans import all_queries

    names = set(all_queries())
    assert not names & {pq.name for pq in PENDING}


def test_pending_names_unique_and_oracle_bearing():
    names = [pq.name for pq in PENDING]
    assert len(names) == len(set(names))
    assert all(pq.oracle for pq in PENDING)
    # and no collision with the round-6 staging area either
    from spotify_data_pipeline_spark.plans.roundsix_pending import PENDING as P6

    assert not set(names) & {pq.name for pq in P6}


def _plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_plans_no_nested_loop(spark):
    for pq in PENDING:
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
