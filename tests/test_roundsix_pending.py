"""Round-6 staged queries (plans/roundsix_pending.py) get the SAME
driver-shaped oracle check as declared queries — so activating them in
round 6 is registration-only (after the evidence-hash refresh).
"""

from __future__ import annotations

import os

import pytest

from spotify_data_pipeline_spark.plans.roundsix_pending import PENDING
from tests.oracle_check import compare, run_oracle

SF_DIR = os.environ.get("ORACLE_SF", "/root/testdata/sf0.001")


@pytest.mark.parametrize("pq", PENDING, ids=lambda pq: pq.name)
def test_pending_oracle_match(spark, pq):
    result = pq.fn(spark, SF_DIR)
    oracle = run_oracle(pq.oracle, SF_DIR)
    errs = compare(result, oracle)
    assert not errs, f"{pq.name}: " + "; ".join(errs)


def test_pending_not_registered(spark):
    """Staged queries must NOT appear in the driver's view: the round-5
    window is exactly full; an unevidenced tail entry is what the
    registry invariants prevent."""
    from spotify_data_pipeline_spark.plans import all_queries

    names = set(all_queries())
    assert not names & {pq.name for pq in PENDING}


def test_pending_names_unique_and_oracle_bearing():
    names = [pq.name for pq in PENDING]
    assert len(names) == len(set(names))
    assert all(pq.oracle for pq in PENDING)


def _plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_fuzzy_join_plan_no_cartesian(spark):
    """The point of prefix filtering: candidates come from an equi join
    on prefix grams, never an all-pairs comparison."""
    from spotify_data_pipeline_spark.plans.roundsix_pending import (
        join_fuzzy_levenshtein_query,
    )

    plan = _plan_of(join_fuzzy_levenshtein_query(spark, "/root/testdata/sf0.001"))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_weighted_sample_sums_to_k(spark):
    """Systematic PPS invariant: Σ n_picks = k exactly, whatever the
    weight distribution."""
    from pyspark.sql import functions as F

    from spotify_data_pipeline_spark.plans.roundsix_pending import (
        llm_weighted_sample_query,
    )

    out = llm_weighted_sample_query(spark, "/root/testdata/sf0.001")
    assert out.agg(F.sum("n_picks")).collect()[0][0] == 40
