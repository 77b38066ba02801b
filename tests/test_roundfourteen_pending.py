"""Round-14 staging area (plans/roundfourteen_pending.py): the
web-text axis unblocked by in-query synthesis — driver-shaped oracle
checks plus the plan-shape pins."""

from __future__ import annotations

import os

import pytest

from spotify_data_pipeline_spark.plans.roundfourteen_pending import PENDING
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
    """Round-8 activated both (window positions 0-1 — the webtext pair
    leads the window per VERDICT r07 item 3)."""
    from spotify_data_pipeline_spark.plans import all_queries
    from spotify_data_pipeline_spark.plans.active import R14_ACTIVATED

    qs = all_queries()
    assert set(R14_ACTIVATED) == {pq.name for pq in PENDING}
    for pq in PENDING:
        assert pq.name in qs and qs[pq.name].fn is pq.fn
        assert qs[pq.name].oracle == pq.oracle


def test_pending_names_unique_and_oracle_bearing():
    names = [pq.name for pq in PENDING]
    assert len(names) == len(set(names))
    assert all(pq.oracle for pq in PENDING)


def _plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("pq", PENDING, ids=lambda pq: pq.name)
def test_plans_no_nested_loop(spark, pq):
    plan = _plan_of(pq.fn(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan, pq.name
    assert "CartesianProduct" not in plan, pq.name


def test_paragraph_dedup_finds_the_template(spark):
    """The synthesized header/footer MUST be detected as boilerplate in
    every source (each source has >= 3 docs at every SF) — otherwise
    the oracle match is vacuous on the removal branch."""
    from spotify_data_pipeline_spark.plans.roundfourteen_pending import (
        text_paragraph_dedup_query,
    )

    rows = text_paragraph_dedup_query(spark, SF_DIR).collect()
    assert rows
    assert all(r.boiler_distinct >= 2 for r in rows), (
        "header+footer not flagged in some source"
    )
    assert all(r.occ_removed >= 2 * r.n_pages for r in rows)
    assert all(r.occ_kept + r.occ_removed == r.paras_total for r in rows)
    # removal genuinely shrank the corpus
    assert all(r.cleaned_chars_sum > 0 for r in rows)


def test_url_stats_cover_both_schemes(spark):
    """Both synthesized URL families must appear: per-source https
    hosts and the 7 sharded http CDN hosts — and shares sum to <= 1M
    ppm (integer floor)."""
    from spotify_data_pipeline_spark.plans.roundfourteen_pending import (
        text_url_domain_stats_query,
    )

    rows = text_url_domain_stats_query(spark, SF_DIR).collect()
    doms = {r.domain for r in rows}
    assert sum(1 for d in doms if d.endswith(".example.com")) >= 2
    assert sum(1 for d in doms if d.endswith(".example.net")) == 7
    assert all(
        (r.n_https == r.n_urls) == r.domain.endswith(".example.com") for r in rows
    )
    total_ppm = sum(r.url_share_ppm for r in rows)
    assert 0 < total_ppm <= 1_000_000
