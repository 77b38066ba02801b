"""Round-16 staging area (plans/roundsixteen_pending.py): the
curation-ops wave — driver-shaped oracle checks plus semantic pins."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.plans.roundsixteen_pending import PENDING
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
    """Round-9 activated the whole module (window positions 29-35)."""
    from spotify_data_pipeline_spark.plans import all_queries
    from spotify_data_pipeline_spark.plans.active import R16_ACTIVATED

    qs = all_queries()
    assert set(R16_ACTIVATED) == {pq.name for pq in PENDING}
    for pq in PENDING:
        assert pq.name in qs and qs[pq.name].fn is pq.fn
        assert qs[pq.name].oracle == pq.oracle


def test_pending_names_unique_and_oracle_bearing():
    names = [pq.name for pq in PENDING]
    assert len(names) == len(set(names))
    assert all(pq.oracle for pq in PENDING)


def _plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# documented bounded/1-row broadcast patterns; join the hygiene
# whitelist at activation:
# - sweep/allocation: 1-row corpus-totals broadcast
# - orphans: four 1-row count x 1-row orphan-count assemblies
_BNLJ_OK = {
    "llm_quality_threshold_sweep",
    "llm_token_budget_allocation",
    "dq_referential_orphans",
}


@pytest.mark.parametrize("pq", PENDING, ids=lambda pq: pq.name)
def test_plans_no_unexpected_nested_loop(spark, pq):
    plan = _plan_of(pq.fn(spark, SF_DIR))
    if pq.name in _BNLJ_OK:
        return
    assert "BroadcastNestedLoopJoin" not in plan, pq.name
    assert "CartesianProduct" not in plan, pq.name


def test_sweep_is_monotone_decreasing(spark):
    """Raising the threshold can only shrink what survives; threshold 8
    must keep a strict majority of this corpus (non-vacuity) and every
    ppm is <= 1M."""
    from spotify_data_pipeline_spark.plans.roundsixteen_pending import (
        llm_quality_threshold_sweep_query,
    )

    rows = llm_quality_threshold_sweep_query(spark, SF_DIR).collect()
    assert [r.threshold for r in rows] == [8, 16, 32, 64, 128, 256]
    docs = [r.docs_kept for r in rows]
    toks = [r.tokens_kept for r in rows]
    assert docs == sorted(docs, reverse=True)
    assert toks == sorted(toks, reverse=True)
    assert rows[0].docs_ppm > 500_000
    assert all(r.tokens_ppm <= 1_000_000 for r in rows)


def test_pii_redaction_accounts_every_span(spark):
    """Every document gains exactly one email and one phone by
    synthesis; removal must shrink characters (emails/phones are longer
    than their placeholder tokens here or not — the audit must balance
    regardless: chars_before - chars_after equals the length delta
    implied by span counts is data-dependent, so pin the invariants
    that always hold)."""
    from spotify_data_pipeline_spark.plans.roundsixteen_pending import (
        text_pii_redaction_audit_query,
    )

    rows = text_pii_redaction_audit_query(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_emails >= r.n_docs  # at least the synthesized one each
        assert r.n_phones == r.n_docs  # the synthesized phone is the only +1-555 match
        assert r.chars_after < r.chars_before
        assert 0 < r.removed_ppm < 1_000_000


def test_pii_redaction_removes_all_matches(spark):
    """After redaction the PII regexes must find NOTHING — the
    idempotence/completeness contract of a redaction pass."""
    from spotify_data_pipeline_spark.plans.roundsixteen_pending import (
        _EMAIL_RE,
        _PHONE_RE,
    )

    df = spark.createDataFrame(
        [("reach me: a.b+c@x.org and +1-555-0001 or d@e.io",)], "t string"
    )
    red = df.select(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), _EMAIL_RE, "[EMAIL]"), _PHONE_RE, "[PHONE]"
        ).alias("r")
    )
    out = red.select(
        F.size(F.regexp_extract_all(F.col("r"), F.lit(_EMAIL_RE), 0)).alias("ne"),
        F.size(F.regexp_extract_all(F.col("r"), F.lit(_PHONE_RE), 0)).alias("np"),
        "r",
    ).collect()[0]
    assert out.ne == 0 and out.np == 0
    assert out.r == "reach me: [EMAIL] and [PHONE] or [EMAIL]"


def test_incremental_dedup_every_branch_fires(spark):
    """The synthetic re-crawl and double-submission guarantee all three
    verdicts appear, and totals reconcile with the constructed batch."""
    from spotify_data_pipeline_spark.plans.roundsixteen_pending import (
        dedup_incremental_batch_query,
    )

    rows = dedup_incremental_batch_query(spark, SF_DIR).collect()
    verdicts = {}
    for r in rows:
        verdicts[r.verdict] = verdicts.get(r.verdict, 0) + r.n
    assert set(verdicts) == {"dup_of_history", "new_unique", "dup_in_batch"}
    assert all(v > 0 for v in verdicts.values())


def test_allocation_sums_exactly_to_budget(spark):
    """Hamilton's defining property: Σ alloc == budget, every source
    within one token of its exact quota."""
    from spotify_data_pipeline_spark.plans.roundsixteen_pending import (
        _TOKEN_BUDGET,
        llm_token_budget_allocation_query,
    )

    rows = llm_token_budget_allocation_query(spark, SF_DIR).collect()
    assert sum(r.token_alloc for r in rows) == _TOKEN_BUDGET
    total = sum(r.n_tokens for r in rows)
    for r in rows:
        exact = _TOKEN_BUDGET * r.n_tokens / total
        assert abs(r.token_alloc - exact) < 1.0 + 1e-9, (r.source, exact)


def test_orphan_screen_shape_and_bounds(spark):
    from spotify_data_pipeline_spark.plans.roundsixteen_pending import (
        dq_referential_orphans_query,
    )

    rows = dq_referential_orphans_query(spark, SF_DIR).collect()
    assert [r.relationship for r in rows] == sorted(
        [
            "orders->customer",
            "lineitem->orders",
            "lineitem->part",
            "lineitem->supplier",
        ]
    )
    for r in rows:
        assert 0 <= r.n_orphans <= r.n_child
        assert r.orphan_ppm == (r.n_orphans * 1_000_000) // r.n_child


def test_orphans_detected_on_constructed_break(spark):
    """The screen must actually catch a broken FK — verified on a
    constructed child table with known orphans."""
    child = spark.createDataFrame([(1, 10), (2, 99), (3, 10)], "id long, fk long")
    parent = spark.createDataFrame([(10,)], "pk long")
    n = child.join(parent, child["fk"] == parent["pk"], "left_anti").count()
    assert n == 1


def test_seasonality_grid_bounds_and_month_totals(spark):
    from spotify_data_pipeline_spark.plans.roundsixteen_pending import (
        orders_seasonality_heatmap_query,
    )

    rows = orders_seasonality_heatmap_query(spark, SF_DIR).collect()
    assert rows
    assert all(0 <= r.weekday <= 6 and 1 <= r.month <= 12 for r in rows)
    by_month = {}
    for r in rows:
        by_month.setdefault(r.month, []).append(r.of_month_ppm)
    for m, ppms in by_month.items():
        assert sum(ppms) <= 1_000_000, m
        assert sum(ppms) > 1_000_000 - len(ppms), m


def test_value_histogram_decades_partition_rows(spark):
    from spotify_data_pipeline_spark.plans.roundsixteen_pending import (
        events_value_log_histogram_query,
    )

    rows = events_value_log_histogram_query(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # decade = digit count: min/max must have exactly that many digits
        assert len(str(r.min_cents)) == r.decade
        assert len(str(r.max_cents)) == r.decade
        assert r.min_cents <= r.max_cents
