"""Round-38 staging area (plans/roundthirtyeight_pending.py): STAGED
FOR ROUND 12 — second staged-ahead wave (full kit, not registered)."""

from __future__ import annotations

import os

import pytest

from spotify_data_pipeline_spark.plans.roundthirtyeight_pending import (
    _KT_K,
    _RPD_LAGS,
    PENDING,
)
from tests.oracle_check import compare, run_oracle

SF_DIR = os.environ.get("ORACLE_SF", "/root/testdata/sf0.001")

_BY_NAME = {pq.name: pq for pq in PENDING}

#: documented 1-row / k-row broadcast assemblies (read by
#: tools/plan_audit.py; move to test_plan_hygiene's whitelist at
#: activation): welch = 1-row totals/assembly broadcasts; quantizer
#: balance = <=4-row chosen-center broadcasts per seeding round.
_BNLJ_OK = {
    "agg_welch_anova",
    "sim_quantizer_balance_audit",
    # 1-row training-vocabulary broadcast (the bigram-ppl shape)
    "llm_bigram_xent_by_source",
}


@pytest.mark.parametrize("pq", PENDING, ids=lambda pq: pq.name)
def test_pending_oracle_match(spark, pq):
    result = pq.fn(spark, SF_DIR)
    oracle = run_oracle(pq.oracle, SF_DIR)
    errs = compare(result, oracle)
    assert not errs, f"{pq.name}: " + "; ".join(errs)
    assert len(oracle) > 0, f"{pq.name}: vacuous (0 oracle rows) at {SF_DIR}"


def test_pending_registered(spark):
    """Activated in the round-12 window (positions 5-9)."""
    from spotify_data_pipeline_spark.plans import all_queries
    from spotify_data_pipeline_spark.plans.active import R38_ACTIVATED

    qs = all_queries()
    by_name = {pq.name: pq for pq in PENDING}
    assert set(R38_ACTIVATED) == set(by_name)
    for name in R38_ACTIVATED:
        pq = by_name[name]
        assert name in qs and qs[name].fn is pq.fn
        assert qs[name].oracle == pq.oracle


def test_pending_names_unique_and_oracle_bearing():
    names = [pq.name for pq in PENDING]
    assert len(names) == len(set(names))
    assert all(pq.oracle for pq in PENDING)


def test_xent_by_source_covers_all_sources(spark):
    rows = _BY_NAME["llm_bigram_xent_by_source"].fn(spark, SF_DIR).collect()
    srcs = run_oracle(
        "SELECT count(DISTINCT source) AS n FROM documents"
        " WHERE length(trim(text)) > 0",
        SF_DIR,
    )["n"][0]
    assert len(rows) == srcs
    assert all(r["xent_e6"] > 0 for r in rows)


def test_ktruss_survivors_support(spark):
    """Every surviving edge has round-2 support >= k-2, and round-2
    support never exceeds round-1 support (peeling only removes)."""
    rows = _BY_NAME["graph_ktruss_2round"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["support_r2"] >= _KT_K - 2
        assert r["support_r2"] <= r["support_r1"]
        assert r["stable"] == (1 if r["support_r2"] == r["support_r1"] else 0)
        assert r["u"] < r["v"]


def test_welch_anova_positive(spark):
    rows = _BY_NAME["agg_welch_anova"].fn(spark, SF_DIR).collect()
    assert len(rows) == 5
    assert all(r["k"] == 5 for r in rows)
    assert rows[0]["f_star_e6"] >= 0
    assert rows[0]["nu_e6"] > 0
    assert all(r["f_star_e6"] == rows[0]["f_star_e6"] for r in rows)


def test_repeat_decay_bounds(spark):
    rows = _BY_NAME["orders_repeat_purchase_decay"].fn(spark, SF_DIR).collect()
    assert rows
    ks = {r["k"] for r in rows}
    assert ks == set(_RPD_LAGS)
    for r in rows:
        assert 0 <= r["active"] <= r["cohort_size"]
        assert r["retained_ppm"] == r["active"] * 1_000_000 // r["cohort_size"]


def test_quantizer_balance_accounting(spark):
    rows = _BY_NAME["sim_quantizer_balance_audit"].fn(spark, SF_DIR).collect()
    assert 1 <= len(rows) <= 4
    total = sum(r["population"] for r in rows)
    n_vecs = run_oracle("SELECT count(*) AS n FROM embeddings", SF_DIR)["n"][0]
    assert total == n_vecs
    mx = max(r["population"] for r in rows)
    assert all(r["max_pop"] == mx for r in rows)
    assert all(r["straggler_ppm"] >= 1_000_000 for r in rows)
