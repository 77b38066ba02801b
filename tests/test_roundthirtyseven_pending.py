"""Round-37 staging area (plans/roundthirtyseven_pending.py): STAGED
FOR ROUND 12 — the round-11 window is full at exactly 50, so these
five carry the full kit (exact oracles verified here at the dev SF,
identity recounts) but are NOT registered until next round's
activation edit in plans/active.py."""

from __future__ import annotations

import os

import pytest

from spotify_data_pipeline_spark.plans.roundthirtyseven_pending import (
    _KS_BANDS,
    _KS_KS,
    PENDING,
)
from tests.oracle_check import compare, run_oracle

SF_DIR = os.environ.get("ORACLE_SF", "/root/testdata/sf0.001")

_BY_NAME = {pq.name: pq for pq in PENDING}

#: documented 1-row / k-row broadcast assemblies (read by
#: tools/plan_audit.py; these move to test_plan_hygiene's whitelist
#: when the module activates in round 12):
#: - tukey: 5-row group self theta-join (g < h) + 1-row MSE broadcast
#: - ivf_kpp: <=4-row chosen-center broadcasts per unrolled round
#: - contamination: 1-row distilled-weight broadcast
_BNLJ_OK = {
    "agg_tukey_pairwise",
    "sim_ann_ivf_kpp_recall",
    "llm_contamination_by_quality",
}


@pytest.mark.parametrize("pq", PENDING, ids=lambda pq: pq.name)
def test_pending_oracle_match(spark, pq):
    result = pq.fn(spark, SF_DIR)
    oracle = run_oracle(pq.oracle, SF_DIR)
    errs = compare(result, oracle)
    assert not errs, f"{pq.name}: " + "; ".join(errs)
    assert len(oracle) > 0, f"{pq.name}: vacuous (0 oracle rows) at {SF_DIR}"


def test_pending_registered(spark):
    """Activated in the round-12 window (positions 0-4)."""
    from spotify_data_pipeline_spark.plans import all_queries
    from spotify_data_pipeline_spark.plans.active import R37_ACTIVATED

    qs = all_queries()
    by_name = {pq.name: pq for pq in PENDING}
    assert set(R37_ACTIVATED) == set(by_name)
    for name in R37_ACTIVATED:
        pq = by_name[name]
        assert name in qs and qs[name].fn is pq.fn
        assert qs[name].oracle == pq.oracle


def test_pending_names_unique_and_oracle_bearing():
    names = [pq.name for pq in PENDING]
    assert len(names) == len(set(names))
    assert all(pq.oracle for pq in PENDING)


def test_brunner_munzel_placement_identity(spark):
    """Mr + Mn = 2 n_r n_n: every cross pair contributes exactly 2 to
    the doubled placement mass."""
    r = _BY_NAME["agg_brunner_munzel"].fn(spark, SF_DIR).collect()[0]
    assert r["p2_sum_r"] + r["p2_sum_n"] == 2 * r["n_r"] * r["n_n"]


def test_tukey_pairs_antisymmetric_pieces(spark):
    """All 10 ordered pairs present; the mean-difference signs are
    consistent with the group means recomputed from the emitted
    pieces."""
    rows = _BY_NAME["agg_tukey_pairwise"].fn(spark, SF_DIR).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["g"] < r["h"]
        # t and mean-diff share a sign (the denominator is positive);
        # floor can land a tiny negative diff at -1 while t floors to
        # -something — signs never OPPOSE strictly
        assert not (r["mean_diff_e2_cents"] > 0 and r["t_e6"] < 0)
        assert not (r["mean_diff_e2_cents"] < -1 and r["t_e6"] > 0)


def test_ivf_kpp_recall_bounds(spark):
    rows = _BY_NAME["sim_ann_ivf_kpp_recall"].fn(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["recall_ppm"] % 200_000 == 0  # hits * 1e6/5
        assert 0 <= r["recall_ppm"] <= 1_000_000
        assert r["cand_count"] >= 0


def test_contamination_by_quality_accounting(spark):
    rows = _BY_NAME["llm_contamination_by_quality"].fn(spark, SF_DIR).collect()
    assert len(rows) == 10
    corpus = run_oracle(
        "SELECT count(*) AS n FROM documents WHERE length(trim(text)) > 0"
        " AND doc_id % 16 <> 0",
        SF_DIR,
    )["n"][0]
    assert sum(r["n_docs"] for r in rows) == corpus
    for r in rows:
        assert 0 <= r["contaminated"] <= r["n_docs"]
        assert r["rate_ppm"] == r["contaminated"] * 1_000_000 // r["n_docs"]


def test_suppression_curve_monotone(spark):
    """Suppression cost is non-decreasing in k, and coarser bands
    never suppress more than finer ones at the same k."""
    rows = {
        (r["band_width"], r["k"]): r
        for r in _BY_NAME["privacy_k_suppression_curve"].fn(spark, SF_DIR).collect()
    }
    assert len(rows) == len(_KS_BANDS) * len(_KS_KS)
    for band in _KS_BANDS:
        costs = [rows[(band, k)]["rows_suppressed"] for k in _KS_KS]
        assert costs == sorted(costs)
    for k in _KS_KS:
        assert (
            rows[(_KS_BANDS[1], k)]["rows_suppressed"]
            <= rows[(_KS_BANDS[0], k)]["rows_suppressed"]
        )
