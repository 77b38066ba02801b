"""Round-33 staging area (plans/roundthirtythree_pending.py): the
nonparametric-depth wave — driver-shaped oracle checks plus
scipy-free identity recounts (rank-sum totals, the n(n+1) Wilcoxon
identity, JT pair accounting, contingency margins)."""

from __future__ import annotations

import os

import pytest

from spotify_data_pipeline_spark.plans.roundthirtythree_pending import (
    _PRIORITIES,
    PENDING,
)
from tests.oracle_check import compare, run_oracle

SF_DIR = os.environ.get("ORACLE_SF", "/root/testdata/sf0.001")

_BY_NAME = {pq.name: pq for pq in PENDING}


@pytest.mark.parametrize("pq", PENDING, ids=lambda pq: pq.name)
def test_pending_oracle_match(spark, pq):
    result = pq.fn(spark, SF_DIR)
    oracle = run_oracle(pq.oracle, SF_DIR)
    errs = compare(result, oracle)
    assert not errs, f"{pq.name}: " + "; ".join(errs)
    assert len(oracle) > 0, f"{pq.name}: vacuous (0 oracle rows) at {SF_DIR}"


def test_pending_registered(spark):
    from spotify_data_pipeline_spark.plans import all_queries
    from spotify_data_pipeline_spark.plans.active import R33_ACTIVATED

    qs = all_queries()
    by_name = {pq.name: pq for pq in PENDING}
    assert set(R33_ACTIVATED) == set(by_name)
    for name in R33_ACTIVATED:
        pq = by_name[name]
        assert name in qs and qs[name].fn is pq.fn
        assert qs[name].oracle == pq.oracle


def test_pending_names_unique_and_oracle_bearing():
    names = [pq.name for pq in PENDING]
    assert len(names) == len(set(names))
    assert all(pq.oracle for pq in PENDING)


def test_friedman_rank_sums_identity(spark):
    """Within complete blocks the ranks 1..k are a permutation, so the
    treatment rank sums total n k (k+1) / 2."""
    rows = _BY_NAME["agg_friedman_test"].fn(spark, SF_DIR).collect()
    assert rows
    n = rows[0]["n_blocks"]
    k = rows[0]["k"]
    assert k == _PRIORITIES
    assert sum(r["rank_sum"] for r in rows) == n * k * (k + 1) // 2
    assert all(r["chi2_e6"] == rows[0]["chi2_e6"] for r in rows)
    assert rows[0]["chi2_e6"] >= 0


def test_page_l_bounds_and_expectation(spark):
    """L is bounded by the perfectly anti-/pro-trend arrangements and
    E[L] matches the closed form n k (k+1)^2 / 4."""
    rows = _BY_NAME["agg_page_trend"].fn(spark, SF_DIR).collect()
    assert rows
    n = rows[0]["rank_sum"] and max(r["rank_sum"] for r in rows)  # noqa: F841
    n_blocks = run_oracle(
        "SELECT 1", SF_DIR
    )  # placeholder to keep oracle helper imported once
    k = len(rows)
    nb = sum(r["rank_sum"] for r in rows) // (k * (k + 1) // 2)
    l_stat = rows[0]["l_stat"]
    assert rows[0]["l_expected"] == nb * k * (k + 1) ** 2 // 4
    # extreme arrangements: sum j*r over reversed / forward rank order
    lo = nb * sum(j * (k + 1 - j) for j in range(1, k + 1))
    hi = nb * sum(j * j for j in range(1, k + 1))
    assert lo <= l_stat <= hi
    assert sum(r["j"] * r["rank_sum"] for r in rows) == l_stat


def test_cochran_totals_consistent(spark):
    """Column totals sum to the grand total and Q is non-negative;
    the within-block binary keeps the design non-degenerate
    (0 < N < n_blocks * k)."""
    rows = _BY_NAME["agg_cochran_q"].fn(spark, SF_DIR).collect()
    assert len(rows) == 3
    n_tot = rows[0]["n_tot"]
    assert sum(r["c_j"] for r in rows) == n_tot
    assert 0 < n_tot < rows[0]["n_blocks"] * rows[0]["k"]
    assert rows[0]["q_e6"] >= 0


def test_jonckheere_pair_accounting(spark):
    """Every ordered pair appears once; each doubled U is bounded by
    2 n_g n_h; JT2 equals the sum of pair U2s."""
    rows = _BY_NAME["agg_jonckheere_terpstra"].fn(spark, SF_DIR).collect()
    assert len(rows) == _PRIORITIES * (_PRIORITIES - 1) // 2
    counts = run_oracle(
        "SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS g,"
        " CAST(count(*) AS BIGINT) AS n FROM orders GROUP BY 1",
        SF_DIR,
    ).set_index("g")["n"]
    jt2 = rows[0]["jt2"]
    assert sum(r["u2"] for r in rows) == jt2
    for r in rows:
        assert 0 <= r["u2"] <= 2 * int(counts[r["g"]]) * int(counts[r["h"]])


def test_cliffs_delta_pair_accounting(spark):
    """gt + lt + eq = n_r * n_n and delta within [-1e6, 1e6]."""
    r = _BY_NAME["agg_cliffs_delta"].fn(spark, SF_DIR).collect()[0]
    assert r["gt"] + r["lt"] + r["eq"] == r["n_r"] * r["n_n"]
    assert -1_000_000 <= r["delta_e6"] <= 1_000_000


def test_cramers_v_range(spark):
    r = _BY_NAME["agg_cramers_v"].fn(spark, SF_DIR).collect()[0]
    assert r["r"] == 5 and r["c"] == 5
    assert r["chi2_e6"] >= 0
    assert 0 <= r["cramers_v_e6"] <= 1_000_000


def test_mood_median_split_balanced(spark):
    """The grand-median split puts (n-1)//2 values strictly above the
    lower-middle statistic at most, and group counts sum to the
    corpus."""
    rows = _BY_NAME["agg_mood_median"].fn(spark, SF_DIR).collect()
    total = sum(r["n_above"] + r["n_notabove"] for r in rows)
    above = sum(r["n_above"] for r in rows)
    assert above <= total // 2  # at least half are <= the median value
    assert all(r["median_cents"] == rows[0]["median_cents"] for r in rows)
    assert rows[0]["chi2_e6"] >= 0


def test_wilcoxon_identity(spark):
    """W2+ + W2- = n (n + 1): the doubled rank sums partition the
    total doubled rank mass."""
    rows = {r["sign"]: r for r in _BY_NAME["agg_wilcoxon_signed_rank"].fn(spark, SF_DIR).collect()}
    assert set(rows) == {"pos", "neg"}
    n = rows["pos"]["n_pairs"]
    assert n == rows["neg"]["n_pairs"]
    assert rows["pos"]["w2"] + rows["neg"]["w2"] == n * (n + 1)
