"""Round-35 staging area (plans/roundthirtyfive_pending.py): series /
inequality / init wave — driver-shaped oracle checks plus recounts of
the load-bearing structure (PH non-negativity, Lorenz convexity,
coverage monotonicity, farthest-point maximality, Grubbs argmax,
Ljung-Box integer expansion)."""

from __future__ import annotations

import math
import os

import pytest

from spotify_data_pipeline_spark.plans.roundthirtyfive_pending import (
    _KPP_DIMS,
    _RS_WINDOWS,
    _VC_CUTS,
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
    from spotify_data_pipeline_spark.plans.active import R35_ACTIVATED

    qs = all_queries()
    by_name = {pq.name: pq for pq in PENDING}
    assert set(R35_ACTIVATED) == set(by_name)
    for name in R35_ACTIVATED:
        pq = by_name[name]
        assert name in qs and qs[name].fn is pq.fn
        assert qs[name].oracle == pq.oracle


def test_pending_names_unique_and_oracle_bearing():
    names = [pq.name for pq in PENDING]
    assert len(names) == len(set(names))
    assert all(pq.oracle for pq in PENDING)


def test_page_hinkley_nonnegative_and_resets(spark):
    """PH_t = cum - runmin is non-negative by construction and hits 0
    whenever the running min is refreshed."""
    rows = _BY_NAME["events_page_hinkley"].fn(spark, SF_DIR).collect()
    assert rows
    assert all(r["ph_scaled"] >= 0 for r in rows)
    assert any(r["ph_scaled"] == 0 for r in rows)  # at least the argmin day
    assert all(r["alarm"] in (0, 1) for r in rows)


def test_lorenz_convex_and_complete(spark):
    """Decile revenue is non-decreasing (sorted assignment), cumulative
    share hits 1e6-ish at decile 10, and the curve is below the
    diagonal (concentration)."""
    rows = sorted(
        _BY_NAME["orders_lorenz_curve"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    revs = [r["revenue"] for r in rows]
    assert revs == sorted(revs)
    assert rows[-1]["cum_revenue"] == sum(revs)
    assert 999_990 <= rows[-1]["cum_share_ppm"] <= 1_000_000
    for r in rows[:-1]:
        assert r["cum_share_ppm"] <= r["decile"] * 100_000


def test_vocab_coverage_monotone(spark):
    rows = sorted(
        _BY_NAME["llm_vocab_coverage_curve"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["cutoff"],
    )
    assert [r["cutoff"] for r in rows] == list(_VC_CUTS)
    cov = [r["coverage_ppm"] for r in rows]
    assert cov == sorted(cov)
    for r in rows:
        assert r["rank_used"] == min(r["cutoff"], r["vocab"])
        assert r["covered"] <= r["total"]


def test_kmeanspp_farthest_python_recount(spark):
    """Recount the farthest-point rounds in exact Python integers."""
    emb = run_oracle("SELECT vec_id, embedding FROM embeddings", SF_DIR)
    qs = {
        int(r["vec_id"]): [
            math.floor(float(v) * 1_000_000 + 0.5)
            for v in r["embedding"][:_KPP_DIMS]
        ]
        for _, r in emb.iterrows()
    }

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    chosen = [0]
    expected = [(0, 0, 0)]
    for rnd in range(1, 4):
        best = None
        for vid, q in qs.items():
            if vid in chosen:
                continue
            mind = min(d2(q, qs[c]) for c in chosen)
            key = (-mind, vid)
            if best is None or key < best[0]:
                best = (key, vid, mind)
        chosen.append(best[1])
        expected.append((rnd, best[1], best[2]))
    rows = sorted(
        _BY_NAME["sim_kmeanspp_farthest_init"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["round"],
    )
    got = [(r["round"], r["vec_id"], r["mind2"]) for r in rows]
    assert got == expected


def test_grubbs_argmax_recount(spark):
    """The emitted candidate maximizes |x n - sum| (ties to smaller
    cents)."""
    r = _BY_NAME["agg_grubbs_outlier"].fn(spark, SF_DIR).collect()[0]
    o = run_oracle(
        "SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents"
        " FROM orders",
        SF_DIR,
    )["cents"].tolist()
    n, s = len(o), sum(o)
    best = min(((-abs(c * n - s), c) for c in o))
    assert (r["outlier_cents"], r["dev_num"], r["n"]) == (best[1], -best[0], n)
    assert r["g_e6"] > 0


def test_ljung_box_integer_expansion(spark):
    """Re-derive one autocorrelation from raw daily counts through the
    integer-scaled expansion and match r_e6."""
    rows = {r["lag"]: r for r in _BY_NAME["events_ljung_box"].fn(spark, SF_DIR).collect()}
    assert set(rows) == {1, 2, 3, 4, 5}
    daily = run_oracle(
        "SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS x"
        " FROM events GROUP BY 1 ORDER BY day",
        SF_DIR,
    )["x"].tolist()
    n, tot = len(daily), sum(daily)
    sxx = sum(x * x for x in daily)
    den = n * n * sxx - n * tot * tot
    for k in (1, 3):
        sxy = sum(daily[i] * daily[i - k] for i in range(k, n))
        head = sum(daily[: n - k])
        tail = sum(daily[k:])
        num = n * n * sxy - n * tot * (head + tail) + (n - k) * tot * tot
        r = rows[k]
        assert (r["num_scaled"], r["den_scaled"]) == (num, den)
        assert r["r_e6"] == math.floor(num / den * 1_000_000)
    assert all(r["q_e6"] == rows[1]["q_e6"] for r in rows.values())
    assert rows[1]["q_e6"] >= 0


def test_readability_counts_consistent(spark):
    rows = _BY_NAME["text_readability_fk"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows[:50]:
        assert r["syllables"] >= 1
        assert r["sentences"] >= 1
        grade = math.floor(
            (
                0.39 * r["words"] / r["sentences"]
                + 11.8 * r["syllables"] / r["words"]
                - 15.59
            )
            * 100
        )
        assert r["fk_grade_e2"] == grade


def test_rs_range_positive(spark):
    rows = sorted(
        _BY_NAME["orders_rs_range"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["w"],
    )
    assert [r["w"] for r in rows] == list(_RS_WINDOWS)
    for r in rows:
        assert r["n_blocks"] >= 1
        assert r["mean_rs_e6"] > 0
