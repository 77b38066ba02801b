"""Round-34 staging area (plans/roundthirtyfour_pending.py): eval /
ops / multimodal wave — driver-shaped oracle checks plus recounts of
the load-bearing claims (held-out gap direction, ROUGE set algebra,
randomization p bounds, KS integer device, pHash family collisions)."""

from __future__ import annotations

import os

import pytest

from spotify_data_pipeline_spark.plans.roundthirtyfour_pending import (
    _PERM_K,
    _PH_BASE_DIV,
    _PH_COS,
    _PH_N,
    _SB_SHARDS,
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
    from spotify_data_pipeline_spark.plans.active import R34_ACTIVATED

    qs = all_queries()
    by_name = {pq.name: pq for pq in PENDING}
    assert set(R34_ACTIVATED) == set(by_name)
    for name in R34_ACTIVATED:
        pq = by_name[name]
        assert name in qs and qs[name].fn is pq.fn
        assert qs[name].oracle == pq.oracle


def test_pending_names_unique_and_oracle_bearing():
    names = [pq.name for pq in PENDING]
    assert len(names) == len(set(names))
    assert all(pq.oracle for pq in PENDING)


def test_heldout_gap_direction(spark):
    """The LM is trained on the train split, so held-out cross-entropy
    is at least the train cross-entropy (up to e6 quanta)."""
    rows = {r["split"]: r for r in _BY_NAME["llm_bigram_heldout_gap"].fn(spark, SF_DIR).collect()}
    assert set(rows) == {"train", "heldout"}
    assert rows["heldout"]["xent_e6"] >= rows["train"]["xent_e6"]
    assert rows["train"]["n_bigrams"] > 0 and rows["heldout"]["n_bigrams"] > 0


def test_rouge_set_algebra(spark):
    """overlap <= min(ref, cand) grams; precision/recall/F1 bounded by
    1e6; F1 between min and max of P and R."""
    rows = _BY_NAME["llm_rouge_n_paired"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["overlap"] <= min(r["ref_grams"], r["cand_grams"])
        assert 0 <= r["recall_ppm"] <= 1_000_000
        assert 0 <= r["precision_ppm"] <= 1_000_000
        if r["overlap"]:
            lo, hi = sorted((r["precision_ppm"], r["recall_ppm"]))
            # integer-DIV harmonic mean sits within [lo-1, hi]
            assert lo - 1 <= r["f1_ppm"] <= hi


def test_ablation_matrix_monotone(spark):
    """Joint removal (a AND b) never exceeds either single removal,
    and the diagonal rows are the single-filter counts."""
    rows = {
        (r["filter_a"], r["filter_b"]): r
        for r in _BY_NAME["llm_filter_ablation_matrix"].fn(spark, SF_DIR).collect()
    }
    assert len(rows) == 10
    singles = {a: rows[(a, a)] for a, b in rows if a == b}
    for (a, b), r in rows.items():
        if a != b:
            assert r["docs_removed"] <= singles[a]["docs_removed"]
            assert r["docs_removed"] <= singles[b]["docs_removed"]
            assert r["tokens_removed"] <= singles[a]["tokens_removed"]


def test_permutation_p_bounds(spark):
    """n_geq within [0, k]; p_ppm = (n_geq+1) * 1e6 // (k+1); group
    sizes sum to the corpus."""
    r = _BY_NAME["agg_permutation_test_md5"].fn(spark, SF_DIR).collect()[0]
    assert 0 <= r["n_geq"] <= _PERM_K
    assert r["p_ppm"] == (r["n_geq"] + 1) * 1_000_000 // (_PERM_K + 1)
    docs = run_oracle(
        "SELECT count(*) AS n FROM documents WHERE length(trim(text)) > 0",
        SF_DIR,
    )["n"][0]
    assert r["n_en"] + r["n_other"] == docs


def test_dispersion_pieces_rederive(spark):
    """The e6 statistic re-derives from the emitted integer moments."""
    import math

    r = _BY_NAME["events_poisson_dispersion"].fn(spark, SF_DIR).collect()[0]
    n, tot, ssq = r["n_buckets"], r["total_events"], r["ssq"]
    var = (ssq - tot * tot / n) / (n - 1)
    mean = tot / n
    assert r["dispersion_e6"] == math.floor(var / mean * 1_000_000)


def test_ks_pure_integer_recount(spark):
    """Recount the two-sided KS D in exact Python integers."""
    r = _BY_NAME["agg_ks_uniform_dates"].fn(spark, SF_DIR).collect()[0]
    days = run_oracle(
        "SELECT CAST(datediff('day', TIMESTAMP '1970-01-01', o_orderdate)"
        " AS BIGINT) AS day FROM orders ORDER BY day",
        SF_DIR,
    )["day"].tolist()
    n = len(days)
    dmin, dmax = days[0], days[-1]
    m = dmax - dmin + 1
    from collections import Counter

    cnt = Counter(days)
    cum = 0
    d_num = 0
    for d in sorted(cnt):
        before = cum
        cum += cnt[d]
        k = d - dmin + 1
        d_num = max(d_num, abs(cum * m - k * n), abs(before * m - k * n))
    assert (r["n"], r["m"], r["d_num"]) == (n, m, d_num)
    assert r["d_ppm"] == d_num * 1_000_000 // (n * m)


def test_shard_balance_consistency(spark):
    rows = _BY_NAME["ops_shard_balance_audit"].fn(spark, SF_DIR).collect()
    assert 1 <= len(rows) <= _SB_SHARDS
    mx = max(r["tokens"] for r in rows)
    assert all(r["max_tokens"] == mx for r in rows)
    assert all(r["straggler_ppm"] >= 1_000_000 for r in rows)


def test_phash_families_collide(spark):
    """Same-source re-encodes (one noisy pixel in ~17) should mostly
    collide within Hamming 3 — the pHash robustness claim; and every
    pair stays within its synthesis family."""
    rows = _BY_NAME["multimodal_phash_dct"].fn(spark, SF_DIR).collect()
    assert rows
    same = sum(1 for r in rows if r["same_source"] == 1)
    assert same / len(rows) > 0.8
    for r in rows[:50]:
        assert r["id_a"] // _PH_BASE_DIV == r["family"]
        assert r["id_b"] // _PH_BASE_DIV == r["family"]
        assert 0 <= r["hamming"] <= 15


def test_dct_table_is_orthogonal_enough():
    """The authoring-time cosine table is the DCT-II basis at e4
    quantization: row u dotted with itself ~ N/2 * 1e8 (u > 0)."""
    for u in range(1, _PH_N):
        dot = sum(_PH_COS[u][x] * _PH_COS[u][x] for x in range(_PH_N))
        assert abs(dot - _PH_N // 2 * 10**8) < 10**6
