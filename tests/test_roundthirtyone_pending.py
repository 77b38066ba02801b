"""Round-31 staging area (plans/roundthirtyone_pending.py): the
post-backlog dedup & curation wave — driver-shaped oracle checks plus
pure-Python recounts of the load-bearing laws (substring-run lattice,
MinHash mergeability, water-filling feasibility, the Fisher-step
closed form)."""

from __future__ import annotations

import hashlib
import os
import re

import pytest

from spotify_data_pipeline_spark.plans.roundthirtyone_pending import (
    _SUB_FLAG_TOKENS,
    _SUB_K,
    _WF_BUDGET_DEN,
    _WF_BUDGET_NUM,
    PENDING,
)
from tests.oracle_check import compare, run_oracle

SF_DIR = os.environ.get("ORACLE_SF", "/root/testdata/sf0.001")

_BY_NAME = {pq.name: pq for pq in PENDING}


def _norm_tokens(text: str) -> list[str]:
    t = re.sub(r"\s+", " ", text).strip().lower()
    return t.split(" ") if t else []


@pytest.mark.parametrize("pq", PENDING, ids=lambda pq: pq.name)
def test_pending_oracle_match(spark, pq):
    result = pq.fn(spark, SF_DIR)
    oracle = run_oracle(pq.oracle, SF_DIR)
    errs = compare(result, oracle)
    assert not errs, f"{pq.name}: " + "; ".join(errs)
    assert len(oracle) > 0, f"{pq.name}: vacuous (0 oracle rows) at {SF_DIR}"


def test_pending_registered(spark):
    from spotify_data_pipeline_spark.plans import all_queries
    from spotify_data_pipeline_spark.plans.active import R31_ACTIVATED

    qs = all_queries()
    by_name = {pq.name: pq for pq in PENDING}
    assert set(R31_ACTIVATED) == set(by_name)
    for name in R31_ACTIVATED:
        pq = by_name[name]
        assert name in qs and qs[name].fn is pq.fn
        assert qs[name].oracle == pq.oracle


def test_pending_names_unique_and_oracle_bearing():
    names = [pq.name for pq in PENDING]
    assert len(names) == len(set(names))
    assert all(pq.oracle for pq in PENDING)


def test_substring_runs_python_recount(spark):
    """Recount the substring-run lattice for a handful of docs in pure
    Python: duplicated-shingle positions, maximal runs, and the
    r + k - 1 token arithmetic."""
    rows = {
        r["doc_id"]: r
        for r in _BY_NAME["dedup_substring_runs"].fn(spark, SF_DIR).collect()
    }
    docs = run_oracle("SELECT doc_id, text FROM documents", SF_DIR)
    # corpus-wide duplicated-shingle counts
    from collections import Counter

    counts: Counter = Counter()
    doc_shingles: dict[int, list[str]] = {}
    for _, d in docs.iterrows():
        toks = _norm_tokens(d["text"])
        if len(toks) < _SUB_K:
            continue
        sh = [
            " ".join(toks[i : i + _SUB_K]) for i in range(len(toks) - _SUB_K + 1)
        ]
        doc_shingles[d["doc_id"]] = sh
        counts.update(sh)
    checked = 0
    for doc_id, sh in sorted(doc_shingles.items())[:25]:
        dup_flags = [counts[s] >= 2 for s in sh]
        # maximal runs of consecutive True
        max_run = run = 0
        dup_total = 0
        for f in dup_flags:
            run = run + 1 if f else 0
            max_run = max(max_run, run)
            dup_total += 1 if f else 0
        r = rows[doc_id]
        assert r["n_shingles"] == len(sh)
        assert r["dup_shingles"] == dup_total
        expected_max = max_run + _SUB_K - 1 if max_run else 0
        assert r["max_dup_run_tokens"] == expected_max
        assert r["flagged"] == (1 if expected_max >= _SUB_FLAG_TOKENS else 0)
        checked += 1
    assert checked > 0


def test_merge_rebuild_law_holds_everywhere(spark):
    """min over a union == min of mins over the parts — every doc must
    report merged_eq_rebuilt = 1 (the mergeability law the 100 TB
    shard-union story rests on)."""
    rows = _BY_NAME["dedup_minhash_merge_rebuild"].fn(spark, SF_DIR).collect()
    assert rows
    assert all(r["merged_eq_rebuilt"] == 1 for r in rows)
    assert all(r["n_half_a"] + r["n_half_b"] >= 1 for r in rows)


def test_cross_snapshot_only_new_old_pairs(spark):
    """The incremental property: every candidate pair is NEW x OLD —
    id_new odd, id_old even; and estimates are multiples of 125000."""
    rows = _BY_NAME["dedup_cross_snapshot_minhash"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["id_new"] % 2 == 1
        assert r["id_old"] % 2 == 0
        assert r["est_jaccard_ppm"] == r["sig_matches"] * 125_000
        assert 1 <= r["sig_matches"] <= 8


def test_lsh_levenshtein_metrics_consistent(spark):
    """Verify-stage arithmetic: sim_ppm from (max_len - d) / max_len,
    edit distance within its metric bounds, confirmed flag matches."""
    rows = _BY_NAME["dedup_lsh_levenshtein_verify"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        m = max(r["len_a"], r["len_b"])
        assert abs(r["len_a"] - r["len_b"]) <= r["edit_dist"] <= m
        assert r["sim_ppm"] == (m - r["edit_dist"]) * 1_000_000 // m
        assert r["confirmed"] == (1 if r["sim_ppm"] >= 600_000 else 0)


def test_waterfill_allocation_feasible(spark):
    """Water-filling invariants: every allocation <= its cap, the
    total never exceeds the budget, the shortfall is smaller than the
    number of unsaturated domains (integer-floor slack), and every
    unsaturated domain receives the common level."""
    rows = _BY_NAME["llm_domain_mix_waterfill"].fn(spark, SF_DIR).collect()
    assert rows
    budget = rows[0]["budget"]
    lam = rows[0]["lambda_tokens"]
    total_alloc = sum(r["alloc_tokens"] for r in rows)
    n_unsat = sum(1 for r in rows if r["saturated"] == 0)
    assert total_alloc <= budget
    assert budget - total_alloc < max(n_unsat, 1)
    total_tokens = sum(r["toks"] for r in rows)
    assert budget == total_tokens * _WF_BUDGET_NUM // _WF_BUDGET_DEN
    for r in rows:
        assert r["alloc_tokens"] <= r["cap"]
        if r["saturated"] == 0:
            assert r["alloc_tokens"] == lam
            assert r["cap"] >= lam  # unsaturated means the cap didn't bind
        else:
            assert r["alloc_tokens"] == r["cap"]
            assert r["cap"] <= lam  # saturated caps sit below the water level


def test_saturation_curve_monotone_and_complete(spark):
    """The cumulative gram count is strictly increasing and its last
    value equals the corpus distinct-gram total (every gram owned by
    exactly one shard)."""
    rows = sorted(
        _BY_NAME["llm_shard_ngram_saturation"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["shard"],
    )
    assert rows
    cum = 0
    for r in rows:
        cum += r["new_grams"]
        assert r["cum_grams"] == cum
    assert sum(r["new_ppm"] for r in rows) <= 1_000_000


def test_fisher_step_closed_form(spark):
    """Recompute the Fisher-step weights in exact Python integers and
    match the e6-floored values the query serves."""
    import math

    docs = run_oracle(
        "SELECT lang, text FROM documents WHERE length(trim(text)) > 0", SF_DIR
    )
    n = sx = sxx = st = sxt = 0
    for _, d in docs.iterrows():
        x = len(_norm_tokens(d["text"]))
        y = 1 if d["lang"] == "en" else 0
        t = 2 * y - 1
        n += 1
        sx += x
        sxx += x * x
        st += t
        sxt += x * t
    det = float(n * sxx - sx * sx)
    w0 = math.floor(2.0 * (sxx * st - sx * sxt) / det * 1_000_000)
    w1 = math.floor(2.0 * (n * sxt - sx * st) / det * 1_000_000)
    rows = _BY_NAME["ml_logit_fisher_step"].fn(spark, SF_DIR).collect()
    assert rows
    assert all(r["w0_e6"] == w0 and r["w1_e6"] == w1 for r in rows)
    total = sum(r["n_cell"] for r in rows)
    correct = sum(r["n_cell"] for r in rows if r["y_true"] == r["pred"])
    assert rows[0]["acc_ppm"] == correct * 1_000_000 // total
    assert total == n


def test_dedup_impact_totals(spark):
    """Removal accounting: per-source totals sum to the corpus, and a
    doc is removed iff a lower doc_id shares its normalized-text md5."""
    rows = _BY_NAME["llm_dedup_impact_by_source"].fn(spark, SF_DIR).collect()
    docs = run_oracle(
        "SELECT doc_id, source, text FROM documents WHERE length(trim(text)) > 0",
        SF_DIR,
    )
    first: dict[str, int] = {}
    removed_by_source: dict[str, int] = {}
    total_by_source: dict[str, int] = {}
    for _, d in docs.sort_values("doc_id").iterrows():
        h = hashlib.md5(
            re.sub(r"\s+", " ", d["text"]).strip().lower().encode()
        ).hexdigest()
        total_by_source[d["source"]] = total_by_source.get(d["source"], 0) + 1
        if h in first:
            removed_by_source[d["source"]] = (
                removed_by_source.get(d["source"], 0) + 1
            )
        else:
            first[h] = d["doc_id"]
    for r in rows:
        assert r["docs_total"] == total_by_source[r["source"]]
        assert r["docs_removed"] == removed_by_source.get(r["source"], 0)
        assert (
            r["removed_ppm"]
            == r["docs_removed"] * 1_000_000 // r["docs_total"]
        )
