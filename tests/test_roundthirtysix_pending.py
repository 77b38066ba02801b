"""Round-36 staging area (plans/roundthirtysix_pending.py): the
closing wave of the round-11 window — driver-shaped oracle checks plus
recounts of the span algebra, the Ansari-Bradley score identity, the
calibration-bin arithmetic, and the as-of tolerance semantics."""

from __future__ import annotations

import os

import pytest

from spotify_data_pipeline_spark.plans.roundthirtysix_pending import (
    _SP_K,
    _SP_MIN_TOKENS,
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
    from spotify_data_pipeline_spark.plans.active import R36_ACTIVATED

    qs = all_queries()
    by_name = {pq.name: pq for pq in PENDING}
    assert set(R36_ACTIVATED) == set(by_name)
    for name in R36_ACTIVATED:
        pq = by_name[name]
        assert name in qs and qs[name].fn is pq.fn
        assert qs[name].oracle == pq.oracle


def test_pending_names_unique_and_oracle_bearing():
    names = [pq.name for pq in PENDING]
    assert len(names) == len(set(names))
    assert all(pq.oracle for pq in PENDING)


def test_spans_consistent_with_runs(spark):
    """Every emitted span covers >= the flag threshold and agrees with
    dedup_substring_runs' per-doc maximum; spans within a doc are
    disjoint and ordered."""
    from spotify_data_pipeline_spark.plans.roundthirtyone_pending import (
        dedup_substring_runs_query,
    )

    spans = _BY_NAME["dedup_substring_spans"].fn(spark, SF_DIR).collect()
    assert spans
    runs = {
        r["doc_id"]: r for r in dedup_substring_runs_query(spark, SF_DIR).collect()
    }
    by_doc: dict[int, list] = {}
    for s in spans:
        assert s["span_tokens"] == s["end_token"] - s["start_token"] + 1
        assert s["span_tokens"] >= _SP_MIN_TOKENS
        by_doc.setdefault(s["doc_id"], []).append(s)
    for doc, ss in by_doc.items():
        ss.sort(key=lambda s: s["start_token"])
        for a, b in zip(ss, ss[1:]):
            # maximal runs of >= K-shingle islands cannot touch: a gap
            # of at least one non-duplicated shingle separates them
            assert a["end_token"] < b["start_token"]
        # the longest span matches the runs row's max_dup_run_tokens
        assert max(s["span_tokens"] for s in ss) == runs[doc][
            "max_dup_run_tokens"
        ]


def test_cross_snapshot_simhash_direction_and_bounds(spark):
    rows = _BY_NAME["dedup_cross_snapshot_simhash"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["id_new"] % 2 == 1 and r["id_old"] % 2 == 0
        assert 0 <= r["hamming"] <= 16
        assert r["near_dup"] == (1 if r["hamming"] <= 3 else 0)
        # band collision means at least one shared 8-bit half, so the
        # differing bits live in the other half: hamming <= 8
        assert r["hamming"] <= 8


def test_ansari_bradley_total_identity(spark):
    """sum of doubled AB scores over everyone is a closed form:
    for each rank r in 1..n the score is min(2r, 2(n+1)-2r) under no
    ties — with ties the per-value device still partitions the same
    total, pinned against the direct closed-form sum."""
    r = _BY_NAME["agg_ansari_bradley"].fn(spark, SF_DIR).collect()[0]
    n = r["n_r"] + r["n_n"]
    # recount the total from the value table (ties included)
    vals = run_oracle(
        "SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v,"
        " count(*) AS cnt FROM lineitem WHERE l_returnflag IN ('R','N')"
        " GROUP BY 1 ORDER BY 1",
        SF_DIR,
    )
    before = 0
    total = 0
    for _, row in vals.iterrows():
        cnt = int(row["cnt"])
        rank2 = 2 * (before + 1) + cnt - 1
        total += cnt * min(rank2, 2 * (n + 1) - rank2)
        before += cnt
    assert r["ab2_r"] + r["ab2_n"] == total
    assert r["ab2_r"] > 0 and r["ab2_n"] > 0


def test_calibration_bins_cover_corpus(spark):
    rows = sorted(
        _BY_NAME["ml_logit_calibration_bins"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["bin"],
    )
    assert [r["bin"] for r in rows] == list(range(1, 11))
    docs = run_oracle(
        "SELECT count(*) AS n FROM documents WHERE length(trim(text)) > 0",
        SF_DIR,
    )["n"][0]
    assert sum(r["n_docs"] for r in rows) == docs
    scores = [r["mean_score_e6"] for r in rows]
    assert scores == sorted(scores)  # ntile on score => monotone means
    assert all(0 <= r["en_rate_ppm"] <= 1_000_000 for r in rows)


def test_asof_tolerance_partitions_clicks(spark):
    rows = _BY_NAME["events_asof_tolerance"].fn(spark, SF_DIR).collect()
    assert rows
    total = sum(r["clicks"] for r in rows)
    n_clicks = run_oracle(
        "SELECT count(*) AS n FROM events WHERE event_type = 'click'", SF_DIR
    )["n"][0]
    assert total == n_clicks
    outcomes = {r["outcome"] for r in rows}
    assert outcomes <= {"matched", "stale_rejected", "never_matched"}
    assert "matched" in outcomes
