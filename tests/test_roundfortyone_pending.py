"""Round-41 staging area (plans/roundfortyone_pending.py): STAGED FOR
ROUND 13 — carries the full kit (exact oracles verified at the dev SF,
scipy-free Python recounts of every law) but NOT registered until next
round's activation edit in plans/active.py."""

from __future__ import annotations

import hashlib
import math
import os
import re
from collections import defaultdict

import pytest

from spotify_data_pipeline_spark.plans.roundfortyone_pending import (
    _BU_EVAL_MOD,
    _BU_K,
    _BU_M,
    _PO_DIMS,
    _PO_K,
    _PO_QUERY_MOD,
    _PS_FIXED_ROW_BYTES,
    _PS_TARGET_BYTES,
    _RP_HOT_DAYS,
    _RP_WARM_DAYS,
    PENDING,
)
from tests.oracle_check import compare, run_oracle

SF_DIR = os.environ.get("ORACLE_SF", "/root/testdata/sf0.001")

_BY_NAME = {pq.name: pq for pq in PENDING}

#: documented 1-row / bounded broadcast assemblies (read by
#: tools/plan_audit.py; these move to test_plan_hygiene's whitelist
#: when the module activates in round 13):
#: - bloom_union_law: five 1-row count aggregates by broadcast crossJoin
#: - retention_policy_audit: 1-row high-water-mark broadcast
#: - pq_exact_topk_overlap: bounded probe-set broadcast crossJoin
_BNLJ_OK = {
    "dedup_bloom_union_law",
    "ops_retention_policy_audit",
    "sim_pq_exact_topk_overlap",
}


def _norm_tokens(text: str) -> list[str]:
    t = re.sub(r"\s+", " ", text).strip().lower()
    return t.split(" ") if t else []


def _md5_mod(s: str, m: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % m


@pytest.mark.parametrize("pq", PENDING, ids=lambda pq: pq.name)
def test_pending_oracle_match(spark, pq):
    result = pq.fn(spark, SF_DIR)
    oracle = run_oracle(pq.oracle, SF_DIR)
    errs = compare(result, oracle)
    assert not errs, f"{pq.name}: " + "; ".join(errs)
    assert len(oracle) > 0, f"{pq.name}: vacuous (0 oracle rows) at {SF_DIR}"


def test_pending_not_yet_registered(spark):
    """The round-12 window is full (50/50): this module activates in
    round 13."""
    from spotify_data_pipeline_spark.plans import all_queries

    qs = all_queries()
    assert not {pq.name for pq in PENDING} & set(qs)


def test_pending_names_unique_and_oracle_bearing():
    names = [pq.name for pq in PENDING]
    assert len(names) == len(set(names))
    assert all(pq.oracle for pq in PENDING)


def test_bloom_union_law_full_recount(spark):
    """The bit sets recomputed in Python md5 arithmetic; the law holds
    and the halves genuinely overlap (shared bits > 0 proves the law
    is not vacuous set-disjointness)."""
    import duckdb

    r = _BY_NAME["dedup_bloom_union_law"].fn(spark, SF_DIR).collect()[0]
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet' "
        f"WHERE length(trim(text)) > 0 AND doc_id % {_BU_EVAL_MOD} = 0"
    ).fetchall()
    bits = {True: set(), False: set()}
    for doc_id, text in docs:
        toks = _norm_tokens(text)
        if len(toks) >= 8:
            grams = {" ".join(toks[i : i + 8]) for i in range(len(toks) - 7)}
        else:
            grams = {" ".join(toks)}
        half_a = doc_id % 2 == 0
        for g in grams:
            for k in range(_BU_K):
                bits[half_a].add(_md5_mod(f"b{k}:" + g, _BU_M))
    assert r["bits_a"] == len(bits[True])
    assert r["bits_b"] == len(bits[False])
    assert r["bits_union"] == len(bits[True] | bits[False])
    assert r["bits_rebuilt"] == r["bits_union"]
    assert r["union_eq_rebuilt"] == 1
    assert len(bits[True] & bits[False]) > 0  # law is non-vacuous


def test_url_canonical_collapse_pinned(spark):
    """Every domain collapses its 3 embedded variants to 1 canonical
    URL: raw = 3 * canon and collapse_ppm = 666666 on every row."""
    rows = _BY_NAME["dedup_url_canonical"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["raw_urls"] == 3 * r["canon_urls"], r["domain"]
        assert r["collapse_ppm"] == 666666


def test_retention_tiers_full_recount(spark):
    """Tier census recomputed from raw timestamps; tiers partition the
    corpus exactly."""
    import duckdb

    rows = {
        r["tier"]: r
        for r in _BY_NAME["ops_retention_policy_audit"].fn(spark, SF_DIR).collect()
    }
    ev = duckdb.sql(
        f"SELECT CAST(ts AS DATE) AS day, value FROM '{SF_DIR}/events.parquet'"
    ).fetchall()
    hwm = max(d for d, _ in ev)
    agg: dict[str, list[object]] = defaultdict(lambda: [set(), 0, 0])
    for day, value in ev:
        age = (hwm - day).days
        tier = (
            "1-hot"
            if age <= _RP_HOT_DAYS
            else ("2-warm" if age <= _RP_WARM_DAYS else "3-expired")
        )
        a = agg[tier]
        a[0].add(day)
        a[1] += 1
        a[2] += math.floor(value * 100 + 0.5)
    assert set(rows) == set(agg)
    for tier, (days, n, cents) in agg.items():
        r = rows[tier]
        assert [r["n_days"], r["n_events"], r["value_cents"]] == [len(days), n, cents]
    assert sum(r["n_events"] for r in rows.values()) == len(ev)


def test_pq_overlap_full_recount(spark):
    """Exact-L2 and Hamming top-5 recomputed in Python integers; the
    overlap column matches and is bounded by k."""
    import duckdb

    rows = {
        r["probe_id"]: r
        for r in _BY_NAME["sim_pq_exact_topk_overlap"].fn(spark, SF_DIR).collect()
    }
    raw = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF_DIR}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    q = {
        vid: [math.floor(float(x) * 1_000_000 + 0.5) for x in emb]
        for vid, emb in raw
    }
    codes = {
        vid: sum((1 << i) for i in range(_PO_DIMS) if vec[i] >= 0)
        for vid, vec in q.items()
    }
    probes = [vid for vid in q if vid % _PO_QUERY_MOD == 0]
    assert set(rows) == set(probes)
    for p in probes:
        cands = [v for v in q if v != p]
        top_e = sorted(
            cands,
            key=lambda v: (sum((q[v][i] - q[p][i]) ** 2 for i in range(_PO_DIMS)), v),
        )[:_PO_K]
        top_h = sorted(
            cands, key=lambda v: (bin(codes[v] ^ codes[p]).count("1"), v)
        )[:_PO_K]
        ov = len(set(top_e) & set(top_h))
        assert rows[p]["overlap_at_5"] == ov, p
        assert 0 <= ov <= _PO_K
        assert rows[p]["k"] == _PO_K


def test_partition_plan_full_recount(spark):
    """Byte accounting and file arithmetic recomputed from the raw
    events; ceil/floor identities hold on every day row."""
    import duckdb

    rows = {
        r["day"]: r
        for r in _BY_NAME["ops_partition_size_plan"].fn(spark, SF_DIR).collect()
    }
    ev = duckdb.sql(
        f"SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, "
        f"coalesce(event_type, '') AS et, coalesce(props, '') AS pr "
        f"FROM '{SF_DIR}/events.parquet'"
    ).fetchall()
    agg: dict[str, list[int]] = defaultdict(lambda: [0, 0])
    for day, et, pr in ev:
        a = agg[day]
        a[0] += 1
        a[1] += _PS_FIXED_ROW_BYTES + len(et) + len(pr)
    assert set(rows) == set(agg)
    for day, (n, b) in agg.items():
        r = rows[day]
        files = (b + _PS_TARGET_BYTES - 1) // _PS_TARGET_BYTES
        assert [r["n_rows"], r["est_bytes"], r["n_files"]] == [n, b, files]
        assert r["bytes_per_file"] == b // files
        assert r["small_files_flag"] == int(
            files > 1 and b // files < _PS_TARGET_BYTES // 2
        )
        # file arithmetic sanity: files cover the bytes
        assert files * _PS_TARGET_BYTES >= b
