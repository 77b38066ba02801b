"""Round-19 staging area (plans/roundnineteen_pending.py): the
curation/ops breadth wave — driver-shaped oracle checks, plan
hygiene, and pure-Python recounts."""

from __future__ import annotations

import hashlib
import math
import os

import pytest

from spotify_data_pipeline_spark.plans.roundnineteen_pending import PENDING
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
    """Round-10 activated the whole module (plans/active.py,
    NOTES_r09 §9 order)."""
    from spotify_data_pipeline_spark.plans import all_queries
    from spotify_data_pipeline_spark.plans.active import R19_ACTIVATED

    qs = all_queries()
    assert set(R19_ACTIVATED) == {pq.name for pq in PENDING}
    for pq in PENDING:
        assert pq.name in qs and qs[pq.name].fn is pq.fn
        assert qs[pq.name].oracle == pq.oracle


def test_pending_names_unique_and_oracle_bearing():
    names = [pq.name for pq in PENDING]
    assert len(names) == len(set(names))
    assert all(pq.oracle for pq in PENDING)
    from spotify_data_pipeline_spark.plans.roundeighteen_pending import (
        PENDING as P18,
    )
    from spotify_data_pipeline_spark.plans.roundfifteen_pending import PENDING as P15
    from spotify_data_pipeline_spark.plans.roundseventeen_pending import (
        PENDING as P17,
    )
    from spotify_data_pipeline_spark.plans.roundsixteen_pending import PENDING as P16

    for earlier in (P15, P16, P17, P18):
        assert not set(names) & {pq.name for pq in earlier}


def _plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# whitelisted bounded nested-loop sides:
#   lineitem_supplier_hhi — three 1-row aggregates assembled by
#   broadcast cross join (the graph_triangle_count pattern)
_BNLJ_OK = {"lineitem_supplier_hhi"}


@pytest.mark.parametrize("pq", PENDING, ids=lambda pq: pq.name)
def test_plans_no_unexpected_nested_loop(spark, pq):
    plan = _plan_of(pq.fn(spark, SF_DIR))
    if pq.name in _BNLJ_OK:
        return
    assert "BroadcastNestedLoopJoin" not in plan, pq.name
    assert "CartesianProduct" not in plan, pq.name


def _py_tokens(text: str) -> list[str]:
    t = " ".join(text.split()).strip().lower()
    return t.split(" ") if t else []


def _doc_rows(spark):
    from spotify_data_pipeline_spark.io import load_table

    return [
        r
        for r in load_table(spark, SF_DIR, "documents").collect()
        if r.text is not None and r.text.strip()
    ]


def _sh3(text):
    toks = _py_tokens(text)
    if len(toks) >= 3:
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
    return {" ".join(toks)}


def test_containment_python_recount_and_asymmetry(spark):
    """Containment recounted from raw shingle sets with the same df
    cap; the relation is genuinely asymmetric (ordered pairs)."""
    from spotify_data_pipeline_spark.plans.roundnineteen_pending import (
        _CONTAIN_DF_CAP,
        _CONTAIN_MIN_PPM,
        dedup_shingle_containment_query,
    )

    rows = dedup_shingle_containment_query(spark, SF_DIR).collect()
    assert rows
    docs = _doc_rows(spark)
    sets = {d.doc_id: _sh3(d.text) for d in docs}
    df: dict[str, int] = {}
    for s in sets.values():
        for x in s:
            df[x] = df.get(x, 0) + 1
    keep = {x for x, c in df.items() if c <= _CONTAIN_DF_CAP}
    expect = {}
    for a, sa in sets.items():
        ka = sa & keep
        if not sa:
            continue
        for b, sb in sets.items():
            if a == b:
                continue
            common = len(ka & sb)
            ppm = (common * 1_000_000) // len(sa)
            if ppm >= _CONTAIN_MIN_PPM:
                expect[(a, b)] = (common, len(sa), ppm)
    got = {
        (r.contained_id, r.container_id): (
            r.n_common,
            r.n_contained_shingles,
            r.containment_ppm,
        )
        for r in rows
    }
    assert got == expect
    # the measure is genuinely directional: some ordered pair is
    # one-way, or a mutual pair carries different ppm per direction
    # (equal-size exact twins would tie — then sizes must all match)
    directional = any((b, a) not in got for (a, b) in got) or any(
        (b, a) in got and got[(a, b)][2] != got[(b, a)][2] for (a, b) in got
    )
    if not directional:
        assert all(
            got[(a, b)][1] == got[(b, a)][1] for (a, b) in got if (b, a) in got
        )


def test_shard_manifest_python_recount(spark):
    """Shard assignment recounted with hashlib md5; every doc lands in
    exactly one shard and totals reconcile."""
    from spotify_data_pipeline_spark.plans.roundnineteen_pending import (
        _N_SHARDS,
        llm_shard_manifest_query,
    )

    rows = llm_shard_manifest_query(spark, SF_DIR).collect()
    assert len(rows) == _N_SHARDS
    docs = _doc_rows(spark)
    counts = [0] * _N_SHARDS
    toks = [0] * _N_SHARDS
    for d in docs:
        h = hashlib.md5(f"shard:{d.doc_id}".encode()).hexdigest()
        shard = int(h[:15], 16) % _N_SHARDS
        counts[shard] += 1
        toks[shard] += len(_py_tokens(d.text))
    for r in rows:
        assert r.n_docs == counts[r.shard]
        assert r.n_tokens == toks[r.shard]
    assert sum(r.n_docs for r in rows) == len(docs)


def test_centroid_drift_bounds_and_recount(spark):
    from spotify_data_pipeline_spark.io import load_table
    from spotify_data_pipeline_spark.plans.roundnineteen_pending import (
        _QUANT,
        sim_source_centroid_drift_query,
    )

    rows = sim_source_centroid_drift_query(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert -10_000 <= r.cosine_e4 <= 10_000
        assert r.label_a < r.label_b
    emb = load_table(spark, SF_DIR, "embeddings").collect()
    sums: dict = {}
    for e in emb:
        q = [math.floor(float(x) * _QUANT + 0.5) for x in e.embedding]
        s = sums.setdefault(e.label, [0] * len(q))
        for i, v in enumerate(q):
            s[i] += v
    mid = rows[len(rows) // 2]
    sa, sb = sums[mid.label_a], sums[mid.label_b]
    dot = sum(x * y for x, y in zip(sa, sb))
    naa = sum(x * x for x in sa)
    nbb = sum(y * y for y in sb)
    cos = dot / (math.sqrt(naa) * math.sqrt(nbb))
    assert mid.cosine_e4 == math.floor(cos * 10_000 + 0.5)


def test_stopword_profile_recount(spark):
    from spotify_data_pipeline_spark.plans.roundnineteen_pending import (
        _STOPWORDS,
        text_stopword_profile_query,
    )

    rows = text_stopword_profile_query(spark, SF_DIR).collect()
    assert rows
    docs = _doc_rows(spark)
    src = rows[0].source
    toks = [t for d in docs if d.source == src for t in _py_tokens(d.text)]
    stop = sum(1 for t in toks if t in _STOPWORDS)
    short = sum(1 for t in toks if len(t) <= 2)
    got = rows[0]
    assert got.n_tokens == len(toks)
    assert got.stopword_ppm == (stop * 1_000_000) // len(toks)
    assert got.short_token_ppm == (short * 1_000_000) // len(toks)
    assert got.avg_token_len_e2 == (sum(len(t) for t in toks) * 100) // len(toks)


def test_supplier_hhi_identities(spark):
    """HHI bounds: 1e6/N ≤ HHI ≤ 1e6 (up to ppm truncation), and the
    top share is at least the even share."""
    from spotify_data_pipeline_spark.plans.roundnineteen_pending import (
        lineitem_supplier_hhi_query,
    )

    r = lineitem_supplier_hhi_query(spark, SF_DIR).collect()[0]
    assert r.n_suppliers > 1
    even = 1_000_000 // r.n_suppliers
    assert even - r.n_suppliers <= r.hhi <= 1_000_000
    assert r.top_share_ppm >= even
    assert r.revenue_cents > 0 and r.top_suppkey >= 0


def test_price_dispersion_python_recount(spark):
    from spotify_data_pipeline_spark.io import load_table
    from spotify_data_pipeline_spark.plans.roundnineteen_pending import (
        part_price_dispersion_query,
    )

    rows = part_price_dispersion_query(spark, SF_DIR).collect()
    assert rows
    parts = load_table(spark, SF_DIR, "part").collect()
    brand = rows[0].brand
    cents = [
        math.floor(float(p.p_retailprice) * 100 + 0.5)
        for p in parts
        if p.p_brand == brand
    ]
    n, s1 = len(cents), sum(cents)
    s2 = sum(c * c for c in cents)
    cv = math.sqrt(n * s2 - s1 * s1) / s1
    got = rows[0]
    assert got.n_parts == n
    assert got.mean_cents == s1 // n
    assert got.cv_e4 == math.floor(cv * 10_000 + 0.5)
