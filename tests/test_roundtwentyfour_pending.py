"""Round-24 staging area (plans/roundtwentyfour_pending.py): the
algorithmic-breadth wave — driver-shaped oracle checks, plan hygiene,
and independent pure-Python recounts (Brandes forward/backward pass,
dHash synthesis + banding with the pigeonhole recall guarantee, Bloom
no-false-negative law)."""

from __future__ import annotations

import hashlib
import math
import os

import pytest

from spotify_data_pipeline_spark.plans.roundtwentyfour_pending import (
    _BC_SOURCES,
    _BC_TOP,
    _BLOOM_EVAL_MOD,
    _BLOOM_K,
    _BLOOM_M,
    _DH_BANDS,
    _DH_BAND_BITS,
    _DH_BASE_DIV,
    _DH_COLS,
    _DH_MAX_HAMMING,
    _DH_NOISE_DELTA,
    _DH_NOISE_MOD,
    _DH_ROWS,
    PENDING,
)
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
    from spotify_data_pipeline_spark.plans.active import R24_ACTIVATED

    qs = all_queries()
    assert set(R24_ACTIVATED) == {pq.name for pq in PENDING}
    for pq in PENDING:
        assert pq.name in qs and qs[pq.name].fn is pq.fn
        assert qs[pq.name].oracle == pq.oracle


def test_pending_names_unique_and_oracle_bearing():
    names = [pq.name for pq in PENDING]
    assert len(names) == len(set(names))
    assert all(pq.oracle for pq in PENDING)
    from spotify_data_pipeline_spark.plans.roundtwentyone_pending import (
        PENDING as P21,
    )
    from spotify_data_pipeline_spark.plans.roundtwentythree_pending import (
        PENDING as P23,
    )
    from spotify_data_pipeline_spark.plans.roundtwentytwo_pending import (
        PENDING as P22,
    )

    for earlier in (P21, P22, P23):
        assert not set(names) & {pq.name for pq in earlier}


def _plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# no whitelisted nested loops in this wave: Brandes is all frontier
# equi-joins, dHash is a band equi-join, Bloom is bitmap semi-joins
# plus three 1-row stat broadcasts (the stat assembly crossJoins ARE
# 1-row broadcasts — whitelisted)
_BNLJ_OK = {"llm_decontam_bloom"}


@pytest.mark.parametrize("pq", PENDING, ids=lambda pq: pq.name)
def test_plans_no_unexpected_nested_loop(spark, pq):
    plan = _plan_of(pq.fn(spark, SF_DIR))
    if pq.name in _BNLJ_OK:
        return
    assert "BroadcastNestedLoopJoin" not in plan, pq.name
    assert "CartesianProduct" not in plan, pq.name


# ---------------------------------------------------------------------------
# recounts
# ---------------------------------------------------------------------------


def _q(name):
    return next(p for p in PENDING if p.name == name)


def _rows(spark, tbl):
    from spotify_data_pipeline_spark.io import load_table

    return load_table(spark, SF_DIR, tbl).collect()


def _md5_head15(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_brandes_python_recount(spark):
    rows = _q("graph_betweenness_brandes").fn(spark, SF_DIR).collect()
    assert rows
    orders = {r.o_orderkey: r.o_custkey for r in _rows(spark, "orders")}
    edges = set()
    for r in _rows(spark, "lineitem"):
        c = orders.get(r.l_orderkey)
        if c is not None:
            edges.add((r.l_suppkey, c))
    supp = sorted(r.s_suppkey for r in _rows(spark, "supplier"))
    seeds = supp[:_BC_SOURCES]
    adj_s = {}
    adj_c = {}
    for s, c in edges:
        adj_s.setdefault(s, set()).add(c)
        adj_c.setdefault(c, set()).add(s)
    bc: dict = {}
    for src in seeds:
        l1 = {c: 1 for c in adj_s.get(src, ())}
        l2: dict = {}
        for c in l1:
            for s in adj_c[c]:
                if s != src:
                    l2[s] = l2.get(s, 0) + l1[c]
        l3: dict = {}
        for s in l2:
            for c in adj_s[s]:
                if c not in l1:
                    l3[c] = l3.get(c, 0) + l2[s]
        d2 = {}
        for s in l2:
            t = 0
            for c in adj_s[s]:
                if c in l3:
                    t += math.floor(l2[s] * 1_000_000 / l3[c] + 0.5)
            d2[s] = t
        d1 = {}
        for c in l1:
            t = 0
            for s in adj_c[c]:
                if s in l2:
                    t += math.floor(
                        1 * (1_000_000 + d2[s]) / l2[s] + 0.5
                    )
            d1[c] = t
        for c, d in d1.items():
            bc[("customer", c)] = bc.get(("customer", c), 0) + d
        for s, d in d2.items():
            if d > 0:
                bc[("supplier", s)] = bc.get(("supplier", s), 0) + d
    order = sorted(bc, key=lambda k: (-bc[k], k[0], k[1]))[:_BC_TOP]
    expect = [(t, n, bc[(t, n)]) for t, n in order]
    got = [(r.node_type, r.node_id, r.bc_e6) for r in rows]
    assert got == expect
    # the s != src guard (a source brokers no paths in its OWN BFS,
    # though it may broker another seed's) is pinned by the exact
    # recount equality above; dependencies are strictly positive
    assert all(v > 0 for _, _, v in got)
    assert seeds  # the seed set itself is non-vacuous


def _dh_hashes(doc_ids):
    hashes = {}
    for did in doc_ids:
        base = did // _DH_BASE_DIV
        g = {}
        for r in range(_DH_ROWS):
            for c in range(_DH_COLS):
                v = _md5_head15(f"px:{r}:{c}:{base}") % 256
                if _md5_head15(f"nz:{r}:{c}:{did}") % _DH_NOISE_MOD == 0:
                    v += _DH_NOISE_DELTA
                g[(r, c)] = v
        h = 0
        bit = 0
        for r in range(_DH_ROWS):
            for c in range(_DH_COLS - 1):
                if g[(r, c)] > g[(r, c + 1)]:
                    h += 1 << bit
                bit += 1
        hashes[did] = h
    return hashes


def test_dhash_python_recount_and_pigeonhole_recall(spark):
    rows = _q("multimodal_dhash_neardup").fn(spark, SF_DIR).collect()
    assert rows
    doc_ids = sorted(r.doc_id for r in _rows(spark, "documents"))
    hashes = _dh_hashes(doc_ids)

    def bands_of(h):
        return {
            (b, (h >> (b * _DH_BAND_BITS)) % (1 << _DH_BAND_BITS))
            for b in range(_DH_BANDS)
        }

    bset = {did: bands_of(h) for did, h in hashes.items()}
    expect = {}
    ids = sorted(hashes)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ham = bin(hashes[a] ^ hashes[b]).count("1")
            if ham <= _DH_MAX_HAMMING and bset[a] & bset[b]:
                expect[(a, b)] = (
                    ham,
                    a // _DH_BASE_DIV == b // _DH_BASE_DIV,
                )
    got = {(r.id_a, r.id_b): (r.hamming, r.same_base) for r in rows}
    assert got == expect
    # pigeonhole guarantee: any pair within Hamming < number of bands
    # MUST share an untouched band, so banding cannot miss it
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ham = bin(hashes[a] ^ hashes[b]).count("1")
            if ham < _DH_BANDS:
                assert (a, b) in got, (a, b, ham)
    # the synthesis creates real re-encode families: same-base pairs
    # dominate the matches
    same = sum(1 for v in got.values() if v[1])
    assert same > len(got) // 2


def _py_tokens(text: str) -> list[str]:
    t = " ".join(text.split()).strip().lower()
    return t.split(" ") if t else []


def test_bloom_python_recount_and_no_false_negatives(spark):
    row = _q("llm_decontam_bloom").fn(spark, SF_DIR).collect()[0]
    docs = [
        r
        for r in _rows(spark, "documents")
        if r.text is not None and r.text.strip()
    ]

    def grams(text):
        toks = _py_tokens(text)
        if len(toks) >= 8:
            return {
                " ".join(toks[i : i + 8]) for i in range(len(toks) - 7)
            }
        return {" ".join(toks)}

    eval_grams = set()
    corpus = []
    for d in docs:
        gs = grams(d.text)
        if d.doc_id % _BLOOM_EVAL_MOD == 0:
            eval_grams |= gs
        else:
            corpus.append((d.doc_id, gs))
    bits = {
        _md5_head15(f"b{k}:{g}") % _BLOOM_M
        for g in eval_grams
        for k in range(_BLOOM_K)
    }
    flagged_grams = flagged_docs = exact_grams = exact_docs = total = 0
    for did, gs in corpus:
        f = e = 0
        for g in gs:
            total += 1
            if all(
                _md5_head15(f"b{k}:{g}") % _BLOOM_M in bits
                for k in range(_BLOOM_K)
            ):
                f += 1
            if g in eval_grams:
                e += 1
        flagged_grams += f
        exact_grams += e
        flagged_docs += 1 if f else 0
        exact_docs += 1 if e else 0
    assert (
        row.corpus_grams,
        row.flagged_grams,
        row.exact_grams,
        row.false_positive_grams,
        row.flagged_docs,
        row.exact_docs,
    ) == (
        total,
        flagged_grams,
        exact_grams,
        flagged_grams - exact_grams,
        flagged_docs,
        exact_docs,
    )
    assert row.fp_ppm == ((flagged_grams - exact_grams) * 1_000_000) // total
    # the Bloom law: no false negatives, ever
    assert row.flagged_grams >= row.exact_grams
    assert row.flagged_docs >= row.exact_docs
    assert row.false_positive_grams >= 0
