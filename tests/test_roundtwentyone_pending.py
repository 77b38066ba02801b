"""Round-21 staging area (plans/roundtwentyone_pending.py): the
LLM-curation depth wave — driver-shaped oracle checks, plan hygiene,
and independent pure-Python recounts of every algorithm (SemDeDup
cluster pruning, DSIR weights, bigram perplexity, C4 screen,
Matryoshka recall, NB quality classifier)."""

from __future__ import annotations

import hashlib
import math
import os

import pytest

from spotify_data_pipeline_spark.plans.roundtwentyone_pending import (
    _C4_CHUNK,
    _C4_MIN_SENTENCES,
    _DSIR_BUCKETS,
    _DSIR_TARGET,
    _DSIR_TOP,
    _MRL_K,
    _MRL_PREFIX,
    _MRL_QUERIES,
    _NBQ_BUCKETS,
    _PPL_WORST,
    _SEM_N_CENTROIDS,
    _SEM_THRESHOLD,
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
    from spotify_data_pipeline_spark.plans.active import R21_ACTIVATED

    qs = all_queries()
    assert set(R21_ACTIVATED) == {pq.name for pq in PENDING}
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
    from spotify_data_pipeline_spark.plans.roundnineteen_pending import (
        PENDING as P19,
    )
    from spotify_data_pipeline_spark.plans.roundseventeen_pending import (
        PENDING as P17,
    )
    from spotify_data_pipeline_spark.plans.roundsixteen_pending import PENDING as P16
    from spotify_data_pipeline_spark.plans.roundtwenty_pending import PENDING as P20

    for earlier in (P15, P16, P17, P18, P19, P20):
        assert not set(names) & {pq.name for pq in earlier}


def _plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# whitelisted bounded nested-loop sides (each is the established
# k-row/1-row broadcast pattern, never data×data):
#   sim_semdedup          — the 8-row fixed quantizer broadcast
#   llm_dsir_weights      — the 1-row corpus-totals broadcast
#   llm_bigram_doc_ppl    — the 1-row vocabulary-size broadcast
#   sim_matryoshka_recall — the 10-row query-set broadcast (brute
#                           anchor, the sim_cosine_topk precedent)
#   llm_nb_quality_filter — the 1-row totals + 1-row priors broadcasts
_BNLJ_OK = {
    "sim_semdedup",
    "llm_dsir_weights",
    "llm_bigram_doc_ppl",
    "sim_matryoshka_recall",
    "llm_nb_quality_filter",
}


@pytest.mark.parametrize("pq", PENDING, ids=lambda pq: pq.name)
def test_plans_no_unexpected_nested_loop(spark, pq):
    plan = _plan_of(pq.fn(spark, SF_DIR))
    if pq.name in _BNLJ_OK:
        return
    assert "BroadcastNestedLoopJoin" not in plan, pq.name
    assert "CartesianProduct" not in plan, pq.name


def test_semdedup_pair_join_is_cell_equi_join(spark):
    """The SemDeDup candidate join must key on the cell (equi-join),
    never an all-pairs nested loop over the corpus."""
    pq = next(p for p in PENDING if p.name == "sim_semdedup")
    plan = _plan_of(pq.fn(spark, SF_DIR))
    nested = plan.count("BroadcastNestedLoopJoin") + plan.count(
        "CartesianProduct"
    )
    # the assignment subtree (holding the bounded 8-row quantizer
    # broadcast) is lineage-cut with localCheckpoint, so the executed
    # pair-join plan references the materialized assignment and shows
    # ZERO nested loops — never a data×data nested loop either way
    assert nested == 0, plan[:2000]
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or (
        "BroadcastHashJoin" in plan
    ), plan[:2000]


# ---------------------------------------------------------------------------
# pure-Python recounts
# ---------------------------------------------------------------------------


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


def _emb_rows(spark):
    from spotify_data_pipeline_spark.io import load_table

    return sorted(
        load_table(spark, SF_DIR, "embeddings").collect(),
        key=lambda r: r.vec_id,
    )


def _seq_dot(a, b) -> float:
    """Sequential left-to-right float64 sum — mirrors F.aggregate /
    list_dot_product exactly (numpy's pairwise summation would not)."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def _cos(a, b) -> float:
    return _seq_dot(a, b) / (
        math.sqrt(_seq_dot(a, a)) * math.sqrt(_seq_dot(b, b))
    )


def _rnd4(x: float) -> float:
    return math.floor(x * 10000 + 0.5) / 10000


def _md5_bucket_py(s: str, n: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % n


def _e6_ln(x: float) -> int:
    return math.floor(math.log(x) * 1_000_000 + 0.5)


def test_semdedup_python_recount(spark):
    rows = (
        next(p for p in PENDING if p.name == "sim_semdedup")
        .fn(spark, SF_DIR)
        .collect()
    )
    assert rows
    emb = _emb_rows(spark)
    vecs = {r.vec_id: list(r.embedding) for r in emb}
    cents = {i: vecs[i] for i in range(_SEM_N_CENTROIDS)}
    cell = {}
    for vid, e in vecs.items():
        best = max(
            cents, key=lambda cid: (_cos(e, cents[cid]), -cid)
        )
        cell[vid] = best
    expect = {}
    for vid in sorted(vecs):
        cands = [
            a
            for a in sorted(vecs)
            if a < vid
            and cell[a] == cell[vid]
            and _rnd4(_cos(vecs[a], vecs[vid])) >= _SEM_THRESHOLD
        ]
        if cands:
            keeper = min(cands)
            expect[vid] = (
                keeper,
                cell[vid],
                _rnd4(_cos(vecs[keeper], vecs[vid])),
            )
    got = {r.removed_id: (r.keeper_id, r.cell, r.cos4) for r in rows}
    assert got == expect
    # a removed vector never keeps anything it was removed in favor of
    assert all(k not in got or got[k][0] != rid for rid, (k, _, _) in got.items())


def test_dsir_python_recount(spark):
    rows = (
        next(p for p in PENDING if p.name == "llm_dsir_weights")
        .fn(spark, SF_DIR)
        .collect()
    )
    assert len(rows) == _DSIR_TOP
    docs = _doc_rows(spark)
    buckets = {}
    n_t = n_r = 0
    doc_toks = {}
    for d in docs:
        bs = [
            _md5_bucket_py("dsir:" + t, _DSIR_BUCKETS)
            for t in _py_tokens(d.text)
        ]
        doc_toks[d.doc_id] = (d.source, bs)
        tgt = d.source in _DSIR_TARGET
        for b in bs:
            c = buckets.setdefault(b, [0, 0])
            c[0] += 1 if tgt else 0
            c[1] += 1
            n_t += 1 if tgt else 0
            n_r += 1
    lam = {
        b: _e6_ln((c_t + 1) / (n_t + _DSIR_BUCKETS))
        - _e6_ln((c_r + 1) / (n_r + _DSIR_BUCKETS))
        for b, (c_t, c_r) in buckets.items()
    }
    weights = {
        did: (src, len(bs), sum(lam[b] for b in bs))
        for did, (src, bs) in doc_toks.items()
        if bs
    }
    order = sorted(weights, key=lambda d: (-weights[d][2], d))[:_DSIR_TOP]
    expect = [
        (d, weights[d][0], weights[d][0] in _DSIR_TARGET, weights[d][1], weights[d][2])
        for d in order
    ]
    got = [
        (r.doc_id, r.source, r.is_target, r.n_tok, r.weight_e6) for r in rows
    ]
    assert got == expect
    # selection skews toward the target domain: the top slice is more
    # target-heavy than the corpus base rate
    base = sum(1 for d in docs if d.source in _DSIR_TARGET) / len(docs)
    assert sum(1 for r in rows if r.is_target) / len(rows) > base


def test_bigram_ppl_python_recount(spark):
    rows = (
        next(p for p in PENDING if p.name == "llm_bigram_doc_ppl")
        .fn(spark, SF_DIR)
        .collect()
    )
    assert len(rows) == _PPL_WORST
    docs = _doc_rows(spark)
    c1: dict[str, int] = {}
    c2: dict[tuple[str, str], int] = {}
    doc_bg = {}
    for d in docs:
        toks = _py_tokens(d.text)
        for t in toks:
            c1[t] = c1.get(t, 0) + 1
        bgs = list(zip(toks, toks[1:]))
        if bgs:
            doc_bg[d.doc_id] = (d.source, bgs)
        for bg in bgs:
            c2[bg] = c2.get(bg, 0) + 1
    v = len(c1)
    per_doc = {}
    for did, (src, bgs) in doc_bg.items():
        s = sum(
            _e6_ln((c2[bg] + 1) / (c1[bg[0]] + v)) for bg in bgs
        )
        per_doc[did] = (src, len(bgs), (-s) // len(bgs))
    order = sorted(per_doc, key=lambda d: (-per_doc[d][2], d))[:_PPL_WORST]
    expect = [(d, *per_doc[d]) for d in order]
    got = [(r.doc_id, r.source, r.n_bigrams, r.xent_e6) for r in rows]
    assert got == expect


def test_c4_screen_python_recount(spark):
    rows = (
        next(p for p in PENDING if p.name == "text_c4_screen")
        .fn(spark, SF_DIR)
        .collect()
    )
    assert rows
    docs = _doc_rows(spark)
    punct = ["", ".", "!", "?", "."]
    agg: dict[str, list[int]] = {}
    for d in docs:
        toks = _py_tokens(d.text)
        nchunk = (len(toks) + _C4_CHUNK - 1) // _C4_CHUNK
        lines = [
            " ".join(toks[i * _C4_CHUNK : (i + 1) * _C4_CHUNK])
            + punct[(d.doc_id + i) % 5]
            for i in range(nchunk)
        ]
        if d.doc_id % 7 == 0:
            lines.append("please enable javascript to continue.")
        if d.doc_id % 11 == 0:
            lines.append("lorem ipsum dolor sit amet.")
        if d.doc_id % 13 == 0:
            lines.append("widget { color red }")
        kept = [
            l
            for l in lines
            if l[-1:] in (".", "!", "?") and "javascript" not in l
        ]
        js = [
            l
            for l in lines
            if l[-1:] in (".", "!", "?") and "javascript" in l
        ]
        text = "\n".join(lines)
        lorem = "lorem ipsum" in text
        brace = "{" in text
        doc_kept = len(kept) >= _C4_MIN_SENTENCES and not lorem and not brace
        a = agg.setdefault(d.source, [0] * 7)
        a[0] += 1
        a[1] += 1 if doc_kept else 0
        a[2] += len(lines)
        a[3] += len(kept)
        a[4] += len(js)
        a[5] += 1 if lorem else 0
        a[6] += 1 if brace else 0
    got = {
        r.source: (
            r.n_docs,
            r.n_docs_kept,
            r.lines_total,
            r.lines_kept,
            r.js_lines,
            r.lorem_docs,
            r.brace_docs,
            r.kept_ppm,
        )
        for r in rows
    }
    expect = {
        src: (*a, (a[1] * 1_000_000) // a[0]) for src, a in agg.items()
    }
    assert got == expect
    # the screen discriminates: some docs are dropped and some kept
    total, kept_total = sum(a[0] for a in agg.values()), sum(
        a[1] for a in agg.values()
    )
    assert 0 < kept_total < total


def test_matryoshka_python_recount(spark):
    rows = (
        next(p for p in PENDING if p.name == "sim_matryoshka_recall")
        .fn(spark, SF_DIR)
        .collect()
    )
    assert len(rows) == _MRL_QUERIES
    emb = _emb_rows(spark)
    vecs = {r.vec_id: list(r.embedding) for r in emb}

    def top5(qid, prefix):
        qv = vecs[qid][:prefix] if prefix else vecs[qid]
        scored = sorted(
            (
                (-_rnd4(_cos(qv, (v[:prefix] if prefix else v))), nid)
                for nid, v in vecs.items()
                if nid != qid
            ),
        )[:_MRL_K]
        return [nid for _, nid in scored]

    for r in rows:
        f = top5(r.query_id, None)
        t = top5(r.query_id, _MRL_PREFIX)
        assert r.n_overlap == len(set(f) & set(t))
        assert r.full_top1 == f[0]
        assert r.trunc_top1 == t[0]
    # truncation is genuinely lossy somewhere but not useless
    overlaps = [r.n_overlap for r in rows]
    assert min(overlaps) < _MRL_K  # at least one query loses a neighbor
    assert max(overlaps) > 0  # and at least one keeps some


def test_nb_quality_python_recount(spark):
    row = (
        next(p for p in PENDING if p.name == "llm_nb_quality_filter")
        .fn(spark, SF_DIR)
        .collect()[0]
    )
    docs = _doc_rows(spark)
    buckets: dict[int, list[int]] = {}
    n_hq = n_lq = d_hq = d_lq = 0
    doc_b = {}
    for d in docs:
        hq = d.lang == "en"
        d_hq += 1 if hq else 0
        d_lq += 0 if hq else 1
        bs = [
            _md5_bucket_py("nbq:" + t, _NBQ_BUCKETS)
            for t in _py_tokens(d.text)
        ]
        doc_b[d.doc_id] = (hq, bs)
        for b in bs:
            c = buckets.setdefault(b, [0, 0])
            c[0] += 1 if hq else 0
            c[1] += 0 if hq else 1
            n_hq += 1 if hq else 0
            n_lq += 0 if hq else 1
    lw = {
        b: _e6_ln((c[0] + 1) / (n_hq + _NBQ_BUCKETS))
        - _e6_ln((c[1] + 1) / (n_lq + _NBQ_BUCKETS))
        for b, c in buckets.items()
    }
    prior = _e6_ln(d_hq / (d_hq + d_lq)) - _e6_ln(d_lq / (d_hq + d_lq))
    tp = fp = fn = tn = 0
    for hq, bs in doc_b.values():
        if not bs:
            continue
        pred = prior + sum(lw[b] for b in bs) >= 0
        if pred and hq:
            tp += 1
        elif pred:
            fp += 1
        elif hq:
            fn += 1
        else:
            tn += 1
    n = tp + fp + fn + tn
    assert (row.n_docs, row.tp, row.fp, row.fn, row.tn) == (n, tp, fp, fn, tn)
    assert row.accuracy_ppm == ((tp + tn) * 1_000_000) // n
    # the classifier is better than the majority-class baseline
    majority = max(tp + fn, fp + tn) * 1_000_000 // n
    assert row.accuracy_ppm > majority
