"""Round-32 staging area (plans/roundthirtytwo_pending.py): tokenizer /
embedding / serving wave — driver-shaped oracle checks plus
pure-Python recounts of the load-bearing algebra (MIPS monotonicity,
covariance closed form, ridge shrinkage, harmonic per-term floors)."""

from __future__ import annotations

import math
import os
import re

import pytest

from spotify_data_pipeline_spark.plans.roundthirtytwo_pending import (
    _COV_DIMS,
    _PAD_CTXS,
    _RIDGE_LAMBDAS,
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
    from spotify_data_pipeline_spark.plans.active import R32_ACTIVATED

    qs = all_queries()
    by_name = {pq.name: pq for pq in PENDING}
    assert set(R32_ACTIVATED) == set(by_name)
    for name in R32_ACTIVATED:
        pq = by_name[name]
        assert name in qs and qs[name].fn is pq.fn
        assert qs[name].oracle == pq.oracle


def test_pending_names_unique_and_oracle_bearing():
    names = [pq.name for pq in PENDING]
    assert len(names) == len(set(names))
    assert all(pq.oracle for pq in PENDING)


def test_fertility_identity(spark):
    """fertility_ppm is the exact integer quotient of the summed
    counts, and word/bpe totals sum to the corpus totals."""
    rows = _BY_NAME["text_fertility_by_lang"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["fertility_ppm"] == r["bpe_tokens"] * 1_000_000 // r["words"]
        assert r["chars_per_token_ppm"] == (
            r["chars"] * 1_000_000 // r["bpe_tokens"]
        )
        assert r["bpe_tokens"] >= r["words"]  # the regex splits words further


def test_padding_waste_python_recount(spark):
    """Recount the padding curve for every ctx in pure Python."""
    docs = run_oracle(
        "SELECT text FROM documents WHERE length(trim(text)) > 0", SF_DIR
    )
    toks = [
        len(re.sub(r"\s+", " ", t).strip().split(" ")) for t in docs["text"]
    ]
    rows = {
        r["ctx"]: r
        for r in _BY_NAME["llm_padding_waste_curve"].fn(spark, SF_DIR).collect()
    }
    for ctx in _PAD_CTXS:
        seqs = sum((t + ctx - 1) // ctx for t in toks)
        pad = seqs * ctx - sum(toks)
        r = rows[ctx]
        assert r["total_sequences"] == seqs
        assert r["pad_tokens"] == pad
        assert r["pad_ppm"] == pad * 1_000_000 // (seqs * ctx)
    # more context -> no fewer pad tokens per sequence volume ordering
    assert rows[_PAD_CTXS[0]]["total_sequences"] >= rows[_PAD_CTXS[-1]][
        "total_sequences"
    ]


def test_covariance_python_recount(spark):
    """Recount dim-pair covariance over the e6-quantized embeddings in
    exact Python integers; diagonal correlation must be exactly 1e6."""
    emb = run_oracle("SELECT embedding FROM embeddings", SF_DIR)
    qs = [
        [math.floor(float(v) * 1_000_000 + 0.5) for v in e[:_COV_DIMS]]
        for e in emb["embedding"]
    ]
    n = len(qs)
    rows = {
        (r["dim_i"], r["dim_j"]): r
        for r in _BY_NAME["sim_embedding_covariance"].fn(spark, SF_DIR).collect()
    }
    assert len(rows) == _COV_DIMS * (_COV_DIMS + 1) // 2
    import random

    rng = random.Random(7)
    pairs = list(rows)
    for i, j in rng.sample(pairs, 10):
        si = sum(q[i] for q in qs)
        sj = sum(q[j] for q in qs)
        pij = sum(q[i] * q[j] for q in qs)
        cov = n * pij - si * sj
        r = rows[(i, j)]
        assert r["n"] == n
        assert r["cov_num"] == cov
    for i in range(_COV_DIMS):
        assert rows[(i, i)]["corr_e6"] == 1_000_000
        assert rows[(i, i)]["cov_num"] > 0


def test_mips_monotonicity_always_holds(spark):
    """cos_t is a positive per-query scaling of ip, so within each
    query's ip-ranked list the 4dp cosine is non-increasing — the flag
    must be 1 on every row, and ranks must be 1..k per query."""
    rows = _BY_NAME["sim_mips_norm_transform"].fn(spark, SF_DIR).collect()
    assert rows
    assert all(r["cos_nonincreasing"] == 1 for r in rows)
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        ips = [r["ip_4dp"] for r in rs]
        assert ips == sorted(ips, reverse=True)


def test_hard_negatives_in_own_cell_lowest(spark):
    """Every emitted negative shares the anchor's cell and is not the
    anchor; within an anchor the cosines are non-decreasing with rank
    (rank 1 = hardest = lowest cosine)."""
    rows = _BY_NAME["sim_hard_negative_mining"].fn(spark, SF_DIR).collect()
    assert rows
    by_a: dict[int, list] = {}
    for r in rows:
        assert r["neg"] != r["anchor"]
        by_a.setdefault(r["anchor"], []).append(r)
    for a, rs in by_a.items():
        rs.sort(key=lambda r: r["rank"])
        cells = {r["cell"] for r in rs}
        assert len(cells) == 1
        cos = [r["cos_4dp"] for r in rs]
        assert cos == sorted(cos)


def test_harmonic_arithmetic(spark):
    """harmonic_e6 is the exact per-term-floored sum of the level
    sizes."""
    rows = _BY_NAME["graph_harmonic_centrality"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert (
            r["harmonic_e6"]
            == r["n_d1"] * 1_000_000 + r["n_d2"] * 500_000 + r["n_d3"] * 333_333
        )
        assert r["n_d1"] > 0  # every seed supplier sold something


def test_ridge_shrinkage_and_python_recount(spark):
    """|w1| shrinks (weakly) as lambda grows, and the lambda=0 weights
    match a pure-Python Cramer solve on exact moments."""
    rows = sorted(
        _BY_NAME["ml_ridge_cramer"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["lam"],
    )
    assert [r["lam"] for r in rows] == list(_RIDGE_LAMBDAS)
    w1s = [abs(r["w1_e6"]) for r in rows]
    assert w1s == sorted(w1s, reverse=True)
    li = run_oracle(
        "SELECT CAST(l_quantity AS BIGINT) AS x,"
        " CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y FROM lineitem",
        SF_DIR,
    )
    n = len(li)
    sx = int(li["x"].sum())
    sxx = int((li["x"] * li["x"]).sum())
    sy = int(li["y"].sum())
    sxy = int((li["x"] * li["y"]).sum())
    for r in rows:
        lam = r["lam"]
        # slope-only penalty: D = n (Sxx + lam) - Sx^2
        det = float(n) * float(sxx + lam) - float(sx) * float(sx)
        w0 = math.floor(
            (float(sxx + lam) * float(sy) - float(sx) * float(sxy))
            / det
            * 1_000_000
        )
        w1 = math.floor(
            (float(n) * float(sxy) - float(sx) * float(sy)) / det * 1_000_000
        )
        assert (r["w0_e6"], r["w1_e6"]) == (w0, w1)


def test_sentence_screen_flags_consistent(spark):
    rows = _BY_NAME["text_sentence_length_screen"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        m = r["words"] * 100 // r["n_sentences"]
        assert r["mean_words_per_sentence_e2"] == m
        assert r["flag_wall"] == (1 if m >= 4000 else 0)
        assert r["flag_staccato"] == (1 if m <= 300 else 0)
