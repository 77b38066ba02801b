"""Round-39 wave (plans/roundthirtynine_pending.py): activated in the
round-12 window (positions 10-13). Exact oracles verified here at the
dev SF plus scipy-free Python recounts of every load-bearing law:
the SimHash counter-merge algebra, the LSH band census, the bin-fill
histogram, and the footrule divergence are each recomputed from the
raw parquet in plain Python."""

from __future__ import annotations

import hashlib
import os
import re

import pytest

from spotify_data_pipeline_spark.plans.roundthirtynine_pending import (
    _BC_BANDS,
    _BC_CAP,
    _BC_HASHES,
    _BD_PENALTY,
    _BD_TOPG,
    _BD_TOPL,
    _BF_BUDGET,
    _BF_HIST_STEP,
    _SMR_BITS,
    PENDING,
)
from tests.oracle_check import compare, run_oracle

SF_DIR = os.environ.get("ORACLE_SF", "/root/testdata/sf0.001")

_BY_NAME = {pq.name: pq for pq in PENDING}


def _norm_tokens(text: str) -> list[str]:
    t = re.sub(r"\s+", " ", text).strip().lower()
    return t.split(" ") if t else []


def _shingle_set(toks: list[str]) -> set[str]:
    """Distinct 3-shingles with the whole-text fallback — mirrors
    functions/text.shingles(tokens(text), 3) for nonblank docs."""
    if len(toks) >= 3:
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
    return {" ".join(toks)}


def _md5_mod(s: str, m: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % m


def _md5_hex(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _doc_shingles(sf_dir: str) -> dict[int, set[str]]:
    import duckdb

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' "
        "WHERE length(trim(text)) > 0 ORDER BY doc_id"
    ).fetchall()
    return {doc_id: _shingle_set(_norm_tokens(text)) for doc_id, text in rows}


@pytest.mark.parametrize("pq", PENDING, ids=lambda pq: pq.name)
def test_pending_oracle_match(spark, pq):
    result = pq.fn(spark, SF_DIR)
    oracle = run_oracle(pq.oracle, SF_DIR)
    errs = compare(result, oracle)
    assert not errs, f"{pq.name}: " + "; ".join(errs)
    assert len(oracle) > 0, f"{pq.name}: vacuous (0 oracle rows) at {SF_DIR}"


def test_pending_registered(spark):
    """Activated in the round-12 window (positions 10-13)."""
    from spotify_data_pipeline_spark.plans import all_queries
    from spotify_data_pipeline_spark.plans.active import R39_ACTIVATED

    qs = all_queries()
    by_name = {pq.name: pq for pq in PENDING}
    assert set(R39_ACTIVATED) == set(by_name)
    for name in R39_ACTIVATED:
        pq = by_name[name]
        assert name in qs and qs[name].fn is pq.fn
        assert qs[name].oracle == pq.oracle


def test_pending_names_unique_and_oracle_bearing():
    names = [pq.name for pq in PENDING]
    assert len(names) == len(set(names))
    assert all(pq.oracle for pq in PENDING)


def test_simhash_merge_law_full_recount(spark):
    """Both laws hold for EVERY doc (the algebra forces them), and the
    emitted sh16 fingerprint equals a from-scratch Python recount of
    the majority rule over the md5 bit-channels."""
    rows = {
        r["doc_id"]: r
        for r in _BY_NAME["dedup_simhash_merge_rebuild"].fn(spark, SF_DIR).collect()
    }
    shingles = _doc_shingles(SF_DIR)
    assert set(rows) == set(shingles)
    for doc_id, sh in shingles.items():
        r = rows[doc_id]
        assert r["counters_additive"] == 1
        assert r["merged_eq_rebuilt"] == 1
        n_a = sum(1 for s in sh if _md5_mod("h:" + s, 2) == 0)
        assert r["n_half_a"] == n_a
        assert r["n_half_b"] == len(sh) - n_a
        fp = 0
        for b in range(_SMR_BITS):
            v = sum(_md5_mod(f"sb{b}:" + s, 2) for s in sh)
            if 2 * v > len(sh):
                fp |= 1 << b
        assert r["sh16"] == fp, doc_id


def test_band_cost_census_full_recount(spark):
    """The 4-row census equals a Python rebuild of the whole index:
    per-doc 8 min-hashes, band buckets, widths, and the exact pair
    arithmetic including the cap split."""
    rows = {
        r["band"]: r
        for r in _BY_NAME["dedup_lsh_band_cost_census"].fn(spark, SF_DIR).collect()
    }
    shingles = _doc_shingles(SF_DIR)
    buckets: dict[tuple[int, str], int] = {}
    for sh in shingles.values():
        mins = [min(_md5_hex(f"g{k}:" + s) for s in sh) for k in range(_BC_HASHES)]
        for band in range(_BC_BANDS):
            key = _md5_hex(mins[2 * band] + "|" + mins[2 * band + 1])
            buckets[(band, key)] = buckets.get((band, key), 0) + 1
    assert set(rows) == set(range(_BC_BANDS))
    for band in range(_BC_BANDS):
        widths = [c for (b, _), c in buckets.items() if b == band]
        pairs = [c * (c - 1) // 2 for c in widths]
        r = rows[band]
        assert r["n_buckets"] == len(widths)
        assert r["max_width"] == max(widths)
        assert r["n_singletons"] == sum(1 for c in widths if c == 1)
        assert r["cand_pairs"] == sum(pairs)
        assert r["pairs_capped"] == sum(
            p for c, p in zip(widths, pairs) if c <= _BC_CAP
        )
        assert r["pairs_over_cap"] == r["cand_pairs"] - r["pairs_capped"]


def test_binfill_histogram_full_recount(spark):
    """Histogram equals the Python deal, and the mass identities hold:
    every doc lands in a bin, the bins number exactly
    ceil(total/budget), and overflow - slack == total - B * budget."""
    import duckdb

    rows = _BY_NAME["llm_pack_binfill_balance"].fn(spark, SF_DIR).collect()
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet' "
        "WHERE length(trim(text)) > 0"
    ).fetchall()
    toks = sorted(
        ((len(_norm_tokens(t)), d) for d, t in docs),
        key=lambda x: (-x[0], x[1]),
    )
    total = sum(c for c, _ in toks)
    nbins = max((total + _BF_BUDGET - 1) // _BF_BUDGET, 1)
    loads = [0] * nbins
    ndocs = [0] * nbins
    for rank, (c, _) in enumerate(toks, start=1):
        loads[(rank - 1) % nbins] += c
        ndocs[(rank - 1) % nbins] += 1
    hist: dict[int, list] = {}
    for load, nd in zip(loads, ndocs):
        b = load * _BF_HIST_STEP // _BF_BUDGET
        h = hist.setdefault(b, [0, 0, None, None, 0, 0])
        h[0] += 1
        h[1] += nd
        h[2] = load if h[2] is None else min(h[2], load)
        h[3] = load if h[3] is None else max(h[3], load)
        h[4] += max(load - _BF_BUDGET, 0)
        h[5] += max(_BF_BUDGET - load, 0)
    assert {r["load_bucket"] for r in rows} == set(hist)
    for r in rows:
        h = hist[r["load_bucket"]]
        assert [
            r["n_bins"], r["n_docs"], r["min_load"], r["max_load"],
            r["overflow_tokens"], r["slack_tokens"],
        ] == h
    assert sum(r["n_docs"] for r in rows) == len(docs)
    assert sum(r["n_bins"] for r in rows) == nbins
    assert (
        sum(r["overflow_tokens"] for r in rows)
        - sum(r["slack_tokens"] for r in rows)
        == total - nbins * _BF_BUDGET
    )


def test_bpe_lang_divergence_full_recount(spark):
    """Per-lang footrule equals the Python recount of both rankings
    with the (count DESC, pair ASC) tiebreak and the rank-101 penalty."""
    import duckdb

    rows = {
        r["lang"]: r
        for r in _BY_NAME["text_bpe_lang_divergence"].fn(spark, SF_DIR).collect()
    }
    docs = duckdb.sql(
        f"SELECT lang, text FROM '{SF_DIR}/documents.parquet' "
        "WHERE length(trim(text)) > 0"
    ).fetchall()
    lang_cnt: dict[tuple[str, str], int] = {}
    glob_cnt: dict[str, int] = {}
    for lang, text in docs:
        t = _norm_tokens(text)
        for a, b in zip(t, t[1:]):
            p = f"{a} {b}"
            lang_cnt[(lang, p)] = lang_cnt.get((lang, p), 0) + 1
            glob_cnt[p] = glob_cnt.get(p, 0) + 1
    topg = {
        p: i + 1
        for i, (p, _) in enumerate(
            sorted(glob_cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:_BD_TOPG]
        )
    }
    langs = {lang for lang, _ in lang_cnt}
    assert set(rows) == langs
    for lang in langs:
        pairs = sorted(
            ((p, c) for (lg, p), c in lang_cnt.items() if lg == lang),
            key=lambda kv: (-kv[1], kv[0]),
        )[:_BD_TOPL]
        foot = sum(
            abs((i + 1) - topg.get(p, _BD_PENALTY))
            for i, (p, _) in enumerate(pairs)
        )
        in_g = sum(1 for p, _ in pairs if p in topg)
        r = rows[lang]
        assert r["n_top_pairs"] == len(pairs)
        assert r["n_in_global_top"] == in_g
        assert r["footrule"] == foot, lang
