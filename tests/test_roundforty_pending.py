"""Round-40 staging area (plans/roundforty_pending.py): STAGED FOR
ROUND 13 — the round-12 window is full at exactly 50 (14 NEW + 36
roundsix-closure DRIFT), so these five carry the full kit (exact
oracles verified here at the dev SF, scipy-free Python recounts of
every law) but are NOT registered until next round's activation edit
in plans/active.py."""

from __future__ import annotations

import hashlib
import os
import re
from collections import defaultdict

import pytest

from spotify_data_pipeline_spark.plans.roundforty_pending import (
    _CV_K,
    _LC_PROFILE_K,
    _PQ_SUBDIM,
    _PQ_SUBSPACES,
    _RE_CELLS,
    _RE_DIMS,
    _SC_CONFIGS,
    _SC_HASHES,
    PENDING,
)
from tests.oracle_check import compare, run_oracle

SF_DIR = os.environ.get("ORACLE_SF", "/root/testdata/sf0.001")

_BY_NAME = {pq.name: pq for pq in PENDING}

#: documented 1-row / bounded broadcast assemblies (read by
#: tools/plan_audit.py; these move to test_plan_hygiene's whitelist
#: when the module activates in round 13):
#: - scurve: 1-row corpus-count broadcast under the ppm denominator
#: - residual_energy: 4-row fixed-centroid broadcast crossJoin
_BNLJ_OK = {
    "dedup_minhash_scurve_tuning",
    "sim_ivf_residual_energy",
}


def _norm(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip().lower()


def _norm_tokens(text: str) -> list[str]:
    t = _norm(text)
    return t.split(" ") if t else []


def _shingle_set(toks: list[str]) -> set[str]:
    if len(toks) >= 3:
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
    return {" ".join(toks)}


def _md5_hex(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _docs(sf_dir: str, cols: str = "doc_id, text"):
    import duckdb

    return duckdb.sql(
        f"SELECT {cols} FROM '{sf_dir}/documents.parquet' "
        "WHERE length(trim(text)) > 0 ORDER BY doc_id"
    ).fetchall()


def _embeddings_e6(sf_dir: str) -> dict[int, list[int]]:
    import duckdb
    import math

    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id"
    ).fetchall()
    return {
        vid: [math.floor(float(x) * 1_000_000 + 0.5) for x in emb]
        for vid, emb in rows
    }


@pytest.mark.parametrize("pq", PENDING, ids=lambda pq: pq.name)
def test_pending_oracle_match(spark, pq):
    result = pq.fn(spark, SF_DIR)
    oracle = run_oracle(pq.oracle, SF_DIR)
    errs = compare(result, oracle)
    assert not errs, f"{pq.name}: " + "; ".join(errs)
    assert len(oracle) > 0, f"{pq.name}: vacuous (0 oracle rows) at {SF_DIR}"


def test_pending_not_yet_registered(spark):
    """The round-12 window is full (50/50): this module activates in
    round 13. An accidental early activation would strand these past
    position 50 without driver evidence."""
    from spotify_data_pipeline_spark.plans import all_queries

    qs = all_queries()
    assert not {pq.name for pq in PENDING} & set(qs)


def test_pending_names_unique_and_oracle_bearing():
    names = [pq.name for pq in PENDING]
    assert len(names) == len(set(names))
    assert all(pq.oracle for pq in PENDING)


def test_scurve_census_full_recount(spark):
    """All three band layouts recomputed from a Python MinHash build,
    plus the monotonicity the S-curve predicts: more rows per band
    can only shrink (or hold) the candidate count."""
    rows = {
        r["cfg"]: r
        for r in _BY_NAME["dedup_minhash_scurve_tuning"].fn(spark, SF_DIR).collect()
    }
    docs = _docs(SF_DIR)
    mins_by_doc = {}
    for doc_id, text in docs:
        sh = _shingle_set(_norm_tokens(text))
        mins_by_doc[doc_id] = [
            min(_md5_hex(f"g{k}:" + s) for s in sh) for k in range(_SC_HASHES)
        ]
    n = len(docs)
    for cfg, rpb in _SC_CONFIGS:
        buckets: dict[tuple[int, str], int] = defaultdict(int)
        for mins in mins_by_doc.values():
            for band in range(_SC_HASHES // rpb):
                key = _md5_hex("|".join(mins[band * rpb + j] for j in range(rpb)))
                buckets[(band, key)] += 1
        widths = list(buckets.values())
        r = rows[cfg]
        assert r["n_buckets"] == len(widths)
        assert r["max_width"] == max(widths)
        cand = sum(c * (c - 1) // 2 for c in widths)
        assert r["cand_pairs"] == cand
        assert r["cand_ppm_of_all_pairs"] == cand * 1_000_000 // (n * (n - 1) // 2)
    assert (
        rows["b8r1"]["cand_pairs"]
        >= rows["b4r2"]["cand_pairs"]
        >= rows["b2r4"]["cand_pairs"]
    )


def test_dup_token_coverage_full_recount(spark):
    """Coverage equals the Python recount of distinct covered positions
    and never exceeds the token total."""
    rows = {
        r["source"]: r
        for r in _BY_NAME["dedup_dup_token_coverage"].fn(spark, SF_DIR).collect()
    }
    docs = _docs(SF_DIR, "doc_id, source, text")
    pos_by_sh: dict[str, list[tuple[int, int]]] = defaultdict(list)
    doc_toks: dict[int, tuple[str, int]] = {}
    for doc_id, source, text in docs:
        toks = _norm_tokens(text)
        if len(toks) < _CV_K:
            continue
        doc_toks[doc_id] = (source, len(toks))
        for p in range(len(toks) - _CV_K + 1):
            pos_by_sh[" ".join(toks[p : p + _CV_K])].append((doc_id, p))
    covered: dict[int, set[int]] = defaultdict(set)
    for sh, occ in pos_by_sh.items():
        if len(occ) >= 2:
            for doc_id, p in occ:
                covered[doc_id].update(range(p, p + _CV_K))
    agg: dict[str, list[int]] = defaultdict(lambda: [0, 0, 0])
    for doc_id, (source, n_toks) in doc_toks.items():
        a = agg[source]
        a[0] += 1
        a[1] += n_toks
        a[2] += len(covered.get(doc_id, ()))
    assert set(rows) == set(agg)
    for source, (nd, tt, cv) in agg.items():
        r = rows[source]
        assert [r["n_docs"], r["total_tokens"], r["covered_tokens"]] == [nd, tt, cv]
        assert r["coverage_ppm"] == cv * 1_000_000 // tt
        assert r["covered_tokens"] <= r["total_tokens"]


def test_residual_energy_full_recount(spark):
    """Cell assignment and residual sums recomputed in exact Python
    integers; populations cover every vector exactly once."""
    rows = {
        r["cell"]: r
        for r in _BY_NAME["sim_ivf_residual_energy"].fn(spark, SF_DIR).collect()
    }
    q = _embeddings_e6(SF_DIR)
    cents = {cid: q[cid][:_RE_DIMS] for cid in range(_RE_CELLS)}
    agg: dict[int, list] = {c: [0, 0, -1, None] for c in cents}
    for vid, vec in q.items():
        best = min(
            (
                (
                    sum((vec[i] - cvec[i]) ** 2 for i in range(_RE_DIMS)),
                    cid,
                )
                for cid, cvec in cents.items()
            )
        )
        d2, cid = best
        a = agg[cid]
        a[0] += 1
        a[1] += d2
        if d2 > a[2] or (d2 == a[2] and vid < a[3]):
            a[2], a[3] = d2, vid
    assert set(rows) == {c for c, a in agg.items() if a[0]}
    for cid, (pop, energy, worst, wvid) in agg.items():
        if not pop:
            continue
        r = rows[cid]
        assert r["population"] == pop
        assert r["residual_energy"] == energy
        assert r["mean_residual"] == energy // pop
        assert r["worst_residual"] == worst
        assert r["worst_vec_id"] == wvid
    assert sum(r["population"] for r in rows.values()) == len(q)


def test_lang_confusion_full_recount(spark):
    """Profiles, per-doc argmax prediction, and the confusion census
    recomputed in Python; the census covers every doc exactly once."""
    rows = {
        (r["lang"], r["pred_lang"]): r["n_docs"]
        for r in _BY_NAME["text_trigram_lang_confusion"].fn(spark, SF_DIR).collect()
    }
    docs = _docs(SF_DIR, "doc_id, lang, text")
    tri_cnt: dict[tuple[str, str], int] = defaultdict(int)
    doc_tris: dict[int, tuple[str, set[str]]] = {}
    for doc_id, lang, text in docs:
        nt = _norm(text)
        tris = [nt[i : i + 3] for i in range(len(nt) - 2)] if len(nt) >= 3 else []
        doc_tris[doc_id] = (lang, set(tris))
        for tg in tris:
            tri_cnt[(lang, tg)] += 1
    profiles: dict[str, set[str]] = {}
    langs = {lg for lg, _ in tri_cnt}
    for lg in langs:
        top = sorted(
            ((tg, c) for (l2, tg), c in tri_cnt.items() if l2 == lg),
            key=lambda kv: (-kv[1], kv[0]),
        )[:_LC_PROFILE_K]
        profiles[lg] = {tg for tg, _ in top}
    census: dict[tuple[str, str], int] = defaultdict(int)
    for doc_id, (lang, tris) in doc_tris.items():
        ovs = sorted(
            ((-len(tris & prof), plg) for plg, prof in profiles.items()
             if tris & prof),
        )
        pred = ovs[0][1] if ovs else "?"
        census[(lang, pred)] += 1
    assert rows == dict(census)
    assert sum(rows.values()) == len(docs)


def test_pq_code_balance_full_recount(spark):
    """Codes recomputed bit-by-bit in Python; every subspace's census
    covers every vector; codes_used is bounded by 2^subdim."""
    rows = {
        r["subspace"]: r
        for r in _BY_NAME["sim_pq_code_balance"].fn(spark, SF_DIR).collect()
    }
    q = _embeddings_e6(SF_DIR)
    for s in range(_PQ_SUBSPACES):
        census: dict[int, int] = defaultdict(int)
        for vec in q.values():
            code = sum(
                (1 << j)
                for j in range(_PQ_SUBDIM)
                if vec[s * _PQ_SUBDIM + j] >= 0
            )
            census[code] += 1
        widths = list(census.values())
        r = rows[s]
        assert r["codes_used"] == len(widths) <= (1 << _PQ_SUBDIM)
        assert r["max_pop"] == max(widths)
        assert r["mean_pop"] == sum(widths) // len(widths)
        assert r["imbalance_ppm"] == r["max_pop"] * 1_000_000 // r["mean_pop"]
        assert r["same_code_pairs"] == sum(c * (c - 1) // 2 for c in widths)
        assert sum(widths) == len(q)
