"""Round-42 staging area (plans/roundfortytwo_pending.py): STAGED FOR
ROUND 13 — full kit (exact oracles at the dev SF, scipy-free Python
recounts of every law) but NOT registered until next round's
activation edit in plans/active.py."""

from __future__ import annotations

import hashlib
import math
import os
import re
from collections import defaultdict

import pytest

from spotify_data_pipeline_spark.plans.roundfortytwo_pending import (
    _FB_AFFIX,
    _PC_CELLS,
    _PC_DIMS,
    _PC_TARGET_PPM,
    _TD_BANDS,
    _TD_DEL_MOD,
    _TD_HASHES,
    _UF_SNAPSHOTS,
    PENDING,
)
from tests.oracle_check import compare, run_oracle

SF_DIR = os.environ.get("ORACLE_SF", "/root/testdata/sf0.001")

_BY_NAME = {pq.name: pq for pq in PENDING}

#: documented 1-row / bounded broadcast assemblies (read by
#: tools/plan_audit.py; these move to test_plan_hygiene's whitelist
#: when the module activates in round 13):
#: - probe_coverage: 8-row centroid broadcast crossJoin + 1-row
#:   total/budget broadcasts
#: - family_blocking_census: 1-row pair-mass total broadcast
_BNLJ_OK = {
    "sim_ivf_probe_coverage",
    "dedup_family_blocking_census",
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


def _band_census(bands: dict[int, list[tuple[int, str]]]):
    """per band: (n_buckets, cand_pairs) from (doc -> [(band,key)])."""
    width: dict[tuple[int, str], int] = defaultdict(int)
    for entries in bands.values():
        for b, k in entries:
            width[(b, k)] += 1
    out = {}
    for b in range(_TD_BANDS):
        ws = [c for (bb, _), c in width.items() if bb == b]
        out[b] = (len(ws), sum(c * (c - 1) // 2 for c in ws))
    return out


def test_tombstone_delta_full_recount(spark):
    """Full/after censuses recomputed in Python; the deletion-locality
    law (filter == rebuild) verified by actually rebuilding from the
    surviving docs — and the delta is real (tombstones removed pairs)."""
    rows = {
        r["band"]: r
        for r in _BY_NAME["dedup_lsh_tombstone_delta"].fn(spark, SF_DIR).collect()
    }

    def bands_of(docs):
        out = {}
        for doc_id, text in docs:
            sh = _shingle_set(_norm_tokens(text))
            mins = [
                min(_md5_hex(f"g{k}:" + s) for s in sh) for k in range(_TD_HASHES)
            ]
            out[doc_id] = [
                (b, _md5_hex(mins[2 * b] + "|" + mins[2 * b + 1]))
                for b in range(_TD_BANDS)
            ]
        return out

    docs = _docs(SF_DIR)
    full = bands_of(docs)
    live_docs = [(d, t) for d, t in docs if d % _TD_DEL_MOD != 0]
    filtered = {d: e for d, e in full.items() if d % _TD_DEL_MOD != 0}
    rebuilt = bands_of(live_docs)
    assert filtered == rebuilt  # the law, at the raw-state level
    cf, ca = _band_census(full), _band_census(filtered)
    for b in range(_TD_BANDS):
        r = rows[b]
        assert [r["full_buckets"], r["full_pairs"]] == list(cf[b])
        assert [r["after_buckets"], r["after_pairs"]] == list(ca[b])
        assert [r["rebuilt_buckets"], r["rebuilt_pairs"]] == list(ca[b])
        assert r["filter_eq_rebuild"] == 1
    assert sum(cf[b][1] for b in cf) >= sum(ca[b][1] for b in ca)


def test_url_content_funnel_full_recount(spark):
    """Funnel recomputed in Python; each level is monotone and the
    URL level genuinely collapses (re-crawl groups exist)."""
    rows = {
        r["source"]: r
        for r in _BY_NAME["dedup_url_content_funnel"].fn(spark, SF_DIR).collect()
    }
    docs = _docs(SF_DIR, "doc_id, source, text")
    by_page: dict[int, list] = defaultdict(list)
    for doc_id, source, text in docs:
        by_page[doc_id // _UF_SNAPSHOTS].append((doc_id, source, text))
    lvl1 = [min(g) for g in by_page.values()]
    by_content: dict[str, list] = defaultdict(list)
    for doc_id, source, text in lvl1:
        by_content[_md5_hex(_norm(text))].append((doc_id, source))
    lvl2 = [min(g) for g in by_content.values()]
    n_docs: dict[str, int] = defaultdict(int)
    a_url: dict[str, int] = defaultdict(int)
    a_ct: dict[str, int] = defaultdict(int)
    for _, source, _t in docs:
        n_docs[source] += 1
    for _, source, _t in lvl1:
        a_url[source] += 1
    for _, source in lvl2:
        a_ct[source] += 1
    assert set(rows) == set(n_docs)
    for source in n_docs:
        r = rows[source]
        assert r["n_docs"] == n_docs[source]
        assert r["after_url"] == a_url.get(source, 0)
        assert r["after_content"] == a_ct.get(source, 0)
        assert r["after_content"] <= r["after_url"] <= r["n_docs"]
    assert sum(r["after_url"] for r in rows.values()) < len(docs)  # collapses


def test_probe_coverage_full_recount(spark):
    """Assignment, ranking, cumulative ppm, and the 80%-budget prefix
    recomputed in exact Python integers."""
    import duckdb

    rows = sorted(
        _BY_NAME["sim_ivf_probe_coverage"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["rank"],
    )
    raw = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF_DIR}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    q = {
        vid: [math.floor(float(x) * 1_000_000 + 0.5) for x in emb]
        for vid, emb in raw
    }
    cents = {c: q[c][:_PC_DIMS] for c in range(_PC_CELLS)}
    pop: dict[int, int] = defaultdict(int)
    for vid, vec in q.items():
        _, cell = min(
            (sum((vec[i] - cv[i]) ** 2 for i in range(_PC_DIMS)), cid)
            for cid, cv in cents.items()
        )
        pop[cell] += 1
    ranked = sorted(pop.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(pop.values())
    cum = 0
    n80 = None
    expect = []
    for rank, (cell, p) in enumerate(ranked, start=1):
        cum += p
        ppm = cum * 1_000_000 // total
        if n80 is None and ppm >= _PC_TARGET_PPM:
            n80 = rank
        expect.append((cell, p, rank, ppm))
    for r, (cell, p, rank, ppm) in zip(rows, expect):
        assert [r["cell"], r["population"], r["rank"], r["cum_ppm"]] == [
            cell, p, rank, ppm,
        ]
        assert r["probes_for_80pct"] == n80
        assert r["in_80pct_budget"] == int(rank <= n80)
    assert sum(r["population"] for r in rows) == len(q)


def test_order_sensitivity_full_recount(spark):
    """Both keeper sets recomputed in Python; total kept is
    order-invariant and the per-source shift is genuinely nonzero
    somewhere (groups span sources)."""
    rows = {
        r["source"]: r
        for r in _BY_NAME["dedup_order_sensitivity"].fn(spark, SF_DIR).collect()
    }
    docs = _docs(SF_DIR, "doc_id, source")
    by_group: dict[int, list] = defaultdict(list)
    src_of = {}
    for doc_id, source in docs:
        by_group[doc_id // 3].append(doc_id)
        src_of[doc_id] = source
    kept_a: dict[str, int] = defaultdict(int)
    kept_b: dict[str, int] = defaultdict(int)
    for g in by_group.values():
        ka = min(g)
        kb = min(g, key=lambda d: _md5_hex(f"ord:{d}"))
        kept_a[src_of[ka]] += 1
        kept_b[src_of[kb]] += 1
    for source, r in rows.items():
        assert r["kept_by_id"] == kept_a.get(source, 0)
        assert r["kept_by_hash"] == kept_b.get(source, 0)
        assert r["keeper_shift"] == abs(
            kept_a.get(source, 0) - kept_b.get(source, 0)
        )
    assert sum(r["kept_by_id"] for r in rows.values()) == sum(
        r["kept_by_hash"] for r in rows.values()
    ) == len(by_group)
    assert any(r["keeper_shift"] > 0 for r in rows.values())


def test_family_blocking_census_full_recount(spark):
    """Signature families recomputed in Python; the census partitions
    the eligible docs and the ppm shares sum to <= 1e6."""
    rows = {
        r["family_size"]: r
        for r in _BY_NAME["dedup_family_blocking_census"].fn(spark, SF_DIR).collect()
    }
    fams: dict[str, int] = defaultdict(int)
    eligible = 0
    for _doc_id, text in _docs(SF_DIR):
        toks = _norm_tokens(text)
        if len(toks) < _FB_AFFIX:
            continue
        eligible += 1
        sig = "|".join(
            [str(len(toks)), " ".join(toks[:_FB_AFFIX]), " ".join(toks[-_FB_AFFIX:])]
        )
        fams[sig] += 1
    census: dict[int, list[int]] = defaultdict(lambda: [0, 0, 0])
    tot_pairs = 0
    for s in fams.values():
        c = census[s]
        c[0] += 1
        c[1] += s
        c[2] += s * (s - 1) // 2
        tot_pairs += s * (s - 1) // 2
    assert set(rows) == set(census)
    for s, (nf, nd, cp) in census.items():
        r = rows[s]
        assert [r["n_families"], r["n_docs"], r["cand_pairs"]] == [nf, nd, cp]
        assert r["pair_share_ppm"] == (
            0 if tot_pairs == 0 else cp * 1_000_000 // tot_pairs
        )
    assert sum(r["n_docs"] for r in rows.values()) == eligible
    assert sum(r["pair_share_ppm"] for r in rows.values()) <= 1_000_000
