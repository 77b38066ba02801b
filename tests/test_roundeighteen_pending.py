"""Round-18 staging area (plans/roundeighteen_pending.py): the
corpus-statistics wave — driver-shaped oracle checks, plan hygiene,
and independent pure-Python recounts of the information measures."""

from __future__ import annotations

import math
import os

import pytest

from spotify_data_pipeline_spark.plans.roundeighteen_pending import PENDING
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
    from spotify_data_pipeline_spark.plans.active import R18_ACTIVATED

    qs = all_queries()
    assert set(R18_ACTIVATED) == {pq.name for pq in PENDING}
    for pq in PENDING:
        assert pq.name in qs and qs[pq.name].fn is pq.fn
        assert qs[pq.name].oracle == pq.oracle


def test_pending_names_unique_and_oracle_bearing():
    names = [pq.name for pq in PENDING]
    assert len(names) == len(set(names))
    assert all(pq.oracle for pq in PENDING)
    from spotify_data_pipeline_spark.plans.roundfifteen_pending import PENDING as P15
    from spotify_data_pipeline_spark.plans.roundseventeen_pending import (
        PENDING as P17,
    )
    from spotify_data_pipeline_spark.plans.roundsixteen_pending import PENDING as P16
    from spotify_data_pipeline_spark.plans.roundthirteen_pending import (
        PENDING as P13,
    )

    for earlier in (P13, P15, P16, P17):
        assert not set(names) & {pq.name for pq in earlier}


def _plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# whitelisted bounded nested-loop sides:
#   llm_unigram_xent — 1-row corpus-total broadcast (TF-IDF precedent)
#   text_js_divergence — sources × vocab dense grid (llm_ks_drift
#   bounded-grid precedent)
_BNLJ_OK = {"llm_unigram_xent", "text_js_divergence"}


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


def test_xent_python_recount(spark):
    """One source's (n_docs, avg_xent_e6) recounted with an independent
    pure-Python unigram LM using the same micro-nat integer device."""
    from spotify_data_pipeline_spark.plans.roundeighteen_pending import (
        llm_unigram_xent_query,
    )

    rows = llm_unigram_xent_query(spark, SF_DIR).collect()
    assert rows and all(
        r.min_xent_e6 <= r.avg_xent_e6 <= r.max_xent_e6 and r.min_xent_e6 > 0
        for r in rows
    )
    docs = _doc_rows(spark)
    tf: dict[str, int] = {}
    tot = 0
    for r in docs:
        for t in _py_tokens(r.text):
            tf[t] = tf.get(t, 0) + 1
            tot += 1
    lp = {t: math.floor(math.log(c / tot) * 1_000_000 + 0.5) for t, c in tf.items()}
    src = rows[0].source
    xents = []
    for r in docs:
        if r.source != src:
            continue
        toks = _py_tokens(r.text)
        xents.append((-sum(lp[t] for t in toks)) // len(toks))
    got = next(r for r in rows if r.source == src)
    assert got.n_docs == len(xents)
    assert got.avg_xent_e6 == sum(xents) // len(xents)
    assert got.min_xent_e6 == min(xents) and got.max_xent_e6 == max(xents)


def test_jsd_python_recount_and_bounds(spark):
    """JSD is in [0, ln2·1e6 + |vocab| rounding slack]; one pair
    recounted in Python with the identical dense-grid device."""
    from spotify_data_pipeline_spark.plans.roundeighteen_pending import (
        text_js_divergence_query,
    )

    rows = text_js_divergence_query(spark, SF_DIR).collect()
    assert rows
    docs = _doc_rows(spark)
    vocab: set[str] = set()
    st: dict[tuple[str, str], int] = {}
    stot: dict[str, int] = {}
    for r in docs:
        for t in _py_tokens(r.text):
            vocab.add(t)
            st[(r.source, t)] = st.get((r.source, t), 0) + 1
            stot[r.source] = stot.get(r.source, 0) + 1
    ln2e6 = math.log(2) * 1_000_000
    for r in rows:
        assert 0 <= r.jsd_e6 <= ln2e6 + len(vocab), (r.src_a, r.src_b)
        assert r.src_a < r.src_b
    mid = rows[len(rows) // 2]
    a, b = mid.src_a, mid.src_b
    jsd = 0
    common = 0
    for t in vocab:
        pa = st.get((a, t), 0) / stot[a]
        pb = st.get((b, t), 0) / stot[b]
        if pa > 0 and pb > 0:
            common += 1
        c = 0.5 * (
            (pa * math.log((2 * pa) / (pa + pb)) if pa > 0 else 0.0)
            + (pb * math.log((2 * pb) / (pa + pb)) if pb > 0 else 0.0)
        )
        jsd += math.floor(c * 1_000_000 + 0.5)
    assert (mid.n_common_terms, mid.jsd_e6) == (common, jsd)


def test_novelty_bounds_and_recount(spark):
    from spotify_data_pipeline_spark.plans.roundeighteen_pending import (
        _NOVELTY_K,
        dedup_ngram_novelty_query,
    )

    rows = dedup_ngram_novelty_query(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.min_novelty_ppm <= r.avg_novelty_ppm <= r.max_novelty_ppm
        assert r.max_novelty_ppm <= 1_000_000

    def sh_of(text):
        toks = _py_tokens(text)
        if len(toks) >= _NOVELTY_K:
            return {
                " ".join(toks[i : i + _NOVELTY_K])
                for i in range(len(toks) - _NOVELTY_K + 1)
            }
        return {" ".join(toks)}

    docs = _doc_rows(spark)
    df: dict[str, int] = {}
    per_doc = {}
    for r in docs:
        s = sh_of(r.text)
        per_doc[r.doc_id] = (r.source, s)
        for x in s:
            df[x] = df.get(x, 0) + 1
    src = rows[0].source
    ppms = [
        (sum(1 for x in s if df[x] == 1) * 1_000_000) // len(s)
        for (source, s) in per_doc.values()
        if source == src
    ]
    got = rows[0]
    assert got.n_docs == len(ppms)
    assert got.avg_novelty_ppm == sum(ppms) // len(ppms)


def test_decontam_eval_set_and_self_exclusion(spark):
    """Exactly min(20, corpus) eval rows, the 20 longest docs; one eval
    doc's contamination recounted in Python (self excluded)."""
    from spotify_data_pipeline_spark.plans.roundeighteen_pending import (
        _DECONTAM_K,
        _EVAL_N,
        llm_decontam_overlap_query,
    )

    rows = llm_decontam_overlap_query(spark, SF_DIR).collect()
    docs = _doc_rows(spark)
    assert len(rows) == min(_EVAL_N, len(docs))
    expect_eval = {
        d.doc_id
        for d in sorted(docs, key=lambda d: (-d.n_chars, d.doc_id))[:_EVAL_N]
    }
    assert {r.eval_doc_id for r in rows} == expect_eval

    def sh_of(text):
        toks = _py_tokens(text)
        if len(toks) >= _DECONTAM_K:
            return {
                " ".join(toks[i : i + _DECONTAM_K])
                for i in range(len(toks) - _DECONTAM_K + 1)
            }
        return {" ".join(toks)}

    all_sh = {d.doc_id: sh_of(d.text) for d in docs}
    probe = rows[0]
    ev_sh = all_sh[probe.eval_doc_id]
    contaminated = {
        did
        for did, s in all_sh.items()
        if did != probe.eval_doc_id and s & ev_sh
    }
    shared = set().union(
        *(s & ev_sh for did, s in all_sh.items() if did != probe.eval_doc_id)
    ) if contaminated else set()
    assert probe.n_contaminated_docs == len(contaminated)
    assert probe.n_shared_shingles == len(shared)


def test_char_entropy_recount_and_band(spark):
    from spotify_data_pipeline_spark.plans.roundeighteen_pending import (
        text_char_bigram_entropy_query,
    )

    rows = text_char_bigram_entropy_query(spark, SF_DIR).collect()
    assert rows
    docs = _doc_rows(spark)
    src = rows[0].source
    tf: dict[str, int] = {}
    for r in docs:
        if r.source != src:
            continue
        s = " ".join(r.text.split()).strip().lower()
        for i in range(len(s) - 1):
            bg = s[i : i + 2]
            tf[bg] = tf.get(bg, 0) + 1
    tot = sum(tf.values())
    ent = sum(
        math.floor((-(c / tot) * math.log(c / tot)) * 1_000_000 + 0.5)
        for c in tf.values()
    )
    got = rows[0]
    assert got.n_distinct_bigrams == len(tf)
    assert got.entropy_e6 == ent
    # natural text band: strictly positive, below ln(|bigrams|)·1e6 + slack
    for r in rows:
        assert 0 < r.entropy_e6 <= math.log(r.n_distinct_bigrams) * 1_000_000 + r.n_distinct_bigrams


def test_path_advice_agrees_with_operator(spark):
    """The query's recommendation columns equal the operator's decision
    at the query's own measured density (string-shingle stats fed into
    suggest_similarity_join_path)."""
    from spotify_data_pipeline_spark.operators.advisor import (
        suggest_similarity_join_path,
    )
    from spotify_data_pipeline_spark.plans.roundeighteen_pending import (
        ops_similarity_path_advice_query,
    )

    row = ops_similarity_path_advice_query(spark, SF_DIR).collect()[0]
    stats = {
        "posting_rows": row.posting_rows,
        "naive_candidate_pairs": row.naive_candidate_pairs,
    }
    assert row.local_path == suggest_similarity_join_path(stats)
    assert row.network_path == suggest_similarity_join_path(
        stats, network_bound=True
    )
    assert row.density_ppm == (row.naive_candidate_pairs * 1_000_000) // row.posting_rows


def test_ltv_deciles_shape(spark):
    from spotify_data_pipeline_spark.plans.roundeighteen_pending import (
        orders_ltv_deciles_query,
    )

    rows = orders_ltv_deciles_query(spark, SF_DIR).collect()
    assert [r.decile for r in rows] == list(range(1, 11))
    sizes = [r.n_customers for r in rows]
    assert max(sizes) - min(sizes) <= 1  # ntile balance
    # descending revenue ordering: decile d's floor >= decile d+1's cap
    for a, b in zip(rows, rows[1:]):
        assert a.min_cents >= b.max_cents
        assert a.revenue_cents >= b.revenue_cents
    assert sum(r.revenue_share_ppm for r in rows) <= 1_000_000
    assert sum(r.revenue_share_ppm for r in rows) > 1_000_000 - len(rows)
