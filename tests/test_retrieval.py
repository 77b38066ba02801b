"""operators/retrieval.py — BM25 (rational idf), boolean AND search,
token typicality. The BM25 model test replicates the EXACT arithmetic
in plain Python floats (same IEEE expression tree), so any drift in
the operator's formula or scaling fails loudly."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.operators.retrieval import (
    bm25_topk,
    boolean_and_search,
    token_typicality,
)

CORPUS = [
    (1, "spark shuffle join spark spark"),
    (2, "join join hash merge"),
    (3, "spark window agg"),
    (4, "rare spark join"),
    (5, "merge sort merge sort merge sort"),
    (6, "   "),  # blank: excluded from N, T, and every posting
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def _python_bm25(terms):
    """Independent model, identical IEEE expression tree."""
    toks = {d: t.split() for d, t in CORPUS if t.strip()}
    n = len(toks)
    t_total = sum(len(v) for v in toks.values())
    tf = {(d, w): v.count(w) for d, v in toks.items() for w in set(v) if w in terms}
    df = {}
    for (_, w), _tf in tf.items():
        df[w] = df.get(w, 0) + 1
    scores = {}
    for (d, w), f in tf.items():
        dl = len(toks[d])
        idf_s = (2 * n - 2 * df[w] + 1) / (2 * df[w] + 1)
        tf_w = (22 * f) / (10 * f + 3 + 9 * ((dl * n) / t_total))
        scores[d] = scores.get(d, 0) + math.floor(idf_s * tf_w * 1000000)
    return scores


def test_bm25_matches_python_model(docs):
    terms = ["spark", "join", "rare"]
    got = {r.doc_id: r.score_scaled for r in bm25_topk(docs, terms, k=10).collect()}
    assert got == _python_bm25(terms)


def test_bm25_rare_term_dominates(docs):
    # 'rare' (df=1) must dominate 'spark' (df=3): doc 4's single 'rare'
    # hit beats doc 1's three saturated 'spark' hits
    rows = bm25_topk(docs, ["rare", "spark"], k=10).collect()
    assert rows[0].doc_id == 4


def test_bm25_ordering_and_score_display(docs):
    rows = bm25_topk(docs, ["spark", "join"], k=3).collect()
    assert len(rows) == 3
    scaled = [r.score_scaled for r in rows]
    assert scaled == sorted(scaled, reverse=True)
    for r in rows:
        assert r.score == math.floor(r.score_scaled / 100.0 + 0.5) / 10000.0


def test_bm25_repartition_invariant(docs):
    terms = ["spark", "join", "merge"]
    a = bm25_topk(docs, terms, k=10).collect()
    b = bm25_topk(docs.repartition(7), terms, k=10).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_bm25_empty_terms_raises(docs):
    with pytest.raises(ValueError):
        bm25_topk(docs, [])


def test_boolean_and_search(docs):
    got = {r.doc_id: r.n_hits for r in boolean_and_search(docs, ["spark", "join"]).collect()}
    # docs containing BOTH terms: 1 (3 spark + 1 join), 4 (1 + 1)
    assert got == {1: 4, 4: 2}
    # single term degenerates to the posting list
    one = {r.doc_id for r in boolean_and_search(docs, ["merge"]).collect()}
    assert one == {2, 5}
    # duplicate terms in the query must not change the required count
    dup = {r.doc_id for r in boolean_and_search(docs, ["spark", "spark", "join"]).collect()}
    assert dup == {1, 4}


def test_typicality_model(docs):
    rows = {r.doc_id: r for r in token_typicality(docs, rare_pct=25).collect()}
    # dfs over the 5 non-blank docs: spark 3, join 3, shuffle 1, hash 1,
    # merge 2, window 1, agg 1, rare 1, sort 1
    # doc 3 = spark window agg -> mean (3+1+1)/3, rare(df*100<5*25=125 => df=1): 2/3
    assert rows[3].n_tokens == 3
    assert rows[3].mean_df == math.floor(5 / 3 * 10000 + 0.5) / 10000
    assert rows[3].rare_ratio == math.floor(2 / 3 * 10000 + 0.5) / 10000
    # blank doc excluded entirely
    assert 6 not in rows
    # doc 1: spark x3, shuffle, join -> dfs 3,3,3,1,3 sum=13 over 5
    assert rows[1].mean_df == math.floor(13 / 5 * 10000 + 0.5) / 10000


def test_plans_no_cartesian(docs):
    # the only nested-loop allowed is the documented 1-row broadcast
    # totals/doc-count aggregate — which boolean_and_search doesn't
    # have, so its bound is ZERO
    for plan_df, max_bnlj in (
        (bm25_topk(docs, ["spark"], k=5), 1),
        (boolean_and_search(docs, ["spark"]), 0),
        (token_typicality(docs), 1),
    ):
        plan = plan_df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert plan.count("BroadcastNestedLoopJoin") <= max_bnlj
