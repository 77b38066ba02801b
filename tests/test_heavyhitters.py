"""Misra–Gries mergeable heavy-hitters (operators/heavyhitters.py):
the merge-invariant guarantee (membership + bounded undercount) under
arbitrary batch splits, and exact recovery when capacity exceeds the
true cardinality.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from spotify_data_pipeline_spark.functions.text import tokens
from spotify_data_pipeline_spark.operators.heavyhitters import (
    mg_build,
    mg_merge,
    mg_topk,
)

CAP = 16


def _mk_rows():
    """Skewed stream: two heavy values (30% / 20%), a long rare tail."""
    rng = random.Random(7)
    rows = []
    for i in range(3000):
        u = rng.random()
        if u < 0.30:
            v = "heavy_a"
        elif u < 0.50:
            v = "heavy_b"
        else:
            v = f"rare_{rng.randrange(400)}"
        rows.append((i, "g", v))
    return rows


def test_mg_guarantee_under_merging(spark):
    rows = _mk_rows()
    n = len(rows)
    df = spark.createDataFrame(rows, "id long, g string, v string")
    true_counts = {
        r.v: r.n for r in df.groupBy("v").agg(F.count("*").alias("n")).collect()
    }

    # split into 4 deterministic batches, build each, merge pairwise in
    # an arbitrary order
    batches = [df.where(F.col("id") % 4 == i) for i in range(4)]
    states = [mg_build(b, ["g"], "v", CAP) for b in batches]
    merged = mg_merge(["g"], CAP, mg_merge(["g"], CAP, states[2], states[0]),
                      states[3], states[1])

    est = {r.v: r.cnt_lb for r in mg_topk(merged, ["g"], CAP).collect()}
    bound = n / (CAP + 1)
    # membership: every value above the threshold survives the merges
    for v, c in true_counts.items():
        if c > bound:
            assert v in est, f"{v} (count {c}) missing; bound {bound}"
    # lower bound + bounded undercount for every kept counter
    for v, e in est.items():
        assert e <= true_counts[v]
        assert true_counts[v] - e <= bound


def test_mg_exact_when_capacity_covers_cardinality(spark):
    """capacity > |vocab| => no truncation ever; top-k equals the exact
    token top-k on the real documents table."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    toks = docs.select(F.lit("all").alias("g"), F.explode(tokens(F.col("text"))).alias("tok"))
    state = mg_build(toks, ["g"], "tok", capacity=200)
    got = [(r.v, r.cnt_lb) for r in mg_topk(state, ["g"], 10).collect()]
    exact = [
        (r.tok, r.n)
        for r in toks.groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("tok"))
        .limit(10)
        .collect()
    ]
    assert got == exact


def test_mg_state_bounded_and_sorted(spark):
    df = spark.createDataFrame(_mk_rows(), "id long, g string, v string")
    state = mg_build(df, ["g"], "v", CAP)
    row = state.first()
    arr = list(row.mg_state)
    assert len(arr) <= CAP
    cnts = [e.cnt for e in arr]
    assert cnts == sorted(cnts, reverse=True)
    assert all(c > 0 for c in cnts)


def test_salted_build_guarantee_and_exact_regime(spark):
    from spotify_data_pipeline_spark.operators.heavyhitters import mg_build_salted

    rows = _mk_rows()
    n = len(rows)
    df = spark.createDataFrame(rows, "id long, g string, v string")
    true_counts = {
        r.v: r.n for r in df.groupBy("v").agg(F.count("*").alias("n")).collect()
    }
    est = {
        r.v: r.cnt_lb
        for r in mg_topk(mg_build_salted(df, ["g"], "v", CAP, n_salts=8), ["g"], CAP).collect()
    }
    bound = n / (CAP + 1)
    for v, c in true_counts.items():
        if c > bound:
            assert v in est
    for v, e in est.items():
        assert e <= true_counts[v]
        assert true_counts[v] - e <= bound

    # capacity covers cardinality on every shard => identical to the
    # direct build (no truncation ever happens anywhere)
    big = 1000
    direct = mg_topk(mg_build(df, ["g"], "v", big), ["g"], big).collect()
    salted = mg_topk(mg_build_salted(df, ["g"], "v", big, n_salts=8), ["g"], big).collect()
    assert {(r.v, r.cnt_lb, r.rank) for r in direct} == {
        (r.v, r.cnt_lb, r.rank) for r in salted
    }
