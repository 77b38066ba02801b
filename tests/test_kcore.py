"""operators/kcore.py — synchronous fixed-round k-core peeling,
pinned against an independent Python model and classic shapes."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spotify_data_pipeline_spark.operators.kcore import kcore_peel


def _python_peel(edges, k, rounds):
    """Independent model of the synchronous peel."""
    live = {tuple(e) for e in edges}
    for _ in range(rounds):
        deg = {}
        for a, b in live:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        live = {(a, b) for a, b in live if a in keep and b in keep}
    deg = {}
    for a, b in live:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    return deg


def _spark_peel(spark, edges, k, rounds):
    df = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
    if not edges:
        df = df.where("src <> src")
    got = kcore_peel(df, k=k, rounds=rounds).collect()
    return {r.node: r.degree for r in got}


def test_triangle_with_tail(spark):
    # triangle 1-2-3 plus a tail 3-4: one round at k=2 peels node 4,
    # leaving the triangle with all degrees 2
    edges = [(1, 2), (2, 3), (1, 3), (3, 4)]
    assert _spark_peel(spark, edges, k=2, rounds=1) == {1: 2, 2: 2, 3: 2}


def test_chain_needs_multiple_rounds(spark):
    # path 1-2-3-4-5 at k=2: each round strips the current endpoints;
    # rounds=1 leaves 2-3-4, rounds=2 leaves nothing — the case that
    # pins WHY the round count is part of the contract
    edges = [(1, 2), (2, 3), (3, 4), (4, 5)]
    one = _spark_peel(spark, edges, k=2, rounds=1)
    assert one == {2: 1, 3: 2, 4: 1}
    assert _spark_peel(spark, edges, k=2, rounds=2) == {}
    assert _python_peel(edges, 2, 1) == one


def test_k4_is_stable(spark):
    edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    assert _spark_peel(spark, edges, k=3, rounds=3) == {1: 3, 2: 3, 3: 3, 4: 3}


def test_bad_params(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        kcore_peel(df, k=0, rounds=1)
    with pytest.raises(ValueError):
        kcore_peel(df, k=2, rounds=0)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(lambda e: e[0] < e[1]),
        max_size=30,
        unique=True,
    ),
    k=st.integers(1, 3),
    rounds=st.integers(1, 3),
)
def test_matches_python_model(spark, edges, k, rounds):
    assert _spark_peel(spark, edges, k, rounds) == _python_peel(edges, k, rounds)
