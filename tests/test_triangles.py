"""Triangle counting (operators/triangles.py) vs brute-force
enumeration — known graphs, random graphs, and the degree-ordered
orientation's plan shape."""

from __future__ import annotations

from itertools import combinations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.operators.triangles import (
    cooccurrence_edges,
    triangle_count,
    triangle_counts_per_vertex,
)


def _brute(edges: set[tuple[int, int]]) -> dict:
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = sum(
        1
        for a, b, c in combinations(sorted(adj), 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )
    per_v = {
        v: sum(
            1
            for a, b in combinations(sorted(adj[v]), 2)
            if (min(a, b), max(a, b)) in edges
        )
        for v in adj
    }
    return {"n_nodes": len(adj), "n_edges": len(edges), "n_triangles": tri, "per_v": per_v}


def _spark_count(spark, edges: set[tuple[int, int]]):
    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    return triangle_count(df).collect()[0].asDict()


def test_known_graphs(spark):
    k4 = {(a, b) for a, b in combinations(range(4), 2)}  # complete: 4 triangles
    assert _spark_count(spark, k4) == {"n_nodes": 4, "n_edges": 6, "n_triangles": 4}
    c5 = {(0, 1), (1, 2), (2, 3), (3, 4), (0, 4)}  # 5-cycle: none
    assert _spark_count(spark, c5)["n_triangles"] == 0
    # direction/duplicate/self-loop normalization
    messy = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (1, 3)], "src long, dst long"
    )
    r = triangle_count(messy).collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (3, 3, 1)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.sets(
        st.tuples(st.integers(0, 11), st.integers(0, 11)).filter(lambda e: e[0] < e[1]),
        min_size=1,
        max_size=40,
    )
)
def test_random_graphs_match_brute_force(spark, edges):
    want = _brute(edges)
    got = _spark_count(spark, edges)
    assert got == {k: want[k] for k in ("n_nodes", "n_edges", "n_triangles")}


def test_per_vertex_matches_brute_force(spark):
    edges = {(0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (3, 4), (0, 4), (2, 4)}
    want = _brute(edges)["per_v"]
    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    got = {r.u: r.n_triangles for r in triangle_counts_per_vertex(df).collect()}
    # vertices in no triangle are absent from the spark result
    assert got == {v: n for v, n in want.items() if n > 0}


def test_cooccurrence_edges_capped_and_pairs(spark):
    rows = [("g1", i) for i in range(3)] + [("g2", i) for i in range(10, 16)] + [
        ("g3", 99)  # singleton: no pairs
    ]
    df = spark.createDataFrame(rows, "g string, item long")
    edges = {(r.src, r.dst) for r in cooccurrence_edges(df, "g", "item").collect()}
    assert (0, 1) in edges and (0, 2) in edges and (1, 2) in edges
    assert all(s < d for s, d in edges)
    assert len(edges) == 3 + 15  # C(3,2) + C(6,2)
    # cap drops the oversized group BEFORE pair generation
    capped = cooccurrence_edges(df, "g", "item", max_items_per_group=3)
    assert {(r.src, r.dst) for r in capped.collect()} == {(0, 1), (0, 2), (1, 2)}


def test_plan_no_cartesian_in_wedge_path(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "src long, dst long")
    plan = triangle_count(df)._jdf.queryExecution().executedPlan().toString()
    # the two broadcast-1-row assemblies are the only nested-loop nodes
    assert plan.count("BroadcastNestedLoopJoin") <= 2
    per_v_plan = (
        triangle_counts_per_vertex(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in per_v_plan
    assert "CartesianProduct" not in per_v_plan


def test_duplicate_cooccurrence_rows_do_not_double_edges(spark):
    df = spark.createDataFrame(
        [("g", 1), ("g", 1), ("g", 2), ("g", 2)], "g string, item long"
    )
    assert cooccurrence_edges(df, "g", "item").count() == 1
