"""operators/mst.py — Borůvka minimum spanning forest: equivalence
with a pure-Python Kruskal under the same tiebreak, forest
invariants, and hypothesis random graphs."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spotify_data_pipeline_spark.operators.mst import minimum_spanning_forest


def _kruskal(edges):
    """Python Kruskal with the SAME (w, u, v) total tiebreak (u < v
    normalized, parallel edges collapsed to min weight)."""
    norm = {}
    for u, v, w in edges:
        if u == v:
            continue
        a, b = min(u, v), max(u, v)
        if (a, b) not in norm or w < norm[(a, b)]:
            norm[(a, b)] = w
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    forest = []
    for (u, v), w in sorted(norm.items(), key=lambda kv: (kv[1], kv[0])):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            forest.append((u, v, w))
    return sorted(forest)


def _spark_msf(spark, edges):
    df = spark.createDataFrame(edges, "u long, v long, w long")
    return sorted(
        (r.u, r.v, r.w) for r in minimum_spanning_forest(df).collect()
    )


def test_simple_known_graph(spark):
    edges = [(1, 2, 4), (2, 3, 1), (1, 3, 3), (3, 4, 7), (4, 5, 2), (5, 3, 9)]
    got = _spark_msf(spark, edges)
    assert got == _kruskal(edges)
    assert len(got) == 4  # n-1 edges, single component
    assert sum(w for _, _, w in got) == 1 + 3 + 7 + 2


def test_forest_over_disconnected_components(spark):
    edges = [(1, 2, 5), (2, 3, 1), (10, 11, 2), (11, 12, 2), (10, 12, 9)]
    got = _spark_msf(spark, edges)
    assert got == _kruskal(edges)
    assert len(got) == 4  # (3-1) + (3-1)


def test_duplicate_weights_resolved_by_tiebreak(spark):
    # a 4-cycle of equal weights: the forest is unique under (w, u, v)
    edges = [(1, 2, 5), (2, 3, 5), (3, 4, 5), (4, 1, 5)]
    got = _spark_msf(spark, edges)
    assert got == _kruskal(edges) == [(1, 2, 5), (1, 4, 5), (2, 3, 5)]


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(0, 12), st.integers(0, 12), st.integers(1, 20)
        ),
        min_size=1,
        max_size=30,
    ).filter(lambda es: any(u != v for u, v, _ in es))
)
def test_matches_kruskal_on_random_graphs(spark, edges):
    assert _spark_msf(spark, edges) == _kruskal(edges)
