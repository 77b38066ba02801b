"""PageRank (operators/graphrank.py): fixed-iteration damped power
method vs an independent Python model, analytic sanity on symmetric
graphs, dangling-mass conservation."""

from __future__ import annotations

from collections import defaultdict

import pytest

from spotify_data_pipeline_spark.operators.graphrank import pagerank


def _model(edges, iterations=10, d=0.85):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    out = defaultdict(int)
    for u, _ in edges:
        out[u] += 1
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        dang = sum(r[v] for v in nodes if out[v] == 0)
        inflow = defaultdict(float)
        for u, v in edges:
            inflow[v] += r[u] / out[u]
        r = {v: (1 - d) / n + d * (inflow[v] + dang / n) for v in nodes}
    return r


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r.node: r.rank for r in pagerank(df, **kw).collect()}


def test_matches_python_model_directed_with_dangling(spark):
    edges = [(1, 2), (1, 3), (2, 3), (3, 4), (5, 1), (5, 4), (6, 1)]
    # 4 is dangling (no out-edges) — redistribution must be in play
    got = _run(spark, edges, iterations=5)
    want = _model(edges, iterations=5)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-9), v
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)  # mass conserved


def test_symmetric_cycle_is_uniform(spark):
    edges = [(i, (i % 5) + 1) for i in range(1, 6)]
    got = _run(spark, edges, iterations=4)
    for v, r in got.items():
        assert r == pytest.approx(0.2, abs=1e-12), v


def test_star_center_dominates(spark):
    # undirected star: spokes point at center and back
    edges = [(0, i) for i in range(1, 9)] + [(i, 0) for i in range(1, 9)]
    got = _run(spark, edges, iterations=5)
    assert got[0] > 3 * max(got[i] for i in range(1, 9))
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_multiplicity_counts(spark):
    """Duplicate edges weight the contribution (documented): 1→2 twice
    and 1→3 once sends 2/3 of 1's rank to 2."""
    edges = [(1, 2), (1, 2), (1, 3), (2, 1), (3, 1)]
    got = _run(spark, edges, iterations=5)
    want = _model(edges, iterations=5)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-9), v
    assert got[2] > got[3]


def test_checkpoint_interval_does_not_change_result(spark):
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 2)]
    a = _run(spark, edges, iterations=5, checkpoint_every=2)
    b = _run(spark, edges, iterations=5, checkpoint_every=100)
    for v in a:
        assert a[v] == pytest.approx(b[v], rel=1e-12)


def test_empty_edge_list_returns_empty(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert pagerank(df, iterations=3).count() == 0


def test_self_loop_only_node_keeps_all_mass(spark):
    got = _run(spark, [(1, 1)], iterations=4)
    assert got[1] == pytest.approx(1.0, abs=1e-12)
