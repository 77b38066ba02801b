"""Hop distances (operators/hops.py) vs plain Python BFS."""

from __future__ import annotations

from collections import deque

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spotify_data_pipeline_spark.operators.hops import hop_distances


def _bfs(edges, seeds, max_hops):
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        u = q.popleft()
        if dist[u] >= max_hops:
            continue
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def _run(spark, edges, seeds, max_hops):
    e = spark.createDataFrame(sorted(edges), "src long, dst long")
    s = spark.createDataFrame([(x,) for x in sorted(seeds)], "node long")
    return {r.node: r.dist for r in hop_distances(e, s, max_hops).collect()}


def test_path_graph_exact_frontiers(spark):
    edges = {(0, 1), (1, 2), (2, 3), (3, 4)}
    assert _run(spark, edges, {0}, 2) == {0: 0, 1: 1, 2: 2}
    assert _run(spark, edges, {0, 4}, 1) == {0: 0, 4: 0, 1: 1, 3: 1}


def test_shorter_path_wins_and_self_loop_harmless(spark):
    edges = {(0, 1), (1, 2), (0, 2), (2, 2)}
    got = _run(spark, edges, {0}, 3)
    assert got == {0: 0, 1: 1, 2: 1}  # direct edge beats the 2-hop route


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.sets(
        st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(lambda e: e[0] < e[1]),
        min_size=1,
        max_size=20,
    ),
    seeds=st.sets(st.integers(0, 9), min_size=1, max_size=3),
    hops=st.integers(1, 4),
)
def test_random_graphs_match_bfs(spark, edges, seeds, hops):
    assert _run(spark, edges, seeds, hops) == _bfs(edges, seeds, hops)
