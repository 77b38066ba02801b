"""Label propagation (operators/labelprop.py) vs an independent Python
model — seed immutability, deterministic ties, round-exact spreading,
isolated nodes."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spotify_data_pipeline_spark.operators.labelprop import label_propagation


def _model(edges, seeds, iterations):
    """Independent synchronous reference: majority label among labeled
    neighbors, ties to smallest label, seeds immutable."""
    adj: dict[int, list[int]] = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    labels = dict(seeds)
    for _ in range(iterations):
        nxt = dict(seeds)
        for node, nbrs in adj.items():
            if node in seeds:
                continue
            counts: dict[str, int] = {}
            for nb in nbrs:
                if nb in labels:
                    lab = labels[nb]
                    counts[lab] = counts.get(lab, 0) + 1
            if counts:
                best = max(counts.values())
                nxt[node] = min(l for l, c in counts.items() if c == best)
            # else: stays unlabeled this round
        labels = nxt
    return labels


def _run(spark, edges, seeds, iterations):
    e = spark.createDataFrame(sorted(edges), "src long, dst long")
    s = spark.createDataFrame(sorted(seeds.items()), "node long, label string")
    return {
        r.node: r.label
        for r in label_propagation(e, s, iterations=iterations).collect()
    }


def test_path_spreads_one_hop_per_round(spark):
    edges = [(0, 1), (1, 2), (2, 3), (3, 4)]
    seeds = {0: "a"}
    assert _run(spark, edges, seeds, 1) == {0: "a", 1: "a"}
    assert _run(spark, edges, seeds, 2) == {0: "a", 1: "a", 2: "a"}
    assert _run(spark, edges, seeds, 4) == {0: "a", 1: "a", 2: "a", 3: "a", 4: "a"}


def test_tie_breaks_to_smallest_label_and_seeds_immutable(spark):
    # node 1 hears 'a' from 0 and 'b' from 2 — tie, takes 'a'
    edges = [(0, 1), (1, 2)]
    seeds = {0: "a", 2: "b"}
    got = _run(spark, edges, seeds, 3)
    assert got[1] == "a" and got[0] == "a" and got[2] == "b"


def test_majority_beats_smaller_label(spark):
    # node 9 has two 'z' neighbors and one 'a' neighbor: majority wins
    edges = [(1, 9), (2, 9), (3, 9)]
    seeds = {1: "z", 2: "z", 3: "a"}
    assert _run(spark, edges, seeds, 1)[9] == "z"


def test_isolated_unlabeled_stays_absent(spark):
    edges = [(0, 1), (5, 6)]  # component {5,6} has no seed
    seeds = {0: "a"}
    got = _run(spark, edges, seeds, 3)
    assert 5 not in got and 6 not in got


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.sets(
        st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(lambda e: e[0] < e[1]),
        min_size=1,
        max_size=20,
    ),
    seed_nodes=st.dictionaries(
        st.integers(0, 9), st.sampled_from(["a", "b", "c"]), min_size=1, max_size=4
    ),
    iters=st.integers(1, 3),
)
def test_random_graphs_match_model(spark, edges, seed_nodes, iters):
    want = _model(edges, seed_nodes, iters)
    got = _run(spark, edges, seed_nodes, iters)
    # the model labels only nodes present in adj or seeds; spark's seed
    # rows always appear — align domains before comparing
    want = {n: l for n, l in want.items()}
    assert got == want
