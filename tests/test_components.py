"""Connected-components dedup clustering (operators/components.py).

Oracles, in increasing strength:
- hand graphs (incl. the greedy-failure case the operator exists for)
- Python union-find on seeded random graphs (structure-agnostic)
- DuckDB recursive CTE on real near-dup pairs (the exact-SQL parity a
  future declared query would ride on)
"""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.io import load_table
from spotify_data_pipeline_spark.operators.components import (
    canonical_survivors,
    connected_components,
)

SF = "/root/testdata/sf0.001"


def _pairs_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "id_a long, id_b long"
    )


def _union_find(pairs):
    """Reference labeling: node -> min node of its component."""
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in pairs:
        union(a, b)
    return {x: find(x) for x in parent}


def _labels(spark, pairs):
    df = connected_components(_pairs_df(spark, pairs))
    return {r.id: r.component for r in df.collect()}


def test_components_hand_graphs(spark):
    # chain: worst case for naive hash-min, trivial for star alternation
    assert _labels(spark, [(1, 2), (2, 3), (3, 4), (4, 5)]) == {
        i: 1 for i in range(1, 6)
    }
    # two components + the greedy-failure shape (1,3),(2,3):
    # greedy drop-id_b keeps {1,2}; components keep only 1
    assert _labels(spark, [(1, 3), (2, 3), (10, 11)]) == {
        1: 1,
        2: 1,
        3: 1,
        10: 10,
        11: 10,
    }
    # orientation + self-loop + duplicate-edge robustness
    assert _labels(spark, [(5, 2), (2, 5), (7, 7), (5, 2)]) == {2: 2, 5: 2, 7: 7}


def test_components_match_union_find_random(spark):
    rng = random.Random(420)
    for trial in range(3):
        n = 60
        pairs = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(int(n * (0.6 + 0.4 * trial)))
        ]
        pairs = [(a, b) for a, b in pairs if a != b]
        assert _labels(spark, pairs) == _union_find(pairs)


def test_components_duckdb_recursive_cte_parity(spark):
    """Exact-SQL oracle shape for a declared query: components of the
    exact n-gram Jaccard pair graph, labeled by reachable minimum via a
    recursive CTE.  Runs on real documents (sf0.001)."""
    from spotify_data_pipeline_spark.operators.dedup import ngram_jaccard_pairs

    docs = load_table(spark, SF, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.5).select("id_a", "id_b")
    got = {
        (r.id, r.component)
        for r in connected_components(pairs).collect()
    }
    pdf = pairs.toPandas()
    con = duckdb.connect()
    con.register("pairs", pdf)
    want = {
        (int(r[0]), int(r[1]))
        for r in con.execute(
            """
            WITH RECURSIVE e AS (
              SELECT id_a AS u, id_b AS v FROM pairs
              UNION
              SELECT id_b AS u, id_a AS v FROM pairs
            ), reach(u, v) AS (
              SELECT DISTINCT u, u FROM e
              UNION
              SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u
            )
            SELECT u AS id, min(v) AS component FROM reach GROUP BY u
            """
        ).fetchall()
    }
    assert len(got) > 0
    assert got == want


def test_canonical_survivors_semantics(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 8)], "doc_id long, text string"
    )
    pairs = _pairs_df(spark, [(1, 3), (2, 3), (5, 6)])
    kept = sorted(
        r.doc_id for r in canonical_survivors(docs, pairs).collect()
    )
    # clusters {1,2,3} -> keep 1, {5,6} -> keep 5; 4 and 7 untouched
    assert kept == [1, 4, 5, 7]


def test_components_empty_and_converged_fast(spark):
    empty = _pairs_df(spark, [])
    assert connected_components(empty).count() == 0
    # a clique must converge in far fewer than max_iter rounds
    clique = [(a, b) for a in range(20) for b in range(a + 1, 20)]
    assert _labels(spark, clique) == {i: 0 for i in range(20)}


def test_components_stress_path_and_large_random(spark):
    """Convergence-rate stress: a long path is the adversarial input for
    naive min-propagation (O(n) rounds); star alternation must finish it
    within the operator's O(log^2 n) max_iter budget. Plus a larger
    random graph against union-find."""
    path = [(i, i + 1) for i in range(300)]
    assert _labels(spark, path) == {i: 0 for i in range(301)}

    rng = random.Random(77)
    n = 1000
    pairs = list(
        {
            (rng.randrange(n), rng.randrange(n))
            for _ in range(1200)
        }
    )
    pairs = [(a, b) for a, b in pairs if a != b]
    assert _labels(spark, pairs) == _union_find(pairs)
