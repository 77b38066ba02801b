"""Frequent-itemset operator (operators/itemsets.py): equivalence with
a brute-force Python Apriori on random baskets, downward closure, and
the basket cap."""

from __future__ import annotations

from itertools import combinations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spotify_data_pipeline_spark.operators.itemsets import (
    frequent_items,
    frequent_pairs,
    frequent_triples,
)


def _python_frequent(baskets, k, min_support):
    """Brute-force level-k frequent itemsets over distinct-item baskets."""
    counts = {}
    for items in baskets:
        for combo in combinations(sorted(set(items)), k):
            counts[combo] = counts.get(combo, 0) + 1
    return {c: n for c, n in counts.items() if n >= min_support}


def _spark_df(spark, baskets):
    rows = [(g, i) for g, items in enumerate(baskets) for i in items]
    return spark.createDataFrame(rows, "g BIGINT, item BIGINT")


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    baskets=st.lists(
        st.lists(st.integers(0, 12), min_size=1, max_size=8),
        min_size=1,
        max_size=25,
    ),
    min_support=st.integers(1, 3),
)
def test_levels_match_python_bruteforce(spark, baskets, min_support):
    df = _spark_df(spark, baskets)
    got1 = {
        (r.item,): r.support
        for r in frequent_items(df, "g", "item", min_support).collect()
    }
    got2 = {
        (r.p1, r.p2): r.support
        for r in frequent_pairs(df, "g", "item", min_support).collect()
    }
    got3 = {
        (r.p1, r.p2, r.p3): r.support
        for r in frequent_triples(df, "g", "item", min_support).collect()
    }
    assert got1 == _python_frequent(baskets, 1, min_support)
    assert got2 == _python_frequent(baskets, 2, min_support)
    assert got3 == _python_frequent(baskets, 3, min_support)


def test_downward_closure(spark):
    """Every frequent triple's three sub-pairs are frequent with
    support >= the triple's (the Apriori property the prune relies on)."""
    baskets = [
        [1, 2, 3, 4],
        [1, 2, 3],
        [2, 3, 4],
        [1, 3, 4],
        [1, 2],
        [5],
    ]
    df = _spark_df(spark, baskets)
    pairs = {
        (r.p1, r.p2): r.support for r in frequent_pairs(df, "g", "item", 2).collect()
    }
    triples = {
        (r.p1, r.p2, r.p3): r.support
        for r in frequent_triples(df, "g", "item", 2).collect()
    }
    assert triples  # fixture has repeated triples by construction
    for (a, b, c), sup in triples.items():
        for sub in ((a, b), (a, c), (b, c)):
            assert pairs.get(sub, 0) >= sup, (a, b, c, sub)


def test_basket_cap_drops_wide_groups(spark):
    """A basket wider than the cap contributes nothing at any level."""
    baskets = [list(range(30)), [1, 2, 3], [1, 2, 3]]
    df = _spark_df(spark, baskets)
    capped = frequent_pairs(df, "g", "item", 2, max_items_per_group=5).collect()
    assert {(r.p1, r.p2) for r in capped} == {(1, 2), (1, 3), (2, 3)}
    assert all(r.support == 2 for r in capped)  # the wide basket excluded


def test_duplicate_items_in_basket_count_once(spark):
    df = _spark_df(spark, [[1, 1, 2, 2], [1, 2]])
    pairs = frequent_pairs(df, "g", "item", 2).collect()
    assert [(r.p1, r.p2, r.support) for r in pairs] == [(1, 2, 2)]
