"""Frequent-itemset mining (Apriori, level-wise) over (group, item)
tables — the market-basket operator family beyond the pair support the
basket-lift query covers (Agrawal & Srikant VLDB'94).

Shape, and why it scales:

- **Candidates never materialize globally.** Pairs and triples are
  generated IN-ARRAY per basket (the capped sorted-array HOF shared
  with the near-dup buckets / cooccurrence edges): a basket of n items
  emits C(n,2)/C(n,3) rows bounded by the basket cap, not by the
  catalog. A 10⁶-item pathological basket is dropped in-plan before a
  single pair exists.
- **Apriori pruning = one semi join per sublevel, on the item keys.**
  Rare items are removed from baskets BEFORE pair generation (the L1
  filter — shrinks the arrays, so the in-array expansion does less
  work everywhere); candidate triples are pruned by semi joins against
  the frequent-pair set on each of the three sub-pairs. All equi
  joins; no nested loop anywhere.
- **Pruning is result-invariant** (it only removes itemsets whose
  support is provably < min_support — the Apriori property), so a
  naive count-all-HAVING oracle pins the optimized plan exactly: the
  bloom-semireduction / skyline optimized-vs-naive proof pattern.

Determinism: output itemsets are canonical (p1 < p2 < p3 by item id,
from the sorted basket array), so the result is a plain set of rows —
order-insensitive, exactly oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["frequent_items", "frequent_pairs", "frequent_triples"]


def _baskets(
    df: DataFrame, group_col: str, item_col: str, max_items_per_group: int
) -> DataFrame:
    """(_g, _items): distinct items per group as a sorted array,
    groups capped in-plan (cf. operators/triangles._group_pairs)."""
    return (
        df.select(F.col(group_col).alias("_g"), F.col(item_col).alias("_i"))
        .where(F.col("_i").isNotNull())
        .distinct()
        .groupBy("_g")
        .agg(F.array_sort(F.collect_set("_i")).alias("_items"))
        .where(F.size("_items") <= max_items_per_group)
    )


def frequent_items(
    df: DataFrame,
    group_col: str,
    item_col: str,
    min_support: int = 2,
    max_items_per_group: int = 200,
) -> DataFrame:
    """L1: (item, support) with support >= min_support — support is
    the number of (capped) distinct baskets containing the item."""
    b = _baskets(df, group_col, item_col, max_items_per_group)
    return (
        b.select(F.explode("_items").alias("item"))
        .groupBy("item")
        .agg(F.count("*").alias("support"))
        .where(F.col("support") >= min_support)
    )


def _filtered_baskets(
    df: DataFrame,
    group_col: str,
    item_col: str,
    min_support: int,
    max_items_per_group: int,
) -> DataFrame:
    """Baskets with infrequent items REMOVED (the Apriori L1 filter) —
    shrinks every downstream in-array expansion; result-invariant for
    levels >= 2 because an itemset containing a rare item is rare."""
    b = _baskets(df, group_col, item_col, max_items_per_group)
    l1 = frequent_items(df, group_col, item_col, min_support, max_items_per_group)
    kept = (
        b.select("_g", F.explode("_items").alias("item"))
        .join(l1.select("item"), "item", "left_semi")
        .groupBy("_g")
        .agg(F.array_sort(F.collect_set("item")).alias("_items"))
    )
    return kept


def frequent_pairs(
    df: DataFrame,
    group_col: str,
    item_col: str,
    min_support: int = 2,
    max_items_per_group: int = 200,
) -> DataFrame:
    """L2: (p1, p2, support), p1 < p2, support >= min_support."""
    b = _filtered_baskets(df, group_col, item_col, min_support, max_items_per_group)
    pairs = b.where(F.size("_items") >= 2).select(
        F.explode(
            F.expr(
                "flatten(transform(_items, (x, i) ->"
                " transform(slice(_items, i + 2, size(_items) - i - 1),"
                " y -> struct(x AS p1, y AS p2))))"
            )
        ).alias("_e")
    )
    return (
        pairs.groupBy(F.col("_e.p1").alias("p1"), F.col("_e.p2").alias("p2"))
        .agg(F.count("*").alias("support"))
        .where(F.col("support") >= min_support)
    )


def frequent_triples(
    df: DataFrame,
    group_col: str,
    item_col: str,
    min_support: int = 2,
    max_items_per_group: int = 200,
) -> DataFrame:
    """L3: (p1, p2, p3, support), p1 < p2 < p3, support >= min_support.

    Candidate triples generate in-array from L1-filtered baskets, then
    Apriori-prune by THREE left-semi joins against the frequent-pair
    set (each sub-pair must be frequent) before the counting shuffle —
    at scale the prune is what keeps the count agg's key space near
    the true L3 frontier instead of the raw candidate space."""
    b = _filtered_baskets(df, group_col, item_col, min_support, max_items_per_group)
    l2 = frequent_pairs(
        df, group_col, item_col, min_support, max_items_per_group
    ).select("p1", "p2")
    triples = b.where(F.size("_items") >= 3).select(
        F.explode(
            F.expr(
                "flatten(transform(_items, (x, i) ->"
                " flatten(transform(slice(_items, i + 2, size(_items) - i - 1),"
                " (y, j) -> transform(slice(_items, i + j + 3,"
                " size(_items) - i - j - 2),"
                " z -> struct(x AS p1, y AS p2, z AS p3))))))"
            )
        ).alias("_t")
    ).select(
        F.col("_t.p1").alias("p1"),
        F.col("_t.p2").alias("p2"),
        F.col("_t.p3").alias("p3"),
    )
    for a, c in (("p1", "p2"), ("p1", "p3"), ("p2", "p3")):
        triples = triples.join(
            l2.select(F.col("p1").alias(a), F.col("p2").alias(c)),
            [a, c],
            "left_semi",
        )
    return (
        triples.groupBy("p1", "p2", "p3")
        .agg(F.count("*").alias("support"))
        .where(F.col("support") >= min_support)
    )
