"""Triangle counting on a co-occurrence graph — degree-ordered wedges.

The graph-analytics companion to PageRank (``graphrank.py``) and
connected components (``components.py``): triangle count is the basic
cohesion/clustering statistic (local clustering coefficient, community
strength, spam/bot detection on interaction graphs). The reference
pipeline has no graph surface at all; this is §2.12 north-star
territory, built public-literature-first.

Algorithm — node-iterator with DEGREE ORDERING (Suri & Vassilvitskii,
WWW'11, "Counting triangles and the curse of the last reducer"):
orient every undirected edge from its lower-(degree, id) endpoint to
the higher one. Every triangle then has exactly ONE wedge whose center
is its minimum-rank vertex, so counting (wedge ∩ closing edge) counts
each triangle exactly once, and — the scale point — the out-degree of
any vertex under this orientation is O(√m), which bounds per-vertex
wedge generation by O(m) total wedges ~ O(m^{3/2}) worst case instead
of Σ deg² (the "last reducer" hot key on power-law hubs: a celebrity
node with 10⁸ followers generates 10¹⁶ unordered wedges but only
O(m) ordered ones).

Physical shape: three hash aggs + two equi shuffles, all map-side
combinable — degree count, orientation join (edge ⋈ degree, twice),
wedge self-join on the center vertex, closing-edge semi join. No
CartesianProduct, no BNLJ, no driver state.

Edge construction from co-occurrence (parts sharing an order, tracks
sharing a playlist) uses the repo's capped-bucket in-array pattern:
items collect per group (sorted, capped), pairs generate inside the
array — never a row-explosion self-join on the group key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "cooccurrence_edges",
    "cooccurrence_counts",
    "triangle_count",
    "triangle_counts_per_vertex",
]


def _group_pairs(
    df: DataFrame, group_col: str, item_col: str, max_items_per_group: int
) -> DataFrame:
    """One (src, dst) row per (group, unordered item pair), src < dst —
    the single home of the capped in-array pair HOF. Same shape as the
    near-dup bucket pairs (operators/dedup.py ~314) — deliberately NOT
    shared with dedup: that module is evidence-pinned for this round's
    tail queries (tests/evidence_hashes.json), so adding an export
    there would invalidate their driver proof; unify when it rotates
    through the window."""
    items = (
        df.select(F.col(group_col).alias("_g"), F.col(item_col).alias("_i"))
        .where(F.col("_i").isNotNull())
        .distinct()
        .groupBy("_g")
        .agg(F.array_sort(F.collect_set("_i")).alias("_items"))
        .where(F.size("_items").between(2, max_items_per_group))
    )
    return items.select(
        F.explode(
            F.expr(
                "flatten(transform(_items, (x, i) ->"
                " transform(slice(_items, i + 2, size(_items) - i - 1),"
                " y -> struct(x AS src, y AS dst))))"
            )
        ).alias("_e")
    ).select("_e.src", "_e.dst")


def cooccurrence_edges(
    df: DataFrame,
    group_col: str,
    item_col: str,
    max_items_per_group: int = 200,
) -> DataFrame:
    """Distinct undirected edges (src < dst) between items sharing a
    group. Groups larger than ``max_items_per_group`` are DROPPED
    (cf. the near-dup bucket caps: a pathological group of 10⁶ items
    would emit 5·10¹¹ pairs; a real corpus's giant groups are
    boilerplate, not signal) — the cap is applied in-plan, before any
    pair materializes, because pairs generate INSIDE the per-group
    sorted item array.
    """
    return _group_pairs(df, group_col, item_col, max_items_per_group).distinct()


def cooccurrence_counts(
    df: DataFrame,
    group_col: str,
    item_col: str,
    max_items_per_group: int = 200,
) -> DataFrame:
    """(src, dst, n_ab): the counted variant — how many groups contain
    both items (market-basket pair support). Same capped in-array pair
    generation; the count replaces the distinct."""
    return (
        _group_pairs(df, group_col, item_col, max_items_per_group)
        .groupBy("src", "dst")
        .agg(F.count("*").alias("n_ab"))
    )


def _oriented(edges: DataFrame) -> DataFrame:
    """Orient each undirected edge low-rank → high-rank, where rank is
    (degree, id) lexicographic — the Suri–Vassilvitskii ordering."""
    both = edges.select(F.col("src").alias("u")).unionAll(
        edges.select(F.col("dst").alias("u"))
    )
    deg = both.groupBy("u").agg(F.count("*").alias("deg"))
    e = (
        edges.join(deg.withColumnRenamed("u", "src").withColumnRenamed("deg", "ds"), "src")
        .join(deg.withColumnRenamed("u", "dst").withColumnRenamed("deg", "dd"), "dst")
    )
    fwd = (F.col("ds") < F.col("dd")) | (
        (F.col("ds") == F.col("dd")) & (F.col("src") < F.col("dst"))
    )
    return e.select(
        F.when(fwd, F.col("src")).otherwise(F.col("dst")).alias("lo"),
        F.when(fwd, F.col("dst")).otherwise(F.col("src")).alias("hi"),
    )


def _normalized(edges: DataFrame) -> DataFrame:
    """Undirected canonical form: self-loops dropped, src < dst by node
    id, duplicates collapsed."""
    return (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .distinct()
    )


def _closed_wedges(edges: DataFrame) -> DataFrame:
    """(center, src, dst) for every triangle of the NORMALIZED graph,
    exactly once: wedges (lo→b), (lo→c) centered at the min-rank vertex
    with b < c by node id (the a.hi < b.hi filter — which also makes
    (b, c) match the canonical closing-edge orientation), closed by a
    semi join against the edge set."""
    o = _oriented(edges)
    w = (
        o.alias("a")
        .join(o.alias("b"), F.col("a.lo") == F.col("b.lo"))
        .where(F.col("a.hi") < F.col("b.hi"))
        .select(
            F.col("a.lo").alias("center"),
            F.col("a.hi").alias("src"),
            F.col("b.hi").alias("dst"),
        )
    )
    return w.join(edges, ["src", "dst"], "left_semi")


def triangle_count(edges: DataFrame) -> DataFrame:
    """One row (n_nodes, n_edges, n_triangles) for the undirected graph
    ``edges`` (src, dst; self-loops ignored, direction/duplicates
    normalized first). Each triangle counted exactly once via its
    minimum-rank wedge center."""
    edges = _normalized(edges)
    closed = _closed_wedges(edges)
    # three 1-row aggregates assembled by broadcast cross join (the
    # documented broadcast-1-row pattern; O(1) rows on every side)
    nodes_df = (
        edges.select(F.col("src").alias("u"))
        .unionAll(edges.select(F.col("dst").alias("u")))
        .agg(F.countDistinct("u").alias("n_nodes"))
    )
    return (
        nodes_df.crossJoin(F.broadcast(edges.agg(F.count("*").alias("n_edges"))))
        .crossJoin(F.broadcast(closed.agg(F.count("*").alias("n_triangles"))))
        .select("n_nodes", "n_edges", "n_triangles")
    )


def triangle_counts_per_vertex(edges: DataFrame) -> DataFrame:
    """(u, n_triangles): triangles incident to each vertex — the
    numerator of the local clustering coefficient. Same oriented-wedge
    enumeration, but each closed wedge credits all three corners (one
    shuffle more than the global count)."""
    closed = _closed_wedges(_normalized(edges))
    corners = (
        closed.select(F.col("center").alias("u"))
        .unionAll(closed.select(F.col("src").alias("u")))
        .unionAll(closed.select(F.col("dst").alias("u")))
    )
    return corners.groupBy("u").agg(F.count("*").alias("n_triangles"))
