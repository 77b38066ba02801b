"""Minimum spanning forest by Borůvka rounds — the MST algorithm that
is actually parallel (Kruskal sorts globally and union-finds
sequentially; Borůvka's per-round work is two aggregations, which is
why every distributed graph engine uses it): each round every
component picks its minimum outgoing edge (deterministic total
tiebreak on (w, u, v)), all picked edges join the forest at once, and
components merge by min-label propagation until labels stabilize.
O(log n) rounds halve the component count at least.

Spark shape per round: one groupBy(component) min-struct agg to pick
edges, then the same pointer-halving label propagation the
connected-components operator uses (operators/components.py) to merge
— no driver-side graph state beyond the per-round picked-edge count
and a bounded label frame for the final forest extraction. Edge input
never mutates; the forest accumulates as a DataFrame union.

Determinism: ties break on the full (w, min_end, max_end) struct
order, so the forest is unique even with duplicate weights PER
COMPONENT PICK; the classical caveat that equal-weight edges can make
"the" MST non-unique is resolved by that total order (both the Spark
path and any replica that honors the same tiebreak produce the same
forest — pinned by the hypothesis model test).

Cites: Borůvka 1926; the round structure follows the
large-star/small-star discipline of components.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["minimum_spanning_forest"]


def _propagate_labels(nodes: DataFrame, pairs: DataFrame) -> DataFrame:
    """Merge labels along picked edges until stable: iterated
    min-label exchange over the (bounded: one per component per round)
    picked-edge pairs. Returns (node, label)."""
    labels = nodes
    while True:
        nbr_min = (
            pairs.join(labels.withColumnRenamed("node", "a"), F.col("u") == F.col("a"))
            .select(F.col("v").alias("node"), F.col("label"))
            .unionByName(
                pairs.join(
                    labels.withColumnRenamed("node", "b"), F.col("v") == F.col("b")
                ).select(F.col("u").alias("node"), F.col("label"))
            )
            .groupBy("node")
            .agg(F.min("label").alias("nl"))
        )
        updated = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nl"), F.col("label"))).alias(
                    "label"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            updated.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = updated
        if changed == 0:
            return labels


def minimum_spanning_forest(
    edges: DataFrame,
    u_col: str = "u",
    v_col: str = "v",
    w_col: str = "w",
    max_rounds: int = 20,
) -> DataFrame:
    """Return the minimum spanning forest of the undirected graph as a
    DataFrame (u, v, w) with u < v — one row per forest edge. Edges
    must have integer-comparable weights; self-loops are dropped;
    parallel edges collapse to their minimum weight."""
    e = (
        edges.select(
            F.least(F.col(u_col), F.col(v_col)).alias("u"),
            F.greatest(F.col(u_col), F.col(v_col)).alias("v"),
            F.col(w_col).alias("w"),
        )
        .where(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.min("w").alias("w"))
        .localCheckpoint(eager=True)
    )
    spark = e.sparkSession
    labels = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    forest = None
    for _ in range(max_rounds):
        lab_u = labels.select(F.col("node").alias("u"), F.col("label").alias("cu"))
        lab_v = labels.select(F.col("node").alias("v"), F.col("label").alias("cv"))
        crossing = (
            e.join(lab_u, "u")
            .join(lab_v, "v")
            .where(F.col("cu") != F.col("cv"))
        )
        if crossing.limit(1).count() == 0:
            break
        pick_struct = F.struct(F.col("w"), F.col("u"), F.col("v"))
        picks = (
            crossing.select(F.col("cu").alias("comp"), pick_struct.alias("e"))
            .unionByName(
                crossing.select(F.col("cv").alias("comp"), pick_struct.alias("e"))
            )
            .groupBy("comp")
            .agg(F.min("e").alias("e"))
            .select(
                F.col("e.u").alias("u"), F.col("e.v").alias("v"), F.col("e.w").alias("w")
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        forest = picks if forest is None else forest.unionByName(picks).distinct()
        labels = _propagate_labels(labels, picks.select("u", "v"))
    if forest is None:
        return spark.createDataFrame([], "u long, v long, w long")
    return forest.localCheckpoint(eager=True)
