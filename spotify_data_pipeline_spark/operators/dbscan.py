"""DBSCAN (Ester et al. KDD'96) as a composition of proven engine
operators — grid-cell ε-neighbor generation (the geo radius-join
device), core-point classification, connected components
(operators/components.py) over the core-core graph, and deterministic
border assignment.

Everything is exact integer arithmetic so the algorithm is
driver-provable end-to-end:

- points are integer coordinates; the ε-ball test is
  (Δx)² + (Δy)² ≤ eps2 — no sqrt ever compares;
- candidate pairs come from a grid of width w where w > ε is
  guaranteed by w = floor(√eps2) + 1 (the +1 absorbs any half-ulp
  wobble of float sqrt near perfect squares, and sqrt itself is
  IEEE-correctly-rounded so both engines agree bit-for-bit anyway):
  every true ε-neighbor pair shares a 3×3 cell neighborhood, so the
  grid join is EXACT candidate generation, not approximate;
- core = strictly more than ``minpts − 1`` neighbors EXCLUDING self
  (stated convention; classic DBSCAN counts self — off-by-one
  documented rather than hidden);
- cluster ids are component MINIMA (deterministic), border points
  take the MINIMUM cluster id among their core neighbors (the
  order-dependence of original DBSCAN's border assignment removed —
  a pure function of the data, which is what an oracle can pin).

Scale shape: the 9-offset explode + equi join on cell ids is the
standard spatial-join layout (no all-pairs anywhere); components is
the O(log² n) large-star/small-star operator; everything else is
aggregates. The caller picks eps2 ∝ 1/density — see the staged query
for the scale-free calibration pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["epsilon_neighbors", "dbscan_labels", "dbscan_summary"]


def epsilon_neighbors(pts: DataFrame, eps2_col: str = "eps2", w_col: str = "w") -> DataFrame:
    """Directed exact ε-neighbor pairs (ia, ib), ia ≠ ib, from integer
    points (id, x, y) with per-row eps2/w columns (constant across
    rows; carried as columns so calibration stays in-plan)."""
    cells = pts.select(
        "id",
        "x",
        "y",
        eps2_col,
        F.floor(F.col("x") / F.col(w_col)).cast("long").alias("_cx"),
        F.floor(F.col("y") / F.col(w_col)).cast("long").alias("_cy"),
    )
    cells_sql = ", ".join(
        f"struct({ox} AS ox, {oy} AS oy)"
        for ox in (-1, 0, 1)
        for oy in (-1, 0, 1)
    )
    offsets = F.expr(f"explode(array({cells_sql}))")
    a = cells.select(
        F.col("id").alias("ia"),
        F.col("x").alias("_ax"),
        F.col("y").alias("_ay"),
        F.col(eps2_col).alias("_eps2"),
        "_cx",
        "_cy",
        offsets.alias("_o"),
    ).select(
        "ia",
        "_ax",
        "_ay",
        "_eps2",
        (F.col("_cx") + F.col("_o.ox")).alias("_cx"),
        (F.col("_cy") + F.col("_o.oy")).alias("_cy"),
    )
    b = cells.select(
        F.col("id").alias("ib"),
        F.col("x").alias("_bx"),
        F.col("y").alias("_by"),
        "_cx",
        "_cy",
    )
    d2 = (F.col("_ax") - F.col("_bx")) * (F.col("_ax") - F.col("_bx")) + (
        F.col("_ay") - F.col("_by")
    ) * (F.col("_ay") - F.col("_by"))
    return (
        a.join(b, ["_cx", "_cy"])
        .where((F.col("ia") != F.col("ib")) & (d2 <= F.col("_eps2")))
        .select("ia", "ib")
    )


def dbscan_labels(pts: DataFrame, minpts: int = 5) -> DataFrame:
    """(id, kind, cluster): kind ∈ core|border|noise; cluster = the
    component minimum for core/border, NULL for noise."""
    from spotify_data_pipeline_spark.operators.components import (
        connected_components,
    )

    # r13 (guide §5): dbscan_labels is already eager (components
    # checkpoints per round), but ``nbr`` was referenced 5× and
    # ``core`` 3× across deg/ce/border — each reference replayed the
    # full grid ε-join. Eager lineage cuts make every later reference
    # an in-memory scan; values unchanged (exact integer pipeline).
    # Scale note: |nbr| is O(points × expected neighborhood) — the
    # calibrated-ε contract keeps it linear in the input.
    nbr = epsilon_neighbors(pts).localCheckpoint(eager=True)
    deg = nbr.groupBy(F.col("ia").alias("id")).agg(F.count("*").alias("_d"))
    core = deg.where(F.col("_d") >= minpts).select("id").localCheckpoint(eager=True)
    ce = (
        nbr.join(core.select(F.col("id").alias("ia")), "ia")
        .join(core.select(F.col("id").alias("ib")), "ib")
        .select(F.col("ia").alias("id_a"), F.col("ib").alias("id_b"))
    )
    lab = connected_components(ce)  # (id, component); covers cores w/ edges
    # isolated cores (no core neighbor) are their own singleton cluster
    core_lab = (
        core.join(lab, core.id == lab.id, "left")
        .select(core.id, F.coalesce(F.col("component"), core.id).alias("cluster"))
        .localCheckpoint(eager=True)  # referenced by labeled + border
    )
    border = (
        nbr.join(core_lab.select(F.col("id").alias("ib"), "cluster"), "ib")
        .join(core.select(F.col("id").alias("ia")), "ia", "left_anti")
        .groupBy(F.col("ia").alias("id"))
        .agg(F.min("cluster").alias("cluster"))
    )
    all_ids = pts.select("id")
    labeled = core_lab.select("id", F.lit("core").alias("kind"), "cluster").unionAll(
        border.select("id", F.lit("border").alias("kind"), "cluster")
    )
    noise = all_ids.join(labeled.select("id"), "id", "left_anti").select(
        "id", F.lit("noise").alias("kind"), F.lit(None).cast("long").alias("cluster")
    )
    return labeled.unionAll(noise)


def dbscan_summary(pts: DataFrame, minpts: int = 5) -> DataFrame:
    """The 1-row audit surface: point/kind counts, cluster count, and
    the largest cluster's size (core+border members)."""
    # r13: one materialization feeds both aggregates below — without it
    # the whole labeling pipeline (grid join + components) ran twice.
    lab = dbscan_labels(pts, minpts).localCheckpoint(eager=True)
    sizes = (
        lab.where(F.col("cluster").isNotNull())
        .groupBy("cluster")
        .agg(F.count("*").alias("_sz"))
    )
    kinds = lab.groupBy().agg(
        F.count("*").cast("long").alias("n_points"),
        F.sum((F.col("kind") == "core").cast("long")).cast("long").alias("n_core"),
        F.sum((F.col("kind") == "border").cast("long")).cast("long").alias("n_border"),
        F.sum((F.col("kind") == "noise").cast("long")).cast("long").alias("n_noise"),
    )
    cl = sizes.groupBy().agg(
        F.count("*").cast("long").alias("n_clusters"),
        F.max("_sz").cast("long").alias("largest_cluster"),
    )
    return kinds.crossJoin(F.broadcast(cl))
