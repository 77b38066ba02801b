"""PageRank over an edge DataFrame — the iterative-numeric operator
family (alongside the Lloyd k-means in ``clustering.py`` and the
large-star/small-star components in ``components.py``).

Curation use: centrality over the near-dup pair graph scores which
documents sit at the heart of duplicated-content clusters (drop-first
candidates); over a link/transition graph it is the classic quality
prior (Page et al. 1999).

Semantics: standard damped PageRank with uniform teleport,
    r⁽ᵗ⁺¹⁾(v) = (1−d)/N + d·( Σ_{u→v} r⁽ᵗ⁾(u)/outdeg(u) + D⁽ᵗ⁾/N )
where D⁽ᵗ⁾ is the total rank mass sitting on DANGLING nodes (no
out-edges), redistributed uniformly — without it rank leaks and the
vector no longer sums to 1 (checked in tests).

Scale shape: per iteration ONE join of the rank vector with the edge
list (shuffle on src — co-partitionable across iterations since the
key never changes) + one hash agg on dst + a 1-row broadcast dangling
aggregate. Rank state is (node, rank) — never materialized on the
driver except the fixed-iteration loop's lineage cuts
(``localCheckpoint`` every few rounds, the same device as k-means and
components; driver holds no data). Fixed iteration count keeps the
result deterministic and cross-engine comparable (an unrolled-SQL
oracle can replicate it — see plans/roundsix_pending).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
    damping: float = 0.85,
    checkpoint_every: int = 4,
) -> DataFrame:
    """(node, rank) after ``iterations`` damped power-method rounds.
    Nodes = every id appearing as src or dst; duplicate edges count
    with multiplicity (pre-``distinct()`` at the call site if not
    wanted)."""
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    nodes = (
        e.select(F.col("_s").alias("node"))
        .unionByName(e.select(F.col("_d").alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()  # scalar loop constant, not data on the driver
    if n_nodes == 0:
        return nodes.withColumn("rank", F.lit(0.0))

    outdeg = e.groupBy("_s").agg(F.count("*").alias("_out"))
    # contribution edges with sender outdegree attached, reused each round
    contrib_edges = e.join(outdeg, "_s").localCheckpoint(eager=True)

    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    base = (1.0 - damping) / n_nodes
    for i in range(iterations):
        # rank mass on dangling nodes (no out-edges) this round
        dangling = (
            ranks.join(outdeg, ranks["node"] == outdeg["_s"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dang"))
        )
        inflow = (
            contrib_edges.join(ranks, contrib_edges["_s"] == ranks["node"])
            .select(F.col("_d").alias("node"), (F.col("rank") / F.col("_out")).alias("_c"))
            .groupBy("node")
            .agg(F.sum("_c").alias("_in"))
        )
        ranks = (
            nodes.join(inflow, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("_in"), F.lit(0.0)) + F.col("_dang") / n_nodes)
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=True)  # cut the iteration lineage
    return ranks
