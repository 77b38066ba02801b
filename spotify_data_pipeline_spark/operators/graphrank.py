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
    checkpoint_every: int = 2,
) -> DataFrame:
    """(node, rank) after ``iterations`` damped power-method rounds.
    Nodes = every id appearing as src or dst; duplicate edges count
    with multiplicity (pre-``distinct()`` at the call site if not
    wanted).

    r13 (guide §5/§2.4): two round-cost cuts, values unchanged.

    1. The dangling-mass term was a per-round ANTI-JOIN of the rank
       vector against the outdegree table — two exchanges per round
       replayed ~2^(rounds since last cut) times. The node frame now
       carries a static ``_has_out`` flag (outdegree join done ONCE,
       before the loop), so dangling mass is a map-side filter+agg
       over the rank state. Same row set (node has no out-edge ⟺
       _has_out is false), same sum.
    2. ``checkpoint_every`` default 4 → 2, from a measured cadence
       sweep at sf0.1 (see OPTIMIZATION_r13.md): one eager
       localCheckpoint has a FIXED ~2-2.5 s cost locally (plan→RDD
       conversion + job round-trip) — far above one round's compute —
       so per-round cuts lose to sparse cuts, while cadence 2 caps
       lineage replay at 2² and measured best end-to-end (build 6.8 /
       warm 0.72 s vs 10.6 / 1.83 s for the old anti-join body at
       cadence 4)."""
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
    # static node state with the dangling flag attached once
    nodes_deg = (
        nodes.join(outdeg, nodes["node"] == outdeg["_s"], "left")
        .select("node", F.col("_out").isNotNull().alias("_has_out"))
        .localCheckpoint(eager=True)
    )

    ranks = nodes_deg.withColumn("rank", F.lit(1.0 / n_nodes))
    base = (1.0 - damping) / n_nodes
    for i in range(iterations):
        # rank mass on dangling nodes (no out-edges) this round —
        # a map-side filter+agg over the state, no join
        dangling = ranks.where(~F.col("_has_out")).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dang")
        )
        inflow = (
            contrib_edges.join(ranks, contrib_edges["_s"] == ranks["node"])
            .select(F.col("_d").alias("node"), (F.col("rank") / F.col("_out")).alias("_c"))
            .groupBy("node")
            .agg(F.sum("_c").alias("_in"))
        )
        ranks = (
            nodes_deg.join(inflow, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "_has_out",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("_in"), F.lit(0.0)) + F.col("_dang") / n_nodes)
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=True)  # cut the iteration lineage
    return ranks.select("node", "rank")
