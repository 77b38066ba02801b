"""k-core peeling — the graph family's DENSITY axis (components =
connectivity, graphrank = centrality, triangles = cohesion, labelprop
= labels, hops = distance): which nodes survive when everything of
degree < k is iteratively stripped away. The classic community-core /
spam-fringe separator (Seidman 1983; Batagelj–Zaveršnik's peeling).

Semantics here are the SYNCHRONOUS fixed-round variant: each round
computes degrees over the CURRENT surviving subgraph and drops every
node below k simultaneously. After enough rounds this is exactly the
k-core; after a fixed R it is a deterministic over-approximation that
shrinks monotonically — fixed R is what makes the result bit-stable
and unrolled-SQL replicable (the PageRank / labelprop / hops oracle
device; convergence-detection would put a data-dependent loop count
between the engines). Callers that need the true core pick R ≥ the
peel depth (tests pin a case where R-1 rounds differ from R).

Scale shape per round: one semi join of edges against surviving nodes
(both endpoints) + one degree hash agg — map-side combinable, shuffle
keys are node ids; state is (node, degree) longs; lineage cuts every
few rounds like the other iterative operators. No all-pairs anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["kcore_peel"]


def kcore_peel(
    edges: DataFrame,
    k: int,
    rounds: int,
    checkpoint_every: int = 4,
) -> DataFrame:
    """(node, degree) of nodes surviving ``rounds`` synchronous peel
    rounds at threshold ``k``; degree is over the surviving subgraph.
    ``edges`` (src, dst) undirected, assumed dedup'd; self-loops must
    be removed by the caller (they would self-sustain a node)."""
    if k < 1 or rounds < 1:
        raise ValueError("kcore_peel needs k >= 1 and rounds >= 1")
    live = edges.localCheckpoint(eager=True)
    deg = None
    for t in range(rounds):
        deg = (
            live.select(F.col("src").alias("node"))
            .unionByName(live.select(F.col("dst").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("degree"))
        )
        survivors = deg.where(F.col("degree") >= k).select("node")
        live = (
            live.join(survivors.withColumnRenamed("node", "src"), "src", "left_semi")
            .join(survivors.withColumnRenamed("node", "dst"), "dst", "left_semi")
        )
        if (t + 1) % checkpoint_every == 0 and t + 1 < rounds:
            live = live.localCheckpoint(eager=True)
    # degrees over the subgraph the last peel left behind — NO extra
    # threshold filter here (that would be half of round R+1 and the
    # oracle could not tell which definition it is replicating); nodes
    # with no surviving incident edge drop out naturally
    return (
        live.select(F.col("src").alias("node"))
        .unionByName(live.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
    )
