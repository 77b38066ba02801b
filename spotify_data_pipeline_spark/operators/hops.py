"""Multi-source hop distances (synchronous BFS) — the distance
primitive completing the graph family: connectivity (components),
centrality (graphrank), cohesion (triangles), labels (labelprop),
and now DISTANCE — "how many hops from the seed set", the reach /
blast-radius / influence-frontier question.

Semantics: dist(seed) = 0; each synchronous round relaxes
dist(v) = min(dist(v), min over neighbors dist(u) + 1). After k
rounds every node within k hops holds its EXACT hop distance
(induction on shortest paths — pinned against Dijkstra-free Python
BFS in tests); unreached nodes are absent. Fixed rounds + pure min
make the result bit-stable and unrolled-SQL replicable (the
PageRank/labelprop oracle device).

Scale shape per round: one equi join of the frontier-bearing distance
vector against the symmetrized adjacency (shuffle on node id) + one
min hash agg — both map-side combinable; state is (node, dist) longs;
lineage cuts every few rounds like the other iterative operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["hop_distances"]


def hop_distances(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 3,
    checkpoint_every: int = 4,
) -> DataFrame:
    """(node, dist) for every node within ``max_hops`` of the seed set
    (``seeds``: a `node` column; duplicates tolerated). ``edges``
    (src, dst) are treated as undirected; self-loops are harmless
    (they never improve a distance)."""
    adj = (
        edges.select(F.col("src").alias("node"), F.col("dst").alias("nbr"))
        .unionByName(edges.select(F.col("dst").alias("node"), F.col("src").alias("nbr")))
        .localCheckpoint(eager=True)
    )
    dist = seeds.select("node").distinct().withColumn("dist", F.lit(0).cast("long"))
    for t in range(max_hops):
        relaxed = (
            adj.join(dist.select(F.col("node").alias("nbr"), "dist"), "nbr")
            .select("node", (F.col("dist") + 1).alias("dist"))
            .unionByName(dist)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        dist = relaxed
        if (t + 1) % checkpoint_every == 0 and t + 1 < max_hops:
            dist = dist.localCheckpoint(eager=True)
    return dist
