"""Semi-supervised label propagation over an undirected graph.

Fourth member of the graph family (PageRank ``graphrank.py``,
connected components ``components.py``, triangles ``triangles.py``):
spread a small set of seed labels (brand, language, topic, spam/ham)
to unlabeled nodes through the edge structure — the classic
community/annotation bootstrap (Zhu & Ghahramani 2002; Raghavan et al.
2007 for the unsupervised LPA variant).

Semantics — deterministic SYNCHRONOUS rounds, fixed iteration count:
each round, every non-seed node takes the MAJORITY label among its
neighbors' current labels (unlabeled neighbors don't vote; ties break
to the smallest label — no randomness, unlike classic LPA whose
random tie-breaks make runs incomparable); SEED nodes keep their seed
forever (the semi-supervised contract). Unlabeled nodes with no
labeled neighbor stay unlabeled. Fixed iterations + total tie order
make the result bit-stable and replicable by an unrolled-SQL oracle
(the PageRank device).

Scale shape per round: one equi join of the label vector against the
symmetrized adjacency (shuffle on node id), one (node, label) hash
agg, one per-node top-1 window — all map-side combinable or
single-key-partitioned; label state is (node, label), never on the
driver; lineage cut every few rounds via localCheckpoint, like the
other iterative operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["label_propagation"]


def label_propagation(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 3,
    checkpoint_every: int = 4,
) -> DataFrame:
    """(node, label) for every node labeled after ``iterations``
    synchronous rounds. ``edges`` (src, dst) are treated as undirected
    (symmetrized, self-loops dropped); ``seeds`` (node, label) pins
    those nodes' labels permanently. Duplicate edges vote with
    multiplicity (``distinct()`` at the call site if unwanted)."""
    adj = (
        edges.where(F.col("src") != F.col("dst"))
        .select(F.col("src").alias("node"), F.col("dst").alias("nbr"))
        .unionByName(
            edges.where(F.col("src") != F.col("dst")).select(
                F.col("dst").alias("node"), F.col("src").alias("nbr")
            )
        )
    ).localCheckpoint(eager=True)
    seeds = seeds.select("node", "label").localCheckpoint(eager=True)

    labels = seeds
    for t in range(iterations):
        votes = (
            adj.join(
                labels.select(F.col("node").alias("nbr"), "label"), "nbr"
            )
            .groupBy("node", "label")
            .agg(F.count("*").alias("_c"))
        )
        w = Window.partitionBy("node").orderBy(F.col("_c").desc(), F.col("label").asc())
        majority = (
            votes.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("node", "label")
        )
        labels = seeds.unionByName(
            majority.join(seeds.select("node"), "node", "left_anti")
        )
        if (t + 1) % checkpoint_every == 0 and t + 1 < iterations:
            labels = labels.localCheckpoint(eager=True)
    return labels
