"""Community-quality metrics for labeled graphs — exact-integer
modularity atoms (Newman & Girvan 2004).

Modularity of a node partition: Q = Σ_c (e_c/m − (d_c/2m)²), where m
is the edge count, e_c the intra-community edge count and d_c the sum
of member degrees. Every float in that formula is a ratio of integers,
so the engine reports the EXACT integer atoms and the cross-multiplied
numerator Q·4m² = Σ_c (4·m·e_c − d_c²) — the ACF/assortativity
discipline: the sign and relative magnitudes answer "does this graph
cluster by this labeling?" exactly; the final ÷4m² is one
correctly-rounded division left to the caller.

Scale shape: one degree agg over the edge list, two label lookups that
ride the edge keys (node → label equi joins), one label-keyed agg.
Community count is typically tiny (brands, components, propagated
labels) but nothing here requires it — no window, no broadcast of the
node frame, no nested loop.

Magnitude check: 4·m·e_c ≤ 4m² and d_c² ≤ 4m², so atoms stay in
BIGINT while m < 2^30.5 (~1.5e9 edges per labeling — beyond that,
cast the two products to DECIMAL(38,0), the chi-square precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["modularity_atoms"]


def modularity_atoms(
    edges: DataFrame, labels: DataFrame, node_col: str = "node", label_col: str = "label"
) -> DataFrame:
    """Per-label modularity atoms over canonical undirected ``edges``
    (src < dst, distinct, no self-loops — the cooccurrence_edges
    contract; callers with raw edges normalize first).

    Output per label: n_nodes, degree_sum (d_c), intra_edges (e_c),
    n_edges (m, repeated — the denominators the caller divides by),
    and q_num = 4·m·e_c − d_c² (the label's exact contribution to
    Q·4m²). Edges whose endpoint is unlabeled count in m and in
    degrees but belong to no community (standard treatment)."""
    lab = labels.select(
        F.col(node_col).alias("_n"), F.col(label_col).alias("_lab")
    )
    e = (
        edges.join(
            lab.select(F.col("_n").alias("src"), F.col("_lab").alias("_ls")),
            "src",
            "left",
        )
        .join(
            lab.select(F.col("_n").alias("dst"), F.col("_lab").alias("_ld")),
            "dst",
            "left",
        )
    )
    m_df = e.agg(F.count("*").alias("_m"))
    intra = (
        e.where(F.col("_ls").isNotNull() & (F.col("_ls") == F.col("_ld")))
        .groupBy(F.col("_ls").alias("_lab"))
        .agg(F.count("*").alias("intra_edges"))
    )
    deg = (
        e.select(F.col("src").alias("_n"), F.col("_ls").alias("_lab"))
        .unionAll(e.select(F.col("dst").alias("_n"), F.col("_ld").alias("_lab")))
        .where(F.col("_lab").isNotNull())
        .groupBy("_lab")
        .agg(
            F.countDistinct("_n").alias("n_nodes"),
            F.count("*").alias("degree_sum"),
        )
    )
    return (
        deg.join(intra, "_lab", "left")
        .crossJoin(F.broadcast(m_df))
        .select(
            F.col("_lab").alias("label"),
            F.col("n_nodes").cast("long").alias("n_nodes"),
            F.col("degree_sum").cast("long").alias("degree_sum"),
            F.coalesce(F.col("intra_edges"), F.lit(0)).cast("long").alias("intra_edges"),
            F.col("_m").cast("long").alias("n_edges"),
            (
                4 * F.col("_m") * F.coalesce(F.col("intra_edges"), F.lit(0))
                - F.col("degree_sum") * F.col("degree_sum")
            )
            .cast("long")
            .alias("q_num"),
        )
    )
