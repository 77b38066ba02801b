"""Connected components over near-duplicate pair sets (dedup
clustering — the step between "candidate pairs" and "drop duplicates").

The near-dup operators (``operators/dedup.py``) emit PAIRS
(id_a, id_b, similarity).  A curation pipeline must then pick ONE
canonical document per duplicate *cluster*, where clusters are the
connected components of the pair graph: if A~B and B~C, then {A, B, C}
is one cluster even when A~C was never emitted (similarity is not
transitive, but duplicate-removal policy is — the reference's set-gate
dedup (spotify_etl_v2.py:143-144) has exactly these keep-one-per-group
semantics for exact keys; this extends it to similarity graphs).

Greedy pair-loser removal (drop id_b of every pair) over-keeps on
chains: edges (1,3),(2,3) drop only {3}, keeping BOTH 1 and 2 from the
same cluster.  Component labeling keeps exactly one.

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14 — the same
public algorithm GraphFrames uses).  Each half-round is one
groupBy(min) + one equi-join on the grouped key + distinct; the edge
set provably converges to a forest of stars whose roots are the
component minima in O(log^2 n) rounds (2 rounds for the dense clique
clusters near-dup graphs actually produce).

Scale notes (100 TB):
- No step ever materializes a component in one task: per-node state is
  one (node, current-min) edge, shuffled by node id.  Max per-key width
  is the node's degree, bounded by the pair generators' bucket caps.
- The driver holds ONLY a 2-value convergence checksum per round (the
  bounded-iterative-state pattern documented in clustering.py).
- Lineage is cut per round with ``localCheckpoint`` — iterative plan
  growth otherwise makes round k cost O(k) to re-analyze.  On a real
  cluster with executor loss concerns, swap for reliable
  ``checkpoint()`` against the cluster checkpoint dir; semantics are
  identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _edge_checksum(e: DataFrame) -> tuple[int, int]:
    """(count, order-insensitive content hash) of the edge set — the
    per-round convergence probe.  xxhash64 summed as decimal(38,0):
    BIGINT sum overflows under ANSI mode on large edge sets."""
    row = e.agg(
        F.count("*").alias("n"),
        F.coalesce(
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)
        ).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 30,
) -> DataFrame:
    """Label every node of the undirected pair graph with its component
    id (the MINIMUM node id in the component — deterministic, no RNG).

    Input: (id_a, id_b) pairs, any orientation, self-loops ignored.
    Output: (id, component) — one row per distinct node in ``pairs``;
    component minima map to themselves.

    Eagerly iterates (localCheckpoint per round) — call it like an
    action-producing step, not a lazy plan fragment.
    """
    raw = pairs.select(
        F.col(id_a).cast("long").alias("u"), F.col(id_b).cast("long").alias("v")
    )
    # every id mentioned in pairs gets a label (self-loop-only nodes are
    # their own singleton component)
    nodes = (
        raw.select(F.col("u").alias("id"))
        .unionByName(raw.select(F.col("v").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    e = raw.where(F.col("u") != F.col("v")).distinct().localCheckpoint(eager=True)

    prev = _edge_checksum(e)
    for _ in range(max_iter):
        # --- large-star: every neighbor v > u re-points to
        # m(u) = min(N(u) ∪ {u}).  Symmetrize, group-min, join back.
        sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.min("v").alias("_mv"))
        m = F.least(F.col("_mv"), F.col("u"))
        large = (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), m.alias("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )

        # --- small-star: per node u, the strictly-smaller neighbors
        # S ∪ {u} all re-point to min(S).  Down-edges only (each
        # undirected edge contributes exactly once).
        d = large.where(F.col("v") < F.col("u"))
        mins_d = d.groupBy("u").agg(F.min("v").alias("_m"))
        joined = d.join(mins_d, "u")
        own = joined.select(F.col("u").alias("u"), F.col("_m").alias("v"))
        nbrs = joined.where(F.col("v") != F.col("_m")).select(
            F.col("v").alias("u"), F.col("_m").alias("v")
        )
        e = own.unionByName(nbrs).distinct().localCheckpoint(eager=True)

        cur = _edge_checksum(e)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(theoretical bound is O(log^2 n) — this indicates a bug, not data)"
        )

    # Converged edge set is child → component-min stars.  min() per node
    # is a no-op safety net; roots (component minima) have no out-edge.
    assign = e.groupBy("u").agg(F.min("v").alias("component"))
    return (
        nodes.join(assign, nodes["id"] == assign["u"], "left")
        .select(
            "id",
            F.coalesce(F.col("component"), F.col("id")).alias("component"),
        )
    )


def canonical_survivors(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Keep exactly one document per near-dup cluster: the component
    minimum (deterministic "first wins" by id).  Documents in no pair
    survive untouched.

    Scale: the loser set is (cluster-size − 1) ids per cluster — bare
    longs — anti-joined against the corpus; the corpus itself never
    shuffles (anti-join broadcasts the loser side when small, sort-merge
    otherwise).
    """
    labels = connected_components(pairs, id_a=id_a, id_b=id_b)
    losers = labels.where(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")
