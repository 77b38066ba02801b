"""Driver-provable k-means — deterministic Lloyd over int8-quantized
vectors in EXACT integer arithmetic, the KMV/md5-MinHash move applied
to clustering (SURVEY NS-9's trained path is rows-only because float
centroids and random init are not cross-engine-reproducible; THIS
variant makes every step a pure function of the data so a DuckDB
oracle replicates the whole algorithm):

- **init**: the k seed vectors are the first k ids under the
  (md5(vec_id), vec_id) order — the engine's standard seeded-order
  device; no RNG, no first-partition dependence.
- **assignment**: squared L2 distance over quantized integer
  components (≤ 64·254² per vector — exact in BIGINT), argmin with a
  (dist, cluster) total tiebreak.
- **update**: per-dimension floor(mean) via floor(CAST(s AS DOUBLE)/n)
  — one correctly-rounded division of exact integers, and floor (not
  integer DIV, which truncates toward zero for negative sums) so both
  engines land on the identical integer centroid. Emptied clusters
  keep their previous centroid (coalesce), mirrored in the oracle.
- **iterations are UNROLLED** (fixed count), the PageRank/label-prop
  replicability device: a convergence loop would be data-dependent
  control flow the oracle cannot state.

Scale shape: per iteration one broadcast of the k-row centroid frame
over the corpus scan (map-side distance fold, the IVF-assign pattern)
and one (cluster, dim) aggregate — k·dims rows of state, never the
corpus, exactly the production Lloyd layout. The float/k-means++ path
stays in operators/clustering.py as the recall-tested fast variant;
this one is the auditable twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["kmeans_exact", "kmeans_cluster_report"]


def _dist(q, c):
    return F.aggregate(
        F.zip_with(q, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v.cast("long"),
    )


def _assign(vecs: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, q, cluster, dist): nearest centroid per vector, ties
    to the lower cluster id. Broadcast k-row centroid frame."""
    from pyspark.sql import Window

    scored = vecs.crossJoin(F.broadcast(centroids)).select(
        "vec_id", "q", "cluster", _dist(F.col("q"), F.col("c")).alias("dist")
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("dist").asc(), F.col("cluster").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def _update(assigned: DataFrame, prev: DataFrame, dims: int) -> DataFrame:
    """floor-mean centroid per cluster; emptied clusters keep prev."""
    per_dim = (
        assigned.select(
            "cluster", F.posexplode(F.col("q")).alias("dim", "val")
        )
        .groupBy("cluster", "dim")
        .agg(
            F.floor(
                F.sum(F.col("val").cast("long")).cast("double") / F.count("*")
            )
            .cast("long")
            .alias("cval")
        )
    )
    new = per_dim.groupBy("cluster").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "cval"))),
            lambda s: s["cval"],
        ).alias("c")
    )
    return (
        prev.select("cluster", F.col("c").alias("_old"))
        .join(new, "cluster", "left")
        .select("cluster", F.coalesce(F.col("c"), F.col("_old")).alias("c"))
    )


def kmeans_exact(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    iterations: int = 2,
    dims: int = 64,
) -> DataFrame:
    """Final assignment frame (vec_id, cluster, dist) after the fixed
    unrolled iterations (see module docstring for the determinism
    contract)."""
    from pyspark.sql import Window

    from spotify_data_pipeline_spark.operators.quantization import quantize_vectors

    vecs = quantize_vectors(
        emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v")),
        "_v",
        "_q",
    ).select(
        "vec_id", F.transform(F.col("_q"), lambda x: x.cast("long")).alias("q")
    )
    seed_w = Window.orderBy(
        F.md5(F.col("vec_id").cast("string")).asc(), F.col("vec_id").asc()
    )
    centroids = (
        vecs.withColumn("_rn", F.row_number().over(seed_w))
        .where(F.col("_rn") <= k)
        .select((F.col("_rn") - 1).cast("long").alias("cluster"), F.col("q").alias("c"))
    )
    # r13 (guide §5, the iterative-operator lineage device): each
    # round's centroid frame references the previous one TWICE
    # (assign's broadcast + update's emptied-cluster coalesce), so an
    # unrolled loop replays the whole history ~2^t times — the same
    # pathology fixed for BPE/MMR in r12. The centroid frame is k rows;
    # an eager localCheckpoint per round makes every later reference a
    # k-row in-memory scan. Values are unchanged (checkpoint is a
    # materialization, not a computation).
    for _ in range(iterations):
        assigned = _assign(vecs, centroids)
        centroids = _update(assigned, centroids, dims).localCheckpoint(eager=True)
    # final labels against the post-update centroids
    return _assign(vecs, centroids).select("vec_id", "cluster", "dist")


def kmeans_cluster_report(
    emb: DataFrame, k: int = 4, iterations: int = 2
) -> DataFrame:
    """Per-cluster audit row: size and exact integer inertia — the
    k-row summary a driver compare can pin."""
    labels = kmeans_exact(emb, k=k, iterations=iterations)
    return (
        labels.groupBy("cluster")
        .agg(
            F.count("*").cast("long").alias("n_members"),
            F.sum("dist").cast("long").alias("inertia"),
            F.min("dist").cast("long").alias("min_dist"),
            F.max("dist").cast("long").alias("max_dist"),
        )
        .orderBy("cluster")
    )
