"""Deterministic k-means over embedding columns (the iterative-algorithm
pattern, and the coarse quantizer for IVF ANN search).

Lloyd iterations as a driver-side loop over DataFrame plans: assign
each vector to its nearest centroid (broadcast argmin — map-only over
the corpus), recompute centroids (posexplode + (cluster, pos) avg —
map-side-combinable), repeat. Each iteration materializes the (tiny)
centroid table only; the corpus is scanned once per iteration and never
shuffled. That is the 100 TB shape: per-iteration cost = one corpus
scan + one small aggregate.

Initialization is hash-deterministic (the k vectors with smallest
xxhash64(id)) so runs are reproducible without RNG state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.functions.vectors import cosine_similarity
from spotify_data_pipeline_spark.operators.parallelism import ensure_min_parallelism


def _assign(df: DataFrame, centroids: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Nearest-centroid id per row by cosine (broadcast argmin with
    centroid-id tiebreak). Adds ``cluster_id`` and ``cos``."""
    scored = df.crossJoin(F.broadcast(centroids)).withColumn(
        "_cos", cosine_similarity(F.col(vec_col), F.col("_centroid"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("_cos").desc(), F.col("_cid").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(*df.columns, F.col("_cid").alias("cluster_id"), F.col("_cos").alias("cos"))
    )


def kmeans_centroids(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 3,
) -> DataFrame:
    """k centroids after ``iters`` Lloyd iterations: (_cid, _centroid).

    Each iteration's centroid table is collected to the driver (k rows —
    bounded, not data-dependent) so the next iteration's plan doesn't
    stack lineage; at scale this is the standard iterative-algorithm
    pattern (checkpoint the tiny state, rescan the big input).
    """
    df = ensure_min_parallelism(df.select(id_col, vec_col))

    # deterministic init: k rows with smallest hash(id)
    init = (
        df.orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
        .limit(k)
        .select(F.col(vec_col).alias("_centroid"))
        .withColumn("_cid", F.row_number().over(Window.orderBy(F.lit(1))) - 1)
    )
    spark = df.sparkSession
    centroids = spark.createDataFrame(
        init.collect(), schema=init.schema
    )

    for _ in range(iters):
        assigned = _assign(df, centroids, id_col, vec_col)
        ex = assigned.select("cluster_id", F.posexplode(vec_col).alias("pos", "x"))
        new = (
            ex.groupBy("cluster_id", "pos")
            .agg(F.avg(F.col("x").cast("double")).alias("cx"))
            .groupBy("cluster_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "cx"))), lambda s: s["cx"]
                ).alias("_centroid")
            )
            .select(F.col("cluster_id").alias("_cid"), "_centroid")
        )
        centroids = spark.createDataFrame(new.collect(), schema=new.schema)
    return centroids


def assign_clusters(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, vec, cluster_id, cos) for every row — the IVF inverted-list
    build once centroids are trained."""
    return _assign(
        ensure_min_parallelism(df.select(id_col, vec_col)), centroids, id_col, vec_col
    )
