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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.functions.vectors import cosine_similarity
from spotify_data_pipeline_spark.operators.parallelism import ensure_min_parallelism


def _nearest(vec_col: str, cents: Column) -> Column:
    """Map-only nearest-centroid: fold over a literal
    ``array<struct<cid,c>>`` keeping the best (cos DESC, cid ASC) —
    a per-row HOF, so cluster assignment needs NO shuffle and NO
    window. The previous implementation window-argmin'd over a
    crossJoin, which shuffled corpus × k scored rows once per Lloyd
    iteration — the dominant cost at scale for a map-only algorithm.

    Returns a struct(cos, cid) column."""
    scored = F.transform(
        cents,
        lambda s: F.struct(
            cosine_similarity(F.col(vec_col), s["c"]).alias("cos"),
            s["cid"].alias("cid"),
        ),
    )
    init = F.struct(
        F.lit(None).cast("double").alias("cos"), F.lit(None).cast("int").alias("cid")
    )
    return F.aggregate(
        scored,
        init,
        lambda acc, s: F.when(
            acc["cos"].isNull()
            | (s["cos"] > acc["cos"])
            | ((s["cos"] == acc["cos"]) & (s["cid"] < acc["cid"])),
            s,
        ).otherwise(acc),
    )


def centroid_literals(rows: list, cid_field: str = "_cid", vec_field: str = "_centroid") -> Column:
    """Build the literal array<struct<cid,c>> column from collected
    centroid rows (k rows — bounded, the standard broadcast-tiny-state
    shape for iterative algorithms)."""
    return F.array(
        *[
            F.struct(
                F.lit(int(r[cid_field])).alias("cid"),
                F.array(*[F.lit(float(x)) for x in r[vec_field]]).alias("c"),
            )
            for r in sorted(rows, key=lambda r: r[cid_field])
        ]
    )


def _assign(df: DataFrame, centroids: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Nearest-centroid id per row by cosine (map-only literal-array
    argmax with centroid-id tiebreak). Adds ``cluster_id`` and ``cos``."""
    cents = centroid_literals(centroids.collect())
    best = _nearest(vec_col, cents)
    return df.withColumn("_best", best).select(
        *df.columns, F.col("_best.cid").alias("cluster_id"), F.col("_best.cos").alias("cos")
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

    # deterministic init: k rows with smallest hash(id). The _cid
    # window orders by the SAME (hash, id) key used for selection —
    # ordering after orderBy().limit() alone is not semantically
    # guaranteed, so ids must not rely on implementation-preserved
    # row order.
    init = (
        df.orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
        .limit(k)
        .withColumn(
            "_cid",
            F.row_number().over(
                Window.orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
            )
            - 1,
        )
        .select("_cid", F.col(vec_col).alias("_centroid"))
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
        # NOTE: a cluster that captures no rows simply produces no new
        # centroid row — effective k shrinks for later iterations (and
        # for the IVF cell count). Deliberate: reseeding would break
        # run-to-run determinism; callers needing exactly k cells
        # should raise k or iters.
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
