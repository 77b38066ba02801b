"""Similarity search over embedding columns (SURVEY.md §2.12).

- ``cosine_topk_bruteforce``: exact top-k by cosine — broadcast the
  (small) query set against the full corpus; per-query window top-k.
  This is the correctness anchor; it is also the right *plan* at scale
  when |queries| is small: the corpus is scanned once, map-side only,
  and the top-k per query uses a bounded heap (window after a
  broadcast join — no corpus shuffle).
- ``random_projection_buckets`` + ``cosine_topk_lsh``: the scale path
  for query sets too large to broadcast — sign-random-projection LSH
  buckets co-partition corpus and queries so the candidate join is
  bucket-local; exact re-rank inside buckets. Recall < 1 by design;
  multiple hash tables raise it (probe several rotations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.functions.vectors import cosine_similarity, dot
from spotify_data_pipeline_spark.operators.parallelism import ensure_min_parallelism
from spotify_data_pipeline_spark.plans.parity import rnd
from spotify_data_pipeline_spark.operators.topk import topk_per_group


def cosine_topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: (query_id, neighbor_id, cos, rn) — cos rounded 4dp and used
    as the ranking key (with neighbor_id tiebreak) so results are
    deterministic across engines and partitionings.
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    # scoring is compute-dense interpreted HOF math — make sure an
    # under-split corpus doesn't serialize it through one task
    c = ensure_min_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", rnd(cosine_similarity(F.col("_qv"), F.col("_cv")), 4))
    )
    top = topk_per_group(
        scored,
        partition_by=["query_id"],
        order_by=[F.col("cos").desc(), F.col("neighbor_id").asc()],
        k=k,
    )
    return top.select("query_id", "neighbor_id", "cos", F.col("rn").cast("long").alias("rn"))


def _projection_planes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (hash-based, no RNG state)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def random_projection_buckets(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 42,
    bucket_col: str = "lsh_bucket",
) -> DataFrame:
    """Sign-random-projection (SimHash-for-vectors) bucket id per row.

    The bucket id is the n_planes sign bits packed into a long. Cosine-
    close vectors collide with high probability (collision prob =
    1 − θ/π per plane).
    """
    planes = _projection_planes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(float(x)) for x in plane])
        bit = (dot(F.col(vec_col), plane_col) > 0).cast("long")
        bucket = bucket + F.shiftleft(bit, i)
    return df.withColumn(bucket_col, bucket)


def random_projection_buckets_multi(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
    seed_base: int = 1000,
    table_col: str = "lsh_table",
    bucket_col: str = "lsh_bucket",
) -> DataFrame:
    """All ``n_tables`` sign-random-projection bucket ids in ONE pass.

    Output: the input columns plus (table_col, bucket_col) — one row per
    (input row, table). Bucket values are bit-identical to calling
    ``random_projection_buckets(df, seed=seed_base + t)`` per table
    (same seeded planes, same sign test, same bit packing), so oracles
    that replicate the per-table hyperplanes keep matching.

    Scale rationale: the per-table formulation scans the corpus once per
    hash table (n_tables full scans + n_tables separate bucket joins);
    this computes every table's bucket in a single projection over a
    single scan, explodes to (table, bucket), and lets the caller do ONE
    candidate equi-join on the composite key. At 100 TB, n_tables=8
    means 8× less input read and one shuffle instead of eight.
    """
    planes_lit = F.array(
        *[
            F.array(
                *[
                    F.array(*[F.lit(float(x)) for x in plane])
                    for plane in _projection_planes(dim, n_planes, seed_base + t)
                ]
            )
            for t in range(n_tables)
        ]
    )
    weights = F.array(*[F.lit(1 << i).cast("long") for i in range(n_planes)])
    buckets = F.transform(
        planes_lit,
        lambda tp: F.aggregate(
            F.zip_with(
                tp,
                weights,
                lambda p, w: F.when(dot(F.col(vec_col), p) > 0, w).otherwise(
                    F.lit(0).cast("long")
                ),
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ),
    )
    return (
        df.withColumn("_mt_buckets", buckets)
        .select("*", F.posexplode("_mt_buckets").alias(table_col, bucket_col))
        .drop("_mt_buckets")
    )


def cosine_topk_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 8,
    nprobe: int = 2,
    kmeans_iters: int = 3,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k via IVF: k-means coarse quantizer
    (operators/clustering.py), inverted lists keyed by cell, each query
    probes its ``nprobe`` nearest cells and exact-re-ranks only those
    lists.

    The other ANN scale path next to ``cosine_topk_lsh``: candidates
    per query shrink from |corpus| to ~nprobe/n_cells of it, the
    cell-keyed join is an equi-join, and the centroid table stays a
    broadcast. Output schema matches ``cosine_topk_bruteforce``; recall
    measured against it in tests.

    Pass ``centroids`` (a (_cid, _centroid) DataFrame) to search
    against a precomputed/external quantizer — the production IVF
    shape, where training and serving are separate jobs — skipping the
    in-line k-means.
    """
    from spotify_data_pipeline_spark.operators.clustering import (
        assign_clusters,
        kmeans_centroids,
    )

    cent = (
        centroids
        if centroids is not None
        else kmeans_centroids(corpus, id_col, vec_col, k=n_cells, iters=kmeans_iters)
    )
    lists = assign_clusters(corpus, cent, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"), "cluster_id"
    )

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    q_scored = q.crossJoin(F.broadcast(cent)).withColumn(
        "_ccos", cosine_similarity(F.col("_qv"), F.col("_centroid"))
    )
    probes = topk_per_group(
        q_scored,
        partition_by=["query_id"],
        order_by=[F.col("_ccos").desc(), F.col("_cid").asc()],
        k=nprobe,
    ).select("query_id", "_qv", F.col("_cid").alias("cluster_id"))

    cand = probes.join(lists, "cluster_id").where(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = cand.withColumn("cos", rnd(cosine_similarity(F.col("_qv"), F.col("_cv")), 4))
    top = topk_per_group(
        scored,
        partition_by=["query_id"],
        order_by=[F.col("cos").desc(), F.col("neighbor_id").asc()],
        k=k,
    )
    return top.select("query_id", "neighbor_id", "cos", F.col("rn").cast("long").alias("rn"))


def cosine_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
) -> DataFrame:
    """Approximate top-k: n_tables independent LSH bucketings computed
    in ONE pass per side, a single (table, bucket) candidate equi-join,
    exact cosine re-rank within candidates.

    Output schema matches ``cosine_topk_bruteforce`` (query_id,
    neighbor_id, cos, rn); recall measured against it in tests.

    Candidate semantics are identical to unioning n_tables per-table
    bucket joins (a pair is a candidate iff it collides in ≥1 table) —
    the join on the composite key produces one row per colliding table
    and the id-pair dedup collapses them — but the corpus and query set
    are each scanned once instead of n_tables times, and there is one
    candidate shuffle instead of n_tables.
    """
    corpus = ensure_min_parallelism(corpus)
    qb = random_projection_buckets_multi(
        queries, vec_col, dim, n_planes, n_tables, seed_base=1000
    )
    cb = random_projection_buckets_multi(
        corpus, vec_col, dim, n_planes, n_tables, seed_base=1000
    )
    # bare id pairs only — the candidate/dedup shuffles must not carry
    # the vectors (joined back once below, same discipline as
    # dedup.embedding_neardup_lsh)
    q = qb.select(F.col(id_col).alias("query_id"), "lsh_table", "lsh_bucket")
    c = cb.select(F.col(id_col).alias("neighbor_id"), "lsh_table", "lsh_bucket")
    cand = (
        q.join(c, ["lsh_table", "lsh_bucket"])
        .drop("lsh_table", "lsh_bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    # plain equi-joins: AQE broadcasts whichever side is small enough
    # (this path exists precisely because queries may NOT be broadcastable)
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    cv = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = (
        cand.join(qv, "query_id")
        .join(cv, "neighbor_id")
        .withColumn("cos", rnd(cosine_similarity(F.col("_qv"), F.col("_cv")), 4))
    )
    top = topk_per_group(
        scored,
        partition_by=["query_id"],
        order_by=[F.col("cos").desc(), F.col("neighbor_id").asc()],
        k=k,
    )
    return top.select("query_id", "neighbor_id", "cos", F.col("rn").cast("long").alias("rn"))
