"""Declared similarity-search queries (SURVEY.md §2.12).

Brute-force cosine top-k is the exact, DuckDB-checkable anchor;
the LSH variant is the approximate scale path (rows-only check +
recall test in tests/test_operators_similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.io import load_table
from spotify_data_pipeline_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_ivf,
    cosine_topk_lsh,
)
from spotify_data_pipeline_spark.plans.registry import declare

_N_QUERY_VECS = 10
_TOP_K = 5

_COS = (
    "list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))"
    " / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))"
    "  * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))))"
)


@declare(
    "sim_cosine_topk",
    oracle=f"""
    SELECT query_id, neighbor_id, cos, rn FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             floor(({_COS}) * 10000 + 0.5) / 10000 AS cos,
             CAST(row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY floor(({_COS}) * 10000 + 0.5) / 10000 DESC, c.vec_id ASC) AS BIGINT) AS rn
      FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < {_N_QUERY_VECS}
    ) WHERE rn <= {_TOP_K}
    """,
    headline=True,
    tags=("similarity", "topk"),
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-5 for the first 10 query vectors.

    Plan: broadcast the 10 query vectors over the corpus scan (map-side
    cross join — the corpus never shuffles), then a per-query window
    top-k on the scored stream. Ranking key is the 4dp-rounded cosine
    with neighbor-id tiebreak → deterministic across engines.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < _N_QUERY_VECS)
    return cosine_topk_bruteforce(queries, emb, k=_TOP_K)


@declare(
    "sim_ann_lsh",
    oracle=None,  # approximate by construction → rows-only + recall pytest
    tags=("similarity", "lsh"),
)
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via sign-random-projection LSH, exact re-rank
    within candidate buckets — the 100 TB path when the query set itself
    is too large to broadcast.

    Parameter note: the testdata embeddings are near-uniform (top-5
    neighbor angle ≈ 71°), so recall needs shallow buckets and several
    tables (3 planes × 8 tables ⇒ ~0.86 expected recall). Clustered
    real-world embeddings support more planes (deeper buckets, fewer
    candidates) at the same recall — tune per corpus.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < _N_QUERY_VECS)
    return cosine_topk_lsh(queries, emb, k=_TOP_K, dim=64, n_planes=3, n_tables=8)


@declare(
    "sim_ann_ivf",
    oracle=None,  # k-means state is engine-side → rows-only + recall pytest
    tags=("similarity", "ivf"),
)
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via IVF: deterministic k-means coarse quantizer
    (Lloyd iterations, operators/clustering.py), inverted lists keyed by
    cell, nprobe=3 probed cells per query, exact re-rank within them —
    the inverted-file ANN path complementing the LSH variant. Recall
    floor asserted in tests/test_operators_misc.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < _N_QUERY_VECS)
    return cosine_topk_ivf(queries, emb, k=_TOP_K, n_cells=8, nprobe=3)
