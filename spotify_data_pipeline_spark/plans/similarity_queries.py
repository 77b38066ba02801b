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


def _ann_lsh_oracle(n_planes: int = 3, n_tables: int = 8, dim: int = 64) -> str:
    """DuckDB SQL replicating cosine_topk_lsh EXACTLY — same seeded
    hyperplanes (similarity._projection_planes), same sign→bucket
    packing, same any-table candidate rule, same (cos desc, neighbor)
    re-rank. The approximate ANN operator thereby gets an exact
    hash-match instead of a rows-only check (same pattern as the
    embedding near-dup oracle in dedup_queries)."""
    from spotify_data_pipeline_spark.operators.similarity import _projection_planes

    buckets = []
    for t in range(n_tables):
        planes = _projection_planes(dim, n_planes, seed=1000 + t)
        bits = " + ".join(
            f"(CASE WHEN list_dot_product(e, CAST([{', '.join(repr(x) for x in plane)}] AS DOUBLE[])) > 0 THEN {1 << i} ELSE 0 END)"
            for i, plane in enumerate(planes)
        )
        buckets.append(f"({bits}) AS b{t}")
    bucket_cols = ",\n           ".join(buckets)
    same_bucket = " OR ".join(f"q.b{t} = c.b{t}" for t in range(n_tables))
    return f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    b AS (SELECT vec_id, e,
           {bucket_cols}
          FROM v),
    cand AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             floor(list_dot_product(q.e, c.e)
               / (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e)))
               * 10000 + 0.5) / 10000 AS cos
      FROM b q JOIN b c
        ON q.vec_id < {_N_QUERY_VECS} AND q.vec_id <> c.vec_id AND ({same_bucket})
    )
    SELECT query_id, neighbor_id, cos, rn FROM (
      SELECT query_id, neighbor_id, cos,
             CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS BIGINT) AS rn
      FROM cand
    ) WHERE rn <= {_TOP_K}
    """


@declare(
    "sim_ann_lsh",
    oracle=_ann_lsh_oracle(),
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


_IVF_DIM, _IVF_CELLS, _IVF_NPROBE, _IVF_SEED = 64, 8, 3, 9000


def _fixed_ivf_centroids() -> list[list[float]]:
    """Deterministic centroid literals (seeded numpy, like the LSH
    hyperplanes) — stands in for an externally trained quantizer so the
    IVF *serving* path (assign + probe + re-rank) is exactly
    reproducible by an external oracle."""
    import numpy as np

    rng = np.random.default_rng(_IVF_SEED)
    return rng.standard_normal((_IVF_CELLS, _IVF_DIM)).tolist()


def _ann_ivf_fixed_oracle() -> str:
    """DuckDB SQL replicating cosine_topk_ivf with the fixed centroids
    EXACTLY: same argmax cell assignment (unrounded cosine, cid
    tiebreak), same nprobe cell probing per query, same 4dp-rounded
    re-rank. Both engines evaluate the identical float64 expressions,
    so the hash match is bit-honest (same pattern as _ann_lsh_oracle)."""
    cents = _fixed_ivf_centroids()
    values = ",\n      ".join(
        f"({cid}, CAST([{', '.join(repr(x) for x in c)}] AS DOUBLE[]))"
        for cid, c in enumerate(cents)
    )
    return f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    cent AS (SELECT * FROM (VALUES
      {values}
    ) AS t(cid, c)),
    scored AS (
      SELECT v.vec_id, v.e, cent.cid,
             list_dot_product(v.e, cent.c)
               / (sqrt(list_dot_product(v.e, v.e)) * sqrt(list_dot_product(cent.c, cent.c)))
               AS ccos
      FROM v CROSS JOIN cent
    ),
    assign AS (
      SELECT vec_id, e, cid FROM (
        SELECT vec_id, e, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn
        FROM scored) WHERE rn = 1
    ),
    probes AS (
      SELECT vec_id AS query_id, e AS qe, cid FROM (
        SELECT vec_id, e, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn
        FROM scored WHERE vec_id < {_N_QUERY_VECS}) WHERE rn <= {_IVF_NPROBE}
    ),
    cand AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             floor(list_dot_product(p.qe, a.e)
               / (sqrt(list_dot_product(p.qe, p.qe)) * sqrt(list_dot_product(a.e, a.e)))
               * 10000 + 0.5) / 10000 AS cos
      FROM probes p JOIN assign a ON p.cid = a.cid AND p.query_id <> a.vec_id
    )
    SELECT query_id, neighbor_id, cos, rn FROM (
      SELECT query_id, neighbor_id, cos,
             CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS BIGINT) AS rn
      FROM cand
    ) WHERE rn <= {_TOP_K}
    """


@declare(
    "sim_ann_ivf_fixed",
    oracle=_ann_ivf_fixed_oracle(),
    tags=("similarity", "ivf"),
)
def sim_ann_ivf_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF serving path against a FIXED quantizer (deterministic literal
    centroids): inverted-list build (map-only nearest-cell assignment),
    nprobe cell probing per query, exact re-rank within probed cells.

    The production IVF shape — train the quantizer in one job, serve
    with frozen centroids — and the driver-checkable anchor for the IVF
    path: the trainer (``sim_ann_ivf``) stays rows-only because Lloyd
    state is engine-side, but this query pins the assignment + probe +
    re-rank machinery with an exact oracle."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < _N_QUERY_VECS)
    cent = spark.createDataFrame(
        [(cid, c) for cid, c in enumerate(_fixed_ivf_centroids())],
        schema="_cid INT, _centroid ARRAY<DOUBLE>",
    )
    return cosine_topk_ivf(
        queries, emb, k=_TOP_K, n_cells=_IVF_CELLS, nprobe=_IVF_NPROBE, centroids=cent
    )


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
