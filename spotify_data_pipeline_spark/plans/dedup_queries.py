"""Declared dedup queries (SURVEY.md §2.8 D1-D4 + §2.12).

Exact variants carry DuckDB oracles; near-dup variants (MinHash-LSH,
SimHash, embedding-cosine) are rows-only for the driver and get exact
correctness coverage in tests/test_operators_dedup.py against
hand-computed fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.io import load_table
from spotify_data_pipeline_spark.operators.dedup import (
    embedding_neardup_lsh,
    exact_dedup,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    simhash_dedup,
)
from spotify_data_pipeline_spark.operators.similarity import _projection_planes
from spotify_data_pipeline_spark.plans.registry import declare


@declare(
    "dedup_exact_distinct",
    oracle="""
    SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS nation_id, c_mktsegment AS segment
    FROM customer
    """,
    tags=("dedup",),
)
def dedup_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup = DISTINCT (SURVEY D1 generalized; dropDuplicates is
    the shuffle-based scale path for the reference's Python-set gate)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("long").alias("nation_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    return exact_dedup(c, ["nation_id", "segment"])


@declare(
    "dedup_exact_hash_groups",
    oracle="""
    SELECT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS text_hash,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS first_doc
    FROM documents
    GROUP BY 1
    """,
    tags=("dedup", "text"),
)
def dedup_exact_hash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact text dedup by content hash (hash-groupBy — SURVEY §2.12):
    group documents by md5 of canonicalized text, keep group stats.
    At 100 TB: hashes are computed map-side; the shuffle carries
    (16-byte hash, partial counts) only — never the text."""
    docs = load_table(spark, sf_dir, "documents")
    text_hash = F.md5(F.lower(F.regexp_replace(F.trim("text"), r"\s+", " ")))
    return docs.groupBy(text_hash.alias("text_hash")).agg(
        F.count("*").alias("n_docs"),
        F.min("doc_id").cast("long").alias("first_doc"),
    )


@declare(
    "dedup_minhash_lsh",
    oracle=None,  # LSH banding is engine-specific → rows-only + pytest fixture check
    headline=True,
    tags=("dedup", "lsh", "text"),
)
def dedup_minhash_lsh_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs via MinHash banding + exact Jaccard
    verification (SURVEY D4). Output (id_a, id_b, jaccard ≥ 0.6).
    32 hashes / 16 bands: recall ≈0.999 at j=0.6 at half the signature
    compute of 64/16 (see operator docstring).

    max_bucket_width=50 bounds join fan-out: a boilerplate cluster of
    width w contributes w²/2 candidate pairs per band — unbounded at
    100 TB, so the declared query runs capped by default. Recall trade:
    pairs inside a >50-wide band bucket are only found if they collide
    in another (narrower) band; verified identical pair set at sf0.01
    (25 pairs capped and uncapped — natural buckets are far narrower).
    Truly identical texts belong to exact hash dedup
    (dedup_exact_hash_groups), not the near-dup path."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_dedup(
        docs,
        id_col="doc_id",
        text_col="text",
        num_hashes=32,
        bands=16,
        jaccard_threshold=0.6,
        max_bucket_width=50,
    )


@declare(
    "dedup_simhash",
    oracle=None,
    tags=("dedup", "simhash", "text"),
)
def dedup_simhash_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs via SimHash chunk banding, hamming ≤ 3 (§2.12)."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash_dedup(docs, id_col="doc_id", text_col="text")


@declare(
    "dedup_ngram_jaccard",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
      FROM documents WHERE length(trim(text)) > 0
    ), s AS (
      SELECT doc_id, unnest(
        CASE WHEN len(toks) >= 3
             THEN list_distinct(list_transform(range(1, len(toks) - 1),
                                               i -> array_to_string(toks[i:i+2], ' ')))
             ELSE [array_to_string(toks, ' ')] END) AS sh
      FROM t
    ), keep AS (
      SELECT sh FROM (SELECT sh, count(*) AS df FROM s GROUP BY 1)
      WHERE df <= greatest(100, CAST(floor(0.10 * (SELECT count(*) FROM documents)) AS BIGINT))
    ), sz AS (
      SELECT doc_id, count(*) AS n_sh FROM s GROUP BY 1
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
      FROM s a JOIN keep k ON a.sh = k.sh
               JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           floor(n_common / (za.n_sh + zb.n_sh - n_common) * 10000 + 0.5) / 10000 AS jaccard
    FROM inter JOIN sz za ON inter.id_a = za.doc_id
               JOIN sz zb ON inter.id_b = zb.doc_id
    WHERE floor(n_common / (za.n_sh + zb.n_sh - n_common) * 10000 + 0.5) / 10000 >= 0.5
    """,
    tags=("dedup", "jaccard", "text"),
)
def dedup_ngram_jaccard_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-gram Jaccard ≥ 0.5 via sparse shingle self-join (exact until the
    document-frequency cap bites; then a lower bound — see operator).
    Upgraded from rows-only in round 2: jaccard depends only on shingle
    SET relations, so the oracle computes the identical algorithm
    (distinct triples, same DF cap, uncapped sizes) over raw shingle
    strings — equivalent to the engine's hashed-shingle sets up to
    ~2^-32-probability hash collisions."""
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, id_col="doc_id", text_col="text", threshold=0.5)


_LSH_DIM, _LSH_PLANES, _LSH_TABLES, _LSH_SEED, _LSH_THRESHOLD = 64, 6, 4, 7000, 0.4


def _embedding_lsh_oracle() -> str:
    """DuckDB SQL replicating the EXACT LSH bucketing of
    ``embedding_neardup_lsh`` — same deterministic hyperplanes (seeded
    numpy, see similarity._projection_planes), same sign → bucket-id
    packing, same OR-across-tables candidate rule, same 4dp rounded
    cosine. Both engines sum dot products sequentially in float64, so
    the bucket ids and cosines are bit-identical and the hash matches
    non-trivially (≈15 rows at sf0.01 vs 0 for the old 0.95 threshold).
    """
    buckets = []
    for t in range(_LSH_TABLES):
        planes = _projection_planes(_LSH_DIM, _LSH_PLANES, _LSH_SEED + t)
        bits = " + ".join(
            f"(CASE WHEN list_dot_product(e, CAST([{', '.join(repr(x) for x in plane)}] AS DOUBLE[])) > 0 THEN {1 << i} ELSE 0 END)"
            for i, plane in enumerate(planes)
        )
        buckets.append(f"({bits}) AS b{t}")
    bucket_cols = ",\n           ".join(buckets)
    same_bucket = " OR ".join(f"a.b{t} = c.b{t}" for t in range(_LSH_TABLES))
    return f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    b AS (SELECT vec_id, e,
           {bucket_cols}
          FROM v),
    pairs AS (
      SELECT a.vec_id AS id_a, c.vec_id AS id_b,
             floor(list_dot_product(a.e, c.e)
               / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(c.e, c.e)))
               * 10000 + 0.5) / 10000 AS cos
      FROM b a JOIN b c ON a.vec_id < c.vec_id AND ({same_bucket})
    )
    SELECT id_a, id_b, cos FROM pairs WHERE cos >= {_LSH_THRESHOLD}
    """


@declare(
    "dedup_embedding_cosine",
    oracle=_embedding_lsh_oracle(),
    tags=("dedup", "embedding", "lsh"),
)
def dedup_embedding_cosine_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs ≥ 0.4 with LSH-bucketed candidate
    generation (SURVEY §2.12) — bucket equi-joins, no all-pairs
    nested-loop join (plan-asserted in tests/test_plans_physical.py).
    The DuckDB oracle replicates the deterministic bucketing, so the
    approximate operator still gets an exact hash-match; the brute-force
    twin ``embedding_neardup`` is the recall anchor in
    tests/test_operators_dedup.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_neardup_lsh(
        emb,
        threshold=_LSH_THRESHOLD,
        dim=_LSH_DIM,
        n_planes=_LSH_PLANES,
        n_tables=_LSH_TABLES,
        seed_base=_LSH_SEED,
    )
