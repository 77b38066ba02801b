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
    embedding_neardup,
    exact_dedup,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    simhash_dedup,
)
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
    SELECT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS text_hash,
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
    verification (SURVEY D4). Output (id_a, id_b, jaccard ≥ 0.6)."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_dedup(
        docs, id_col="doc_id", text_col="text", num_hashes=64, bands=16, jaccard_threshold=0.6
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
    oracle=None,
    tags=("dedup", "jaccard", "text"),
)
def dedup_ngram_jaccard_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs 3-gram Jaccard ≥ 0.5 via sparse shingle self-join."""
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, id_col="doc_id", text_col="text", threshold=0.5)


@declare(
    "dedup_embedding_cosine",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           floor((list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
             / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
              * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))))) * 10000 + 0.5) / 10000 AS cos
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE floor((list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
             / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
              * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))))) * 10000 + 0.5) / 10000 >= 0.95
    """,
    tags=("dedup", "embedding"),
)
def dedup_embedding_cosine_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs ≥ 0.95 (brute force — the exact
    anchor; the LSH-bucketed variant is the 100 TB path, see
    operators/similarity.py)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_neardup(emb, threshold=0.95)
