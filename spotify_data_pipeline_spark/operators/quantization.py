"""Int8 scalar quantization for embedding columns.

The standard serving-side compression for vector search (FAISS
``SQ8``, the int8 path in every production ANN stack): each float32
vector is rescaled to signed-byte range with one per-vector scale
(symmetric max-abs), shrinking the column 4×. Cosine similarity over
quantized vectors needs NO dequantization — the per-vector scales
cancel in ``dot(qa,qb) / (|qa|·|qb|)`` — so candidate scoring runs on
integer dot products over 1-byte elements.

At 100 TB this is a first-order win: the re-rank join that attaches
vectors to candidate pairs (similarity.py, dedup.py) shuffles 4× fewer
bytes, 4× more vectors fit in executor memory / broadcast threshold,
and integer multiply-accumulate vectorizes wider than float on every
CPU. The trade is bounded quantization error (≤ scale/2 per element);
tests pin recall vs float32 brute force.

Determinism: quantization uses only ``floor(x·qmax/maxabs + 0.5)``
(IEEE half-up, identical in Spark and DuckDB — see plans/parity.py);
integer dot products are exact in float64 up to 2^53, so quantized
cosine is bit-reproducible cross-engine and an exact-oracle query can
pin it (unlike float32 summation-order-dependent paths).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.operators.parallelism import ensure_min_parallelism
from spotify_data_pipeline_spark.operators.topk import topk_per_group
from spotify_data_pipeline_spark.plans.parity import rnd

__all__ = ["quantize_vectors", "int_dot", "quantized_cosine", "cosine_topk_quantized"]


def quantize_vectors(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "qvec",
    qmax: int = 127,
) -> DataFrame:
    """Append ``out_col``: the vector quantized to ``array<tinyint>``
    by symmetric per-vector max-abs scaling.

    q_i = clamp(floor(x_i · qmax / maxabs + 0.5), −qmax, qmax); an
    all-zero vector quantizes to all zeros. Map-only, Catalyst HOFs —
    no shuffle, no Python.
    """
    v = F.col(vec_col)
    maxabs = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    q = F.when(maxabs == 0.0, F.transform(v, lambda x: F.lit(0).cast("tinyint"))).otherwise(
        F.transform(
            v,
            lambda x: F.least(
                F.greatest(
                    F.floor(x.cast("double") * qmax / maxabs + F.lit(0.5)),
                    F.lit(-qmax).cast("long"),
                ),
                F.lit(qmax).cast("long"),
            ).cast("tinyint"),
        )
    )
    return df.withColumn(out_col, q)


def int_dot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two tinyint vectors (long)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("long") * y.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def quantized_cosine(qa: Column, qb: Column) -> Column:
    """Cosine over quantized vectors — scales cancel, so this is
    dot/(norm·norm) on the raw integer codes (float64 only at the final
    sqrt/division, from exact integer inputs)."""
    return int_dot(qa, qb).cast("double") / (
        F.sqrt(int_dot(qa, qa).cast("double")) * F.sqrt(int_dot(qb, qb).cast("double"))
    )


def cosine_topk_quantized(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    qmax: int = 127,
) -> DataFrame:
    """Exact top-k under int8-quantized cosine: broadcast the (small)
    quantized query set over the quantized corpus scan — the corpus
    never shuffles, scoring is map-side integer math on 1-byte codes.

    Output (query_id, neighbor_id, qcos, rn) — qcos rounded 4 dp,
    neighbor_id tiebreak, deterministic cross-engine.
    """
    q = quantize_vectors(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_v")),
        "_v",
        "_qq",
        qmax,
    ).select("query_id", "_qq")
    c = quantize_vectors(
        ensure_min_parallelism(corpus).select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_v")
        ),
        "_v",
        "_qc",
        qmax,
    ).select("neighbor_id", "_qc")
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("qcos", rnd(quantized_cosine(F.col("_qq"), F.col("_qc")), 4))
    )
    top = topk_per_group(
        scored,
        partition_by=["query_id"],
        order_by=[F.col("qcos").desc(), F.col("neighbor_id").asc()],
        k=k,
    )
    return top.select("query_id", "neighbor_id", "qcos", F.col("rn").cast("long").alias("rn"))
