"""operators/pq.py — product quantization: Python-model equivalence,
ADC identity, range guard, and compression accounting."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.operators.pq import (
    adc_tables_py,
    default_codebook,
    pq_adc_topk,
    pq_assign,
    pq_reconstruct_py,
)

SF_DIR = "/root/testdata/sf0.001"


def _assign_py(vec, cb, qscale=127):
    """Independent pure-Python model of pq_assign."""
    q = [math.floor(x * qscale + 0.5) for x in vec]
    sub_dim = len(cb[0][0])
    codes, err = [], 0
    for s, sub_codes in enumerate(cb):
        sub = q[s * sub_dim : (s + 1) * sub_dim]
        dists = [
            sum((a - b) ** 2 for a, b in zip(sub, code)) for code in sub_codes
        ]
        m = min(dists)
        codes.append(dists.index(m))  # first occurrence = min-id tie
        err += m
    return codes, err


def test_assign_matches_python_model(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(50)
    rows = pq_assign(emb, "embedding").collect()
    cb = default_codebook()
    assert rows
    for r in rows:
        codes, err = _assign_py(list(r.embedding), cb)
        assert list(r.pq_codes) == codes, r.vec_id
        assert r.pq_err == err, r.vec_id


def test_codes_in_range_and_err_nonnegative(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    rows = pq_assign(emb, "embedding").select("pq_codes", "pq_err").collect()
    for r in rows:
        assert len(r.pq_codes) == 8
        assert all(0 <= c <= 3 for c in r.pq_codes)
        assert r.pq_err >= 0


def test_adc_identity(spark):
    """ADC distance from table lookups == direct quantized distance
    between the probe and the RECONSTRUCTION — the PQ approximation
    identity (exact by construction, not approximately)."""
    probe = [0.25] * 64
    qprobe = [math.floor(x * 127 + 0.5) for x in probe]
    cb = default_codebook()
    tables = adc_tables_py(qprobe, cb)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(20)
    coded = pq_assign(emb, "embedding")
    top = pq_adc_topk(coded, probe, k=20).collect()
    for r in top:
        recon = pq_reconstruct_py(list(r.pq_codes), cb)
        direct = sum((a - b) ** 2 for a, b in zip(qprobe, recon))
        via_tables = sum(tables[s][c] for s, c in enumerate(r.pq_codes))
        assert r.adc_dist == direct == via_tables


def test_range_guard_raises(spark):
    bad = spark.createDataFrame([(1, [2.0] * 64)], "vec_id long, embedding array<double>")
    with pytest.raises(Exception, match="rescale upstream"):
        pq_assign(bad, "embedding").collect()


def test_assignment_is_map_only(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    plan = (
        pq_assign(emb, "embedding")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # no shuffle: encode is map-only


def test_compression_ratio_claim():
    """8 subspaces x 4 codes = 16 bits/vector vs 64 x 32-bit floats:
    the 128x accounting stated in the module docstring."""
    cb = default_codebook()
    bits = len(cb) * math.log2(len(cb[0]))
    assert bits == 16
    assert (64 * 32) / bits == 128


def test_pq_assign_is_stream_compatible(spark, tmp_path):
    """Encode is map-only, so the SAME operator runs under Structured
    Streaming unchanged — streamed codes equal the batch codes row for
    row (the claim that PQ encoding slots into an ingest stream)."""
    src = str(tmp_path / "src")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(20)
    emb.write.parquet(src)
    stream = spark.readStream.schema(emb.schema).parquet(src)
    coded = pq_assign(stream, "embedding").select("vec_id", "pq_codes", "pq_err")
    q = (
        coded.writeStream.format("memory")
        .queryName("pq_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        r.vec_id: (list(r.pq_codes), r.pq_err)
        for r in spark.sql("SELECT * FROM pq_stream").collect()
    }
    batch = {
        r.vec_id: (list(r.pq_codes), r.pq_err)
        for r in pq_assign(spark.read.parquet(src), "embedding")
        .select("vec_id", "pq_codes", "pq_err")
        .collect()
    }
    assert streamed == batch and len(streamed) == 20


def test_pq_train_improves_and_is_deterministic(spark):
    """Per-subspace Lloyd: the trained codebook (a) has the right
    shape, (b) is bit-identical across runs (hash-deterministic init,
    no RNG), and (c) beats the arbitrary fixed grid on mean
    reconstruction error — the reason to train at all."""
    from pyspark.sql import functions as F

    from spotify_data_pipeline_spark.operators.pq import pq_train

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cb1 = pq_train(emb, "embedding", iters=3)
    cb2 = pq_train(emb, "embedding", iters=3)
    assert cb1 == cb2  # deterministic
    assert len(cb1) == 8 and all(len(s) == 4 for s in cb1)
    assert all(len(c) == 8 for s in cb1 for c in s)

    def mean_err(cb):
        return (
            pq_assign(emb, "embedding", codebook=cb)
            .agg(F.avg("pq_err").alias("e"))
            .collect()[0]
            .e
        )

    assert mean_err(cb1) < mean_err(default_codebook())
