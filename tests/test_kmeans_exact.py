"""Exact-integer k-means (operators/kmeans_exact.py): equivalence
with an independent pure-Python Lloyd model under the same
determinism contract, plus structural invariants."""

from __future__ import annotations

import hashlib
import math

import pandas as pd

from spotify_data_pipeline_spark.operators.kmeans_exact import (
    kmeans_cluster_report,
    kmeans_exact,
)

SF_DIR = "/root/testdata/sf0.001"


def _quant(v):
    m = max(abs(float(x)) for x in v)
    if m == 0:
        return [0] * len(v)
    return [
        int(min(max(math.floor(float(x) * 127 / m + 0.5), -127.0), 127.0))
        for x in v
    ]


def _python_kmeans(vectors: dict, k: int, iterations: int):
    """Independent model: same init/assign/update/tiebreak contract."""
    order = sorted(
        vectors, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
    )
    centroids = {c: list(vectors[i]) for c, i in enumerate(order[:k])}

    def assign(cents):
        out = {}
        for i, q in vectors.items():
            best = min(
                cents,
                key=lambda c: (
                    sum((x - y) ** 2 for x, y in zip(q, cents[c])),
                    c,
                ),
            )
            out[i] = (
                best,
                sum((x - y) ** 2 for x, y in zip(q, cents[best])),
            )
        return out

    for _ in range(iterations):
        labels = assign(centroids)
        new = {}
        for c in centroids:
            members = [vectors[i] for i, (lc, _) in labels.items() if lc == c]
            if members:
                n = len(members)
                new[c] = [
                    math.floor(sum(col) / n) for col in zip(*members)
                ]
            else:
                new[c] = centroids[c]
        centroids = new
    return assign(centroids)


def test_cluster_report_matches_python_model(spark):
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")[["vec_id", "embedding"]]
    vectors = {int(r.vec_id): _quant(r.embedding) for r in emb.itertuples()}
    labels = _python_kmeans(vectors, k=4, iterations=2)

    sdf = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    got = {
        r.cluster: (r.n_members, r.inertia, r.min_dist, r.max_dist)
        for r in kmeans_cluster_report(sdf, k=4, iterations=2).collect()
    }
    expect = {}
    for c in range(4):
        ds = [d for (lc, d) in labels.values() if lc == c]
        if ds:
            expect[c] = (len(ds), sum(ds), min(ds), max(ds))
    assert got == expect


def test_every_vector_labeled_exactly_once(spark):
    sdf = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    labels = kmeans_exact(sdf, k=4, iterations=2).collect()
    n = sdf.count()
    assert len(labels) == n
    assert len({r.vec_id for r in labels}) == n
    assert {r.cluster for r in labels} <= set(range(4))
    assert all(r.dist >= 0 for r in labels)


def test_empty_cluster_keeps_previous_centroid(spark):
    """A pathological fixture where one seed captures nothing after
    the first update still yields k centroid rows and total coverage
    (the coalesce path)."""
    rows = [(i, [float(i % 2)] * 4) for i in range(12)]
    sdf = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")
    labels = kmeans_exact(sdf, k=3, iterations=2, dims=4).collect()
    assert len(labels) == 12
    assert len({r.vec_id for r in labels}) == 12
