"""Declared multimodal queries (SURVEY.md §2.12).

The testdata has no binary media column, so the declared queries
synthesize one deterministically (encode(text) → binary) and exercise
the real plumbing: JVM-side metadata/checksum, Arrow-batched feature
extraction with the deterministic fake decoder, frame sampling.
The metadata pass is exact-SQL-expressible → DuckDB oracle; the
mapInPandas feature pass is rows-only + pytest-covered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.io import load_table
from spotify_data_pipeline_spark.operators.multimodal import (
    attach_media_metadata,
    extract_media_features,
    fake_decoder,
    sample_frames,
)
from spotify_data_pipeline_spark.plans.registry import declare


def _with_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", F.encode("text", "UTF-8").alias("media"))


@declare(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS checksum
    FROM documents
    """,
    tags=("multimodal",),
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-free media triage (byte length + checksum), JVM-side —
    the pass that runs over ALL blobs at 100 TB before any decode."""
    media = _with_media(spark, sf_dir)
    return attach_media_metadata(media).select(
        "doc_id",
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.col("media_meta.checksum").alias("checksum"),
    )


@declare(
    "multimodal_features",
    # Exact oracle: the fake decoder and byte-histogram featurizer are
    # deterministic pure-byte arithmetic, so DuckDB can replicate them by
    # parsing hex(encode(text)) back into byte values (strpos hex-digit
    # arithmetic). `value` is compared as float32 BIT-EXACTLY: both
    # engines compute count/total in float64 (both integers, division is
    # a single correctly-rounded IEEE op) then cast to float32 (REAL) —
    # no rounding-boundary luck involved.
    oracle="""
    WITH b AS (
      SELECT doc_id, lower(hex(encode(text))) AS h,
             CAST(octet_length(encode(text)) AS BIGINT) AS n
      FROM documents
    ),
    bytes AS (
      SELECT doc_id, n, i,
             (strpos('0123456789abcdef', substr(h, CAST(2*i+1 AS INT), 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(h, CAST(2*i+2 AS INT), 1)) - 1) AS byte
      FROM b, unnest(range(n)) AS t(i)
    ),
    dims AS (
      SELECT doc_id,
             CAST(64 + CAST(sum(byte) FILTER (WHERE i < 16) % 64 AS INT) AS INT) AS width,
             CAST(64 + CAST((sum(byte) FILTER (WHERE i < 16) // 64) % 64 AS INT) AS INT) AS height
      FROM bytes GROUP BY doc_id
    ),
    hist AS (
      SELECT doc_id, CAST(byte % 8 AS BIGINT) AS pos, CAST(count(*) AS DOUBLE) AS cnt
      FROM bytes GROUP BY 1, 2
    ),
    grid AS (SELECT b.doc_id, b.n, CAST(g.p AS BIGINT) AS pos FROM b, unnest(range(8)) AS g(p))
    SELECT grid.doc_id, grid.n AS n_bytes,
           coalesce(dims.width, 64) AS width,
           coalesce(dims.height, 64) AS height,
           grid.pos,
           CAST(coalesce(hist.cnt, 0) / greatest(grid.n, 1) AS REAL) AS value
    FROM grid
    LEFT JOIN dims USING (doc_id)
    LEFT JOIN hist USING (doc_id, pos)
    """,
    tags=("multimodal", "pandas_udf"),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction through the Arrow batch path (deterministic
    fake decoder standing in for the media library).

    The declared output posexplodes the feature vector into scalar
    (pos, value) rows: list-typed cells are not hashable by the
    driver's pandas canonicalizer (the r02 ERR), and the exploded form
    additionally lets the deterministic featurizer carry an exact
    oracle. Downstream consumers wanting the array shape use
    ``extract_media_features`` directly."""
    media = _with_media(spark, sf_dir)
    out = extract_media_features(media, decoder=fake_decoder, feature_dim=8)
    return out.select(
        "doc_id",
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
        F.posexplode("feature").alias("pos", "value"),
    ).withColumn("pos", F.col("pos").cast("long"))


@declare(
    "multimodal_frame_sample",
    oracle="""
    WITH m AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
    e AS (
      SELECT doc_id, n, greatest(CAST(floor(n / 4.0) AS INT), 1) AS stride,
             unnest(range(4)) AS u
      FROM m
    )
    SELECT doc_id, CAST(u AS BIGINT) AS frame_idx,
           CAST(least(32, n - u * stride) AS BIGINT) AS frame_bytes
    FROM e WHERE n - u * stride > 0
    """,
    tags=("multimodal",),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: explode each blob into n sampled chunks.
    Upgraded from rows-only in round 2: Spark's binary substring is
    byte-based, so the sampled frame SIZES are pure octet arithmetic an
    external engine can replicate exactly — the byte-slicing plumbing
    itself is pinned by tests/test_multimodal.py."""
    media = _with_media(spark, sf_dir)
    frames = sample_frames(media, n_frames=4, frame_bytes=32)
    return frames.select(
        "doc_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.length("frame").cast("long").alias("frame_bytes"),
    )
