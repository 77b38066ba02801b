"""Bloom filter guarantees (operators/bloom.py), pinned the same way
as the other xxhash64 sketches: NO false negatives ever, bounded
false-positive rate, bit-equal mergeability for any split, NULL-probe
and size-mismatch policies."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.operators.bloom import (
    bloom_build,
    bloom_merge,
    bloom_might_contain,
)

M, K = 8192, 6


def _members(spark):
    rows = [("a", f"v{i}") for i in range(300)] + [("b", f"w{i}") for i in range(50)]
    return spark.createDataFrame(rows, "g string, v string")


def test_no_false_negatives(spark):
    df = _members(spark)
    state = bloom_build(df, ["g"], "v", M, K)
    probes = df.distinct()
    out = bloom_might_contain(state, probes, ["g"], "v", M, K)
    assert out.where(~F.col("might_contain")).count() == 0


def test_false_positive_rate_bounded(spark):
    """n=300, m=8192, k=6 ⇒ theoretical FPR ≈ (1−e^(−6·300/8192))^6
    ≈ 1.1e−4; allow generous slack on 2000 probes (expect ~0.2 hits)."""
    df = _members(spark)
    state = bloom_build(df, ["g"], "v", M, K)
    probes = spark.createDataFrame(
        [("a", f"absent-{i}") for i in range(2000)], "g string, v string"
    )
    fp = (
        bloom_might_contain(state, probes, ["g"], "v", M, K)
        .where(F.col("might_contain"))
        .count()
    )
    assert fp <= 5


def test_merge_is_bit_equal_to_full_build_any_split(spark):
    df = _members(spark).withColumn("_part", F.xxhash64("v") % 3)
    full = bloom_build(df, ["g"], "v", M, K)
    parts = [
        bloom_build(df.where(F.col("_part") == i), ["g"], "v", M, K)
        for i in (-2, -1, 0, 1, 2)
    ]
    merged = bloom_merge(["g"], *parts)
    a = {r.g: (r.bloom_state, r.bloom_n) for r in full.collect()}
    b = {r.g: (r.bloom_state, r.bloom_n) for r in merged.collect()}
    assert a == b


def test_null_probe_is_false_and_null_values_not_inserted(spark):
    df = spark.createDataFrame(
        [("a", "x"), ("a", None), ("a", "y")], "g string, v string"
    )
    state = bloom_build(df, ["g"], "v", M, K)
    assert state.collect()[0].bloom_n == 2  # NULL not inserted
    probes = spark.createDataFrame([("a", None), ("a", "x")], "g string, v string")
    got = {
        r.v: r.might_contain
        for r in bloom_might_contain(state, probes, ["g"], "v", M, K).collect()
    }
    assert got[None] is False and got["x"] is True


def test_merge_rejects_mismatched_sizes(spark):
    df = _members(spark)
    s1 = bloom_build(df.where(F.col("g") == "a"), ["g"], "v", M, K)
    s2 = bloom_build(df.where(F.col("g") == "b"), ["g"], "v", 4096, K)
    with pytest.raises(Exception) as ei:
        bloom_merge(["g"], s1, s2).collect()
    assert "incompatible filter sizes" in str(ei.value)


def test_m_bits_must_be_word_aligned(spark):
    with pytest.raises(ValueError):
        bloom_build(_members(spark), ["g"], "v", 1000, K)


def test_semi_join_reduction_pattern(spark):
    """The 100 TB use: prune a fact table against a broadcast filter —
    every true match survives, nearly all non-matches are dropped
    before any shuffle."""
    dim = spark.createDataFrame([("t", f"k{i}") for i in range(100)], "g string, v string")
    fact = spark.createDataFrame(
        [("t", f"k{i % 250}", i) for i in range(2000)], "g string, v string, x long"
    )
    state = bloom_build(dim, ["g"], "v", M, K)
    pruned = bloom_might_contain(state, fact, ["g"], "v", M, K).where(
        F.col("might_contain")
    )
    true_matches = fact.join(dim.select("g", "v").distinct(), ["g", "v"]).count()
    kept = pruned.count()
    assert kept >= true_matches          # no true match lost
    assert kept <= true_matches + 20     # pruning actually prunes
