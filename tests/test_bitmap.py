"""operators/bitmap.py — exact mergeable bitmap distinct counting.

Properties pinned: cardinality is EXACT (equals countDistinct),
merge ≡ rebuild (any merge tree — associativity in practice),
idempotent re-merge, repartition invariance, the sign-bit invariant
(bit 63 never set — the cross-engine word design), and the in-plan
negative-id guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.operators.bitmap import (
    bitmap_build,
    bitmap_cardinality,
    bitmap_merge,
)


def _sample(spark, n=5000, groups=7, ids=900):
    # deterministic synthetic (group, sub, id) rows with repeats and
    # ids straddling many 63-bit word boundaries
    return spark.range(n).select(
        (F.col("id") % groups).alias("g"),
        ((F.col("id") * 7) % 3).alias("sub"),
        ((F.col("id") * F.col("id") + 13) % ids).alias("uid"),
    )


def test_cardinality_exact_and_sign_bit_clear(spark):
    df = _sample(spark)
    words = bitmap_build(df, "uid", ["g", "sub"])
    assert words.where(F.col("_w") < 0).count() == 0
    got = {
        (r.g, r.sub): r.n_distinct
        for r in bitmap_cardinality(words, ["g", "sub"]).collect()
    }
    expect = {
        (r.g, r.sub): r.n
        for r in df.groupBy("g", "sub")
        .agg(F.countDistinct("uid").alias("n"))
        .collect()
    }
    assert got == expect


def test_merge_equals_rebuild_and_is_idempotent(spark):
    df = _sample(spark)
    fine = bitmap_build(df, "uid", ["g", "sub"])
    merged = bitmap_merge(fine.select("g", "_word", "_w"), ["g"])
    rebuilt = bitmap_build(df, "uid", ["g"])
    m = {(r.g, r._word): r._w for r in merged.collect()}
    rb = {(r.g, r._word): r._w for r in rebuilt.collect()}
    assert m == rb  # bit-equal states, not just equal counts
    again = bitmap_merge(merged, ["g"])
    assert {(r.g, r._word): r._w for r in again.collect()} == m


def test_repartition_invariance(spark):
    df = _sample(spark)
    a = bitmap_cardinality(
        bitmap_build(df.repartition(13), "uid", ["g"]), ["g"]
    )
    b = bitmap_cardinality(
        bitmap_build(df.coalesce(1), "uid", ["g"]), ["g"]
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_word_accounting(spark):
    """n_words equals the number of distinct occupied words — the
    memory accounting a capacity planner reads."""
    df = _sample(spark)
    card = bitmap_cardinality(bitmap_build(df, "uid", ["g"]), ["g"])
    expect = {
        r.g: r.n
        for r in df.select("g", (F.col("uid") / 63).cast("long").alias("w"))
        .groupBy("g")
        .agg(F.countDistinct("w").alias("n"))
        .collect()
    }
    assert {r.g: r.n_words for r in card.collect()} == expect


def test_negative_id_raises_in_plan(spark):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    bad = spark.range(3).select(F.lit(0).alias("g"), (F.col("id") - 1).alias("uid"))
    with pytest.raises((Py4JJavaError, SparkRuntimeException, Exception)):
        bitmap_build(bad, "uid", ["g"]).collect()
