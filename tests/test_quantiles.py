"""HdrHistogram-style quantile sketch (operators/quantiles.py):
bit-exact merge invariance under arbitrary splits, bucketing identity
below the exact cutoff, and the relative-error guarantee vs exact
percentiles on real data.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spotify_data_pipeline_spark.operators.quantiles import (
    hdr_build,
    hdr_bucket_lo,
    hdr_merge,
    hdr_quantiles,
)

SUB_BITS = 3
REL_ERR = 2.0**-SUB_BITS


def _state_set(df):
    return {(r.l_returnflag, r.bucket_lo, r.cnt) for r in df.collect()}


def test_bucket_identity_below_cutoff_and_monotone(spark):
    df = spark.createDataFrame([(v,) for v in range(0, 64)], "v long")
    out = df.select("v", hdr_bucket_lo("v", SUB_BITS).alias("b")).collect()
    for r in out:
        if r.v < 2 ** (SUB_BITS + 1):
            assert r.b == r.v  # exact below the cutoff
        assert r.b <= r.v < (r.b + max(1, r.b >> SUB_BITS)) + 1
    bs = [r.b for r in sorted(out, key=lambda r: r.v)]
    assert bs == sorted(bs)


def test_merge_is_bit_exact_for_any_split(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_returnflag",
        F.expr("CAST(floor(l_extendedprice * 100 + 0.5) AS LONG)").alias("cents"),
        "l_orderkey",
    )
    full = hdr_build(li, ["l_returnflag"], "cents", SUB_BITS)
    parts = [li.where(F.col("l_orderkey") % 3 == i) for i in range(3)]
    states = [hdr_build(p, ["l_returnflag"], "cents", SUB_BITS) for p in parts]
    merged = hdr_merge(["l_returnflag"], states[1], states[2], states[0])
    assert _state_set(merged) == _state_set(full)  # BIT-equal, unlike HLL


def test_quantile_relative_error_guarantee(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_returnflag",
        F.expr("CAST(floor(l_extendedprice * 100 + 0.5) AS LONG)").alias("cents"),
    )
    state = hdr_build(li, ["l_returnflag"], "cents", SUB_BITS)
    qs = [0.5, 0.95, 0.99]
    est = {
        (r.l_returnflag, r.q): r.est
        for r in hdr_quantiles(state, ["l_returnflag"], qs).collect()
    }
    exact = {
        (r.l_returnflag, q): r[f"p{int(q*100)}"]
        for r in li.groupBy("l_returnflag")
        .agg(
            *[
                F.expr(f"percentile(cents, {q})").alias(f"p{int(q*100)}")
                for q in qs
            ]
        )
        .collect()
        for q in qs
    }
    for k, e in est.items():
        true = float(exact[k])
        assert e <= true * (1 + 1e-9)
        assert true - e <= true * REL_ERR + 1, (k, e, true)


def test_bucket_edges_at_extreme_sub_bits(spark):
    """sub_bits=0 (2× rel err, coarsest) and sub_bits=6 (fine) both
    keep the bucket function monotone and the value in-bucket."""
    from pyspark.sql import functions as F2

    vals = [0, 1, 2, 3, 255, 256, 257, 2**40, 2**62]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    for sb in (0, 6):
        out = sorted(
            (r.v, r.b)
            for r in df.select(
                "v", hdr_bucket_lo("v", sb).alias("b")
            ).collect()
        )
        prev_b = -1
        for v, b in out:
            assert b <= v
            assert b >= prev_b
            prev_b = b
            if v > 0:
                assert v - b <= max(1, v >> sb)  # within one bucket width


def test_negative_input_fails_in_plan(spark):
    """bin() of a negative long is 64-char two's complement — all
    negatives would collapse into one wrong bucket. The bucket
    expression must raise in-plan instead of silently mis-bucketing
    (ADVICE r03)."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from spotify_data_pipeline_spark.operators.quantiles import hdr_build

    df = spark.createDataFrame([(1, 100), (1, -5)], "g int, v long")
    with pytest.raises(SparkRuntimeException, match="negative input"):
        hdr_build(df, ["g"], "v").collect()


def test_negative_free_input_unaffected_by_guard(spark):
    from spotify_data_pipeline_spark.operators.quantiles import hdr_bucket_lo

    df = spark.createDataFrame([(0,), (7,), (123456,)], "v long")
    got = [r[0] for r in df.select(hdr_bucket_lo("v")).collect()]
    assert got[0] == 0 and got[1] == 7 and got[2] <= 123456
