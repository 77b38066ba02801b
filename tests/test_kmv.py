"""KMV sketch guarantees (operators/kmv.py): exact below capacity,
bounded relative error above it, bit-equal mergeability, and the
hash-fraction arithmetic pinned against an independent Python model."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.operators.kmv import (
    hash_frac_expr,
    kmv_build,
    kmv_estimate,
    kmv_merge,
)

K = 64


def _df(spark, rows):
    return spark.createDataFrame(rows, "g string, v string")


def test_exact_below_capacity(spark):
    rows = [("a", f"v{i}") for i in range(40) for _ in range(3)]  # 40 distinct < K
    state = kmv_build(_df(spark, rows), ["g"], "v", k=K)
    est = kmv_estimate(state, ["g"], k=K).collect()[0]
    assert est.n_sample == 40
    assert est.est_distinct == 40.0


def test_estimator_error_bound_above_capacity(spark):
    n_true = 2000
    rows = [("a", f"value-{i}") for i in range(n_true)]
    state = kmv_build(_df(spark, rows), ["g"], "v", k=K)
    est = kmv_estimate(state, ["g"], k=K).collect()[0]
    assert est.n_sample == K
    # 1/sqrt(k-2) ≈ 0.127; allow 4 sigma on this fixed fixture
    assert abs(est.est_distinct - n_true) / n_true < 0.5


def test_merge_bit_equal_to_rebuild_any_split(spark):
    rows = [("a", f"x{i}") for i in range(300)] + [("b", f"y{i}") for i in range(10)]
    full = kmv_build(_df(spark, rows), ["g"], "v", k=K)
    parts = [
        kmv_build(_df(spark, rows[i::3]), ["g"], "v", k=K) for i in range(3)
    ]
    merged = kmv_merge(["g"], K, *parts)
    a = {r.g: r.kmv_state for r in full.collect()}
    b = {r.g: r.kmv_state for r in merged.collect()}
    assert a == b


def test_merge_idempotent_and_duplicate_tolerant(spark):
    rows = [("a", f"x{i}") for i in range(300)]
    s = kmv_build(_df(spark, rows), ["g"], "v", k=K)
    twice = kmv_merge(["g"], K, s, s)
    assert {r.g: r.kmv_state for r in twice.collect()} == {
        r.g: r.kmv_state for r in s.collect()
    }


def test_nulls_not_counted(spark):
    rows = [("a", "x"), ("a", None), ("a", "y")]
    state = kmv_build(
        spark.createDataFrame(rows, "g string, v string"), ["g"], "v", k=K
    )
    est = kmv_estimate(state, ["g"], k=K).collect()[0]
    assert est.n_sample == 2 and est.est_distinct == 2.0


def test_hash_fraction_matches_python_model(spark):
    vals = ["alpha", "beta", "42", "", "naïve"]
    df = spark.createDataFrame([(v,) for v in vals], "v string").select(
        "v", F.substring(F.md5(F.col("v").cast("string")), 1, 13).alias("h")
    )
    got = {r.v: (r.h, f) for r, f in zip(
        df.collect(), [r.f for r in df.select(hash_frac_expr("h").alias("f")).collect()]
    )}
    for v in vals:
        hexpref = hashlib.md5(v.encode("utf-8")).hexdigest()[:13]
        want = int(hexpref, 16) / 16**13
        h, f = got[v]
        assert h == hexpref, v
        assert f == want, v  # exact double equality — 52 bits

def test_estimate_deterministic_under_repartition(spark):
    rows = [("a", f"value-{i}") for i in range(500)]
    df = _df(spark, rows)
    e1 = kmv_estimate(kmv_build(df, ["g"], "v", k=K), ["g"], k=K).collect()
    e2 = kmv_estimate(
        kmv_build(df.repartition(13), ["g"], "v", k=K), ["g"], k=K
    ).collect()
    assert e1 == e2


def test_mismatched_k_fails_in_plan(spark):
    rows = [("a", f"x{i}") for i in range(100)]
    s16 = kmv_build(_df(spark, rows), ["g"], "v", k=16)
    with pytest.raises(Exception, match="state built with k=16"):
        kmv_estimate(s16, ["g"], k=K).collect()
    with pytest.raises(Exception, match="state built with k=16"):
        kmv_merge(["g"], K, s16, s16).collect()


def test_jaccard_overlap_estimator_on_planted_sets(spark):
    """The pair-overlap estimator behind agg_kmv_overlap: merged k-min
    ∩ both sketches / k ≈ Jaccard. Planted fixtures: identical sets
    (J=1), disjoint sets (J=0), half-overlapping sets (J=1/3)."""
    from pyspark.sql import functions as F

    k = 16
    full = [("a", f"s{i}") for i in range(200)]
    same = [("b", f"s{i}") for i in range(200)]
    disjoint = [("c", f"t{i}") for i in range(200)]
    half = [("d", f"s{i}") for i in range(100)] + [("d", f"u{i}") for i in range(100)]
    st = kmv_build(_df(spark, full + same + disjoint + half), ["g"], "v", k=k)
    a = st.select(F.col("g").alias("ga"), F.col("kmv_state").alias("sa"))
    b = st.select(F.col("g").alias("gb"), F.col("kmv_state").alias("sb"))
    pairs = a.join(b, F.col("ga") < F.col("gb"))
    merged = F.slice(F.array_sort(F.array_union("sa", "sb")), 1, k)
    inter = F.array_intersect(F.array_intersect(merged, F.col("sa")), F.col("sb"))
    est = {
        (r.ga, r.gb): r.j
        for r in pairs.select(
            "ga", "gb", (F.size(inter) / F.lit(float(k))).alias("j")
        ).collect()
    }
    assert est[("a", "b")] == 1.0  # identical sets: exact
    assert est[("a", "c")] == 0.0  # disjoint: exact
    # half overlap: true J = 100/300 = 1/3; k=16 => sigma ~ 0.12
    assert abs(est[("a", "d")] - 1 / 3) < 0.3
