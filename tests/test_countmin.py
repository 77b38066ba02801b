"""Count-Min sketch guarantees (operators/countmin.py), pinned the same
way as the quantile sketch and Misra–Gries next door: over-count-only
estimates with the ε·n bound, and bit-equal mergeability for any split.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.operators.countmin import (
    cms_build,
    cms_estimate,
    cms_merge,
)

DEPTH, WIDTH = 5, 256


def _zipfish(spark):
    """Skewed value distribution across two groups: value k appears
    ~1000/k times — heavy head, long tail."""
    rows = []
    for g in ("a", "b"):
        for k in range(1, 60):
            rows += [(g, f"v{k}")] * (1000 // k)
    return spark.createDataFrame(rows, "g string, v string")


def test_estimates_overcount_only_and_within_epsilon_n(spark):
    df = _zipfish(spark)
    truth = {(r.g, r.v): r.n for r in df.groupBy("g", "v").agg(F.count("*").alias("n")).collect()}
    n_per_group = {g: sum(v for (gg, _), v in truth.items() if gg == g) for g in ("a", "b")}

    state = cms_build(df, ["g"], "v", depth=DEPTH, width=WIDTH)
    values = df.select("g", "v").distinct()
    est = {(r.g, r.v): r.est for r in cms_estimate(state, values, ["g"], "v", DEPTH, WIDTH).collect()}

    eps_n = {g: 2.718 / WIDTH * n for g, n in n_per_group.items()}
    for key, true_n in truth.items():
        assert est[key] >= true_n, key  # over-count only, never under
        # the 1-δ bound holds per query; over all ~118 queries allow the
        # deterministic fixture a small slack factor on ε·n
        assert est[key] <= true_n + 3 * eps_n[key[0]], (key, est[key], true_n)
    # the heavy head must be tight: top value has no room for big error
    assert est[("a", "v1")] <= truth[("a", "v1")] * 1.15


def test_merge_is_bit_equal_to_full_build_any_split(spark):
    df = _zipfish(spark).withColumn(
        "_part", F.xxhash64("v") % 3
    )
    full = cms_build(df, ["g"], "v", DEPTH, WIDTH)
    parts = [
        cms_build(df.where(F.col("_part") == i), ["g"], "v", DEPTH, WIDTH)
        for i in (-2, -1, 0, 1, 2)
    ]
    merged = cms_merge(["g"], *[p for p in parts])
    a = {r.g: (r.cms_state, r.cms_n) for r in full.collect()}
    b = {r.g: (r.cms_state, r.cms_n) for r in merged.collect()}
    assert a == b  # bit-equal counters AND totals


def test_unseen_value_estimate_is_collision_noise_only(spark):
    df = _zipfish(spark)
    state = cms_build(df, ["g"], "v", DEPTH, WIDTH)
    probe = spark.createDataFrame([("a", "never-seen")], "g string, v string")
    est = cms_estimate(state, probe, ["g"], "v", DEPTH, WIDTH).collect()[0].est
    n_a = df.where(F.col("g") == "a").count()
    assert 0 <= est <= 3 * 2.718 / WIDTH * n_a


def test_merge_requires_state(spark):
    with pytest.raises(ValueError):
        cms_merge(["g"])


def test_null_probe_estimates_zero(spark):
    """ADVICE r04: xxhash64(NULL) degenerates to the hash seed, so a
    NULL probe used to return one arbitrary bucket's count. Build-side
    never counts NULLs — the exact answer is 0, on every group."""
    df = _zipfish(spark)
    state = cms_build(df, ["g"], "v", DEPTH, WIDTH)
    probe = spark.createDataFrame(
        [("a", None), ("b", None), ("a", "v1")], "g string, v string"
    )
    got = {
        (r.g, r.v): r.est
        for r in cms_estimate(state, probe, ["g"], "v", DEPTH, WIDTH).collect()
    }
    assert got[("a", None)] == 0
    assert got[("b", None)] == 0
    assert got[("a", "v1")] >= 1000  # non-NULL probes unaffected


def test_merge_rejects_mismatched_grid_sizes(spark):
    """ADVICE r04: merging states built with different depth*width must
    fail in-plan, not produce a garbage grid — even when the differing
    groups never share a key."""

    df = _zipfish(spark)
    s1 = cms_build(df.where(F.col("g") == "a"), ["g"], "v", DEPTH, WIDTH)
    s2 = cms_build(df.where(F.col("g") == "b"), ["g"], "v", DEPTH, 128)
    with pytest.raises(Exception) as ei:
        cms_merge(["g"], s1, s2).collect()
    assert "incompatible sketch sizes" in str(ei.value)


def test_mg_cms_composition_bracket(spark):
    """The declared composition (plans/roundfive.py
    ``text_heavy_hitters_cms``): MG proposes candidates, CMS tightens
    from above — for EVERY candidate, cnt_lb <= true count <= est, and
    every value above the MG guarantee threshold n/(capacity+1) is
    among the candidates (MG membership ∩ CMS over-count agreement)."""
    from spotify_data_pipeline_spark.operators.heavyhitters import mg_build, mg_topk

    capacity, k = 8, 8
    df = _zipfish(spark)
    truth = {
        (r.g, r.v): r.n
        for r in df.groupBy("g", "v").agg(F.count("*").alias("n")).collect()
    }
    n_per_group = {g: sum(v for (gg, _), v in truth.items() if gg == g) for g in ("a", "b")}

    cand = mg_topk(mg_build(df, ["g"], "v", capacity=capacity), ["g"], k)
    state = cms_build(df, ["g"], "v", depth=DEPTH, width=WIDTH)
    rows = cms_estimate(state, cand, ["g"], "v", DEPTH, WIDTH).collect()
    assert rows, "composition produced no candidates"
    cand_by_group: dict[str, set[str]] = {}
    for r in rows:
        true_n = truth[(r.g, r.v)]
        assert r.cnt_lb <= true_n, (r.g, r.v)  # MG lower bound
        assert r.est >= true_n, (r.g, r.v)  # CMS upper bound
        cand_by_group.setdefault(r.g, set()).add(r.v)
    # MG membership guarantee carries through the composition: every
    # value with true count > n/(capacity+1) appears bracketed.
    for (g, v), true_n in truth.items():
        if true_n > n_per_group[g] / (capacity + 1):
            assert v in cand_by_group[g], (g, v, true_n)
