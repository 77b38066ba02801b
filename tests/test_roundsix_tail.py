"""Round-6 window block 1 (plans/roundsix_tail.py): the 3 roundsix
staging-tail queries activated via delegating wrappers, plus the
md5-bucketed Count-Min exact-oracle twin. Driver-shaped oracle checks
plus the CMS-specific semantic pins."""

from __future__ import annotations

import os

import pytest

from spotify_data_pipeline_spark.plans import roundsix_tail as rt
from spotify_data_pipeline_spark.plans.roundsix import STAGED
from tests.oracle_check import compare, run_oracle

SF_DIR = os.environ.get("ORACLE_SF", "/root/testdata/sf0.001")

_WRAPPERS = {
    "agg_kmv_distinct": rt.agg_kmv_distinct_query,
    "llm_winsorize_stats": rt.llm_winsorize_stats_query,
    "agg_kmv_overlap": rt.agg_kmv_overlap_query,
}


@pytest.mark.parametrize("pq", STAGED, ids=lambda pq: pq.name)
def test_wrapper_oracle_match(spark, pq):
    """The wrapper + the staged oracle reproduce the round-5 3-SF hash
    match (the wrapper is a pure delegation, but this re-runs the
    driver-shaped comparison on the EXACT objects now registered)."""
    result = _WRAPPERS[pq.name](spark, SF_DIR)
    oracle = run_oracle(pq.oracle, SF_DIR)
    errs = compare(result, oracle)
    assert not errs, f"{pq.name}: " + "; ".join(errs)
    assert len(oracle) > 0


def test_wrappers_delegate_to_staged():
    """Registered fn is the wrapper; semantics are the staged fn's.
    Guard against a wrapper silently diverging from its target name."""
    from spotify_data_pipeline_spark.plans import all_queries

    qs = all_queries()
    staged = {pq.name: pq for pq in STAGED}
    for name, fn in _WRAPPERS.items():
        assert qs[name].fn is fn
        assert qs[name].oracle == staged[name].oracle


def test_cms_md5_oracle_match(spark):
    result = rt.text_heavy_hitters_cms_md5_query(spark, SF_DIR)
    oracle = run_oracle(rt._CMS_MD5_ORACLE, SF_DIR)
    errs = compare(result, oracle)
    assert not errs, "; ".join(errs)
    assert len(oracle) > 0


def test_cms_md5_bracket_and_collisions_bite(spark):
    """The two CMS behaviors the driver row is meant to prove must
    actually occur in the checked result: (1) est >= cnt for every row
    (over-count only — Cormode & Muthukrishnan 2005); (2) at width 16
    against the 31-token vocabulary, pigeonhole guarantees collisions,
    so est > cnt must hold SOMEWHERE (otherwise the estimator
    arithmetic is vacuously 'correct' — the Q7 lesson)."""
    rows = rt.text_heavy_hitters_cms_md5_query(spark, SF_DIR).collect()
    assert rows
    assert all(r.est >= r.cnt for r in rows)
    assert any(r.est > r.cnt for r in rows), (
        "no bucket collision reached the candidate set — widen the "
        "candidate k or shrink the width so the over-count branch bites"
    )


def test_cms_md5_min_tightening_bites(spark):
    """depth=3 must genuinely tighten ON THE ROWS THE ORACLE CHECKS:
    for at least one top-10 CANDIDATE the three row estimates differ
    (min < max over rows) — otherwise a depth-1 sketch would produce
    the same checked result and the min() in the estimator is dead
    code on the driver-compared rows (ADVICE r06: the earlier
    whole-vocabulary spread count could pass while every candidate row
    had agreeing hash rows)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from spotify_data_pipeline_spark.functions.text import tokens
    from spotify_data_pipeline_spark.io import load_table

    spark_df = load_table(spark, SF_DIR, "documents")
    counts = (
        spark_df.select("source", F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count("*").alias("cnt"))
    )
    # the SAME candidate rule as the query: exact top-10 per source,
    # deterministic token tiebreak
    w = Window.partitionBy("source").orderBy(F.col("cnt").desc(), F.col("tok"))
    cand = (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .select("source", "tok")
    )
    per_row_est = counts.select(
        "source",
        "tok",
        *[
            F.expr(
                f"CAST(conv(substring(md5(concat('r{r}:', tok)), 1, 1), 16, 10) AS INT)"
            ).alias(f"b{r}")
            for r in range(3)
        ],
    )
    # per hash row: bucket sums, then the spread of the 3 row estimates
    ests = []
    for r in range(3):
        bucket_sum = (
            counts.withColumn(
                "b",
                F.expr(
                    f"CAST(conv(substring(md5(concat('r{r}:', tok)), 1, 1), 16, 10) AS INT)"
                ),
            )
            .groupBy("source", "b")
            .agg(F.sum("cnt").alias(f"e{r}"))
        )
        ests.append(
            per_row_est.select("source", "tok", F.col(f"b{r}").alias("b")).join(
                bucket_sum, on=["source", "b"]
            ).select("source", "tok", f"e{r}")
        )
    joined = (
        ests[0]
        .join(ests[1], ["source", "tok"])
        .join(ests[2], ["source", "tok"])
        .join(cand, ["source", "tok"], "left_semi")  # candidate rows only
    )
    spread = joined.where(
        (F.col("e0") != F.col("e1")) | (F.col("e1") != F.col("e2"))
    ).count()
    assert spread > 0, (
        "all 3 hash rows agree on every top-10 candidate — min() never "
        "tightens on the rows the oracle actually checks"
    )


def test_cms_md5_width_pinned_to_hex_digit():
    """The bucket expression extracts ONE lowercase-hex digit (values
    0-15), so '% width' is only meaningful at width == 16 — raising
    width without widening the digit extraction would silently leave
    buckets >= 16 empty and bias the estimates (ADVICE r06). Pin the
    constant to the extraction so a future width change fails loudly
    here instead."""
    import inspect
    import re

    src = inspect.getsource(rt.text_heavy_hitters_cms_md5_query)
    m = re.search(r"depth, width = (\d+), (\d+)", src)
    assert m, "depth/width constants moved — update this pin"
    width = int(m.group(2))
    digits = re.findall(r"substring\(md5\([^)]*\)\), 1, (\d+)\)", src)
    assert digits, "bucket hex-digit extraction moved — update this pin"
    n_digits = {int(d) for d in digits}
    assert n_digits == {1}, n_digits
    assert width == 16 ** 1, (
        f"width={width} but the bucket hash extracts exactly one hex "
        "digit (16 values) — widen the substring with the width"
    )
