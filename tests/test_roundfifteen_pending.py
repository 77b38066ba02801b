"""Round-15 staging area (plans/roundfifteen_pending.py):
product-analytics / curation / privacy wave — driver-shaped oracle
checks plus semantic pins."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.plans.roundfifteen_pending import PENDING
from tests.oracle_check import compare, run_oracle

SF_DIR = os.environ.get("ORACLE_SF", "/root/testdata/sf0.001")


@pytest.mark.parametrize("pq", PENDING, ids=lambda pq: pq.name)
def test_pending_oracle_match(spark, pq):
    result = pq.fn(spark, SF_DIR)
    oracle = run_oracle(pq.oracle, SF_DIR)
    errs = compare(result, oracle)
    assert not errs, f"{pq.name}: " + "; ".join(errs)
    assert len(oracle) > 0, f"{pq.name}: vacuous (0 oracle rows) at {SF_DIR}"


def test_pending_registered(spark):
    """Round-9 activated the whole module (window positions 18-28)."""
    from spotify_data_pipeline_spark.plans import all_queries
    from spotify_data_pipeline_spark.plans.active import R15_ACTIVATED

    qs = all_queries()
    assert set(R15_ACTIVATED) == {pq.name for pq in PENDING}
    for pq in PENDING:
        assert pq.name in qs and qs[pq.name].fn is pq.fn
        assert qs[pq.name].oracle == pq.oracle


def test_pending_names_unique_and_oracle_bearing():
    names = [pq.name for pq in PENDING]
    assert len(names) == len(set(names))
    assert all(pq.oracle for pq in PENDING)


def _plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# bounded nested-loop patterns, documented at the definition site;
# these join the plan-hygiene whitelist (same reasons) at activation:
# - theil_sen: |months|² pair self-join (~80² rows), corpus scanned once
# - t_closeness: |groups|×|bands| QI grid (~125×11) + 1-row consts
# - rfm/pareto: 1-row anchor broadcast
_BNLJ_OK = {
    "orders_theil_sen_trend",
    "privacy_t_closeness_emd",
    "orders_rfm_segmentation",
}


@pytest.mark.parametrize("pq", PENDING, ids=lambda pq: pq.name)
def test_plans_no_unexpected_nested_loop(spark, pq):
    plan = _plan_of(pq.fn(spark, SF_DIR))
    if pq.name in _BNLJ_OK:
        return
    assert "BroadcastNestedLoopJoin" not in plan, pq.name
    assert "CartesianProduct" not in plan, pq.name


def test_retention_offset_zero_is_full_cohort(spark):
    """Week offset 0 must retain the whole cohort (every user is active
    in their own first week) — the identity that catches cohort/key
    mix-ups."""
    from spotify_data_pipeline_spark.plans.roundfifteen_pending import (
        events_retention_cohorts_query,
    )

    rows = events_retention_cohorts_query(spark, SF_DIR).collect()
    zero = [r for r in rows if r.week_offset == 0]
    assert zero
    assert all(r.n_active == r.cohort_size and r.retained_ppm == 1_000_000 for r in zero)
    assert all(r.n_active <= r.cohort_size for r in rows)


def test_funnel_is_monotone_and_order_sensitive(spark):
    """Step counts must be non-increasing, and the ORDERED definition
    must be strictly tighter than unordered set-membership on a
    constructed sequence where a purchase precedes the view."""
    from spotify_data_pipeline_spark.plans.roundfifteen_pending import (
        events_funnel_conversion_query,
    )

    rows = {r.step: r for r in events_funnel_conversion_query(spark, SF_DIR).collect()}
    assert rows[1].n_reached >= rows[2].n_reached >= rows[3].n_reached
    assert rows[3].n_reached > 0  # non-vacuous at this SF

    import datetime as dt

    seq = [
        (1, "purchase", dt.datetime(2024, 1, 1, 0)),  # BEFORE the view: must not count
        (1, "view", dt.datetime(2024, 1, 1, 1)),
        (1, "click", dt.datetime(2024, 1, 1, 2)),
        (2, "view", dt.datetime(2024, 1, 1, 0)),
        (2, "click", dt.datetime(2024, 1, 1, 1)),
        (2, "purchase", dt.datetime(2024, 1, 1, 2)),
    ]
    df = spark.createDataFrame(seq, "user_id long, event_type string, ts timestamp")
    from pyspark.sql import Window
    w = Window.partitionBy("user_id")
    ev = df.withColumn(
        "t1", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    )
    ev = ev.withColumn(
        "t2",
        F.min(
            F.when((F.col("event_type") == "click") & (F.col("ts") > F.col("t1")), F.col("ts"))
        ).over(w),
    )
    ev = ev.withColumn(
        "t3",
        F.min(
            F.when((F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")), F.col("ts"))
        ).over(w),
    )
    got = {r.user_id: r.t3 is not None for r in ev.select("user_id", "t3").distinct().collect()}
    assert got == {1: False, 2: True}  # user 1's early purchase does not convert


def test_rfm_quintiles_are_balanced_partition(spark):
    """Exact-integer quintiles must partition customers with sizes
    differing by at most 1 per axis (the property ntile variants
    violate differently per engine)."""
    from spotify_data_pipeline_spark.plans.roundfifteen_pending import (
        orders_rfm_segmentation_query,
    )

    rows = orders_rfm_segmentation_query(spark, SF_DIR).collect()
    n = sum(r.n_customers for r in rows)
    for axis in ("r_q", "f_q", "m_q"):
        sizes = {}
        for r in rows:
            sizes[r[axis]] = sizes.get(r[axis], 0) + r.n_customers
        assert set(sizes) == {1, 2, 3, 4, 5}
        assert max(sizes.values()) - min(sizes.values()) <= 1, (axis, sizes)
    assert n == sum(sizes.values())


def test_pareto_curve_monotone_to_one_million(spark):
    from spotify_data_pipeline_spark.plans.roundfifteen_pending import (
        orders_pareto_8020_query,
    )

    rows = orders_pareto_8020_query(spark, SF_DIR).collect()
    assert [r.decile for r in rows] == list(range(1, 11))
    shares = [r.cum_share_ppm for r in rows]
    assert shares == sorted(shares)
    assert shares[-1] == 1_000_000
    # concentration is real: the top decile out-earns the bottom decile
    assert rows[0].revenue_cents > rows[-1].revenue_cents


def test_contamination_flags_benchmark_overlap_only(spark):
    """A doc sharing a 13-gram with the benchmark set must be flagged;
    the benchmark docs themselves are excluded from the corpus side."""
    from spotify_data_pipeline_spark.plans.roundfifteen_pending import (
        text_ngram13_contamination_query,
    )

    rows = text_ngram13_contamination_query(spark, SF_DIR).collect()
    assert rows
    assert all(0 <= r.n_contaminated <= r.n_docs for r in rows)
    assert all(r.contaminated_ppm <= 1_000_000 for r in rows)


def test_url_canonicalization_collapses_variants(spark):
    """All three synthesized variants of one page must collapse to ONE
    canonical URL (collapse_ppm = 2/3 exactly when every page has 3
    distinct raw variants)."""
    from spotify_data_pipeline_spark.plans.roundfifteen_pending import (
        text_url_canonical_dedup_query,
    )

    rows = text_url_canonical_dedup_query(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_raw == 3 * (r.n_canonical)  # 3 raw variants per page
        assert r.n_raw_distinct == r.n_raw  # variants are distinct strings
        assert r.collapse_ppm == 666_666  # floor(2/3 * 1e6), any page count
        assert r.domain == r.domain.lower()


def test_katz_dominates_degree_order_on_walk1(spark):
    """walk1 is degree·10⁶ DIV 8 by construction — pinning it catches a
    broken symmetrization; scores must be positive for every returned
    node."""
    from spotify_data_pipeline_spark.plans.roundfifteen_pending import (
        graph_katz_centrality_query,
    )

    rows = graph_katz_centrality_query(spark, SF_DIR).collect()
    assert rows
    assert all(r.katz_scaled == r.walk1 + r.walk2 + r.walk3 for r in rows)
    assert all(r.walk1 > 0 for r in rows)
    scores = [r.katz_scaled for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_theil_sen_median_within_range_and_python_twin(spark):
    """The lower-median slope must equal a pure-Python recount on the
    same monthly aggregate (the exact-arithmetic pin)."""
    from spotify_data_pipeline_spark.plans.parity import rnd_cents
    from spotify_data_pipeline_spark.plans.roundfifteen_pending import (
        orders_theil_sen_trend_query,
    )
    from spotify_data_pipeline_spark.io import load_table

    row = orders_theil_sen_trend_query(spark, SF_DIR).collect()[0]
    assert row.min_slope_ppm <= row.median_slope_ppm <= row.max_slope_ppm

    monthly = {
        r.m: r.r
        for r in load_table(spark, SF_DIR, "orders")
        .groupBy(
            ((F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate") - 1)
            .cast("long")
            .alias("m")
        )
        .agg(F.sum(rnd_cents(F.col("o_totalprice"))).cast("long").alias("r"))
        .collect()
    }
    ms = sorted(monthly)
    slopes = []
    for i, mi in enumerate(ms):
        for mj in ms[i + 1 :]:
            num = (monthly[mj] - monthly[mi]) * 1_000_000
            den = mj - mi
            slopes.append(num // den)  # Python // floors == the offset-DIV device
    slopes.sort()
    assert row.n_pairs == len(slopes)
    assert row.median_slope_ppm == slopes[(len(slopes) + 1) // 2 - 1]


def test_markov_rows_are_stochastic(spark):
    """Each from-row's ppm cells must sum to ≤ 1M (integer floor) and
    > 1M − |cells| (nothing lost but rounding)."""
    from spotify_data_pipeline_spark.plans.roundfifteen_pending import (
        events_markov_transitions_query,
    )

    rows = events_markov_transitions_query(spark, SF_DIR).collect()
    assert rows
    by_from = {}
    for r in rows:
        by_from.setdefault(r.from_type, []).append(r.row_ppm)
    for f, ppms in by_from.items():
        assert sum(ppms) <= 1_000_000, f
        assert sum(ppms) > 1_000_000 - len(ppms), f


def test_t_closeness_zero_iff_matching_distribution(spark):
    """A constructed group with EXACTLY the global distribution must
    get emd 0; a fully-concentrated group must not."""
    from pyspark.sql import Window

    rows_df = spark.createDataFrame(
        # global: bands 0,1 in ratio 2:1 (6 rows); group 'match' mirrors
        # it (2:1), group 'skew' is all band 1
        [
            ("match", 0), ("match", 0), ("match", 1),
            ("skew", 1), ("skew", 1), ("skew", 1),
            ("rest", 0), ("rest", 0), ("rest", 0), ("rest", 0), ("rest", 1),
        ],
        "grp string, band long",
    )
    cells = rows_df.groupBy("grp", "band").agg(F.count(F.lit(1)).alias("cnt"))
    groups = cells.groupBy("grp").agg(F.sum("cnt").alias("n_g"))
    bands = rows_df.select("band").distinct()
    glob = rows_df.groupBy("band").agg(F.count(F.lit(1)).alias("g_cnt"))
    consts = rows_df.agg(F.count(F.lit(1)).alias("n_total"))
    grid = (
        groups.crossJoin(bands)
        .join(glob, "band")
        .join(cells, ["grp", "band"], "left")
        .crossJoin(F.broadcast(consts))
        .select(
            "grp", "band", "n_g", "g_cnt", "n_total",
            F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"),
        )
    )
    w = Window.partitionBy("grp").orderBy("band")
    cum = grid.withColumn(
        "_cum", F.sum(F.col("cnt") * F.col("n_total") - F.col("g_cnt") * F.col("n_g")).over(w)
    )
    emd = {
        r.grp: r.e
        for r in cum.groupBy("grp").agg(F.sum(F.abs(F.col("_cum"))).alias("e")).collect()
    }
    # the concentrated group is strictly farther from the global
    # distribution than the near-proportional one
    assert emd["skew"] > emd["match"] >= 0


def test_dq_screen_detects_known_anomaly(spark):
    """This corpus genuinely ships lines before the order date — the
    screen must report violations (and never more violations than
    lines)."""
    from spotify_data_pipeline_spark.plans.roundfifteen_pending import (
        dq_ship_before_order_screen_query,
    )

    rows = dq_ship_before_order_screen_query(spark, SF_DIR).collect()
    assert rows
    assert sum(r.n_violations for r in rows) > 0
    for r in rows:
        assert 0 <= r.n_violations <= r.n_lines
        assert r.n_bad_orders <= r.n_violations
        assert (r.max_days_early > 0) == (r.n_violations > 0)
