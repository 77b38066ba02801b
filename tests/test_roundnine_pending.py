"""Round-9 staged queries (plans/roundnine_pending.py) get the SAME
driver-shaped oracle check as declared queries — activation later is
registration-only (after the evidence-hash refresh)."""

from __future__ import annotations

import os

import pytest

from spotify_data_pipeline_spark.plans.roundnine_pending import PENDING
from tests.oracle_check import compare, run_oracle

SF_DIR = os.environ.get("ORACLE_SF", "/root/testdata/sf0.001")

# staged queries allowed to be empty at the default sf0.001 (none currently)
_EMPTY_OK = set()


@pytest.mark.parametrize("pq", PENDING, ids=lambda pq: pq.name)
def test_pending_oracle_match(spark, pq):
    result = pq.fn(spark, SF_DIR)
    oracle = run_oracle(pq.oracle, SF_DIR)
    errs = compare(result, oracle)
    assert not errs, f"{pq.name}: " + "; ".join(errs)
    # vacuousness guard: an empty-vs-empty oracle match proves nothing
    if pq.name not in _EMPTY_OK:
        assert len(oracle) > 0, f"{pq.name}: vacuous (0 oracle rows) at {SF_DIR}"


def test_pending_all_registered(spark):
    """Round-7 activation (plans/active.py manifest): every round-9
    staged query is declared, oracle intact, fn identical — the
    manifest declares FROM this module so the pending file itself
    never changes at activation."""
    from spotify_data_pipeline_spark.plans import all_queries

    qs = all_queries()
    for pq in PENDING:
        assert pq.name in qs, pq.name
        assert qs[pq.name].fn is pq.fn, pq.name
        assert qs[pq.name].oracle == pq.oracle, pq.name


def test_pending_names_unique_and_oracle_bearing():
    names = [pq.name for pq in PENDING]
    assert len(names) == len(set(names))
    assert all(pq.oracle for pq in PENDING)
    # and no collision with the earlier staging areas either
    from spotify_data_pipeline_spark.plans.roundeight_pending import PENDING as P8
    from spotify_data_pipeline_spark.plans.roundseven_pending import PENDING as P7
    from spotify_data_pipeline_spark.plans.roundsix import PENDING as P6

    for earlier in (P6, P7, P8):
        assert not set(names) & {pq.name for pq in earlier}


def _plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# broadcast-1-row patterns, documented at the call site; these join the
# plan-hygiene whitelist (with the same reasons) at activation
_BNLJ_OK = {
    # 1-row broadcast totals (sum, n_keys) under the skew-ratio DIV
    "ops_skew_report",
    # 1-row broadcast max(day) anchor under the two window filters
    "events_trending",
    # bounded broadcasts: the 1-row vocab aggregate and the 5-row
    # class-prior table (|segments| is a domain constant)
    "ml_nb_segment",
    # inherits both proven anchors: BM25's 1-row corpus-totals
    # broadcast and the quantized brute-force 1-row probe broadcast
    "sim_rrf_fusion",
    # 1-row broadcast of the collected (cdf, value) lookup array
    # (distinct-value frame, domain-bounded)
    "llm_quantile_normalize",
}


def test_plans_no_nested_loop(spark):
    for pq in PENDING:
        if pq.name in _BNLJ_OK:
            continue
        plan = _plan_of(pq.fn(spark, SF_DIR))
        assert "BroadcastNestedLoopJoin" not in plan, pq.name
        assert "CartesianProduct" not in plan, pq.name


def test_k_anonymity_buckets_partition_population(spark):
    """Bucket shares must sum to <= 1e6 ppm (floor loses at most
    n_buckets ppm) and row counts must sum to the full customer
    table — the report partitions the population."""
    from spotify_data_pipeline_spark.plans.roundnine_pending import (
        privacy_k_anonymity_query,
    )

    rows = privacy_k_anonymity_query(spark, SF_DIR).collect()
    total_rows = sum(r.n_rows for r in rows)
    cust_count = spark.read.parquet(f"{SF_DIR}/customer.parquet").count()
    assert total_rows == cust_count
    ppm = sum(r.share_ppm for r in rows)
    assert 1_000_000 - len(rows) <= ppm <= 1_000_000


def test_link_prediction_jaccard_bounds(spark):
    """0 < jaccard <= 1e6 ppm, and common neighbors never exceed
    either endpoint degree (the capped graph is internally
    consistent)."""
    from spotify_data_pipeline_spark.plans.roundnine_pending import (
        graph_link_prediction_query,
    )

    rows = graph_link_prediction_query(spark, SF_DIR).collect()
    assert rows, "no co-purchase pairs at test SF"
    for r in rows:
        assert 0 < r.jaccard_ppm <= 1_000_000
        assert r.common_customers <= min(r.deg1, r.deg2)


def test_skew_report_salt_levels_key(spark):
    """suggested_salt is the ceiling of cnt/(t/nk): salting the key by
    that factor brings every sub-key's expected share to <= the
    uniform share."""
    from spotify_data_pipeline_spark.plans.roundnine_pending import (
        ops_skew_report_query,
    )

    rows = ops_skew_report_query(spark, SF_DIR).collect()
    assert rows
    li_count = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    n_keys = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_suppkey")
        .distinct()
        .count()
    )
    for r in rows:
        import math

        assert r.suggested_salt == math.ceil(r.cnt * n_keys / li_count)
        # salted sub-key expected size <= uniform share (the point of the salt)
        assert r.cnt / r.suggested_salt <= li_count / n_keys + 1e-9


def test_autocorrelation_atoms_match_python(spark):
    """The per-lag sufficient statistics equal an independent pandas
    recomputation from the raw parquet (and corr derived from the
    atoms is a valid correlation in [-1, 1])."""
    import pandas as pd

    from spotify_data_pipeline_spark.plans.roundnine_pending import (
        agg_autocorrelation_query,
    )

    rows = {r.lag: r for r in agg_autocorrelation_query(spark, SF_DIR).collect()}
    assert set(rows) == set(range(1, 8))

    df = pd.read_parquet(f"{SF_DIR}/orders.parquet", columns=["o_orderdate", "o_totalprice"])
    cents = (df.o_totalprice * 100 + 0.5).apply(int)  # floor for positives
    daily = (
        pd.DataFrame({"day": df.o_orderdate.dt.normalize(), "c": cents})
        .groupby("day")["c"]
        .sum()
        .floordiv(100)
    )
    for lag in range(1, 8):
        shifted = daily.copy()
        shifted.index = shifted.index - pd.Timedelta(days=lag)
        pairs = pd.concat([daily.rename("x"), shifted.rename("y")], axis=1).dropna()
        # exact Python ints: the concat+dropna upcasts to float64, which
        # loses precision on products beyond 2^53 at sf0.1+
        xs = [int(v) for v in pairs.x]
        ys = [int(v) for v in pairs.y]
        r = rows[lag]
        assert r.n_pairs == len(pairs)
        assert r.sum_x == sum(xs)
        assert r.sum_y == sum(ys)
        assert r.sum_xy == sum(a * b for a, b in zip(xs, ys))
        n, sx, sy, sxy, sxx, syy = (
            r.n_pairs, r.sum_x, r.sum_y, r.sum_xy, r.sum_xx, r.sum_yy,
        )
        num = n * sxy - sx * sy
        dx = n * sxx - sx * sx
        dy = n * syy - sy * sy
        assert dx >= 0 and dy >= 0
        if dx > 0 and dy > 0:
            assert num * num <= dx * dy  # |corr| <= 1, exact integers


def test_trending_lift_is_exact_ratio(spark):
    """lift_ppm is exactly floor(c1*7*1e6/c7) for every emitted row."""
    from spotify_data_pipeline_spark.plans.roundnine_pending import (
        events_trending_query,
    )

    rows = events_trending_query(spark, SF_DIR).collect()
    assert rows, "no trending buckets at test SF"
    for r in rows:
        assert r.lift_ppm == (r.c1 * 7 * 1_000_000) // r.c7


def test_attribution_position_conserves_revenue(spark):
    """Every purchase's cents land somewhere: total attributed revenue
    equals total purchase revenue to the cent (the exactness claim of
    the largest-remainder split)."""
    from spotify_data_pipeline_spark.plans.roundnine_pending import (
        events_attribution_position_query,
    )
    from spotify_data_pipeline_spark.io import load_table
    from pyspark.sql import functions as F

    rows = events_attribution_position_query(spark, SF_DIR).collect()
    attributed_cents = round(sum(r.attributed_revenue for r in rows) * 100)
    purchases = (
        load_table(spark, SF_DIR, "events")
        .where(F.col("event_type") == "purchase")
        .select(F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("c"))
        .agg(F.sum("c").alias("t"))
        .collect()[0]
        .t
    )
    assert attributed_cents == purchases


def test_zipf_rank1_has_zero_deviation(spark):
    from spotify_data_pipeline_spark.plans.roundnine_pending import (
        text_zipf_fit_query,
    )

    rows = text_zipf_fit_query(spark, SF_DIR).collect()
    assert rows[0].rank == 1 and rows[0].dev_ppm == 0
    assert rows[0].zipf_product == rows[0].freq
    # ranks are 1..n with frequencies non-increasing
    freqs = [r.freq for r in rows]
    assert freqs == sorted(freqs, reverse=True)


def test_nb_predictions_cover_test_split(spark):
    """Exactly one winner per held-out customer: the tournament is a
    total order, so confusion-matrix counts sum to the test-split
    size."""
    from spotify_data_pipeline_spark.plans.roundnine_pending import (
        ml_nb_segment_query,
    )
    from pyspark.sql import functions as F

    rows = ml_nb_segment_query(spark, SF_DIR).collect()
    predicted = sum(r.n for r in rows)
    test_n = (
        spark.read.parquet(f"{SF_DIR}/customer.parquet")
        .where(F.col("c_custkey") % 10 == 0)
        .count()
    )
    assert predicted == test_n


def test_rowset_digest_detects_single_row_change(spark):
    """Dropping one input row changes that group's digest and no
    other's — the audit property the query exists for."""
    import duckdb

    from spotify_data_pipeline_spark.plans.roundnine_pending import (
        _rowset_digest_oracle,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{SF_DIR}/lineitem.parquet'"
    )
    base = {r[0]: r[2] for r in con.execute(_rowset_digest_oracle()).fetchall()}
    # drop EXACTLY one row (the first by a total order) — (orderkey,
    # linenumber) is not unique in this testdata, so the digest is a
    # BAG digest and the mutation must remove a single occurrence
    con2 = duckdb.connect()
    con2.execute(
        f"""CREATE VIEW lineitem AS
            SELECT * EXCLUDE (rn) FROM (
              SELECT *, row_number() OVER (ORDER BY l_orderkey, l_linenumber) AS rn
              FROM '{SF_DIR}/lineitem.parquet'
            ) WHERE rn > 1"""
    )
    mutated = {r[0]: r[2] for r in con2.execute(_rowset_digest_oracle()).fetchall()}
    changed = [g for g in base if base[g] != mutated.get(g)]
    assert len(changed) == 1


def test_rrf_fusion_score_decomposition(spark):
    """Every emitted row's rrf_score equals the sum of its two rank
    contributions (0 when absent from a list), and a doc in both lists
    outscores the same ranks taken singly."""
    from spotify_data_pipeline_spark.plans.roundnine_pending import (
        sim_rrf_fusion_query,
    )

    rows = sim_rrf_fusion_query(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        lex = 1_000_000_000 // (60 + r.rank_lex) if r.rank_lex else 0
        vec = 1_000_000_000 // (60 + r.rank_vec) if r.rank_vec else 0
        assert r.rrf_score == lex + vec


def test_quantile_normalize_is_monotone_within_source(spark):
    """Within a source, a higher raw score never maps to a lower
    normalized score (quantile mapping is monotone), and every
    normalized value is an actual pooled value."""
    from spotify_data_pipeline_spark.plans.roundnine_pending import (
        llm_quantile_normalize_query,
    )

    rows = llm_quantile_normalize_query(spark, SF_DIR).collect()
    assert rows
    pooled = {r.n_chars for r in rows}
    by_source: dict = {}
    for r in rows:
        assert r.norm_chars in pooled
        by_source.setdefault(r.source, []).append((r.n_chars, r.doc_id, r.norm_chars))
    for vals in by_source.values():
        vals.sort()
        norms = [n for _, _, n in vals]
        assert norms == sorted(norms), "non-monotone quantile map"


def test_active_time_bounds(spark):
    """Active seconds per user is bounded below by one window (300s —
    at least one island exists for any active user) and above by
    n_events * 300s (disjoint windows), and islands never exceed
    events."""
    from spotify_data_pipeline_spark.plans.roundnine_pending import (
        events_active_time_query,
    )
    from pyspark.sql import functions as F
    from spotify_data_pipeline_spark.io import load_table

    rows = {r.user_id: r for r in events_active_time_query(spark, SF_DIR).collect()}
    counts = {
        r.user_id: r.n
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(rows) == set(counts)
    for uid, r in rows.items():
        assert 1 <= r.n_islands <= counts[uid]
        assert 300 <= r.active_seconds <= counts[uid] * 300


def test_fifo_match_conservation(spark):
    """FULL pair-level FIFO matching conserves quantity: for every
    part, the sum of matched quantities equals min(total supply,
    total demand) — the defining identity of the interval-intersection
    formulation (checked on the un-limited pair set, not the top-20
    display query)."""
    from pyspark.sql import functions as F

    from spotify_data_pipeline_spark.io import load_table

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_partkey", "l_orderkey", "l_linenumber", "l_suppkey",
        "l_returnflag", "l_shipdate", F.col("l_quantity").cast("long").alias("qty"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("l_partkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber", "qty", "l_suppkey"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sup = (
        li.where(F.col("l_returnflag") == "R")
        .withColumn("s_hi", F.sum("qty").over(w))
        .select("l_partkey", (F.col("s_hi") - F.col("qty")).alias("s_lo"), "s_hi")
    )
    dem = (
        li.where(F.col("l_returnflag") != "R")
        .withColumn("d_hi", F.sum("qty").over(w))
        .select("l_partkey", (F.col("d_hi") - F.col("qty")).alias("d_lo"), "d_hi")
    )
    matched = (
        sup.join(dem, "l_partkey")
        .where((F.col("s_lo") < F.col("d_hi")) & (F.col("d_lo") < F.col("s_hi")))
        .select(
            "l_partkey",
            (F.least("s_hi", "d_hi") - F.greatest("s_lo", "d_lo")).alias("m"),
        )
        .groupBy("l_partkey")
        .agg(F.sum("m").alias("matched"))
    )
    totals = (
        li.groupBy("l_partkey")
        .agg(
            F.sum(F.when(F.col("l_returnflag") == "R", F.col("qty")).otherwise(0)).alias("s"),
            F.sum(F.when(F.col("l_returnflag") != "R", F.col("qty")).otherwise(0)).alias("d"),
        )
    )
    rows = totals.join(matched, "l_partkey", "left").collect()
    assert rows
    for r in rows:
        expect = min(r.s, r.d)
        got = r.matched or 0
        assert got == expect, f"part {r.l_partkey}: {got} != min({r.s},{r.d})"


def test_weighted_sssp_dominates_and_sane(spark):
    """Distances are non-negative, non-decreasing in rank order, and
    round-3 never WORSENS a customer reached in round 1 (final is a
    min over rounds)."""
    from spotify_data_pipeline_spark.plans.roundnine_pending import (
        graph_weighted_sssp_query,
    )

    rows = graph_weighted_sssp_query(spark, SF_DIR).collect()
    assert rows
    dists = [r.dist_days for r in rows]
    assert all(d >= 0 for d in dists)
    assert dists == sorted(dists)


def test_peak_concurrency_vs_python_sweep(spark):
    """Per-day peaks equal an independent Python sweep over the raw
    parquet (same opening-day assignment, same boundary tiebreak)."""
    import pandas as pd

    from spotify_data_pipeline_spark.plans.roundnine_pending import (
        events_peak_concurrency_query,
    )

    got = {
        str(r.day): r.peak_concurrency
        for r in events_peak_concurrency_query(spark, SF_DIR).collect()
    }
    df = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["ts", "event_id"])
    span = 300_000_000
    by_day: dict = {}
    for ts, eid in zip(df.ts, df.event_id):
        o = int(pd.Timestamp(ts).value // 1000)  # ns -> µs
        day = str(pd.Timestamp(ts).date())
        by_day.setdefault(day, []).append((o, 1, 1, int(eid)))
        by_day.setdefault(day, []).append((o + span, 0, -1, int(eid)))
    expect = {}
    for day, bounds in by_day.items():
        bounds.sort(key=lambda b: (b[0], -b[1], b[3], -b[2]))
        cur = peak = 0
        for _, _, delta, _ in bounds:
            cur += delta
            peak = max(peak, cur)
        expect[day] = peak
    assert got == expect


def test_proximity_is_map_only(spark):
    """Zero exchanges before the output sort — the embarrassingly-
    parallel claim in the docstring, plan-asserted."""
    from spotify_data_pipeline_spark.plans.roundnine_pending import (
        text_proximity_search_query,
    )

    rows = text_proximity_search_query(spark, SF_DIR)
    plan = rows._jdf.queryExecution().executedPlan().toString()
    import re

    # the only allowed exchange is the final global sort's range partition
    n_exchanges = len(re.findall(r"Exchange (?!rangepartitioning)", plan))
    assert n_exchanges == 0, plan
    got = rows.collect()
    assert got and all(0 <= r.min_dist <= 5 for r in got)
