"""Round-13 staged queries (plans/roundthirteen_pending.py) get the
SAME driver-shaped oracle check as declared queries — so activating
them later is registration-only (after the evidence-hash refresh).
"""

from __future__ import annotations

import os

import pytest

from spotify_data_pipeline_spark.plans.roundthirteen_pending import PENDING
from tests.oracle_check import compare, run_oracle

SF_DIR = os.environ.get("ORACLE_SF", "/root/testdata/sf0.001")


@pytest.mark.parametrize("pq", PENDING, ids=lambda pq: pq.name)
def test_pending_oracle_match(spark, pq):
    result = pq.fn(spark, SF_DIR)
    oracle = run_oracle(pq.oracle, SF_DIR)
    errs = compare(result, oracle)
    assert not errs, f"{pq.name}: " + "; ".join(errs)
    # vacuousness guard: empty-vs-empty proves nothing.
    assert len(oracle) > 0, f"{pq.name}: vacuous (0 oracle rows) at {SF_DIR}"


def test_pending_registered(spark):
    """Round-9 activated the whole module (window positions 2-17)."""
    from spotify_data_pipeline_spark.plans import all_queries
    from spotify_data_pipeline_spark.plans.active import R13_ACTIVATED

    qs = all_queries()
    assert set(R13_ACTIVATED) == {pq.name for pq in PENDING}
    for pq in PENDING:
        assert pq.name in qs and qs[pq.name].fn is pq.fn
        assert qs[pq.name].oracle == pq.oracle


def test_pending_names_unique_and_oracle_bearing():
    # no collisions inside this module, with the registry, or with any
    # other staging module
    from spotify_data_pipeline_spark.plans import all_queries
    from spotify_data_pipeline_spark.plans.roundeight_pending import PENDING as P8
    from spotify_data_pipeline_spark.plans.roundeleven_pending import PENDING as P11
    from spotify_data_pipeline_spark.plans.roundnine_pending import PENDING as P9
    from spotify_data_pipeline_spark.plans.roundseven_pending import PENDING as P7
    from spotify_data_pipeline_spark.plans.roundsix import PENDING as P6
    from spotify_data_pipeline_spark.plans.roundten_pending import PENDING as P10
    from spotify_data_pipeline_spark.plans.roundtwelve_pending import PENDING as P12

    names = [pq.name for pq in PENDING]
    assert len(names) == len(set(names))
    assert all(pq.oracle for pq in PENDING)
    # this module is registered since round 9 — exclude its own names
    # from the registry side of the collision check
    taken = (set(all_queries()) - set(names)) | {
        pq.name for mod in (P6, P7, P8, P9, P10, P11, P12) for pq in mod
    }
    assert not set(names) & taken


def _plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_mannwhitney_u_identity_and_python_model(spark):
    """U_a + U_b = n_a * n_b on every row (tie-averaged ranks make this
    an identity), and the whole output matches an independent pure-
    Python recount with scipy-style average ranks."""
    from collections import defaultdict

    from spotify_data_pipeline_spark.plans.roundthirteen_pending import (
        events_ab_mannwhitney_query,
    )

    rows = events_ab_mannwhitney_query(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.u2_a + (r.u2_sum - r.u2_a) == r.u2_sum  # trivially
        # the real identity: u2_a <= u2_sum and u2_b = u2_sum - u2_a >= 0
        assert 0 <= r.u2_a <= r.u2_sum

    # independent model
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(SF_DIR, "events.parquet")).to_pylist()
    by_type = defaultdict(list)
    for e in t:
        by_type[e["event_type"]].append((e["value"], e["user_id"] % 2 == 0))
    expect = {}
    for et, vals in by_type.items():
        svals = sorted(v for v, _ in vals)
        # average rank (doubled) per value
        first = {}
        cnt = defaultdict(int)
        for i, v in enumerate(svals, start=1):
            first.setdefault(v, i)
            cnt[v] += 1
        r2 = {v: 2 * first[v] + cnt[v] - 1 for v in first}
        n_a = sum(1 for _, a in vals if a)
        r2sum_a = sum(r2[v] for v, a in vals if a)
        expect[et] = (n_a, r2sum_a, r2sum_a - n_a * (n_a + 1))
    for r in rows:
        assert (r.n_a, r.r2sum_a, r.u2_a) == expect[r.event_type], r.event_type


def test_spearman_perfect_and_reversed(spark):
    """rho = 1 on identical rankings, -1 on exactly reversed ones —
    pins the closed form and the sign convention."""
    from spotify_data_pipeline_spark.plans.parity import rnd
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, float(i), float(100 - i)) for i in range(1, 21)], "k int, x double, y double"
    )
    w_x = Window.orderBy("x", "k")
    w_y = Window.orderBy("y", "k")
    ranked = df.select(
        F.row_number().over(w_x).cast("long").alias("rx"),
        F.row_number().over(w_y).cast("long").alias("ry"),
    )
    d2 = (F.col("rx") - F.col("ry")) * (F.col("rx") - F.col("ry"))
    agg = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"), F.sum(d2).cast("long").alias("s")
    ).collect()[0]
    n, s = agg.n, agg.s
    rho = 1.0 - (6.0 * s) / (n * (n * n - 1))
    assert rho == -1.0  # x ascending, y descending -> perfectly reversed
    # and d2=0 -> rho=1
    assert 1.0 - (6.0 * 0) / (n * (n * n - 1)) == 1.0


def test_null_safe_join_counts_every_order(spark):
    """The three lanes partition the orders table exactly: a plain `=`
    join would drop the NULL class; the null-safe join must not."""
    from spotify_data_pipeline_spark.plans.roundthirteen_pending import (
        join_null_safe_equi_query,
    )
    from spotify_data_pipeline_spark.io import load_table

    out = join_null_safe_equi_query(spark, SF_DIR).collect()
    total = sum(r.n_orders for r in out)
    n_orders = load_table(spark, SF_DIR, "orders").count()
    assert total == n_orders
    lanes = {r.lane for r in out}
    assert "standard" in lanes  # the NULL<=>NULL match arm fired
    null_rows = [r for r in out if r.prio_class is None]
    assert len(null_rows) == 1 and null_rows[0].lane == "standard"


def test_null_safe_join_plan_no_bnlj(spark):
    """EqualNullSafe must plan as a hash-joinable equality, not a
    nested-loop filter."""
    from spotify_data_pipeline_spark.plans.roundthirteen_pending import (
        join_null_safe_equi_query,
    )

    plan = _plan_of(join_null_safe_equi_query(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_quartile_migration_accounts_for_every_active_customer(spark):
    """Matrix totals = customers active in 1996 OR 1997; entries with
    q_from=0 are 1997-only customers, q_to=0 are 1996-only."""
    from spotify_data_pipeline_spark.plans.roundthirteen_pending import (
        orders_quartile_migration_query,
    )
    from spotify_data_pipeline_spark.io import load_table
    from pyspark.sql import functions as F

    out = orders_quartile_migration_query(spark, SF_DIR)
    total = out.agg(F.sum("n_customers")).collect()[0][0]
    orders = load_table(spark, SF_DIR, "orders")
    active = (
        orders.where(F.year("o_orderdate").isin(1996, 1997))
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert total == active
    rows = out.collect()
    assert all(0 <= r.q_from <= 4 and 0 <= r.q_to <= 4 for r in rows)
    assert not any(r.q_from == 0 and r.q_to == 0 for r in rows)


def test_kendall_pair_accounting(spark):
    """C + D + ties = n(n-1)/2 per event type, and n_pairs matches the
    day count observed in the raw table."""
    from collections import Counter

    from spotify_data_pipeline_spark.io import load_table
    from spotify_data_pipeline_spark.plans.roundthirteen_pending import (
        events_kendall_tau_query,
    )
    from pyspark.sql import functions as F

    rows = events_kendall_tau_query(spark, SF_DIR).collect()
    assert rows
    days = dict(
        load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.countDistinct(F.to_date("ts")).alias("d"))
        .collect()
    )
    for r in rows:
        d = days[r.event_type]
        assert r.n_pairs == d * (d - 1) // 2
        assert r.concordant + r.discordant + r.tie_pairs == r.n_pairs
        assert -1.0 <= r.tau_a <= 1.0


def test_trimmed_mean_drops_exactly_five_per_side(spark):
    from spotify_data_pipeline_spark.io import load_table
    from spotify_data_pipeline_spark.plans.roundthirteen_pending import (
        agg_trimmed_mean_query,
    )
    from pyspark.sql import functions as F

    rows = agg_trimmed_mean_query(spark, SF_DIR).collect()
    cust = load_table(spark, SF_DIR, "customer").select("c_custkey", "c_mktsegment")
    orders = load_table(spark, SF_DIR, "orders")
    per_seg = dict(
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    for r in rows:
        assert r.n_kept == per_seg[r.c_mktsegment] - 10
        # a trimmed mean sits strictly inside the untrimmed extremes
        assert r.trimmed_mean > 0


def test_knn_confusion_counts_every_query(spark):
    from spotify_data_pipeline_spark.io import load_table
    from spotify_data_pipeline_spark.plans.roundthirteen_pending import (
        ml_knn_confusion_query,
    )
    from pyspark.sql import functions as F

    out = ml_knn_confusion_query(spark, SF_DIR).collect()
    total = sum(r.n for r in out)
    n_queries = (
        load_table(spark, SF_DIR, "embeddings")
        .where(F.col("vec_id") % 20 == 0)
        .count()
    )
    assert total == n_queries
    # labels come from the real label domain
    labels = {
        r[0]
        for r in load_table(spark, SF_DIR, "embeddings").select("label").distinct().collect()
    }
    assert all(r.true_label in labels and r.pred_label in labels for r in out)


def test_rapid_repeat_binned_equals_naive(spark):
    """The binned candidate generation must lose no pair: recompute the
    screen with a naive per-user theta join in Spark and compare sets;
    also plan-assert the declared form carries no BNLJ/cartesian."""
    from spotify_data_pipeline_spark.io import load_table
    from spotify_data_pipeline_spark.plans.parity import rnd_cents
    from spotify_data_pipeline_spark.plans.roundthirteen_pending import (
        events_rapid_repeat_screen_query,
    )
    from pyspark.sql import functions as F

    out = events_rapid_repeat_screen_query(spark, SF_DIR)
    plan = _plan_of(out)
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    got = {(r.user_id, r.id_a, r.id_b) for r in out.collect()}

    e = (
        load_table(spark, SF_DIR, "events")
        .where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "event_id",
            F.unix_micros("ts").alias("us"),
            rnd_cents("value").alias("c"),
        )
    )
    a = e.select(*(F.col(c).alias(c + "_a") for c in e.columns))
    b = e.select(*(F.col(c).alias(c + "_b") for c in e.columns))
    naive = (
        a.join(b, F.col("user_id_a") == F.col("user_id_b"))
        .where(
            (F.col("event_id_a") < F.col("event_id_b"))
            & (F.col("us_a") != F.col("us_b"))
            & (F.abs(F.col("us_a") - F.col("us_b")) <= 180 * 60 * 1000000)
            & (F.abs(F.col("c_a") - F.col("c_b")) <= 2000)
        )
        .select("user_id_a", "event_id_a", "event_id_b")
    )
    expect = {(r.user_id_a, r.event_id_a, r.event_id_b) for r in naive.collect()}
    assert got == expect


def test_freshness_shares_and_bounds(spark):
    """Every trailing-day share in [0, 1e6] ppm; the freshest type has
    staleness 0; trailing counts never exceed totals."""
    from spotify_data_pipeline_spark.plans.roundthirteen_pending import (
        dq_freshness_report_query,
    )

    rows = dq_freshness_report_query(spark, SF_DIR).collect()
    assert rows
    assert min(r.staleness_min for r in rows) == 0
    for r in rows:
        assert 0 <= r.n_trailing_day <= r.n_rows
        assert 0 <= r.trailing_share_ppm <= 1_000_000


def test_ratio_delta_matches_python_model(spark):
    """R and SE recomputed from scratch in Python floats (same formula,
    same association order) — pins the moment algebra."""
    import math
    from collections import defaultdict

    import pyarrow.parquet as pq

    from spotify_data_pipeline_spark.plans.roundthirteen_pending import (
        events_ratio_delta_ci_query,
    )

    rows = events_ratio_delta_ci_query(spark, SF_DIR).collect()
    t = pq.read_table(os.path.join(SF_DIR, "events.parquet")).to_pylist()
    per = defaultdict(lambda: defaultdict(lambda: [0, 0]))
    for e in t:
        cell = per[e["event_type"]][e["user_id"]]
        cell[0] += int(math.floor(e["value"] * 100 + 0.5))
        cell[1] += 1
    for r in rows:
        users = per[r.event_type]
        n = len(users)
        sx = sum(x for x, _ in users.values())
        sy = sum(y for _, y in users.values())
        sxx = sum(x * x for x, _ in users.values())
        sxy = sum(x * y for x, y in users.values())
        syy = sum(y * y for x, y in users.values())
        assert (r.n_users, r.sum_cents, r.n_events) == (n, sx, sy)
        R = sx / sy
        var = (n / (n - 1)) * (sxx - 2 * R * sxy + R * R * syy) / (sy * sy)
        assert abs(r.ratio_dollars - R / 100.0) < 1e-3
        assert abs(r.se_dollars - math.sqrt(var) / 100.0) < 1e-3


def test_langid_agreement_totals_match_corpus(spark):
    """Cell counts sum to the nonblank corpus; accuracy ppm consistent
    with the diagonal cell share per declared language."""
    from spotify_data_pipeline_spark.io import load_table
    from spotify_data_pipeline_spark.plans.roundthirteen_pending import (
        llm_langid_agreement_query,
    )
    from pyspark.sql import functions as F

    rows = llm_langid_agreement_query(spark, SF_DIR).collect()
    docs = load_table(spark, SF_DIR, "documents")
    n_nonblank = docs.where(F.length(F.trim("text")) > 0).count()
    assert sum(r.n for r in rows) == n_nonblank
    from collections import defaultdict

    tot = defaultdict(int)
    agree = defaultdict(int)
    for r in rows:
        tot[r.lang] += r.n
        if r.lang == r.pred_lang:
            agree[r.lang] += r.n
    for r in rows:
        assert r.lang_accuracy_ppm == agree[r.lang] * 1000000 // tot[r.lang]


def test_customer_360_covers_every_customer(spark):
    """A feature table covers the whole entity population: one row per
    customer; zero-order customers present with zeros and NULL dates."""
    from spotify_data_pipeline_spark.io import load_table
    from spotify_data_pipeline_spark.plans.roundthirteen_pending import (
        customer_360_snapshot_query,
    )

    out = customer_360_snapshot_query(spark, SF_DIR)
    n_cust = load_table(spark, SF_DIR, "customer").count()
    rows = out.collect()
    assert len(rows) == n_cust
    assert len({r.c_custkey for r in rows}) == n_cust
    assert all(1 <= r.spend_quintile <= 5 for r in rows)


def test_customer_360_zero_order_contract(spark):
    """No test SF happens to contain an orderless customer, so the
    LEFT-join survival contract is pinned on a constructed fixture:
    the inactive customer appears with zeros and NULL dates/recency."""
    import datetime

    from spotify_data_pipeline_spark.plans.roundthirteen_pending import customer_360

    cust = spark.createDataFrame(
        [(1, "C1", 0, 10.0, "BUILDING"), (2, "C2", 0, 20.0, "BUILDING")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    )
    nation = spark.createDataFrame([(0, "ZERO", 0)], "n_nationkey int, n_name string, n_regionkey int")
    orders = spark.createDataFrame(
        [(100, 1, "O", 50.0, datetime.datetime(1996, 3, 1), "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    rows = {r.c_custkey: r for r in customer_360(cust, nation, orders).collect()}
    assert rows[1].n_orders == 1 and rows[1].recency_days == 0
    inactive = rows[2]
    assert inactive.n_orders == 0 and inactive.spend_cents == 0
    assert inactive.first_order is None and inactive.last_order is None
    assert inactive.recency_days is None
    assert inactive.spend_quintile in (1, 2)  # still ranked within its segment


def test_norm_audit_rectangular_and_positive(spark):
    from spotify_data_pipeline_spark.plans.roundthirteen_pending import (
        sim_embedding_norm_audit_query,
    )

    rows = sim_embedding_norm_audit_query(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.dim_min == r.dim_max  # rectangular embedding column
        assert r.n_zero_vecs == 0
        assert 0 < r.norm2_min <= r.norm2_max


def test_segment_behavior_full_match_and_totals(spark):
    """Every event user resolves against the customer master (measured
    domain alignment), so segment totals must add back to the raw
    corpus exactly."""
    from spotify_data_pipeline_spark.io import load_table
    from spotify_data_pipeline_spark.plans.roundthirteen_pending import (
        events_segment_behavior_query,
    )
    from pyspark.sql import functions as F

    rows = events_segment_behavior_query(spark, SF_DIR).collect()
    ev = load_table(spark, SF_DIR, "events")
    assert sum(r.n_events for r in rows) == ev.count()
    assert sum(r.n_purchases for r in rows) == ev.where(
        F.col("event_type") == "purchase"
    ).count()
    assert sum(r.n_active_users for r in rows) == ev.select("user_id").distinct().count()
    for r in rows:
        assert 0 <= r.purchase_share_ppm <= 1_000_000


def test_cohen_kappa_python_recount(spark):
    """kappa recomputed from the agreement matrix cells in exact
    Python integers; kappa <= accuracy always (chance correction
    can only lower the score)."""
    from spotify_data_pipeline_spark.plans.roundthirteen_pending import (
        agg_cohen_kappa_query,
        llm_langid_agreement_query,
    )

    k = agg_cohen_kappa_query(spark, SF_DIR).collect()[0]
    cells = llm_langid_agreement_query(spark, SF_DIR).collect()
    N = sum(r.n for r in cells)
    agree = sum(r.n for r in cells if r.lang == r.pred_lang)
    from collections import defaultdict

    row = defaultdict(int)
    col = defaultdict(int)
    for r in cells:
        row[r.lang] += r.n
        col[r.pred_lang] += r.n
    sum_rc = sum(row[l] * col[l] for l in set(row) | set(col))
    assert (k.n_docs, k.n_agree, k.sum_row_col) == (N, agree, sum_rc)
    import math

    expect = math.floor((N * agree - sum_rc) * 1000000 / (N * N - sum_rc) + 0.5)
    assert k.kappa_ppm == expect
    assert k.kappa_ppm <= agree * 1000000 // N  # kappa <= accuracy


def test_knn_prf_consistent_with_confusion(spark):
    """tp / marginals recomputed from ml_knn_confusion's matrix; F1 is
    the harmonic mean bound: min(P,R) <= F1 <= max(P,R)."""
    from spotify_data_pipeline_spark.plans.roundthirteen_pending import (
        ml_knn_confusion_query,
        ml_knn_prf_query,
    )
    from collections import defaultdict

    cm = ml_knn_confusion_query(spark, SF_DIR).collect()
    prf = {r.label: r for r in ml_knn_prf_query(spark, SF_DIR).collect()}
    row = defaultdict(int)
    col = defaultdict(int)
    diag = defaultdict(int)
    for r in cm:
        row[r.true_label] += r.n
        col[r.pred_label] += r.n
        if r.true_label == r.pred_label:
            diag[r.true_label] = r.n
    for lbl, r in prf.items():
        assert r.tp == diag[lbl] and r.n_true == row[lbl] and r.n_pred == col[lbl]
        if r.precision_ppm is not None and r.recall_ppm is not None and r.f1_ppm is not None:
            lo, hi = sorted((r.precision_ppm, r.recall_ppm))
            assert lo - 1 <= r.f1_ppm <= hi + 1  # ppm flooring slack
