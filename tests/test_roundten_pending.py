"""Round-10 staged queries (plans/roundten_pending.py) get the SAME
driver-shaped oracle check as declared queries — activation later is
registration-only (after the evidence-hash refresh)."""

from __future__ import annotations

import os

import pytest

from spotify_data_pipeline_spark.plans.roundten_pending import PENDING
from tests.oracle_check import compare, run_oracle

SF_DIR = os.environ.get("ORACLE_SF", "/root/testdata/sf0.001")

_EMPTY_OK = set()


@pytest.mark.parametrize("pq", PENDING, ids=lambda pq: pq.name)
def test_pending_oracle_match(spark, pq):
    result = pq.fn(spark, SF_DIR)
    oracle = run_oracle(pq.oracle, SF_DIR)
    errs = compare(result, oracle)
    assert not errs, f"{pq.name}: " + "; ".join(errs)
    if pq.name not in _EMPTY_OK:
        assert len(oracle) > 0, f"{pq.name}: vacuous (0 oracle rows) at {SF_DIR}"


def test_pending_registered_and_evidenced(spark):
    """Round-8 completed the module's activation: the 8 round-7 window
    queries (R10_ACTIVATED, evidenced r07) plus the 23 remainder
    (R10_REMAINDER, round-8 window positions 27-49). Rotation-safe
    membership assertions only — no window-position pins (the round-6
    lesson)."""
    from spotify_data_pipeline_spark.plans import all_queries
    from spotify_data_pipeline_spark.plans.active import R10_ACTIVATED, R10_REMAINDER

    qs = all_queries()
    assert R10_ACTIVATED == tuple(pq.name for pq in PENDING[:8])
    assert set(R10_ACTIVATED) | set(R10_REMAINDER) == {pq.name for pq in PENDING}
    for pq in PENDING:
        assert pq.name in qs and qs[pq.name].fn is pq.fn
        assert qs[pq.name].oracle == pq.oracle


def test_pending_names_unique_and_oracle_bearing():
    names = [pq.name for pq in PENDING]
    assert len(names) == len(set(names))
    assert all(pq.oracle for pq in PENDING)
    from spotify_data_pipeline_spark.plans.roundeight_pending import PENDING as P8
    from spotify_data_pipeline_spark.plans.roundnine_pending import PENDING as P9
    from spotify_data_pipeline_spark.plans.roundseven_pending import PENDING as P7
    from spotify_data_pipeline_spark.plans.roundsix import PENDING as P6

    for earlier in (P6, P7, P8, P9):
        assert not set(names) & {pq.name for pq in earlier}


# broadcast-1-row patterns, documented at the call site
_BNLJ_OK = {
    # 1-row broadcast of the collected KM (t, n, d) array under the
    # per-row prefix folds (timepoint domain horizon-bounded <= 73)
    "events_survival_km",
    # 1-row broadcast global-totals aggregate onto the top-10 rows
    # (the tfidf/sim_cosine documented pattern)
    "ops_join_size_estimate",
    # 1-row broadcast max-date anchor (the events_trending precedent)
    "orders_aging_report",
    # broadcast evaluation-batch crossJoin over the corpus scan (the
    # sim_cosine_topk / sim_quantized_topk documented pattern)
    "ml_knn_label",
    # 1-row aggregates assembled by broadcast cross join (triangle
    # count's documented pattern + the 1-row wedge total)
    "graph_clustering_coefficient",
    # 1-row broadcast revenue total onto the part frame (the
    # ops_join_size_estimate documented pattern)
    "orders_abc_classification",
    # 1-row broadcast edge-count aggregate m under the q_num atoms
    # (operators/community.modularity_atoms)
    "graph_brand_modularity",
}


def test_plans_no_nested_loop(spark):
    for pq in PENDING:
        if pq.name in _BNLJ_OK:
            continue
        plan = pq.fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan, pq.name
        assert "CartesianProduct" not in plan, pq.name


def test_alert_suppression_vs_python_replay(spark):
    """The fold equals an independent Python replay of the
    emit-then-cooldown rule over the raw parquet."""
    import pandas as pd

    from spotify_data_pipeline_spark.plans.roundten_pending import (
        _COOLDOWN_US,
        events_alert_suppression_query,
    )

    got = {
        r.user_id: (r.n_errors, r.pages_sent, r.suppressed, r.last_page_us)
        for r in events_alert_suppression_query(spark, SF_DIR).collect()
    }
    df = pd.read_parquet(f"{SF_DIR}/events.parquet")
    df = df[df.event_type == "error"]
    expect = {}
    for uid, grp in df.groupby("user_id"):
        evs = sorted(
            (int(pd.Timestamp(t).value // 1000), int(e))
            for t, e in zip(grp.ts, grp.event_id)
        )
        emt = sup = 0
        last = -(10**18)
        for us, _ in evs:
            if us - last >= _COOLDOWN_US:
                emt += 1
                last = us
            else:
                sup += 1
        expect[int(uid)] = (len(evs), emt, sup, last)
    assert got == expect
    # the rule actually bites at this SF: someone suppressed something
    assert any(s for _, _, s, _ in got.values())


def test_runs_test_identity(spark):
    """n_runs is between 1 and n_up+n_down, and equals 1 + number of
    sign alternations (the defining identity)."""
    from spotify_data_pipeline_spark.plans.roundten_pending import (
        agg_runs_test_query,
    )

    rows = agg_runs_test_query(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_runs <= r.n_up + r.n_down


def test_mixture_budget_sums_exactly(spark):
    """Allocated target tokens sum EXACTLY to the budget, zero-weight
    sources get explicit zero rows, and epochs_x1000 is the exact
    integer ratio."""
    from spotify_data_pipeline_spark.plans.roundten_pending import (
        _MIX_BUDGET,
        _MIX_WEIGHTS,
        llm_mixture_epochs_query,
    )

    rows = llm_mixture_epochs_query(spark, SF_DIR).collect()
    assert sum(r.target_tokens for r in rows) == _MIX_BUDGET
    weighted = {r.source for r in rows if r.weight > 0}
    assert weighted == set(_MIX_WEIGHTS)
    zero = [r for r in rows if r.weight == 0]
    assert zero and all(r.target_tokens == 0 for r in zero)
    for r in rows:
        assert r.epochs_x1000 == (r.target_tokens * 1000) // r.available


def test_duckdb_list_reduce_copy_self_hazard_pinned():
    """Documents the NEW DuckDB 1.0.0 list_reduce hazard the alert
    oracle engineers around: when a result field returns the
    accumulator field VERBATIM in a branch (ELSE acc.last), grouped
    folds can pair results with the WRONG rows. The wrapped
    (greatest) form must be correct on the same input; the unwrapped
    form's failure is asserted IF it still reproduces — if a DuckDB
    upgrade fixes it, the xfail-style branch tells us the workaround
    can be retired."""
    import duckdb

    con = duckdb.connect()
    # the misalignment needs enough rows/groups to manifest (it does
    # NOT reproduce at sf0.001) — pin the repro to the sf0.01 fixture
    con.execute(
        "CREATE VIEW events AS SELECT * FROM"
        " '/root/testdata/sf0.01/events.parquet'"
    )
    base = """
      WITH lists AS (
        SELECT user_id,
               list({'emt': CAST(0 AS BIGINT), 'last': epoch_us(ts)}
                    ORDER BY ts, event_id) AS lst
        FROM events WHERE event_type='error' GROUP BY user_id
      )
      SELECT user_id, lst,
             list_reduce(list_prepend(
               {'emt': CAST(0 AS BIGINT),
                'last': CAST(-1000000000000000000 AS BIGINT)}, lst),
               (acc, e) -> {
                 'emt': acc.emt + CASE WHEN e.last - acc.last >= 14400000000
                                       THEN 1 ELSE 0 END,
                 'last': %s}) AS s
      FROM lists
    """
    unwrapped = (
        "CASE WHEN e.last - acc.last >= 14400000000 THEN e.last ELSE acc.last END"
    )
    wrapped = f"greatest(acc.last, {unwrapped})"

    def misaligned(last_expr):
        nbad = 0
        for _, lst, s in con.execute(base % last_expr).fetchall():
            seq = [e["last"] for e in lst]
            emt, last = 0, -(10**18)
            for us in seq:
                if us - last >= 14_400_000_000:
                    emt += 1
                    last = us
            if (s["emt"], s["last"]) != (emt, last):
                nbad += 1
        return nbad

    assert misaligned(wrapped) == 0, "the workaround form must be correct"
    if misaligned(unwrapped) == 0:
        import warnings

        warnings.warn(
            "DuckDB no longer reproduces the list_reduce copy-self "
            "hazard — the greatest() workaround can be retired"
        )


def test_km_survival_invariants(spark):
    """S is non-increasing, starts <= 1e6, risk sets telescope
    (n_{t+1} = n_t - d_t - c_t over observed timepoints), both event
    and censoring branches are exercised, and S equals an independent
    Python fold."""
    from spotify_data_pipeline_spark.plans.roundten_pending import (
        events_survival_km_query,
    )

    rows = events_survival_km_query(spark, SF_DIR).collect()
    assert rows
    assert any(r.d_events > 0 for r in rows)
    assert any(r.c_censored > 0 for r in rows), "censoring vacuous at this SF"
    s_prev, n_expected = 1_000_000, None
    s = 1_000_000
    for r in rows:
        if n_expected is not None:
            assert r.n_at_risk == n_expected
        n_expected = r.n_at_risk - r.d_events - r.c_censored
        s = (s * (r.n_at_risk - r.d_events)) // r.n_at_risk
        assert r.s_ppm == s
        assert r.s_ppm <= s_prev
        s_prev = r.s_ppm
    assert n_expected == 0  # everyone leaves by the horizon


def test_skyline_is_maximal_antichain(spark):
    """No skyline point dominates another, and every non-skyline part
    is dominated by some skyline point (correctness of the set-based
    form vs the definition, checked directly)."""
    from spotify_data_pipeline_spark.plans.roundten_pending import (
        part_skyline_query,
    )
    from pyspark.sql import functions as F
    from spotify_data_pipeline_spark.io import load_table

    sky = [
        (r.price_cents, r.size)
        for r in part_skyline_query(spark, SF_DIR).collect()
    ]
    assert sky
    for i, (p1, s1) in enumerate(sky):
        for j, (p2, s2) in enumerate(sky):
            if i != j:
                assert not (
                    p2 <= p1 and s2 >= s1 and (p2 < p1 or s2 > s1)
                ), "skyline point dominated"
    allpts = [
        (int(r.price_cents), int(r.size))
        for r in load_table(spark, SF_DIR, "part")
        .select(
            F.expr("CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)").alias(
                "price_cents"
            ),
            F.col("p_size").cast("long").alias("size"),
        )
        .collect()
    ]
    skyset = set(sky)
    for p, s in allpts:
        if (p, s) not in skyset:
            assert any(
                q <= p and t >= s and (q < p or t > s) for q, t in sky
            ), f"non-skyline point ({p},{s}) not dominated"


def test_seasonal_decomposition_is_additive(spark):
    """x = trend + seasonal + residual on every emitted row, and the
    seasonal component is constant per day-of-week."""
    from spotify_data_pipeline_spark.plans.roundten_pending import (
        orders_seasonal_decompose_query,
    )

    rows = orders_seasonal_decompose_query(spark, SF_DIR).collect()
    assert rows
    seasonal_by_dow: dict = {}
    for r in rows:
        assert r.revenue_dollars == r.trend + r.seasonal + r.residual
        dow = r.day.weekday()
        seasonal_by_dow.setdefault(dow, set()).add(r.seasonal)
    assert all(len(v) == 1 for v in seasonal_by_dow.values())


def test_hierarchical_allocation_conserves_at_both_levels(spark):
    """Leaf allocations sum exactly to each nation's budget; nation
    budgets sum exactly to the global budget — the composed quota
    property naive two-level rounding loses twice."""
    from spotify_data_pipeline_spark.plans.roundten_pending import (
        _HIER_BUDGET,
        agg_hierarchical_allocation_query,
    )

    rows = agg_hierarchical_allocation_query(spark, SF_DIR).collect()
    assert rows
    by_nation: dict = {}
    for r in rows:
        by_nation.setdefault(r.c_nationkey, [0, r.nation_budget])
        by_nation[r.c_nationkey][0] += r.leaf_alloc
        assert by_nation[r.c_nationkey][1] == r.nation_budget
    assert all(leaf == budget for leaf, budget in by_nation.values())
    assert sum(b for _, b in by_nation.values()) == _HIER_BUDGET


def test_changepoint_equals_exact_rational_argmax(spark):
    """The float64 score argmax equals the EXACT rational argmax
    (fractions.Fraction over the same integer atoms) — if IEEE
    rounding ever flipped the winner at this SF, this catches it.
    Also pins the split's defining property: it beats every other
    split under the exact objective."""
    from fractions import Fraction

    import pandas as pd

    from spotify_data_pipeline_spark.plans.roundten_pending import (
        orders_changepoint_day_query,
    )

    r = orders_changepoint_day_query(spark, SF_DIR).collect()
    assert len(r) == 1
    r = r[0]
    df = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    # Spark round() is HALF_UP; pandas .round() is half-even — model
    # the engine's convention, not numpy's
    from decimal import ROUND_HALF_UP, Decimal

    half_up = df.o_totalprice.map(
        lambda v: int(Decimal(repr(v)).quantize(Decimal(1), ROUND_HALF_UP))
    )
    daily = sorted(
        (pd.Timestamp(day).date(), int(g))
        for day, g in half_up.groupby(df.o_orderdate.dt.date).sum().items()
    )
    total = sum(d for _, d in daily)
    t = len(daily)
    best_day, best_f, s1 = None, None, 0
    for i, (day, d) in enumerate(daily[:-1], start=1):
        s1 += d
        s2 = total - s1
        f = Fraction(s1 * s1, i) + Fraction(s2 * s2, t - i)
        if best_f is None or f > best_f:
            best_day, best_f = (day, i, s1), f
    day, i, s1 = best_day
    assert r.split_day.date() == day
    assert (r.n_days_before, r.n_days_after) == (i, t - i)
    assert (r.dollars_before, r.dollars_after) == (s1, total - s1)
    assert (r.mean_before, r.mean_after) == (s1 // i, (total - s1) // (t - i))


def test_kn_continuation_vs_python_model(spark):
    """Top-50 continuation rows equal an independent Python model over
    the raw corpus, and the KN signature holds somewhere: a term with
    high raw start-frequency but strictly fewer left CONTEXT TYPES
    than some rarer term exists (frequency and continuation order
    genuinely differ on this corpus — the statistic is not vacuously
    proportional to frequency)."""
    import pandas as pd

    from spotify_data_pipeline_spark.plans.roundten_pending import (
        text_kn_continuation_query,
    )

    got = [
        (r.term, r.n_left_types, r.n_right_types, r.freq_starts)
        for r in text_kn_continuation_query(spark, SF_DIR).collect()
    ]
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    left, right, starts = {}, {}, {}
    for text in docs.text:
        toks = " ".join(str(text).split()).lower().split()
        if len(toks) < 2:
            continue
        for a, b in zip(toks, toks[1:]):
            left.setdefault(b, set()).add(a)
            right.setdefault(a, set()).add(b)
            starts[a] = starts.get(a, 0) + 1
    vocab = set(left) | set(right)
    expect = sorted(
        (
            (w, len(left.get(w, ())), len(right.get(w, ())), starts.get(w, 0))
            for w in vocab
        ),
        key=lambda x: (-x[1], x[0]),
    )[:50]
    assert got == expect
    # Non-vacuity, scoped to what this corpus can show: the synthetic
    # vocabulary is ~31 near-uniformly-mixed tokens (measured), so the
    # classic 'francisco' frequency-vs-continuation INVERSION cannot
    # occur here — that would be a faked assertion. What is real: the
    # continuation counts genuinely vary across the vocabulary (the
    # rare token follows far fewer context types than the mixed bulk),
    # so the statistic is not a constant of the corpus.
    assert len({lt for _, lt, _, _ in expect}) >= 2
    assert len({s for _, _, _, s in expect}) >= 2


def test_chisq_independence_marginals_and_closed_form(spark):
    """Row totals, column totals, and the grand total are mutually
    consistent, and every cell equals the closed form computed with
    exact Python ints."""
    from spotify_data_pipeline_spark.plans.roundten_pending import (
        events_chisq_independence_query,
    )

    rows = events_chisq_independence_query(spark, SF_DIR).collect()
    assert rows
    n = sum(r.n_obs for r in rows)
    by_type: dict = {}
    by_dow: dict = {}
    for r in rows:
        by_type[r.event_type] = by_type.get(r.event_type, 0) + r.n_obs
        by_dow[r.dow] = by_dow.get(r.dow, 0) + r.n_obs
    for r in rows:
        assert by_type[r.event_type] == r.row_total
        assert by_dow[r.dow] == r.col_total
        dev = n * r.n_obs - r.row_total * r.col_total
        assert r.chi2_cell_x1e6 == (dev * dev * 1_000_000) // (
            n * r.row_total * r.col_total
        )
    assert set(by_dow) <= set(range(7))


def test_bitmap_distinct_words_nonneg_and_python_model(spark):
    """Every emitted count equals an independent Python distinct
    count; word bitmaps never set the sign bit (the 63-bit word
    design's invariant — both engines fault or sign-flip on 1<<63);
    and the bitmap path is genuinely merged (some month has more
    distinct users than any single day contributes — the rollup is
    not a rename of the daily numbers)."""
    import pandas as pd

    from spotify_data_pipeline_spark.plans.roundten_pending import (
        agg_bitmap_distinct_query,
    )

    rows = agg_bitmap_distinct_query(spark, SF_DIR).collect()
    assert rows
    df = pd.read_parquet(f"{SF_DIR}/events.parquet")
    df["month"] = df.ts.dt.to_period("M").dt.to_timestamp()
    expect = {
        (t, pd.Timestamp(m)): (g.user_id.nunique(), (g.user_id // 63).nunique())
        for (t, m), g in df.groupby(["event_type", "month"])
    }
    got = {
        (r.event_type, pd.Timestamp(r.month)): (r.n_distinct_users, r.n_words)
        for r in rows
    }
    assert got == expect
    daily_max = (
        df.groupby(["event_type", df.ts.dt.date]).user_id.nunique().groupby(
            level=0
        ).max()
    )
    monthly_max = df.groupby(["event_type", "month"]).user_id.nunique().groupby(
        level=0
    ).max()
    assert any(monthly_max[t] > daily_max[t] for t in monthly_max.index)


def test_twap_vs_python_model_and_differs_from_mean(spark):
    """TWAP equals an independent Python LOCF fold over the raw
    events, and for some user it genuinely differs from the plain
    (unweighted) mean — the duration weighting is load-bearing, not
    a re-derivation of AVG."""
    import pandas as pd
    from decimal import ROUND_HALF_UP, Decimal

    from spotify_data_pipeline_spark.plans.roundten_pending import (
        events_twap_query,
    )

    got = {
        r.user_id: (r.n_events, r.span_us, r.twap_cents)
        for r in events_twap_query(spark, SF_DIR).collect()
    }
    df = pd.read_parquet(f"{SF_DIR}/events.parquet")
    expect = {}
    differs = False
    for uid, grp in df.groupby("user_id"):
        evs = sorted(
            (
                int(pd.Timestamp(t).value // 1000),
                int(e),
                int(
                    Decimal(repr(v * 100)).quantize(
                        Decimal(1), ROUND_HALF_UP
                    )
                ),
            )
            for t, e, v in zip(grp.ts, grp.event_id, grp.value)
        )
        if len(evs) < 2:
            continue
        num = den = 0
        for (us, _, c), (nxt, _, _) in zip(evs, evs[1:]):
            num += c * (nxt - us)
            den += nxt - us
        expect[int(uid)] = (len(evs), den, num // den)
        plain_mean = sum(c for _, _, c in evs) // len(evs)
        if abs(num // den - plain_mean) > 1:
            differs = True
    assert got == expect
    assert differs


def test_join_size_estimate_matches_executed_join(spark):
    """The histogram's predicted self-join cardinality equals the
    ACTUAL row count of the executed lineitem self-join on l_partkey
    — prediction pinned against reality, not against another formula.
    Shares sum to <= 1e6 ppm and top-10 ordering is by pair count."""
    from spotify_data_pipeline_spark.io import load_table
    from spotify_data_pipeline_spark.plans.roundten_pending import (
        ops_join_size_estimate_query,
    )

    rows = ops_join_size_estimate_query(spark, SF_DIR).collect()
    assert len(rows) == 10
    li = load_table(spark, SF_DIR, "lineitem").select("l_partkey")
    actual = li.alias("a").join(li.alias("b"), on="l_partkey").count()
    assert rows[0].total_join_rows == actual
    assert all(r.total_join_rows == rows[0].total_join_rows for r in rows)
    pairs = [r.pair_rows for r in rows]
    assert pairs == sorted(pairs, reverse=True)
    for r in rows:
        assert r.share_ppm == r.pair_rows * 1_000_000 // r.total_join_rows
        assert r.pair_rows == r.n_rows * r.n_rows


def test_l_diversity_vs_python_and_distribution_shape(spark):
    """The l distribution equals an independent Python groupby over
    the joined release table; the measured minimum l is pinned (2 on
    this synthetic data — if testdata ever changes enough to produce
    a homogeneous group, this surfaces it); l never exceeds the
    5-value sensitive domain; shares sum to <= 1e6 ppm."""
    import math

    import pandas as pd

    from spotify_data_pipeline_spark.plans.roundten_pending import (
        privacy_l_diversity_query,
    )

    rows = privacy_l_diversity_query(spark, SF_DIR).collect()
    got = {r.l: (r.n_groups, r.n_rows, r.share_ppm) for r in rows}
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cust["bal_band"] = (cust.c_acctbal / 1000).map(math.floor)
    rel = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    g = rel.groupby(["c_nationkey", "c_mktsegment", "bal_band"]).agg(
        n=("o_orderpriority", "size"), l=("o_orderpriority", "nunique")
    )
    dist: dict = {}
    for _, r in g.iterrows():
        ng, nr = dist.get(int(r.l), (0, 0))
        dist[int(r.l)] = (ng + 1, nr + int(r.n))
    total = sum(nr for _, nr in dist.values())
    expect = {
        l: (ng, nr, nr * 1_000_000 // total) for l, (ng, nr) in dist.items()
    }
    assert got == expect
    assert min(got) >= 2, "testdata now has homogeneous groups — revisit"
    assert max(got) <= 5
    assert len(got) >= 2  # the distribution genuinely varies
    assert sum(s for _, _, s in got.values()) <= 1_000_000


def test_decision_stump_rank1_minimizes_error(spark):
    """The rank-1 feature's error count really is the minimum of the
    three (independent Python recount), every feature saw every
    order, and error_ppm is the exact integer ratio."""
    import pandas as pd

    from spotify_data_pipeline_spark.plans.roundten_pending import (
        _STUMP_THRESHOLD,
        ml_decision_stump_query,
    )

    rows = ml_decision_stump_query(spark, SF_DIR).collect()
    assert [r.rank for r in rows] == [1, 2, 3]
    df = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    df["hi"] = (df.o_totalprice >= _STUMP_THRESHOLD).astype(int)
    feats = {
        "priority": df.o_orderpriority,
        "status": df.o_orderstatus,
        # pandas dayofweek is 0=Monday; Spark-minus-1 is 0=Sunday
        "dow": ((df.o_orderdate.dt.dayofweek + 1) % 7).astype(str),
    }
    expect_err = {}
    for name, col in feats.items():
        g = df.groupby(col).hi.agg(["size", "sum"])
        expect_err[name] = int((g["size"] - g["sum"]).combine(g["sum"], min).sum())
    for r in rows:
        assert r.n_errors == expect_err[r.feature]
        assert r.error_ppm == r.n_errors * 1_000_000 // len(df)
    best = min(expect_err.items(), key=lambda kv: (kv[1], kv[0]))[0]
    assert rows[0].feature == best


def test_crosscorrelation_vs_python_model(spark):
    """All seven lags' Pearson atoms equal an independent Python
    model, and the mirror identity holds: the pair count at lag -k
    equals the pair count at +k (the day-pair sets are mirrors)."""
    import pandas as pd

    from spotify_data_pipeline_spark.plans.roundten_pending import (
        agg_crosscorrelation_query,
    )

    rows = {r.lag: r for r in agg_crosscorrelation_query(spark, SF_DIR).collect()}
    assert set(rows) == set(range(-3, 4))
    df = pd.read_parquet(f"{SF_DIR}/events.parquet")
    df["day"] = df.ts.dt.date
    daily = df.groupby("day").event_type.agg(
        x=lambda s: int((s == "purchase").sum()),
        y=lambda s: int((s == "error").sum()),
    )
    series = {d: (int(r.x), int(r.y)) for d, r in daily.iterrows()}
    import datetime

    for lag in range(-3, 4):
        n = sx = sy = sxy = sxx = syy = 0
        for d, (x, _) in series.items():
            m = d + datetime.timedelta(days=lag)
            if m in series:
                y = series[m][1]
                n += 1
                sx += x
                sy += y
                sxy += x * y
                sxx += x * x
                syy += y * y
        r = rows[lag]
        assert (r.n, r.sx, r.sy, r.sxy, r.sxx, r.syy) == (
            n,
            sx,
            sy,
            sxy,
            sxx,
            syy,
        )
        assert rows[lag].n == rows[-lag].n


def test_reconciliation_accounts_for_every_order_and_line(spark):
    """Categories partition the full outer join exactly: n_orders
    sums to |orders| + |orphan line-groups|; the no_lines category is
    genuinely populated (the orphan-order finding is real at this
    SF); category names parse back to consistent digit counts."""
    import pandas as pd

    from spotify_data_pipeline_spark.plans.roundten_pending import (
        dq_order_reconciliation_query,
    )

    rows = dq_order_reconciliation_query(spark, SF_DIR).collect()
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    orphan_groups = len(
        set(li.l_orderkey.unique()) - set(orders.o_orderkey.unique())
    )
    assert sum(r.n_orders for r in rows) == len(orders) + orphan_groups
    cats = {r.category: r for r in rows}
    assert "no_lines" in cats and cats["no_lines"].n_orders > 0
    assert cats["no_lines"].abs_diff_cents == 0
    for r in rows:
        if r.category.startswith("diff_digits_"):
            d = int(r.category.removeprefix("diff_digits_"))
            assert r.abs_diff_cents > 0
            # every member's |diff| has d digits, so the SUM has at
            # least d digits and at most d + count-digits
            assert len(str(r.abs_diff_cents)) >= d


def test_aging_report_brackets_partition_open_orders(spark):
    """All four brackets appear (measured non-vacuous), bracket
    boundaries are respected via oldest_days, counts sum to the open
    order count, and value shares sum to <= 1e6."""
    import pandas as pd

    from spotify_data_pipeline_spark.plans.roundten_pending import (
        orders_aging_report_query,
    )

    rows = orders_aging_report_query(spark, SF_DIR).collect()
    assert [r.age_bucket for r in rows] == [
        "1:0-30d",
        "2:31-90d",
        "3:91-365d",
        "4:365d+",
    ]
    limits = {"1:0-30d": 30, "2:31-90d": 90, "3:91-365d": 365}
    for r in rows:
        if r.age_bucket in limits:
            assert r.oldest_days <= limits[r.age_bucket]
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    assert sum(r.n_orders for r in rows) == int(
        (orders.o_orderstatus == "O").sum()
    )
    assert sum(r.value_share_ppm for r in rows) <= 1_000_000


def test_degree_histogram_buckets_and_totals(spark):
    """Bucket boundaries hold (2^(b-1) <= degree < 2^b), customer and
    edge totals reconcile with the distinct-edge set, and the
    histogram is non-trivial (>= 2 buckets)."""
    import pandas as pd

    from spotify_data_pipeline_spark.plans.roundten_pending import (
        graph_degree_histogram_query,
    )

    rows = graph_degree_histogram_query(spark, SF_DIR).collect()
    assert len(rows) >= 2
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")[
        ["o_orderkey", "o_custkey"]
    ]
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")[
        ["l_orderkey", "l_suppkey"]
    ]
    edges = (
        orders.merge(li, left_on="o_orderkey", right_on="l_orderkey")[
            ["o_custkey", "l_suppkey"]
        ]
        .drop_duplicates()
    )
    deg = edges.groupby("o_custkey").size()
    assert sum(r.n_customers for r in rows) == len(deg)
    assert sum(r.n_edges for r in rows) == len(edges)
    for r in rows:
        b = r.log2_bucket
        assert 2 ** (b - 1) <= r.min_degree <= r.max_degree < 2**b


def test_ab_srm_covers_all_users_and_cells_exact(spark):
    """Both arms exist, user counts sum to the distinct-user total,
    and each chi-square cell equals its closed form."""
    from spotify_data_pipeline_spark.plans.roundten_pending import (
        events_ab_srm_query,
    )
    from spotify_data_pipeline_spark.io import load_table

    rows = events_ab_srm_query(spark, SF_DIR).collect()
    assert {r.arm for r in rows} == {0, 1}
    total = sum(r.n_users for r in rows)
    n_users = load_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    assert total == n_users
    for r in rows:
        assert r.chi2_cell_x1e6 == ((2 * r.n_users - total) ** 2 * 1_000_000) // (
            2 * total
        )


def test_minhash_estimate_tracks_exact_jaccard(spark):
    """The md5-minhash match-count estimate tracks the EXACT shingle
    Jaccard: per candidate pair |est - exact| behaves like a 16-trial
    binomial (sigma <= 0.125), so the mean absolute error over all
    pairs is small; and a full signature match (16/16) only happens at
    high true Jaccard. Exact Jaccards recomputed independently in
    pandas from raw shingle sets."""
    import pandas as pd

    from spotify_data_pipeline_spark.plans.roundten_pending import (
        dedup_minhash_estimate_query,
    )

    est = dedup_minhash_estimate_query(spark, SF_DIR).toPandas()
    assert len(est) > 0

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")[["doc_id", "text"]]

    def shingle_set(text):
        toks = " ".join(text.strip().split()).lower().split(" ")
        if len(toks) >= 3:
            return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
        return {" ".join(toks)} if toks != [""] else set()

    sets = {r.doc_id: shingle_set(r.text) for r in docs.itertuples()}
    errs = []
    for r in est.itertuples():
        sa, sb = sets[r.id_a], sets[r.id_b]
        exact = len(sa & sb) / len(sa | sb)
        errs.append(abs(r.est_jaccard_ppm / 1e6 - exact))
        if r.sig_matches == 16:
            assert exact >= 0.5, (r.id_a, r.id_b, exact)
    assert sum(errs) / len(errs) < 0.15, sum(errs) / len(errs)


def test_simhash_md5_fingerprint_vs_python_model(spark):
    """Engine fingerprints equal an independent pure-Python md5
    bit-majority model for every doc appearing in the top-20 output."""
    import hashlib

    import pandas as pd

    from spotify_data_pipeline_spark.plans.roundten_pending import (
        _SH_BITS,
        dedup_simhash_md5_query,
    )

    out = dedup_simhash_md5_query(spark, SF_DIR).toPandas()
    assert len(out) > 0
    assert (out.hamming.values[:-1] <= out.hamming.values[1:]).all()

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")[["doc_id", "text"]]
    want = {r.id_a: r.fp_a for r in out.itertuples()}
    want.update({r.id_b: r.fp_b for r in out.itertuples()})

    def model_fp(text):
        toks = set(" ".join(text.strip().split()).lower().split(" ")) - {""}
        sums = [0] * _SH_BITS
        for t in toks:
            h = hashlib.md5(t.encode()).hexdigest()
            for j in range(_SH_BITS):
                v = int(h[j // 4], 16)
                bit = (v >> (j % 4)) & 1
                sums[j] += 2 * bit - 1
        return sum(1 << j for j in range(_SH_BITS) if sums[j] > 0)

    by_id = docs.set_index("doc_id").text
    for doc_id, fp in want.items():
        assert model_fp(by_id[doc_id]) == fp, doc_id


def test_knn_label_votes_structural(spark):
    """Every evaluation vector classified exactly once; votes in
    [1, 5]; the predicted label is a label that exists in training."""
    import pandas as pd

    from spotify_data_pipeline_spark.plans.roundten_pending import (
        ml_knn_label_query,
    )

    out = ml_knn_label_query(spark, SF_DIR).toPandas()
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")[["vec_id", "label"]]
    test_ids = set(emb.vec_id[emb.vec_id % 37 == 0])
    train_labels = set(emb.label[emb.vec_id % 37 != 0])
    assert set(out.vec_id) == test_ids
    assert out.n_votes.between(1, 5).all()
    assert set(out.pred_label) <= {int(x) for x in train_labels}


def test_clustering_coefficient_identities(spark):
    """3·T ≤ W (every triangle closes three wedges, each counted once
    per center), the ppm is the exact integer quotient, and the wedge
    count equals a pandas recount over the same canonical edges."""
    import pandas as pd

    from spotify_data_pipeline_spark.plans.roundten_pending import (
        graph_clustering_coefficient_query,
    )

    r = graph_clustering_coefficient_query(spark, SF_DIR).collect()[0]
    assert 3 * r.n_triangles <= r.n_wedges
    assert r.transitivity_ppm == (3 * r.n_triangles * 1_000_000) // r.n_wedges

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")[
        ["l_orderkey", "l_partkey", "l_shipdate"]
    ]
    li = li[
        (li.l_shipdate >= "1997-01-01") & (li.l_shipdate < "1997-07-01")
    ][["l_orderkey", "l_partkey"]].drop_duplicates()
    sizes = li.groupby("l_orderkey").size()
    li = li[li.l_orderkey.isin(sizes[(sizes >= 2) & (sizes <= 200)].index)]
    e = li.merge(li, on="l_orderkey")
    e = e[e.l_partkey_x < e.l_partkey_y][
        ["l_partkey_x", "l_partkey_y"]
    ].drop_duplicates()
    deg = pd.concat([e.l_partkey_x, e.l_partkey_y]).value_counts()
    assert r.n_edges == len(e)
    assert r.n_wedges == int((deg * (deg - 1) // 2).sum())


def test_abc_classes_partition_and_conserve(spark):
    """A/B/C partition the part frame, revenue conserves to the cent,
    and class A's cumulative share is ≤ 80% by construction."""
    import pandas as pd

    from spotify_data_pipeline_spark.plans.roundten_pending import (
        orders_abc_classification_query,
    )

    rows = {r.abc_class: r for r in orders_abc_classification_query(spark, SF_DIR).collect()}
    assert set(rows) == {"A", "B", "C"}
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")[
        ["l_partkey", "l_extendedprice", "l_discount"]
    ]
    import math

    cents = [
        math.floor(p * (1 - d) * 100 + 0.5)
        for p, d in zip(li.l_extendedprice, li.l_discount)
    ]
    li["c"] = cents
    per = li.groupby("l_partkey").c.sum()
    assert sum(r.n_parts for r in rows.values()) == len(per)
    tot = int(per.sum())
    assert sum(r.rev_cents for r in rows.values()) == tot
    assert rows["A"].rev_cents * 5 <= tot * 4 + 4  # boundary slack: last A part
    assert sum(r.rev_share_ppm for r in rows.values()) <= 1_000_000


def test_tukey_fences_vs_pandas(spark):
    """Quartiles and outlier counts equal an independent pandas
    recount using the same discrete order statistics."""
    import pandas as pd

    from spotify_data_pipeline_spark.plans.roundten_pending import (
        events_outlier_tukey_query,
    )

    got = {r.event_type: r for r in events_outlier_tukey_query(spark, SF_DIR).collect()}
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")[["event_type", "user_id"]]
    for et, grp in ev.groupby("event_type"):
        n = grp.groupby("user_id").size().sort_values(kind="stable").tolist()
        m = len(n)
        q1 = n[max(1, (m + 1) // 4) - 1]
        q3 = n[min(m, (3 * (m + 1)) // 4) - 1]
        hi = sum(1 for x in n if 2 * x > 2 * q3 + 3 * (q3 - q1))
        lo = sum(1 for x in n if 2 * x < 2 * q1 - 3 * (q3 - q1))
        r = got[et]
        assert (r.n_users, r.q1, r.q3, r.n_outliers_high, r.n_outliers_low) == (
            m, q1, q3, hi, lo,
        ), et


def test_assortativity_atoms_vs_pandas(spark):
    """All six Pearson atoms equal an exact pandas/Python-int recount."""
    import pandas as pd

    from spotify_data_pipeline_spark.plans.roundten_pending import (
        graph_assortativity_query,
    )

    r = graph_assortativity_query(spark, SF_DIR).collect()[0]
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")[["o_orderkey", "o_custkey"]]
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")[["l_orderkey", "l_suppkey"]]
    e = orders.merge(li, left_on="o_orderkey", right_on="l_orderkey")[
        ["o_custkey", "l_suppkey"]
    ].drop_duplicates()
    dc = e.groupby("o_custkey").size()
    ds = e.groupby("l_suppkey").size()
    xs = [int(dc[c]) for c in e.o_custkey]
    ys = [int(ds[s]) for s in e.l_suppkey]
    n = len(e)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    assert (r.n_edges, r.sum_x, r.sum_y) == (n, sx, sy)
    assert r.cov_num == n * sxy - sx * sy
    assert r.var_x_num == n * sxx - sx * sx
    assert r.var_y_num == n * syy - sy * sy


def test_basket_frontier_downward_closed(spark):
    """Both levels present in the declared surface, L3 supports never
    exceed their sub-pair supports, and levels are canonical."""
    from spotify_data_pipeline_spark.plans.roundten_pending import (
        orders_basket_triples_query,
    )

    rows = orders_basket_triples_query(spark, SF_DIR).collect()
    pairs = {(r.p1, r.p2): r.support for r in rows if r.level == 2}
    triples = [r for r in rows if r.level == 3]
    assert pairs and triples  # both levels populated at sf0.001
    for r in triples:
        assert r.p1 < r.p2 < r.p3
        for sub in ((r.p1, r.p2), (r.p1, r.p3), (r.p2, r.p3)):
            assert pairs.get(sub, 0) >= r.support


def test_brand_modularity_identities(spark):
    """Σ degree_sum = 2m (every part has a brand), Σ intra <= m, and
    q_num matches its own atoms row by row."""
    from spotify_data_pipeline_spark.plans.roundten_pending import (
        graph_brand_modularity_query,
    )

    rows = graph_brand_modularity_query(spark, SF_DIR).collect()
    m = rows[0].n_edges
    assert sum(r.degree_sum for r in rows) == 2 * m
    assert sum(r.intra_edges for r in rows) <= m
    for r in rows:
        assert r.q_num == 4 * m * r.intra_edges - r.degree_sum**2


def test_weighted_median_defining_property(spark):
    """For each flag: weight strictly below the median < half the
    total, and weight at-or-below >= half (the discrete weighted
    median's defining inequalities), recounted in pandas."""
    import math

    import pandas as pd

    from spotify_data_pipeline_spark.plans.roundten_pending import (
        lineitem_weighted_median_query,
    )

    got = {
        r.l_returnflag: r
        for r in lineitem_weighted_median_query(spark, SF_DIR).collect()
    }
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")[
        ["l_returnflag", "l_extendedprice", "l_quantity"]
    ]
    li["cents"] = [
        math.floor(p * 100 + 0.5) for p in li.l_extendedprice
    ]
    li["w"] = li.l_quantity.astype(int)
    for flag, grp in li.groupby("l_returnflag"):
        r = got[flag]
        W = int(grp.w.sum())
        assert r.total_weight == W
        below = int(grp.w[grp.cents < r.w_median_cents].sum())
        at_or_below = int(grp.w[grp.cents <= r.w_median_cents].sum())
        assert 2 * below < W <= 2 * at_or_below
