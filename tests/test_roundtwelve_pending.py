"""Round-12 staged queries (plans/roundtwelve_pending.py) get the SAME
driver-shaped oracle check as declared queries — activation later is
registration-only (after the evidence-hash refresh)."""

from __future__ import annotations

import os

import pytest

from spotify_data_pipeline_spark.plans.roundtwelve_pending import PENDING
from tests.oracle_check import compare, run_oracle

SF_DIR = os.environ.get("ORACLE_SF", "/root/testdata/sf0.001")


@pytest.mark.parametrize("pq", PENDING, ids=lambda pq: pq.name)
def test_pending_oracle_match(spark, pq):
    result = pq.fn(spark, SF_DIR)
    oracle = run_oracle(pq.oracle, SF_DIR)
    errs = compare(result, oracle)
    assert not errs, f"{pq.name}: " + "; ".join(errs)
    assert len(oracle) > 0, f"{pq.name}: vacuous (0 oracle rows) at {SF_DIR}"


def test_pending_fully_registered(spark):
    """Round-8 activated 4 of 14 (plans/active.py _R12_ACTIVE, window
    positions 23-26); round 9 activated the 10 remainder (window
    positions 40-49, declared BEFORE the 4 evidenced siblings so those
    keep their r08 pins at tail 50-53) — the whole module is now
    registered and the shared-staging-file freeze is dissolved
    (VERDICT r08 item 2). Membership-only assertions (rotation-safe)."""
    from spotify_data_pipeline_spark.plans import all_queries
    from spotify_data_pipeline_spark.plans.active import (
        R12_ACTIVATED,
        R12_REMAINDER,
    )

    qs = all_queries()
    assert set(R12_ACTIVATED) | set(R12_REMAINDER) == {pq.name for pq in PENDING}
    assert not set(R12_ACTIVATED) & set(R12_REMAINDER)
    for pq in PENDING:
        assert pq.name in qs and qs[pq.name].fn is pq.fn
        assert qs[pq.name].oracle == pq.oracle


def test_pending_names_unique_and_oracle_bearing():
    names = [pq.name for pq in PENDING]
    assert len(names) == len(set(names))
    assert all(pq.oracle for pq in PENDING)
    from spotify_data_pipeline_spark.plans.roundeight_pending import PENDING as P8
    from spotify_data_pipeline_spark.plans.roundeleven_pending import (
        PENDING as P11,
    )
    from spotify_data_pipeline_spark.plans.roundnine_pending import PENDING as P9
    from spotify_data_pipeline_spark.plans.roundseven_pending import PENDING as P7
    from spotify_data_pipeline_spark.plans.roundsix import PENDING as P6
    from spotify_data_pipeline_spark.plans.roundten_pending import PENDING as P10

    for earlier in (P6, P7, P8, P9, P10, P11):
        assert not set(names) & {pq.name for pq in earlier}


# broadcast-1-row patterns, documented at the call site
_BNLJ_OK: set[str] = {
    # three 1-row aggregates (fact stats x dim stats x key-hist max)
    # cross-joined per candidate join — the documented pattern
    "ops_join_strategy_advice",
    # bounded-literal broadcasts: 8-row centroid frame + 10-row query
    # set (the sim_ann_ivf_fixed / sim_cosine_topk anchors) + 1-row
    # hit/total aggregates assembled into each recall row
    "sim_ivf_recall",
    # same anchors, LSH branch: 10-row query broadcast + 1-row
    # hit/total aggregates per recall row
    "sim_lsh_recall",
    # 1-row broadcast max-date anchor (trending/aging precedent)
    "events_decayed_topk",
}


def test_plans_no_nested_loop(spark):
    for pq in PENDING:
        if pq.name in _BNLJ_OK:
            continue
        plan = pq.fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan, pq.name
        assert "CartesianProduct" not in plan, pq.name


def test_bootstrap_matches_python_model(spark):
    """Every replicate's (n_eff, sum_cents) equals an independent
    Python hashlib recomputation of the deterministic Poisson draw —
    the engine-free third route."""
    import hashlib
    import math

    import pandas as pd

    from spotify_data_pipeline_spark.plans.roundtwelve_pending import (
        _BOOT_B,
        _POIS_T,
        agg_bootstrap_ci_query,
    )

    got = {
        r.replicate: (r.n_eff, r.sum_cents)
        for r in agg_bootstrap_ci_query(spark, SF_DIR).collect()
    }
    assert set(got) == set(range(_BOOT_B))
    ords = pd.read_parquet(f"{SF_DIR}/orders.parquet")[
        ["o_orderkey", "o_totalprice"]
    ]
    expect = {b: [0, 0] for b in range(_BOOT_B)}
    for key, price in zip(ords.o_orderkey, ords.o_totalprice):
        cents = math.floor(price * 100 + 0.5)
        for b in range(_BOOT_B):
            h = hashlib.md5(f"{key}:{b}".encode()).hexdigest()
            u = int(h[:15], 16)
            m = 6
            for k, t in enumerate(_POIS_T):
                if u < t:
                    m = k
                    break
            expect[b][0] += m
            expect[b][1] += m * cents
    assert got == {b: (n, s) for b, (n, s) in expect.items()}


def test_bootstrap_resample_is_poisson_like(spark):
    """Sanity on the resampling distribution itself: mean n_eff over
    replicates lands within 4 sigma of n (Poisson(1) preserves the
    expected count), and not every replicate is identical (the
    degenerate-spreader guard)."""
    import pandas as pd

    from spotify_data_pipeline_spark.plans.roundtwelve_pending import (
        _BOOT_B,
        agg_bootstrap_ci_query,
    )

    rows = agg_bootstrap_ci_query(spark, SF_DIR).collect()
    n = len(pd.read_parquet(f"{SF_DIR}/orders.parquet"))
    mean_eff = sum(r.n_eff for r in rows) / _BOOT_B
    # Var(mean n_eff) = n / B  (sum of nB independent Poisson(1) / B)
    assert abs(mean_eff - n) < 4 * (n / _BOOT_B) ** 0.5
    assert len({r.n_eff for r in rows}) > 1
    assert len({r.sum_cents for r in rows}) > 1


def test_merge_categories_partition_orders(spark):
    """MERGE accounting: 'U' rows = |keys % 3 == 0|, 'N' rows =
    |keys % 5 == 0|, untouched statuses cover exactly the remaining
    target rows — the changeset replaced and appended what it said
    it would, nothing else."""
    import pandas as pd

    from spotify_data_pipeline_spark.plans.roundtwelve_pending import (
        etl_merge_upsert_query,
    )

    got = {r.status: r.n_rows for r in etl_merge_upsert_query(spark, SF_DIR).collect()}
    keys = pd.read_parquet(f"{SF_DIR}/orders.parquet")[["o_orderkey", "o_orderstatus"]]
    n_upd = int((keys.o_orderkey % 3 == 0).sum())
    n_ins = int((keys.o_orderkey % 5 == 0).sum())
    assert got["U"] == n_upd and got["N"] == n_ins
    untouched = keys[keys.o_orderkey % 3 != 0].o_orderstatus.value_counts()
    for status, n in untouched.items():
        assert got[status] == int(n)
    assert sum(got.values()) == len(keys) - n_upd + n_upd + n_ins


def test_feature_propagation_matches_pandas(spark):
    """Two-round sum propagation recounted with pandas exact ints —
    and the propagated feature genuinely differs from a direct
    per-segment balance aggregate (round 2 is load-bearing)."""
    import math

    import pandas as pd

    from spotify_data_pipeline_spark.plans.roundtwelve_pending import (
        graph_feature_propagation_query,
    )

    got = {
        r.segment: (r.n_customers, r.sum_f2, r.min_f2, r.max_f2)
        for r in graph_feature_propagation_query(spark, SF_DIR).collect()
    }
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")[["o_orderkey", "o_custkey"]]
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")[["l_orderkey", "l_suppkey"]]
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")[
        ["c_custkey", "c_mktsegment", "c_acctbal"]
    ]
    edges = (
        orders.merge(li, left_on="o_orderkey", right_on="l_orderkey")[
            ["o_custkey", "l_suppkey"]
        ]
        .drop_duplicates()
    )
    f0 = {
        int(r.c_custkey): math.floor(r.c_acctbal * 100 + 0.5)
        for r in cust.itertuples()
    }
    r1 = {}
    for r in edges.itertuples():
        r1[r.l_suppkey] = r1.get(r.l_suppkey, 0) + f0[r.o_custkey]
    f2 = {}
    for r in edges.itertuples():
        f2[r.o_custkey] = f2.get(r.o_custkey, 0) + r1[r.l_suppkey]
    seg = dict(zip(cust.c_custkey, cust.c_mktsegment))
    expect = {}
    for c, v in f2.items():
        s = seg[c]
        cur = expect.setdefault(s, [0, 0, None, None])
        cur[0] += 1
        cur[1] += v
        cur[2] = v if cur[2] is None else min(cur[2], v)
        cur[3] = v if cur[3] is None else max(cur[3], v)
    assert got == {s: tuple(v) for s, v in expect.items()}
    # round 2 is not a disguised round 0: propagated sums differ from
    # the per-segment direct balance sums
    direct = cust.groupby("c_mktsegment").c_acctbal.apply(
        lambda x: sum(math.floor(v * 100 + 0.5) for v in x)
    )
    assert any(got[s][1] != int(direct[s]) for s in got)


def test_join_advice_all_strategies_alive(spark):
    """The vacuousness guard applied to the advisor: all three
    decision branches fire on this data (supplier broadcasts,
    lineitem⋈orders stays plain SMJ, the share-skewed nation⋈region
    salts), and the salt factor agrees with a pandas recount of the
    hottest key."""
    import pandas as pd

    from spotify_data_pipeline_spark.plans.roundtwelve_pending import (
        ops_join_strategy_advice_query,
    )

    rows = {
        (r.fact_table, r.dim_table): r
        for r in ops_join_strategy_advice_query(spark, SF_DIR).collect()
    }
    assert rows[("lineitem", "supplier")].strategy == "broadcast"
    assert rows[("lineitem", "orders")].strategy == "smj"
    assert rows[("nation", "region")].strategy == "smj_salted"
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    mx = int(li.groupby("l_orderkey").size().max())
    r = rows[("lineitem", "orders")]
    assert r.max_key_rows == mx
    assert r.salt_factor == -(-(mx * 200) // len(li))


def test_ivf_recall_monotone_and_consistent(spark):
    """recall is monotone in nprobe, totals equal 10 queries x k, and
    the nprobe=3 row equals a recount from the DECLARED queries
    (sim_ann_ivf_fixed ∩ sim_cosine_topk) — the composition really is
    the composition."""
    from spotify_data_pipeline_spark.plans.roundtwelve_pending import (
        sim_ivf_recall_query,
    )
    from spotify_data_pipeline_spark.plans.similarity_queries import (
        sim_ann_ivf_fixed,
        sim_cosine_topk,
    )

    rows = sim_ivf_recall_query(spark, SF_DIR).collect()
    assert [r.nprobe for r in rows] == [1, 2, 3]
    assert all(r.n_brute == 50 for r in rows)
    assert all(0 <= r.n_hits <= r.n_brute for r in rows)
    recalls = [r.recall_ppm for r in rows]
    assert recalls == sorted(recalls)
    brute = {
        (r.query_id, r.neighbor_id)
        for r in sim_cosine_topk(spark, SF_DIR).collect()
    }
    ivf3 = {
        (r.query_id, r.neighbor_id)
        for r in sim_ann_ivf_fixed(spark, SF_DIR).collect()
    }
    assert rows[2].n_hits == len(brute & ivf3)


def test_ols_cramer_matches_fraction_model(spark):
    """The four determinants equal an exact Fraction/Python-int Cramer
    solve over pandas, and the implied betas reproduce numpy lstsq to
    float precision — the regression really is the regression."""
    import math
    from fractions import Fraction

    import numpy as np
    import pandas as pd

    from spotify_data_pipeline_spark.plans.roundtwelve_pending import (
        ml_ols_cramer_query,
    )

    row = ml_ols_cramer_query(spark, SF_DIR).collect()[0]
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")[
        ["l_quantity", "l_discount", "l_extendedprice"]
    ]
    x1 = [int(q) for q in li.l_quantity]
    x2 = [math.floor(d * 100 + 0.5) for d in li.l_discount]
    y = [math.floor(p * 100 + 0.5) for p in li.l_extendedprice]
    n = len(x1)
    s1, s2 = sum(x1), sum(x2)
    s11 = sum(a * a for a in x1)
    s12 = sum(a * b for a, b in zip(x1, x2))
    s22 = sum(b * b for b in x2)
    sy = sum(y)
    s1y = sum(a * c for a, c in zip(x1, y))
    s2y = sum(b * c for b, c in zip(x2, y))

    def det3(m):
        (a, b, c), (d, e, f), (g, h, i) = m
        return a * e * i - a * f * h - b * d * i + b * f * g + c * d * h - c * e * g

    S = [[n, s1, s2], [s1, s11, s12], [s2, s12, s22]]
    bv = [sy, s1y, s2y]
    det_s = det3(S)
    nums = []
    for j in range(3):
        M = [r.copy() for r in S]
        for r in range(3):
            M[r][j] = bv[r]
        nums.append(det3(M))
    assert row.n == n
    assert int(row.det_s) == det_s
    assert [int(row.num_b0), int(row.num_b1), int(row.num_b2)] == nums
    # betas agree with numpy least squares
    X = np.column_stack([np.ones(n), x1, x2])
    beta_np = np.linalg.lstsq(X, np.array(y, dtype=float), rcond=None)[0]
    beta_exact = [float(Fraction(v, det_s)) for v in nums]
    assert np.allclose(beta_exact, beta_np, rtol=1e-8)


def test_simpson_diversity_bounds_and_recount(spark):
    """Exact recount per day from pandas ints; ppm values in range;
    dominance >= 1/n_types share; the calendar is bounded."""
    import pandas as pd

    from spotify_data_pipeline_spark.plans.roundtwelve_pending import (
        events_simpson_diversity_query,
    )

    rows = events_simpson_diversity_query(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 31
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")[["ts", "event_type"]]
    ev["day"] = pd.to_datetime(ev.ts).dt.date
    for r in rows:
        grp = ev[ev.day.astype(str) == r.day].event_type.value_counts()
        n = int(grp.sum())
        assert r.n_events == n and r.n_types == len(grp)
        pairs = sum(int(c) * (int(c) - 1) for c in grp)
        if n > 1:
            assert r.simpson_ppm == pairs * 1_000_000 // (n * (n - 1))
        else:
            assert r.simpson_ppm is None
        assert r.dominance_ppm == int(grp.max()) * 1_000_000 // n
        assert r.dominance_ppm * r.n_types >= 1_000_000 - r.n_types


def test_cluster_bootstrap_matches_python_model(spark):
    """Per-replicate user-level multiplicities recomputed with hashlib
    over a pandas per-user rollup — and the replicates genuinely vary
    (the cluster resample is alive, not degenerate)."""
    import hashlib
    import math

    import pandas as pd

    from spotify_data_pipeline_spark.plans.roundtwelve_pending import (
        _BOOT_B,
        _POIS_T,
        events_bootstrap_user_mean_query,
    )

    got = {
        r.replicate: (r.n_users_eff, r.n_purchases_eff, r.sum_cents)
        for r in events_bootstrap_user_mean_query(spark, SF_DIR).collect()
    }
    assert set(got) == set(range(_BOOT_B))
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev = ev[ev.event_type == "purchase"][["user_id", "value"]]
    per_user = {}
    for r in ev.itertuples():
        k, c = per_user.get(r.user_id, (0, 0))
        per_user[r.user_id] = (k + 1, c + math.floor(r.value * 100 + 0.5))
    expect = {b: [0, 0, 0] for b in range(_BOOT_B)}
    for uid, (k, c) in per_user.items():
        for b in range(_BOOT_B):
            u = int(hashlib.md5(f"{uid}:{b}".encode()).hexdigest()[:15], 16)
            m = 6
            for kk, t in enumerate(_POIS_T):
                if u < t:
                    m = kk
                    break
            expect[b][0] += m
            expect[b][1] += m * k
            expect[b][2] += m * c
    assert got == {b: tuple(v) for b, v in expect.items()}
    assert len({v[2] for v in got.values()}) > 1


def test_ab_power_matches_fraction_model(spark):
    """n_req equals the exact ceil of the cross-multiplied rational
    computed with Python ints, and tracks the textbook float formula
    (2(z_a+z_b)^2 sigma^2/delta^2) within rounding."""
    import math

    import pandas as pd

    from spotify_data_pipeline_spark.plans.roundtwelve_pending import (
        _POWER_MDE_DIV,
        _POWER_Z_PPM,
        events_ab_power_query,
    )

    row = events_ab_power_query(spark, SF_DIR).collect()[0]
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev = ev[ev.event_type == "purchase"][["user_id", "value"]]
    xs = {}
    for r in ev.itertuples():
        xs[r.user_id] = xs.get(r.user_id, 0) + math.floor(r.value * 100 + 0.5)
    x = list(xs.values())
    n, s, ss = len(x), sum(x), sum(v * v for v in x)
    assert (row.n, row.s, row.ss) == (n, s, ss)
    z2 = _POWER_Z_PPM * _POWER_Z_PPM
    num = 2 * _POWER_MDE_DIV**2 * z2 * n * (n * ss - s * s)
    den = (n - 1) * s * s * 10**12
    n_req = -(-num // den)
    assert row.n_req == n_req
    assert row.sufficient == (1 if n >= n_req else 0)
    # float cross-check
    import statistics

    var = statistics.variance(x)
    mean = s / n
    approx = 2 * (2.801585**2) * var / (mean / 20) ** 2
    assert abs(n_req - approx) <= max(2, 0.01 * approx)


def test_lexical_richness_recount(spark):
    """Per-source recount with a pure-Python tokenizer; identities
    n_hapax <= n_types <= n_tokens hold; ratios are the exact floors."""
    import pandas as pd

    from spotify_data_pipeline_spark.plans.roundtwelve_pending import (
        text_lexical_richness_query,
    )

    got = {
        r.source: (r.n_tokens, r.n_types, r.n_hapax, r.ttr_ppm,
                   r.hapax_share_ppm)
        for r in text_lexical_richness_query(spark, SF_DIR).collect()
    }
    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")[["source", "text"]]
    counts: dict = {}
    for r in d.itertuples():
        if not r.text.strip():
            continue
        toks = " ".join(r.text.strip().split()).lower().split(" ")
        c = counts.setdefault(r.source, {})
        for t in toks:
            c[t] = c.get(t, 0) + 1
    expect = {}
    for src, c in counts.items():
        tok = sum(c.values())
        typ = len(c)
        hap = sum(1 for v in c.values() if v == 1)
        expect[src] = (tok, typ, hap, typ * 1_000_000 // tok,
                       hap * 1_000_000 // typ)
    assert got == expect
    for tok, typ, hap, *_ in got.values():
        assert hap <= typ <= tok


def test_lsh_recall_monotone_and_consistent(spark):
    """Nested table subsets make recall monotone BY CONSTRUCTION;
    totals equal 10 x k; the t=8 row equals a recount from the
    declared sim_ann_lsh ∩ sim_cosine_topk."""
    from spotify_data_pipeline_spark.plans.roundtwelve_pending import (
        sim_lsh_recall_query,
    )
    from spotify_data_pipeline_spark.plans.similarity_queries import (
        sim_ann_lsh,
        sim_cosine_topk,
    )

    rows = sim_lsh_recall_query(spark, SF_DIR).collect()
    assert [r.n_tables for r in rows] == [2, 4, 8]
    assert all(r.n_brute == 50 for r in rows)
    recalls = [r.recall_ppm for r in rows]
    assert recalls == sorted(recalls)
    brute = {
        (r.query_id, r.neighbor_id)
        for r in sim_cosine_topk(spark, SF_DIR).collect()
    }
    lsh8 = {
        (r.query_id, r.neighbor_id)
        for r in sim_ann_lsh(spark, SF_DIR).collect()
    }
    assert rows[2].n_hits == len(brute & lsh8)


def test_er_entities_accounting(spark):
    """Every entity has >= 2 members and a canonical id that IS a
    member; members across entities are disjoint and their total plus
    unmatched singletons covers the %8 customer subset exactly."""
    import pandas as pd

    from spotify_data_pipeline_spark.plans.roundtwelve_pending import (
        er_customer_entities_query,
    )

    rows = er_customer_entities_query(spark, SF_DIR).collect()
    assert rows  # matches exist at every SF (fuzzy-join staging guard)
    total_members = 0
    for r in rows:
        assert r.n_members >= 2
        assert r.entity_id <= r.max_member
        total_members += r.n_members
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    n_subset = int((cust.c_custkey % 8 == 1).sum())
    assert total_members <= n_subset
    # entity ids are distinct canonical minima
    ids = [r.entity_id for r in rows]
    assert len(ids) == len(set(ids))


def test_decayed_topk_python_model_and_horizon_bites(spark):
    """Exact dyadic recount from pandas — and the horizon genuinely
    drops events (the filter branch is alive at this SF)."""
    import pandas as pd

    from spotify_data_pipeline_spark.plans.roundtwelve_pending import (
        _DECAY_HORIZON_DAYS,
        events_decayed_topk_query,
    )

    rows = events_decayed_topk_query(spark, SF_DIR).collect()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")[["ts", "event_type"]]
    ev["day"] = pd.to_datetime(ev.ts).dt.date
    anchor = ev.day.max()
    ev["age"] = (pd.to_datetime(anchor) - pd.to_datetime(ev.day)).dt.days
    inside = ev[(ev.age >= 0) & (ev.age <= _DECAY_HORIZON_DAYS)]
    assert 0 < len(inside) < len(ev)  # horizon bites
    expect = {}
    for r in inside.itertuples():
        n, d = expect.get(r.event_type, (0, 0))
        expect[r.event_type] = (n + 1, d + (1 << (_DECAY_HORIZON_DAYS - r.age)))
    got = {r.event_type: (r.n_recent, r.decayed_units) for r in rows}
    assert got == expect
    order = [
        t for t, _ in sorted(expect.items(), key=lambda kv: (-kv[1][1], kv[0]))
    ]
    assert [r.event_type for r in rows] == order
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
