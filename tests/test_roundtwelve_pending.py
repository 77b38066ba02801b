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


def test_pending_not_registered(spark):
    from spotify_data_pipeline_spark.plans import all_queries

    names = set(all_queries())
    assert not names & {pq.name for pq in PENDING}


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
    from spotify_data_pipeline_spark.plans.roundsix_pending import PENDING as P6
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
