"""Round-11 staged queries (plans/roundeleven_pending.py) get the SAME
driver-shaped oracle check as declared queries — activation later is
registration-only (after the evidence-hash refresh)."""

from __future__ import annotations

import os

import pytest

from spotify_data_pipeline_spark.plans.roundeleven_pending import PENDING
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
    """Round-8 activated the whole module (window positions 2-22)."""
    from spotify_data_pipeline_spark.plans import all_queries
    from spotify_data_pipeline_spark.plans.active import R11_ACTIVATED

    qs = all_queries()
    assert set(R11_ACTIVATED) == {pq.name for pq in PENDING}
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
    from spotify_data_pipeline_spark.plans.roundten_pending import PENDING as P10

    for earlier in (P6, P7, P8, P9, P10):
        assert not set(names) & {pq.name for pq in earlier}


# broadcast-1-row patterns, documented at the call site
_BNLJ_OK = {
    # inherits ngram_jaccard's 1-row DF-cap broadcast + the 1-row
    # clustered-total broadcast under the singleton row
    "dedup_cluster_histogram",
    # broadcast 1-row query vector over the corpus scan (the
    # sim_cosine_topk pattern) + theta pairing of the BOUNDED top-10
    # candidate frame with itself (LIMIT-bounded literal pattern)
    "sim_mmr_diversified",
    # broadcast k-row centroid frame per Lloyd iteration (the
    # sim_ann_ivf bounded-centroid pattern)
    "ml_kmeans_exact",
    # 1-row calibration aggregate (m, max) broadcast onto the point
    # frame + 1-row cluster-stats assembly (dbscan_summary)
    "ml_dbscan_customers",
    # 1-row root-feature argmin broadcast (the tree structure is
    # data-dependent; the broadcast carries one row)
    "ml_decision_tree_d2",
    # inherits ngram_jaccard's 1-row DF-cap broadcast
    "dedup_lsh_calibration",
    # inherits ngram_jaccard's 1-row DF-cap broadcast (near-dedup stage)
    "llm_curation_funnel",
    # 1-row pooled theta-atoms aggregate broadcast onto the 2-arm frame
    "events_ab_cuped",
    # broadcast 5-row percentile-ladder frame crossed with the degree
    # and edge tables (bounded-literal pattern, join_range_bands kin)
    "graph_rich_club",
}


def test_plans_no_nested_loop(spark):
    for pq in PENDING:
        if pq.name in _BNLJ_OK:
            continue
        plan = pq.fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan, pq.name
        assert "CartesianProduct" not in plan, pq.name


def test_item_cf_score_vs_python(spark):
    """Each reported pair's cosine² ppm equals the exact Python-int
    formula over a pandas co-occurrence recount, and the ranking obeys
    the declared total order."""
    import pandas as pd

    from spotify_data_pipeline_spark.plans.roundeleven_pending import (
        sim_item_item_cf_query,
    )

    rows = sim_item_item_cf_query(spark, SF_DIR).collect()
    assert rows
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")[
        ["l_orderkey", "l_partkey"]
    ].drop_duplicates()
    sizes = li.groupby("l_orderkey").size()
    li = li[li.l_orderkey.isin(sizes[sizes <= 200].index)]
    sup = li.groupby("l_partkey").size()
    baskets = li.groupby("l_orderkey").l_partkey.apply(set)
    from itertools import combinations

    co = {}
    for items in baskets:
        for a, b in combinations(sorted(items), 2):
            co[(a, b)] = co.get((a, b), 0) + 1
    keys = []
    for r in rows:
        n_both = co[(r.src, r.dst)]
        assert r.n_both == n_both
        assert r.n_src == int(sup[r.src]) and r.n_dst == int(sup[r.dst])
        assert r.cos2_ppm == (n_both * n_both * 1_000_000) // (
            int(sup[r.src]) * int(sup[r.dst])
        )
        keys.append((-r.cos2_ppm, -r.n_both, r.src, r.dst))
    assert keys == sorted(keys)
    # and the top-20 really is the global top-20 under that order
    all_keys = sorted(
        (
            -((n * n * 1_000_000) // (int(sup[a]) * int(sup[b]))),
            -n,
            a,
            b,
        )
        for (a, b), n in co.items()
    )
    assert keys == all_keys[: len(keys)]


def test_inverted_phrase_equals_scan_python(spark):
    """Index-backed matches equal a direct Python scan of the
    normalized token stream (the third, engine-free route)."""
    import pandas as pd

    from spotify_data_pipeline_spark.plans.roundeleven_pending import (
        _PHRASE,
        text_inverted_phrase_query,
    )

    got = {
        r.doc_id: (r.n_matches, r.first_pos)
        for r in text_inverted_phrase_query(spark, SF_DIR).collect()
    }
    assert got  # phrase chosen to exist at every SF
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")[["doc_id", "text"]]
    expect = {}
    for r in docs.itertuples():
        toks = " ".join(r.text.strip().split()).lower().split(" ")
        ps = [
            i + 1
            for i in range(len(toks) - 1)
            if toks[i] == _PHRASE[0] and toks[i + 1] == _PHRASE[1]
        ]
        if ps:
            expect[r.doc_id] = (len(ps), ps[0])
    assert got == expect


def test_mode_deterministic_tiebreak(spark):
    """The mode row per year is the (count DESC, value ASC) argmax of
    a pandas recount — including any tied years."""
    import pandas as pd

    from spotify_data_pipeline_spark.plans.roundeleven_pending import (
        agg_mode_stat_query,
    )

    got = {
        r.order_year: (r.mode_priority, r.n_orders)
        for r in agg_mode_stat_query(spark, SF_DIR).collect()
    }
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")[
        ["o_orderdate", "o_orderpriority"]
    ]
    orders["y"] = pd.to_datetime(orders.o_orderdate).dt.year
    expect = {}
    for y, grp in orders.groupby("y"):
        counts = grp.groupby("o_orderpriority").size()
        best = sorted(((-n, v) for v, n in counts.items()))[0]
        expect[int(y)] = (best[1], int(-best[0]))
    assert got == expect


def test_revenue_bridge_conservation(spark):
    """ΔR_total = R_new − R_disc + ΔR_cont to the cent, all four
    segments populated, and part counts partition the union frame."""
    from spotify_data_pipeline_spark.plans.roundeleven_pending import (
        orders_revenue_bridge_query,
    )

    rows = {r.segment: r for r in orders_revenue_bridge_query(spark, SF_DIR).collect()}
    assert set(rows) == {"new", "discontinued", "continuing", "total"}
    t, n, d, c = (rows[k] for k in ("total", "new", "discontinued", "continuing"))
    assert t.delta_cents == n.rev_jun_cents - d.rev_may_cents + c.delta_cents
    assert t.n_parts == n.n_parts + d.n_parts + c.n_parts
    assert n.rev_may_cents == 0 and d.rev_jun_cents == 0


def test_dp_sensitivity_vs_pandas(spark):
    """Max and discrete p99 equal a pandas recount with the same rank
    arithmetic."""
    import math

    import pandas as pd

    from spotify_data_pipeline_spark.plans.roundeleven_pending import (
        privacy_dp_sensitivity_query,
    )

    r = privacy_dp_sensitivity_query(spark, SF_DIR).collect()[0]
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")[
        ["o_custkey", "o_totalprice"]
    ]
    orders["cents"] = [math.floor(p * 100 + 0.5) for p in orders.o_totalprice]
    per = orders.groupby("o_custkey").agg(n=("cents", "size"), c=("cents", "sum"))
    m = len(per)
    rank = min(m, (99 * (m + 1)) // 100)
    assert r.n_users == m
    assert r.max_orders_per_user == int(per.n.max())
    assert r.p99_orders == sorted(per.n)[rank - 1]
    assert r.max_cents_per_user == int(per.c.max())
    assert r.p99_cents == sorted(per.c)[rank - 1]


def test_try_suite_closed_form_null_counts(spark):
    """Every NULL census column equals its residue-class closed form
    over the orderkey universe."""
    import pandas as pd

    from spotify_data_pipeline_spark.plans.roundeleven_pending import (
        fn_try_error_suite_query,
    )

    r = fn_try_error_suite_query(spark, SF_DIR).collect()[0]
    keys = pd.read_parquet(f"{SF_DIR}/orders.parquet").o_orderkey
    assert r.n_rows == len(keys)
    assert r.n_bad_int == int((keys % 3 == 0).sum())
    assert r.n_bad_date == int((keys % 4 == 0).sum())
    assert r.n_div_zero == int((keys % 5 == 0).sum())
    assert r.n_bad_ts == int((keys % 7 == 0).sum())
    assert r.sum_good_ints == int(keys[keys % 3 != 0].sum())
    # every branch genuinely bites at this SF
    assert min(r.n_bad_int, r.n_bad_date, r.n_div_zero, r.n_bad_ts) > 0


def test_partition_plan_vs_pandas_bytes(spark):
    """est_bytes equals an exact pandas recount of the width model,
    and ceil division is right at the boundary."""
    import pandas as pd

    from spotify_data_pipeline_spark.plans.roundeleven_pending import (
        _TABLE_COLS,
        _TARGET_PARTITION_BYTES,
        _WIDTHS,
        ops_partition_plan_query,
    )

    got = {r.table_name: r for r in ops_partition_plan_query(spark, SF_DIR).collect()}
    for table, (bigints, doubles, tss, strings) in _TABLE_COLS.items():
        df = pd.read_parquet(f"{SF_DIR}/{table}.parquet")
        fixed = (
            len(bigints) * _WIDTHS["bigint"]
            + len(doubles) * _WIDTHS["double"]
            + len(tss) * _WIDTHS["timestamp"]
        )
        sbytes = sum(int(df[c].str.len().sum()) for c in strings)
        expect = len(df) * fixed + sbytes
        r = got[table]
        assert (r.n_rows, r.est_bytes) == (len(df), expect), table
        assert r.n_partitions_128mb == (
            expect + _TARGET_PARTITION_BYTES - 1
        ) // _TARGET_PARTITION_BYTES


def test_tokenizer_ratio_vs_python_regex(spark):
    """Token totals equal Python re.findall with the same pattern, and
    the ratio is the exact integer quotient."""
    import re

    import pandas as pd

    from spotify_data_pipeline_spark.functions.text import BPE_ISH_PATTERN
    from spotify_data_pipeline_spark.plans.roundeleven_pending import (
        llm_tokenizer_ratio_query,
    )

    got = {r.source: r for r in llm_tokenizer_ratio_query(spark, SF_DIR).collect()}
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")[["source", "text"]]
    pat = re.compile(BPE_ISH_PATTERN)
    for src, grp in docs.groupby("source"):
        chars = int(grp.text.str.len().sum())
        toks = sum(len(pat.findall(t)) for t in grp.text)
        r = got[src]
        assert (r.n_docs, r.total_chars, r.total_tokens) == (len(grp), chars, toks)
        assert r.milli_chars_per_token == chars * 1000 // toks


def test_loo_identities(spark):
    """For each row: n·mean = S and group max = max(x, loo_max); LOO
    mean recounted exactly in Python ints for one nation."""
    import math

    import pandas as pd

    from spotify_data_pipeline_spark.plans.roundeleven_pending import (
        window_leave_one_out_query,
    )

    rows = window_leave_one_out_query(spark, SF_DIR).collect()
    by_nation = {}
    for r in rows:
        by_nation.setdefault(r.nationkey, []).append(r)
    for nk, grp in by_nation.items():
        s = sum(r.bal_cents for r in grp)
        n = len(grp)
        gmax = max(r.bal_cents for r in grp)
        for r in grp:
            if n == 1:
                assert r.loo_mean_millicents is None
                assert r.loo_max_cents is None
            else:
                assert r.loo_mean_millicents == (s - r.bal_cents) * 1000 // (n - 1)
                assert max(r.bal_cents, r.loo_max_cents) == gmax

    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")[
        ["c_nationkey", "c_custkey", "c_acctbal"]
    ]
    one = cust[cust.c_nationkey == cust.c_nationkey.iloc[0]]
    cents = {
        int(r.c_custkey): math.floor(r.c_acctbal * 100 + 0.5)
        for r in one.itertuples()
    }
    got = {r.custkey: r for r in rows if r.nationkey == one.c_nationkey.iloc[0]}
    s = sum(cents.values())
    for ck, c in cents.items():
        others = [v for k, v in cents.items() if k != ck]
        assert got[ck].loo_mean_millicents == (s - c) * 1000 // len(others)
        assert got[ck].loo_max_cents == max(others)


def test_cluster_histogram_accounts_for_every_doc(spark):
    """Σ n_docs over all rows (incl. the singleton row) = |documents|,
    and bucket boundaries hold for the clustered rows."""
    import pandas as pd

    from spotify_data_pipeline_spark.plans.roundeleven_pending import (
        dedup_cluster_histogram_query,
    )

    rows = dedup_cluster_histogram_query(spark, SF_DIR).collect()
    total = len(pd.read_parquet(f"{SF_DIR}/documents.parquet"))
    assert sum(r.n_docs for r in rows) == total
    for r in rows:
        if r.log2_bucket > 0:  # clustered buckets: sizes in [2^(b-1), 2^b)
            assert r.n_clusters >= 1
            assert r.n_docs >= 2 * r.n_clusters  # every cluster has >= 2 docs


def test_mmr_greedy_vs_python_model(spark):
    """The selection equals an independent Python greedy MMR over the
    same integer-scaled quantized cosines, and genuinely diverges from
    pure relevance ranking (diversity is load-bearing)."""
    import math

    import pandas as pd

    from spotify_data_pipeline_spark.plans.roundeleven_pending import (
        _MMR_CANDIDATES,
        _MMR_K,
        _MMR_QUERY_ID,
        sim_mmr_diversified_query,
    )

    rows = sim_mmr_diversified_query(spark, SF_DIR).collect()
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")[["vec_id", "embedding"]]

    def quant(v):
        m = max(abs(float(x)) for x in v)
        if m == 0:
            return [0.0] * len(v)
        return [
            min(max(math.floor(float(x) * 127 / m + 0.5), -127.0), 127.0)
            for x in v
        ]

    qv = {int(r.vec_id): quant(r.embedding) for r in emb.itertuples()}

    def cos_x1e4(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return math.floor(dot / (na * nb) * 10000 + 0.5)

    q = qv[_MMR_QUERY_ID]
    rel = {
        i: cos_x1e4(q, v) for i, v in qv.items() if i != _MMR_QUERY_ID
    }
    cand = sorted(rel, key=lambda i: (-rel[i], i))[:_MMR_CANDIDATES]
    sel = [min(cand, key=lambda i: (-rel[i], i))]
    while len(sel) < _MMR_K:
        rest = [c for c in cand if c not in sel]
        best = min(
            rest,
            key=lambda c: (
                -(rel[c] - max(cos_x1e4(qv[c], qv[s]) for s in sel)),
                c,
            ),
        )
        sel.append(best)
    assert [r.vec_id for r in rows] == sel
    # diversity changed the ordering vs pure relevance
    assert [r.vec_id for r in rows] != cand[:_MMR_K]


def test_decision_tree_d2_vs_python(spark):
    """Root choice and each branch's second feature equal a pandas
    recount of the exact majority-error argmins."""
    import pandas as pd

    from spotify_data_pipeline_spark.plans.roundeleven_pending import (
        _TREE_THRESHOLD,
        ml_decision_tree_d2_query,
    )

    rows = ml_decision_tree_d2_query(spark, SF_DIR).collect()
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    orders["hi"] = (orders.o_totalprice >= _TREE_THRESHOLD).astype(int)
    orders["dow"] = pd.to_datetime(orders.o_orderdate).dt.dayofweek
    # pandas dayofweek: 0=Monday; Spark/DuckDB emit 0=Sunday
    orders["dow"] = ((orders.dow + 1) % 7).astype(str)
    feats = {
        "priority": orders.o_orderpriority,
        "status": orders.o_orderstatus,
        "dow": orders.dow,
    }

    def err_of(series, mask=None):
        df = pd.DataFrame({"v": series, "hi": orders.hi})
        if mask is not None:
            df = df[mask]
        g = df.groupby("v").hi.agg(["sum", "size"])
        return int(sum(min(r["sum"], r["size"] - r["sum"]) for _, r in g.iterrows()))

    root = min(feats, key=lambda f: (err_of(feats[f]), f))
    assert all(r.root_feature == root for r in rows)
    got = {r.root_value: (r.second_feature, r.branch_errors, r.n_branch) for r in rows}
    for v in feats[root].unique():
        mask = (feats[root] == v).values
        best = min(
            (g for g in feats if g != root),
            key=lambda g: (err_of(feats[g], mask), g),
        )
        assert got[str(v)] == (
            best,
            err_of(feats[best], mask),
            int(mask.sum()),
        ), v


def test_lsh_calibration_theory_tracks_data(spark):
    """Predicted values equal the Python squaring-chain recompute,
    every J >= 0.9 pair collides, and the total observed collision
    count sits within 4 sigma of the predicted binomial sum."""
    import math

    from spotify_data_pipeline_spark.plans.roundeleven_pending import (
        dedup_lsh_calibration_query,
    )

    rows = dedup_lsh_calibration_query(spark, SF_DIR).collect()
    assert rows
    pred_sum = 0.0
    var_sum = 0.0
    for r in rows:
        t = 1 - r.jaccard * r.jaccard
        t2 = t * t
        t4 = t2 * t2
        s = 1 - t4 * t4
        assert r.predicted_x1e4 == math.floor(s * 10000 + 0.5), r
        if r.jaccard >= 0.9:
            assert r.collided == 1, r
        pred_sum += s
        var_sum += s * (1 - s)
    observed = sum(r.collided for r in rows)
    sigma = math.sqrt(var_sum)
    assert abs(observed - pred_sum) <= 4 * sigma + 3, (observed, pred_sum, sigma)


def test_cuped_atoms_vs_pandas(spark):
    """All six atoms equal an exact pandas/Python-int recount, the
    arms partition the user set, and theta_den > 0 (the covariate
    genuinely varies, so the adjustment is well-defined)."""
    import hashlib

    import pandas as pd

    from spotify_data_pipeline_spark.plans.roundeleven_pending import (
        events_ab_cuped_query,
    )

    rows = {r.arm: r for r in events_ab_cuped_query(spark, SF_DIR).collect()}
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")[["user_id", "ts"]]
    cut = pd.Timestamp("2024-01-16 00:00:00")
    per = ev.groupby("user_id").ts.agg(
        x=lambda s: int((s < cut).sum()), y=lambda s: int((s >= cut).sum())
    )
    atoms = {0: [0, 0, 0], 1: [0, 0, 0]}
    xs, ys = [], []
    for uid, r in per.iterrows():
        arm = int(hashlib.md5(f"ab1:{uid}".encode()).hexdigest()[:4], 16) % 2
        atoms[arm][0] += 1
        atoms[arm][1] += int(r.x)
        atoms[arm][2] += int(r.y)
        xs.append(int(r.x))
        ys.append(int(r.y))
    n = len(per)
    theta_num = n * sum(a * b for a, b in zip(xs, ys)) - sum(xs) * sum(ys)
    theta_den = n * sum(a * a for a in xs) - sum(xs) ** 2
    assert theta_den > 0
    for arm in (0, 1):
        r = rows[arm]
        assert (r.n_users, r.sum_x, r.sum_y) == tuple(atoms[arm])
        assert (r.theta_num, r.theta_den) == (theta_num, theta_den)
    assert rows[0].n_users + rows[1].n_users == n


def test_simhash_baseline_theory_columns_and_deviation(spark):
    """Expected ppm equals the math.comb recompute (and sums to ~1e6);
    observed pairs cover floor(n_docs/2); and the corpus's measured
    mean distance sits BELOW the 30-bit null-model mean — the
    correlation deviation the query exists to show."""
    import math

    import pandas as pd

    from spotify_data_pipeline_spark.plans.roundeleven_pending import (
        text_simhash_baseline_query,
    )

    rows = text_simhash_baseline_query(spark, SF_DIR).collect()
    assert [r.hamming for r in rows] == list(range(61))
    for r in rows:
        assert r.expected_ppm == math.comb(60, r.hamming) * 1_000_000 // (1 << 60)
    assert 990_000 <= sum(r.expected_ppm for r in rows) <= 1_000_000

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    n_nonblank = int((docs.text.str.strip().str.len() > 0).sum())
    total = sum(r.n_observed for r in rows)
    assert total == n_nonblank // 2
    mean_num = sum(r.hamming * r.n_observed for r in rows)
    assert mean_num < 30 * total  # correlated corpus: below the null mean


def test_burstiness_vs_python(spark):
    """df / df2+ / cf / ppm equal a Python recount, and burstiness
    genuinely differs from raw frequency ranking somewhere (the
    statistic carries information df alone does not)."""
    import pandas as pd

    from spotify_data_pipeline_spark.plans.roundeleven_pending import (
        text_burstiness_query,
    )

    rows = {r.term: r for r in text_burstiness_query(spark, SF_DIR).collect()}
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    stats: dict = {}
    for txt in docs.text:
        toks = " ".join(txt.strip().split()).lower().split(" ")
        if toks == [""]:
            continue
        tf: dict = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        for t, n in tf.items():
            df_, d2, cf = stats.get(t, (0, 0, 0))
            stats[t] = (df_ + 1, d2 + (1 if n >= 2 else 0), cf + n)
    assert set(rows) == set(stats)
    for t, (df_, d2, cf) in stats.items():
        r = rows[t]
        assert (r.df, r.df_2plus, r.cf) == (df_, d2, cf), t
        assert r.burstiness_ppm == d2 * 1_000_000 // df_
    ranks_by_cf = sorted(rows, key=lambda t: (-rows[t].cf, t))
    ranks_by_b = sorted(rows, key=lambda t: (-rows[t].burstiness_ppm, t))
    assert ranks_by_cf != ranks_by_b


def test_rich_club_monotone_structure(spark):
    """Rungs are the discrete degree percentiles (pandas recount),
    n_rich is non-increasing up the ladder, and realized <= possible."""
    import pandas as pd

    from spotify_data_pipeline_spark.plans.roundeleven_pending import (
        _RICH_CLUB_PCTS,
        graph_rich_club_query,
    )

    rows = {r.pct: r for r in graph_rich_club_query(spark, SF_DIR).collect()}
    assert set(rows) == set(_RICH_CLUB_PCTS)
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")[
        ["l_orderkey", "l_partkey"]
    ].drop_duplicates()
    sizes = li.groupby("l_orderkey").size()
    li = li[li.l_orderkey.isin(sizes[(sizes >= 2) & (sizes <= 200)].index)]
    e = li.merge(li, on="l_orderkey")
    e = e[e.l_partkey_x < e.l_partkey_y][
        ["l_partkey_x", "l_partkey_y"]
    ].drop_duplicates()
    deg = pd.concat([e.l_partkey_x, e.l_partkey_y]).value_counts()
    ds = sorted(deg)
    mm = len(ds)
    prev_rich = None
    for p in _RICH_CLUB_PCTS:
        k = ds[min(mm, (p * (mm + 1)) // 100) - 1]
        r = rows[p]
        assert r.k == k, p
        assert r.n_rich == int((deg > k).sum())
        assert r.n_realized <= r.n_rich * (r.n_rich - 1) // 2
        if prev_rich is not None:
            assert r.n_rich <= prev_rich
        prev_rich = r.n_rich


def test_curation_funnel_composes_proven_stages(spark):
    """Counts are monotonically non-increasing; stage 4 equals the
    declared llm_curation_pipeline's row count; stage 5 equals stage 4
    minus the component losers present in it."""
    from spotify_data_pipeline_spark.plans import all_queries
    from spotify_data_pipeline_spark.plans.roundeleven_pending import (
        llm_curation_funnel_query,
    )

    rows = llm_curation_funnel_query(spark, SF_DIR).collect()
    assert [r.stage_ord for r in rows] == [1, 2, 3, 4, 5]
    counts = [r.n_docs for r in rows]
    assert counts == sorted(counts, reverse=True)
    declared = all_queries()["llm_curation_pipeline"]
    assert counts[3] == declared.fn(spark, SF_DIR).count()
    assert counts[4] < counts[3]  # near-dedup genuinely bites at sf0.001
