"""Round-7 declared-query staging area (same contract as
``roundsix_pending``: built and oracle-verified NOW, deliberately NOT
declared — the round-6 activation window is already fully planned at
35 staged + 15 re-proofs; these activate in round 7 after the usual
evidence-hash refresh).

Each entry: exact-oracle query + DuckDB SQL, exercised by
``tests/test_roundseven_pending.py`` with the driver-shaped comparison.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.io import load_table
from spotify_data_pipeline_spark.plans.parity import rnd_cents


@dataclass(frozen=True)
class PendingQuery:
    name: str
    fn: object
    oracle: str | None
    headline: bool = False
    tags: tuple[str, ...] = ()


def events_session_paths_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 three-step event-type paths across sessions — the
    product-analytics "what do users actually do" query that funnels
    (fixed order) and transition matrices (first-order only) both
    miss. One window pass sessionizes (30-minute lag gap, the shared
    sessionization rule), a second pass takes lead/lead2 WITHIN the
    session partition — paths never straddle a session boundary by
    construction, not by filtering. Counting is a 125-cell-max hash
    agg; ties break on the path string. At 100 TB: two shuffles, both
    on user-derived keys, no self-joins."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # MICROSECOND gap arithmetic (the roundfive.py:321 pattern):
    # whole-second truncation would disagree with the oracle's epoch_us
    # for gaps inside (1800, 1801) s — sub-second event times are real.
    _us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = _us - F.lag(_us).over(wu)
    new_s = F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0)
    sess = ev.withColumn("_sid", F.sum(new_s).over(wu))
    ws = Window.partitionBy("user_id", "_sid").orderBy("ts", "event_id")
    grams = sess.select(
        F.col("event_type").alias("step1"),
        F.lead("event_type", 1).over(ws).alias("step2"),
        F.lead("event_type", 2).over(ws).alias("step3"),
    ).where(F.col("step3").isNotNull())
    return (
        grams.groupBy("step1", "step2", "step3")
        .agg(F.count("*").alias("n_paths"))
        .orderBy(F.col("n_paths").desc(), "step1", "step2", "step3")
        .limit(10)
    )


_SESSION_PATHS_ORACLE = """
    WITH s AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sid AS (
      SELECT user_id, ts, event_id, event_type,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM s
    ), g AS (
      SELECT event_type AS step1,
             lead(event_type, 1) OVER w2 AS step2,
             lead(event_type, 2) OVER w2 AS step3
      FROM sid
      WINDOW w2 AS (PARTITION BY user_id, sid ORDER BY ts, event_id)
    )
    SELECT step1, step2, step3, CAST(count(*) AS BIGINT) AS n_paths
    FROM g WHERE step3 IS NOT NULL
    GROUP BY step1, step2, step3
    ORDER BY n_paths DESC, step1, step2, step3
    LIMIT 10
"""


def agg_revenue_share_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each nation's share of its REGION's revenue,
    with the within-region rank — the percent-of-total window over an
    aggregate (the report shape every BI layer emits). Revenue in
    exact cents; the share divides two exact integers (deterministic
    IEEE division, 4dp-rounded); dims broadcast; ONE fact shuffle for
    the agg, then a 25-row window."""
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    per_nation = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.sum(rnd_cents("o_totalprice")).alias("_cents"))
    )
    wr = Window.partitionBy("r_name")
    wrank = Window.partitionBy("r_name").orderBy(F.col("_cents").desc(), F.col("n_name"))
    return per_nation.select(
        "r_name",
        "n_name",
        (F.col("_cents") / 100.0).alias("revenue"),
        (F.floor(F.col("_cents") / F.sum("_cents").over(wr) * 10000 + F.lit(0.5)) / 10000.0).alias(
            "region_share"
        ),
        F.row_number().over(wrank).cast("long").alias("rank_in_region"),
    ).orderBy("r_name", "rank_in_region")


_REVENUE_SHARE_ORACLE = """
    WITH per AS (
      SELECT r_name, n_name,
             sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
    )
    SELECT r_name, n_name,
           cents / 100.0 AS revenue,
           floor(CAST(cents AS DOUBLE) / sum(cents) OVER (PARTITION BY r_name)
                 * 10000 + 0.5) / 10000 AS region_share,
           CAST(row_number() OVER (PARTITION BY r_name
                                   ORDER BY cents DESC, n_name) AS BIGINT)
             AS rank_in_region
    FROM per
    ORDER BY r_name, rank_in_region
"""


def orders_interpurchase_gap_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase cadence per market segment: the median gap in
    days between a customer's consecutive orders — the retention /
    replenishment metric behind churn models. Per-customer gaps via
    ONE lag window (integer day arithmetic — epoch floor-division, no
    float dates), then a discrete median per segment
    (percentile_disc ↔ quantile_disc, actual data values ⇒ integer
    output, the winsorize device). Customers with one order contribute
    no gap, deterministically on both engines."""
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate", "o_orderkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    day = F.floor(F.col("o_orderdate").cast("timestamp").cast("long") / 86400)
    gaps = (
        orders.withColumn("_gap", day - F.lag(day).over(w))
        .where(F.col("_gap").isNotNull())
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
    )
    return (
        gaps.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_gaps"),
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY _gap)")
            .cast("long")
            .alias("median_gap_days"),
            F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY _gap)")
            .cast("long")
            .alias("p90_gap_days"),
        )
        .orderBy("c_mktsegment")
    )


_INTERPURCHASE_ORACLE = """
    WITH g AS (
      SELECT o_custkey,
             floor(epoch(o_orderdate) / 86400)
             - lag(floor(epoch(o_orderdate) / 86400))
               OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
               AS gap
      FROM orders
    ), j AS (
      SELECT c_mktsegment, gap FROM g
      JOIN customer ON o_custkey = c_custkey
      WHERE gap IS NOT NULL
    )
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_gaps,
           CAST(quantile_disc(gap, 0.5) AS BIGINT) AS median_gap_days,
           CAST(quantile_disc(gap, 0.9) AS BIGINT) AS p90_gap_days
    FROM j
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
"""


def events_cusum_days_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM changepoint detection over the daily event
    volume — the monitoring primitive that catches sustained drifts a
    per-day 3σ rule (events_anomaly's shape) misses. The textbook
    recursion S_d = max(0, S_{d-1} + x_d − μ − slack) looks
    non-associative, but the identity S_d = P_d − min_{j≤d} P_j
    (P = running residual sum) turns it into two plain ASSOCIATIVE
    window aggregates — running sum + running min — so no fold HOF and
    no cross-engine recursion. Exactness: residuals are scaled by
    n_days (x_d·n − total − slack·n is an integer), so every prefix is
    an exact integer; μ comes from an unpartitioned window over the
    ~bounded daily frame, not a driver collect. Alarm when the
    UNSCALED statistic exceeds 5·slack ≡ scaled S > 5·total (the
    inline derivation at the threshold; slack = 5% of the mean)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("DAY", "ts").alias("day")).agg(
        F.count("*").alias("x")
    )
    w_all = Window.partitionBy()
    w_run = Window.partitionBy().orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    n = F.count("*").over(w_all)
    total = F.sum("x").over(w_all)
    # scaled residual: 20·(x·n − total) − total  ≡  20n·(x − μ − μ/20)
    r = 20 * (F.col("x") * n - total) - total
    scored = daily.withColumn("_r", r).withColumn(
        "_p", F.sum("_r").over(w_run)
    )
    s = F.col("_p") - F.least(F.min("_p").over(w_run), F.lit(0))
    # alarm threshold: 5·slack·20n = 5·total (in the scaled units)
    return (
        scored.select(
            "day",
            F.col("x").cast("long").alias("n_events"),
            s.cast("long").alias("cusum_scaled"),
            (s > 5 * total).alias("alarm"),
        )
        .orderBy("day")
    )


_CUSUM_ORACLE = """
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ), c AS (
      SELECT day, x,
             count(*) OVER () AS n,
             sum(x) OVER () AS total
      FROM daily
    ), p AS (
      SELECT day, x, total,
             sum(20 * (x * n - total) - total)
               OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS pre
      FROM c
    )
    SELECT day,
           x AS n_events,
           CAST(pre - least(min(pre) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING), 0)
                AS BIGINT) AS cusum_scaled,
           (pre - least(min(pre) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING), 0))
             > 5 * total AS alarm
    FROM p
    ORDER BY day
"""


def agg_forecast_revenue_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape — the canonical predicate-pushdown aggregate:
    potential revenue uplift from discount changes, one filtered scan,
    zero joins, zero shuffles past the 1-row agg. The simplest plan in
    the book, kept as the pushdown/codegen canary: every predicate
    (date band, discount band, quantity cap) must reach the parquet
    scan. Revenue = Σ extendedprice·discount in exact cents."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.count("*").alias("n_items"),
            (F.sum(rnd_cents(F.col("l_extendedprice") * F.col("l_discount"))) / 100.0).alias(
                "forecast_revenue"
            ),
        )
    )


_FORECAST_REVENUE_ORACLE = """
    SELECT CAST(count(*) AS BIGINT) AS n_items,
           sum(CAST(floor(l_extendedprice * l_discount * 100 + 0.5) AS BIGINT)) / 100.0
             AS forecast_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
"""


def orders_basket_lift_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over co-ordered parts: for the
    top part pairs, support / confidence / LIFT — the retail analytics
    family (frequent itemsets at the pair level) none of the other
    declared queries touch. Pair counts come from the capped in-array
    co-occurrence pattern (operators/triangles.py — never a baskets×
    baskets self-join); singleton counts are one hash agg; lift is a
    ratio of exact integers, 4dp-rounded. Pairs with support < 5
    baskets are cut before ranking (the classic min-support prune —
    at 100 TB it is also what keeps the ranked set small). Top-15 by
    lift, ties broken on the pair ids."""
    from spotify_data_pipeline_spark.operators.triangles import cooccurrence_counts

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # basket = order; item = part. Pair occurrences WITH multiplicity of
    # baskets: count each (basket, pair) once — cooccurrence_edges
    # dedups per basket via distinct, so re-derive pair-per-basket
    # counts by counting edges per pair across baskets.
    items = li.distinct()
    # 1-row broadcast basket-count aggregate (the documented device —
    # no driver-side count() in a declared query path)
    nb = items.agg(F.countDistinct("l_orderkey").alias("_n_baskets"))
    pair_counts = cooccurrence_counts(items, "l_orderkey", "l_partkey").where(
        F.col("n_ab") >= 5
    )
    single = items.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.count("*").alias("n_single")
    )
    joined = (
        pair_counts.join(
            single.select(F.col("_pk").alias("src"), F.col("n_single").alias("n_a")),
            "src",
        )
        .join(
            single.select(F.col("_pk").alias("dst"), F.col("n_single").alias("n_b")),
            "dst",
        )
        .crossJoin(F.broadcast(nb))
    )
    lift = (F.col("n_ab") * F.col("_n_baskets")) / (F.col("n_a") * F.col("n_b"))
    conf = F.col("n_ab") / F.col("n_a")
    return (
        joined.select(
            F.col("src").alias("part_a"),
            F.col("dst").alias("part_b"),
            F.col("n_ab").cast("long").alias("n_baskets_ab"),
            (F.floor(conf * 10000 + F.lit(0.5)) / 10000.0).alias("confidence"),
            (F.floor(lift * 10000 + F.lit(0.5)) / 10000.0).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "part_a", "part_b")
        .limit(15)
    )


_BASKET_LIFT_ORACLE = """
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), sized AS (
      SELECT l_orderkey FROM items GROUP BY l_orderkey
      HAVING count(*) BETWEEN 2 AND 200
    ), pairs AS (
      SELECT a.l_partkey AS src, b.l_partkey AS dst,
             CAST(count(*) AS BIGINT) AS n_ab
      FROM items a
      JOIN items b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      JOIN sized s ON a.l_orderkey = s.l_orderkey
      GROUP BY 1, 2 HAVING count(*) >= 5
    ), singles AS (
      SELECT l_partkey AS pk, CAST(count(*) AS BIGINT) AS n FROM items GROUP BY 1
    ), nb AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_baskets FROM items)
    SELECT src AS part_a, dst AS part_b, n_ab AS n_baskets_ab,
           floor(CAST(n_ab AS DOUBLE) / sa.n * 10000 + 0.5) / 10000 AS confidence,
           floor(CAST(n_ab * nb.n_baskets AS DOUBLE) / (sa.n * sb.n) * 10000 + 0.5)
             / 10000 AS lift
    FROM pairs
    JOIN singles sa ON src = sa.pk
    JOIN singles sb ON dst = sb.pk, nb
    ORDER BY lift DESC, part_a, part_b
    LIMIT 15
"""


def orders_dow_seasonality_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week order seasonality with a goodness-of-fit statistic:
    per weekday the order count, its share, and the per-cell
    contribution to the uniformity chi-square — scaled to INTEGERS
    ((7·o_d − total)², the cross-multiplied form), so the statistic
    carries no float-sum order risk; only the final display ratios
    divide and 4dp-round. The chi-square-against-uniform test is the
    standard seasonality screen before building per-weekday models.
    One 7-cell hash agg + an unpartitioned 7-row window for the
    total."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.dayofweek("o_orderdate").alias("dow")).agg(
        F.count("*").alias("n_orders")
    )
    w_all = Window.partitionBy()
    total = F.sum("n_orders").over(w_all)
    dev = 7 * F.col("n_orders") - total  # integer deviation, scaled by 7
    return (
        daily.select(
            F.col("dow").cast("long").alias("dow"),
            F.col("n_orders").cast("long").alias("n_orders"),
            (F.floor(F.col("n_orders") / total * 10000 + F.lit(0.5)) / 10000.0).alias(
                "share"
            ),
            (dev * dev).cast("long").alias("chi2_cell_scaled"),
        )
        .orderBy("dow")
    )


_DOW_SEASONALITY_ORACLE = """
    WITH d AS (
      SELECT dayofweek(o_orderdate) + 1 AS dow, CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY 1
    ), t AS (
      SELECT dow, n, sum(n) OVER () AS total FROM d
    )
    SELECT CAST(dow AS BIGINT) AS dow,
           n AS n_orders,
           floor(CAST(n AS DOUBLE) / total * 10000 + 0.5) / 10000 AS share,
           CAST((7 * n - total) * (7 * n - total) AS BIGINT) AS chi2_cell_scaled
    FROM t
    ORDER BY dow
"""


def profile_orders_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic table profiling (operators/profiling.py) over orders —
    the discovery report (null counts, exact distinct cardinality,
    numeric ranges, top values) that precedes writing constraints.
    Two passes total regardless of column count: one algebraic agg for
    nulls/min/max/numeric-distinct, one stacked (column, value) agg
    feeding string distinct counts AND the top-3 (count desc, value
    asc — deterministic). Numerics are never stringified (cross-engine
    float formatting is not deterministic), which is why min/max are
    typed DOUBLE columns and top_values covers string columns only."""
    from spotify_data_pipeline_spark.operators.profiling import profile_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    return profile_table(orders, top_k=3)


def _profile_oracle_sql() -> str:
    num_cols = ["o_orderkey", "o_custkey", "o_totalprice"]
    str_cols = ["o_orderstatus", "o_orderpriority"]
    parts = []
    for c in num_cols:
        parts.append(f"""
    SELECT '{c}' AS "column",
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CAST(min({c}) AS DOUBLE) AS min_num,
           CAST(max({c}) AS DOUBLE) AS max_num,
           CAST(NULL AS VARCHAR) AS top_values
    FROM orders""")
    for c in str_cols:
        parts.append(f"""
    SELECT '{c}' AS "column",
           (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_rows,
           (SELECT CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
              FROM orders) AS n_null,
           (SELECT CAST(count(DISTINCT {c}) AS BIGINT) FROM orders) AS n_distinct,
           CAST(NULL AS DOUBLE) AS min_num,
           CAST(NULL AS DOUBLE) AS max_num,
           (SELECT string_agg(v || ':' || CAST(c2 AS VARCHAR), ',' ORDER BY c2 DESC, v)
              FROM (SELECT {c} AS v, count(*) AS c2 FROM orders
                    WHERE {c} IS NOT NULL
                    GROUP BY {c} ORDER BY c2 DESC, v LIMIT 3)) AS top_values""")
    return " UNION ALL ".join(parts) + ' ORDER BY "column"'


_PROFILE_ORACLE = _profile_oracle_sql()


def graph_hop_distance_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source hop distances (operators/hops.py) on the part
    co-order graph: 1% of parts seed the frontier, 3 synchronous
    relaxation rounds give every part within 3 hops its EXACT distance
    — reach/blast-radius analysis, the distance member of the graph
    family. Same bounded graph window as graph_triangle_count; the
    unrolled-CTE oracle replicates every round (the PageRank/labelprop
    device — pure min over integers, zero float risk)."""
    from spotify_data_pipeline_spark.operators.hops import hop_distances
    from spotify_data_pipeline_spark.operators.triangles import cooccurrence_edges

    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey")
    seeds = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_partkey") % 100 == 0)
        .select(F.col("p_partkey").alias("node"))
    )
    return hop_distances(edges, seeds, max_hops=3).orderBy("node")


def _hop_distance_oracle_sql(max_hops: int = 3) -> str:
    head = """
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-07-01'
    ), sized AS (
      SELECT l_orderkey FROM li GROUP BY l_orderkey
      HAVING count(*) BETWEEN 2 AND 200
    ), e AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM li a
      JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      JOIN sized s ON a.l_orderkey = s.l_orderkey
    ), adj AS (
      SELECT src AS node, dst AS nbr FROM e
      UNION ALL SELECT dst AS node, src AS nbr FROM e
    ), d0 AS (
      SELECT DISTINCT p_partkey AS node, CAST(0 AS BIGINT) AS dist
      FROM part WHERE p_partkey % 100 = 0
    )"""
    iters = []
    for t in range(max_hops):
        iters.append(f"""
    d{t + 1} AS (
      SELECT node, min(dist) AS dist FROM (
        SELECT a.node, d.dist + 1 AS dist
        FROM adj a JOIN d{t} d ON a.nbr = d.node
        UNION ALL
        SELECT node, dist FROM d{t}
      ) GROUP BY node
    )""")
    return (
        head
        + ","
        + ",".join(iters)
        + f"\n    SELECT node, dist FROM d{max_hops} ORDER BY node"
    )


_HOP_DISTANCE_ORACLE = _hop_distance_oracle_sql()


def orders_benford_digits_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit screening of order totals — the classic
    fabricated-numbers / data-quality test (Nigrini's fraud screen):
    observed first-significant-digit counts vs the Benford expectation
    log10(1+1/d). The digit extracts via INTEGER/STRING arithmetic
    (first char of the truncated amount — no log10 of a double near a
    power-of-ten boundary to disagree on); expected proportions enter
    as literal constants shared by both engines (the LSH hyperplane
    device); the deviation is (observed−expected·n) in 4dp-rounded
    units. One 9-cell hash agg."""
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") >= 1)
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
    ).cast("long")
    counts = orders.groupBy(digit.alias("digit")).agg(F.count("*").alias("n_orders"))
    w_all = Window.partitionBy()
    total = F.sum("n_orders").over(w_all)
    import math

    benford = F.create_map(
        *[
            x
            for d in range(1, 10)
            for x in (F.lit(d), F.lit(round(math.log10(1 + 1 / d), 6)))
        ]
    )
    exp = F.element_at(benford, F.col("digit"))
    return (
        counts.select(
            F.col("digit").cast("long").alias("digit"),
            F.col("n_orders").cast("long").alias("n_orders"),
            (F.floor(F.col("n_orders") / total * 10000 + F.lit(0.5)) / 10000.0).alias(
                "observed_frac"
            ),
            exp.alias("benford_frac"),
            (
                F.floor(
                    (F.col("n_orders") - exp * total) / total * 10000 + F.lit(0.5)
                )
                / 10000.0
            ).alias("deviation"),
        )
        .orderBy("digit")
    )


def _benford_oracle_sql() -> str:
    import math

    cases = " ".join(
        f"WHEN {d} THEN {round(math.log10(1 + 1 / d), 6)}" for d in range(1, 10)
    )
    return f"""
    WITH c AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                  AS BIGINT) AS digit,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders WHERE o_totalprice >= 1
      GROUP BY 1
    ), t AS (
      SELECT digit, n_orders, sum(n_orders) OVER () AS total,
             CASE digit {cases} END AS benford_frac
      FROM c
    )
    SELECT digit, n_orders,
           floor(CAST(n_orders AS DOUBLE) / total * 10000 + 0.5) / 10000
             AS observed_frac,
           benford_frac,
           floor((n_orders - benford_frac * total) / total * 10000 + 0.5) / 10000
             AS deviation
    FROM t
    ORDER BY digit
"""


_BENFORD_ORACLE = _benford_oracle_sql()


def llm_ks_drift_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift screen: each source's
    document-length distribution against the REST of the corpus — the
    distribution-shift gate a curation pipeline runs before mixing a
    new source in. The KS statistic sup|F₁−F₂| is computed in
    CROSS-MULTIPLIED INTEGERS: D·n₁·n₂ = max over values of
    |cum₁·n₂ − cum₂·n₁| (cumulative counts via one window over the
    per-(source,value) agg), so the supremum is exact — no float CDFs,
    no interpolation; only the final display ratio divides and
    4dp-rounds. Per source: one agg + one window + a 1-row-per-source
    max. The alarm threshold 1.358·√((n₁+n₂)/(n₁n₂)) (α=0.05) is
    classical but float — emitted as the exact integer statistic plus
    the rounded ratio so the caller picks the cutoff."""
    docs = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    sources = docs.select("source").distinct()
    # per (source, value): in-source count and rest-of-corpus count
    per_val_all = docs.groupBy("n_chars").agg(F.count("*").alias("_c_all"))
    per_val_src = docs.groupBy("source", "n_chars").agg(F.count("*").alias("_c_src"))
    joined = (
        sources.crossJoin(per_val_all)  # |sources| x |distinct lengths| grid
        .join(per_val_src, ["source", "n_chars"], "left")
        .withColumn("_c_src", F.coalesce("_c_src", F.lit(0)))
        .withColumn("_c_rest", F.col("_c_all") - F.col("_c_src"))
    )
    w_tot = Window.partitionBy("source")
    w_cum = (
        Window.partitionBy("source")
        .orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n1 = F.sum("_c_src").over(w_tot)
    n2 = F.sum("_c_rest").over(w_tot)
    d_scaled = F.abs(
        F.sum("_c_src").over(w_cum) * n2 - F.sum("_c_rest").over(w_cum) * n1
    )
    scored = joined.select(
        "source", n1.alias("_n1"), n2.alias("_n2"), d_scaled.alias("_d")
    )
    return (
        scored.groupBy("source")
        .agg(
            F.first("_n1").alias("n_source"),
            F.first("_n2").alias("n_rest"),
            F.max("_d").alias("ks_scaled"),
        )
        .select(
            "source",
            F.col("n_source").cast("long").alias("n_source"),
            F.col("n_rest").cast("long").alias("n_rest"),
            F.col("ks_scaled").cast("long").alias("ks_scaled"),
            (
                F.floor(
                    F.col("ks_scaled")
                    / (F.col("n_source") * F.col("n_rest"))
                    * 10000
                    + F.lit(0.5)
                )
                / 10000.0
            ).alias("ks_stat"),
        )
        .orderBy("source")
    )


_KS_DRIFT_ORACLE = """
    WITH srcs AS (SELECT DISTINCT source FROM documents),
    pv_all AS (
      SELECT n_chars, CAST(count(*) AS BIGINT) AS c_all
      FROM documents GROUP BY 1
    ), pv_src AS (
      SELECT source, n_chars, CAST(count(*) AS BIGINT) AS c_src
      FROM documents GROUP BY 1, 2
    ), grid AS (
      SELECT s.source, a.n_chars, a.c_all,
             coalesce(p.c_src, 0) AS c_src,
             a.c_all - coalesce(p.c_src, 0) AS c_rest
      FROM srcs s CROSS JOIN pv_all a
      LEFT JOIN pv_src p ON p.source = s.source AND p.n_chars = a.n_chars
    ), cum AS (
      SELECT source,
             sum(c_src) OVER (PARTITION BY source) AS n1,
             sum(c_rest) OVER (PARTITION BY source) AS n2,
             abs(sum(c_src) OVER (PARTITION BY source ORDER BY n_chars
                                  ROWS UNBOUNDED PRECEDING)
                 * sum(c_rest) OVER (PARTITION BY source)
                 - sum(c_rest) OVER (PARTITION BY source ORDER BY n_chars
                                     ROWS UNBOUNDED PRECEDING)
                 * sum(c_src) OVER (PARTITION BY source)) AS d
      FROM grid
    )
    SELECT source,
           CAST(any_value(n1) AS BIGINT) AS n_source,
           CAST(any_value(n2) AS BIGINT) AS n_rest,
           CAST(max(d) AS BIGINT) AS ks_scaled,
           floor(CAST(max(d) AS DOUBLE) / (any_value(n1) * any_value(n2))
                 * 10000 + 0.5) / 10000 AS ks_stat
    FROM cum
    GROUP BY source
    ORDER BY source
"""


def join_volume_shipping_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape — volume shipping between two trading nations:
    revenue by (supplier nation, customer nation, ship year) for the
    ordered pairs (NATION_3→NATION_2, NATION_2→NATION_3 — chosen non-empty at sf0.001, where supplier nations are sparse, so the parity test is never vacuous) over a 2-year
    ship window. The plan is the classic 5-way star: lineitem carries
    both a supplier-side and a customer-side dimension chain, so the
    fact shuffles ONCE per chain key while all four dims broadcast;
    the nation-pair disjunction prunes after the broadcast joins (a
    25×25 predicate, never a join). Revenue in exact cents."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = nation.select(
        F.col("n_nationkey").alias("_sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("_cn_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("_sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("_cn_key"))
        .where(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_3"))
        )
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year")
        )
        .agg(
            (
                F.sum(rnd_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
                / 100.0
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_VOLUME_SHIPPING_ORACLE = """
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT))
             / 100.0 AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_3'))
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
"""


def join_market_share_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape — NATION_3's market share of PROMO-part revenue
    sold to ASIA customers, per order year: the two-conditional-sums-
    then-divide pattern (share = Σ·[supplier∈nation] / Σ) computed in
    exact integer cents on both sides of the ratio, so the 4dp share
    is one deterministic division. Six-table star, every dimension
    broadcast, fact shuffled only on its join keys; the CASE keeps a
    single aggregation pass instead of two plans."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO").select("p_partkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    cn = nation.select(F.col("n_nationkey").alias("_cn_key"), F.col("n_regionkey").alias("_cr_key"))
    sn = nation.select(F.col("n_nationkey").alias("_sn_key"), F.col("n_name").alias("_supp_nation"))
    vol = rnd_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("_cn_key"))
        .join(F.broadcast(region), F.col("_cr_key") == F.col("r_regionkey"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("_sn_key"))
    )
    num = F.sum(F.when(F.col("_supp_nation") == "NATION_3", vol).otherwise(F.lit(0)))
    den = F.sum(vol)
    return (
        joined.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (num / 100.0).alias("nation_revenue"),
            (den / 100.0).alias("total_revenue"),
            (F.floor(num / den * 10000 + F.lit(0.5)) / 10000.0).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


_MARKET_SHARE_ORACLE = """
    WITH j AS (
      SELECT year(o_orderdate) AS o_year,
             CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS vol,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
    )
    SELECT CAST(o_year AS BIGINT) AS o_year,
           sum(CASE WHEN supp_nation = 'NATION_3' THEN vol ELSE 0 END) / 100.0
             AS nation_revenue,
           sum(vol) / 100.0 AS total_revenue,
           floor(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN vol ELSE 0 END) AS DOUBLE)
                 / sum(vol) * 10000 + 0.5) / 10000 AS mkt_share
    FROM j
    GROUP BY o_year
    ORDER BY o_year
"""


def agg_customer_distribution_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape — the customer order-count distribution: LEFT
    join customers to a FILTERED orders subset (priorities below HIGH),
    count per customer INCLUDING the zero bucket (the left join is the
    whole point — an inner join silently drops never-ordered customers
    from the histogram), then histogram the counts. Two shuffles
    (custkey, then the ≤ tens-of-buckets count agg)."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").where(
        ~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).select("o_orderkey", "o_custkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy(F.col("c_count").cast("long").alias("c_count"))
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


_CUSTOMER_DISTRIBUTION_ORACLE = """
    WITH per AS (
      SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
        AND o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      GROUP BY c_custkey
    )
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM per
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
"""


def join_large_volume_customer_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape — large-volume customers: orders whose total
    line quantity exceeds 260 (the ~p99 at this data's shape), joined
    back to customer and orders for the report row. The HAVING-subquery
    becomes an agg + semi-shaped inner join on orderkey: the fact
    aggregates FIRST (6M→15k rows at sf0.01 before any wide join — the
    order that survives 100 TB). Quantities are integral doubles; the
    sum casts to BIGINT exactly on both engines. Top-100 by totalprice
    with the orderkey tiebreak."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").cast("long").alias("sum_qty"))
        .where(F.col("sum_qty") > 260)
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


_LARGE_VOLUME_ORACLE = """
    WITH big AS (
      SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS sum_qty
      FROM lineitem
      GROUP BY l_orderkey
      HAVING sum(l_quantity) > 260
    )
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
    FROM big
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
"""


def agg_disjunctive_revenue_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape — the disjunctive-predicate revenue aggregate:
    three OR'd (brand, size-band, quantity-band) branches across the
    part–lineitem join. The optimizer test baked into the query: the
    common conjuncts (size ≥ 1, the quantity hull [1, 30]) are
    factorable out of the disjunction and must reach the scans as
    pushed filters while the residual OR evaluates post-join; part
    broadcasts. One row out, exact cents."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    qty = F.col("l_quantity")
    branch = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & qty.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & qty.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15) & qty.between(20, 30))
    )
    return j.where(branch).agg(
        F.count("*").alias("n_items"),
        (
            F.sum(rnd_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))) / 100.0
        ).alias("revenue"),
    )


_DISJUNCTIVE_REVENUE_ORACLE = """
    SELECT CAST(count(*) AS BIGINT) AS n_items,
           sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT))
             / 100.0 AS revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
"""


def join_sales_opportunity_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape — dormant high-balance customers: per nation,
    the count and total balance of customers whose balance beats the
    positive-balance average but placed NO order in the final year
    (every customer here has SOME order, so the classic no-orders
    anti-join adapts to a date-bounded one — semantics preserved, the
    anti join is still the load-bearing operator). The average enters
    CROSS-MULTIPLIED (cents·count > total-cents), so the threshold
    compare is exact integers — no float average at all. 1-row
    broadcast aggregate (whitelisted device) + broadcast anti join of
    the recent-buyer key set; balances sum in exact cents."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    recent = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    pos = cust.where(F.col("c_acctbal") > 0).agg(
        F.sum(rnd_cents("c_acctbal")).alias("_tot_cents"),
        F.count("*").alias("_n_pos"),
    )
    rich = (
        cust.crossJoin(F.broadcast(pos))
        .where(rnd_cents("c_acctbal") * F.col("_n_pos") > F.col("_tot_cents"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
    )
    return (
        rich.join(F.broadcast(nation), rich.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_custs"),
            (F.sum(rnd_cents("c_acctbal")) / 100.0).alias("total_acctbal"),
        )
        .orderBy("n_name")
    )


_SALES_OPPORTUNITY_ORACLE = """
    WITH pos AS (
      SELECT sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS tot_cents,
             CAST(count(*) AS BIGINT) AS n_pos
      FROM customer WHERE c_acctbal > 0
    )
    SELECT n_name,
           CAST(count(*) AS BIGINT) AS n_custs,
           sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) / 100.0 AS total_acctbal
    FROM customer, pos
    JOIN nation ON c_nationkey = n_nationkey
    WHERE CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) * n_pos > tot_cents
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2001-01-01'
      )
    GROUP BY n_name
    ORDER BY n_name
"""


def join_min_cost_supplier_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape — the min-cost supplier per part, adapted to this
    schema (no partsupp table: the observed unit price from lineitem —
    Σ extendedprice-cents / Σ quantity per (part, supplier) — plays
    ps_supplycost). The correlated MIN subquery becomes a window rank
    over the (part, supplier) aggregate: ONE shuffle on partkey serves
    both the min and the tiebreak (supplier id asc — Q2's tiebreak
    rule), where a self-join-against-the-min would shuffle twice. Unit
    price is a ratio of exact integers (deterministic division), shown
    4dp; small-size parts only to bound the report."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    part = load_table(spark, sf_dir, "part").where(F.col("p_size") <= 5).select(
        "p_partkey", "p_name", "p_size"
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per_ps = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_partkey", "p_name", "p_size", "l_suppkey")
        .agg(
            F.sum(rnd_cents("l_extendedprice")).alias("_cents"),
            F.sum("l_quantity").cast("long").alias("_qty"),
        )
        .withColumn("_unit", F.col("_cents") / F.col("_qty"))
    )
    w = Window.partitionBy("p_partkey").orderBy(F.col("_unit").asc(), F.col("l_suppkey").asc())
    best = per_ps.withColumn("_rk", F.row_number().over(w)).where(F.col("_rk") == 1)
    return (
        best.join(F.broadcast(supp), best.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            "p_partkey",
            "p_name",
            F.col("p_size").cast("long").alias("p_size"),
            F.col("l_suppkey").alias("s_suppkey"),
            "s_name",
            "n_name",
            (F.floor(F.col("_unit") * 100 + F.lit(0.5)) / 10000.0).alias("unit_price"),
        )
        .orderBy("p_partkey")
    )


_MIN_COST_SUPPLIER_ORACLE = """
    WITH per AS (
      SELECT p_partkey, p_name, p_size, l_suppkey,
             sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS cents,
             CAST(sum(l_quantity) AS BIGINT) AS qty
      FROM lineitem
      JOIN part ON l_partkey = p_partkey AND p_size <= 5
      GROUP BY 1, 2, 3, 4
    ), ranked AS (
      SELECT *, CAST(cents AS DOUBLE) / qty AS unit,
             row_number() OVER (PARTITION BY p_partkey
                                ORDER BY CAST(cents AS DOUBLE) / qty ASC,
                                         l_suppkey ASC) AS rk
      FROM per
    )
    SELECT p_partkey, p_name, CAST(p_size AS BIGINT) AS p_size,
           l_suppkey AS s_suppkey, s_name, n_name,
           floor(unit * 100 + 0.5) / 10000 AS unit_price
    FROM ranked
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE rk = 1
    ORDER BY p_partkey
"""


def agg_product_profit_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape — product-line profit by supplier nation and
    year, adapted (no ps_supplycost: cost is modeled as 50% of the
    part's retail price per unit — the fixed-margin convention,
    exact in cents by construction). Profit = revenue-cents −
    unit-cost-cents·quantity, summed as INTEGERS, so the nation×year
    cells are exact regardless of partition order. The name filter
    ('%widget%') prunes part before the fact join; part broadcasts;
    orders joins only for the year column."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like("%widget%")
    ).select("p_partkey", "p_retailprice")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    amount = rnd_cents(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ) - rnd_cents(F.col("p_retailprice") * 0.5) * F.col("l_quantity").cast("long")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg((F.sum(amount) / 100.0).alias("profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


_PRODUCT_PROFIT_ORACLE = """
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)
               - CAST(floor(p_retailprice * 0.5 * 100 + 0.5) AS BIGINT)
                 * CAST(l_quantity AS BIGINT)) / 100.0 AS profit
    FROM lineitem
    JOIN part ON l_partkey = p_partkey AND p_name LIKE '%widget%'
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1, 2
    ORDER BY nation, o_year DESC
"""


def agg_important_parts_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape — important-stock concentration: the revenue
    each part drew through EUROPE-region suppliers, keeping parts
    whose share of that total exceeds 0.1%. The HAVING-against-a-
    global-aggregate compares CROSS-MULTIPLIED integers
    (part-cents·1000 > total-cents) via the 1-row broadcast device —
    no float fraction, no second scan of the fact (the per-part agg
    feeds both the total and the filter). Supplier/nation/region all
    broadcast; ONE fact shuffle on partkey."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    eu_li = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    per_part = eu_li.groupBy("l_partkey").agg(
        F.sum(rnd_cents("l_extendedprice")).alias("_cents")
    )
    total = per_part.agg(F.sum("_cents").alias("_total_cents"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("_cents") * 1000 > F.col("_total_cents"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("_cents") / 100.0).alias("part_value"),
            (
                F.floor(F.col("_cents") / F.col("_total_cents") * 1000000 + F.lit(0.5))
                / 1000000.0
            ).alias("value_share"),
        )
        .orderBy(F.col("part_value").desc(), "p_partkey")
    )


_IMPORTANT_PARTS_ORACLE = """
    WITH eu AS (
      SELECT l_partkey,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
    ), per AS (
      SELECT l_partkey, sum(cents) AS cents FROM eu GROUP BY 1
    ), tot AS (SELECT sum(cents) AS total_cents FROM per)
    SELECT l_partkey AS p_partkey,
           cents / 100.0 AS part_value,
           floor(CAST(cents AS DOUBLE) / total_cents * 1000000 + 0.5) / 1000000
             AS value_share
    FROM per, tot
    WHERE cents * 1000 > total_cents
    ORDER BY part_value DESC, p_partkey
"""


def agg_supplier_relation_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape — supplier breadth per product segment: how many
    DISTINCT suppliers ship each (brand, type, size) combination, for a
    size probe-list, excluding one brand and excluding suppliers in
    arrears (acctbal < 0 plays Q16's complaint exclusion). The
    count-distinct rides the (brand, type, size, suppkey) pre-distinct
    — Spark plans it as two-level partial aggs, no expensive exact
    distinct over the raw fact. Part and the supplier EXCLUSION list
    both broadcast; the exclusion is an anti join, Q16's NOT IN."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22, 25)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = load_table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


_SUPPLIER_RELATION_ORACLE = """
    SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22, 25)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def join_part_promotion_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape — dominant suppliers of promotable parts:
    suppliers who shipped MORE THAN HALF of a 'small %'-named part's
    total 1997 volume (no partsupp availqty: the >50%-of-part-volume
    dominance test replaces availqty > half-of-shipped — the nested
    two-level aggregation survives intact). Quantities are integral →
    the 2·supplier_qty > part_qty compare is exact integers. Inner
    query: ONE shuffle on partkey serves the per-(part,supplier) agg,
    the window total, and the dominance filter; the outer semi join
    dedups to suppliers; nation broadcast for the report."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like("small %")
    ).select("p_partkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per_ps = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").cast("long").alias("_sqty"))
    )
    w = Window.partitionBy("p_partkey")
    dominant = (
        per_ps.withColumn("_pqty", F.sum("_sqty").over(w))
        .where(2 * F.col("_sqty") > F.col("_pqty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(dominant, supp.s_suppkey == dominant.l_suppkey, "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


_PART_PROMOTION_ORACLE = """
    WITH li97 AS (
      SELECT l_partkey, l_suppkey, l_quantity
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
    ), per AS (
      SELECT p_partkey, l_suppkey, CAST(sum(l_quantity) AS BIGINT) AS sqty
      FROM li97
      JOIN part ON l_partkey = p_partkey AND p_name LIKE 'small %'
      GROUP BY 1, 2
    ), dom AS (
      SELECT DISTINCT l_suppkey FROM (
        SELECT l_suppkey, sqty, sum(sqty) OVER (PARTITION BY p_partkey) AS pqty
        FROM per
      ) WHERE 2 * sqty > pqty
    )
    SELECT s_suppkey, s_name, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (SELECT l_suppkey FROM dom)
    ORDER BY s_suppkey
"""


_BM25_TERMS = ("dup", "spark", "merge", "vector")  # df mix: rare + 3 common


def text_bm25_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25-structured top-20 retrieval (operators/retrieval.py) for a
    fixed mixed-df term set — the query-side twin of llm_tfidf_top_terms.
    The rational-idf surrogate keeps every per-(doc,term) contribution a
    fixed integer-atom expression tree, floor-scaled ×10⁶, so the
    per-doc score is an INTEGER sum and the oracle replicates the
    ENTIRE score including the ranking (the operator docstring derives
    the cross-multiplied k1=1.2/b=0.75 form). Rare term 'dup' (5% df)
    dominates, as BM25 should."""
    from spotify_data_pipeline_spark.operators.retrieval import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, _BM25_TERMS, k=20)


_BM25_ORACLE = f"""
    WITH t AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
      FROM documents WHERE length(trim(text)) > 0
    ), dl AS (
      SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM t
    ), tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS tt FROM dl
    ), post AS (
      SELECT doc_id, unnest(toks) AS term FROM t
    ), tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM post
      WHERE term IN ('dup', 'spark', 'merge', 'vector')
      GROUP BY 1, 2
    ), dft AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
    ), c AS (
      SELECT tf.doc_id,
             -- parenthesization mirrors the Spark tree EXACTLY:
             -- idf * (22*tf / den) * 1e6, never (idf * 22*tf) / den —
             -- a different IEEE association can flip floor() by 1 ulp
             CAST(floor(((2 * n - 2 * df + 1) / (2 * df + 1))
                        * ((22 * tf)
                           / (10 * tf + 3 + 9 * ((dl * n) / CAST(tt AS DOUBLE))))
                        * 1000000) AS BIGINT) AS cs
      FROM tf
      JOIN dft USING (term)
      JOIN dl USING (doc_id), tot
    )
    SELECT doc_id,
           CAST(sum(cs) AS BIGINT) AS score_scaled,
           floor(sum(cs) / 100.0 + 0.5) / 10000 AS score
    FROM c
    GROUP BY doc_id
    ORDER BY score_scaled DESC, doc_id
    LIMIT 20
"""


def text_boolean_search_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive boolean retrieval: every document containing ALL of
    a 3-term query, by posting-list intersection (distinct-term count
    == |terms| — operators/retrieval.py). One explode scan pruned by
    the term filter BEFORE the shuffle, one doc-keyed agg."""
    from spotify_data_pipeline_spark.operators.retrieval import boolean_and_search

    docs = load_table(spark, sf_dir, "documents")
    return boolean_and_search(docs, ("spark", "window", "key"))


_BOOLEAN_SEARCH_ORACLE = """
    WITH t AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
      FROM documents WHERE length(trim(text)) > 0
    ), post AS (
      SELECT doc_id, unnest(toks) AS term FROM t
    ), hits AS (
      SELECT doc_id,
             count(DISTINCT term) AS n_terms,
             CAST(count(*) AS BIGINT) AS n_hits
      FROM post
      WHERE term IN ('spark', 'window', 'key')
      GROUP BY doc_id
    )
    SELECT doc_id, n_hits FROM hits WHERE n_terms = 3 ORDER BY doc_id
"""


def text_typicality_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-typicality report (operators/retrieval.py): per document
    the mean token document-frequency and the rare-token ratio
    (df < 5% of docs) — the CCNet-style frequency-band curation signal
    without log-perplexity (not cross-engine exact; the operator
    docstring). df joins term-keyed (vocabulary never broadcast);
    ratios divide exact integers, 4dp."""
    from spotify_data_pipeline_spark.operators.retrieval import token_typicality

    docs = load_table(spark, sf_dir, "documents")
    return token_typicality(docs, rare_pct=5)


_TYPICALITY_ORACLE = """
    WITH t AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
      FROM documents WHERE length(trim(text)) > 0
    ), post AS (
      SELECT doc_id, unnest(toks) AS term FROM t
    ), dft AS (
      SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM post GROUP BY 1
    ), nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM t)
    SELECT p.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           floor(CAST(sum(df) AS DOUBLE) / count(*) * 10000 + 0.5) / 10000 AS mean_df,
           floor(CAST(sum(CASE WHEN df * 100 < n_docs * 5 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*) * 10000 + 0.5) / 10000 AS rare_ratio
    FROM post p
    JOIN dft USING (term), nd
    GROUP BY p.doc_id
    ORDER BY p.doc_id
"""


def graph_kcore_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core of the part co-order graph after two synchronous peel
    rounds (operators/kcore.py) — the graph family's DENSITY axis: the
    tightly co-ordered part nucleus once degree-1 fringe (and whatever
    the first strip exposes) is gone. Same bounded 1997-H1 graph
    window as graph_hop_distance; the peel strips 95→9 nodes at
    sf0.001 (835→153 at sf0.01), so the query exercises real removal,
    not a fixed point. Fixed rounds keep it unrolled-SQL replicable;
    per round one degree agg + one two-sided semi join."""
    from spotify_data_pipeline_spark.operators.kcore import kcore_peel
    from spotify_data_pipeline_spark.operators.triangles import cooccurrence_edges

    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey")
    return kcore_peel(edges, k=2, rounds=2).orderBy("node")


_KCORE_ORACLE = """
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-07-01'
    ), sized AS (
      SELECT l_orderkey FROM li GROUP BY l_orderkey
      HAVING count(*) BETWEEN 2 AND 200
    ), e0 AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM li a
      JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      JOIN sized s ON a.l_orderkey = s.l_orderkey
    ), d0 AS (
      SELECT node, count(*) AS deg
      FROM (SELECT src AS node FROM e0 UNION ALL SELECT dst FROM e0)
      GROUP BY node
    ), k0 AS (SELECT node FROM d0 WHERE deg >= 2),
    e1 AS (
      SELECT src, dst FROM e0
      WHERE src IN (SELECT node FROM k0) AND dst IN (SELECT node FROM k0)
    ), d1 AS (
      SELECT node, count(*) AS deg
      FROM (SELECT src AS node FROM e1 UNION ALL SELECT dst FROM e1)
      GROUP BY node
    ), k1 AS (SELECT node FROM d1 WHERE deg >= 2),
    e2 AS (
      SELECT src, dst FROM e1
      WHERE src IN (SELECT node FROM k1) AND dst IN (SELECT node FROM k1)
    )
    SELECT node, CAST(count(*) AS BIGINT) AS degree
    FROM (SELECT src AS node FROM e2 UNION ALL SELECT dst FROM e2)
    GROUP BY node
    ORDER BY node
"""


def orders_ship_latency_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency distribution per order priority — the
    fulfillment SLA report (does URGENT actually ship faster?). Days
    between o_orderdate and each line's l_shipdate in INTEGER day
    arithmetic (epoch floor-division — the interpurchase-gap device),
    then discrete median/p90 per priority (actual data values ⇒
    integer output). One fact-side join on orderkey, one 5-row agg."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    day = lambda c: F.floor(F.col(c).cast("timestamp").cast("long") / 86400)  # noqa: E731
    j = li.join(orders, li.l_orderkey == orders.o_orderkey).withColumn(
        "_lat", day("l_shipdate") - day("o_orderdate")
    )
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.min("_lat").cast("long").alias("min_days"),
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY _lat)")
            .cast("long")
            .alias("median_days"),
            F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY _lat)")
            .cast("long")
            .alias("p90_days"),
            F.max("_lat").cast("long").alias("max_days"),
        )
        .orderBy("o_orderpriority")
    )


_SHIP_LATENCY_ORACLE = """
    WITH j AS (
      SELECT o_orderpriority,
             floor(epoch(l_shipdate) / 86400) - floor(epoch(o_orderdate) / 86400)
               AS lat
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(min(lat) AS BIGINT) AS min_days,
           CAST(quantile_disc(lat, 0.5) AS BIGINT) AS median_days,
           CAST(quantile_disc(lat, 0.9) AS BIGINT) AS p90_days,
           CAST(max(lat) AS BIGINT) AS max_days
    FROM j
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""


def events_dow_hour_heatmap_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour-of-day activity heatmap with each cell's
    share of its weekday — the 2-D seasonality profile behind staffing
    and batch-window decisions (the 1-D weekday profile is
    orders_dow_seasonality's). 168-cell hash agg; the within-weekday
    share is a partitioned window over the agg (ratio-to-report in 2
    dims); exact integer counts, 4dp display ratio."""
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.dayofweek("ts").cast("long").alias("dow"),
        F.hour("ts").cast("long").alias("hour"),
    ).agg(F.count("*").alias("n_events"))
    w_dow = Window.partitionBy("dow")
    return (
        cells.select(
            "dow",
            "hour",
            "n_events",
            (
                F.floor(F.col("n_events") / F.sum("n_events").over(w_dow) * 10000 + F.lit(0.5))
                / 10000.0
            ).alias("dow_share"),
        )
        .orderBy("dow", "hour")
    )


_DOW_HOUR_HEATMAP_ORACLE = """
    WITH c AS (
      SELECT CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
             CAST(hour(ts) AS BIGINT) AS hour,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    )
    SELECT dow, hour, n_events,
           floor(CAST(n_events AS DOUBLE) / sum(n_events) OVER (PARTITION BY dow)
                 * 10000 + 0.5) / 10000 AS dow_share
    FROM c
    ORDER BY dow, hour
"""


def agg_prorata_allocation_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder pro-rata allocation (operators/allocation.py):
    split a fixed 1,000,000-cent budget across nations proportionally
    to order revenue so the rounded parts SUM EXACTLY to the budget —
    the billing/settlement primitive where naive per-row rounding
    drifts by ±n/2 cents. Hamilton's method in pure 64-bit INTEGER
    arithmetic (the operator docstring derives it; quota + exact-sum
    properties hypothesis-pinned in tests/test_allocation.py). One
    fact agg + two windows over the 25-row group frame."""
    from spotify_data_pipeline_spark.operators.allocation import (
        largest_remainder_allocation,
    )

    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per_nation = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(rnd_cents("o_totalprice")).alias("_cents"))
    )
    return (
        largest_remainder_allocation(
            per_nation, "n_name", "_cents", 1_000_000, out_col="alloc_cents"
        )
        .select(
            "n_name",
            (F.col("_cents") / 100.0).alias("revenue"),
            "alloc_cents",
        )
        .orderBy("n_name")
    )


_PRORATA_ORACLE = """
    WITH per AS (
      SELECT n_name,
             sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name
    ), t AS (
      SELECT n_name, cents,
             sum(cents) OVER () AS total,
             (1000000 * cents) // sum(cents) OVER () AS base,
             (1000000 * cents) % sum(cents) OVER () AS rem
      FROM per
    ), r AS (
      SELECT *,
             row_number() OVER (ORDER BY rem DESC, n_name) AS rk,
             1000000 - sum(base) OVER () AS leftover
      FROM t
    )
    SELECT n_name,
           cents / 100.0 AS revenue,
           CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
             AS alloc_cents
    FROM r
    ORDER BY n_name
"""


def events_bounce_rate_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate: the fraction of sessions containing exactly
    one event, by the day the session STARTED — the engagement-quality
    headline no per-event metric captures (the sessionization rule is
    the shared 30-minute microsecond-exact lag gap). Two windows
    (sessionize, then one first-value pass folded into the session
    agg) + a per-day agg; ratio of exact integers, 4dp."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    _us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = _us - F.lag(_us).over(wu)
    new_s = F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0)
    sess = ev.withColumn("_sid", F.sum(new_s).over(wu))
    per_sess = sess.groupBy("user_id", "_sid").agg(
        F.count("*").alias("_n"), F.min("ts").alias("_start")
    )
    per_day = per_sess.groupBy(F.date_trunc("DAY", "_start").alias("day")).agg(
        F.count("*").alias("n_sessions"),
        F.sum((F.col("_n") == 1).cast("long")).alias("n_bounces"),
    )
    return (
        per_day.select(
            "day",
            "n_sessions",
            "n_bounces",
            (
                F.floor(F.col("n_bounces") / F.col("n_sessions") * 10000 + F.lit(0.5))
                / 10000.0
            ).alias("bounce_rate"),
        )
        .orderBy("day")
    )


_BOUNCE_RATE_ORACLE = """
    WITH s AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sid AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM s
    ), per_sess AS (
      SELECT user_id, sid, CAST(count(*) AS BIGINT) AS n, min(ts) AS start
      FROM sid GROUP BY 1, 2
    ), per_day AS (
      SELECT date_trunc('day', start) AS day,
             CAST(count(*) AS BIGINT) AS n_sessions,
             CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces
      FROM per_sess GROUP BY 1
    )
    SELECT day, n_sessions, n_bounces,
           floor(CAST(n_bounces AS DOUBLE) / n_sessions * 10000 + 0.5) / 10000
             AS bounce_rate
    FROM per_day
    ORDER BY day
"""


def setop_bag_ops_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set operations — EXCEPT ALL / INTERSECT ALL with
    true multiplicity accounting (the relational suite's U3 covers the
    DISTINCT forms; multiplicities are what inventory-reconciliation
    actually needs: '3 shipped in H1, 1 in H2' must survive as 2, not
    1). Part-key shipment bags for 1997-H1 vs 1997-H2 → exceptAll +
    intersectAll, re-aggregated per key into a labeled report (the
    row-level multiset is order-unstable; the (op, key, n) rollup is
    deterministic). Spark plans both as hash aggregates on the key —
    no sort-based multiset diff at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_shipdate")
    h1 = li.where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    ).select("l_partkey")
    h2 = li.where(
        (F.col("l_shipdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_partkey")
    surplus = (
        h1.exceptAll(h2)
        .groupBy("l_partkey")
        .agg(F.count("*").alias("n"))
        .withColumn("op", F.lit("h1_surplus"))
    )
    common = (
        h1.intersectAll(h2)
        .groupBy("l_partkey")
        .agg(F.count("*").alias("n"))
        .withColumn("op", F.lit("both"))
    )
    return (
        surplus.unionByName(common)
        .select("op", "l_partkey", "n")
        .orderBy("op", "l_partkey")
    )


_BAG_OPS_ORACLE = """
    WITH h1 AS (
      SELECT l_partkey FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-07-01'
    ), h2 AS (
      SELECT l_partkey FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-07-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
    ), surplus AS (
      SELECT l_partkey FROM h1 EXCEPT ALL SELECT l_partkey FROM h2
    ), common AS (
      SELECT l_partkey FROM h1 INTERSECT ALL SELECT l_partkey FROM h2
    )
    SELECT 'h1_surplus' AS op, l_partkey, CAST(count(*) AS BIGINT) AS n
    FROM surplus GROUP BY l_partkey
    UNION ALL
    SELECT 'both' AS op, l_partkey, CAST(count(*) AS BIGINT) AS n
    FROM common GROUP BY l_partkey
    ORDER BY op, l_partkey
"""


def events_streak_lengths_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the textbook
    GAPS-AND-ISLANDS pattern (day_number − row_number is constant
    within an island), the engagement metric DAU/WAU can't see. All
    integer day arithmetic: distinct active days → island id via the
    subtraction trick (row_number suffices — days are distinct) → one
    agg for streak lengths → one agg for the per-user profile. Two
    shuffles, both on user-derived keys; top-50 streakiest users with
    the user-id tiebreak."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    days = ev.select(
        "user_id",
        F.floor(F.col("ts").cast("long") / 86400).alias("_day"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("_day")
    islands = days.withColumn(
        "_island", F.col("_day") - F.row_number().over(w)
    )
    streaks = islands.groupBy("user_id", "_island").agg(F.count("*").alias("_len"))
    return (
        streaks.groupBy("user_id")
        .agg(
            F.sum("_len").cast("long").alias("n_active_days"),
            F.max("_len").cast("long").alias("longest_streak"),
            F.count("*").alias("n_streaks"),
        )
        .orderBy(F.col("longest_streak").desc(), "user_id")
        .limit(50)
    )


_STREAK_ORACLE = """
    WITH days AS (
      SELECT DISTINCT user_id, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
      FROM events
    ), isl AS (
      SELECT user_id, day,
             day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS island
      FROM days
    ), streaks AS (
      SELECT user_id, island, CAST(count(*) AS BIGINT) AS len
      FROM isl GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(sum(len) AS BIGINT) AS n_active_days,
           CAST(max(len) AS BIGINT) AS longest_streak,
           CAST(count(*) AS BIGINT) AS n_streaks
    FROM streaks
    GROUP BY user_id
    ORDER BY longest_streak DESC, user_id
    LIMIT 50
"""


def events_interarrival_hist_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two latency histogram of per-user inter-event gaps —
    the observability primitive (HdrHistogram's log buckets) with the
    bucket id computed as ``length(bin(gap_µs))`` ≡ 64−clz: a pure
    integer/string device BOTH engines evaluate identically, where
    floor(log2(x)) on doubles disagrees at power-of-two boundaries
    (the Benford lesson: never put a float log near a boundary). One
    lag window + one ≤64-cell hash agg; per-bucket min/max in exact
    microseconds pin the bucket edges."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    _us = F.unix_micros(F.col("ts").cast("timestamp"))
    gaps = ev.withColumn("_gap", _us - F.lag(_us).over(w)).where(
        F.col("_gap").isNotNull()
    )
    bucket = F.length(F.bin(F.col("_gap"))).cast("long")
    return (
        gaps.groupBy(bucket.alias("log2_bucket"))
        .agg(
            F.count("*").alias("n_gaps"),
            F.min("_gap").cast("long").alias("min_gap_us"),
            F.max("_gap").cast("long").alias("max_gap_us"),
        )
        .orderBy("log2_bucket")
    )


_INTERARRIVAL_ORACLE = """
    WITH g AS (
      SELECT epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
      FROM events
    )
    SELECT CAST(length(bin(gap)) AS BIGINT) AS log2_bucket,
           CAST(count(*) AS BIGINT) AS n_gaps,
           CAST(min(gap) AS BIGINT) AS min_gap_us,
           CAST(max(gap) AS BIGINT) AS max_gap_us
    FROM g
    WHERE gap IS NOT NULL
    GROUP BY 1
    ORDER BY 1
"""


def orders_yoy_growth_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per nation — the lag-over-
    aggregate report shape (agg to (nation, year) cents, ONE ordered
    window per nation for the prior year, growth as a 4dp ratio of
    exact integers). First year emits NULL growth (no prior), which
    the oracle must reproduce — the null-semantics pin. Lag is by
    POSITION within consecutive years present in the data (the data
    has every year populated; a calendar-spine gap-fill variant is
    events_gap_fill's job)."""
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.sum(rnd_cents("o_totalprice")).alias("_cents"))
    )
    w = Window.partitionBy("n_name").orderBy("o_year")
    prev = F.lag("_cents").over(w)
    return (
        per.select(
            "n_name",
            "o_year",
            (F.col("_cents") / 100.0).alias("revenue"),
            F.when(
                prev.isNotNull(),
                F.floor((F.col("_cents") - prev) / prev * 10000 + F.lit(0.5)) / 10000.0,
            ).alias("yoy_growth"),
        )
        .orderBy("n_name", "o_year")
    )


_YOY_GROWTH_ORACLE = """
    WITH per AS (
      SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
             sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1, 2
    )
    SELECT n_name, o_year,
           cents / 100.0 AS revenue,
           CASE WHEN lag(cents) OVER w IS NOT NULL
                THEN floor(CAST(cents - lag(cents) OVER w AS DOUBLE)
                           / lag(cents) OVER w * 10000 + 0.5) / 10000
           END AS yoy_growth
    FROM per
    WINDOW w AS (PARTITION BY n_name ORDER BY o_year)
    ORDER BY n_name, o_year
"""


def window_distribution_suite_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions — percent_rank and cume_dist over
    order totals within each priority class, built EXPLICITLY from
    rank/count atoms ((rank−1)/(n−1); peers-inclusive RANGE-frame
    count / n) rather than the engines' built-ins, so the expression
    tree — and therefore every IEEE division — is pinned on both
    sides (built-ins agree in definition but not provably in
    evaluation shape). Completes the W-family: ranking (W-rank),
    analytic (W-analytic), frames (W-frames), distribution (here).
    Cents are the ordering key: ties are REAL (same price ⇒ same
    percentile, pinned by the peers-frame) and the row set stays
    deterministic via the orderkey output sort. Top-priced 200 rows
    per the global sort for a bounded report."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    cents = rnd_cents("o_totalprice")
    base = orders.select("o_orderkey", "o_orderpriority", cents.alias("_cents"))
    wp = Window.partitionBy("o_orderpriority")
    w_rank = wp.orderBy("_cents")
    w_peers = wp.orderBy("_cents").rangeBetween(Window.unboundedPreceding, 0)
    n = F.count("*").over(wp)
    rk = F.rank().over(w_rank)
    le_peers = F.count("*").over(w_peers)
    return (
        base.select(
            "o_orderkey",
            "o_orderpriority",
            (F.col("_cents") / 100.0).alias("total_price"),
            (F.floor((rk - 1) / (n - 1) * 10000 + F.lit(0.5)) / 10000.0).alias(
                "pct_rank"
            ),
            (F.floor(le_peers / n * 10000 + F.lit(0.5)) / 10000.0).alias("cume_dist"),
        )
        .orderBy(F.col("total_price").desc(), "o_orderkey")
        .limit(200)
    )


_DISTRIBUTION_SUITE_ORACLE = """
    WITH base AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    ), scored AS (
      SELECT o_orderkey, o_orderpriority, cents,
             rank() OVER (PARTITION BY o_orderpriority ORDER BY cents) AS rk,
             count(*) OVER (PARTITION BY o_orderpriority) AS n,
             count(*) OVER (PARTITION BY o_orderpriority ORDER BY cents
                            RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS le_peers
      FROM base
    )
    SELECT o_orderkey, o_orderpriority,
           cents / 100.0 AS total_price,
           floor(CAST(rk - 1 AS DOUBLE) / (n - 1) * 10000 + 0.5) / 10000 AS pct_rank,
           floor(CAST(le_peers AS DOUBLE) / n * 10000 + 0.5) / 10000 AS cume_dist
    FROM scored
    ORDER BY total_price DESC, o_orderkey
    LIMIT 200
"""


def etl_surrogate_keys_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-based surrogate key wiring — the warehouse-modeling (Data
    Vault) primitive: md5 over pipe-delimited natural keys mints
    stable, engine-independent surrogate keys for the customer and
    order grains, and the fact row carries both hub keys plus its own
    link key. md5 (not xxhash64) is the deliberate choice: DuckDB
    computes it identically, so key minting itself is oracle-provable
    (the KMV/passage device). Map-only over the join — no extra
    shuffle beyond the fact-dim equi join; top-100 by order key for a
    bounded report."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    sk = lambda *cols: F.md5(F.concat_ws("|", *[F.col(c).cast("string") for c in cols]))  # noqa: E731
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "o_orderkey",
            sk("c_custkey").alias("customer_sk"),
            sk("o_orderkey").alias("order_sk"),
            sk("o_orderkey", "c_custkey", "c_nationkey").alias("link_sk"),
        )
        .orderBy("o_orderkey")
        .limit(100)
    )


_SURROGATE_KEYS_ORACLE = """
    SELECT o_orderkey,
           md5(CAST(c_custkey AS VARCHAR)) AS customer_sk,
           md5(CAST(o_orderkey AS VARCHAR)) AS order_sk,
           md5(CAST(o_orderkey AS VARCHAR) || '|' || CAST(c_custkey AS VARCHAR)
               || '|' || CAST(c_nationkey AS VARCHAR)) AS link_sk
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    ORDER BY o_orderkey
    LIMIT 100
"""


def cdc_orders_diff_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared surface for table_diff (operators/upsert.py — NS-33,
    previously pytest-only): reconcile the orders table against a
    deterministically perturbed in-plan twin — keys ≡0 mod 997 removed,
    keys ≡0 mod 101 status-mutated, keys ≡0 mod 499 re-minted as
    additions under a shifted key. The digests the operator joins on
    are xxhash64 (never emitted here — only the keys and labels), and
    the oracle labels the SAME keys from direct value comparison, so
    the query driver-proves that digest-equality reconciliation agrees
    with raw-value reconciliation end-to-end (up to the documented
    2⁻⁶⁴ digest-collision caveat). ONE full-outer join on the key,
    8-byte digests on the wire."""
    from spotify_data_pipeline_spark.operators.upsert import table_diff

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    kept = orders.where(F.col("o_orderkey") % 997 != 0)
    mutated = kept.withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 101 == 0, F.lit("X")).otherwise(
            F.col("o_orderstatus")
        ),
    )
    added = orders.where(F.col("o_orderkey") % 499 == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + 100_000_000
    )
    new = mutated.unionByName(added)
    return (
        table_diff(orders, new, ["o_orderkey"])
        .select("o_orderkey", "change")
        .orderBy("change", "o_orderkey")
    )


_CDC_DIFF_ORACLE = """
    SELECT o_orderkey + 100000000 AS o_orderkey, 'added' AS change
    FROM orders WHERE o_orderkey % 499 = 0
    UNION ALL
    SELECT o_orderkey, 'removed' AS change
    FROM orders WHERE o_orderkey % 997 = 0
    UNION ALL
    SELECT o_orderkey, 'changed' AS change
    FROM orders WHERE o_orderkey % 997 <> 0 AND o_orderkey % 101 = 0
    ORDER BY change, o_orderkey
"""


def fn_bitwise_suite_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar-function coverage — AND / OR / XOR / shifts /
    popcount over the lineitem key columns (the F-family's missing
    integer axis; hash bucketing, bitmap indexes, and the HDR/z-order
    operators all lean on these primitives). Map-only; exact 64-bit
    integers end-to-end."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    a, b = F.col("l_partkey"), F.col("l_suppkey")
    return (
        li.select(
            "l_orderkey",
            F.col("l_linenumber").cast("long").alias("l_linenumber"),
            F.expr("l_partkey & l_suppkey").alias("b_and"),
            F.expr("l_partkey | l_suppkey").alias("b_or"),
            F.expr("l_partkey ^ l_suppkey").alias("b_xor"),
            F.shiftleft(a, 3).cast("long").alias("b_shl"),
            F.shiftright(a, 2).cast("long").alias("b_shr"),
            F.bit_count(a).cast("long").alias("b_pop"),
            (a % 64).alias("b_mod"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


_BITWISE_ORACLE = """
    SELECT l_orderkey,
           CAST(l_linenumber AS BIGINT) AS l_linenumber,
           CAST(l_partkey & l_suppkey AS BIGINT) AS b_and,
           CAST(l_partkey | l_suppkey AS BIGINT) AS b_or,
           CAST(xor(l_partkey, l_suppkey) AS BIGINT) AS b_xor,
           CAST(l_partkey << 3 AS BIGINT) AS b_shl,
           CAST(l_partkey >> 2 AS BIGINT) AS b_shr,
           CAST(bit_count(l_partkey) AS BIGINT) AS b_pop,
           CAST(l_partkey % 64 AS BIGINT) AS b_mod
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber
"""


def events_asof_nearest_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join (operators/asof.py, round-5
    extension — previously a documented gap: only backward/forward) —
    each purchase matched to the CLOSEST same-user click in either
    direction, equidistant ties to the prior click (pandas'
    prior-row preference). Both direction carries run as two window
    passes over the SAME user partitioning: one shuffle, two sorts,
    never an events×events join. The declared backward twin is
    events_asof_join; this pins the nearest semantics the driver has
    not seen."""
    from spotify_data_pipeline_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts")
    joined = asof_join(
        purchases, clicks, on="ts", by="user_id", value_cols=[], direction="nearest"
    )
    return joined.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("ts_right").alias("nearest_click_ts"),
    )


_ASOF_NEAREST_ORACLE = """
    SELECT p.event_id AS purchase_id, p.user_id AS user_id,
           p.ts AS purchase_ts, c.nearest_click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN LATERAL (
      SELECT c.ts AS nearest_click_ts
      FROM events c
      WHERE c.event_type = 'click' AND c.user_id = p.user_id
      ORDER BY abs(epoch_us(c.ts) - epoch_us(p.ts)),
               CASE WHEN c.ts <= p.ts THEN 0 ELSE 1 END
      LIMIT 1
    ) c ON TRUE
"""


PENDING: tuple[PendingQuery, ...] = (
    PendingQuery(
        "events_session_paths",
        events_session_paths_query,
        _SESSION_PATHS_ORACLE,
        tags=("events", "session", "paths", "analytics"),
    ),
    PendingQuery(
        "agg_revenue_share",
        agg_revenue_share_query,
        _REVENUE_SHARE_ORACLE,
        tags=("agg", "window", "ratio-to-report"),
    ),
    PendingQuery(
        "orders_interpurchase_gap",
        orders_interpurchase_gap_query,
        _INTERPURCHASE_ORACLE,
        tags=("analytics", "retention", "percentile", "window"),
    ),
    PendingQuery(
        "events_cusum_days",
        events_cusum_days_query,
        _CUSUM_ORACLE,
        tags=("events", "monitoring", "cusum", "changepoint"),
    ),
    PendingQuery(
        "agg_forecast_revenue",
        agg_forecast_revenue_query,
        _FORECAST_REVENUE_ORACLE,
        tags=("agg", "tpch", "pushdown"),
    ),
    PendingQuery(
        "orders_basket_lift",
        orders_basket_lift_query,
        _BASKET_LIFT_ORACLE,
        tags=("analytics", "basket", "association", "lift"),
    ),
    PendingQuery(
        "orders_dow_seasonality",
        orders_dow_seasonality_query,
        _DOW_SEASONALITY_ORACLE,
        tags=("analytics", "seasonality", "chisquare"),
    ),
    PendingQuery(
        "profile_orders",
        profile_orders_query,
        _PROFILE_ORACLE,
        tags=("profiling", "quality", "discovery"),
    ),
    PendingQuery(
        "graph_hop_distance",
        graph_hop_distance_query,
        _HOP_DISTANCE_ORACLE,
        tags=("graph", "bfs", "distance", "reach"),
    ),
    PendingQuery(
        "orders_benford_digits",
        orders_benford_digits_query,
        _BENFORD_ORACLE,
        tags=("quality", "benford", "fraud"),
    ),
    PendingQuery(
        "llm_ks_drift",
        llm_ks_drift_query,
        _KS_DRIFT_ORACLE,
        tags=("llmops", "drift", "ks", "distribution"),
    ),
    PendingQuery(
        "join_volume_shipping",
        join_volume_shipping_query,
        _VOLUME_SHIPPING_ORACLE,
        tags=("tpch", "q7", "join", "star"),
    ),
    PendingQuery(
        "join_market_share",
        join_market_share_query,
        _MARKET_SHARE_ORACLE,
        tags=("tpch", "q8", "join", "share"),
    ),
    PendingQuery(
        "agg_customer_distribution",
        agg_customer_distribution_query,
        _CUSTOMER_DISTRIBUTION_ORACLE,
        tags=("tpch", "q13", "histogram", "left-join"),
    ),
    PendingQuery(
        "join_large_volume_customer",
        join_large_volume_customer_query,
        _LARGE_VOLUME_ORACLE,
        tags=("tpch", "q18", "having", "topk"),
    ),
    PendingQuery(
        "agg_disjunctive_revenue",
        agg_disjunctive_revenue_query,
        _DISJUNCTIVE_REVENUE_ORACLE,
        tags=("tpch", "q19", "pushdown", "disjunction"),
    ),
    PendingQuery(
        "join_sales_opportunity",
        join_sales_opportunity_query,
        _SALES_OPPORTUNITY_ORACLE,
        tags=("tpch", "q22", "anti-join", "scalar-subquery"),
    ),
    PendingQuery(
        "join_min_cost_supplier",
        join_min_cost_supplier_query,
        _MIN_COST_SUPPLIER_ORACLE,
        tags=("tpch", "q2", "correlated-min", "window"),
    ),
    PendingQuery(
        "agg_product_profit",
        agg_product_profit_query,
        _PRODUCT_PROFIT_ORACLE,
        tags=("tpch", "q9", "star", "profit"),
    ),
    PendingQuery(
        "agg_important_parts",
        agg_important_parts_query,
        _IMPORTANT_PARTS_ORACLE,
        tags=("tpch", "q11", "having-global", "share"),
    ),
    PendingQuery(
        "agg_supplier_relation",
        agg_supplier_relation_query,
        _SUPPLIER_RELATION_ORACLE,
        tags=("tpch", "q16", "count-distinct", "anti-join"),
    ),
    PendingQuery(
        "join_part_promotion",
        join_part_promotion_query,
        _PART_PROMOTION_ORACLE,
        tags=("tpch", "q20", "nested-agg", "semi-join"),
    ),
    PendingQuery(
        "text_bm25_topk",
        text_bm25_topk_query,
        _BM25_ORACLE,
        tags=("text", "retrieval", "bm25", "topk"),
    ),
    PendingQuery(
        "text_boolean_search",
        text_boolean_search_query,
        _BOOLEAN_SEARCH_ORACLE,
        tags=("text", "retrieval", "boolean", "postings"),
    ),
    PendingQuery(
        "text_typicality",
        text_typicality_query,
        _TYPICALITY_ORACLE,
        tags=("text", "curation", "typicality", "frequency"),
    ),
    PendingQuery(
        "graph_kcore",
        graph_kcore_query,
        _KCORE_ORACLE,
        tags=("graph", "kcore", "density", "peel"),
    ),
    PendingQuery(
        "orders_ship_latency",
        orders_ship_latency_query,
        _SHIP_LATENCY_ORACLE,
        tags=("analytics", "sla", "latency", "percentile"),
    ),
    PendingQuery(
        "events_dow_hour_heatmap",
        events_dow_hour_heatmap_query,
        _DOW_HOUR_HEATMAP_ORACLE,
        tags=("events", "seasonality", "heatmap", "window"),
    ),
    PendingQuery(
        "agg_prorata_allocation",
        agg_prorata_allocation_query,
        _PRORATA_ORACLE,
        tags=("agg", "allocation", "largest-remainder", "integer-exact"),
    ),
    PendingQuery(
        "events_bounce_rate",
        events_bounce_rate_query,
        _BOUNCE_RATE_ORACLE,
        tags=("events", "session", "bounce", "engagement"),
    ),
    PendingQuery(
        "setop_bag_ops",
        setop_bag_ops_query,
        _BAG_OPS_ORACLE,
        tags=("setop", "bag", "multiset", "reconciliation"),
    ),
    PendingQuery(
        "events_streak_lengths",
        events_streak_lengths_query,
        _STREAK_ORACLE,
        tags=("events", "gaps-and-islands", "streak", "engagement"),
    ),
    PendingQuery(
        "events_interarrival_hist",
        events_interarrival_hist_query,
        _INTERARRIVAL_ORACLE,
        tags=("events", "histogram", "log-buckets", "latency"),
    ),
    PendingQuery(
        "orders_yoy_growth",
        orders_yoy_growth_query,
        _YOY_GROWTH_ORACLE,
        tags=("analytics", "yoy", "lag-over-agg", "growth"),
    ),
    PendingQuery(
        "window_distribution_suite",
        window_distribution_suite_query,
        _DISTRIBUTION_SUITE_ORACLE,
        tags=("window", "percent-rank", "cume-dist", "distribution"),
    ),
    PendingQuery(
        "etl_surrogate_keys",
        etl_surrogate_keys_query,
        _SURROGATE_KEYS_ORACLE,
        tags=("etl", "surrogate-keys", "data-vault", "md5"),
    ),
    PendingQuery(
        "cdc_orders_diff",
        cdc_orders_diff_query,
        _CDC_DIFF_ORACLE,
        tags=("cdc", "table-diff", "reconciliation", "upsert"),
    ),
    PendingQuery(
        "fn_bitwise_suite",
        fn_bitwise_suite_query,
        _BITWISE_ORACLE,
        tags=("functions", "bitwise", "integer"),
    ),
    PendingQuery(
        "events_asof_nearest",
        events_asof_nearest_query,
        _ASOF_NEAREST_ORACLE,
        tags=("events", "asof", "nearest", "join"),
    ),
)
