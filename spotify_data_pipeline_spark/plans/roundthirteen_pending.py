"""Round-13 declared-query staging area (the established pattern:
built and oracle-verified NOW, deliberately NOT ``declare``d — the
round-5 evidence window is full at 50; activation is registration-only
after ``tools/snapshot_evidence.py`` refreshes).

Each entry: exact-oracle query + DuckDB SQL, exercised by
``tests/test_roundthirteen_pending.py`` with the driver-shaped
comparison.

Wave theme: the remaining *statistics* gaps (nonparametric testing,
rank correlation) plus two surface-parity rows (null-safe equi join,
quartile migration). Everything here follows the house exactness
rules: integer arithmetic wherever a sum's order could matter, 4dp
rounding only on a terminal single division of exact inputs, unique-key
tiebreaks on every rank edge.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.io import load_table
from spotify_data_pipeline_spark.plans.parity import rnd, rnd_cents, rnd_cents_sql, rnd_sql


def events_ab_mannwhitney_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U — the NONPARAMETRIC member of the A/B family
    (events_ab_welch tests means and assumes roughly-normal cells;
    rank tests stay valid under the heavy-tailed value distributions
    real product metrics have). Users split into variants by id parity
    (the deterministic hash-bucketing device shared with
    events_ab_welch/events_ab_srm); per event type, BOTH variants'
    values are ranked together with AVERAGE ranks on ties, and
    U_a = R_a − n_a(n_a+1)/2.

    Exactness: tie-averaged ranks are half-integers, so everything is
    carried as 2× the textbook quantity — r2 = 2·rank is
    2·min_rank + (tie_size − 1) via rank() + a per-(type,value) count
    window, both BIGINT; the driver-compared outputs are the integer
    columns r2sum_a and u2_a (= 2·U_a), plus the exact integer
    cross-check identity column u2_sum = 2·n_a·n_b (U_a + U_b sums to
    n_a·n_b regardless of ties — emitting it driver-pins the tie
    handling on both engines).

    Scale shape: one scan → one rank window partitioned by event_type →
    one hash agg; no joins, nothing corpus-sized broadcast. Honest
    100 TB caveat: event_type is low-cardinality, so each rank
    partition is huge — exact global ranking at that scale goes through
    the two-phase offset ranking in ``operators/batching.py`` (count
    per range-partition, broadcast prefix offsets, rank locally); this
    declared form keeps the driver-provable single-window shape and
    names the swap.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "value", (F.col("user_id") % 2 == 0).cast("int").alias("_a")
    )
    w_rank = Window.partitionBy("event_type").orderBy("value")
    w_tie = Window.partitionBy("event_type", "value")
    ranked = ev.select(
        "event_type",
        "_a",
        (2 * F.rank().over(w_rank) + F.count(F.lit(1)).over(w_tie) - 1)
        .cast("long")
        .alias("_r2"),
    )
    agg = ranked.groupBy("event_type").agg(
        F.sum("_a").cast("long").alias("n_a"),
        F.sum(1 - F.col("_a")).cast("long").alias("n_b"),
        F.sum(F.col("_a") * F.col("_r2")).cast("long").alias("r2sum_a"),
    )
    return agg.select(
        "event_type",
        "n_a",
        "n_b",
        "r2sum_a",
        (F.col("r2sum_a") - F.col("n_a") * (F.col("n_a") + 1)).alias("u2_a"),
        (2 * F.col("n_a") * F.col("n_b")).alias("u2_sum"),
    ).orderBy("event_type")


_MANNWHITNEY_ORACLE = """
    WITH ranked AS (
      SELECT event_type,
             CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS a,
             2 * rank() OVER (PARTITION BY event_type ORDER BY value)
               + count(*) OVER (PARTITION BY event_type, value) - 1 AS r2
      FROM events
    )
    SELECT event_type,
           CAST(sum(a) AS BIGINT)                        AS n_a,
           CAST(sum(1 - a) AS BIGINT)                    AS n_b,
           CAST(sum(a * r2) AS BIGINT)                   AS r2sum_a,
           CAST(sum(a * r2) - sum(a) * (sum(a) + 1) AS BIGINT)  AS u2_a,
           CAST(2 * sum(a) * sum(1 - a) AS BIGINT)       AS u2_sum
    FROM ranked
    GROUP BY event_type
    ORDER BY event_type
"""


def agg_spearman_corr_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between a customer's account balance
    and their realized total spend, per market segment — the RANK
    member of the correlation family (agg_correlation_stats is
    Pearson): monotone-association strength that is immune to the
    heavy right tail of spend.

    Determinism: both rank permutations are row_number() with the
    unique c_custkey tiebreak (the house rule for every rank edge), so
    the permutation — and therefore sum_d2 — is identical on both
    engines even where balances tie; with unique ranks the classic
    rho = 1 − 6·Σd²/(n(n²−1)) closed form is exact. Spend is summed in
    integer cents before ranking (order-independent), and rho's single
    terminal division of two exact BIGINTs is the only float, rounded
    4dp on both sides.

    Scale shape: orders pre-aggregates per customer (one shuffle on
    o_custkey), joins customer once on the same key, then two
    row_number windows per segment and one hash agg — no broadcast of
    anything customer-sized, no self-join.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    spend = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(rnd_cents("o_totalprice")).alias("_cents"))
    )
    j = cust.join(spend, cust["c_custkey"] == spend["o_custkey"], "inner")
    w_bal = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    w_spend = Window.partitionBy("c_mktsegment").orderBy("_cents", "c_custkey")
    ranked = j.select(
        "c_mktsegment",
        F.row_number().over(w_bal).cast("long").alias("_rb"),
        F.row_number().over(w_spend).cast("long").alias("_rs"),
    )
    d2 = (F.col("_rb") - F.col("_rs")) * (F.col("_rb") - F.col("_rs"))
    agg = ranked.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(d2).cast("long").alias("sum_d2"),
    )
    denom = F.col("n") * (F.col("n") * F.col("n") - 1)
    return agg.select(
        "c_mktsegment",
        "n",
        "sum_d2",
        rnd(F.lit(1.0) - (6.0 * F.col("sum_d2")) / denom, 4).alias("rho"),
    ).orderBy("c_mktsegment")


rho_expr_spearman = (
    "1.0 - (6.0 * sum((rb - rs) * (rb - rs)))"
    " / (count(*) * (count(*) * count(*) - 1))"
)

_SPEARMAN_ORACLE = f"""
    WITH spend AS (
      SELECT o_custkey, SUM({rnd_cents_sql('o_totalprice')}) AS cents
      FROM orders GROUP BY 1
    ), ranked AS (
      SELECT c.c_mktsegment,
             row_number() OVER (PARTITION BY c.c_mktsegment
                                ORDER BY c.c_acctbal, c.c_custkey) AS rb,
             row_number() OVER (PARTITION BY c.c_mktsegment
                                ORDER BY s.cents, c.c_custkey)     AS rs
      FROM customer c JOIN spend s ON c.c_custkey = s.o_custkey
    )
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT)              AS n,
           CAST(sum((rb - rs) * (rb - rs)) AS BIGINT) AS sum_d2,
           {rnd_sql(rho_expr_spearman, 4)} AS rho
    FROM ranked
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
"""


def join_null_safe_equi_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi join (`<=>` / IS NOT DISTINCT FROM) — the join
    surface's NULL-semantics row (fn_null_semantics pins the SCALAR
    operators; this pins the JOIN operator, where a plain `=` silently
    drops every NULL-keyed row instead of matching NULL to NULL).

    The key is genuinely nullable on both sides: orders outside the
    priority whitelist get a NULL class (nullif-style CASE), and the
    dim side carries an explicit NULL row. The declared output counts
    orders and revenue per matched dim label, so the NULL⋈NULL match
    arm contributes a visible row — an equality join would silently
    produce one fewer group, which is exactly the bug class this pins.

    Scale shape: Spark plans `<=>` as a hash-joinable equality
    (EqualNullSafe is a join key, not a filter), and the 4-row dim
    broadcasts; the fact side scans once. Money in exact cents.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
            F.col("o_orderpriority"),
        ).alias("prio_class"),
        rnd_cents("o_totalprice").alias("_cents"),
    )
    dim = spark.createDataFrame(
        [("1-URGENT", "fast-lane"), ("2-HIGH", "fast-lane"), (None, "standard")],
        "prio_key string, lane string",
    )
    j = orders.join(
        F.broadcast(dim), orders["prio_class"].eqNullSafe(dim["prio_key"]), "inner"
    )
    return (
        j.groupBy("lane", "prio_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("_cents").alias("revenue_cents"),
        )
        .orderBy("lane", "prio_class")
    )


_NULL_SAFE_JOIN_ORACLE = f"""
    WITH o AS (
      SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN o_orderpriority END AS prio_class,
             {rnd_cents_sql('o_totalprice')} AS cents
      FROM orders
    ), dim(prio_key, lane) AS (
      VALUES ('1-URGENT', 'fast-lane'), ('2-HIGH', 'fast-lane'),
             (NULL, 'standard')
    )
    SELECT d.lane, o.prio_class,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(o.cents) AS BIGINT) AS revenue_cents
    FROM o JOIN dim d ON o.prio_class IS NOT DISTINCT FROM d.prio_key
    GROUP BY d.lane, o.prio_class
    ORDER BY d.lane, o.prio_class
"""


def orders_quartile_migration_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-value quartile migration — the BI classic behind every
    'customer movement' dashboard: spend quartile in 1996 vs spend
    quartile in 1997, transition counts for customers active in both
    years plus explicit churn-in/churn-out rows (quartile 0 = absent
    that year), so the matrix accounts for every active customer.

    Exactness: yearly spend in integer cents; ntile(4) over the
    (cents, custkey) order — the unique-key tiebreak makes each ntile
    edge deterministic, so the transition COUNTS are exact integers on
    both engines. FULL OUTER join between the two years keys on the
    customer — at scale both sides pre-aggregate (shuffle on custkey)
    before the join, so the matrix costs two hash aggs + one
    equi-join, never a fact-×-fact pass.

    Scale note on the rank windows: quartiles are per MARKET SEGMENT
    (also the analytically right grain — segments have different spend
    scales), so the ntile windows parallelize across segments instead
    of funnelling the whole customer base into one partition; for a
    genuinely global quartile at 100 TB the two-phase offset ranking
    in ``operators/batching.py`` is the scale path.
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.year("o_orderdate").alias("_yr"),
        rnd_cents("o_totalprice").alias("_cents"),
    )

    def year_quartile(yr: int) -> DataFrame:
        spend = (
            orders.where(F.col("_yr") == yr)
            .groupBy("o_custkey")
            .agg(F.sum("_cents").alias("_spend"))
            .join(cust, F.col("o_custkey") == cust["c_custkey"], "inner")
        )
        w = Window.partitionBy("c_mktsegment").orderBy("_spend", "o_custkey")
        return spend.select(
            "o_custkey",
            F.col("c_mktsegment").alias(f"seg{yr}"),
            F.ntile(4).over(w).cast("long").alias(f"q{yr}"),
        )

    a, b = year_quartile(1996), year_quartile(1997)
    j = a.join(b, "o_custkey", "full_outer")
    return (
        j.select(
            F.coalesce("seg1996", "seg1997").alias("segment"),
            F.coalesce("q1996", F.lit(0)).alias("q_from"),
            F.coalesce("q1997", F.lit(0)).alias("q_to"),
        )
        .groupBy("segment", "q_from", "q_to")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
        .orderBy("segment", "q_from", "q_to")
    )


_QUARTILE_MIGRATION_ORACLE = f"""
    WITH yr AS (
      SELECT o.o_custkey, c.c_mktsegment, EXTRACT(year FROM o.o_orderdate) AS y,
             SUM({rnd_cents_sql('o.o_totalprice')}) AS spend
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE EXTRACT(year FROM o.o_orderdate) IN (1996, 1997)
      GROUP BY 1, 2, 3
    ), a AS (
      SELECT o_custkey, c_mktsegment,
             ntile(4) OVER (PARTITION BY c_mktsegment
                            ORDER BY spend, o_custkey) AS q
      FROM yr WHERE y = 1996
    ), b AS (
      SELECT o_custkey, c_mktsegment,
             ntile(4) OVER (PARTITION BY c_mktsegment
                            ORDER BY spend, o_custkey) AS q
      FROM yr WHERE y = 1997
    )
    SELECT COALESCE(a.c_mktsegment, b.c_mktsegment) AS segment,
           CAST(COALESCE(a.q, 0) AS BIGINT) AS q_from,
           CAST(COALESCE(b.q, 0) AS BIGINT) AS q_to,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
"""


@dataclass(frozen=True)
class PendingQuery:
    name: str
    fn: object
    oracle: str | None
    headline: bool = False
    tags: tuple[str, ...] = ()


PENDING: tuple[PendingQuery, ...] = (
    PendingQuery(
        "events_ab_mannwhitney",
        events_ab_mannwhitney_query,
        _MANNWHITNEY_ORACLE,
        tags=("events", "abtest", "statistics", "nonparametric", "rank"),
    ),
    PendingQuery(
        "agg_spearman_corr",
        agg_spearman_corr_query,
        _SPEARMAN_ORACLE,
        tags=("agg", "statistics", "correlation", "rank"),
    ),
    PendingQuery(
        "join_null_safe_equi",
        join_null_safe_equi_query,
        _NULL_SAFE_JOIN_ORACLE,
        tags=("join", "null-safe", "semantics"),
    ),
    PendingQuery(
        "orders_quartile_migration",
        orders_quartile_migration_query,
        _QUARTILE_MIGRATION_ORACLE,
        tags=("orders", "analytics", "cohort", "ntile"),
    ),
)
