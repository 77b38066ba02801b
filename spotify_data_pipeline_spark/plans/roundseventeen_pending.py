"""Round-17 declared-query staging area — the product-metric quartet:
DAU/WAU stickiness, order-size distribution, discount-band pricing
profile, and month-over-month priority-mix shift.

Per-wave staging module (nothing evidenced imports this file).
Exactness rules as in earlier waves (integer ppm via DIV/`//`, cents,
BIGINT casts, deterministic tiebreaks).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.io import load_table
from spotify_data_pipeline_spark.plans.parity import rnd_cents, rnd_cents_sql


@dataclass(frozen=True)
class PendingQuery:
    name: str
    fn: object
    oracle: str | None
    headline: bool = False
    tags: tuple[str, ...] = ()


def events_dau_wau_stickiness_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per calendar day — the engagement ratio every
    product dashboard leads with: distinct daily actives over distinct
    trailing-7-day actives, exact ppm. The trailing-window DISTINCT is
    the interesting engine problem (range-frame count_distinct windows
    don't exist): each (user, active day) row EXPLODES into the 7
    report days it contributes to — a map-side ×7 fan-out followed by
    one ordinary distinct agg keyed on (report_day, user) — no range
    join, no window over the corpus. Report days are clipped to the
    observed [min_day, max_day] so every row is a full real day.

    Scale shape: per-(user, day) distinct (one shuffle), ×7 explode,
    one distinct agg, one |days|-frame join of DAU onto WAU.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    user_days = ev.distinct()
    bounds = ev.agg(
        F.min("day").alias("_min_day"), F.max("day").alias("_max_day")
    )
    dau = user_days.groupBy("day").agg(
        F.count_distinct("user_id").cast("long").alias("dau")
    )
    contrib = user_days.select(
        "user_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(6)),
                lambda i: F.date_add(F.col("day"), i),
            )
        ).alias("report_day"),
    ).distinct()
    wau = contrib.groupBy("report_day").agg(
        F.count_distinct("user_id").cast("long").alias("wau")
    )
    return (
        dau.join(wau, dau["day"] == wau["report_day"])
        .crossJoin(F.broadcast(bounds))
        .where(
            (F.col("day") >= F.date_add(F.col("_min_day"), 6))
            & (F.col("day") <= F.col("_max_day"))
        )
        .select(
            F.col("day").cast("string").alias("day"),
            "dau",
            "wau",
            F.expr("(dau * 1000000) DIV wau").cast("long").alias("stickiness_ppm"),
        )
        .orderBy("day")
    )


_STICKINESS_ORACLE = """
  WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
  bounds AS (SELECT min(day) AS _min_day, max(day) AS _max_day FROM ud),
  dau AS (
    SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau FROM ud GROUP BY 1
  ), contrib AS (
    SELECT DISTINCT user_id, day + CAST(i AS INTEGER) AS report_day
    FROM ud, (SELECT unnest(range(0, 7)) AS i)
  ), wau AS (
    SELECT report_day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
    FROM contrib GROUP BY 1
  )
  SELECT CAST(d.day AS VARCHAR) AS day, d.dau, w.wau,
         CAST((d.dau * 1000000) // w.wau AS BIGINT) AS stickiness_ppm
  FROM dau d JOIN wau w ON d.day = w.report_day
  CROSS JOIN bounds b
  WHERE d.day >= b._min_day + 6 AND d.day <= b._max_day
  ORDER BY day
"""


def orders_order_size_distribution_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lines-per-order distribution — the basket-size histogram that
    sizes fulfillment work and validates generators: for each order
    size (distinct line count) report orders, exact ppm of all orders,
    total revenue cents, and revenue ppm — whether big baskets carry
    outsized revenue.

    Scale shape: one order-keyed agg, one bounded histogram agg, one
    window over the ≤|max size| frame.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", rnd_cents(F.col("l_extendedprice")).alias("cents")
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum("cents").cast("long").alias("rev"),
    )
    hist = per_order.groupBy("n_lines").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("rev").cast("long").alias("revenue_cents"),
    )
    one = Window.partitionBy(F.lit(1))
    return (
        hist.withColumn("_o", F.sum("n_orders").over(one))
        .withColumn("_r", F.sum("revenue_cents").over(one))
        .select(
            "n_lines",
            "n_orders",
            F.expr("(n_orders * 1000000) DIV _o").cast("long").alias("orders_ppm"),
            "revenue_cents",
            F.expr("(revenue_cents * 1000000) DIV _r").cast("long").alias("revenue_ppm"),
        )
        .orderBy("n_lines")
    )


_ORDER_SIZE_ORACLE = f"""
  WITH per_order AS (
    SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum({rnd_cents_sql('l_extendedprice')}) AS BIGINT) AS rev
    FROM lineitem GROUP BY 1
  ), hist AS (
    SELECT n_lines, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(rev) AS BIGINT) AS revenue_cents
    FROM per_order GROUP BY 1
  )
  SELECT n_lines, n_orders,
         CAST((n_orders * 1000000) // sum(n_orders) OVER () AS BIGINT) AS orders_ppm,
         revenue_cents,
         CAST((revenue_cents * 1000000) // sum(revenue_cents) OVER () AS BIGINT)
           AS revenue_ppm
  FROM hist
  ORDER BY n_lines
"""


def lineitem_discount_profile_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discount-band pricing profile — the margin-leakage table: per
    discount percent (the data's discounts are exact hundredths, so
    band = round(discount·100) is lossless), line count, gross cents,
    discount given in exact cents (computed PER LINE then summed — the
    order of rounding is the whole cross-engine game), and the
    effective realized ppm of gross.

    Scale shape: map-only banding + one bounded agg; |bands| ≤ 11 rows.
    """
    li = load_table(spark, sf_dir, "lineitem")
    gross = rnd_cents(F.col("l_extendedprice"))
    disc = rnd_cents(F.col("l_extendedprice") * F.col("l_discount"))
    return (
        li.select(
            F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("long").alias("discount_pct"),
            gross.alias("g"),
            disc.alias("d"),
        )
        .groupBy("discount_pct")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum("g").cast("long").alias("gross_cents"),
            F.sum("d").cast("long").alias("discount_cents"),
        )
        .withColumn(
            "realized_ppm",
            F.expr("((gross_cents - discount_cents) * 1000000) DIV gross_cents")
            .cast("long"),
        )
        .orderBy("discount_pct")
    )


_DISCOUNT_ORACLE = f"""
  WITH l AS (
    SELECT CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS discount_pct,
           {rnd_cents_sql('l_extendedprice')} AS g,
           {rnd_cents_sql('l_extendedprice * l_discount')} AS d
    FROM lineitem
  ), agg AS (
    SELECT discount_pct, CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(g) AS BIGINT) AS gross_cents,
           CAST(sum(d) AS BIGINT) AS discount_cents
    FROM l GROUP BY 1
  )
  SELECT discount_pct, n_lines, gross_cents, discount_cents,
         CAST(((gross_cents - discount_cents) * 1000000) // gross_cents AS BIGINT)
           AS realized_ppm
  FROM agg
  ORDER BY discount_pct
"""


def orders_priority_mix_shift_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month order-priority mix — the composition-drift
    monitor (a rising URGENT share is an ops signal even when volume is
    flat): per (month, priority), orders and exact ppm of that month,
    plus the signed ppm shift vs the SAME priority one month earlier
    (lag over the bounded month×priority frame; months with no
    predecessor report 0 shift).

    Scale shape: one scan → |months|·|priorities| agg → two windows on
    that bounded frame.
    """
    orders = load_table(spark, sf_dir, "orders")
    cells = orders.groupBy(
        ((F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate") - 1)
        .cast("long")
        .alias("month_idx"),
        "o_orderpriority",
    ).agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    w_m = Window.partitionBy("month_idx")
    w_lag = Window.partitionBy("o_orderpriority").orderBy("month_idx")
    with_ppm = cells.withColumn(
        "_mtotal", F.sum("n_orders").over(w_m)
    ).withColumn(
        "share_ppm", F.expr("(n_orders * 1000000) DIV _mtotal").cast("long")
    )
    return (
        with_ppm.withColumn("_prev", F.lag("share_ppm").over(w_lag))
        .withColumn(
            "_prev_m", F.lag("month_idx").over(w_lag)
        )
        .select(
            "month_idx",
            "o_orderpriority",
            "n_orders",
            "share_ppm",
            F.when(
                F.col("_prev_m") == F.col("month_idx") - 1,
                F.col("share_ppm") - F.col("_prev"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("mom_shift_ppm"),
        )
        .orderBy("month_idx", "o_orderpriority")
    )


_PRIORITY_MIX_ORACLE = """
  WITH cells AS (
    SELECT CAST((year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS BIGINT)
             AS month_idx,
           o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY 1, 2
  ), with_ppm AS (
    SELECT *,
           CAST((n_orders * 1000000) // sum(n_orders) OVER (PARTITION BY month_idx)
                AS BIGINT) AS share_ppm
    FROM cells
  )
  SELECT month_idx, o_orderpriority, n_orders, share_ppm,
         CAST(CASE WHEN lag(month_idx) OVER w = month_idx - 1
                   THEN share_ppm - lag(share_ppm) OVER w
                   ELSE 0 END AS BIGINT) AS mom_shift_ppm
  FROM with_ppm
  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY month_idx)
  ORDER BY month_idx, o_orderpriority
"""


PENDING: tuple[PendingQuery, ...] = (
    PendingQuery(
        "events_dau_wau_stickiness",
        events_dau_wau_stickiness_query,
        _STICKINESS_ORACLE,
        tags=("events", "stickiness", "dau-wau", "explode-not-rangejoin",
              "integer-exact"),
    ),
    PendingQuery(
        "orders_order_size_distribution",
        orders_order_size_distribution_query,
        _ORDER_SIZE_ORACLE,
        tags=("orders", "histogram", "basket-size", "integer-exact"),
    ),
    PendingQuery(
        "lineitem_discount_profile",
        lineitem_discount_profile_query,
        _DISCOUNT_ORACLE,
        tags=("lineitem", "pricing", "discount", "integer-exact"),
    ),
    PendingQuery(
        "orders_priority_mix_shift",
        orders_priority_mix_shift_query,
        _PRIORITY_MIX_ORACLE,
        tags=("orders", "mix-shift", "composition-drift", "integer-exact"),
    ),
)
