"""Aggregation surface (SURVEY.md §2.4 G1-G6).

The reference computes no aggregates (its only counter is pagination
bookkeeping, spotify_etl_v2.py:185,265) — this is the standard surface
the engine exposes, all Catalyst-native hash aggregates with automatic
partial (map-side) aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.io import load_table
from spotify_data_pipeline_spark.plans.parity import rnd
from spotify_data_pipeline_spark.plans.registry import declare

# ---------------------------------------------------------------------------
# G1 — the flagship: TPC-H-Q1-style pricing summary
# ---------------------------------------------------------------------------

PRICING_SUMMARY_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  floor((sum(l_quantity)) * 100 + 0.5) / 100                                        AS sum_qty,
  floor((sum(l_extendedprice)) * 100 + 0.5) / 100                                   AS sum_base_price,
  floor((sum(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100                AS sum_disc_price,
  floor((sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))) * 100 + 0.5) / 100  AS sum_charge,
  floor((avg(l_quantity)) * 100 + 0.5) / 100                                        AS avg_qty,
  floor((avg(l_extendedprice)) * 100 + 0.5) / 100                                   AS avg_price,
  floor((avg(l_discount)) * 10000 + 0.5) / 10000                                        AS avg_disc,
  CAST(count(*) AS BIGINT)                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship query (SURVEY §7.1 M0): scan → pushed filter → hash agg.

    Exercises the full happy path of the engine: parquet scan with
    predicate pushdown, whole-stage-codegen'd expressions, partial+final
    hash aggregation on two low-cardinality keys. At 100 TB this is a
    pure map-side-heavy plan: the shuffle carries only
    |distinct(returnflag,linestatus)| × partials.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            rnd(F.sum("l_quantity"), 2).alias("sum_qty"),
            rnd(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            rnd(F.sum(disc_price), 2).alias("sum_disc_price"),
            rnd(F.sum(charge), 2).alias("sum_charge"),
            rnd(F.avg("l_quantity"), 2).alias("avg_qty"),
            rnd(F.avg("l_extendedprice"), 2).alias("avg_price"),
            rnd(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


declare("agg_pricing_summary", oracle=PRICING_SUMMARY_ORACLE, headline=True, tags=("agg",))(
    pricing_summary
)


@declare(
    "agg_count_distinct",
    oracle="""
    SELECT n.n_name AS nation_name,
           CAST(count(DISTINCT c.c_custkey) AS BIGINT) AS n_customers,
           CAST(count(DISTINCT c.c_mktsegment) AS BIGINT) AS n_segments
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    tags=("agg", "distinct"),
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (G2) over a broadcast dim join."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.countDistinct("c_mktsegment").alias("n_segments"),
        )
    )


@declare(
    "agg_approx_distinct",
    oracle=None,  # approx sketches differ across engines → rows-only check
    tags=("agg", "approx"),
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct via HyperLogLog++ (G3). No exact oracle by
    construction; tests assert the estimate is within rsd of exact."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
    )


@declare(
    "agg_rollup_revenue",
    oracle="""
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           floor((sum(o.o_totalprice)) * 100 + 0.5) / 100 AS revenue,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
    headline=True,
    tags=("agg", "rollup"),
)
def agg_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup region → nation → grand total (G4)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.rollup(
        F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name")
    ).agg(
        rnd(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count("*").alias("n_orders"),
    )


@declare(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           floor((sum(l_quantity)) * 100 + 0.5) / 100 AS sum_qty,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("agg", "cube"),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cube over two keys (G4)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        rnd(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count("*").alias("n_rows"),
    )


@declare(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           floor((sum(o_totalprice)) * 100 + 0.5) / 100 AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
    tags=("agg", "grouping_sets"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via the SQL surface (G4) — Catalyst plans an Expand."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               floor((sum(o_totalprice)) * 100 + 0.5) / 100 AS revenue
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@declare(
    "agg_collect_set_sorted",
    oracle="""
    SELECT n.n_name AS nation_name,
           array_to_string(list_sort(list(DISTINCT c.c_mktsegment)), ',') AS segments
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    tags=("agg", "collect"),
)
def agg_collect_set_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collect-set aggregation (G5), emitted as a sorted joined string so
    the order-insensitive oracle hash is well-defined."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(F.array_join(F.sort_array(F.collect_set("c_mktsegment")), ",").alias("segments"))
    )


@declare(
    "agg_filtered_conditional",
    oracle="""
    SELECT l_linestatus,
           floor((sum(CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0.0 END)) * 100 + 0.5) / 100
             AS returned_value,
           floor((sum(CASE WHEN l_returnflag <> 'R' THEN l_extendedprice ELSE 0.0 END)) * 100 + 0.5) / 100
             AS kept_value,
           CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_discounted
    FROM lineitem
    GROUP BY l_linestatus
    """,
    tags=("agg", "conditional"),
)
def agg_filtered_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered/conditional aggregation (G6): sum(CASE WHEN ...)."""
    li = load_table(spark, sf_dir, "lineitem")
    ret = F.when(F.col("l_returnflag") == "R", F.col("l_extendedprice")).otherwise(0.0)
    kept = F.when(F.col("l_returnflag") != "R", F.col("l_extendedprice")).otherwise(0.0)
    disc = F.when(F.col("l_discount") > 0.05, 1).otherwise(0)
    return li.groupBy("l_linestatus").agg(
        rnd(F.sum(ret), 2).alias("returned_value"),
        rnd(F.sum(kept), 2).alias("kept_value"),
        F.sum(disc).cast("long").alias("n_discounted"),
    )


@declare(
    "agg_stats_summary",
    oracle="""
    SELECT p_brand AS brand,
           floor((min(p_retailprice)) * 100 + 0.5) / 100 AS min_price,
           floor((max(p_retailprice)) * 100 + 0.5) / 100 AS max_price,
           floor((avg(p_retailprice)) * 100 + 0.5) / 100 AS avg_price,
           floor((stddev_samp(p_retailprice)) * 100 + 0.5) / 100 AS sd_price,
           CAST(count(*) AS BIGINT) AS n_parts
    FROM part
    GROUP BY p_brand
    """,
    tags=("agg", "stats"),
)
def agg_stats_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max/avg/stddev summary stats (G1)."""
    p = load_table(spark, sf_dir, "part")
    return p.groupBy(F.col("p_brand").alias("brand")).agg(
        rnd(F.min("p_retailprice"), 2).alias("min_price"),
        rnd(F.max("p_retailprice"), 2).alias("max_price"),
        rnd(F.avg("p_retailprice"), 2).alias("avg_price"),
        rnd(F.stddev_samp("p_retailprice"), 2).alias("sd_price"),
        F.count("*").alias("n_parts"),
    )


@declare(
    "agg_pivot",
    oracle="""
    SELECT l_returnflag,
           floor((sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END)) * 100 + 0.5) / 100 AS O,
           floor((sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END)) * 100 + 0.5) / 100 AS F
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "pivot"),
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation) with an explicit value list — at scale an
    explicit list avoids the extra distinct-values job Spark otherwise runs."""
    li = load_table(spark, sf_dir, "lineitem")
    piv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(rnd(F.sum("l_quantity"), 2))
    )
    return piv.select("l_returnflag", F.col("O").alias("O"), F.col("F").alias("F"))


@declare(
    "subquery_correlated_scalar",
    oracle="""
    SELECT c.c_custkey AS customer_id,
           floor((c.c_acctbal) * 100 + 0.5) / 100 AS acctbal
    FROM customer c
    WHERE c.c_acctbal > (
      SELECT avg(c2.c_acctbal) FROM customer c2
      WHERE c2.c_nationkey = c.c_nationkey
    )
    """,
    tags=("subquery",),
)
def subquery_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (SURVEY §4.1 'subquery handling'):
    customers above their own nation's average balance. Catalyst
    decorrelates this into an aggregate + join — asserted healthy by the
    oracle match rather than hand-built, which is the point: declare the
    semantics, let the optimizer pick the plan."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_sq")
    return spark.sql(
        """
        SELECT c.c_custkey AS customer_id,
               floor(c.c_acctbal * 100 + 0.5) / 100 AS acctbal
        FROM customer_sq c
        WHERE c.c_acctbal > (
          SELECT avg(c2.c_acctbal) FROM customer_sq c2
          WHERE c2.c_nationkey = c.c_nationkey
        )
        """
    )


@declare(
    "agg_exact_percentiles",
    oracle="""
    SELECT c_mktsegment AS segment,
           floor((quantile_cont(c_acctbal, 0.5)) * 100 + 0.5) / 100 AS median_bal,
           floor((quantile_cont(c_acctbal, 0.9)) * 100 + 0.5) / 100 AS p90_bal,
           CAST(count(*) AS BIGINT) AS n
    FROM customer
    GROUP BY c_mktsegment
    """,
    tags=("agg", "percentile"),
)
def agg_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (interpolated) percentiles per group — Spark `percentile`
    and DuckDB `quantile_cont` share linear-interpolation semantics.
    Scale note: exact percentiles sort each group's values; for 100 TB
    hot paths prefer `approx_percentile` (see agg_approx_distinct for
    the approx-sketch pattern)."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        rnd(F.expr("percentile(c_acctbal, 0.5)"), 2).alias("median_bal"),
        rnd(F.expr("percentile(c_acctbal, 0.9)"), 2).alias("p90_bal"),
        F.count("*").alias("n"),
    )
