"""Window-function surface (SURVEY.md §2.5) + first-wins dedup + sampling
(§2.6 O3, §2.8 D1/D2) — the operators whose reference semantics are
imperative (Python sets, seeded random.sample, consecutive-line batch
ids) re-expressed as Spark window plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.io import load_table
from spotify_data_pipeline_spark.operators.batching import assign_batch_ids_scalable
from spotify_data_pipeline_spark.operators.dedup import first_wins_dedup
from spotify_data_pipeline_spark.operators.sampling import deterministic_sample
from spotify_data_pipeline_spark.operators.topk import topk_per_group
from spotify_data_pipeline_spark.plans.parity import rnd
from spotify_data_pipeline_spark.plans.registry import declare


@declare(
    "window_topk_per_group",
    oracle="""
    SELECT customer_id, order_id, total_price, rn
    FROM (
      SELECT o_custkey AS customer_id, o_orderkey AS order_id,
             floor((o_totalprice) * 100 + 0.5) / 100 AS total_price,
             CAST(row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
    headline=True,
    tags=("window", "topk"),
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer (SURVEY §2.5; J5/S8's per-key top-k shape:
    each search name keeps ≤20 candidates, search_artist_id_and_name.py:37-46).
    """
    o = load_table(spark, sf_dir, "orders")
    ranked = topk_per_group(
        o,
        partition_by=["o_custkey"],
        order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        k=3,
    )
    return ranked.select(
        F.col("o_custkey").alias("customer_id"),
        F.col("o_orderkey").alias("order_id"),
        rnd("o_totalprice", 2).alias("total_price"),
        F.col("rn").cast("long").alias("rn"),
    )


@declare(
    "window_running_revenue",
    oracle="""
    SELECT order_month, revenue_cents,
           CAST(sum(revenue_cents) OVER (
             ORDER BY order_month
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_revenue_cents
    FROM (
      SELECT date_trunc('month', o_orderdate) AS order_month,
             CAST(floor((sum(o_totalprice) * 100) * 1 + 0.5) / 1 AS BIGINT) AS revenue_cents
      FROM orders GROUP BY 1
    )
    """,
    tags=("window", "running"),
)
def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) monthly revenue. Computed in integer cents so
    the cumulative sum is exact on both engines (see registry.py notes).

    Scale: the window is over ~tens-to-hundreds of month rows *after*
    aggregation — the unpartitioned window runs on a trivially small
    input, not on the fact table.
    """
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(F.date_trunc("month", "o_orderdate").alias("order_month")).agg(
        rnd(F.sum("o_totalprice") * 100, 0).cast("long").alias("revenue_cents")
    )
    w = Window.orderBy("order_month").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return monthly.withColumn("cum_revenue_cents", F.sum("revenue_cents").over(w).cast("long"))


@declare(
    "window_lag_gap",
    oracle="""
    SELECT o_custkey AS customer_id, o_orderkey AS order_id,
           CAST(date_diff('day',
             lag(o_orderdate) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
             o_orderdate) AS BIGINT) AS gap_days
    FROM orders
    """,
    tags=("window", "lag"),
)
def window_lag_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag(): days since the customer's previous order (analytic window)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        F.col("o_custkey").alias("customer_id"),
        F.col("o_orderkey").alias("order_id"),
        F.datediff("o_orderdate", F.lag("o_orderdate").over(w)).cast("long").alias("gap_days"),
    )


@declare(
    "window_rank_suite",
    oracle="""
    SELECT c_custkey AS customer_id, c_nationkey AS nation_id,
           CAST(rank()       OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           CAST(ntile(4)     OVER w AS BIGINT) AS quartile,
           floor((percent_rank() OVER w) * 10000 + 0.5) / 10000 AS pct_rank
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
    """,
    tags=("window", "rank"),
)
def window_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile / percent_rank per nation. The order-by
    carries a unique tiebreak (custkey) so ntile is deterministic."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    return c.select(
        F.col("c_custkey").alias("customer_id"),
        F.col("c_nationkey").alias("nation_id"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        rnd(F.percent_rank().over(w), 4).alias("pct_rank"),
    )


@declare(
    "window_batch_assignment",
    oracle="""
    SELECT c_custkey AS customer_id,
           CAST(floor((row_number() OVER (ORDER BY c_custkey) - 1) / 500) + 1 AS BIGINT)
             AS batch_id
    FROM customer
    """,
    tags=("window", "batching"),
)
def window_batch_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size batch-id assignment — the reference's seed batching
    (create_artist_batches.py:12-23 assigns batch 1,2,... to consecutive
    500-line groups; SURVEY §2.5/§2.6 O5). Uses the two-phase numbering
    (range partition → local rank → broadcast offsets) so the declared
    query is the plan that survives a 100× fact table — the single-task
    global window never sees the data (plan-asserted)."""
    c = load_table(spark, sf_dir, "customer")
    return assign_batch_ids_scalable(c, order_by=["c_custkey"], batch_size=500).select(
        F.col("c_custkey").alias("customer_id"), F.col("batch_id").cast("long").alias("batch_id")
    )


@declare(
    "dedup_first_wins",
    oracle="""
    SELECT l_orderkey AS order_id, l_partkey AS part_id,
           floor((l_quantity) * 100 + 0.5) / 100 AS quantity
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY l_orderkey
        ORDER BY l_linenumber ASC, l_partkey ASC, l_suppkey ASC) AS _rn
      FROM lineitem
    ) WHERE _rn = 1
    """,
    headline=True,
    tags=("dedup", "window"),
)
def dedup_first_wins_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-wins dedup by key with an explicit arrival order (SURVEY §2.8
    D1/D2: the reference's `picked_album_id` set gate keeps the first
    occurrence, spotify_etl_v2.py:143,161-170). Spark's dropDuplicates
    keeps an *arbitrary* row, so first-wins is a row_number window."""
    li = load_table(spark, sf_dir, "lineitem")
    # (l_orderkey, l_linenumber) is not unique in the synthetic data —
    # extend the order with (partkey, suppkey) so the "first" row is
    # well-defined on both engines
    first = first_wins_dedup(
        li,
        keys=["l_orderkey"],
        order_by=[F.col("l_linenumber").asc(), F.col("l_partkey").asc(), F.col("l_suppkey").asc()],
    )
    return first.select(
        F.col("l_orderkey").alias("order_id"),
        F.col("l_partkey").alias("part_id"),
        rnd("l_quantity", 2).alias("quantity"),
    )


@declare(
    "sample_seeded_deterministic",
    oracle="""
    SELECT c_custkey AS customer_id, c_name AS customer_name
    FROM customer
    ORDER BY md5(concat('20250901', ':', CAST(c_custkey AS VARCHAR))), c_custkey
    LIMIT 20
    """,
    tags=("sample",),
)
def sample_seeded_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic seeded sample of 20 customers (SURVEY §2.6 O3:
    random.Random(int(ds)).sample(ids, 20) — same day ⇒ same sample,
    spotify_etl_v2.py:91-97). Hash-ordered, so stable under
    repartitioning (plain df.sample(seed=) is not). Upgraded from
    rows-only in round 2: md5 hash ordering is reproduced bit-identically
    by DuckDB, so the driver verifies the exact sample membership."""
    c = load_table(spark, sf_dir, "customer")
    return deterministic_sample(
        c, key_cols=["c_custkey"], n=20, seed=20250901, hash_fn="md5"
    ).select(
        F.col("c_custkey").alias("customer_id"), F.col("c_name").alias("customer_name")
    )


@declare(
    "window_first_last",
    oracle="""
    SELECT c_custkey AS customer_id, c_nationkey AS nation_id,
           first_value(c_custkey) OVER w AS richest_id,
           last_value(c_custkey) OVER w AS poorest_id,
           floor((max(c_acctbal) OVER w - c_acctbal) * 100 + 0.5) / 100 AS gap_to_top
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("window", "analytic"),
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last analytic functions over an unbounded frame plus an
    aggregate-over-frame (SURVEY §2.5)."""
    c = load_table(spark, sf_dir, "customer")
    w = (
        Window.partitionBy("c_nationkey")
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return c.select(
        F.col("c_custkey").alias("customer_id"),
        F.col("c_nationkey").alias("nation_id"),
        F.first("c_custkey").over(w).alias("richest_id"),
        F.last("c_custkey").over(w).alias("poorest_id"),
        rnd(F.max("c_acctbal").over(w) - F.col("c_acctbal"), 2).alias("gap_to_top"),
    )


@declare(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey AS order_id, o_custkey AS customer_id,
           floor((sum(o_totalprice) OVER (
             PARTITION BY o_custkey
             ORDER BY date_diff('day', TIMESTAMP '1970-01-01', o_orderdate)
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)) * 100 + 0.5) / 100
             AS revenue_30d
    FROM orders
    """,
    tags=("window", "range_frame"),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (SURVEY W-frames — value-based, not row-based): each
    order's trailing-30-day revenue for its customer. rangeBetween over
    epoch-days; ties at one date all share the same frame (the semantic
    difference from rowsBetween that this query pins)."""
    o = load_table(spark, sf_dir, "orders")
    # integer epoch-days via datediff — timezone-free on both engines
    days = F.datediff("o_orderdate", F.lit("1970-01-01").cast("timestamp")).cast("long")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(days)
        .rangeBetween(-30, Window.currentRow)
    )
    return o.select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_custkey").alias("customer_id"),
        rnd(F.sum("o_totalprice").over(w), 2).alias("revenue_30d"),
    )
