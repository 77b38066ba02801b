"""Round-30 declared-query staging area — the HYPOTHESIS-TESTING
closure wave: the two k-group tests the A/B family (Welch, Mann-
Whitney, chi-square, runs, CUPED) still lacked — rank-based location
across MANY groups and equality of variances.

- **Kruskal-Wallis H** (the k-group generalization of the
  Mann-Whitney row): global ranks with exact integer tie handling
  (doubled ranks: rank2 of a tie run at positions p..p+k-1 is
  2p+k-1, an integer), per-group rank sums, and the H statistic
  assembled from exact BIGINT sums in double with ONE e6 floor at
  the end (every intermediate is the same IEEE op on both engines —
  the exact-double device).
- **Levene / Brown-Forsythe** (equality of variances, median
  variant — the robust one): z = |cents - group median| is an exact
  integer (group medians are exact order statistics), the F ratio
  assembled from integer z-moments (DECIMAL(38,0) squares) with one
  e6 floor. The variance-equality gate that decides whether the
  Welch row's assumptions were even needed.

Per-wave staging module (nothing evidenced imports this file).
Exactness rules as earlier waves: cents, integer ppm/e6, BIGINT
casts, DECIMAL(38,0) second moments, deterministic tiebreaks,
exact-double assembly with a single terminal floor.
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


# ---------------------------------------------------------------------------
# 1. Kruskal-Wallis H across order priorities
# ---------------------------------------------------------------------------


def agg_kruskal_wallis_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H test of order revenue across the five order
    priorities. Global ranks with exact tie handling: a tie run at
    1-based positions p..p+k-1 gets doubled-rank 2p+k-1 (an integer —
    the average rank times two), computed as rank2 = 2*rank(x) +
    count(x) - 1 from one value-keyed agg, no windows over the full
    table. H = 3 * sum_g(R2_g^2 / n_g) / (N*(N+1)) - 3*(N+1) using
    the doubled sums (the 12 becomes 3), assembled in double from
    exact BIGINTs and floored to e6 once. Emits per-group rank sums
    plus the shared H — the k-group location test completing the A/B
    family (no ties correction; stated).

    Scale shape: one value-keyed agg (count per distinct cents), a
    running-total over the bounded DISTINCT-value table for rank
    starts, one join back, one group agg, a 1-row assembly.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", rnd_cents(F.col("o_totalprice")).alias("cents")
    )
    by_val = orders.groupBy("cents").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, -1)
    ranked_vals = by_val.withColumn(
        "before", F.coalesce(F.sum("cnt").over(w), F.lit(0)).cast("long")
    ).select(
        "cents",
        # doubled average rank of the tie run starting at before+1
        (F.lit(2) * (F.col("before") + 1) + F.col("cnt") - 1)
        .cast("long")
        .alias("rank2"),
    )
    with_ranks = orders.join(ranked_vals, "cents")
    groups = with_ranks.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("rank2").cast("long").alias("r2_sum"),
    )
    totals = groups.agg(
        F.sum("n_g").cast("long").alias("n"),
        F.sum(
            F.col("r2_sum").cast("double")
            * F.col("r2_sum").cast("double")
            / F.col("n_g")
        ).alias("s"),
    ).select(
        "n",
        F.floor(
            (
                F.lit(3.0) * F.col("s") / (F.col("n") * (F.col("n") + 1))
                - 3.0 * (F.col("n") + 1)
            )
            * 1000000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("h_e6"),
    )
    return (
        groups.crossJoin(F.broadcast(totals))
        .select(
            "o_orderpriority",
            "n_g",
            "r2_sum",
            F.expr("r2_sum DIV n_g").cast("long").alias("mean_rank2"),
            F.col("n").alias("n_total"),
            "h_e6",
        )
        .orderBy("o_orderpriority")
    )


_KW_ORACLE = """
  WITH orders_c AS (
    SELECT o_orderpriority,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
    FROM orders
  ), by_val AS (
    SELECT cents, CAST(count(*) AS BIGINT) AS cnt
    FROM orders_c GROUP BY 1
  ), ranked_vals AS (
    SELECT cents,
           CAST(2 * (coalesce(sum(cnt) OVER (
                 ORDER BY cents
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1)
                + cnt - 1 AS BIGINT) AS rank2
    FROM by_val
  ), groups AS (
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_g,
           CAST(sum(rank2) AS BIGINT) AS r2_sum
    FROM orders_c JOIN ranked_vals USING (cents)
    GROUP BY 1
  ), totals AS (
    SELECT n,
           CAST(floor((3.0 * s / (n * (n + 1)) - 3.0 * (n + 1))
                      * 1000000 + 0.5) AS BIGINT) AS h_e6
    FROM (
      SELECT CAST(sum(n_g) AS BIGINT) AS n,
             sum(CAST(r2_sum AS DOUBLE) * CAST(r2_sum AS DOUBLE) / n_g) AS s
      FROM groups)
  )
  SELECT o_orderpriority, n_g, r2_sum,
         CAST(r2_sum // n_g AS BIGINT) AS mean_rank2,
         n AS n_total, h_e6
  FROM groups CROSS JOIN totals
  ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# 2. Levene / Brown-Forsythe variance-equality test
# ---------------------------------------------------------------------------


def agg_levene_variance_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe (median-based Levene) test for equality of
    revenue variances across order priorities: z = |cents - group
    median| is an EXACT integer (group medians are the lower-middle
    order statistic — a deterministic exact rank, no midpoint
    averaging, stated identically on both engines), and
    F = ((N-k)/(k-1)) * sum_g n_g*(zbar_g - zbar)^2 / sum |z - zbar_g|^2
    is assembled from integer z-sums and DECIMAL(38,0) z-squares with
    one e6 floor. Emits per-group (n, median_cents, z-mean ppm-exact)
    plus the shared F — the variance-equality gate beside the Welch
    mean test.

    Scale shape: group medians via one per-group rank window; the
    rest is two group aggs and a 1-row assembly.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", rnd_cents(F.col("o_totalprice")).alias("cents")
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("cents").asc(), F.col("o_orderpriority").asc()
    )
    wn = Window.partitionBy("o_orderpriority")
    med = (
        orders.withColumn("rk", F.row_number().over(w))
        .withColumn("n_g", F.count(F.lit(1)).over(wn))
        .where(F.col("rk") == F.expr("(n_g + 1) DIV 2"))
        .select(
            "o_orderpriority", F.col("cents").alias("median_cents")
        )
    )
    z = orders.join(med, "o_orderpriority").select(
        "o_orderpriority",
        F.abs(F.col("cents") - F.col("median_cents")).cast("long").alias("z"),
        "median_cents",
    )
    groups = z.groupBy("o_orderpriority", "median_cents").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("z").cast("long").alias("z_sum"),
        F.sum(
            F.col("z").cast("decimal(38,0)") * F.col("z").cast("decimal(38,0)")
        ).alias("z_sq"),
    )
    # within-group SS = z_sq - z_sum^2/n_g; between SS from group means
    assembly = groups.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_g").cast("long").alias("n"),
        F.sum(F.col("z_sum")).cast("long").alias("z_tot"),
        F.sum(
            F.col("z_sq").cast("double")
            - F.col("z_sum").cast("double")
            * F.col("z_sum").cast("double")
            / F.col("n_g")
        ).alias("ss_within"),
        F.sum(
            F.col("z_sum").cast("double")
            * F.col("z_sum").cast("double")
            / F.col("n_g")
        ).alias("sum_sq_over_n"),
    ).select(
        "k",
        "n",
        F.floor(
            (
                (F.col("n") - F.col("k"))
                / (F.col("k") - 1)
                * (
                    F.col("sum_sq_over_n")
                    - F.col("z_tot").cast("double")
                    * F.col("z_tot").cast("double")
                    / F.col("n")
                )
                / F.col("ss_within")
            )
            * 1000000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("f_e6"),
    )
    return (
        groups.crossJoin(F.broadcast(assembly))
        .select(
            "o_orderpriority",
            "n_g",
            "median_cents",
            F.expr("(z_sum * 1000000) DIV n_g").cast("long").alias(
                "mean_z_ppm_cents"
            ),
            F.col("k").alias("n_groups"),
            F.col("n").alias("n_total"),
            "f_e6",
        )
        .orderBy("o_orderpriority")
    )


_LV_ORACLE = """
  WITH orders_c AS (
    SELECT o_orderpriority,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
    FROM orders
  ), med AS (
    SELECT o_orderpriority, cents AS median_cents FROM (
      SELECT o_orderpriority, cents,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY cents, o_orderpriority) AS rk,
             count(*) OVER (PARTITION BY o_orderpriority) AS n_g
      FROM orders_c)
    WHERE rk = (n_g + 1) // 2
  ), z AS (
    SELECT o.o_orderpriority, m.median_cents,
           CAST(abs(o.cents - m.median_cents) AS BIGINT) AS z
    FROM orders_c o JOIN med m USING (o_orderpriority)
  ), groups AS (
    SELECT o_orderpriority, median_cents,
           CAST(count(*) AS BIGINT) AS n_g,
           CAST(sum(z) AS BIGINT) AS z_sum,
           sum(CAST(z AS DECIMAL(38,0)) * CAST(z AS DECIMAL(38,0))) AS z_sq
    FROM z GROUP BY 1, 2
  ), assembly AS (
    SELECT k, n,
           CAST(floor(
             ((n - k) / (k - 1.0)
              * (sum_sq_over_n
                 - CAST(z_tot AS DOUBLE) * CAST(z_tot AS DOUBLE) / n)
              / ss_within) * 1000000 + 0.5) AS BIGINT) AS f_e6
    FROM (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(n_g) AS BIGINT) AS n,
             CAST(sum(z_sum) AS BIGINT) AS z_tot,
             sum(CAST(z_sq AS DOUBLE)
                 - CAST(z_sum AS DOUBLE) * CAST(z_sum AS DOUBLE) / n_g)
               AS ss_within,
             sum(CAST(z_sum AS DOUBLE) * CAST(z_sum AS DOUBLE) / n_g)
               AS sum_sq_over_n
      FROM groups)
  )
  SELECT o_orderpriority, n_g, median_cents,
         CAST((z_sum * 1000000) // n_g AS BIGINT) AS mean_z_ppm_cents,
         k AS n_groups, n AS n_total, f_e6
  FROM groups CROSS JOIN assembly
  ORDER BY o_orderpriority
"""


PENDING: tuple[PendingQuery, ...] = (
    PendingQuery(
        "agg_kruskal_wallis",
        agg_kruskal_wallis_query,
        _KW_ORACLE,
        tags=("agg", "kruskal-wallis", "rank-test", "exact-double",
              "integer-exact"),
    ),
    PendingQuery(
        "agg_levene_variance",
        agg_levene_variance_query,
        _LV_ORACLE,
        tags=("agg", "levene", "brown-forsythe", "variance",
              "decimal38", "integer-exact"),
    ),
)
