"""Round-33 declared-query staging area — the NONPARAMETRIC-DEPTH
wave: the repeated-measures, ordered-alternative, paired, and
effect-size tests that complete the hypothesis-testing catalog begun
in rounds 18-30 (Welch, Mann-Whitney, chi-square, runs, CUPED,
Kruskal-Wallis, Levene).

- **Friedman test**: k treatments ranked WITHIN each block
  (segments x priorities revenue cells), chi2_F assembled from
  integer rank sums with one e6 floor. The repeated-measures
  sibling of Kruskal-Wallis.
- **Page's L trend test**: same block/rank table, ordered
  alternative — L2 = sum_j j * R2_j from doubled rank sums, an
  exact integer (the monotone-dose sibling of Friedman).
- **Cochran's Q**: matched binary outcomes across 3 treatments
  (returnflag cells per customer bucket; success = the cell holds a
  deep-discount item), Q from exact integer row/column totals with
  one e6 floor.
- **Jonckheere-Terpstra**: ordered k-group alternative via summed
  pairwise doubled Mann-Whitney counts U2 = 2*#less + #ties — NOT
  by pairwise joins: the value-keyed count table with per-group
  running totals prices every (g < h) pair in ONE pass (the
  rank-device generalization).
- **Cliff's delta**: ordinal effect size between returned and
  non-returned items from the same value-table device (gt/lt/eq
  counts), delta floored to e6 via exact-double.
- **Cramer's V**: effect size of the segment x priority
  contingency — chi-square from integer counts (exact-double, E is
  rational) and V = sqrt(chi2 / (N (min(r,c)-1))).
- **Mood's median test**: counts above/not-above the grand median
  (the lower-middle order statistic — an exact deterministic rank)
  per priority, with the 2xk chi-square.
- **Wilcoxon signed-rank**: paired test — each customer's revenue in
  the first vs second half of the date range, doubled ranks of |d|
  with the exact tie device, W2+ / W2- sums (their total pins the
  n(n+1) identity).

Per-wave staging module (nothing evidenced imports this file).
Exactness rules as earlier waves: cents, doubled-rank tie device,
BIGINT casts, exact-double assembly with a single terminal floor.
Negative-value integer division is NEVER used (Spark DIV truncates
toward zero while DuckDB // floors): anything signed goes through
the double floor.
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


_PRIORITIES = 5


def _block_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared Friedman/Page design: revenue cents per (segment block,
    priority treatment), complete blocks only."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", rnd_cents(F.col("o_totalprice")).alias("cents")
    )
    cells = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("block"),
            F.col("o_orderpriority").alias("treatment"),
        )
        .agg(F.sum("cents").cast("long").alias("v"))
    )
    complete = (
        cells.groupBy("block")
        .agg(F.count(F.lit(1)).alias("_k"))
        .where(F.col("_k") == _PRIORITIES)
        .select("block")
    )
    return cells.join(complete, "block", "left_semi")


_BLOCK_CELLS_SQL = f"""
  cells AS (
    SELECT c.c_mktsegment AS block, o.o_orderpriority AS treatment,
           CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS v
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1, 2
  ), complete AS (
    SELECT block FROM cells GROUP BY 1 HAVING count(*) = {_PRIORITIES}
  ), cc AS (
    SELECT cells.* FROM cells JOIN complete USING (block)
  )"""


# ---------------------------------------------------------------------------
# 1. Friedman test
# ---------------------------------------------------------------------------


def agg_friedman_test_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman chi-square of order revenue across the 5 priorities
    with market segments as blocks: within each complete block the 5
    cell revenues are ranked 1..5 (integer cents are effectively
    tie-free; the (v, treatment) tiebreak makes the rank
    deterministic either way — stated), rank sums R_j accumulate per
    treatment, and chi2_F = 12/(n k (k+1)) sum R_j^2 - 3 n (k+1)
    assembles in exact double with one e6 floor. Emits per treatment
    its rank sum plus the shared statistic.

    Scale shape: the corpus pays one group agg (the cells); ranking
    runs on the n x k cell table (tiny), 1-row assembly broadcast.
    """
    cells = _block_cells(spark, sf_dir)
    w = Window.partitionBy("block").orderBy(F.col("v").asc(), F.col("treatment").asc())
    ranked = cells.withColumn("r", F.row_number().over(w).cast("long"))
    sums = ranked.groupBy("treatment").agg(
        F.sum("r").cast("long").alias("rank_sum"),
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
    )
    assembly = sums.agg(
        F.max("n_blocks").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(F.col("rank_sum") * F.col("rank_sum")).cast("long").alias("ss"),
    ).select(
        "n",
        "k",
        F.floor(
            (
                F.lit(12.0)
                * F.col("ss").cast("double")
                / (
                    F.col("n").cast("double")
                    * F.col("k").cast("double")
                    * (F.col("k").cast("double") + 1)
                )
                - 3.0 * F.col("n").cast("double") * (F.col("k").cast("double") + 1)
            )
            * 1000000
        )
        .cast("long")
        .alias("chi2_e6"),
    )
    return (
        sums.crossJoin(F.broadcast(assembly))
        .select("treatment", "rank_sum", "n_blocks", "k", "chi2_e6")
        .orderBy("treatment")
    )


_FRIEDMAN_ORACLE = f"""
  WITH {_BLOCK_CELLS_SQL}, ranked AS (
    SELECT *, CAST(row_number() OVER (PARTITION BY block
                                      ORDER BY v, treatment) AS BIGINT) AS r
    FROM cc
  ), sums AS (
    SELECT treatment, CAST(sum(r) AS BIGINT) AS rank_sum,
           CAST(count(*) AS BIGINT) AS n_blocks
    FROM ranked GROUP BY 1
  ), assembly AS (
    SELECT n, k,
           CAST(floor((12.0 * CAST(ss AS DOUBLE)
                       / (CAST(n AS DOUBLE) * CAST(k AS DOUBLE)
                          * (CAST(k AS DOUBLE) + 1))
                       - 3.0 * CAST(n AS DOUBLE) * (CAST(k AS DOUBLE) + 1))
                      * 1000000) AS BIGINT) AS chi2_e6
    FROM (
      SELECT CAST(max(n_blocks) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS k,
             CAST(sum(rank_sum * rank_sum) AS BIGINT) AS ss
      FROM sums)
  )
  SELECT s.treatment, s.rank_sum, s.n_blocks, a.k, a.chi2_e6
  FROM sums s CROSS JOIN assembly a
  ORDER BY s.treatment
"""


# ---------------------------------------------------------------------------
# 2. Page's L trend test
# ---------------------------------------------------------------------------


def agg_page_trend_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's L test for a MONOTONE trend across the ordered
    priorities (1-URGENT < ... < 5-LOW) over the same segment-block
    rank table as Friedman: L = sum_j j * R_j with j the priority's
    numeric prefix — an exact integer. Also emits E[L] under H0 =
    n k (k+1)^2 / 4 (integer for k = 5) so the direction of the
    trend reads off the sign of L - E[L].

    Scale shape: identical to the Friedman row — one corpus agg, a
    tiny rank table, a 1-row assembly.
    """
    cells = _block_cells(spark, sf_dir)
    w = Window.partitionBy("block").orderBy(F.col("v").asc(), F.col("treatment").asc())
    ranked = cells.withColumn("r", F.row_number().over(w).cast("long"))
    sums = ranked.groupBy("treatment").agg(
        F.sum("r").cast("long").alias("rank_sum"),
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
    ).withColumn(
        "j", F.substring(F.col("treatment"), 1, 1).cast("long")
    )
    assembly = sums.agg(
        F.max("n_blocks").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(F.col("j") * F.col("rank_sum")).cast("long").alias("l_stat"),
    ).select(
        "n",
        "k",
        "l_stat",
        (
            F.col("n") * F.col("k") * (F.col("k") + 1) * (F.col("k") + 1) / 4
        )
        .cast("long")
        .alias("l_expected"),
    )
    return (
        sums.crossJoin(F.broadcast(assembly))
        .select("treatment", "j", "rank_sum", "l_stat", "l_expected")
        .orderBy("treatment")
    )


_PAGE_ORACLE = f"""
  WITH {_BLOCK_CELLS_SQL}, ranked AS (
    SELECT *, CAST(row_number() OVER (PARTITION BY block
                                      ORDER BY v, treatment) AS BIGINT) AS r
    FROM cc
  ), sums AS (
    SELECT treatment, CAST(substr(treatment, 1, 1) AS BIGINT) AS j,
           CAST(sum(r) AS BIGINT) AS rank_sum,
           CAST(count(*) AS BIGINT) AS n_blocks
    FROM ranked GROUP BY 1, 2
  ), assembly AS (
    SELECT CAST(max(n_blocks) AS BIGINT) AS n,
           CAST(count(*) AS BIGINT) AS k,
           CAST(sum(j * rank_sum) AS BIGINT) AS l_stat,
           CAST(max(n_blocks) * count(*) * (count(*) + 1) * (count(*) + 1)
                / 4 AS BIGINT) AS l_expected
    FROM sums
  )
  SELECT s.treatment, s.j, s.rank_sum, a.l_stat, a.l_expected
  FROM sums s CROSS JOIN assembly a
  ORDER BY s.treatment
"""


# ---------------------------------------------------------------------------
# 3. Cochran's Q
# ---------------------------------------------------------------------------

_CQ_BLOCKS = 20


def agg_cochran_q_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q over matched binary outcomes: blocks = 20 customer
    buckets (o_custkey % 20), treatments = the 3 return flags, and
    the binary x = whether the cell's mean discount (integer ppm DIV)
    exceeds its BLOCK's overall mean — a within-block comparison that
    stays non-degenerate at every scale (any fixed absolute threshold
    concentrates to all-0 or all-1 as cells grow — found at the sf0.01
    dev-check). Q = (k-1) (k sum C_j^2 - N^2) / (k N - sum R_i^2)
    from exact integer column totals C_j, row totals R_i, and grand
    total N, floored to e6 once; the degenerate all-equal-rows case
    (denominator 0) emits q_e6 = 0 on both engines. Only complete
    blocks (all 3 flags present) enter — stated.

    Scale shape: one lineitem-orders equi-join + one group agg build
    the 60-cell table; everything after is arithmetic on it.
    """
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_returnflag",
        F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("long").alias("disc_pct"),
    )
    sums = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            (F.col("o_custkey") % _CQ_BLOCKS).cast("long").alias("block"),
            F.col("l_returnflag").alias("treatment"),
        )
        .agg(
            F.sum("disc_pct").cast("long").alias("d_sum"),
            F.count(F.lit(1)).cast("long").alias("cnt"),
        )
    )
    block_tot = sums.groupBy("block").agg(
        F.sum("d_sum").cast("long").alias("bd_sum"),
        F.sum("cnt").cast("long").alias("b_cnt"),
    )
    cells = sums.join(block_tot, "block").select(
        "block",
        "treatment",
        F.when(
            F.expr("(d_sum * 1000000) DIV cnt")
            > F.expr("(bd_sum * 1000000) DIV b_cnt"),
            1,
        )
        .otherwise(0)
        .cast("long")
        .alias("x"),
    )
    complete = (
        cells.groupBy("block")
        .agg(F.count(F.lit(1)).alias("_k"))
        .where(F.col("_k") == 3)
        .select("block")
    )
    cc = cells.join(complete, "block", "left_semi")
    row_tot = cc.groupBy("block").agg(F.sum("x").cast("long").alias("r_i"))
    col_tot = cc.groupBy("treatment").agg(F.sum("x").cast("long").alias("c_j"))
    assembly = (
        col_tot.agg(
            F.count(F.lit(1)).cast("long").alias("k"),
            F.sum("c_j").cast("long").alias("n_tot"),
            F.sum(F.col("c_j") * F.col("c_j")).cast("long").alias("ss_c"),
        )
        .crossJoin(
            F.broadcast(
                row_tot.agg(
                    F.sum(F.col("r_i") * F.col("r_i")).cast("long").alias("ss_r"),
                    F.count(F.lit(1)).cast("long").alias("n_blocks"),
                )
            )
        )
        .select(
            "k",
            "n_blocks",
            "n_tot",
            F.when(
                F.col("k") * F.col("n_tot") - F.col("ss_r") > 0,
                F.floor(
                    (F.col("k").cast("double") - 1)
                    * (
                        F.col("k").cast("double") * F.col("ss_c").cast("double")
                        - F.col("n_tot").cast("double")
                        * F.col("n_tot").cast("double")
                    )
                    / (
                        F.col("k").cast("double") * F.col("n_tot").cast("double")
                        - F.col("ss_r").cast("double")
                    )
                    * 1000000
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("q_e6"),
        )
    )
    return (
        col_tot.crossJoin(F.broadcast(assembly))
        .select("treatment", "c_j", "k", "n_blocks", "n_tot", "q_e6")
        .orderBy("treatment")
    )


_COCHRAN_ORACLE = f"""
  WITH sums AS (
    SELECT CAST(o.o_custkey % {_CQ_BLOCKS} AS BIGINT) AS block,
           l.l_returnflag AS treatment,
           CAST(sum(CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS d_sum,
           CAST(count(*) AS BIGINT) AS cnt
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2
  ), block_tot AS (
    SELECT block, CAST(sum(d_sum) AS BIGINT) AS bd_sum,
           CAST(sum(cnt) AS BIGINT) AS b_cnt
    FROM sums GROUP BY 1
  ), cells AS (
    SELECT s.block, s.treatment,
           CAST(CASE WHEN (s.d_sum * 1000000) // s.cnt
                          > (b.bd_sum * 1000000) // b.b_cnt
                     THEN 1 ELSE 0 END AS BIGINT) AS x
    FROM sums s JOIN block_tot b USING (block)
  ), complete AS (
    SELECT block FROM cells GROUP BY 1 HAVING count(*) = 3
  ), cc AS (
    SELECT cells.* FROM cells JOIN complete USING (block)
  ), row_tot AS (
    SELECT block, CAST(sum(x) AS BIGINT) AS r_i FROM cc GROUP BY 1
  ), col_tot AS (
    SELECT treatment, CAST(sum(x) AS BIGINT) AS c_j FROM cc GROUP BY 1
  ), assembly AS (
    SELECT c.k, r.n_blocks, c.n_tot,
           CAST(CASE WHEN c.k * c.n_tot - r.ss_r > 0
                THEN floor((CAST(c.k AS DOUBLE) - 1)
                      * (CAST(c.k AS DOUBLE) * CAST(c.ss_c AS DOUBLE)
                         - CAST(c.n_tot AS DOUBLE) * CAST(c.n_tot AS DOUBLE))
                      / (CAST(c.k AS DOUBLE) * CAST(c.n_tot AS DOUBLE)
                         - CAST(r.ss_r AS DOUBLE))
                      * 1000000)
                ELSE 0 END AS BIGINT) AS q_e6
    FROM (SELECT CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(c_j) AS BIGINT) AS n_tot,
                 CAST(sum(c_j * c_j) AS BIGINT) AS ss_c FROM col_tot) c
    CROSS JOIN (SELECT CAST(sum(r_i * r_i) AS BIGINT) AS ss_r,
                       CAST(count(*) AS BIGINT) AS n_blocks FROM row_tot) r
  )
  SELECT t.treatment, t.c_j, a.k, a.n_blocks, a.n_tot, a.q_e6
  FROM col_tot t CROSS JOIN assembly a
  ORDER BY t.treatment
"""


# ---------------------------------------------------------------------------
# 4. Jonckheere-Terpstra
# ---------------------------------------------------------------------------


def agg_jonckheere_terpstra_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheere-Terpstra ordered-alternative test across the 5
    priorities on order revenue cents: JT2 = sum over ordered group
    pairs (g < h) of the DOUBLED Mann-Whitney count U2_gh =
    2 #(x_g < y_h) + #(x_g = y_h) — exact integers via the
    value-table device: one (cents -> per-group count) aggregate with
    per-group running totals prices every pair in ONE pass, never a
    pairwise join. Emits one row per ordered pair with its U2 plus
    the shared JT2 total.

    Scale shape: one value-keyed corpus agg (the only shuffle), then
    windows over the distinct-value table and a 1-row assembly.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        F.substring("o_orderpriority", 1, 1).cast("long").alias("g"),
        rnd_cents(F.col("o_totalprice")).alias("v"),
    )
    counts = orders.groupBy("v").agg(
        *[
            F.sum(F.when(F.col("g") == i, 1).otherwise(0))
            .cast("long")
            .alias(f"c{i}")
            for i in range(1, _PRIORITIES + 1)
        ]
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    for i in range(1, _PRIORITIES + 1):
        counts = counts.withColumn(
            f"b{i}",
            F.coalesce(F.sum(f"c{i}").over(w), F.lit(0)).cast("long"),
        )
    pair_terms = []
    for g in range(1, _PRIORITIES + 1):
        for h in range(g + 1, _PRIORITIES + 1):
            pair_terms.append(
                F.struct(
                    F.lit(g).cast("long").alias("g"),
                    F.lit(h).cast("long").alias("h"),
                    F.sum(
                        F.col(f"c{h}")
                        * (2 * F.col(f"b{g}") + F.col(f"c{g}"))
                    )
                    .cast("long")
                    .alias("u2"),
                )
            )
    pairs = counts.agg(F.array(*pair_terms).alias("arr")).select(
        F.explode("arr").alias("p")
    ).select(
        F.col("p.g").alias("g"), F.col("p.h").alias("h"), F.col("p.u2").alias("u2")
    )
    total = pairs.agg(F.sum("u2").cast("long").alias("jt2"))
    return (
        pairs.crossJoin(F.broadcast(total))
        .select("g", "h", "u2", "jt2")
        .orderBy("g", "h")
    )


def _jt_oracle() -> str:
    c_cols = ",\n           ".join(
        f"CAST(sum(CASE WHEN g = {i} THEN 1 ELSE 0 END) AS BIGINT) AS c{i}"
        for i in range(1, _PRIORITIES + 1)
    )
    b_cols = ",\n           ".join(
        f"CAST(coalesce(sum(c{i}) OVER (ORDER BY v"
        f" ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)"
        f" AS b{i}"
        for i in range(1, _PRIORITIES + 1)
    )
    pair_rows = "\n      UNION ALL ".join(
        f"SELECT CAST({g} AS BIGINT) AS g, CAST({h} AS BIGINT) AS h,"
        f" CAST(sum(c{h} * (2 * b{g} + c{g})) AS BIGINT) AS u2 FROM cum"
        for g in range(1, _PRIORITIES + 1)
        for h in range(g + 1, _PRIORITIES + 1)
    )
    return f"""
    WITH o AS (
      SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS g,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
      FROM orders
    ), counts AS (
      SELECT v,
           {c_cols}
      FROM o GROUP BY 1
    ), cum AS (
      SELECT *,
           {b_cols}
      FROM counts
    ), pairs AS (
      {pair_rows}
    ), total AS (
      SELECT CAST(sum(u2) AS BIGINT) AS jt2 FROM pairs
    )
    SELECT p.g, p.h, p.u2, t.jt2
    FROM pairs p CROSS JOIN total t
    ORDER BY p.g, p.h
    """


# ---------------------------------------------------------------------------
# 5. Cliff's delta
# ---------------------------------------------------------------------------


def agg_cliffs_delta_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cliff's delta ordinal effect size between returned ('R') and
    non-returned ('N') line items on extended price cents: gt / lt /
    eq pair counts from the value-table device (one value-keyed agg +
    running totals — never an item-pair join), and delta =
    (gt - lt) / (n_r * n_n) floored to e6 via exact-double (the
    signed quotient NEVER goes through integer division: Spark DIV
    truncates toward zero while DuckDB // floors).

    Scale shape: one value-keyed corpus agg, windows on the distinct-
    value table, a 1-row result.
    """
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag").isin("R", "N")
    ).select(
        (F.col("l_returnflag") == "R").alias("is_r"),
        rnd_cents(F.col("l_extendedprice")).alias("v"),
    )
    counts = li.groupBy("v").agg(
        F.sum(F.when(F.col("is_r"), 1).otherwise(0)).cast("long").alias("cr"),
        F.sum(F.when(F.col("is_r"), 0).otherwise(1)).cast("long").alias("cn"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cum = counts.withColumn(
        "bn", F.coalesce(F.sum("cn").over(w), F.lit(0)).cast("long")
    )
    agg = cum.agg(
        F.sum("cr").cast("long").alias("n_r"),
        F.sum("cn").cast("long").alias("n_n"),
        F.sum(F.col("cr") * F.col("bn")).cast("long").alias("gt"),
        F.sum(F.col("cr") * F.col("cn")).cast("long").alias("eq"),
    ).select(
        "n_r",
        "n_n",
        "gt",
        (F.col("n_r") * F.col("n_n") - F.col("gt") - F.col("eq"))
        .cast("long")
        .alias("lt"),
        "eq",
    )
    return agg.select(
        "n_r",
        "n_n",
        "gt",
        "lt",
        "eq",
        F.floor(
            (F.col("gt") - F.col("lt")).cast("double")
            / (F.col("n_r").cast("double") * F.col("n_n").cast("double"))
            * 1000000
        )
        .cast("long")
        .alias("delta_e6"),
    )


_CLIFFS_ORACLE = """
  WITH li AS (
    SELECT (l_returnflag = 'R') AS is_r,
           CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v
    FROM lineitem WHERE l_returnflag IN ('R', 'N')
  ), counts AS (
    SELECT v,
           CAST(sum(CASE WHEN is_r THEN 1 ELSE 0 END) AS BIGINT) AS cr,
           CAST(sum(CASE WHEN is_r THEN 0 ELSE 1 END) AS BIGINT) AS cn
    FROM li GROUP BY 1
  ), cum AS (
    SELECT *, CAST(coalesce(sum(cn) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS bn
    FROM counts
  ), agg AS (
    SELECT CAST(sum(cr) AS BIGINT) AS n_r,
           CAST(sum(cn) AS BIGINT) AS n_n,
           CAST(sum(cr * bn) AS BIGINT) AS gt,
           CAST(sum(cr * cn) AS BIGINT) AS eq
    FROM cum
  )
  SELECT n_r, n_n, gt,
         CAST(n_r * n_n - gt - eq AS BIGINT) AS lt, eq,
         CAST(floor(CAST(gt - (n_r * n_n - gt - eq) AS DOUBLE)
                    / (CAST(n_r AS DOUBLE) * CAST(n_n AS DOUBLE))
                    * 1000000) AS BIGINT) AS delta_e6
  FROM agg
"""


# ---------------------------------------------------------------------------
# 6. Cramer's V
# ---------------------------------------------------------------------------


def agg_cramers_v_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramer's V effect size of the market-segment x order-priority
    contingency: chi-square from exact integer cell/margin counts
    (expected counts are rationals — assembled in exact-double:
    chi2 = sum over cells (O - R C / N)^2 / (R C / N)), then
    V = sqrt(chi2 / (N (min(r,c) - 1))), one e6 floor each. Single
    summary row with the table dimensions.

    Scale shape: one equi-join + one group agg build the r x c cell
    table; margins and the chi-square are windows/aggs over it.
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    cells = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("pri"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
    )
    wr = Window.partitionBy("seg")
    wc = Window.partitionBy("pri")
    wn = Window.partitionBy()
    with_margins = (
        cells.withColumn("row_tot", F.sum("o").over(wr).cast("long"))
        .withColumn("col_tot", F.sum("o").over(wc).cast("long"))
        .withColumn("n_all", F.sum("o").over(wn).cast("long"))
        .withColumn(
            "e",
            F.col("row_tot").cast("double")
            * F.col("col_tot").cast("double")
            / F.col("n_all").cast("double"),
        )
    )
    return (
        with_margins.agg(
            F.sum("o").cast("long").alias("n"),
            F.countDistinct("seg").cast("long").alias("r"),
            F.countDistinct("pri").cast("long").alias("c"),
            F.sum(
                (F.col("o").cast("double") - F.col("e"))
                * (F.col("o").cast("double") - F.col("e"))
                / F.col("e")
            ).alias("chi2"),
        )
        .select(
            "n",
            "r",
            "c",
            F.floor(F.col("chi2") * 1000000).cast("long").alias("chi2_e6"),
            F.floor(
                F.sqrt(
                    F.col("chi2")
                    / (
                        F.col("n").cast("double")
                        * (F.least("r", "c").cast("double") - 1)
                    )
                )
                * 1000000
            )
            .cast("long")
            .alias("cramers_v_e6"),
        )
    )


_CRAMERS_ORACLE = """
  WITH cells AS (
    SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri,
           CAST(count(*) AS BIGINT) AS o
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1, 2
  ), m AS (
    SELECT *,
           CAST(sum(o) OVER (PARTITION BY seg) AS BIGINT) AS row_tot,
           CAST(sum(o) OVER (PARTITION BY pri) AS BIGINT) AS col_tot,
           CAST(sum(o) OVER () AS BIGINT) AS n
    FROM cells
  ), agg AS (
    SELECT CAST(max(n) AS BIGINT) AS n,
           CAST(count(DISTINCT seg) AS BIGINT) AS r,
           CAST(count(DISTINCT pri) AS BIGINT) AS c,
           sum((CAST(o AS DOUBLE)
                - CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
                  / CAST(n AS DOUBLE))
               * (CAST(o AS DOUBLE)
                  - CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
                    / CAST(n AS DOUBLE))
               / (CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
                  / CAST(n AS DOUBLE))) AS chi2
    FROM m
  )
  SELECT n, r, c,
         CAST(floor(chi2 * 1000000) AS BIGINT) AS chi2_e6,
         CAST(floor(sqrt(chi2 / (CAST(n AS DOUBLE)
                                 * (CAST(least(r, c) AS DOUBLE) - 1)))
                    * 1000000) AS BIGINT) AS cramers_v_e6
  FROM agg
"""


# ---------------------------------------------------------------------------
# 7. Mood's median test
# ---------------------------------------------------------------------------


def agg_mood_median_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test of order revenue across the 5 priorities:
    the grand median is the lower-middle order statistic (exact
    deterministic rank — the Levene device), per group the counts
    above / not-above it, and the 2 x k chi-square assembled in
    exact-double from integer counts with one e6 floor.

    Scale shape: one global rank window for the median (a single
    order statistic — at production scale this becomes the exact
    percentile device), one group agg, a 1-row assembly.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", rnd_cents(F.col("o_totalprice")).alias("cents")
    )
    w = Window.orderBy(F.col("cents").asc(), F.col("o_orderpriority").asc())
    med = (
        orders.withColumn("rk", F.row_number().over(w))
        .withColumn("n_all", F.count(F.lit(1)).over(Window.partitionBy()))
        .where(F.col("rk") == F.expr("(n_all + 1) DIV 2"))
        .select(F.col("cents").alias("median_cents"))
    )
    flagged = orders.crossJoin(F.broadcast(med)).select(
        "o_orderpriority",
        F.when(F.col("cents") > F.col("median_cents"), 1)
        .otherwise(0)
        .cast("long")
        .alias("above"),
        "median_cents",
    )
    groups = flagged.groupBy("o_orderpriority", "median_cents").agg(
        F.sum("above").cast("long").alias("n_above"),
        F.sum(F.lit(1) - F.col("above")).cast("long").alias("n_notabove"),
    )
    assembly = groups.agg(
        F.sum(F.col("n_above") + F.col("n_notabove")).cast("long").alias("n"),
        F.sum("n_above").cast("long").alias("tot_above"),
        F.sum(
            # chi2 contribution of both cells of this group's column,
            # E_above = n_g * tot_above / n computed in the outer select
            F.lit(0.0)
        ).alias("_z"),
    )
    # chi-square needs tot_above; assemble via a second pass join
    stats = groups.crossJoin(F.broadcast(assembly)).select(
        "o_orderpriority",
        "n_above",
        "n_notabove",
        "n",
        "tot_above",
        (
            (F.col("n_above") + F.col("n_notabove")).cast("double")
            * F.col("tot_above").cast("double")
            / F.col("n").cast("double")
        ).alias("e_above"),
    )
    chi2 = stats.agg(
        F.sum(
            (F.col("n_above").cast("double") - F.col("e_above"))
            * (F.col("n_above").cast("double") - F.col("e_above"))
            / F.col("e_above")
            + (
                F.col("n_notabove").cast("double")
                - (
                    (F.col("n_above") + F.col("n_notabove")).cast("double")
                    - F.col("e_above")
                )
            )
            * (
                F.col("n_notabove").cast("double")
                - (
                    (F.col("n_above") + F.col("n_notabove")).cast("double")
                    - F.col("e_above")
                )
            )
            / (
                (F.col("n_above") + F.col("n_notabove")).cast("double")
                - F.col("e_above")
            )
        ).alias("chi2")
    ).select(F.floor(F.col("chi2") * 1000000).cast("long").alias("chi2_e6"))
    return (
        groups.crossJoin(F.broadcast(chi2))
        .select(
            "o_orderpriority", "median_cents", "n_above", "n_notabove", "chi2_e6"
        )
        .orderBy("o_orderpriority")
    )


_MOOD_ORACLE = """
  WITH o AS (
    SELECT o_orderpriority,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
    FROM orders
  ), med AS (
    SELECT cents AS median_cents FROM (
      SELECT cents,
             row_number() OVER (ORDER BY cents, o_orderpriority) AS rk,
             count(*) OVER () AS n_all
      FROM o)
    WHERE rk = (n_all + 1) // 2
  ), flagged AS (
    SELECT o.o_orderpriority, m.median_cents,
           CAST(CASE WHEN o.cents > m.median_cents THEN 1 ELSE 0 END
                AS BIGINT) AS above
    FROM o CROSS JOIN med m
  ), groups AS (
    SELECT o_orderpriority, median_cents,
           CAST(sum(above) AS BIGINT) AS n_above,
           CAST(sum(1 - above) AS BIGINT) AS n_notabove
    FROM flagged GROUP BY 1, 2
  ), tot AS (
    SELECT CAST(sum(n_above + n_notabove) AS BIGINT) AS n,
           CAST(sum(n_above) AS BIGINT) AS tot_above
    FROM groups
  ), chi2 AS (
    SELECT CAST(floor(sum(
             (CAST(n_above AS DOUBLE) - e_above)
             * (CAST(n_above AS DOUBLE) - e_above) / e_above
             + (CAST(n_notabove AS DOUBLE)
                - (CAST(n_above + n_notabove AS DOUBLE) - e_above))
               * (CAST(n_notabove AS DOUBLE)
                  - (CAST(n_above + n_notabove AS DOUBLE) - e_above))
               / (CAST(n_above + n_notabove AS DOUBLE) - e_above))
             * 1000000) AS BIGINT) AS chi2_e6
    FROM (
      SELECT g.*,
             CAST(g.n_above + g.n_notabove AS DOUBLE)
             * CAST(t.tot_above AS DOUBLE) / CAST(t.n AS DOUBLE) AS e_above
      FROM groups g CROSS JOIN tot t)
  )
  SELECT g.o_orderpriority, g.median_cents, g.n_above, g.n_notabove,
         c.chi2_e6
  FROM groups g CROSS JOIN chi2 c
  ORDER BY g.o_orderpriority
"""


# ---------------------------------------------------------------------------
# 8. Wilcoxon signed-rank (paired halves)
# ---------------------------------------------------------------------------

_WSR_SPLIT = "1998-05-01"


def agg_wilcoxon_signed_rank_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test pairing each customer's total revenue
    in the first vs second half of the date range (split at
    1998-05-01): d = cents_2 - cents_1 over customers active in BOTH
    halves with d != 0 (zeros dropped — standard), DOUBLED ranks of
    |d| with the exact tie device (a tie run at positions p..p+c-1
    gets rank2 = 2p + c - 1), and W2+ / W2- = doubled signed rank
    sums. W2+ + W2- = n (n + 1) — the identity pinned in pytest.
    Emits one row per sign with its doubled rank sum and the shared
    n.

    Scale shape: two conditional sums per customer in ONE agg, a
    value-keyed rank table (the Kruskal device), one join back.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.when(
            F.col("o_orderdate") < F.lit(_WSR_SPLIT).cast("timestamp"), 1
        )
        .otherwise(2)
        .alias("half"),
        rnd_cents(F.col("o_totalprice")).alias("cents"),
    )
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.when(F.col("half") == 1, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("c1"),
        F.sum(F.when(F.col("half") == 2, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("c2"),
        F.max(F.when(F.col("half") == 1, 1).otherwise(0)).alias("h1"),
        F.max(F.when(F.col("half") == 2, 1).otherwise(0)).alias("h2"),
    )
    diffs = (
        per_cust.where((F.col("h1") == 1) & (F.col("h2") == 1))
        .select((F.col("c2") - F.col("c1")).cast("long").alias("d"))
        .where(F.col("d") != 0)
        .select(
            F.abs(F.col("d")).cast("long").alias("ad"),
            F.when(F.col("d") > 0, 1).otherwise(0).cast("long").alias("pos"),
        )
    )
    by_val = diffs.groupBy("ad").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("pos").cast("long").alias("n_pos"),
    )
    w = Window.orderBy("ad").rowsBetween(Window.unboundedPreceding, -1)
    ranked = by_val.withColumn(
        "before", F.coalesce(F.sum("cnt").over(w), F.lit(0)).cast("long")
    ).select(
        "ad",
        "cnt",
        "n_pos",
        (F.lit(2) * (F.col("before") + 1) + F.col("cnt") - 1)
        .cast("long")
        .alias("rank2"),
    )
    sums = ranked.agg(
        F.sum(F.col("n_pos") * F.col("rank2")).cast("long").alias("w2_plus"),
        F.sum((F.col("cnt") - F.col("n_pos")) * F.col("rank2"))
        .cast("long")
        .alias("w2_minus"),
        F.sum("cnt").cast("long").alias("n_pairs"),
    )
    return sums.select(
        F.lit("pos").alias("sign"),
        F.col("w2_plus").alias("w2"),
        "n_pairs",
    ).unionByName(
        sums.select(
            F.lit("neg").alias("sign"),
            F.col("w2_minus").alias("w2"),
            "n_pairs",
        )
    ).orderBy("sign")


_WILCOXON_ORACLE = f"""
  WITH o AS (
    SELECT o_custkey,
           CASE WHEN o_orderdate < TIMESTAMP '{_WSR_SPLIT}' THEN 1 ELSE 2 END
             AS half,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
    FROM orders
  ), per_cust AS (
    SELECT o_custkey,
           CAST(sum(CASE WHEN half = 1 THEN cents ELSE 0 END) AS BIGINT) AS c1,
           CAST(sum(CASE WHEN half = 2 THEN cents ELSE 0 END) AS BIGINT) AS c2,
           max(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS h1,
           max(CASE WHEN half = 2 THEN 1 ELSE 0 END) AS h2
    FROM o GROUP BY 1
  ), diffs AS (
    SELECT CAST(abs(c2 - c1) AS BIGINT) AS ad,
           CAST(CASE WHEN c2 - c1 > 0 THEN 1 ELSE 0 END AS BIGINT) AS pos
    FROM per_cust WHERE h1 = 1 AND h2 = 1 AND c2 - c1 <> 0
  ), by_val AS (
    SELECT ad, CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(pos) AS BIGINT) AS n_pos
    FROM diffs GROUP BY 1
  ), ranked AS (
    SELECT *,
           CAST(2 * (coalesce(sum(cnt) OVER (ORDER BY ad
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1)
                + cnt - 1 AS BIGINT) AS rank2
    FROM by_val
  ), sums AS (
    SELECT CAST(sum(n_pos * rank2) AS BIGINT) AS w2_plus,
           CAST(sum((cnt - n_pos) * rank2) AS BIGINT) AS w2_minus,
           CAST(sum(cnt) AS BIGINT) AS n_pairs
    FROM ranked
  )
  SELECT 'pos' AS sign, w2_plus AS w2, n_pairs FROM sums
  UNION ALL
  SELECT 'neg' AS sign, w2_minus AS w2, n_pairs FROM sums
  ORDER BY sign
"""


PENDING: tuple[PendingQuery, ...] = (
    PendingQuery(
        "agg_friedman_test",
        agg_friedman_test_query,
        _FRIEDMAN_ORACLE,
        tags=("agg", "friedman", "rank-test", "blocks", "exact-double"),
    ),
    PendingQuery(
        "agg_page_trend",
        agg_page_trend_query,
        _PAGE_ORACLE,
        tags=("agg", "page-trend", "ordered-alternative", "integer-exact"),
    ),
    PendingQuery(
        "agg_cochran_q",
        agg_cochran_q_query,
        _COCHRAN_ORACLE,
        tags=("agg", "cochran-q", "matched-binary", "exact-double"),
    ),
    PendingQuery(
        "agg_jonckheere_terpstra",
        agg_jonckheere_terpstra_query,
        _jt_oracle(),
        tags=("agg", "jonckheere", "ordered-alternative",
              "value-table-device", "integer-exact"),
    ),
    PendingQuery(
        "agg_cliffs_delta",
        agg_cliffs_delta_query,
        _CLIFFS_ORACLE,
        tags=("agg", "cliffs-delta", "effect-size", "value-table-device",
              "exact-double"),
    ),
    PendingQuery(
        "agg_cramers_v",
        agg_cramers_v_query,
        _CRAMERS_ORACLE,
        tags=("agg", "cramers-v", "effect-size", "contingency",
              "exact-double"),
    ),
    PendingQuery(
        "agg_mood_median",
        agg_mood_median_query,
        _MOOD_ORACLE,
        tags=("agg", "mood-median", "rank-test", "exact-double"),
    ),
    PendingQuery(
        "agg_wilcoxon_signed_rank",
        agg_wilcoxon_signed_rank_query,
        _WILCOXON_ORACLE,
        tags=("agg", "wilcoxon", "paired", "doubled-rank",
              "integer-exact"),
    ),
)
