"""Round-29 declared-query staging area — the DEPTH-CUTS wave:
stylometry, the Yannakakis semi-join schedule, and the robust
location estimator that pairs with the Mann-Kendall row.

- **Burrows' Delta** (Burrows '02, the stylometry standard): per
  source, integer-scaled relative frequencies of the top-30 corpus
  words; z-scores across sources from exact integer moments
  (DECIMAL(38,0) sum of squares — the dispersion-row precedent);
  Delta(a,b) = mean |z_a - z_b| — an INTEGER e6 sum, so the
  source-similarity ranking is exact. Which sources 'write alike'.
- **Yannakakis semi-join reduction** (Yannakakis '81): the acyclic
  region->nation->customer->orders chain reduced bottom-up by
  semi-joins BEFORE the joins run — per-stage rows before/after and
  reduction ppm, plus the final join count that the direct plan must
  (and does, by construction) reproduce. The query-processing
  schedule every distributed engine wants for acyclic joins, stated
  as a checkable report.
- **Hodges-Lehmann estimator** (the location companion of
  Mann-Kendall): the exact median of all pairwise day-revenue sums
  (kept x2 to stay integer) over a bounded 101-day series, next to
  the plain median — the robust-location reading.

Per-wave staging module (nothing evidenced imports this file).
Exactness rules as earlier waves: integer ppm/e6/e9 via DIV/`//`,
BIGINT casts, DECIMAL(38,0) second moments, deterministic tiebreaks.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.functions.text import is_nonblank, tokens
from spotify_data_pipeline_spark.io import load_table
from spotify_data_pipeline_spark.plans.parity import rnd_cents


@dataclass(frozen=True)
class PendingQuery:
    name: str
    fn: object
    oracle: str | None
    headline: bool = False
    tags: tuple[str, ...] = ()


_TOKENS_SQL = "string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')"


# ---------------------------------------------------------------------------
# 1. Burrows' Delta — stylometric source similarity
# ---------------------------------------------------------------------------

_BD_WORDS = 30
_BD_TOP_PAIRS = 10


def text_burrows_delta_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta between sources: for the top-30 corpus words
    (tf DESC, term ASC), each source's relative frequency is the
    exact integer r_e9 = (count * 1e9) DIV source_tokens; across the
    sources each word gets integer moments (sum, DECIMAL(38,0) sum of
    squares), and the z-score is z_e6 = floor((r*n - sum_r) /
    sqrt(n*sumsq - sum_r^2) * sqrt(n) ... stated identically on both
    engines as floor((r*n - sum_r) * 1e6 / sqrt(CAST(n*sumsq -
    sum_r*sum_r AS DOUBLE)) + 0.5) — one DECIMAL->DOUBLE conversion
    per word (the dispersion-row precedent), every subsequent step
    the same IEEE op. Delta(a,b) = sum |z_a - z_b| DIV n_words — an
    integer. Emits the 10 closest source pairs: the 'written by the
    same hand' readout.

    Scale shape: token explode -> (source, word) agg against the
    bounded top-k vocabulary -> word-keyed moment agg (bounded by
    vocabulary) -> word-keyed z join -> source-pair agg over the
    DENSE source x source grid of a 30-row-per-source table — the
    pair join is vocabulary-keyed, never corpus x corpus.
    """
    docs = load_table(spark, sf_dir, "documents").where(
        is_nonblank(F.col("text"))
    )
    tok = docs.select(
        "source", F.explode(tokens(F.col("text"))).alias("term")
    )
    vocab = (
        tok.groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .orderBy(F.col("tf").desc(), F.col("term").asc())
        .limit(_BD_WORDS)
        .select("term")
    )
    src_tot = tok.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("tot")
    )
    # dense (source, word) grid so absent words carry r_e9 = 0
    grid = src_tot.crossJoin(F.broadcast(vocab))
    counts = (
        tok.join(F.broadcast(vocab), "term")
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    rel = grid.join(counts, ["source", "term"], "left").select(
        "source",
        "term",
        F.expr("(coalesce(c, 0) * 1000000000) DIV tot")
        .cast("long")
        .alias("r_e9"),
    )
    moments = rel.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("r_e9").cast("long").alias("sum_r"),
        F.sum(
            F.col("r_e9").cast("decimal(38,0)")
            * F.col("r_e9").cast("decimal(38,0)")
        ).alias("sumsq"),
    )
    z = rel.join(moments, "term").select(
        "source",
        "term",
        F.floor(
            (F.col("r_e9") * F.col("n") - F.col("sum_r"))
            * F.lit(1000000.0)
            / F.sqrt(
                (
                    F.col("n") * F.col("sumsq")
                    - F.col("sum_r").cast("decimal(38,0)")
                    * F.col("sum_r").cast("decimal(38,0)")
                ).cast("double")
            )
            + F.lit(0.5)
        )
        .cast("long")
        .alias("z_e6"),
    )
    a = z.select(
        F.col("source").alias("source_a"), "term", F.col("z_e6").alias("za")
    )
    b = z.select(
        F.col("source").alias("source_b"), "term", F.col("z_e6").alias("zb")
    )
    return (
        a.join(b, "term")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.expr("sum(abs(za - zb)) DIV count(1)")
            .cast("long")
            .alias("delta_e6")
        )
        .orderBy(F.col("delta_e6").asc(), "source_a", "source_b")
        .limit(_BD_TOP_PAIRS)
    )


_BD_ORACLE = f"""
  WITH tok AS (
    SELECT source, unnest({_TOKENS_SQL}) AS term
    FROM documents WHERE length(trim(text)) > 0
  ), vocab AS (
    SELECT term FROM (
      SELECT term, count(*) AS tf FROM tok GROUP BY 1)
    ORDER BY tf DESC, term ASC LIMIT {_BD_WORDS}
  ), src_tot AS (
    SELECT source, CAST(count(*) AS BIGINT) AS tot FROM tok GROUP BY 1
  ), counts AS (
    SELECT source, term, CAST(count(*) AS BIGINT) AS c
    FROM tok JOIN vocab USING (term) GROUP BY 1, 2
  ), rel AS (
    SELECT g.source, g.term,
           CAST((coalesce(c.c, 0) * 1000000000) // g.tot AS BIGINT) AS r_e9
    FROM (SELECT source, tot, term FROM src_tot CROSS JOIN vocab) g
    LEFT JOIN counts c ON c.source = g.source AND c.term = g.term
  ), moments AS (
    SELECT term, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(r_e9) AS BIGINT) AS sum_r,
           sum(CAST(r_e9 AS DECIMAL(38,0)) * CAST(r_e9 AS DECIMAL(38,0)))
             AS sumsq
    FROM rel GROUP BY 1
  ), z AS (
    SELECT source, term,
           CAST(floor(
             (r_e9 * n - sum_r) * 1000000.0
             / sqrt(CAST(n * sumsq
                         - CAST(sum_r AS DECIMAL(38,0))
                           * CAST(sum_r AS DECIMAL(38,0)) AS DOUBLE))
             + 0.5) AS BIGINT) AS z_e6
    FROM rel JOIN moments USING (term)
  )
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(sum(abs(a.z_e6 - b.z_e6)) // count(*) AS BIGINT) AS delta_e6
  FROM z a JOIN z b ON a.term = b.term AND a.source < b.source
  GROUP BY 1, 2
  ORDER BY delta_e6 ASC, source_a, source_b
  LIMIT {_BD_TOP_PAIRS}
"""


# ---------------------------------------------------------------------------
# 2. Yannakakis semi-join reduction report
# ---------------------------------------------------------------------------

_YK_REGION = "ASIA"
_YK_PRIORITY = "1-URGENT"


def join_yannakakis_reduction_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Yannakakis semi-join schedule for the acyclic chain
    region('ASIA') -> nation -> customer -> orders('1-URGENT'):
    bottom-up semi-join reduction first (orders reduced by qualifying
    customers, customers by qualifying nations AND by orders that
    survive, nations by the region AND by surviving customers), THEN
    the joins run dangling-tuple-free. The report shows rows
    before/after each reduction with ppm, plus the final join
    cardinality — by Yannakakis' theorem identical to the direct
    4-way join, which is exactly what the oracle computes for the
    final row. The semi-join schedule is how a distributed engine
    avoids shipping dangling tuples at 100 TB.

    Scale shape: each reduction is one left-semi equi-join + count;
    the dimension chain broadcasts; no stage ever materializes a
    wider row than its own table.
    """
    region = load_table(spark, sf_dir, "region").where(
        F.col("r_name") == _YK_REGION
    )
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == _YK_PRIORITY
    )
    # bottom-up pass
    nation_r = nation.join(
        F.broadcast(region.select(F.col("r_regionkey").alias("n_regionkey"))),
        "n_regionkey",
        "left_semi",
    )
    cust_n = customer.join(
        F.broadcast(nation_r.select(F.col("n_nationkey").alias("c_nationkey"))),
        "c_nationkey",
        "left_semi",
    )
    orders_c = orders.join(
        cust_n.select(F.col("c_custkey").alias("o_custkey")),
        "o_custkey",
        "left_semi",
    )
    # top-down pass: drop dangling customers/nations
    cust_full = cust_n.join(
        orders_c.select(F.col("o_custkey").alias("c_custkey")).distinct(),
        "c_custkey",
        "left_semi",
    )
    nation_full = nation_r.join(
        cust_full.select(F.col("c_nationkey").alias("n_nationkey")).distinct(),
        "n_nationkey",
        "left_semi",
    )
    final = (
        orders_c.join(
            cust_full.select("c_custkey", "c_nationkey"),
            orders_c.o_custkey == F.col("c_custkey"),
        )
        .join(
            nation_full.select("n_nationkey"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )

    def stage(name, before_df, after_df) -> DataFrame:
        nb = before_df.agg(
            F.count(F.lit(1)).cast("long").alias("rows_before")
        )
        na = after_df.agg(F.count(F.lit(1)).cast("long").alias("rows_after"))
        return (
            nb.crossJoin(F.broadcast(na))
            .select(
                F.lit(name).alias("stage"),
                "rows_before",
                "rows_after",
                F.expr(
                    "CASE WHEN rows_before > 0 THEN"
                    " (rows_after * 1000000) DIV rows_before"
                    " ELSE 0 END"
                )
                .cast("long")
                .alias("kept_ppm"),
            )
        )

    report = (
        stage("1_nation_by_region", nation, nation_r)
        .unionByName(stage("2_customer_by_nation", customer, cust_n))
        .unionByName(stage("3_orders_by_customer", orders, orders_c))
        .unionByName(stage("4_customer_by_orders", cust_n, cust_full))
        .unionByName(stage("5_nation_by_customer", nation_r, nation_full))
        .unionByName(
            final.select(
                F.lit("6_final_join").alias("stage"),
                F.col("cnt").alias("rows_before"),
                F.col("cnt").alias("rows_after"),
                F.lit(1000000).cast("long").alias("kept_ppm"),
            )
        )
    )
    return report.orderBy("stage")


_YK_ORACLE = f"""
  WITH nation_r AS (
    SELECT n.* FROM nation n
    WHERE n.n_regionkey IN (
      SELECT r_regionkey FROM region WHERE r_name = '{_YK_REGION}')
  ), cust_n AS (
    SELECT c.* FROM customer c
    WHERE c.c_nationkey IN (SELECT n_nationkey FROM nation_r)
  ), ord_p AS (
    SELECT * FROM orders WHERE o_orderpriority = '{_YK_PRIORITY}'
  ), orders_c AS (
    SELECT o.* FROM ord_p o
    WHERE o.o_custkey IN (SELECT c_custkey FROM cust_n)
  ), cust_full AS (
    SELECT c.* FROM cust_n c
    WHERE c.c_custkey IN (SELECT o_custkey FROM orders_c)
  ), nation_full AS (
    SELECT n.* FROM nation_r n
    WHERE n.n_nationkey IN (SELECT c_nationkey FROM cust_full)
  ), final AS (
    SELECT CAST(count(*) AS BIGINT) AS cnt
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    WHERE r.r_name = '{_YK_REGION}'
      AND o.o_orderpriority = '{_YK_PRIORITY}'
  )
  SELECT stage,
         CAST(rows_before AS BIGINT) AS rows_before,
         CAST(rows_after AS BIGINT) AS rows_after,
         CASE WHEN rows_before > 0
              THEN CAST((rows_after * 1000000) // rows_before AS BIGINT)
              ELSE CAST(0 AS BIGINT) END AS kept_ppm
  FROM (
    SELECT '1_nation_by_region' AS stage,
           (SELECT count(*) FROM nation) AS rows_before,
           (SELECT count(*) FROM nation_r) AS rows_after
    UNION ALL
    SELECT '2_customer_by_nation',
           (SELECT count(*) FROM customer),
           (SELECT count(*) FROM cust_n)
    UNION ALL
    SELECT '3_orders_by_customer',
           (SELECT count(*) FROM ord_p),
           (SELECT count(*) FROM orders_c)
    UNION ALL
    SELECT '4_customer_by_orders',
           (SELECT count(*) FROM cust_n),
           (SELECT count(*) FROM cust_full)
    UNION ALL
    SELECT '5_nation_by_customer',
           (SELECT count(*) FROM nation_r),
           (SELECT count(*) FROM nation_full)
    UNION ALL
    SELECT '6_final_join',
           (SELECT cnt FROM final),
           (SELECT cnt FROM final)
  ) t
  ORDER BY stage
"""


# ---------------------------------------------------------------------------
# 3. Hodges-Lehmann estimator
# ---------------------------------------------------------------------------

_HL_N = 101  # odd -> unique middle elements everywhere


def agg_hodges_lehmann_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges-Lehmann location estimate of daily revenue over the
    first 101 days: the median of all 101*102/2 pairwise means
    (Walsh averages), carried x2 (pairwise SUM) to stay integer, next
    to the plain median x2 — the robust-location companion of the
    Mann-Kendall trend row (both derive from the same rank
    statistics). Odd counts make both medians unique order
    statistics — no midpoint averaging anywhere.

    Scale shape: the bounded 101-row series self-joins (i <= j, 5151
    metadata pairs), one global rank, one row selected; signal length
    is the cap, not the corpus.
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.withColumn("day", F.date_trunc("day", F.col("o_orderdate")))
        .groupBy("day")
        .agg(F.sum(rnd_cents(F.col("o_totalprice"))).cast("long").alias("x"))
    )
    w = Window.orderBy("day")
    series = (
        daily.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _HL_N)
        .select(F.col("rn").alias("i"), "x")
    )
    a = series.select(F.col("i").alias("ia"), F.col("x").alias("xa"))
    b = series.select(F.col("i").alias("ib"), F.col("x").alias("xb"))
    walsh = a.join(b, F.col("ia") <= F.col("ib")).select(
        (F.col("xa") + F.col("xb")).cast("long").alias("m2"),
        F.col("ia"),
        F.col("ib"),
    )
    n_pairs = _HL_N * (_HL_N + 1) // 2
    mid = (n_pairs + 1) // 2
    w_m2 = Window.orderBy(F.col("m2").asc(), F.col("ia").asc(), F.col("ib").asc())
    hl = (
        walsh.withColumn("rk", F.row_number().over(w_m2))
        .where(F.col("rk") == mid)
        .select(F.col("m2").alias("hl_x2"))
    )
    w_x = Window.orderBy(F.col("x").asc(), F.col("i").asc())
    med = (
        series.withColumn("rk", F.row_number().over(w_x))
        .where(F.col("rk") == (_HL_N + 1) // 2)
        .select((F.col("x") * 2).cast("long").alias("median_x2"))
    )
    return hl.crossJoin(F.broadcast(med)).select(
        F.lit(_HL_N).cast("long").alias("n_days"),
        F.lit(n_pairs).cast("long").alias("n_walsh"),
        "hl_x2",
        "median_x2",
    )


_HL_ORACLE = f"""
  WITH daily AS (
    SELECT date_trunc('day', o_orderdate) AS day,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS x
    FROM orders GROUP BY 1
  ), series AS (
    SELECT rn AS i, x FROM (
      SELECT x, row_number() OVER (ORDER BY day) AS rn FROM daily)
    WHERE rn <= {_HL_N}
  ), walsh AS (
    SELECT CAST(a.x + b.x AS BIGINT) AS m2, a.i AS ia, b.i AS ib
    FROM series a JOIN series b ON a.i <= b.i
  ), hl AS (
    SELECT m2 AS hl_x2 FROM (
      SELECT m2, row_number() OVER (ORDER BY m2, ia, ib) AS rk FROM walsh)
    WHERE rk = {(_HL_N * (_HL_N + 1) // 2 + 1) // 2}
  ), med AS (
    SELECT CAST(x * 2 AS BIGINT) AS median_x2 FROM (
      SELECT x, row_number() OVER (ORDER BY x, i) AS rk FROM series)
    WHERE rk = {(_HL_N + 1) // 2}
  )
  SELECT CAST({_HL_N} AS BIGINT) AS n_days,
         CAST({_HL_N * (_HL_N + 1) // 2} AS BIGINT) AS n_walsh,
         hl_x2, median_x2
  FROM hl CROSS JOIN med
"""


PENDING: tuple[PendingQuery, ...] = (
    PendingQuery(
        "text_burrows_delta",
        text_burrows_delta_query,
        _BD_ORACLE,
        tags=("text", "stylometry", "burrows-delta", "decimal38",
              "integer-exact"),
    ),
    PendingQuery(
        "join_yannakakis_reduction",
        join_yannakakis_reduction_query,
        _YK_ORACLE,
        tags=("join", "yannakakis", "semi-join", "acyclic",
              "integer-exact"),
    ),
    PendingQuery(
        "agg_hodges_lehmann",
        agg_hodges_lehmann_query,
        _HL_ORACLE,
        tags=("agg", "hodges-lehmann", "robust", "walsh-averages",
              "integer-exact"),
    ),
)
