"""Round-9 declared-query staging area (same contract as the
round-6/7/8 areas: built and oracle-verified NOW, deliberately NOT
declared — the round-6 through round-8 activation windows are already
fully planned, so these wait their turn).

Each entry: exact-oracle query + DuckDB SQL, exercised by
``tests/test_roundnine_pending.py`` with the driver-shaped comparison.
Families this wave: privacy risk reporting (k-anonymity), graph link
prediction (co-purchase common neighbors + integer Jaccard), engine
operability (key-skew diagnosis with salt suggestion), time-series
sufficient statistics (calendar-lag autocorrelation), and burst
detection (trailing-window trending lift).

Cross-engine exactness rules carried from earlier waves: all ratios are
integer parts-per-million via ``DIV`` / ``//`` (never float division +
floor — an IEEE quotient one ulp under an integer floors differently
than exact integer division), money enters as ``rnd_cents`` integers,
and every ORDER BY carries a full deterministic tiebreak.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.io import load_table


@dataclass(frozen=True)
class PendingQuery:
    name: str
    fn: object
    oracle: str | None
    headline: bool = False
    tags: tuple[str, ...] = ()


def privacy_k_anonymity_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity risk report over the customer quasi-identifier
    (nation, market segment, account-balance band of 1000): the
    pre-release privacy gate a training-data pipeline runs before
    shipping any attribute table (Sweeney '02). Each QI group's size k
    lands in the standard risk buckets (k=1 re-identifiable outright;
    2-4 high risk; 5-9 moderate; >=10 conventionally safe) and the
    report carries group count, row count, and each bucket's
    parts-per-million share of the population. One shuffle on the QI
    key, then a 4-row window total — integer DIV keeps the share exact
    cross-engine. At 100 TB the QI grouping is an ordinary hash agg;
    nothing is driver-side."""
    cust = load_table(spark, sf_dir, "customer")
    groups = (
        cust.select(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
        )
        .groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(F.count("*").alias("k"))
    )
    bucketed = groups.select(
        F.when(F.col("k") == 1, F.lit("1:unique"))
        .when(F.col("k") <= 4, F.lit("2:k2-4"))
        .when(F.col("k") <= 9, F.lit("3:k5-9"))
        .otherwise(F.lit("4:k10+"))
        .alias("k_bucket"),
        "k",
    )
    agg = bucketed.groupBy("k_bucket").agg(
        F.count("*").alias("n_groups"),
        F.sum("k").cast("long").alias("n_rows"),
    )
    # <=4-row result: the all-rows window total is trivially safe here
    total = F.sum("n_rows").over(Window.partitionBy())
    return agg.select(
        "k_bucket",
        F.col("n_groups").cast("long").alias("n_groups"),
        "n_rows",
        F.expr("n_rows * 1000000").cast("long").alias("_num"),
        total.cast("long").alias("_tot"),
    ).select(
        "k_bucket",
        "n_groups",
        "n_rows",
        F.expr("_num DIV _tot").cast("long").alias("share_ppm"),
    ).orderBy("k_bucket")


_K_ANONYMITY_ORACLE = """
    WITH qi AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
             count(*) AS k
      FROM customer
      GROUP BY 1, 2, 3
    ), bucketed AS (
      SELECT CASE WHEN k = 1 THEN '1:unique'
                  WHEN k <= 4 THEN '2:k2-4'
                  WHEN k <= 9 THEN '3:k5-9'
                  ELSE '4:k10+' END AS k_bucket,
             k
      FROM qi
    ), agg AS (
      SELECT k_bucket,
             CAST(count(*) AS BIGINT) AS n_groups,
             CAST(sum(k) AS BIGINT) AS n_rows
      FROM bucketed GROUP BY 1
    )
    SELECT k_bucket, n_groups, n_rows,
           CAST((n_rows * 1000000) // (sum(n_rows) OVER ()) AS BIGINT)
             AS share_ppm
    FROM agg
    ORDER BY k_bucket
"""


def graph_link_prediction_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction on the supplier co-purchase graph: suppliers
    sharing many customers are 'similar' (the common-neighbors /
    Jaccard scores of Liben-Nowell & Kleinberg '03, which are also the
    weighted bipartite projection supplier-x-supplier). Edges are the
    DISTINCT customer->supplier purchase pairs; hub customers with more
    than 50 distinct suppliers are dropped BEFORE pairing (the standard
    hub cap — a single promiscuous node otherwise contributes O(deg^2)
    pairs and no signal), and degrees are measured on the SAME capped
    graph so Jaccard stays internally consistent. Top-20 pairs by
    integer-ppm Jaccard with a full (cn, s1, s2) tiebreak. At 100 TB
    the pair fan-out is bounded by C(50,2) per customer and the join
    rides the customer equi key — never an all-pairs supplier join."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    kept = (
        edges.groupBy("c")
        .agg(F.count("*").alias("_deg_c"))
        .where(F.col("_deg_c") <= 50)
        .select("c")
    )
    capped = edges.join(kept, "c")
    deg = capped.groupBy("s").agg(F.count("*").alias("deg"))
    a = capped.select(F.col("c"), F.col("s").alias("s1"))
    b = capped.select(F.col("c"), F.col("s").alias("s2"))
    pairs = (
        a.join(b, "c")
        .where(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count("*").alias("cn"))
    )
    scored = (
        pairs.join(deg.select(F.col("s").alias("s1"), F.col("deg").alias("deg1")), "s1")
        .join(deg.select(F.col("s").alias("s2"), F.col("deg").alias("deg2")), "s2")
        .select(
            "s1",
            "s2",
            F.col("cn").cast("long").alias("common_customers"),
            F.col("deg1").cast("long").alias("deg1"),
            F.col("deg2").cast("long").alias("deg2"),
            F.expr("cn * 1000000 DIV (deg1 + deg2 - cn)")
            .cast("long")
            .alias("jaccard_ppm"),
        )
    )
    return scored.orderBy(
        F.col("jaccard_ppm").desc(),
        F.col("common_customers").desc(),
        "s1",
        "s2",
    ).limit(20)


_LINK_PREDICTION_ORACLE = """
    WITH edges AS (
      SELECT DISTINCT o_custkey AS c, l_suppkey AS s
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ), kept AS (
      SELECT c FROM edges GROUP BY c HAVING count(*) <= 50
    ), capped AS (
      SELECT e.c, e.s FROM edges e JOIN kept USING (c)
    ), deg AS (
      SELECT s, count(*) AS deg FROM capped GROUP BY s
    ), pairs AS (
      SELECT a.s AS s1, b.s AS s2, count(*) AS cn
      FROM capped a JOIN capped b ON a.c = b.c AND a.s < b.s
      GROUP BY 1, 2
    )
    SELECT p.s1, p.s2,
           CAST(p.cn AS BIGINT) AS common_customers,
           CAST(d1.deg AS BIGINT) AS deg1,
           CAST(d2.deg AS BIGINT) AS deg2,
           CAST((p.cn * 1000000) // (d1.deg + d2.deg - p.cn) AS BIGINT)
             AS jaccard_ppm
    FROM pairs p
    JOIN deg d1 ON p.s1 = d1.s
    JOIN deg d2 ON p.s2 = d2.s
    ORDER BY jaccard_ppm DESC, common_customers DESC, s1, s2
    LIMIT 20
"""


def ops_skew_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnosis — the operability query an engine
    runs on ITSELF before a big join: per-key row counts on the
    lineitem supplier key, each hot key's skew ratio vs the uniform
    share (count * n_keys / total, in ppm), and the salt factor a
    skew-mitigating repartition would need (ceil of the same ratio —
    the fan-out that levels this key to average). Top-10 hottest keys
    with full tiebreak. The totals ride a broadcast 1-row aggregate
    (whitelisted pattern); everything else is one hash agg on the key
    being diagnosed — exactly the work the subsequent join would do
    anyway, so the diagnosis is never more expensive than the cure."""
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey")
    counts = li.groupBy("l_suppkey").agg(F.count("*").alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("t"),
        F.count("*").alias("nk"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "l_suppkey",
            F.col("cnt").cast("long").alias("cnt"),
            F.expr("cnt * nk * 1000000 DIV t").cast("long").alias("skew_ppm"),
            F.expr("(cnt * nk + t - 1) DIV t").cast("long").alias("suggested_salt"),
        )
        .orderBy(F.col("cnt").desc(), "l_suppkey")
        .limit(10)
    )


_SKEW_REPORT_ORACLE = """
    WITH counts AS (
      SELECT l_suppkey, count(*) AS cnt FROM lineitem GROUP BY 1
    ), totals AS (
      SELECT sum(cnt) AS t, count(*) AS nk FROM counts
    )
    SELECT l_suppkey,
           CAST(cnt AS BIGINT) AS cnt,
           CAST((cnt * nk * 1000000) // t AS BIGINT) AS skew_ppm,
           CAST((cnt * nk + t - 1) // t AS BIGINT) AS suggested_salt
    FROM counts, totals
    ORDER BY cnt DESC, l_suppkey
    LIMIT 10
"""


def agg_autocorrelation_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-lag autocorrelation sufficient statistics for daily
    revenue, lags 1..7: for each lag the exact integer Pearson atoms
    (n, Sx, Sy, Sxy, Sxx, Syy) over day pairs (d, d+lag) where BOTH
    days are observed — corr = (n*Sxy - Sx*Sy) /
    sqrt((n*Sxx - Sx^2)(n*Syy - Sy^2)) is derivable downstream; the
    sqrt stays OUT of the query because it is the one step that is not
    bit-reproducible cross-engine. Revenue enters as exact cents summed
    then floor-divided to whole dollars: at sf0.1 the largest atom
    (Sxy) measures 5.9e17, ~15x inside int64; the whole-dollar scale is
    safe to ~sf0.3, beyond which the divisor is raised (same plan,
    coarser unit — the resolution/headroom dial every fixed-point
    sufficient-statistic design carries). The lag dimension is generated
    in-row (explode of sequence 1..7, no join against a lag table) and
    the pair match rides a single date-shift equi key — at 100 TB this
    is one agg to days, a 7x map-side explode, and one equi join."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    daily = orders.groupBy(
        F.to_date(F.date_trunc("day", "o_orderdate")).alias("day")
    ).agg(
        F.expr(
            "sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) DIV 100"
        ).alias("x")
    )
    lagged = daily.select(
        "day",
        "x",
        F.explode(F.sequence(F.lit(1), F.lit(7))).alias("lag"),
    ).withColumn("match_day", F.date_add(F.col("day"), F.col("lag")))
    right = daily.select(F.col("day").alias("match_day"), F.col("x").alias("y"))
    pairs = lagged.join(right, "match_day")
    return (
        pairs.groupBy("lag")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.sum("x").cast("long").alias("sum_x"),
            F.sum("y").cast("long").alias("sum_y"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sum_xy"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sum_xx"),
            F.sum(F.col("y") * F.col("y")).cast("long").alias("sum_yy"),
        )
        .select(
            F.col("lag").cast("int").alias("lag"),
            "n_pairs",
            "sum_x",
            "sum_y",
            "sum_xy",
            "sum_xx",
            "sum_yy",
        )
        .orderBy("lag")
    )


_AUTOCORRELATION_ORACLE = """
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) // 100 AS x
      FROM orders GROUP BY 1
    ), lags AS (
      SELECT CAST(range AS INTEGER) AS lag FROM range(1, 8)
    ), pairs AS (
      SELECT l.lag, a.x, b.x AS y
      FROM daily a
      CROSS JOIN lags l
      JOIN daily b ON b.day = a.day + l.lag
    )
    SELECT lag,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(x) AS BIGINT) AS sum_x,
           CAST(sum(y) AS BIGINT) AS sum_y,
           CAST(sum(x * y) AS BIGINT) AS sum_xy,
           CAST(sum(x * x) AS BIGINT) AS sum_xx,
           CAST(sum(y * y) AS BIGINT) AS sum_yy
    FROM pairs
    GROUP BY lag
    ORDER BY lag
"""


def events_trending_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst detection: which item buckets (props.k DIV 10) are
    over-represented on the final observed day vs their trailing
    7-day base rate — lift = (last-day count) / (trailing count / 7),
    cross-multiplied into integer ppm so no float ratio exists. The
    anchor day is max(observed day), carried as a broadcast 1-row
    aggregate (whitelisted pattern); buckets must appear in BOTH
    windows (a burst with no base rate is a cold start, a different
    query). Top-20 by lift with (c1, bucket) tiebreak. At 100 TB:
    two filtered hash aggs on the bucket key and a tiny join —
    the events scan is shared and the date filter prunes partitions."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            F.to_date("ts").alias("day"),
            F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        )
        .where(F.col("k").isNotNull())
        .select("day", F.expr("k DIV 10").cast("long").alias("bucket"))
    )
    anchor = ev.agg(F.max("day").alias("max_day"))
    e = ev.crossJoin(F.broadcast(anchor))
    last = (
        e.where(F.col("day") == F.col("max_day"))
        .groupBy("bucket")
        .agg(F.count("*").alias("c1"))
    )
    trail = (
        e.where(
            (F.col("day") < F.col("max_day"))
            & (F.col("day") >= F.date_sub(F.col("max_day"), 7))
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("c7"))
    )
    return (
        last.join(trail, "bucket")
        .select(
            "bucket",
            F.col("c1").cast("long").alias("c1"),
            F.col("c7").cast("long").alias("c7"),
            F.expr("c1 * 7 * 1000000 DIV c7").cast("long").alias("lift_ppm"),
        )
        .orderBy(F.col("lift_ppm").desc(), F.col("c1").desc(), "bucket")
        .limit(20)
    )


_TRENDING_ORACLE = """
    WITH ev AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS bucket
      FROM events
      WHERE json_extract_string(props, '$.k') IS NOT NULL
    ), anchor AS (
      SELECT max(day) AS max_day FROM ev
    ), last AS (
      SELECT bucket, count(*) AS c1
      FROM ev, anchor WHERE day = max_day GROUP BY 1
    ), trail AS (
      SELECT bucket, count(*) AS c7
      FROM ev, anchor
      WHERE day < max_day AND day >= max_day - 7
      GROUP BY 1
    )
    SELECT l.bucket,
           CAST(l.c1 AS BIGINT) AS c1,
           CAST(t.c7 AS BIGINT) AS c7,
           CAST((l.c1 * 7 * 1000000) // t.c7 AS BIGINT) AS lift_ppm
    FROM last l JOIN trail t USING (bucket)
    ORDER BY lift_ppm DESC, c1 DESC, bucket
    LIMIT 20
"""


PENDING: tuple[PendingQuery, ...] = (
    PendingQuery(
        "privacy_k_anonymity",
        privacy_k_anonymity_query,
        _K_ANONYMITY_ORACLE,
        tags=("privacy", "k-anonymity", "risk-report", "integer-exact"),
    ),
    PendingQuery(
        "graph_link_prediction",
        graph_link_prediction_query,
        _LINK_PREDICTION_ORACLE,
        tags=("graph", "link-prediction", "jaccard", "bipartite-projection"),
    ),
    PendingQuery(
        "ops_skew_report",
        ops_skew_report_query,
        _SKEW_REPORT_ORACLE,
        tags=("ops", "skew", "diagnostics", "integer-exact"),
    ),
    PendingQuery(
        "agg_autocorrelation",
        agg_autocorrelation_query,
        _AUTOCORRELATION_ORACLE,
        tags=("agg", "timeseries", "acf", "sufficient-statistics"),
    ),
    PendingQuery(
        "events_trending",
        events_trending_query,
        _TRENDING_ORACLE,
        tags=("events", "trending", "burst-detection", "integer-exact"),
    ),
)
