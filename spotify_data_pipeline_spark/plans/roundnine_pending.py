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


def events_attribution_position_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped, 40/20/40) multi-touch attribution —
    the complement of the last-touch rollup already declared
    (roundsix ``events_attribution``): each purchase's revenue splits
    40% to the first touch, 40% to the last, 20% shared across the
    middles, over the user's non-purchase events in the preceding 30
    minutes; 1-touch gets all, 2-touch splits 50/50, no-touch is
    'direct'. Money never leaves integer cents: the per-purchase split
    uses ``largest_remainder_allocation_per_group``
    (operators/allocation.py) with integer weights (n<=2 -> 1 each;
    else first/last 40*(n-2), middles 20 — totals 100*(n-2), exactly
    the 40/40/20 shares), so every purchase's credits SUM EXACTLY to
    its cents and the oracle can replicate the whole division. The
    candidate join rides the user_id equi key (theta only as a
    post-filter); windows partition on purchase id. At 100 TB:
    per-user time-locality bounds the fan-out (30-min window), and no
    window is unpartitioned."""
    from spotify_data_pipeline_spark.operators.allocation import (
        largest_remainder_allocation_per_group,
    )

    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    t = ev.where(F.col("event_type") != "purchase").select(
        F.col("event_id").alias("t_id"),
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("channel"),
    )
    cand = p.join(
        t,
        (F.col("p_user") == F.col("t_user"))
        & (F.col("t_ts") < F.col("p_ts"))
        & (F.col("t_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES")),
    ).select("p_id", "cents", "t_id", "t_ts", "channel")
    wp = Window.partitionBy("p_id")
    wo = Window.partitionBy("p_id").orderBy("t_ts", "t_id")
    weighted = (
        cand.withColumn("n", F.count("*").over(wp))
        .withColumn("pos", F.row_number().over(wo))
        .withColumn(
            "w",
            F.when(F.col("n") <= 2, F.lit(1))
            .when(
                (F.col("pos") == 1) | (F.col("pos") == F.col("n")),
                40 * (F.col("n") - 2),
            )
            .otherwise(F.lit(20))
            .cast("long"),
        )
    )
    credited = largest_remainder_allocation_per_group(
        weighted, "p_id", "t_id", "w", "cents", out_col="credit"
    ).select("channel", "credit")
    direct = p.join(
        cand.select("p_id").distinct(), "p_id", "left_anti"
    ).select(F.lit("direct").alias("channel"), F.col("cents").alias("credit"))
    return (
        credited.unionByName(direct)
        .groupBy("channel")
        .agg(
            F.count("*").cast("long").alias("n_credits"),
            (F.sum("credit") / 100.0).alias("attributed_revenue"),
        )
        .orderBy("channel")
    )


_ATTRIBUTION_POSITION_ORACLE = """
    WITH p AS (
      SELECT event_id AS p_id, user_id, ts AS p_ts,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ), t AS (
      SELECT event_id AS t_id, user_id, ts AS t_ts,
             event_type AS channel
      FROM events WHERE event_type <> 'purchase'
    ), cand AS (
      SELECT p.p_id, p.cents, t.t_id, t.t_ts, t.channel
      FROM p JOIN t ON p.user_id = t.user_id
       AND t.t_ts < p.p_ts
       AND t.t_ts >= p.p_ts - INTERVAL 30 MINUTE
    ), weighted AS (
      SELECT *,
             CASE WHEN n <= 2 THEN 1
                  WHEN pos = 1 OR pos = n THEN 40 * (n - 2)
                  ELSE 20 END AS w
      FROM (
        SELECT *,
               count(*) OVER (PARTITION BY p_id) AS n,
               row_number() OVER (PARTITION BY p_id ORDER BY t_ts, t_id) AS pos
        FROM cand
      )
    ), alloc AS (
      SELECT p_id, channel,
             base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS credit
      FROM (
        SELECT *,
               row_number() OVER (PARTITION BY p_id
                                  ORDER BY rem DESC, t_id ASC) AS rk,
               cents - sum(base) OVER (PARTITION BY p_id) AS leftover
        FROM (
          SELECT *,
                 (cents * w) // sum(w) OVER (PARTITION BY p_id) AS base,
                 (cents * w) %  sum(w) OVER (PARTITION BY p_id) AS rem
          FROM weighted
        )
      )
    ), direct AS (
      SELECT 'direct' AS channel, cents AS credit
      FROM p WHERE NOT EXISTS (SELECT 1 FROM cand c WHERE c.p_id = p.p_id)
    ), credits AS (
      SELECT channel, credit FROM alloc
      UNION ALL SELECT channel, credit FROM direct
    )
    SELECT channel,
           CAST(count(*) AS BIGINT) AS n_credits,
           sum(credit) / 100.0 AS attributed_revenue
    FROM credits
    GROUP BY 1 ORDER BY 1
"""


def text_zipf_fit_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit check for the corpus vocabulary — the companion
    to the staged Heaps-law query (roundeight): for the top-100 terms,
    rank x frequency should be roughly constant (= C, the top term's
    frequency); the report carries the exact integer product and each
    term's ppm deviation |rank*freq - C| / C. Distributed top-k: the
    global top-100 comes from orderBy+limit (TakeOrdered — no
    unpartitioned window ever sees the full vocabulary), and ranks are
    assigned by a window over the 100 surviving rows only. Term counts
    are one explode + hash agg over the shared tokenizer
    (functions/text.py::tokens — same normalization as every text
    query, so the oracle's string_split twin matches byte-for-byte)."""
    from spotify_data_pipeline_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("freq"))
    )
    top = counts.orderBy(F.col("freq").desc(), "term").limit(100)
    w = Window.partitionBy().orderBy(F.col("freq").desc(), "term")
    ranked = top.withColumn("rank", F.row_number().over(w)).withColumn(
        "c_top", F.max("freq").over(Window.partitionBy())
    )
    return ranked.select(
        F.col("rank").cast("long").alias("rank"),
        "term",
        F.col("freq").cast("long").alias("freq"),
        F.expr("rank * freq").cast("long").alias("zipf_product"),
        F.expr("abs(rank * freq - c_top) * 1000000 DIV c_top")
        .cast("long")
        .alias("dev_ppm"),
    ).orderBy("rank")


_ZIPF_ORACLE = """
    WITH toks AS (
      SELECT unnest(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS term
      FROM documents
      WHERE length(trim(regexp_replace(text, '\\s+', ' ', 'g'))) > 0
    ), counts AS (
      SELECT term, count(*) AS freq FROM toks GROUP BY term
    ), top AS (
      SELECT term, freq FROM counts ORDER BY freq DESC, term LIMIT 100
    ), ranked AS (
      SELECT term, freq,
             row_number() OVER (ORDER BY freq DESC, term) AS rank,
             max(freq) OVER () AS c_top
      FROM top
    )
    SELECT CAST(rank AS BIGINT) AS rank, term,
           CAST(freq AS BIGINT) AS freq,
           CAST(rank * freq AS BIGINT) AS zipf_product,
           CAST((abs(rank * freq - c_top) * 1000000) // c_top AS BIGINT)
             AS dev_ppm
    FROM ranked
    ORDER BY rank
"""


def fn_datetime_suite_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime-function breadth row (the calendar sibling of the
    fn_date/fn_string suites): datediff vs an epoch anchor, add_months
    (end-of-month clamping), last_day, quarter, day-of-year,
    ISO week, Monday week-truncation, and make_date reconstruction —
    each pinned cross-engine. Engine quirk handled in the ORACLE, not
    the query: Spark's dayofweek is 1=Sunday..7=Saturday while
    DuckDB's is 0=Sunday..6=Saturday, so the oracle adds 1 — the
    kind of off-by-one a multi-engine shop must pin in tests exactly
    like this. Map-only; one scan of orders."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    d = F.to_date("o_orderdate")
    return orders.select(
        "o_orderkey",
        d.alias("order_day"),
        F.datediff(d, F.lit("1995-01-01")).cast("long").alias("days_since_95"),
        F.add_months(d, 3).alias("plus_3m"),
        F.last_day(d).alias("month_end"),
        F.quarter(d).cast("int").alias("qtr"),
        F.dayofweek(d).cast("int").alias("dow_sun1"),
        F.dayofyear(d).cast("int").alias("doy"),
        F.weekofyear(d).cast("int").alias("iso_week"),
        F.to_date(F.date_trunc("week", d)).alias("week_start"),
        F.make_date(F.year(d), F.month(d), F.lit(1)).alias("month_start"),
    ).orderBy("o_orderkey")


_DATETIME_SUITE_ORACLE = """
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS order_day,
           CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
                AS BIGINT) AS days_since_95,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus_3m,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
           CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow_sun1,
           CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
           CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
           CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start,
           make_date(CAST(year(o_orderdate) AS INTEGER),
                     CAST(month(o_orderdate) AS INTEGER), 1) AS month_start
    FROM orders
    ORDER BY o_orderkey
"""


def sim_pq_codes_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization code assignment (operators/pq.py — Jégou
    et al. 2011) over the embeddings table: every 64-dim vector
    compresses to 8 code ids (2 bits each against the frozen 4-entry
    per-subspace codebook) plus its exact integer reconstruction
    error. Map-only — slice + zip_with/aggregate HOFs, argmin over a
    K-entry literal array, no shuffle, no Python. The oracle
    replicates the ENTIRE assignment (quantization, all 32 code
    distances, min-id tie argmin, error sum) from the same literal
    codebook via generated SQL — the approximation itself is what the
    driver hash-checks, the sim_ann_ivf_fixed precedent."""
    from spotify_data_pipeline_spark.operators.parallelism import (
        ensure_min_parallelism,
    )
    from spotify_data_pipeline_spark.operators.pq import pq_assign

    # the fixture ships one row group -> one task; the interpreted HOF
    # expression tree is compute-dense, so buy full parallelism first
    emb = ensure_min_parallelism(load_table(spark, sf_dir, "embeddings"))
    assigned = pq_assign(emb, "embedding")
    return assigned.select(
        "vec_id",
        F.concat_ws(
            "-", F.transform(F.col("pq_codes"), lambda x: x.cast("string"))
        ).alias("pq_code"),
        F.col("pq_err").alias("recon_err"),
    ).orderBy("vec_id")


def _pq_codes_oracle() -> str:
    from spotify_data_pipeline_spark.operators.pq import default_codebook

    cb = default_codebook()
    sub_dim = len(cb[0][0])
    q = [
        f"CAST(floor(embedding[{i + 1}] * 127 + 0.5) AS BIGINT) AS q{i}"
        for i in range(len(cb) * sub_dim)
    ]
    dists = []
    for s, sub_codes in enumerate(cb):
        for k, code in enumerate(sub_codes):
            terms = " + ".join(
                f"(q{s * sub_dim + i} - ({c})) * (q{s * sub_dim + i} - ({c}))"
                for i, c in enumerate(code)
            )
            dists.append(f"({terms}) AS d{s}_{k}")
    mins = [
        f"least({', '.join(f'd{s}_{k}' for k in range(len(cb[s])))}) AS m{s}"
        for s in range(len(cb))
    ]
    codes = []
    for s in range(len(cb)):
        cases = " ".join(
            f"WHEN d{s}_{k} = m{s} THEN {k}" for k in range(len(cb[s]))
        )
        codes.append(f"CASE {cases} END AS c{s}")
    code_str = ", ".join(f"CAST(c{s} AS VARCHAR)" for s in range(len(cb)))
    err = " + ".join(f"m{s}" for s in range(len(cb)))
    return f"""
    WITH quant AS (
      SELECT vec_id, {', '.join(q)} FROM embeddings
    ), dist AS (
      SELECT vec_id, {', '.join(dists)} FROM quant
    ), m AS (
      SELECT *, {', '.join(mins)} FROM dist
    ), coded AS (
      SELECT vec_id, {', '.join(codes)}, {err} AS recon_err FROM m
    )
    SELECT vec_id, concat_ws('-', {code_str}) AS pq_code,
           CAST(recon_err AS BIGINT) AS recon_err
    FROM coded ORDER BY vec_id
    """


# the fixed probe for the ADC serving-path query: the first axis unit
# vector (quantizes to [127, 0, 0, ...] under the shared rule)
_PQ_PROBE = [1.0] + [0.0] * 63


def sim_pq_adc_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance (ADC) top-10 for a fixed literal probe:
    candidates are scored purely from their stored codes via S table
    lookups — the raw vector column is never touched after encoding,
    which is the serving-side point of PQ (the lookup table is S x K
    integers broadcast as plan literals). The oracle recomputes each
    row's ADC distance from the SAME Python-generated table constants,
    so the whole lookup pipeline (encode -> table -> sum -> top-k with
    (dist, id) tiebreak) is driver-proven exact."""
    from spotify_data_pipeline_spark.operators.parallelism import (
        ensure_min_parallelism,
    )
    from spotify_data_pipeline_spark.operators.pq import pq_adc_topk, pq_assign

    emb = ensure_min_parallelism(load_table(spark, sf_dir, "embeddings"))
    coded = pq_assign(emb, "embedding")
    top = pq_adc_topk(coded, _PQ_PROBE, k=10)
    return top.select(
        "vec_id",
        F.concat_ws(
            "-", F.transform(F.col("pq_codes"), lambda x: x.cast("string"))
        ).alias("pq_code"),
        F.col("adc_dist").cast("long").alias("adc_dist"),
    )


def _pq_adc_oracle() -> str:
    import math

    from spotify_data_pipeline_spark.operators.pq import (
        adc_tables_py,
        default_codebook,
    )

    cb = default_codebook()
    sub_dim = len(cb[0][0])
    query_q = [math.floor(x * 127 + 0.5) for x in _PQ_PROBE]
    tables = adc_tables_py(query_q, cb)
    q = [
        f"CAST(floor(embedding[{i + 1}] * 127 + 0.5) AS BIGINT) AS q{i}"
        for i in range(len(cb) * sub_dim)
    ]
    dists = []
    for s, sub_codes in enumerate(cb):
        for k, code in enumerate(sub_codes):
            terms = " + ".join(
                f"(q{s * sub_dim + i} - ({c})) * (q{s * sub_dim + i} - ({c}))"
                for i, c in enumerate(code)
            )
            dists.append(f"({terms}) AS d{s}_{k}")
    mins = [
        f"least({', '.join(f'd{s}_{k}' for k in range(len(cb[s])))}) AS m{s}"
        for s in range(len(cb))
    ]
    codes = []
    adc_terms = []
    for s in range(len(cb)):
        cases = " ".join(
            f"WHEN d{s}_{k} = m{s} THEN {k}" for k in range(len(cb[s]))
        )
        codes.append(f"CASE {cases} END AS c{s}")
        lut = " ".join(
            f"WHEN c{s} = {k} THEN {tables[s][k]}" for k in range(len(cb[s]))
        )
        adc_terms.append(f"(CASE {lut} END)")
    code_str = ", ".join(f"CAST(c{s} AS VARCHAR)" for s in range(len(cb)))
    return f"""
    WITH quant AS (
      SELECT vec_id, {', '.join(q)} FROM embeddings
    ), dist AS (
      SELECT vec_id, {', '.join(dists)} FROM quant
    ), m AS (
      SELECT *, {', '.join(mins)} FROM dist
    ), coded AS (
      SELECT vec_id, {', '.join(codes)} FROM m
    )
    SELECT vec_id, concat_ws('-', {code_str}) AS pq_code,
           CAST({' + '.join(adc_terms)} AS BIGINT) AS adc_dist
    FROM coded
    ORDER BY adc_dist, vec_id
    LIMIT 10
    """


def ml_nb_segment_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Naive-Bayes classification as EXACT relational algebra — train
    on 90% of customers (custkey % 10 != 0), predict market segment
    for the held-out 10% from (nation, balance-band), emit the
    confusion matrix. Laplace-smoothed class scores are kept as exact
    RATIONALS a_c/b_c (a = cnt_c·(cnt_{f1,c}+1)·(cnt_{f2,c}+1), b =
    (cnt_c+V1)·(cnt_c+V2); the shared 1/N prior denominator cancels):
    the argmax is a pairwise tournament — class c beats c' iff
    a_c·b_{c'} > a_{c'}·b_c (ties to the lexicographically smaller
    class) — so no float, no log, and the oracle replicates every
    comparison. The single cross-multiply that exceeds int64
    (~7.8e20) runs in DECIMAL(37,0) / HUGEINT; everything else is
    int64. Plan shape: the 5-row class-prior table broadcasts into
    the test split (bounded-dim pattern, whitelisted), feature
    likelihoods join on (segment, feature) equi keys, and the 5x5
    tournament joins on custkey — at 100 TB: per-row fan-out is a
    constant 25."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_mktsegment").alias("seg"),
        F.col("c_nationkey").alias("f1"),
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("f2"),
    )
    train = cust.where(F.col("c_custkey") % 10 != 0)
    test = cust.where(F.col("c_custkey") % 10 == 0)
    vocab = train.agg(
        F.countDistinct("f1").alias("v1"), F.countDistinct("f2").alias("v2")
    )
    cls = train.groupBy("seg").agg(F.count("*").alias("cnt_c")).crossJoin(
        F.broadcast(vocab)
    )
    f1c = train.groupBy("seg", "f1").agg(F.count("*").alias("cnt_f1"))
    f2c = train.groupBy("seg", "f2").agg(F.count("*").alias("cnt_f2"))
    scored = (
        test.crossJoin(F.broadcast(cls.select(F.col("seg").alias("cand"), "cnt_c", "v1", "v2")))
        .join(
            f1c.select(F.col("seg").alias("cand"), "f1", "cnt_f1"),
            ["cand", "f1"],
            "left",
        )
        .join(
            f2c.select(F.col("seg").alias("cand"), "f2", "cnt_f2"),
            ["cand", "f2"],
            "left",
        )
        .select(
            "c_custkey",
            F.col("seg").alias("actual"),
            "cand",
            F.expr(
                "cnt_c * (coalesce(cnt_f1, 0) + 1) * (coalesce(cnt_f2, 0) + 1)"
            ).cast("long").alias("a"),
            F.expr("(cnt_c + v1) * (cnt_c + v2)").cast("long").alias("b"),
        )
    )
    s1 = scored.select("c_custkey", "actual", F.col("cand").alias("c1"), F.col("a").alias("a1"), F.col("b").alias("b1"))
    s2 = scored.select("c_custkey", F.col("cand").alias("c2"), F.col("a").alias("a2"), F.col("b").alias("b2"))
    wins = (
        s1.join(s2, "c_custkey")
        .where(F.col("c1") != F.col("c2"))
        .withColumn(
            "win",
            (
                (F.expr("CAST(a1 AS DECIMAL(18,0)) * CAST(b2 AS DECIMAL(18,0))")
                 > F.expr("CAST(a2 AS DECIMAL(18,0)) * CAST(b1 AS DECIMAL(18,0))"))
                | (
                    (F.expr("CAST(a1 AS DECIMAL(18,0)) * CAST(b2 AS DECIMAL(18,0))")
                     == F.expr("CAST(a2 AS DECIMAL(18,0)) * CAST(b1 AS DECIMAL(18,0))"))
                    & (F.col("c1") < F.col("c2"))
                )
            ).cast("int"),
        )
        .groupBy("c_custkey", "actual", "c1")
        .agg(F.sum("win").alias("n_wins"))
    )
    pred = wins.where(F.col("n_wins") == 4).select(
        "c_custkey", "actual", F.col("c1").alias("predicted")
    )
    return (
        pred.groupBy("actual", "predicted")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy("actual", "predicted")
    )


_NB_SEGMENT_ORACLE = """
    WITH cust AS (
      SELECT c_custkey, c_mktsegment AS seg, c_nationkey AS f1,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS f2
      FROM customer
    ), train AS (
      SELECT * FROM cust WHERE c_custkey % 10 <> 0
    ), test AS (
      SELECT * FROM cust WHERE c_custkey % 10 = 0
    ), vocab AS (
      SELECT count(DISTINCT f1) AS v1, count(DISTINCT f2) AS v2 FROM train
    ), cls AS (
      SELECT seg AS cand, count(*) AS cnt_c FROM train GROUP BY 1
    ), f1c AS (
      SELECT seg AS cand, f1, count(*) AS cnt_f1 FROM train GROUP BY 1, 2
    ), f2c AS (
      SELECT seg AS cand, f2, count(*) AS cnt_f2 FROM train GROUP BY 1, 2
    ), scored AS (
      SELECT t.c_custkey, t.seg AS actual, c.cand,
             c.cnt_c * (coalesce(f1c.cnt_f1, 0) + 1)
                     * (coalesce(f2c.cnt_f2, 0) + 1) AS a,
             (c.cnt_c + v.v1) * (c.cnt_c + v.v2) AS b
      FROM test t
      CROSS JOIN cls c
      CROSS JOIN vocab v
      LEFT JOIN f1c ON f1c.cand = c.cand AND f1c.f1 = t.f1
      LEFT JOIN f2c ON f2c.cand = c.cand AND f2c.f2 = t.f2
    ), wins AS (
      SELECT s1.c_custkey, s1.actual, s1.cand AS c1,
             sum(CASE WHEN CAST(s1.a AS HUGEINT) * s2.b
                           > CAST(s2.a AS HUGEINT) * s1.b
                       OR (CAST(s1.a AS HUGEINT) * s2.b
                           = CAST(s2.a AS HUGEINT) * s1.b
                           AND s1.cand < s2.cand)
                      THEN 1 ELSE 0 END) AS n_wins
      FROM scored s1
      JOIN scored s2 ON s1.c_custkey = s2.c_custkey AND s1.cand <> s2.cand
      GROUP BY 1, 2, 3
    )
    SELECT actual, c1 AS predicted, CAST(count(*) AS BIGINT) AS n
    FROM wins WHERE n_wins = 4
    GROUP BY 1, 2
    ORDER BY 1, 2
"""


def etl_rowset_digest_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive per-group rowset digest — auditable
    aggregation: each group's digest is the SUM of a 60-bit integer
    derived from each row's md5 (first 15 hex chars), so one changed,
    added, or dropped row OCCURRENCE flips the group digest (a BAG
    digest — multiplicity-sensitive by summation, which matters here:
    (orderkey, linenumber) is not unique in this testdata) while the
    sum stays map-side partial-aggregatable — the property string-concat
    digests lack (string_agg of a 100 TB group is a single giant
    string; an integer sum is a normal combiner). Sums run in
    DECIMAL(38,0) / HUGEINT (1e12 rows x 2^60 ~ 1e30, 8 orders of
    headroom) and compare as digit STRINGS (the agg_decimal_exact
    precedent). Spark parses hex with conv(); DuckDB lacks conv, so
    the oracle unrolls the 15-digit positional fold — both exact."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_returnflag",
            F.expr(
                "CAST(conv(substring(md5(concat_ws('|', l_orderkey, l_linenumber)), 1, 15), 16, 10) AS DECIMAL(38,0))"
            ).alias("rh"),
        )
        .groupBy("l_returnflag")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("rh").cast("decimal(38,0)").cast("string").alias("digest"),
        )
        .orderBy("l_returnflag")
    )


def _rowset_digest_oracle() -> str:
    fold = " + ".join(
        f"(strpos('0123456789abcdef', substr(h, {j + 1}, 1)) - 1) * {16 ** (14 - j)}"
        for j in range(15)
    )
    return f"""
    WITH hashed AS (
      SELECT l_returnflag,
             md5(concat_ws('|', l_orderkey, l_linenumber)) AS h
      FROM lineitem
    ), ints AS (
      SELECT l_returnflag, CAST({fold} AS HUGEINT) AS rh FROM hashed
    )
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(rh) AS VARCHAR) AS digest
    FROM ints
    GROUP BY 1 ORDER BY 1
    """


_RRF_TERMS = ("dup", "spark", "merge", "vector")  # the proven BM25 mixed-df set
_RRF_PROBE = [0.1] * 64  # constant direction; per-vector max-abs scaling handles it


def sim_rrf_fusion_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval by Reciprocal Rank Fusion (Cormack et al.
    SIGIR'09) — the standard way production search combines a lexical
    ranker with a vector ranker without score calibration: top-50 BM25
    (operators/retrieval.py, rational-idf exact scores) fused with
    top-50 int8-quantized cosine (operators/quantization.py) for a
    fixed probe, RRF = sum of floor(1e9/(60+rank)) over the lists a
    doc appears in (the float 1/(k+r) made an exact integer via DIV —
    order statistics only, no score mixing). documents and embeddings
    share the id space in this testdata (vec_id = doc_id); docs
    without an embedding simply never appear in the vector list, which
    RRF handles by construction. Both branches reuse ALREADY-PROVEN
    oracle arithmetic (text_bm25_topk, sim_quantized_topk); the fusion
    adds a full-outer join of two 50-row lists — driver-provable end
    to end. At 100 TB each branch is its own proven plan; fusion cost
    is nil."""
    from spotify_data_pipeline_spark.operators.quantization import (
        cosine_topk_quantized,
    )
    from spotify_data_pipeline_spark.operators.retrieval import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    lex = bm25_topk(docs, _RRF_TERMS, k=50)
    wl = Window.partitionBy().orderBy(F.col("score_scaled").desc(), "doc_id")
    lexr = (
        lex.select("doc_id", "score_scaled")
        .withColumn("rank_lex", F.row_number().over(wl))
        .select("doc_id", "rank_lex")
    )
    probe = spark.range(1).select(
        F.lit(-1).cast("long").alias("vec_id"),
        F.array(*[F.lit(x) for x in _RRF_PROBE]).alias("embedding"),
    )
    vec = cosine_topk_quantized(probe, emb, k=50)
    vecr = vec.select(
        F.col("neighbor_id").alias("doc_id"), F.col("rn").alias("rank_vec")
    )
    fused = lexr.join(vecr, "doc_id", "full_outer")
    rrf = F.expr(
        "coalesce(1000000000 DIV (60 + rank_lex), 0)"
        " + coalesce(1000000000 DIV (60 + rank_vec), 0)"
    )
    return (
        fused.select(
            "doc_id",
            F.col("rank_lex").cast("long").alias("rank_lex"),
            F.col("rank_vec").cast("long").alias("rank_vec"),
            rrf.cast("long").alias("rrf_score"),
        )
        .orderBy(F.col("rrf_score").desc(), "doc_id")
        .limit(10)
    )


def _rrf_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in _RRF_TERMS)
    probe = "[" + ", ".join(str(x) for x in _RRF_PROBE) + "]"
    qcos = (
        "(list_dot_product(a.q, b.q)"
        " / (sqrt(list_dot_product(a.q, a.q)) * sqrt(list_dot_product(b.q, b.q))))"
    )
    return f"""
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
      FROM post WHERE term IN ({terms}) GROUP BY 1, 2
    ), dft AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
    ), c AS (
      SELECT tf.doc_id,
             -- parenthesization mirrors the Spark tree EXACTLY (see
             -- the proven text_bm25_topk oracle)
             CAST(floor(((2 * n - 2 * df + 1) / (2 * df + 1))
                        * ((22 * tf)
                           / (10 * tf + 3 + 9 * ((dl * n) / CAST(tt AS DOUBLE))))
                        * 1000000) AS BIGINT) AS cs
      FROM tf JOIN dft USING (term) JOIN dl USING (doc_id), tot
    ), lexs AS (
      SELECT doc_id, sum(cs) AS ss FROM c GROUP BY 1
    ), lex AS (
      SELECT doc_id, rn AS rank_lex FROM (
        SELECT doc_id, row_number() OVER (ORDER BY ss DESC, doc_id) AS rn
        FROM lexs
      ) WHERE rn <= 50
    ), z AS (
      SELECT vec_id, embedding,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS m
      FROM embeddings
    ), qz AS (
      SELECT vec_id,
             CASE WHEN m = 0
                  THEN list_transform(embedding, x -> CAST(0 AS DOUBLE))
                  ELSE list_transform(embedding, x -> CAST(least(greatest(
                         floor(CAST(x AS DOUBLE) * 127 / m + 0.5),
                         -127.0), 127.0) AS DOUBLE))
             END AS q
      FROM z
    ), pz AS (
      SELECT CASE WHEN m = 0
                  THEN list_transform(pe, x -> CAST(0 AS DOUBLE))
                  ELSE list_transform(pe, x -> CAST(least(greatest(
                         floor(CAST(x AS DOUBLE) * 127 / m + 0.5),
                         -127.0), 127.0) AS DOUBLE))
             END AS q
      FROM (SELECT {probe} AS pe,
                   list_max(list_transform({probe}, x -> abs(CAST(x AS DOUBLE)))) AS m)
    ), scored AS (
      SELECT b.vec_id, floor({qcos} * 10000 + 0.5) / 10000 AS qcos
      FROM pz a, qz b
    ), vec AS (
      SELECT vec_id AS doc_id, rn AS rank_vec FROM (
        SELECT vec_id, row_number() OVER (ORDER BY qcos DESC, vec_id) AS rn
        FROM scored
      ) WHERE rn <= 50
    ), f AS (
      SELECT coalesce(l.doc_id, v.doc_id) AS doc_id, l.rank_lex, v.rank_vec
      FROM lex l FULL JOIN vec v ON l.doc_id = v.doc_id
    )
    SELECT doc_id,
           CAST(rank_lex AS BIGINT) AS rank_lex,
           CAST(rank_vec AS BIGINT) AS rank_vec,
           CAST(coalesce(1000000000 // (60 + rank_lex), 0)
                + coalesce(1000000000 // (60 + rank_vec), 0) AS BIGINT)
             AS rrf_score
    FROM f
    ORDER BY rrf_score DESC, doc_id
    LIMIT 10
    """


def llm_quantile_normalize_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source quantile normalization of a per-doc score (here
    n_chars) — the calibration step before mixing sources whose raw
    score distributions differ (a long doc from a verbose source
    should not outrank a long doc from a terse one): each doc maps to
    the POOLED value at its within-source quantile. All arithmetic is
    integer ppm; the quantile lookup is an as-of match of the source
    CDF against the pooled CDF, executed as a map-side scan of a
    broadcast sorted (cdf, value) array (the pooled DISTINCT-VALUE
    frame is domain-bounded — thousands of entries — so the 1-row
    collected array broadcasts; whitelisted pattern). No window ever
    spans the full doc table unpartitioned: per-source windows shuffle
    on source; the only unpartitioned window runs over the distinct
    VALUES. The oracle states the same lookup as the naive theta join
    + max — the binned-vs-IEJoin precedent of events_window_count."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    ws = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    wsn = Window.partitionBy("source")
    src = (
        docs.withColumn("r", F.row_number().over(ws))
        .withColumn("n_s", F.count("*").over(wsn))
        .withColumn("target_ppm", F.expr("r * 1000000 DIV n_s"))
    )
    vals = docs.groupBy("n_chars").agg(F.count("*").alias("c"))
    wv = Window.partitionBy().orderBy("n_chars").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    cdf = (
        vals.withColumn("cum", F.sum("c").over(wv))
        .withColumn("tot", F.sum("c").over(wall))
        .select(
            F.col("n_chars").alias("v"),
            F.expr("cum * 1000000 DIV tot").cast("long").alias("cdf_ppm"),
        )
    )
    arr = cdf.agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("cdf_ppm").alias("cdf"), F.col("v")))
        ).alias("lut")
    )
    joined = src.crossJoin(F.broadcast(arr))
    pref = F.filter(F.col("lut"), lambda e: e["cdf"] <= F.col("target_ppm"))
    norm = F.when(F.size(pref) > 0, F.element_at(pref, -1)["v"]).otherwise(
        F.element_at(F.col("lut"), 1)["v"]
    )
    return joined.select(
        "doc_id",
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
        norm.cast("long").alias("norm_chars"),
        F.col("target_ppm").cast("long").alias("target_ppm"),
    ).orderBy("doc_id")


_QUANTILE_NORMALIZE_ORACLE = """
    WITH d AS (
      SELECT doc_id, source, n_chars FROM documents
    ), s AS (
      SELECT doc_id, source, n_chars,
             row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS r,
             count(*) OVER (PARTITION BY source) AS n_s
      FROM d
    ), tgt AS (
      SELECT doc_id, source, n_chars, (r * 1000000) // n_s AS target_ppm FROM s
    ), vals AS (
      SELECT n_chars AS v, count(*) AS c FROM d GROUP BY 1
    ), cdf AS (
      SELECT v,
             (sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) * 1000000)
               // (SELECT count(*) FROM d) AS cdf_ppm
      FROM vals
    ), m AS (
      SELECT t.doc_id, max(cd.v) AS mv
      FROM tgt t JOIN cdf cd ON cd.cdf_ppm <= t.target_ppm
      GROUP BY 1
    )
    SELECT t.doc_id, t.source,
           CAST(t.n_chars AS BIGINT) AS n_chars,
           CAST(coalesce(m.mv, (SELECT min(v) FROM cdf)) AS BIGINT) AS norm_chars,
           CAST(t.target_ppm AS BIGINT) AS target_ppm
    FROM tgt t LEFT JOIN m ON t.doc_id = m.doc_id
    ORDER BY t.doc_id
"""


def events_active_time_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-of-intervals per user — the classic overlapping-interval
    merge (each event opens a 5-minute activity window; total active
    time = measure of the UNION, so overlapping windows never
    double-count): a new island starts where an event's open exceeds
    the running max of all previous closes (one lag-max window),
    islands number by a running sum of those flags (second window,
    same partition+order — ONE shuffle total), and per-island length
    is max(close)-min(open). All arithmetic in exact epoch
    MICROSECONDS (unix_micros / epoch_us — the µs timestamps make
    second-rounding a final single floor-DIV, never per-interval).
    Output per user: island count + floor-seconds active. At 100 TB
    this is the one-shuffle gaps-and-islands shape — no interval
    self-join ever."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr("unix_micros(ts)").alias("o"), "event_id"
    )
    span = 300_000_000  # 5 min in µs
    w = Window.partitionBy("user_id").orderBy("o", "event_id")
    prev_max_close = F.max(F.col("o") + span).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = ev.withColumn(
        "new_island",
        (F.col("o") > F.coalesce(prev_max_close, F.lit(-1))).cast("long"),
    ).withColumn(
        "island",
        F.sum("new_island").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    islands = flagged.groupBy("user_id", "island").agg(
        (F.max(F.col("o") + span) - F.min("o")).alias("len_us")
    )
    return (
        islands.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_islands"),
            F.expr("sum(len_us) DIV 1000000").cast("long").alias("active_seconds"),
        )
        .orderBy("user_id")
    )


_ACTIVE_TIME_ORACLE = """
    WITH ev AS (
      SELECT user_id, epoch_us(ts) AS o, event_id FROM events
    ), flagged AS (
      SELECT user_id, o, event_id,
             CASE WHEN o > coalesce(max(o + 300000000) OVER (
                    PARTITION BY user_id ORDER BY o, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                  THEN 1 ELSE 0 END AS new_island
      FROM ev
    ), numbered AS (
      SELECT user_id, o,
             -- the event_id tiebreak must match the Spark window: with
             -- o-only ordering, equal-timestamp rows could fold the
             -- island flag in a different order across engines
             sum(new_island) OVER (
               PARTITION BY user_id ORDER BY o, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM flagged
    ), islands AS (
      SELECT user_id, island,
             max(o + 300000000) - min(o) AS len_us
      FROM numbered GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(sum(len_us) // 1000000 AS BIGINT) AS active_seconds
    FROM islands
    GROUP BY 1 ORDER BY 1
"""


def fn_hof_suite_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order-function breadth row (the HOF sibling of
    fn_array_suite): transform / aggregate (fold) / filter / exists /
    forall / slice / sort over the shared token arrays, each pinned
    against its DuckDB list_* twin (exists/forall re-expressed as
    list_filter cardinalities — DuckDB spells quantifiers
    differently). Booleans are surfaced as BIGINT 0/1: cross-engine
    boolean columns canonicalize differently in the driver compare,
    integers never do. Map-only, one scan."""
    from spotify_data_pipeline_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    t = docs.select("doc_id", toks.alias("toks"))
    return t.select(
        "doc_id",
        F.aggregate(
            F.transform(F.col("toks"), lambda x: F.length(x)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
        F.size(F.filter(F.col("toks"), lambda x: F.length(x) > 5))
        .cast("long")
        .alias("n_long_tokens"),
        F.exists(F.col("toks"), lambda x: x == F.lit("spark"))
        .cast("long")
        .alias("has_spark"),
        F.forall(F.col("toks"), lambda x: F.length(x) < 20)
        .cast("long")
        .alias("all_short"),
        F.concat_ws("_", F.slice(F.col("toks"), 1, 3)).alias("first3"),
        F.element_at(F.array_sort(F.col("toks")), 1).alias("first_sorted"),
    ).orderBy("doc_id")


_HOF_SUITE_ORACLE = """
    WITH t AS (
      SELECT doc_id,
             CASE WHEN length(trim(regexp_replace(text, '\\s+', ' ', 'g'))) > 0
                  THEN string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')
                  ELSE CAST([] AS VARCHAR[]) END AS toks
      FROM documents
    )
    SELECT doc_id,
           CAST(coalesce(list_sum(list_transform(toks, x -> length(x))), 0)
                AS BIGINT) AS total_chars,
           CAST(len(list_filter(toks, x -> length(x) > 5)) AS BIGINT)
             AS n_long_tokens,
           CAST(CASE WHEN len(list_filter(toks, x -> x = 'spark')) > 0
                     THEN 1 ELSE 0 END AS BIGINT) AS has_spark,
           CAST(CASE WHEN len(list_filter(toks, x -> NOT (length(x) < 20))) = 0
                     THEN 1 ELSE 0 END AS BIGINT) AS all_short,
           array_to_string(toks[1:3], '_') AS first3,
           list_sort(toks)[1] AS first_sorted
    FROM t
    ORDER BY doc_id
"""


def orders_fifo_match_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO supply-demand matching — the warehouse/inventory lot
    matching problem (and the accounting cost-basis one), solved the
    set-based way: per part, returns (l_returnflag='R') are the supply
    stream and the rest the demand stream, each ordered by ship date;
    running sums turn every row into an INTERVAL on the cumulative-
    quantity axis ([cum-qty, cum+qty)), and FIFO matching IS interval
    intersection: matched(s,d) = min(hi_s,hi_d) - max(lo_s,lo_d) when
    positive. No procedural queue walk, no recursion — one window pass
    per stream and one part-keyed equi join with a range filter
    (per-part line counts are domain-bounded, ~50 here, so fan-out is
    tiny). Quantities are integral in this data -> everything exact
    int64. The running-sum ORDER carries a full tiebreak (date, order,
    line, qty, supp) — identical-to-the-last-column rows may still
    swap across engines, but then their intervals are interchangeable
    and the emitted ROW SET is unchanged (the keys carried are the
    tied columns themselves). Top-20 matches by quantity."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        "l_suppkey",
        "l_returnflag",
        "l_shipdate",
        F.col("l_quantity").cast("long").alias("qty"),
    )
    w = Window.partitionBy("l_partkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber", "qty", "l_suppkey"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sup = (
        li.where(F.col("l_returnflag") == "R")
        .withColumn("s_hi", F.sum("qty").over(w))
        .select(
            "l_partkey",
            F.col("l_orderkey").alias("s_order"),
            F.col("l_linenumber").alias("s_line"),
            (F.col("s_hi") - F.col("qty")).alias("s_lo"),
            "s_hi",
        )
    )
    dem = (
        li.where(F.col("l_returnflag") != "R")
        .withColumn("d_hi", F.sum("qty").over(w))
        .select(
            "l_partkey",
            F.col("l_orderkey").alias("d_order"),
            F.col("l_linenumber").alias("d_line"),
            (F.col("d_hi") - F.col("qty")).alias("d_lo"),
            "d_hi",
        )
    )
    pairs = sup.join(dem, "l_partkey").where(
        (F.col("s_lo") < F.col("d_hi")) & (F.col("d_lo") < F.col("s_hi"))
    )
    matched = F.least("s_hi", "d_hi") - F.greatest("s_lo", "d_lo")
    return (
        pairs.select(
            "l_partkey",
            "s_order",
            "s_line",
            "d_order",
            "d_line",
            matched.cast("long").alias("matched_qty"),
        )
        .orderBy(
            F.col("matched_qty").desc(),
            "l_partkey",
            "s_order",
            "s_line",
            "d_order",
            "d_line",
        )
        .limit(20)
    )


_FIFO_MATCH_ORACLE = """
    WITH li AS (
      SELECT l_partkey, l_orderkey, l_linenumber, l_suppkey,
             l_returnflag, l_shipdate,
             CAST(l_quantity AS BIGINT) AS qty
      FROM lineitem
    ), sup AS (
      SELECT l_partkey, l_orderkey AS s_order, l_linenumber AS s_line,
             s_hi - qty AS s_lo, s_hi
      FROM (
        SELECT *, sum(qty) OVER (
                 PARTITION BY l_partkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber, qty, l_suppkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_hi
        FROM li WHERE l_returnflag = 'R'
      )
    ), dem AS (
      SELECT l_partkey, l_orderkey AS d_order, l_linenumber AS d_line,
             d_hi - qty AS d_lo, d_hi
      FROM (
        SELECT *, sum(qty) OVER (
                 PARTITION BY l_partkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber, qty, l_suppkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS d_hi
        FROM li WHERE l_returnflag <> 'R'
      )
    )
    SELECT s.l_partkey, s.s_order, s.s_line, d.d_order, d.d_line,
           CAST(least(s.s_hi, d.d_hi) - greatest(s.s_lo, d.d_lo) AS BIGINT)
             AS matched_qty
    FROM sup s JOIN dem d
      ON s.l_partkey = d.l_partkey
     AND s.s_lo < d.d_hi AND d.d_lo < s.s_hi
    ORDER BY matched_qty DESC, s.l_partkey, s_order, s_line, d_order, d_line
    LIMIT 20
"""


def graph_weighted_sssp_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted single-source shortest paths (Bellman-Ford, 3
    synchronized min-plus rounds) on the bipartite supplier<->customer
    purchase graph — the weighted axis the BFS hop operator
    (operators/hops.py) deliberately leaves out: edge weight = the
    MINIMUM order->ship latency in days ever observed between the
    pair clamped at 0 (this synthetic data ships some lines before
    the order date), sources = the suppkey%7=0 suppliers at distance 0 (a modulo
    rule is non-empty at every SF; a nation filter is not at the
    smallest). Round 1 reaches
    customers, round 2 folds back to suppliers (keeping the source
    min), round 3 reaches customers again via a cheaper intermediate
    if one exists — each round is one equi join + min agg (the
    min-plus matrix-vector product), the dataflow Bellman-Ford every
    scalable graph engine runs. Integer day weights -> exact; final
    dist = min(round1, round3). Top-20 nearest customers."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(
            F.col("l_suppkey").alias("s"), F.col("o_custkey").alias("c")
        )
        .agg(
            F.greatest(
                F.min(F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))),
                F.lit(0),
            )
            .cast("long")
            .alias("w")
        )
    )
    src = supp.where(F.col("s_suppkey") % 7 == 0).select(
        F.col("s_suppkey").alias("s")
    )
    d1 = (
        edges.join(src, "s")
        .groupBy("c")
        .agg(F.min("w").alias("d"))
    )
    s2 = (
        d1.join(edges, "c")
        .groupBy("s")
        .agg(F.min(F.col("d") + F.col("w")).alias("d"))
    )
    # sources stay at 0 — a round-trip through a customer never helps
    s2m = (
        s2.join(src.withColumn("_z", F.lit(0)), "s", "left")
        .select("s", F.least(F.col("d"), F.col("_z")).alias("d"))
    )
    d3 = (
        s2m.join(edges, "s")
        .groupBy("c")
        .agg(F.min(F.col("d") + F.col("w")).alias("d"))
    )
    final = (
        d1.select("c", "d")
        .unionByName(d3.select("c", "d"))
        .groupBy("c")
        .agg(F.min("d").alias("dist_days"))
    )
    return (
        final.select(F.col("c").alias("c_custkey"), F.col("dist_days").cast("long").alias("dist_days"))
        .orderBy("dist_days", "c_custkey")
        .limit(20)
    )


_WEIGHTED_SSSP_ORACLE = """
    WITH edges AS (
      SELECT l_suppkey AS s, o_custkey AS c,
             CAST(greatest(min(datediff('day', o_orderdate, l_shipdate)), 0) AS BIGINT) AS w
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY 1, 2
    ), src AS (
      SELECT s_suppkey AS s FROM supplier WHERE s_suppkey % 7 = 0
    ), d1 AS (
      SELECT c, min(w) AS d FROM edges JOIN src USING (s) GROUP BY 1
    ), s2 AS (
      SELECT e.s, min(d1.d + e.w) AS d
      FROM d1 JOIN edges e ON e.c = d1.c GROUP BY 1
    ), s2m AS (
      SELECT s2.s,
             CASE WHEN s2.s IN (SELECT s FROM src)
                  THEN least(s2.d, 0) ELSE s2.d END AS d
      FROM s2
    ), d3 AS (
      SELECT e.c, min(s2m.d + e.w) AS d
      FROM s2m JOIN edges e ON e.s = s2m.s GROUP BY 1
    ), merged AS (
      SELECT c, d FROM d1 UNION ALL SELECT c, d FROM d3
    )
    SELECT c AS c_custkey, CAST(min(d) AS BIGINT) AS dist_days
    FROM merged
    GROUP BY c
    ORDER BY dist_days, c_custkey
    LIMIT 20
"""


def events_peak_concurrency_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency by sweep line — the capacity-planning question
    (max simultaneous activity windows): each event opens a 5-minute
    window; emit +1 at each open and -1 at each close, sort the
    boundary stream, and the running sum IS the concurrency curve —
    its per-day maximum is the answer. Both boundaries of a window
    live in its OPENING day, so every day is a complete sweep (no
    orphan closes from midnight-crossing windows; cross-midnight pairs
    are not counted as concurrent — the stated semantics). The close
    boundary sorts with a
    type key AFTER an equal-timestamp open (a window closing exactly
    when another opens counts as overlap at the boundary instant —
    half-open [o, c) semantics pinned by the tiebreak (t, typ DESC,
    event_id) where open=1 sorts before close=0 via DESC). One global
    shuffle on day + one windowed pass; the ±1 stream is 2 rows per
    event — the sweep line never materializes pairs. Exact epoch-µs.
    Per-day output keeps the curve partitioned at scale (the running
    sum windows on day — no unpartitioned window)."""
    ev = load_table(spark, sf_dir, "events").select(
        F.expr("unix_micros(ts)").alias("o"),
        F.to_date("ts").alias("day"),  # BOTH boundaries live in the
        # opening day: each day is a complete sweep (no orphan closes
        # from midnight-crossing windows), at the documented cost of
        # not counting cross-midnight pairs as concurrent
        "event_id",
    )
    span = 300_000_000
    opens = ev.select(
        "day", F.col("o").alias("t"), F.lit(1).alias("typ"),
        F.lit(1).alias("delta"), "event_id",
    )
    closes = ev.select(
        "day",
        (F.col("o") + span).alias("t"),
        F.lit(0).alias("typ"),
        F.lit(-1).alias("delta"),
        "event_id",
    )
    bounds = opens.unionByName(closes)
    w = Window.partitionBy("day").orderBy(
        "t", F.col("typ").desc(), "event_id", F.col("delta").desc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    curve = bounds.withColumn("conc", F.sum("delta").over(w))
    return (
        curve.groupBy("day")
        .agg(F.max("conc").cast("long").alias("peak_concurrency"))
        .orderBy("day")
    )


_PEAK_CONCURRENCY_ORACLE = """
    WITH ev AS (
      SELECT epoch_us(ts) AS o, CAST(ts AS DATE) AS day, event_id FROM events
    ), bounds AS (
      SELECT day, o AS t, 1 AS typ, 1 AS delta, event_id FROM ev
      UNION ALL
      SELECT day, o + 300000000 AS t, 0 AS typ, -1 AS delta, event_id FROM ev
    ), curve AS (
      SELECT day,
             sum(delta) OVER (
               PARTITION BY day
               ORDER BY t, typ DESC, event_id, delta DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
      FROM bounds
    )
    SELECT day, CAST(max(conc) AS BIGINT) AS peak_concurrency
    FROM curve
    GROUP BY day ORDER BY day
"""


def text_proximity_search_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proximity retrieval — the IR operator between exact phrase
    match (adjacent) and boolean AND (anywhere): documents where
    'spark' and 'merge' occur within 5 tokens of each other, plus the
    closest observed distance. MAP-ONLY: both terms' position lists
    come from one pass over the token array (filter over
    posexplode-free transform+filter HOFs), the pairwise min distance
    folds over the two SHORT position lists in-row (term frequency per
    doc is tiny; never a join, never a shuffle beyond the final
    order). The DuckDB twin states the same via list comprehensions.
    At 100 TB this is embarrassingly parallel — the plan has zero
    exchanges before the output sort."""
    from spotify_data_pipeline_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    idx = F.transform(toks, lambda x, i: F.struct(x.alias("tok"), i.alias("pos")))
    pos_of = lambda term: F.transform(  # noqa: E731
        F.filter(idx, lambda e: e["tok"] == F.lit(term)), lambda e: e["pos"]
    )
    t = docs.select(
        "doc_id",
        pos_of("spark").alias("pa"),
        pos_of("merge").alias("pb"),
    ).where((F.size("pa") > 0) & (F.size("pb") > 0))
    # min |i-j| over the two short lists, folded in-row
    mind = F.aggregate(
        F.flatten(
            F.transform(
                F.col("pa"),
                lambda i: F.transform(F.col("pb"), lambda j: F.abs(i - j)),
            )
        ),
        F.lit(1 << 30).cast("long"),
        lambda acc, d: F.least(acc, d.cast("long")),
    )
    return (
        t.withColumn("min_dist", mind)
        .where(F.col("min_dist") <= 5)
        .select("doc_id", F.col("min_dist").cast("long").alias("min_dist"))
        .orderBy("doc_id")
    )


_PROXIMITY_ORACLE = """
    WITH t AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
      FROM documents WHERE length(trim(text)) > 0
    ), pos AS (
      SELECT doc_id,
             [i for i in range(1, len(toks) + 1) IF toks[i] = 'spark'] AS pa,
             [i for i in range(1, len(toks) + 1) IF toks[i] = 'merge'] AS pb
      FROM t
    ), near AS (
      SELECT doc_id,
             list_min(flatten(list_transform(pa,
               i -> list_transform(pb, j -> abs(i - j))))) AS min_dist
      FROM pos
      WHERE len(pa) > 0 AND len(pb) > 0
    )
    SELECT doc_id, CAST(min_dist AS BIGINT) AS min_dist
    FROM near WHERE min_dist <= 5
    ORDER BY doc_id
"""


def events_interval_join_full_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream FULL OUTER interval join
    (streaming/events.py::purchase_window_join_full) — the union-of-
    two-flipped-left-outers composition, driver-proven against a naive
    FULL theta-join oracle: a single outer join over either binned
    side would emit one phantom null per unmatched advertised copy, so
    (a) purchases-keep-one-row vs events-advertise-{bin,bin+1} left
    join carries the inner pairs + exact purchase nulls, and (b) the
    mirror (events own bin, purchases advertise {bin-1,bin}) filtered
    to unmatched events carries exact event nulls. Both sides take a
    deterministic key filter (purchase id%4=3, event id%3=1 — both
    engines) purely to bound the driver-compared output."""
    from spotify_data_pipeline_spark.operators.rangejoin import _floordiv_sql

    win_us = 5 * 60 * 1_000_000
    ev_all = load_table(spark, sf_dir, "events")
    pur = ev_all.where(
        (F.col("event_type") == "purchase") & (F.col("event_id") % 4 == 3)
    ).select(F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts"))
    evt = ev_all.where(F.col("event_id") % 3 == 1).select("event_id", "ts")

    ev_adv = evt.withColumn(
        "_bin",
        F.explode(
            F.array(
                F.expr(_floordiv_sql("unix_micros(ts)", win_us)),
                F.expr(_floordiv_sql("unix_micros(ts)", win_us) + " + 1"),
            )
        ),
    )
    pur_own = pur.withColumn(
        "_bin", F.expr(_floordiv_sql("unix_micros(p_ts)", win_us))
    )
    cond = F.expr(
        "ev._bin = p._bin AND ts > p_ts - interval 5 minutes"
        " AND ts <= p_ts AND event_id != purchase_id"
    )
    left = (
        pur_own.alias("p")
        .join(ev_adv.alias("ev"), cond, "left_outer")
        .select("purchase_id", "p_ts", "event_id", F.col("ts").alias("ev_ts"))
    )
    ev_own = evt.withColumn(
        "_bin", F.expr(_floordiv_sql("unix_micros(ts)", win_us))
    )
    pur_adv = pur.withColumn(
        "_bin",
        F.explode(
            F.array(
                F.expr(_floordiv_sql("unix_micros(p_ts)", win_us) + " - 1"),
                F.expr(_floordiv_sql("unix_micros(p_ts)", win_us)),
            )
        ),
    )
    right_nulls = (
        ev_own.alias("ev")
        .join(pur_adv.alias("p"), cond, "left_outer")
        .where(F.col("purchase_id").isNull())
        .select("purchase_id", "p_ts", "event_id", F.col("ts").alias("ev_ts"))
    )
    return left.unionByName(right_nulls)


_INTERVAL_FULL_ORACLE = """
    SELECT p.event_id AS purchase_id, p.ts AS p_ts,
           e.event_id AS event_id, e.ts AS ev_ts
    FROM (SELECT * FROM events
          WHERE event_type = 'purchase' AND event_id % 4 = 3) p
    FULL JOIN (SELECT * FROM events WHERE event_id % 3 = 1) e
      ON e.ts > p.ts - INTERVAL 5 MINUTE AND e.ts <= p.ts
     AND e.event_id <> p.event_id
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
    PendingQuery(
        "events_attribution_position",
        events_attribution_position_query,
        _ATTRIBUTION_POSITION_ORACLE,
        tags=("events", "attribution", "multi-touch", "allocation", "integer-exact"),
    ),
    PendingQuery(
        "text_zipf_fit",
        text_zipf_fit_query,
        _ZIPF_ORACLE,
        tags=("text", "zipf", "vocabulary", "integer-exact"),
    ),
    PendingQuery(
        "fn_datetime_suite",
        fn_datetime_suite_query,
        _DATETIME_SUITE_ORACLE,
        tags=("functions", "datetime", "calendar", "parity"),
    ),
    PendingQuery(
        "sim_pq_codes",
        sim_pq_codes_query,
        _pq_codes_oracle(),
        tags=("similarity", "product-quantization", "ann", "integer-exact"),
    ),
    PendingQuery(
        "sim_pq_adc_topk",
        sim_pq_adc_topk_query,
        _pq_adc_oracle(),
        tags=("similarity", "product-quantization", "adc", "serving"),
    ),
    PendingQuery(
        "ml_nb_segment",
        ml_nb_segment_query,
        _NB_SEGMENT_ORACLE,
        tags=("ml", "naive-bayes", "classification", "integer-exact"),
    ),
    PendingQuery(
        "etl_rowset_digest",
        etl_rowset_digest_query,
        _rowset_digest_oracle(),
        tags=("etl", "digest", "audit", "mergeable"),
    ),
    PendingQuery(
        "sim_rrf_fusion",
        sim_rrf_fusion_query,
        _rrf_oracle(),
        tags=("similarity", "hybrid-search", "rrf", "retrieval"),
    ),
    PendingQuery(
        "llm_quantile_normalize",
        llm_quantile_normalize_query,
        _QUANTILE_NORMALIZE_ORACLE,
        tags=("llmops", "normalization", "quantile", "calibration"),
    ),
    PendingQuery(
        "events_active_time",
        events_active_time_query,
        _ACTIVE_TIME_ORACLE,
        tags=("events", "intervals", "gaps-and-islands", "integer-exact"),
    ),
    PendingQuery(
        "fn_hof_suite",
        fn_hof_suite_query,
        _HOF_SUITE_ORACLE,
        tags=("functions", "higher-order", "arrays", "parity"),
    ),
    PendingQuery(
        "orders_fifo_match",
        orders_fifo_match_query,
        _FIFO_MATCH_ORACLE,
        tags=("orders", "fifo", "interval-intersection", "integer-exact"),
    ),
    PendingQuery(
        "graph_weighted_sssp",
        graph_weighted_sssp_query,
        _WEIGHTED_SSSP_ORACLE,
        tags=("graph", "bellman-ford", "shortest-path", "integer-exact"),
    ),
    PendingQuery(
        "events_peak_concurrency",
        events_peak_concurrency_query,
        _PEAK_CONCURRENCY_ORACLE,
        tags=("events", "sweep-line", "concurrency", "capacity"),
    ),
    PendingQuery(
        "text_proximity_search",
        text_proximity_search_query,
        _PROXIMITY_ORACLE,
        tags=("text", "proximity", "retrieval", "map-only"),
    ),
    PendingQuery(
        "events_interval_join_full",
        events_interval_join_full_query,
        _INTERVAL_FULL_ORACLE,
        tags=("events", "interval-join", "full-outer", "streaming-twin"),
    ),
)
