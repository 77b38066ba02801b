"""Round-15 declared-query staging area — product-analytics, curation
and privacy families that round out SURVEY.md §2.12's long tail:
cohort retention, ordered funnels, RFM segmentation, Pareto
concentration, benchmark contamination (13-gram, GPT-3 appendix-C
style), URL canonicalization dedup, Katz centrality, Theil–Sen robust
trend, Markov transitions, t-closeness (ordered-EMD), and a
duplicate-invoice DQ screen.

Per-wave staging module (the ADVICE r06 rule instantiated by
roundfourteen_pending): nothing evidenced imports this file, so its
entries stay editable until the wave activates.

Cross-engine exactness rules carried from earlier waves: money in
integer cents (parity.rnd_cents), ratios in integer parts-per-million
via ``DIV`` / ``//`` over NON-NEGATIVE numerators (where a quantity
can be negative — Theil–Sen slopes — a large positive offset is added
before the floor division and subtracted after, because Spark's DIV
truncates while DuckDB's // floors and the two differ only below
zero), every ORDER BY carries a deterministic tiebreak, all counters
CAST to BIGINT on both sides.
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


# ---------------------------------------------------------------------
# 1. weekly cohort retention
# ---------------------------------------------------------------------


def events_retention_cohorts_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly signup-cohort retention — THE product-analytics table: a
    user's cohort is the ISO week of their first event; for every
    (cohort, week offset) report active users and exact ppm retention
    vs the cohort's size. Both engines truncate to ISO Monday weeks
    (date_trunc('week')), so cohorts are identical cross-engine.

    Scale shape: one user-keyed agg for cohorts, one distinct over
    (user, week) for activity, one user-keyed join, then a
    |weeks|²-bounded agg. Nothing corpus-wide is windowed.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date(F.date_trunc("week", F.col("ts"))).alias("week")
    )
    cohorts = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    active = ev.distinct()
    joined = active.join(cohorts, "user_id").select(
        "cohort_week",
        (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
        .cast("long")
        .alias("week_offset"),
        "user_id",
    )
    sizes = cohorts.groupBy("cohort_week").agg(
        F.count_distinct("user_id").alias("cohort_size")
    )
    ret = (
        joined.groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_active"))
        .join(sizes, "cohort_week")
    )
    return ret.select(
        F.col("cohort_week").cast("string").alias("cohort_week"),
        F.col("week_offset").cast("long").alias("week_offset"),
        F.col("n_active").cast("long").alias("n_active"),
        F.col("cohort_size").cast("long").alias("cohort_size"),
        F.expr("(n_active * 1000000) DIV cohort_size").cast("long").alias(
            "retained_ppm"
        ),
    ).orderBy("cohort_week", "week_offset")


_RETENTION_ORACLE = """
  WITH ev AS (
    SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS week FROM events
  ), cohorts AS (
    SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY 1
  ), active AS (SELECT DISTINCT user_id, week FROM ev),
  sizes AS (
    SELECT cohort_week, CAST(count(DISTINCT user_id) AS BIGINT) AS cohort_size
    FROM cohorts GROUP BY 1
  ), ret AS (
    SELECT c.cohort_week,
           CAST(date_diff('day', c.cohort_week, a.week) / 7 AS BIGINT) AS week_offset,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active
    FROM active a JOIN cohorts c ON a.user_id = c.user_id
    GROUP BY 1, 2
  )
  SELECT CAST(r.cohort_week AS VARCHAR) AS cohort_week, r.week_offset, r.n_active,
         s.cohort_size,
         CAST((r.n_active * 1000000) // s.cohort_size AS BIGINT) AS retained_ppm
  FROM ret r JOIN sizes s ON r.cohort_week = s.cohort_week
  ORDER BY 1, 2
"""


# ---------------------------------------------------------------------
# 2. ordered funnel conversion
# ---------------------------------------------------------------------


def events_funnel_conversion_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-step funnel view → click → purchase: a user converts
    step 2 only with a click STRICTLY AFTER their first view, step 3
    only with a purchase strictly after that click — the
    order-sensitive definition (unordered set-membership overstates
    conversion). Steps resolve as chained per-user windows: t1 = min
    view ts; t2 = min click ts > t1; t3 = min purchase ts > t2.

    Output: one row per step with users reaching it, exact ppm vs the
    user base and vs the previous step.

    Scale shape: three window passes over the SAME user partitioning
    (one exchange, Spark reuses the hash partitioning), then a
    per-user distinct and a 3-row agg.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = Window.partitionBy("user_id")
    ev = ev.withColumn(
        "t1", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    )
    ev = ev.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") > F.col("t1")),
                F.col("ts"),
            )
        ).over(w),
    )
    ev = ev.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")),
                F.col("ts"),
            )
        ).over(w),
    )
    users = ev.select("user_id", "t1", "t2", "t3").distinct()
    totals = users.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.count("t1").cast("long").alias("s1"),
        F.count("t2").cast("long").alias("s2"),
        F.count("t3").cast("long").alias("s3"),
    )
    steps = totals.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(1).cast("long").alias("step"),
                    F.lit("view").alias("step_name"),
                    F.col("s1").alias("n_reached"),
                    F.col("n_users").alias("prev"),
                    F.col("n_users"),
                ),
                F.struct(
                    F.lit(2).cast("long").alias("step"),
                    F.lit("click_after_view").alias("step_name"),
                    F.col("s2").alias("n_reached"),
                    F.col("s1").alias("prev"),
                    F.col("n_users"),
                ),
                F.struct(
                    F.lit(3).cast("long").alias("step"),
                    F.lit("purchase_after_click").alias("step_name"),
                    F.col("s3").alias("n_reached"),
                    F.col("s2").alias("prev"),
                    F.col("n_users"),
                ),
            )
        ).alias("s")
    ).select("s.*")
    return steps.select(
        "step",
        "step_name",
        F.col("n_reached").cast("long").alias("n_reached"),
        F.expr("(n_reached * 1000000) DIV n_users").cast("long").alias("of_users_ppm"),
        F.expr(
            "CASE WHEN prev > 0 THEN (n_reached * 1000000) DIV prev ELSE 0 END"
        )
        .cast("long")
        .alias("of_prev_step_ppm"),
    ).orderBy("step")


_FUNNEL_ORACLE = """
  WITH ev AS (
    SELECT user_id, event_type, ts,
           min(CASE WHEN event_type = 'view' THEN ts END)
             OVER (PARTITION BY user_id) AS t1
    FROM events
  ), ev2 AS (
    SELECT *, min(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
                OVER (PARTITION BY user_id) AS t2
    FROM ev
  ), ev3 AS (
    SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
                OVER (PARTITION BY user_id) AS t3
    FROM ev2
  ), users AS (SELECT DISTINCT user_id, t1, t2, t3 FROM ev3),
  totals AS (
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(count(t1) AS BIGINT) AS s1,
           CAST(count(t2) AS BIGINT) AS s2,
           CAST(count(t3) AS BIGINT) AS s3
    FROM users
  ), steps AS (
    SELECT 1 AS step, 'view' AS step_name, s1 AS n_reached, n_users AS prev, n_users FROM totals
    UNION ALL
    SELECT 2, 'click_after_view', s2, s1, n_users FROM totals
    UNION ALL
    SELECT 3, 'purchase_after_click', s3, s2, n_users FROM totals
  )
  SELECT CAST(step AS BIGINT) AS step, step_name,
         CAST(n_reached AS BIGINT) AS n_reached,
         CAST((n_reached * 1000000) // n_users AS BIGINT) AS of_users_ppm,
         CAST(CASE WHEN prev > 0 THEN (n_reached * 1000000) // prev ELSE 0 END AS BIGINT)
           AS of_prev_step_ppm
  FROM steps
  ORDER BY step
"""


# ---------------------------------------------------------------------
# 3. RFM segmentation
# ---------------------------------------------------------------------


def orders_rfm_segmentation_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quintile segmentation — the classic CRM cut: per customer,
    Recency (days since last order vs the corpus max date), Frequency
    (orders), Monetary (lifetime cents); each axis quintiled by the
    EXACT integer rule q = (5·(rank−1)) DIV n + 1 over row_number with
    the custkey tiebreak (ntile's remainder distribution differs
    across engines — the registry's documented trap). Output: one row
    per populated (r,f,m) cell with customer count and monetary sum.

    Scale shape: one order scan → customer agg → three global
    row_number windows. Honest 100 TB caveat: global ranking at that
    scale goes through the two-phase offset ranking in
    ``operators/batching.py`` (the events_ab_mannwhitney note); this
    declared form keeps the driver-provable single-window shape.
    """
    orders = load_table(spark, sf_dir, "orders")
    anchor = orders.agg(F.max("o_orderdate").alias("_anchor"))
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("_last"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.sum(rnd_cents(F.col("o_totalprice"))).cast("long").alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "o_custkey",
            F.datediff(F.col("_anchor"), F.col("_last")).cast("long").alias("recency_days"),
            "frequency",
            "monetary_cents",
        )
    )
    one = Window.partitionBy(F.lit(1))
    ranked = per_cust.select(
        "o_custkey",
        "monetary_cents",
        F.count(F.lit(1)).over(one).alias("_n"),
        F.row_number()
        .over(one.orderBy("recency_days", "o_custkey"))
        .alias("_r_rk"),
        F.row_number()
        .over(one.orderBy(F.desc("frequency"), "o_custkey"))
        .alias("_f_rk"),
        F.row_number()
        .over(one.orderBy(F.desc("monetary_cents"), "o_custkey"))
        .alias("_m_rk"),
    )
    scored = ranked.select(
        "o_custkey",
        "monetary_cents",
        F.expr("(5 * (_r_rk - 1)) DIV _n + 1").cast("long").alias("r_q"),
        F.expr("(5 * (_f_rk - 1)) DIV _n + 1").cast("long").alias("f_q"),
        F.expr("(5 * (_m_rk - 1)) DIV _n + 1").cast("long").alias("m_q"),
    )
    return (
        scored.groupBy("r_q", "f_q", "m_q")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("monetary_cents").cast("long").alias("monetary_cents_sum"),
        )
        .orderBy("r_q", "f_q", "m_q")
    )


_RFM_ORACLE = f"""
  WITH per_cust AS (
    SELECT o_custkey,
           max(o_orderdate) AS _last,
           CAST(count(*) AS BIGINT) AS frequency,
           CAST(sum({rnd_cents_sql('o_totalprice')}) AS BIGINT) AS monetary_cents
    FROM orders GROUP BY 1
  ), anchored AS (
    SELECT o_custkey,
           CAST(date_diff('day', _last, (SELECT max(o_orderdate) FROM orders)) AS BIGINT)
             AS recency_days,
           frequency, monetary_cents
    FROM per_cust
  ), ranked AS (
    SELECT *,
      count(*) OVER () AS n,
      row_number() OVER (ORDER BY recency_days, o_custkey) AS r_rk,
      row_number() OVER (ORDER BY frequency DESC, o_custkey) AS f_rk,
      row_number() OVER (ORDER BY monetary_cents DESC, o_custkey) AS m_rk
    FROM anchored
  ), scored AS (
    SELECT o_custkey, monetary_cents,
           CAST((5 * (r_rk - 1)) // n + 1 AS BIGINT) AS r_q,
           CAST((5 * (f_rk - 1)) // n + 1 AS BIGINT) AS f_q,
           CAST((5 * (m_rk - 1)) // n + 1 AS BIGINT) AS m_q
    FROM ranked
  )
  SELECT r_q, f_q, m_q,
         CAST(count(*) AS BIGINT) AS n_customers,
         CAST(sum(monetary_cents) AS BIGINT) AS monetary_cents_sum
  FROM scored GROUP BY 1, 2, 3
  ORDER BY 1, 2, 3
"""


# ---------------------------------------------------------------------
# 4. Pareto concentration curve
# ---------------------------------------------------------------------


def orders_pareto_8020_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration (Pareto) curve by customer decile: rank
    customers by lifetime revenue desc (custkey tiebreak), cut into 10
    exact-integer deciles ((10·(rank−1)) DIV n + 1), and report each
    decile's customer count, revenue, cumulative revenue, and exact
    cumulative ppm share — the '20% of customers drive 80%' table.

    Scale shape: customer agg → one global ranking window (two-phase
    swap documented for 100 TB, as in RFM) → 10-row aggregation with a
    10-row running sum.
    """
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(rnd_cents(F.col("o_totalprice"))).cast("long").alias("cents")
    )
    one = Window.partitionBy(F.lit(1))
    deciled = per_cust.select(
        "cents",
        F.count(F.lit(1)).over(one).alias("_n"),
        F.row_number().over(one.orderBy(F.desc("cents"), "o_custkey")).alias("_rk"),
    ).select(
        "cents",
        F.expr("(10 * (_rk - 1)) DIV _n + 1").cast("long").alias("decile"),
    )
    agg = deciled.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("cents").cast("long").alias("revenue_cents"),
    )
    w_cum = Window.partitionBy(F.lit(1)).orderBy("decile")
    w_tot = Window.partitionBy(F.lit(1))
    return (
        agg.withColumn("cum_revenue_cents", F.sum("revenue_cents").over(w_cum).cast("long"))
        .withColumn("_total", F.sum("revenue_cents").over(w_tot))
        .select(
            "decile",
            "n_customers",
            "revenue_cents",
            "cum_revenue_cents",
            F.expr("(cum_revenue_cents * 1000000) DIV _total")
            .cast("long")
            .alias("cum_share_ppm"),
        )
        .orderBy("decile")
    )


_PARETO_ORACLE = f"""
  WITH per_cust AS (
    SELECT o_custkey,
           CAST(sum({rnd_cents_sql('o_totalprice')}) AS BIGINT) AS cents
    FROM orders GROUP BY 1
  ), deciled AS (
    SELECT cents,
           CAST((10 * (row_number() OVER (ORDER BY cents DESC, o_custkey) - 1))
                // count(*) OVER () + 1 AS BIGINT) AS decile
    FROM per_cust
  ), agg AS (
    SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(cents) AS BIGINT) AS revenue_cents
    FROM deciled GROUP BY 1
  )
  SELECT decile, n_customers, revenue_cents,
         CAST(sum(revenue_cents) OVER (ORDER BY decile) AS BIGINT) AS cum_revenue_cents,
         CAST((sum(revenue_cents) OVER (ORDER BY decile) * 1000000)
              // sum(revenue_cents) OVER () AS BIGINT) AS cum_share_ppm
  FROM agg
  ORDER BY decile
"""

# ---------------------------------------------------------------------
# 5. benchmark contamination: 13-gram overlap
# ---------------------------------------------------------------------


def text_ngram13_contamination_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination screen at 13-gram granularity — the
    GPT-3 appendix-C / open-eval decontamination rule: a training doc
    is contaminated if it shares ANY 13-token shingle with the held-out
    set (here: docs with doc_id % 97 == 0 stand in as the benchmark;
    a real run would broadcast the benchmark's gram set). Per source:
    corpus docs, contaminated docs, exact ppm rate.

    Shingles are RAW 13-token strings (functions.text.shingles k=13;
    docs shorter than 13 tokens contribute their whole text as the
    single shingle — the oracle mirrors that branch), so the oracle
    joins on identical strings with zero hash caveat.

    Scale shape: both sides explode to distinct (doc, gram) rows; the
    membership test is a gram-keyed LEFT SEMI join — the benchmark side
    is tiny by construction, so Catalyst broadcasts it; nothing is ever
    all-pairs.
    """
    from spotify_data_pipeline_spark.functions.text import shingles, tokens

    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id",
        "source",
        F.explode(shingles(tokens(F.col("text")), 13)).alias("gram"),
    ).distinct()
    bench = grams.where(F.col("doc_id") % 97 == 0).select("gram").distinct()
    corpus = grams.where(F.col("doc_id") % 97 != 0)
    flagged = (
        corpus.join(bench, "gram", "left_semi")
        .select("doc_id", "source")
        .distinct()
    )
    base = (
        docs.where(F.col("doc_id") % 97 != 0)
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    hits = flagged.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_contaminated")
    )
    return (
        base.join(hits, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce(F.col("n_contaminated"), F.lit(0))
            .cast("long")
            .alias("n_contaminated"),
        )
        .withColumn(
            "contaminated_ppm",
            F.expr("(n_contaminated * 1000000) DIV n_docs").cast("long"),
        )
        .orderBy("source")
    )


_CONTAMINATION_ORACLE = r"""
  WITH toks AS (
    SELECT doc_id, source,
           string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t,
           length(trim(text)) > 0 AS nonblank
    FROM documents
  ), grams AS (
    SELECT DISTINCT doc_id, source, gram
    FROM (
      SELECT doc_id, source,
             unnest(CASE
               WHEN NOT nonblank THEN []::VARCHAR[]
               WHEN len(t) >= 13
                 THEN list_transform(range(1, len(t) - 11),
                                     i -> array_to_string(t[i : i + 12], ' '))
               ELSE [array_to_string(t, ' ')] END) AS gram
      FROM toks
    )
  ), bench AS (
    SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0
  ), flagged AS (
    SELECT DISTINCT g.doc_id, g.source
    FROM grams g JOIN bench b ON g.gram = b.gram
    WHERE g.doc_id % 97 <> 0
  ), base AS (
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs
    FROM documents WHERE doc_id % 97 <> 0 GROUP BY 1
  ), hits AS (
    SELECT source, CAST(count(*) AS BIGINT) AS n_contaminated FROM flagged GROUP BY 1
  )
  SELECT b.source, b.n_docs,
         CAST(coalesce(h.n_contaminated, 0) AS BIGINT) AS n_contaminated,
         CAST((coalesce(h.n_contaminated, 0) * 1000000) // b.n_docs AS BIGINT)
           AS contaminated_ppm
  FROM base b LEFT JOIN hits h ON b.source = h.source
  ORDER BY b.source
"""


# ---------------------------------------------------------------------
# 6. URL canonicalization dedup
# ---------------------------------------------------------------------


def text_url_canonical_dedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-frontier URL dedup by canonicalization — the standard
    pipeline rule that ?utm= tracking params, #fragments, host case,
    and trailing slashes do not make a new page. Three deterministic
    raw variants per doc (query-string, fragment, uppercase-host +
    trailing slash) all canonicalize to one URL; the report counts raw
    vs canonical per domain and the exact ppm collapse ratio.

    Canonicalization is the SAME regex chain on both engines: strip
    ?query / #fragment, lowercase scheme+host, drop ONE trailing slash
    on a non-root path.

    Scale shape: map-only synthesis + canonicalization; one
    domain-keyed agg over distincts; |domains| output rows.
    """
    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id").cast("string")
    host = F.concat(F.lower("source"), F.lit(".example.com"))
    raw = docs.select(
        "doc_id",
        F.explode(
            F.array(
                F.concat(F.lit("https://"), host, F.lit("/page/"), d, F.lit("?utm_source=mail&ref=7")),
                F.concat(F.lit("https://"), host, F.lit("/page/"), d, F.lit("#section-2")),
                F.concat(F.lit("https://"), F.upper(host), F.lit("/page/"), d, F.lit("/")),
            )
        ).alias("url"),
    )
    no_q = F.regexp_replace(F.col("url"), r"[?#].*$", "")
    lowered = F.concat(
        F.lower(F.regexp_extract(no_q, r"^(https?://[^/]+)", 1)),
        F.regexp_extract(no_q, r"^https?://[^/]+(.*)$", 1),
    )
    canon = F.regexp_replace(lowered, r"(.)/$", r"$1")
    urls = raw.select(
        "doc_id",
        F.col("url").alias("raw_url"),
        canon.alias("canonical_url"),
        F.regexp_extract(canon, r"^https?://([^/]+)", 1).alias("domain"),
    )
    return (
        urls.groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_raw"),
            F.count_distinct("raw_url").cast("long").alias("n_raw_distinct"),
            F.count_distinct("canonical_url").cast("long").alias("n_canonical"),
        )
        .withColumn(
            "collapse_ppm",
            F.expr("((n_raw_distinct - n_canonical) * 1000000) DIV n_raw_distinct")
            .cast("long"),
        )
        .orderBy("domain")
    )


_URL_CANON_ORACLE = r"""
  WITH raw AS (
    SELECT doc_id, unnest([
      'https://' || lower(source) || '.example.com/page/' || doc_id || '?utm_source=mail&ref=7',
      'https://' || lower(source) || '.example.com/page/' || doc_id || '#section-2',
      'https://' || upper(lower(source) || '.example.com') || '/page/' || doc_id || '/'
    ]) AS url
    FROM documents
  ), canon0 AS (
    SELECT doc_id, url AS raw_url,
           regexp_replace(url, '[?#].*$', '') AS no_q
    FROM raw
  ), canon1 AS (
    SELECT doc_id, raw_url,
           lower(regexp_extract(no_q, '^(https?://[^/]+)', 1))
             || regexp_extract(no_q, '^https?://[^/]+(.*)$', 1) AS lowered
    FROM canon0
  ), urls AS (
    SELECT doc_id, raw_url,
           regexp_replace(lowered, '(.)/$', '\1') AS canonical_url,
           regexp_extract(regexp_replace(lowered, '(.)/$', '\1'),
                          '^https?://([^/]+)', 1) AS domain
    FROM canon1
  )
  SELECT domain,
         CAST(count(*) AS BIGINT) AS n_raw,
         CAST(count(DISTINCT raw_url) AS BIGINT) AS n_raw_distinct,
         CAST(count(DISTINCT canonical_url) AS BIGINT) AS n_canonical,
         CAST(((count(DISTINCT raw_url) - count(DISTINCT canonical_url)) * 1000000)
              // count(DISTINCT raw_url) AS BIGINT) AS collapse_ppm
  FROM urls
  GROUP BY 1
  ORDER BY 1
"""

# ---------------------------------------------------------------------
# 7. Katz centrality (3 attenuated rounds, integer-exact)
# ---------------------------------------------------------------------


def graph_katz_centrality_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Katz centrality on the co-purchase graph — the influence member
    of the graph family (triangles count closure, HITS scores hubs;
    Katz counts attenuated walks, Katz '53): x = Σ_k α^k (A^k·1) with
    α = 1/8, three rounds unrolled, all in integers — v0 = 10⁶ per
    node, v_{k+1} = (Σ_neighbors v_k) DIV 8, score = v1+v2+v3 — so the
    oracle replicates every division exactly. Graph: parts co-occurring
    in a 1997-H1 order (the triangle probe's slice), capped in-array
    pair generation (operators/triangles.cooccurrence_edges).

    Output: top-20 parts by score (partkey tiebreak).

    Scale shape: 3 × (edge-keyed join + node agg) — the standard
    synchronous-round pattern (hops/SSSP precedent); per-round state is
    one long per node.
    """
    from spotify_data_pipeline_spark.operators.triangles import cooccurrence_edges

    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_partkey")
    )
    e = cooccurrence_edges(li, "l_orderkey", "l_partkey", 200)
    edges = e.select(F.col("src").alias("u"), F.col("dst").alias("v")).unionByName(
        e.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    )
    nodes = edges.select(F.col("u").alias("part")).distinct()
    v = nodes.withColumn("score", F.lit(1_000_000).cast("long"))
    rounds = []
    for _ in range(3):
        nbr_sum = (
            edges.join(v, edges["v"] == v["part"])
            .groupBy("u")
            .agg(F.sum("score").alias("_s"))
            .select(
                F.col("u").alias("part"),
                F.expr("_s DIV 8").cast("long").alias("score"),
            )
        )
        # nodes whose neighbors all dropped to 0 still exist with 0
        v = (
            nodes.join(nbr_sum, "part", "left")
            .select("part", F.coalesce(F.col("score"), F.lit(0)).cast("long").alias("score"))
        )
        rounds.append(v)
    total = rounds[0].select("part", F.col("score").alias("v1"))
    total = total.join(rounds[1].select("part", F.col("score").alias("v2")), "part")
    total = total.join(rounds[2].select("part", F.col("score").alias("v3")), "part")
    return (
        total.select(
            F.col("part").cast("long").alias("part"),
            (F.col("v1") + F.col("v2") + F.col("v3")).cast("long").alias("katz_scaled"),
            F.col("v1").cast("long").alias("walk1"),
            F.col("v2").cast("long").alias("walk2"),
            F.col("v3").cast("long").alias("walk3"),
        )
        .orderBy(F.desc("katz_scaled"), "part")
        .limit(20)
    )


_KATZ_ORACLE = """
  WITH li AS (
    SELECT l_orderkey, l_partkey FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1997-07-01'
  ), baskets AS (
    SELECT l_orderkey, count(DISTINCT l_partkey) AS n
    FROM li GROUP BY 1
  ), ok_orders AS (SELECT l_orderkey FROM baskets WHERE n <= 200),
  items AS (
    SELECT DISTINCT l.l_orderkey, l.l_partkey
    FROM li l JOIN ok_orders o ON l.l_orderkey = o.l_orderkey
  ), e0 AS (
    SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  ), edges AS (
    SELECT src AS u, dst AS v FROM e0
    UNION ALL
    SELECT dst AS u, src AS v FROM e0
  ), nodes AS (SELECT DISTINCT u AS part FROM edges),
  v1 AS (
    SELECT n.part,
           CAST(coalesce(s._s, 0) // 8 AS BIGINT) AS score
    FROM nodes n LEFT JOIN (
      SELECT u, sum(1000000) AS _s FROM edges GROUP BY 1
    ) s ON n.part = s.u
  ), v2 AS (
    SELECT n.part, CAST(coalesce(s._s, 0) // 8 AS BIGINT) AS score
    FROM nodes n LEFT JOIN (
      SELECT e.u, sum(v1.score) AS _s FROM edges e JOIN v1 ON e.v = v1.part GROUP BY 1
    ) s ON n.part = s.u
  ), v3 AS (
    SELECT n.part, CAST(coalesce(s._s, 0) // 8 AS BIGINT) AS score
    FROM nodes n LEFT JOIN (
      SELECT e.u, sum(v2.score) AS _s FROM edges e JOIN v2 ON e.v = v2.part GROUP BY 1
    ) s ON n.part = s.u
  )
  SELECT CAST(v1.part AS BIGINT) AS part,
         CAST(v1.score + v2.score + v3.score AS BIGINT) AS katz_scaled,
         v1.score AS walk1, v2.score AS walk2, v3.score AS walk3
  FROM v1 JOIN v2 ON v1.part = v2.part JOIN v3 ON v1.part = v3.part
  ORDER BY katz_scaled DESC, part
  LIMIT 20
"""


# ---------------------------------------------------------------------
# 8. Theil–Sen robust trend (monthly revenue)
# ---------------------------------------------------------------------


def orders_theil_sen_trend_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen estimator over monthly revenue — the robust
    (median-of-pairwise-slopes, breakdown 29%) alternative to the OLS
    trend `orders_trend_ols` already ships: slope for months i<j is
    (r_j−r_i)·10⁶ per month, floored EXACTLY on both engines via the
    offset device (num + K·den) DIV den − K with K = 10¹⁶ (Spark DIV
    truncates, DuckDB // floors; adding K·den makes every numerator
    positive where the two agree), then the LOWER MEDIAN by
    (slope_ppm, i, j) order — the discrete statistic both engines pick
    identically.

    Scale shape: month agg (≤ a few hundred rows at any SF) then the
    |months|² pair self-join — a DOCUMENTED bounded nested-loop (the
    agg_kmv_overlap sketch-vs-sketch precedent): 80 months → 3 160
    pairs; even a century of months is ~720k pairs. The corpus-sized
    scan happens once, in the month agg.
    """
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        ((F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate") - 1)
        .cast("long")
        .alias("m")
    ).agg(F.sum(rnd_cents(F.col("o_totalprice"))).cast("long").alias("r"))
    a = monthly.select(F.col("m").alias("mi"), F.col("r").alias("ri"))
    b = monthly.select(F.col("m").alias("mj"), F.col("r").alias("rj"))
    K = 10_000_000_000_000_000  # 1e16 — makes every numerator positive
    pairs = (
        a.join(b, F.col("mi") < F.col("mj"))
        .select(
            "mi",
            "mj",
            F.expr(
                f"(((rj - ri) * 1000000) + {K} * (mj - mi)) DIV (mj - mi) - {K}"
            )
            .cast("long")
            .alias("slope_ppm"),
        )
    )
    one = Window.partitionBy(F.lit(1))
    ranked = pairs.select(
        "slope_ppm",
        F.count(F.lit(1)).over(one).alias("_n"),
        F.row_number()
        .over(one.orderBy("slope_ppm", "mi", "mj"))
        .alias("_rk"),
    )
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.min("slope_ppm").cast("long").alias("min_slope_ppm"),
        F.max("slope_ppm").cast("long").alias("max_slope_ppm"),
        F.min(
            F.when(F.col("_rk") == F.expr("(_n + 1) DIV 2"), F.col("slope_ppm"))
        )
        .cast("long")
        .alias("median_slope_ppm"),
    )


_THEIL_SEN_ORACLE = f"""
  WITH monthly AS (
    SELECT CAST((year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS BIGINT) AS m,
           CAST(sum({rnd_cents_sql('o_totalprice')}) AS BIGINT) AS r
    FROM orders GROUP BY 1
  ), pairs AS (
    SELECT a.m AS mi, b.m AS mj,
           CAST((((b.r - a.r) * 1000000) + 10000000000000000 * (b.m - a.m))
                // (b.m - a.m) - 10000000000000000 AS BIGINT) AS slope_ppm
    FROM monthly a JOIN monthly b ON a.m < b.m
  ), ranked AS (
    SELECT slope_ppm,
           count(*) OVER () AS _n,
           row_number() OVER (ORDER BY slope_ppm, mi, mj) AS _rk
    FROM pairs
  )
  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(min(slope_ppm) AS BIGINT) AS min_slope_ppm,
         CAST(max(slope_ppm) AS BIGINT) AS max_slope_ppm,
         CAST(min(CASE WHEN _rk = (_n + 1) // 2 THEN slope_ppm END) AS BIGINT)
           AS median_slope_ppm
  FROM ranked
"""


# ---------------------------------------------------------------------
# 9. Markov transition matrix over event types
# ---------------------------------------------------------------------


def events_markov_transitions_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences — the behavioral-model input (and the generalization of
    events_session_paths' fixed 3-step paths): order each user's
    events by (ts, event_id), pair each with its successor via lead,
    count (from, to) transitions, and report each cell's exact ppm of
    its FROM-row total (a proper stochastic matrix row).

    Scale shape: one user-partitioned lead window → |types|² agg →
    row totals via a window over the |types|²-row frame.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.withColumn("to_type", F.lead("event_type").over(w))
        .where(F.col("to_type").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"), "to_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w_row = Window.partitionBy("from_type")
    return (
        trans.withColumn("_row_total", F.sum("n").over(w_row))
        .select(
            "from_type",
            "to_type",
            F.col("n").cast("long").alias("n"),
            F.expr("(n * 1000000) DIV _row_total").cast("long").alias("row_ppm"),
        )
        .orderBy("from_type", "to_type")
    )


_MARKOV_ORACLE = """
  WITH seq AS (
    SELECT event_type AS from_type,
           lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
    FROM events
  ), trans AS (
    SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
    FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2
  )
  SELECT from_type, to_type, n,
         CAST((n * 1000000) // sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS row_ppm
  FROM trans
  ORDER BY from_type, to_type
"""

# ---------------------------------------------------------------------
# 10. t-closeness (ordered EMD) privacy risk
# ---------------------------------------------------------------------


def privacy_t_closeness_emd_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness over the customer quasi-identifier (nation, market
    segment) with account-balance band (floor(bal/1000)) as the ORDERED
    sensitive attribute — the distribution-distance member of the
    privacy family (k-anonymity counts group sizes, l-diversity counts
    distinct values; t-closeness, Li et al. ICDE'07, bounds how much a
    group's sensitive distribution deviates from the table's): for an
    ordered attribute the Earth-Mover distance is the mean |cumulative
    difference| across bands. Everything is exact integer
    cross-multiplication: at band b, CUM_b = Σ_{b'≤b}(cnt_g·N −
    glob·n_g); emd_scaled = Σ_b |CUM_b|; emd_ppm = emd_scaled·10⁶ DIV
    ((k−1)·n_g·N).

    Output: top-20 riskiest groups (emd_ppm desc, nation/segment
    tiebreak).

    Scale shape: one QI×band agg off the scan; the dense group×band
    grid is |groups|·|bands| rows built by a DOCUMENTED bounded cross
    join (125 × ~11 here; QI grids are schema-bounded, never
    corpus-sized) — the kmv sketch-pair precedent; one ordered window
    per group for the cumulative, then a |groups|-row ranking.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("band"),
    )
    cells = cust.groupBy("nation", "segment", "band").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    groups = cells.groupBy("nation", "segment").agg(F.sum("cnt").alias("n_g"))
    bands = cust.select("band").distinct()
    glob = cust.groupBy("band").agg(F.count(F.lit(1)).cast("long").alias("g_cnt"))
    # corpus totals as a 1-row broadcast (the whitelisted scalar-
    # broadcast pattern) — nothing is collected to the driver
    consts = cust.agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.count_distinct("band").cast("long").alias("k_bands"),
    )
    grid = (
        groups.crossJoin(bands)
        .join(glob, "band")
        .join(cells, ["nation", "segment", "band"], "left")
        .crossJoin(F.broadcast(consts))
        .select(
            "nation",
            "segment",
            "band",
            "n_g",
            "g_cnt",
            "n_total",
            "k_bands",
            F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("cnt"),
        )
    )
    w = Window.partitionBy("nation", "segment").orderBy("band")
    cum = grid.withColumn(
        "_cum",
        F.sum(F.col("cnt") * F.col("n_total") - F.col("g_cnt") * F.col("n_g")).over(w),
    )
    per_group = cum.groupBy("nation", "segment", "n_g", "n_total", "k_bands").agg(
        F.sum(F.abs(F.col("_cum"))).cast("long").alias("emd_scaled")
    )
    return (
        per_group.select(
            F.col("nation").cast("long").alias("nation"),
            "segment",
            F.col("n_g").cast("long").alias("n_g"),
            "emd_scaled",
            F.expr("(emd_scaled * 1000000) DIV ((k_bands - 1) * n_g * n_total)")
            .cast("long")
            .alias("emd_ppm"),
        )
        .orderBy(F.desc("emd_ppm"), "nation", "segment")
        .limit(20)
    )


_T_CLOSENESS_ORACLE = """
  WITH cust AS (
    SELECT c_nationkey AS nation, c_mktsegment AS segment,
           CAST(floor(c_acctbal / 1000) AS BIGINT) AS band
    FROM customer
  ), cells AS (
    SELECT nation, segment, band, CAST(count(*) AS BIGINT) AS cnt
    FROM cust GROUP BY 1, 2, 3
  ), grps AS (
    SELECT nation, segment, CAST(sum(cnt) AS BIGINT) AS n_g FROM cells GROUP BY 1, 2
  ), bands AS (SELECT DISTINCT band FROM cust),
  gband AS (SELECT band, CAST(count(*) AS BIGINT) AS g_cnt FROM cust GROUP BY 1),
  consts AS (
    SELECT CAST(count(*) AS BIGINT) AS n_total,
           (SELECT CAST(count(*) AS BIGINT) FROM bands) AS k_bands
    FROM cust
  ), grid AS (
    SELECT g.nation, g.segment, b.band, g.n_g, gl.g_cnt,
           CAST(coalesce(c.cnt, 0) AS BIGINT) AS cnt
    FROM grps g CROSS JOIN bands b
    JOIN gband gl ON b.band = gl.band
    LEFT JOIN cells c
      ON c.nation = g.nation AND c.segment = g.segment AND c.band = b.band
  ), cum AS (
    SELECT nation, segment, n_g,
           sum(cnt * (SELECT n_total FROM consts) - g_cnt * n_g)
             OVER (PARTITION BY nation, segment ORDER BY band) AS _cum
    FROM grid
  ), per_group AS (
    SELECT nation, segment, n_g, CAST(sum(abs(_cum)) AS BIGINT) AS emd_scaled
    FROM cum GROUP BY 1, 2, 3
  )
  SELECT CAST(nation AS BIGINT) AS nation, segment, n_g, emd_scaled,
         CAST((emd_scaled * 1000000)
              // (((SELECT k_bands FROM consts) - 1) * n_g * (SELECT n_total FROM consts))
              AS BIGINT) AS emd_ppm
  FROM per_group
  ORDER BY emd_ppm DESC, nation, segment
  LIMIT 20
"""


# ---------------------------------------------------------------------
# 11. DQ screen: lines shipped before their order date
# ---------------------------------------------------------------------


def dq_ship_before_order_screen_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal-integrity DQ screen: lineitems whose l_shipdate
    precedes their order's o_orderdate — physically impossible, and
    PRESENT in this corpus (the graph_weighted_sssp round-5 work found
    it via its d≥0 sanity pin; this query turns that one-off discovery
    into a standing report). Per order priority: violating lines,
    affected orders, worst lead (max days shipped early), exact ppm of
    lines violating.

    Scale shape: one orderkey equi join (the natural co-partitioned
    fact-fact join; bucketable at warehouse scale), two aggs.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", F.lit(1).alias("_one")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    j = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).select(
        "o_orderpriority",
        "l_orderkey",
        F.datediff(F.col("o_orderdate"), F.col("l_shipdate")).cast("long").alias("_early"),
    )
    per_prio = j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.when(F.col("_early") > 0, 1).otherwise(0)).cast("long").alias("n_violations"),
        F.count_distinct(F.when(F.col("_early") > 0, F.col("l_orderkey")))
        .cast("long")
        .alias("n_bad_orders"),
        F.coalesce(F.max(F.when(F.col("_early") > 0, F.col("_early"))), F.lit(0))
        .cast("long")
        .alias("max_days_early"),
    )
    return per_prio.select(
        "o_orderpriority",
        "n_lines",
        "n_violations",
        "n_bad_orders",
        "max_days_early",
        F.expr("(n_violations * 1000000) DIV n_lines").cast("long").alias("violation_ppm"),
    ).orderBy("o_orderpriority")


_SHIP_BEFORE_ORDER_ORACLE = """
  WITH j AS (
    SELECT o.o_orderpriority, l.l_orderkey,
           CAST(date_diff('day', l.l_shipdate, o.o_orderdate) AS BIGINT) AS _early
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  ), per_prio AS (
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CASE WHEN _early > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
           CAST(count(DISTINCT CASE WHEN _early > 0 THEN l_orderkey END) AS BIGINT)
             AS n_bad_orders,
           CAST(coalesce(max(CASE WHEN _early > 0 THEN _early END), 0) AS BIGINT)
             AS max_days_early
    FROM j GROUP BY 1
  )
  SELECT o_orderpriority, n_lines, n_violations, n_bad_orders, max_days_early,
         CAST((n_violations * 1000000) // n_lines AS BIGINT) AS violation_ppm
  FROM per_prio
  ORDER BY o_orderpriority
"""


PENDING: tuple[PendingQuery, ...] = (
    PendingQuery(
        "events_retention_cohorts",
        events_retention_cohorts_query,
        _RETENTION_ORACLE,
        tags=("events", "cohort", "retention", "integer-exact"),
    ),
    PendingQuery(
        "events_funnel_conversion",
        events_funnel_conversion_query,
        _FUNNEL_ORACLE,
        tags=("events", "funnel", "window", "integer-exact"),
    ),
    PendingQuery(
        "orders_rfm_segmentation",
        orders_rfm_segmentation_query,
        _RFM_ORACLE,
        tags=("orders", "rfm", "segmentation", "quintile", "integer-exact"),
    ),
    PendingQuery(
        "orders_pareto_8020",
        orders_pareto_8020_query,
        _PARETO_ORACLE,
        tags=("orders", "pareto", "concentration", "integer-exact"),
    ),
    PendingQuery(
        "text_ngram13_contamination",
        text_ngram13_contamination_query,
        _CONTAMINATION_ORACLE,
        tags=("text", "contamination", "ngram", "decontamination",
              "integer-exact"),
    ),
    PendingQuery(
        "text_url_canonical_dedup",
        text_url_canonical_dedup_query,
        _URL_CANON_ORACLE,
        tags=("text", "url", "canonicalization", "dedup", "integer-exact"),
    ),
    PendingQuery(
        "graph_katz_centrality",
        graph_katz_centrality_query,
        _KATZ_ORACLE,
        tags=("graph", "katz", "centrality", "integer-exact"),
    ),
    PendingQuery(
        "orders_theil_sen_trend",
        orders_theil_sen_trend_query,
        _THEIL_SEN_ORACLE,
        tags=("orders", "theil-sen", "robust-trend", "bounded-pairs",
              "integer-exact"),
    ),
    PendingQuery(
        "events_markov_transitions",
        events_markov_transitions_query,
        _MARKOV_ORACLE,
        tags=("events", "markov", "transitions", "integer-exact"),
    ),
    PendingQuery(
        "privacy_t_closeness_emd",
        privacy_t_closeness_emd_query,
        _T_CLOSENESS_ORACLE,
        tags=("privacy", "t-closeness", "emd", "bounded-grid",
              "integer-exact"),
    ),
    PendingQuery(
        "dq_ship_before_order_screen",
        dq_ship_before_order_screen_query,
        _SHIP_BEFORE_ORDER_ORACLE,
        tags=("dq", "temporal-integrity", "integer-exact"),
    ),
)
