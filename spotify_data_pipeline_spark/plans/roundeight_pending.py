"""Round-8 declared-query staging area (same contract as
``roundsix_pending``/``roundseven_pending``: built and oracle-verified
NOW, deliberately NOT declared — round 7's activation window is fully
planned at 39 staged + 11 re-proofs, so these wait one more round).

Each entry: exact-oracle query + DuckDB SQL, exercised by
``tests/test_roundeight_pending.py`` with the driver-shaped comparison.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.io import load_table
from spotify_data_pipeline_spark.operators.parallelism import ensure_min_parallelism
from spotify_data_pipeline_spark.plans.parity import rnd_cents


@dataclass(frozen=True)
class PendingQuery:
    name: str
    fn: object
    oracle: str | None
    headline: bool = False
    tags: tuple[str, ...] = ()


def graph_hits_scores_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg '99) on the bipartite
    customer→supplier purchase graph — the mutual-reinforcement
    centrality PageRank's single-vector walk can't express (who are
    the authoritative suppliers, as voted by the best-connected
    customers?). UNNORMALIZED fixed-round form: a₁ = Aᵀ·1 (supplier
    in-degree), h₁ = A·a₁, a₂ = Aᵀ·h₁ — pure INTEGER matrix-vector
    products (normalization each round would put a float norm inside
    the recursion; monotone transforms don't change the ranking), so
    the unrolled oracle replicates every round exactly. Growth bound:
    scores ≤ (max degree)² per round pair — ~10⁹ at sf0.1, far under
    2⁶³. Two equi-join+agg rounds over the edge list; top-20
    authorities with the id tiebreak."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    a1 = edges.groupBy("s").agg(F.count("*").alias("a1"))
    h1 = (
        edges.join(a1, "s")
        .groupBy("c")
        .agg(F.sum("a1").alias("h1"))
    )
    a2 = (
        edges.join(h1, "c")
        .groupBy("s")
        .agg(F.sum("h1").alias("a2"))
    )
    return (
        a2.join(a1, "s")
        .join(F.broadcast(supp), F.col("s") == F.col("s_suppkey"))
        .select(
            F.col("s").alias("s_suppkey"),
            "s_name",
            F.col("a1").cast("long").alias("authority_1"),
            F.col("a2").cast("long").alias("authority_2"),
        )
        .orderBy(F.col("authority_2").desc(), "s_suppkey")
        .limit(20)
    )


_HITS_ORACLE = """
    WITH e AS (
      SELECT DISTINCT o_custkey AS c, l_suppkey AS s
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ), a1 AS (
      SELECT s, CAST(count(*) AS BIGINT) AS a1 FROM e GROUP BY s
    ), h1 AS (
      SELECT c, CAST(sum(a1) AS BIGINT) AS h1
      FROM e JOIN a1 USING (s) GROUP BY c
    ), a2 AS (
      SELECT s, CAST(sum(h1) AS BIGINT) AS a2
      FROM e JOIN h1 USING (c) GROUP BY s
    )
    SELECT s AS s_suppkey, s_name, a1 AS authority_1, a2 AS authority_2
    FROM a2
    JOIN a1 USING (s)
    JOIN supplier ON s = s_suppkey
    ORDER BY authority_2 DESC, s_suppkey
    LIMIT 20
"""


def text_phrase_search_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase retrieval — documents containing the adjacent
    token sequence 'spark join', with the occurrence count — the
    positional query the bag-of-terms boolean search cannot answer.
    MAP-ONLY: the adjacency test is a higher-order filter over the
    token array (element_at is 1-indexed on BOTH engines), no explode
    and no shuffle before the final sort; the size<2 guard matters
    because Spark's sequence(1, 0) DESCENDS instead of emitting empty
    (DuckDB's range(1, 1) is empty — the asymmetry the guard hides)."""
    from spotify_data_pipeline_spark.functions.text import tokens

    # r12 optimization (the shingles binding lesson + guide §2.5): the
    # token array used to be referenced from inside the per-position
    # lambda, so the regex tokenization re-ran once per position —
    # O(len²) regex per document (measured 16 s at sf0.1 in the single
    # scan task). Bound through a one-element transform it tokenizes
    # once per row; the parallelism guard spreads the map stage.
    docs = ensure_min_parallelism(load_table(spark, sf_dir, "documents"))

    def _count_of(tk):
        n = F.size(tk)
        hits = F.size(
            F.filter(
                F.sequence(F.lit(1), n - 1),
                lambda i: (F.element_at(tk, i) == "spark")
                & (F.element_at(tk, i + 1) == "join"),
            )
        )
        return F.when(n >= 2, hits).otherwise(F.lit(0))

    n_occ = F.element_at(
        F.transform(F.array(tokens(F.col("text"))), _count_of), 1
    )
    return (
        docs.select(
            "doc_id",
            n_occ.cast("long").alias("n_occurrences"),
        )
        .where(F.col("n_occurrences") > 0)
        .orderBy("doc_id")
    )


_PHRASE_SEARCH_ORACLE = """
    WITH t AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
      FROM documents
    )
    SELECT doc_id,
           CAST(len(list_filter(range(1, len(toks)),
                                i -> toks[i] = 'spark' AND toks[i + 1] = 'join'))
                AS BIGINT) AS n_occurrences
    FROM t
    WHERE len(list_filter(range(1, len(toks)),
                          i -> toks[i] = 'spark' AND toks[i + 1] = 'join')) > 0
    ORDER BY doc_id
"""


def events_marker_sessions_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-delimited sessionization — a new session starts at each
    'signup' event (the business-rule variant; the 30-minute GAP rule
    is the shared inactivity variant): session id = running count of
    markers per user, events before the first marker land in session 0
    (the pre-signup segment, kept deliberately). Output is the
    session-length histogram — one sessionize window + two hash aggs,
    no joins."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sid = F.sum((F.col("event_type") == "signup").cast("long")).over(w)
    per_sess = (
        ev.withColumn("_sid", sid)
        .groupBy("user_id", "_sid")
        .agg(F.count("*").alias("_len"))
    )
    return (
        per_sess.groupBy(F.col("_len").alias("session_len"))
        .agg(F.count("*").alias("n_sessions"))
        .orderBy("session_len")
    )


_MARKER_SESSIONS_ORACLE = """
    WITH s AS (
      SELECT user_id,
             sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS sid
      FROM events
    ), per AS (
      SELECT user_id, sid, CAST(count(*) AS BIGINT) AS len
      FROM s GROUP BY 1, 2
    )
    SELECT len AS session_len, CAST(count(*) AS BIGINT) AS n_sessions
    FROM per
    GROUP BY len
    ORDER BY session_len
"""


def events_disorder_audit_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-order arrival audit: per user, how many events carry an
    event time EARLIER than some previously-arrived event (arrival
    order = event_id — the ingestion sequence) — the late-data ratio
    that calibrates streaming watermarks (streaming/events.py's
    withWatermark bound should cover the observed disorder). One
    running-max window over the prior-arrivals frame + one agg;
    exact integers, 4dp ratio; users with zero disorder kept (the
    denominator matters for the fleet-wide rate)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior_max = F.max("ts").over(w_prev)
    flagged = ev.withColumn(
        "_late", (prior_max.isNotNull() & (F.col("ts") < prior_max)).cast("long")
    )
    return (
        flagged.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("_late").alias("n_disordered"),
        )
        .select(
            "user_id",
            "n_events",
            F.col("n_disordered").cast("long").alias("n_disordered"),
            (
                F.floor(F.col("n_disordered") / F.col("n_events") * 10000 + F.lit(0.5))
                / 10000.0
            ).alias("disorder_ratio"),
        )
        .orderBy("user_id")
    )


_DISORDER_ORACLE = """
    WITH f AS (
      SELECT user_id,
             CASE WHEN max(ts) OVER (PARTITION BY user_id ORDER BY event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       > ts
                  THEN 1 ELSE 0 END AS late
      FROM events
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(late) AS BIGINT) AS n_disordered,
           floor(CAST(sum(late) AS DOUBLE) / count(*) * 10000 + 0.5) / 10000
             AS disorder_ratio
    FROM f
    GROUP BY user_id
    ORDER BY user_id
"""


def agg_revenue_gini_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue per market segment — the
    inequality/concentration statistic behind 'how dependent are we on
    few accounts' (events_pareto shows the curve; this is the scalar).
    The sorted-rank identity G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx)
    (i = ascending rank, tiebreak custkey) keeps numerator and
    denominator EXACT 64-bit integers — no Lorenz-curve floats; one
    rank window per segment + one agg; 4dp display division only.
    Overflow bound: Σ i·xᵢ ≤ n²·max(x) must stay under 2⁶³ — holds to
    ~10⁸ customers per segment at 10⁵-dollar balances; past that,
    pre-scale x to whole dollars (the statistic is scale-invariant)."""
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    per_cust = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", "c_custkey")
        .agg(F.sum(rnd_cents("o_totalprice")).alias("_x"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("_x").asc(), F.col("c_custkey").asc())
    ranked = per_cust.withColumn("_i", F.row_number().over(w))
    return (
        ranked.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("_x").alias("_sx"),
            F.sum(F.col("_i") * F.col("_x")).alias("_six"),
        )
        .select(
            "c_mktsegment",
            "n_customers",
            (F.col("_sx") / 100.0).alias("revenue"),
            (
                F.floor(
                    (2 * F.col("_six") - (F.col("n_customers") + 1) * F.col("_sx"))
                    / (F.col("n_customers") * F.col("_sx"))
                    * 10000
                    + F.lit(0.5)
                )
                / 10000.0
            ).alias("gini"),
        )
        .orderBy("c_mktsegment")
    )


_GINI_ORACLE = """
    WITH per AS (
      SELECT c_mktsegment, c_custkey,
             sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS x
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2
    ), ranked AS (
      SELECT c_mktsegment, x,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY x ASC, c_custkey ASC) AS i
      FROM per
    )
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_customers,
           sum(x) / 100.0 AS revenue,
           floor(CAST(2 * sum(i * x) - (count(*) + 1) * sum(x) AS DOUBLE)
                 / (count(*) * sum(x)) * 10000 + 0.5) / 10000 AS gini
    FROM ranked
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
"""


def events_uniques_rollup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct users over the (month ⊃ day) time hierarchy via
    GROUPING SETS — the classic non-additivity trap: daily uniques do
    NOT sum to monthly uniques, so each level must re-count from the
    raw frame (a mergeable-sketch rollup trades exactness for one
    pass — the HLL row covers that side; this is the exact side).
    grouping_id labels the level; one expand+agg plan, no joins."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    month = F.date_trunc("MONTH", "ts").alias("month")
    day = F.date_trunc("DAY", "ts").alias("day")
    leveled = ev.select(month, day, "user_id")
    return (
        leveled.groupingSets([[], ["month"], ["month", "day"]], "month", "day")
        .agg(
            F.grouping_id().cast("long").alias("level_id"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("level_id", "month", "day")
    )


_UNIQUES_ROLLUP_ORACLE = """
    SELECT date_trunc('month', ts) AS month,
           date_trunc('day', ts) AS day,
           CAST(CASE WHEN GROUPING(month) = 1 THEN 3
                     WHEN GROUPING(day) = 1 THEN 1
                     ELSE 0 END AS BIGINT) AS level_id,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY GROUPING SETS ((), (month), (month, day))
    ORDER BY level_id, month, day
"""


def text_collocation_lift_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-bigram collocations by LIFT — PMI's argument without
    its log (the Benford/BM25 lesson: ln isn't cross-engine exact;
    the monotone-equivalent ratio ranks identically):
    lift(a,b) = B(ab)·Tu² / (Tb·U(a)·U(b)) with bigram/unigram counts
    as exact integers and the ratio computed in DOUBLES with one fixed
    tree — deterministic at ANY corpus size (the products overflow
    int64 near Tu ≈ 1.4·10⁹ tokens, so the atoms cast to double FIRST;
    IEEE multiply/divide of identically-converted doubles is
    bit-reproducible even past 2⁵³, unlike 64-bit integer overflow
    which aborts). Min-count ≥ 5 prunes before ranking (and bounds the
    ranked set at 100 TB); top-15 with the pair tiebreak. Shares the
    bigram frame idea with text_bigram_lm (conditional probabilities)
    but answers the association question."""
    from spotify_data_pipeline_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents").where(
        F.length(F.trim(F.col("text"))) > 0
    )
    toks = tokens(F.col("text"))
    base = docs.select(F.explode(toks).alias("w")).groupBy("w").agg(
        F.count("*").alias("u")
    )
    pairs = (
        docs.select(toks.alias("_t"))
        .where(F.size("_t") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("_t") - 1),
                    lambda i: F.struct(
                        F.element_at("_t", i).alias("w1"),
                        F.element_at("_t", i + 1).alias("w2"),
                    ),
                )
            ).alias("bg")
        )
        .select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    bg = pairs.groupBy("w1", "w2").agg(F.count("*").alias("b")).where(F.col("b") >= 5)
    tot_u = base.agg(F.sum("u").alias("tu"))
    tot_b = pairs.agg(F.count("*").alias("tb"))
    joined = (
        bg.join(base.select(F.col("w").alias("w1"), F.col("u").alias("u1")), "w1")
        .join(base.select(F.col("w").alias("w2"), F.col("u").alias("u2")), "w2")
        .crossJoin(F.broadcast(tot_u))
        .crossJoin(F.broadcast(tot_b))
    )
    lift = (F.col("b").cast("double") * F.col("tu") * F.col("tu")) / (
        F.col("tb").cast("double") * F.col("u1") * F.col("u2")
    )
    return (
        joined.select(
            "w1",
            "w2",
            F.col("b").cast("long").alias("n_bigram"),
            (F.floor(lift * 10000 + F.lit(0.5)) / 10000.0).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "w1", "w2")
        .limit(15)
    )


_COLLOCATION_ORACLE = """
    WITH t AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
      FROM documents WHERE length(trim(text)) > 0
    ), uni AS (
      SELECT unnest(toks) AS w FROM t
    ), u AS (
      SELECT w, CAST(count(*) AS BIGINT) AS u FROM uni GROUP BY w
    ), bgs AS (
      SELECT toks[i] AS w1, toks[i + 1] AS w2
      FROM t, unnest(range(1, len(toks))) AS r(i)
      WHERE len(toks) >= 2
    ), b AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS b
      FROM bgs GROUP BY 1, 2 HAVING count(*) >= 5
    ), tu AS (SELECT CAST(sum(u) AS BIGINT) AS tu FROM u),
    tb AS (SELECT CAST(count(*) AS BIGINT) AS tb FROM bgs)
    SELECT w1, w2, b.b AS n_bigram,
           floor((CAST(b.b AS DOUBLE) * tu * tu)
                 / (CAST(tb AS DOUBLE) * u1.u * u2.u) * 10000 + 0.5) / 10000 AS lift
    FROM b
    JOIN u u1 ON b.w1 = u1.w
    JOIN u u2 ON b.w2 = u2.w, tu, tb
    ORDER BY lift DESC, w1, w2
    LIMIT 15
"""


def join_returned_items_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape — returned-item revenue ranking: the top-20
    customers by revenue lost to returns (l_returnflag = 'R') over one
    order-date quarter, with their nation. Fact filters (flag + the
    quarter via the orders join) cut before the customer join; nation
    broadcasts; revenue in exact cents; custkey tiebreak."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            (
                F.sum(rnd_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
                / 100.0
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


_RETURNED_ITEMS_ORACLE = """
    SELECT c_custkey, c_name, n_name,
           sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT))
             / 100.0 AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-04-01'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
"""


def agg_priority_class_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape — priority classification per line status
    (l_linestatus plays the absent l_shipmode): among lines shipped in
    1997, how many belong to HIGH-priority orders vs lower — the
    two-CASE-sum join that audits whether expedited orders actually
    ship. One fact-orders equi join, one 3-row agg, exact integers."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_linestatus")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(high.cast("long")).alias("high_line_count"),
            F.sum((~high).cast("long")).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


_PRIORITY_CLASS_ORACLE = """
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
"""


def agg_promo_revenue_share_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape — promotion effect: the percentage of one
    month's revenue carried by PROMO-type parts, as the two-
    conditional-sums ratio over the part join (both sums in exact
    cents → ONE deterministic division, 4dp). Part broadcasts; the
    month filter is the pushed predicate."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    vol = rnd_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    promo = F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0)))
    total = F.sum(vol)
    return li.join(F.broadcast(part), li.l_partkey == part.p_partkey).agg(
        (promo / 100.0).alias("promo_revenue"),
        (total / 100.0).alias("total_revenue"),
        (F.floor(promo / total * 1000000 + F.lit(0.5)) / 10000.0).alias("promo_pct"),
    )


_PROMO_SHARE_ORACLE = """
    SELECT sum(CASE WHEN p_type = 'PROMO'
                    THEN CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)
                    ELSE 0 END) / 100.0 AS promo_revenue,
           sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT))
             / 100.0 AS total_revenue,
           floor(CAST(sum(CASE WHEN p_type = 'PROMO'
                               THEN CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)
                               ELSE 0 END) AS DOUBLE)
                 / sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT))
                 * 1000000 + 0.5) / 10000 AS promo_pct
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01'
      AND l_shipdate < TIMESTAMP '1997-04-01'
"""


def join_top_supplier_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape — the top supplier(s): whoever achieved the
    MAXIMUM revenue over one quarter, ties included (the view + scalar
    MAX subquery becomes an unpartitioned window max over the ~|S|-row
    supplier aggregate — the frame is already reduced, so the single-
    partition window is a non-issue; the fact never sees it). Exact
    cents make revenue == max an INTEGER equality — the float-compare
    trap Q15 is famous for never arises."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    ).select("l_suppkey", "l_extendedprice", "l_discount")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    per = li.groupBy("l_suppkey").agg(
        F.sum(rnd_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "_cents"
        )
    )
    w = Window.partitionBy()
    best = per.withColumn("_max", F.max("_cents").over(w)).where(
        F.col("_cents") == F.col("_max")
    )
    return (
        best.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("_cents") / 100.0).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


_TOP_SUPPLIER_ORACLE = """
    WITH per AS (
      SELECT l_suppkey,
             sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT))
               AS cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, cents / 100.0 AS total_revenue
    FROM per
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE cents = (SELECT max(cents) FROM per)
    ORDER BY s_suppkey
"""


def llm_bpe_pair_counts_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FIRST merge round of BPE tokenizer training: adjacent
    CHARACTER-pair frequencies within words across the corpus — the
    statistic every merge decision reads (Sennrich et al. 2016). One
    explode to words, one in-array transform to (c1, c2) pairs (the
    phrase-search adjacency device at character granularity), one hash
    agg; top-20 pairs with the pair tiebreak. Exact integers; at
    100 TB this is the per-iteration shape of distributed tokenizer
    training (subsequent rounds re-run it over merged symbols)."""
    from spotify_data_pipeline_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents").where(
        F.length(F.trim(F.col("text"))) > 0
    )
    words = docs.select(F.explode(tokens(F.col("text"))).alias("w")).where(
        F.length("w") >= 2
    )
    # substring needs integer positions from the sequence — built via
    # expr (lambda positions aren't valid substring args in pyspark's
    # Column DSL, which only takes int literals)
    pairs = words.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(w) - 1),"
                " i -> struct(substring(w, i, 1) AS c1, substring(w, i + 1, 1) AS c2))"
            )
        ).alias("p")
    ).select(F.col("p.c1").alias("c1"), F.col("p.c2").alias("c2"))
    return (
        pairs.groupBy("c1", "c2")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy(F.col("n_pairs").desc(), "c1", "c2")
        .limit(20)
    )


_BPE_PAIR_ORACLE = """
    WITH t AS (
      SELECT string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
      FROM documents WHERE length(trim(text)) > 0
    ), w AS (
      SELECT unnest(toks) AS w FROM t
    ), p AS (
      SELECT substring(w, i, 1) AS c1, substring(w, i + 1, 1) AS c2
      FROM w, unnest(range(1, length(w))) AS r(i)
      WHERE length(w) >= 2
    )
    SELECT c1, c2, CAST(count(*) AS BIGINT) AS n_pairs
    FROM p
    GROUP BY 1, 2
    ORDER BY n_pairs DESC, c1, c2
    LIMIT 20
"""


def events_signup_to_purchase_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activation lag: per user, days from first signup to first
    subsequent purchase — the conversion-latency distribution (count
    converted, discrete median/p90 lag) that sits between the funnel
    (did they convert) and retention (did they stay). Two conditional
    min-aggs per user (one shuffle), then a 1-row summary; integer day
    arithmetic; users who never purchased after signing up count in
    n_signed_up but contribute no lag — the denominator pin."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("_su"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("_fp"),
    )
    day = lambda c: F.floor(c.cast("long") / 86400)  # noqa: E731
    lagged = per_user.where(F.col("_su").isNotNull()).withColumn(
        "_lag",
        F.when(
            F.col("_fp").isNotNull() & (F.col("_fp") >= F.col("_su")),
            day(F.col("_fp")) - day(F.col("_su")),
        ),
    )
    return lagged.agg(
        F.count("*").alias("n_signed_up"),
        F.count("_lag").alias("n_converted"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY _lag)")
        .cast("long")
        .alias("median_lag_days"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY _lag)")
        .cast("long")
        .alias("p90_lag_days"),
    )


_SIGNUP_PURCHASE_ORACLE = """
    WITH per AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'signup' THEN ts END) AS su,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS fp
      FROM events GROUP BY user_id
    ), lagged AS (
      SELECT CASE WHEN fp IS NOT NULL AND fp >= su
                  THEN floor(epoch(fp) / 86400) - floor(epoch(su) / 86400)
             END AS lag
      FROM per WHERE su IS NOT NULL
    )
    SELECT CAST(count(*) AS BIGINT) AS n_signed_up,
           CAST(count(lag) AS BIGINT) AS n_converted,
           CAST(quantile_disc(lag, 0.5) AS BIGINT) AS median_lag_days,
           CAST(quantile_disc(lag, 0.9) AS BIGINT) AS p90_lag_days
    FROM lagged
"""


def agg_weighted_avg_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted average unit price per brand — the weighted
    mean as a ratio of two EXACT integer sums (Σ cents·qty / Σ qty —
    quantities are integral), against the float-accumulator weighted
    average that drifts with partition order. One broadcast dim join +
    one hash agg; 4dp display division only."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_quantity"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    qty = F.col("l_quantity").cast("long")
    wsum = F.sum(rnd_cents(F.col("l_extendedprice") / F.col("l_quantity")) * qty)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(qty).alias("total_qty"),
            wsum.alias("_wc"),
        )
        .select(
            "p_brand",
            "total_qty",
            (
                F.floor(F.col("_wc") / F.col("total_qty") / 100.0 * 10000 + F.lit(0.5))
                / 10000.0
            ).alias("wavg_unit_price"),
        )
        .orderBy("p_brand")
    )


_WEIGHTED_AVG_ORACLE = """
    SELECT p_brand,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
           floor(CAST(sum(CAST(floor(l_extendedprice / l_quantity * 100 + 0.5) AS BIGINT)
                          * CAST(l_quantity AS BIGINT)) AS DOUBLE)
                 / sum(CAST(l_quantity AS BIGINT)) / 100.0 * 10000 + 0.5) / 10000
             AS wavg_unit_price
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    ORDER BY p_brand
"""


def events_slo_burn_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiwindow SLO burn-rate alerting (the Google SRE workbook
    pattern): per hour, the error-budget burn at the 1-hour and
    6-hour windows against a 99%-success SLO, alarming only when BOTH
    burn fast (>14.4) and sustained (>6) — the two-window AND is what
    kills flappy single-window alerts. Burn = error_rate / (1−SLO) =
    errors·100/total, kept as a 4dp ratio of exact integers; the
    thresholds enter ×10 cross-multiplied (errors·1000 > 144·total —
    no float compare). Two hash aggs (hour, 6-hour) + one equi join on
    the containing 6-hour bucket."""
    ev = load_table(spark, sf_dir, "events").select("ts", "event_type")
    is_err = (F.col("event_type") == "error").cast("long")
    hour = F.date_trunc("HOUR", "ts")
    h6 = F.timestamp_seconds(
        F.floor(F.col("ts").cast("long") / 21600) * 21600
    )
    hourly = ev.groupBy(hour.alias("hour"), h6.alias("_h6")).agg(
        F.count("*").alias("n_events"), F.sum(is_err).alias("n_errors")
    )
    sixly = ev.groupBy(h6.alias("_h6")).agg(
        F.count("*").alias("_n6"), F.sum(is_err).alias("_e6")
    )
    joined = hourly.join(sixly, "_h6")
    burn1 = F.floor(F.col("n_errors") * 100 / F.col("n_events") * 10000 + F.lit(0.5)) / 10000.0
    burn6 = F.floor(F.col("_e6") * 100 / F.col("_n6") * 10000 + F.lit(0.5)) / 10000.0
    alarm = (F.col("n_errors") * 1000 > 144 * F.col("n_events")) & (
        F.col("_e6") * 1000 > 60 * F.col("_n6")
    )
    return (
        joined.select(
            "hour",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("n_errors").cast("long").alias("n_errors"),
            burn1.alias("burn_1h"),
            burn6.alias("burn_6h"),
            alarm.alias("alarm"),
        )
        .orderBy("hour")
    )


_SLO_BURN_ORACLE = """
    WITH h AS (
      SELECT date_trunc('hour', ts) AS hour,
             to_timestamp(CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT))
               AT TIME ZONE 'UTC' AS h6,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_errors
      FROM events GROUP BY 1, 2
    ), s AS (
      SELECT to_timestamp(CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT))
               AT TIME ZONE 'UTC' AS h6,
             CAST(count(*) AS BIGINT) AS n6,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
               AS e6
      FROM events GROUP BY 1
    )
    SELECT hour, n_events, n_errors,
           floor(CAST(n_errors * 100 AS DOUBLE) / n_events * 10000 + 0.5) / 10000
             AS burn_1h,
           floor(CAST(e6 * 100 AS DOUBLE) / n6 * 10000 + 0.5) / 10000 AS burn_6h,
           (n_errors * 1000 > 144 * n_events AND e6 * 1000 > 60 * n6) AS alarm
    FROM h JOIN s USING (h6)
    ORDER BY hour
"""


def orders_backtest_mape_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast backtest with integer-exact MAPE: the naive seasonal
    forecast (this month = same month LAST YEAR, the baseline every
    real model must beat) evaluated per nation. The float-sum trap:
    averaging |a−f|/a doubles is partition-order-dependent — instead
    each month's absolute percentage error is FLOORED TO AN INTEGER
    ape_scaled = ⌊|a−f|·10⁴/a⌋ (exact: a, f are cents), the per-nation
    sum is an integer, and only the final display mean divides. One
    agg to (nation, month) + one lag window + one summary agg."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    monthly = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", F.date_trunc("MONTH", "o_orderdate").alias("month"))
        .agg(F.sum(rnd_cents("o_totalprice")).alias("_a"))
    )
    w = Window.partitionBy("n_name").orderBy("month")
    scored = monthly.withColumn("_f", F.lag("_a", 12).over(w)).where(
        F.col("_f").isNotNull()
    )
    ape = F.floor(F.abs(F.col("_a") - F.col("_f")) * 10000 / F.col("_a"))
    return (
        scored.groupBy("n_name")
        .agg(
            F.count("*").alias("n_backtest_months"),
            F.sum(ape).alias("_sape"),
        )
        .select(
            "n_name",
            "n_backtest_months",
            (
                F.floor(F.col("_sape") / F.col("n_backtest_months") + F.lit(0.5))
                / 10000.0
            ).alias("mape"),
        )
        .orderBy("n_name")
    )


_BACKTEST_MAPE_ORACLE = """
    WITH monthly AS (
      SELECT n_name, date_trunc('month', o_orderdate) AS month,
             sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS a
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1, 2
    ), scored AS (
      SELECT n_name, a,
             lag(a, 12) OVER (PARTITION BY n_name ORDER BY month) AS f
      FROM monthly
    )
    SELECT n_name,
           CAST(count(*) AS BIGINT) AS n_backtest_months,
           floor(CAST(sum(CAST(floor(abs(a - f) * 10000 / a) AS BIGINT)) AS DOUBLE)
                 / count(*) + 0.5) / 10000 AS mape
    FROM scored
    WHERE f IS NOT NULL
    GROUP BY n_name
    ORDER BY n_name
"""


def text_rake_keywords_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE-style keyword scoring (Rose et al. 2010, word level):
    score(w) = deg(w)/freq(w) with deg = freq + adjacent-co-occurrence
    count — words that KEEP COMPANY (high degree) outrank words that
    are merely frequent; the keyword-extraction axis the tf-idf and
    heavy-hitter rows don't cover. deg and freq are exact integers
    from the shared bigram/unigram frames; min-freq ≥ 10 prunes; one
    deterministic 4dp division; top-15 by score with the word
    tiebreak."""
    from spotify_data_pipeline_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents").where(
        F.length(F.trim(F.col("text"))) > 0
    )
    toks = tokens(F.col("text"))
    uni = docs.select(F.explode(toks).alias("w")).groupBy("w").agg(
        F.count("*").alias("freq")
    )
    bg = (
        docs.select(toks.alias("_t"))
        .where(F.size("_t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(_t) - 1),"
                    " i -> struct(element_at(_t, i) AS w1, element_at(_t, i + 1) AS w2))"
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
    )
    co = (
        bg.select(F.col("w1").alias("w"))
        .unionByName(bg.select(F.col("w2").alias("w")))
        .groupBy("w")
        .agg(F.count("*").alias("co"))
    )
    joined = uni.join(co, "w", "left").withColumn(
        "co", F.coalesce("co", F.lit(0))
    )
    score = (F.col("freq") + F.col("co")) / F.col("freq")
    return (
        joined.where(F.col("freq") >= 10)
        .select(
            "w",
            F.col("freq").cast("long").alias("freq"),
            (F.col("freq") + F.col("co")).cast("long").alias("degree"),
            (F.floor(score * 10000 + F.lit(0.5)) / 10000.0).alias("rake_score"),
        )
        .orderBy(F.col("rake_score").desc(), "w")
        .limit(15)
    )


_RAKE_ORACLE = """
    WITH t AS (
      SELECT string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
      FROM documents WHERE length(trim(text)) > 0
    ), uni AS (
      SELECT w, CAST(count(*) AS BIGINT) AS freq
      FROM (SELECT unnest(toks) AS w FROM t) GROUP BY w
    ), bg AS (
      SELECT toks[i] AS w1, toks[i + 1] AS w2
      FROM t, unnest(range(1, len(toks))) AS r(i)
      WHERE len(toks) >= 2
    ), co AS (
      SELECT w, CAST(count(*) AS BIGINT) AS co
      FROM (SELECT w1 AS w FROM bg UNION ALL SELECT w2 FROM bg) GROUP BY w
    )
    SELECT uni.w AS w, freq,
           CAST(freq + coalesce(co, 0) AS BIGINT) AS degree,
           floor(CAST(freq + coalesce(co, 0) AS DOUBLE) / freq * 10000 + 0.5) / 10000
             AS rake_score
    FROM uni LEFT JOIN co ON uni.w = co.w
    WHERE freq >= 10
    ORDER BY rake_score DESC, w
    LIMIT 15
"""


def events_audience_overlap_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap between behavior segments: the Jaccard
    similarity of the USER SETS behind each event-type pair (do
    clickers also purchase?) — segment-overlap analytics, the
    set-similarity question at the audience rather than document
    grain. (type, user) distincts self-join on user with type1 <
    type2 (shuffle on user id, the natural key); |A∪B| =
    |A|+|B|−|A∩B| keeps everything exact integers; 4dp display
    ratio. 5 types ⇒ 10 rows out."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id").distinct()
    sizes = ev.groupBy("event_type").agg(F.count("*").alias("n"))
    a = ev.select(F.col("event_type").alias("t1"), "user_id")
    b = ev.select(F.col("event_type").alias("t2"), "user_id")
    inter = (
        a.join(b, "user_id")
        .where(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(F.count("*").alias("n_both"))
    )
    out = (
        inter.join(
            F.broadcast(sizes.select(F.col("event_type").alias("t1"), F.col("n").alias("n1"))),
            "t1",
        )
        .join(
            F.broadcast(sizes.select(F.col("event_type").alias("t2"), F.col("n").alias("n2"))),
            "t2",
        )
    )
    union = F.col("n1") + F.col("n2") - F.col("n_both")
    return out.select(
        "t1",
        "t2",
        F.col("n_both").cast("long").alias("n_both"),
        union.cast("long").alias("n_union"),
        (F.floor(F.col("n_both") / union * 10000 + F.lit(0.5)) / 10000.0).alias(
            "jaccard"
        ),
    ).orderBy("t1", "t2")


_AUDIENCE_OVERLAP_ORACLE = """
    WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
    sizes AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
    inter AS (
      SELECT a.event_type AS t1, b.event_type AS t2,
             CAST(count(*) AS BIGINT) AS n_both
      FROM d a JOIN d b ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT t1, t2, n_both,
           s1.n + s2.n - n_both AS n_union,
           floor(CAST(n_both AS DOUBLE) / (s1.n + s2.n - n_both) * 10000 + 0.5)
             / 10000 AS jaccard
    FROM inter
    JOIN sizes s1 ON t1 = s1.event_type
    JOIN sizes s2 ON t2 = s2.event_type
    ORDER BY t1, t2
"""


def llm_dataset_card_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row dataset card ('Datasheets for Datasets', Gebru et al.
    2021): the corpus-level summary a training-data release ships with
    — document and token counts, source/language breadth, mean doc
    length, short-doc fraction. Every number is an exact integer or a
    4dp ratio of exact integers; ONE aggregation pass over the token
    frame (counts and distincts share the scan)."""
    from spotify_data_pipeline_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    n_toks = F.size(tokens(F.col("text")))
    base = docs.select(
        "doc_id", "source", "lang", n_toks.alias("_nt"), F.col("n_chars")
    )
    return base.agg(
        F.count("*").alias("n_docs"),
        F.sum("_nt").cast("long").alias("n_tokens"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("lang").alias("n_langs"),
        (
            F.floor(F.sum("_nt") / F.count("*") * 10000 + F.lit(0.5)) / 10000.0
        ).alias("mean_doc_tokens"),
        (
            F.floor(
                F.sum((F.col("_nt") < 50).cast("long")) / F.count("*") * 10000
                + F.lit(0.5)
            )
            / 10000.0
        ).alias("short_doc_ratio"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
    )


_DATASET_CARD_ORACLE = """
    WITH t AS (
      SELECT doc_id, source, lang, n_chars,
             CASE WHEN length(trim(text)) > 0
                  THEN len(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' '))
                  ELSE 0 END AS nt
      FROM documents
    )
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(nt) AS BIGINT) AS n_tokens,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           floor(CAST(sum(nt) AS DOUBLE) / count(*) * 10000 + 0.5) / 10000
             AS mean_doc_tokens,
           floor(CAST(sum(CASE WHEN nt < 50 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*) * 10000 + 0.5) / 10000 AS short_doc_ratio,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars
    FROM t
"""


def agg_supplier_hhi_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration index of supplier revenue per
    nation — the antitrust/market-concentration scalar (HHI = Σ shareᵢ²
    × 10⁴; >2500 = 'highly concentrated'), pairing with Gini on the
    inequality axis. The float trap: summing per-supplier share² is
    partition-order-dependent — instead Σ cᵢ² and (Σ cᵢ) are EXACT
    integer aggregates (order-free), and the HHI divides the two
    scalars in ONE fixed final expression. cᵢ² at ~10¹⁰ cents per
    supplier is ~10²⁰ > 2⁶³, so the square runs in DECIMAL(38,0)
    (HUGEINT on the oracle side) — exact to 38 digits, no overflow
    to ~10⁹ suppliers."""
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per_supp = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name", "l_suppkey")
        .agg(F.sum(rnd_cents("l_extendedprice")).alias("_c"))
    )
    return (
        per_supp.groupBy("n_name")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.sum("_c").alias("_sc"),
            F.sum(
                F.col("_c").cast("decimal(38,0)") * F.col("_c").cast("decimal(38,0)")
            ).alias("_sc2"),
        )
        .select(
            "n_name",
            "n_suppliers",
            (F.col("_sc") / 100.0).alias("revenue"),
            (
                F.floor(
                    F.col("_sc2") / (F.col("_sc") * 1.0 * F.col("_sc")) * 10000 + F.lit(0.5)
                )
            )
            .cast("long")
            .alias("hhi"),
        )
        .orderBy("n_name")
    )


_SUPPLIER_HHI_ORACLE = """
    WITH per AS (
      SELECT n_name, l_suppkey,
             sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS c
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      GROUP BY 1, 2
    )
    SELECT n_name,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           sum(c) / 100.0 AS revenue,
           CAST(floor(CAST(sum(CAST(c AS HUGEINT) * c) AS DOUBLE)
                      / (sum(c) * 1.0 * sum(c)) * 10000
                      + 0.5) AS BIGINT) AS hhi
    FROM per
    GROUP BY n_name
    ORDER BY n_name
"""


def events_rate_limit_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-bucket rate limiting per user — the API-gateway admission
    rule (capacity 100, refill 1 token/minute, per-type costs), batch-
    replayed to answer 'which users would the limiter throttle, and how
    hard?'. The recursion is DOUBLY non-associative (refill clamps at
    capacity above, spend gates on sufficiency below), so no window
    frame computes it — like `events_wallet_balance` it folds the
    per-user ordered event array with the built-in ``aggregate`` HOF:
    per-KEY sequential, corpus-parallel, no Python. Microsecond epoch
    integers end to end (refill = Δus div 6·10⁷ — floor division IS the
    spec, both engines truncate identically), so the fold is exact
    cross-engine. DuckDB's ``list_reduce`` requires accumulator type ==
    element type, so the element struct reuses the state shape (its
    `tok` field carries the event COST, `pus` the event time) — the
    lambda reads acc as state and e as event; documented asymmetry, not
    a bug. STATE FIELD ORDER IS LOAD-BEARING: DuckDB 1.0.0 evaluates
    the lambda's result-struct fields sequentially and mutates the
    accumulator in place, so a field computed after `tok` would read
    the NEW tok (measured: one admit/reject flip per threshold
    crossing). Ordering the state (adm, rej, tok, pus) makes every
    field's inputs be fields updated strictly LATER — correct under
    both in-place and functional evaluation, pinned by the minimal
    repro in tests. Per-user arrays are the same sessionization-scale
    bound every fold op here relies on (~thousands of events/user)."""
    ev = load_table(spark, sf_dir, "events")
    cost = (
        F.when(F.col("event_type") == "purchase", 30)
        .when(F.col("event_type") == "click", 5)
        .when(F.col("event_type") == "view", 3)
        .when(F.col("event_type") == "error", 10)
        .otherwise(0)
        .cast("long")
    )
    refill = "least(CAST(100 AS BIGINT), acc.tok + (e.pus - acc.pus) div 60000000)"
    fold = f"""
      aggregate(
        array_sort(collect_list(named_struct('pus', _us, 'eid', event_id, 'cost', _cost))),
        named_struct('adm', CAST(0 AS BIGINT), 'rej', CAST(0 AS BIGINT),
                     'tok', CAST(100 AS BIGINT), 'pus', CAST(0 AS BIGINT)),
        (acc, e) -> named_struct(
          'adm', acc.adm + CASE WHEN {refill} >= e.cost THEN 1 ELSE 0 END,
          'rej', acc.rej + CASE WHEN {refill} >= e.cost THEN 0 ELSE 1 END,
          'tok', CASE WHEN {refill} >= e.cost
                      THEN {refill} - e.cost ELSE {refill} END,
          'pus', e.pus))
    """
    per_user = (
        ev.select(
            "user_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("_us"),
            "event_id",
            cost.alias("_cost"),
        )
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.expr(fold).alias("_st"))
    )
    return per_user.select(
        "user_id",
        "n_events",
        F.col("_st.adm").alias("admitted"),
        F.col("_st.rej").alias("rejected"),
        F.col("_st.tok").alias("final_tokens"),
    )


_RATE_LIMIT_REFILL = (
    "least(CAST(100 AS BIGINT), acc.tok + (e.pus - acc.pus) // 60000000)"
)

_RATE_LIMIT_ORACLE = f"""
    WITH ev AS (
      SELECT user_id, ts, event_id,
             CAST(CASE event_type WHEN 'purchase' THEN 30 WHEN 'click' THEN 5
                  WHEN 'view' THEN 3 WHEN 'error' THEN 10 ELSE 0 END AS BIGINT) AS cost
      FROM events
    ), st AS (
      -- state field order (adm, rej, tok, pus) is LOAD-BEARING: DuckDB
      -- 1.0.0 list_reduce mutates the accumulator field-by-field, so
      -- every field must only read fields updated LATER than itself
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             list_reduce(
               list_prepend(
                 {{'adm': CAST(0 AS BIGINT), 'rej': CAST(0 AS BIGINT),
                   'tok': CAST(100 AS BIGINT), 'pus': CAST(0 AS BIGINT)}},
                 list({{'adm': CAST(0 AS BIGINT), 'rej': CAST(0 AS BIGINT),
                        'tok': cost, 'pus': epoch_us(ts)}}
                      ORDER BY ts, event_id)),
               (acc, e) -> {{
                 'adm': acc.adm + CASE WHEN {_RATE_LIMIT_REFILL} >= e.tok THEN 1 ELSE 0 END,
                 'rej': acc.rej + CASE WHEN {_RATE_LIMIT_REFILL} >= e.tok THEN 0 ELSE 1 END,
                 'tok': CASE WHEN {_RATE_LIMIT_REFILL} >= e.tok
                             THEN {_RATE_LIMIT_REFILL} - e.tok
                             ELSE {_RATE_LIMIT_REFILL} END,
                 'pus': e.pus}}
             ) AS s
      FROM ev GROUP BY 1)
    SELECT user_id, n_events, s.adm AS admitted, s.rej AS rejected,
           s.tok AS final_tokens
    FROM st
"""


def orders_auc_urgency_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC AUC (Mann–Whitney U) of order value as a predictor of
    urgency, per order status — the model-evaluation metric NDCG's
    retrieval axis doesn't cover (does a higher total price predict a
    1-URGENT/2-HIGH priority?). The float trap: per-pair comparison is
    O(P·N); instead AUC's rank-sum identity runs on GROUPED distinct
    scores — per score value s: p·(2·N_below) + p·n, summed, gives
    2U with ties worth 1 each (the ½ tie credit, doubled to stay
    INTEGER). One agg on (status, score-cents) + one cumulative window
    over distinct scores + one final agg; u2 and the P/N counts are
    exact integers, AUC itself one fixed 6dp division. 100 TB: shuffle
    keys are (status, score) then status — no pair ever materializes."""
    o = load_table(spark, sf_dir, "orders")
    pos = (
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long")
    )
    by_score = (
        o.select(
            "o_orderstatus",
            rnd_cents("o_totalprice").alias("score"),
            pos.alias("_p"),
        )
        .groupBy("o_orderstatus", "score")
        .agg(F.sum("_p").alias("p"), F.sum(1 - F.col("_p")).alias("n"))
    )
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    scored = by_score.withColumn(
        "_u2",
        F.col("p") * (2 * F.coalesce(F.sum("n").over(w), F.lit(0))) + F.col("p") * F.col("n"),
    )
    return (
        scored.groupBy("o_orderstatus")
        .agg(
            F.sum("p").alias("n_pos"),
            F.sum("n").alias("n_neg"),
            F.sum("_u2").alias("u2"),
        )
        .select(
            "o_orderstatus",
            "n_pos",
            "n_neg",
            "u2",
            (
                F.floor(
                    F.col("u2") / (2.0 * F.col("n_pos") * F.col("n_neg")) * 1000000
                    + F.lit(0.5)
                )
                / 1000000.0
            ).alias("auc"),
        )
        .orderBy("o_orderstatus")
    )


_AUC_ORACLE = """
    WITH by_score AS (
      SELECT o_orderstatus,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS score,
             sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 ELSE 0 END) AS p,
             sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 0 ELSE 1 END) AS n
      FROM orders GROUP BY 1, 2
    ), scored AS (
      SELECT o_orderstatus, p, n,
             p * (2 * coalesce(sum(n) OVER (PARTITION BY o_orderstatus ORDER BY score
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))
               + p * n AS u2
      FROM by_score)
    SELECT o_orderstatus,
           CAST(sum(p) AS BIGINT) AS n_pos,
           CAST(sum(n) AS BIGINT) AS n_neg,
           CAST(sum(u2) AS BIGINT) AS u2,
           floor(CAST(sum(u2) AS DOUBLE) / (2.0 * sum(p) * sum(n)) * 1000000
                 + 0.5) / 1000000 AS auc
    FROM scored GROUP BY 1 ORDER BY 1
"""


def text_heaps_law_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary-growth curve: cumulative distinct vocabulary
    vs cumulative tokens at power-of-two document checkpoints — the
    corpus-scaling diagnostic (V ≈ K·nᵝ) that tells a training-data
    team whether more data still buys new vocabulary. Exact and
    order-deterministic: each term's first appearance is min(doc_id)
    (an agg, not a scan-order artifact), new-vocab-per-doc re-joins the
    doc spine, and two running sums produce the curve; checkpoints are
    ranks with (rnk & (rnk−1)) = 0 plus the final rank, so the output
    is ~log₂(n_docs) rows at ANY scale. The global-order windows run
    over ONE ROW PER DOC (post-agg), not tokens — at 100 TB the
    two-phase distributed cumsum in `operators/batching.py` replaces
    them; the curve itself is inherently a corpus-level diagnostic."""
    from spotify_data_pipeline_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("_toks")
    )
    wd = Window.orderBy("doc_id")
    spine = docs.select(
        "doc_id",
        F.size("_toks").alias("_nt"),
    ).select(
        "doc_id",
        F.row_number().over(wd).alias("rnk"),
        F.sum("_nt").over(wd).alias("cum_tokens"),
    )
    firsts = (
        docs.select("doc_id", F.explode(F.array_distinct("_toks")).alias("term"))
        .groupBy("term")
        .agg(F.min("doc_id").alias("_fd"))
        .groupBy("_fd")
        .agg(F.count("*").alias("_newv"))
    )
    curve = spine.join(firsts, spine.doc_id == firsts._fd, "left").select(
        "rnk",
        "cum_tokens",
        F.sum(F.coalesce("_newv", F.lit(0))).over(wd).alias("cum_vocab"),
        F.max("rnk").over(Window.partitionBy(F.lit(1))).alias("_last"),
    )
    return (
        curve.where(
            (F.expr("(rnk & (rnk - 1)) = 0") & (F.col("rnk") > 0))
            | (F.col("rnk") == F.col("_last"))
        )
        .select(
            F.col("rnk").cast("long").alias("checkpoint_docs"),
            F.col("cum_tokens").cast("long").alias("cum_tokens"),
            F.col("cum_vocab").cast("long").alias("cum_vocab"),
        )
        .orderBy("checkpoint_docs")
    )


_HEAPS_ORACLE = """
    WITH t AS (
      SELECT doc_id,
             CASE WHEN length(trim(text)) > 0
                  THEN string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')
                  ELSE [] END AS toks
      FROM documents
    ), spine AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY doc_id) AS rnk,
             sum(len(toks)) OVER (ORDER BY doc_id) AS cum_tokens
      FROM t
    ), firsts AS (
      SELECT min_doc AS doc_id, count(*) AS newv
      FROM (SELECT term, min(doc_id) AS min_doc
            FROM (SELECT doc_id, unnest(list_distinct(toks)) AS term FROM t)
            GROUP BY 1)
      GROUP BY 1
    ), curve AS (
      SELECT rnk, cum_tokens,
             sum(coalesce(newv, 0)) OVER (ORDER BY doc_id) AS cum_vocab,
             max(rnk) OVER () AS last_rnk
      FROM spine LEFT JOIN firsts USING (doc_id))
    SELECT CAST(rnk AS BIGINT) AS checkpoint_docs,
           CAST(cum_tokens AS BIGINT) AS cum_tokens,
           CAST(cum_vocab AS BIGINT) AS cum_vocab
    FROM curve
    WHERE ((rnk & (rnk - 1)) = 0 AND rnk > 0) OR rnk = last_rnk
    ORDER BY 1
"""


def orders_trend_ols_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation revenue trend: OLS slope/intercept of monthly revenue
    on the month index — the 'is this market growing?' regression. The
    float trap: accumulating means/residuals is partition-order-
    dependent; instead the closed form runs entirely on EXACT integer
    moments (n, Σx, Σy, Σxy, Σx² — x = months since the nation's first
    month, y = monthly cents) and the output carries slope_num =
    n·Σxy − Σx·Σy and slope_den = n·Σx² − (Σx)² as exact integers (the
    auditable rational), plus one fixed double division for the
    readable slope. Overflow headroom: Σy·Σx² ≈ 10¹⁷ at sf0.1, two
    decades under 2⁶³; at 1000× pre-aggregate y to whole dollars.
    100 TB: broadcast dims, one (nation, month) agg, one 25-row final."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    m = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    monthly = (
        o.join(F.broadcast(cust), o.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", m.cast("long").alias("_m"))
        .agg(F.sum(rnd_cents("o_totalprice")).alias("_y"))
    )
    xy = monthly.select(
        "n_name",
        (F.col("_m") - F.min("_m").over(Window.partitionBy("n_name"))).alias("_x"),
        "_y",
    )
    stats = xy.groupBy("n_name").agg(
        F.count("*").alias("n_months"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
    )
    return stats.select(
        "n_name",
        "n_months",
        (F.col("n_months") * F.col("_sxy") - F.col("_sx") * F.col("_sy")).alias(
            "slope_num"
        ),
        (F.col("n_months") * F.col("_sxx") - F.col("_sx") * F.col("_sx")).alias(
            "slope_den"
        ),
        (F.col("_sy") * F.col("_sxx") - F.col("_sx") * F.col("_sxy")).alias(
            "intercept_num"
        ),
        (
            (F.col("n_months") * F.col("_sxy") - F.col("_sx") * F.col("_sy"))
            * 1.0
            / (F.col("n_months") * F.col("_sxx") - F.col("_sx") * F.col("_sx"))
        ).alias("slope_cents_per_month"),
    ).orderBy("n_name")


_TREND_OLS_ORACLE = """
    WITH monthly AS (
      SELECT n_name,
             CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS m,
             sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS y
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1, 2
    ), xy AS (
      SELECT n_name, m - min(m) OVER (PARTITION BY n_name) AS x, y FROM monthly
    ), s AS (
      SELECT n_name, CAST(count(*) AS BIGINT) AS n_months,
             sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM xy GROUP BY 1)
    SELECT n_name, n_months,
           CAST(n_months * sxy - sx * sy AS BIGINT) AS slope_num,
           CAST(n_months * sxx - sx * sx AS BIGINT) AS slope_den,
           CAST(sy * sxx - sx * sxy AS BIGINT) AS intercept_num,
           CAST(n_months * sxy - sx * sy AS DOUBLE)
             / (n_months * sxx - sx * sx) AS slope_cents_per_month
    FROM s ORDER BY 1
"""


def window_moving_median_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-row EXACT moving median of line-item price per
    supplier (1996 shipments) — the robust smoother percentile_approx
    cannot replace (approx sketches have no rank guarantee inside a
    moving frame). The frame's value list is collected per row
    (bounded: ≤7 elements), array-sorted, and the median read as the
    SUM OF THE TWO MIDDLE ELEMENTS (med2 = 2·median for odd frames) so
    even-length frames stay INTEGER — no float averaging, exact
    cross-engine. Deterministic order: (shipdate, orderkey, linenumber)
    is a unique key. 100 TB: one shuffle on the supplier key; the
    collected frame is O(7) per row regardless of scale."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    w = Window.partitionBy("l_suppkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )
    base = li.select(
        "l_suppkey",
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
        rnd_cents("l_extendedprice").alias("_c"),
    ).select(
        "l_suppkey",
        F.row_number().over(w).alias("rnk"),
        F.array_sort(F.collect_list("_c").over(w.rowsBetween(-6, 0))).alias("_win"),
    )
    s = F.size("_win")
    # integer DIV, not float-cast: CAST(3.5 AS INT) truncates in Spark
    # but rounds in DuckDB — floor division sidesteps the divergence
    lo = F.expr("CAST((size(_win) + 1) DIV 2 AS INT)")
    hi = F.expr("CAST(size(_win) DIV 2 + 1 AS INT)")
    return base.select(
        "l_suppkey",
        "rnk",
        s.cast("long").alias("n_win"),
        (F.element_at("_win", lo) + F.element_at("_win", hi)).alias("med2_cents"),
    )


_MOVING_MEDIAN_ORACLE = """
    WITH li AS (
      SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
    ), base AS (
      SELECT l_suppkey,
             row_number() OVER wo AS rnk,
             list_sort(list(c) OVER (wo ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
               AS win
      FROM li
      WINDOW wo AS (PARTITION BY l_suppkey
                    ORDER BY l_shipdate, l_orderkey, l_linenumber)
    )
    SELECT l_suppkey, rnk, CAST(len(win) AS BIGINT) AS n_win,
           win[(len(win) + 1) // 2] + win[len(win) // 2 + 1] AS med2_cents
    FROM base
"""


def events_pattern_match_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-pattern session matching — SQL-2016 MATCH_RECOGNIZE
    re-expressed Spark-first: sessionize (the shared 30-min gap rule),
    render each session as an ORDERED event-initial string
    (p/c/v/s/e), and count sessions whose string matches each of three
    fixed regex patterns (click→purchase with no error between,
    view→…→purchase, signup-led session — all measured NON-VACUOUS at
    every test SF: sessions here are short, so a 3-step funnel regex
    would match zero sessions and prove nothing, the Q7 lesson). The
    signature trick turns sequence predicates into ONE vectorized
    regex per session instead of a per-step self-join cascade; the
    patterns use only character classes and `.*`, where Java regex and
    RE2 agree, so the oracle replicates them verbatim. 100 TB: one
    shuffle on the user key; session strings are bounded by the same
    per-session event counts sessionization already assumes."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    _us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = _us - F.lag(_us).over(wu)
    new_s = F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0)
    sess = ev.withColumn("_us", _us).withColumn("_sid", F.sum(new_s).over(wu))
    per_sess = sess.groupBy("user_id", "_sid").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(_us, event_id, event_type)))"
            ", s -> left(s.event_type, 1)), '')"
        ).alias("sig")
    )
    tot = per_sess.agg(
        F.count("*").alias("_n"),
        F.sum(F.col("sig").rlike("c[^e]*p").cast("long")).alias("_f1"),
        F.sum(F.col("sig").rlike("v.*p").cast("long")).alias("_f2"),
        F.sum(F.col("sig").rlike("^s").cast("long")).alias("_f3"),
    )
    return tot.selectExpr(
        "stack(3, 'click_to_purchase', _f1, 'view_to_purchase', _f2,"
        " 'signup_start', _f3) AS (pattern, n_sessions)",
        "_n AS n_total_sessions",
    )


_PATTERN_MATCH_ORACLE = """
    WITH ev AS (
      SELECT user_id, ts, event_id, event_type,
             epoch_us(ts) AS us
      FROM events
    ), marked AS (
      SELECT *, CASE WHEN us - lag(us) OVER w IS NULL
                       OR us - lag(us) OVER w > 1800000000
                     THEN 1 ELSE 0 END AS new_s
      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
      FROM marked
    ), sigs AS (
      SELECT user_id, sid,
             string_agg(left(event_type, 1), '' ORDER BY ts, event_id) AS sig
      FROM sess GROUP BY 1, 2
    ), tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN regexp_matches(sig, 'c[^e]*p') THEN 1 ELSE 0 END) AS BIGINT) AS f1,
             CAST(sum(CASE WHEN regexp_matches(sig, 'v.*p') THEN 1 ELSE 0 END) AS BIGINT) AS f2,
             CAST(sum(CASE WHEN regexp_matches(sig, '^s') THEN 1 ELSE 0 END) AS BIGINT) AS f3
      FROM sigs)
    SELECT 'click_to_purchase' AS pattern, f1 AS n_sessions, n AS n_total_sessions FROM tot
    UNION ALL
    SELECT 'view_to_purchase', f2, n FROM tot
    UNION ALL
    SELECT 'signup_start', f3, n FROM tot
"""


def events_growth_accounting_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily growth accounting — the canonical DAU decomposition every
    growth team reports: each active (user, day) is NEW (first-ever
    day), RETAINED (also active the previous day) or RESURRECTED
    (returning after a gap), and CHURNED(d) counts users active on d−1
    but not d. One distinct-presence agg, one lag/lead window pass per
    user, two small per-day aggs joined full-outer on the day spine —
    no presence×presence self-join. Days are integer epoch-days end to
    end; churn after the corpus's last observed day is censored (not
    emitted), the standard right-edge convention. 100 TB: shuffles on
    user then day — both natural keys."""
    ev = load_table(spark, sf_dir, "events")
    pres = (
        ev.select(
            "user_id",
            (F.floor(F.unix_timestamp(F.col("ts").cast("timestamp")) / 86400))
            .cast("long")
            .alias("day"),
        )
        .distinct()
    )
    wu = Window.partitionBy("user_id").orderBy("day")
    marked = pres.select(
        "user_id",
        "day",
        F.lag("day").over(wu).alias("_prev"),
        F.lead("day").over(wu).alias("_next"),
    )
    classes = marked.groupBy("day").agg(
        F.sum(F.col("_prev").isNull().cast("long")).alias("n_new"),
        F.sum((F.col("_prev") == F.col("day") - 1).cast("long")).alias("n_retained"),
        F.sum(
            (F.col("_prev").isNotNull() & (F.col("_prev") < F.col("day") - 1)).cast(
                "long"
            )
        ).alias("n_resurrected"),
    )
    max_day = pres.agg(F.max("day").alias("_maxd"))
    churn = (
        marked.where(F.col("_next").isNull() | (F.col("_next") > F.col("day") + 1))
        .select((F.col("day") + 1).alias("day"))
        .join(F.broadcast(max_day), F.col("day") <= F.col("_maxd"))
        .groupBy("day")
        .agg(F.count("*").alias("n_churned"))
    )
    return (
        classes.join(churn, "day", "full_outer")
        .select(
            "day",
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
            F.coalesce("n_retained", F.lit(0)).alias("n_retained"),
            F.coalesce("n_resurrected", F.lit(0)).alias("n_resurrected"),
            F.coalesce("n_churned", F.lit(0)).alias("n_churned"),
        )
        .orderBy("day")
    )


_GROWTH_ACCOUNTING_ORACLE = """
    WITH pres AS (
      SELECT DISTINCT user_id, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
      FROM events
    ), marked AS (
      SELECT user_id, day,
             lag(day) OVER w AS prev, lead(day) OVER w AS next
      FROM pres WINDOW w AS (PARTITION BY user_id ORDER BY day)
    ), classes AS (
      SELECT day,
             CAST(sum(CASE WHEN prev IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
             CAST(sum(CASE WHEN prev = day - 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
             CAST(sum(CASE WHEN prev IS NOT NULL AND prev < day - 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
      FROM marked GROUP BY 1
    ), churn AS (
      SELECT day + 1 AS day, CAST(count(*) AS BIGINT) AS n_churned
      FROM marked
      WHERE (next IS NULL OR next > day + 1)
        AND day + 1 <= (SELECT max(day) FROM pres)
      GROUP BY 1)
    SELECT coalesce(c.day, ch.day) AS day,
           coalesce(n_new, 0) AS n_new,
           coalesce(n_retained, 0) AS n_retained,
           coalesce(n_resurrected, 0) AS n_resurrected,
           coalesce(n_churned, 0) AS n_churned
    FROM classes c FULL OUTER JOIN churn ch ON c.day = ch.day
    ORDER BY 1
"""


def llm_source_diversity_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language source-diversity report for corpus mixing — the
    Gini–Simpson index (1 − Σpᵢ², the probability two random docs come
    from different sources) and the effective source count (1/Σpᵢ²,
    'how many equally-sized sources is this mix worth'). Entropy needs
    a log and is not bit-reproducible cross-engine; Gini–Simpson is the
    RATIONAL diversity index — div_num = n² − Σcᵢ² and div_den = n²
    are exact integers, the two doubles are single fixed divisions.
    Two tiny aggs (lang×source, then lang); at 100 TB both ride the
    natural keys and the final table is O(languages)."""
    docs = load_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("lang", "source").agg(F.count("*").alias("_c"))
    return (
        per_src.groupBy("lang")
        .agg(
            F.sum("_c").alias("_n"),
            F.count("*").alias("n_sources"),
            F.sum(F.col("_c") * F.col("_c")).alias("_sc2"),
        )
        .select(
            "lang",
            F.col("_n").alias("n_docs"),
            "n_sources",
            (F.col("_n") * F.col("_n") - F.col("_sc2")).alias("div_num"),
            (F.col("_n") * F.col("_n")).alias("div_den"),
            (
                (F.col("_n") * F.col("_n") - F.col("_sc2"))
                * 1.0
                / (F.col("_n") * F.col("_n"))
            ).alias("gini_simpson"),
            (F.col("_n") * F.col("_n") * 1.0 / F.col("_sc2")).alias(
                "effective_sources"
            ),
        )
        .orderBy("lang")
    )


_SOURCE_DIVERSITY_ORACLE = """
    WITH per_src AS (
      SELECT lang, source, CAST(count(*) AS BIGINT) AS c
      FROM documents GROUP BY 1, 2
    ), s AS (
      SELECT lang, sum(c) AS n, CAST(count(*) AS BIGINT) AS n_sources,
             sum(c * c) AS sc2
      FROM per_src GROUP BY 1)
    SELECT lang, CAST(n AS BIGINT) AS n_docs, n_sources,
           CAST(n * n - sc2 AS BIGINT) AS div_num,
           CAST(n * n AS BIGINT) AS div_den,
           CAST(n * n - sc2 AS DOUBLE) / (n * n) AS gini_simpson,
           CAST(n * n AS DOUBLE) / sc2 AS effective_sources
    FROM s ORDER BY 1
"""


PENDING: tuple[PendingQuery, ...] = (
    PendingQuery(
        "graph_hits_scores",
        graph_hits_scores_query,
        _HITS_ORACLE,
        tags=("graph", "hits", "centrality", "bipartite"),
    ),
    PendingQuery(
        "text_phrase_search",
        text_phrase_search_query,
        _PHRASE_SEARCH_ORACLE,
        tags=("text", "retrieval", "phrase", "positional"),
    ),
    PendingQuery(
        "events_marker_sessions",
        events_marker_sessions_query,
        _MARKER_SESSIONS_ORACLE,
        tags=("events", "session", "marker"),
    ),
    PendingQuery(
        "events_disorder_audit",
        events_disorder_audit_query,
        _DISORDER_ORACLE,
        tags=("events", "streaming-ops", "watermark", "audit"),
    ),
    PendingQuery(
        "agg_revenue_gini",
        agg_revenue_gini_query,
        _GINI_ORACLE,
        tags=("agg", "gini", "inequality", "integer-exact"),
    ),
    PendingQuery(
        "events_uniques_rollup",
        events_uniques_rollup_query,
        _UNIQUES_ROLLUP_ORACLE,
        tags=("agg", "grouping-sets", "distinct", "hierarchy"),
    ),
    PendingQuery(
        "text_collocation_lift",
        text_collocation_lift_query,
        _COLLOCATION_ORACLE,
        tags=("text", "collocation", "lift", "pmi"),
    ),
    PendingQuery(
        "join_returned_items",
        join_returned_items_query,
        _RETURNED_ITEMS_ORACLE,
        tags=("tpch", "q10", "join", "topk"),
    ),
    PendingQuery(
        "agg_priority_class",
        agg_priority_class_query,
        _PRIORITY_CLASS_ORACLE,
        tags=("tpch", "q12", "case-sum"),
    ),
    PendingQuery(
        "agg_promo_revenue_share",
        agg_promo_revenue_share_query,
        _PROMO_SHARE_ORACLE,
        tags=("tpch", "q14", "ratio"),
    ),
    PendingQuery(
        "join_top_supplier",
        join_top_supplier_query,
        _TOP_SUPPLIER_ORACLE,
        tags=("tpch", "q15", "max-subquery"),
    ),
    PendingQuery(
        "llm_bpe_pair_counts",
        llm_bpe_pair_counts_query,
        _BPE_PAIR_ORACLE,
        tags=("llmops", "bpe", "tokenizer", "pairs"),
    ),
    PendingQuery(
        "events_signup_to_purchase",
        events_signup_to_purchase_query,
        _SIGNUP_PURCHASE_ORACLE,
        tags=("events", "conversion", "activation", "lag"),
    ),
    PendingQuery(
        "agg_weighted_avg",
        agg_weighted_avg_query,
        _WEIGHTED_AVG_ORACLE,
        tags=("agg", "weighted-mean", "integer-exact"),
    ),
    PendingQuery(
        "events_slo_burn",
        events_slo_burn_query,
        _SLO_BURN_ORACLE,
        tags=("events", "sre", "slo", "alerting"),
    ),
    PendingQuery(
        "orders_backtest_mape",
        orders_backtest_mape_query,
        _BACKTEST_MAPE_ORACLE,
        tags=("analytics", "forecast", "backtest", "mape"),
    ),
    PendingQuery(
        "text_rake_keywords",
        text_rake_keywords_query,
        _RAKE_ORACLE,
        tags=("text", "keywords", "rake"),
    ),
    PendingQuery(
        "events_audience_overlap",
        events_audience_overlap_query,
        _AUDIENCE_OVERLAP_ORACLE,
        tags=("events", "jaccard", "segments", "overlap"),
    ),
    PendingQuery(
        "llm_dataset_card",
        llm_dataset_card_query,
        _DATASET_CARD_ORACLE,
        tags=("llmops", "datasheet", "summary"),
    ),
    PendingQuery(
        "agg_supplier_hhi",
        agg_supplier_hhi_query,
        _SUPPLIER_HHI_ORACLE,
        tags=("agg", "hhi", "concentration", "integer-exact"),
    ),
    PendingQuery(
        "events_rate_limit",
        events_rate_limit_query,
        _RATE_LIMIT_ORACLE,
        tags=("events", "fold", "rate-limit", "token-bucket"),
    ),
    PendingQuery(
        "orders_auc_urgency",
        orders_auc_urgency_query,
        _AUC_ORACLE,
        tags=("agg", "auc", "mann-whitney", "integer-exact"),
    ),
    PendingQuery(
        "text_heaps_law",
        text_heaps_law_query,
        _HEAPS_ORACLE,
        tags=("text", "vocabulary", "heaps", "scaling"),
    ),
    PendingQuery(
        "orders_trend_ols",
        orders_trend_ols_query,
        _TREND_OLS_ORACLE,
        tags=("agg", "ols", "regression", "integer-exact"),
    ),
    PendingQuery(
        "window_moving_median",
        window_moving_median_query,
        _MOVING_MEDIAN_ORACLE,
        tags=("window", "median", "order-statistics"),
    ),
    PendingQuery(
        "events_pattern_match",
        events_pattern_match_query,
        _PATTERN_MATCH_ORACLE,
        tags=("events", "match-recognize", "regex", "sessions"),
    ),
    PendingQuery(
        "events_growth_accounting",
        events_growth_accounting_query,
        _GROWTH_ACCOUNTING_ORACLE,
        tags=("events", "growth", "churn", "retention"),
    ),
    PendingQuery(
        "llm_source_diversity",
        llm_source_diversity_query,
        _SOURCE_DIVERSITY_ORACLE,
        tags=("llmops", "diversity", "gini-simpson", "integer-exact"),
    ),
)
