"""Round-13 declared-query staging area (the established pattern:
built and oracle-verified NOW, deliberately NOT ``declare``d — the
round-5 evidence window is full at 50; activation is registration-only
after ``tools/snapshot_evidence.py`` refreshes).

Each entry: exact-oracle query + DuckDB SQL, exercised by
``tests/test_roundthirteen_pending.py`` with the driver-shaped
comparison.

Wave theme: the remaining *statistics* gaps (nonparametric testing,
rank correlation) plus two surface-parity rows (null-safe equi join,
quartile migration). Everything here follows the house exactness
rules: integer arithmetic wherever a sum's order could matter, 4dp
rounding only on a terminal single division of exact inputs, unique-key
tiebreaks on every rank edge.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.io import load_table
from spotify_data_pipeline_spark.plans.parity import rnd, rnd_cents, rnd_cents_sql, rnd_sql


def events_ab_mannwhitney_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U — the NONPARAMETRIC member of the A/B family
    (events_ab_welch tests means and assumes roughly-normal cells;
    rank tests stay valid under the heavy-tailed value distributions
    real product metrics have). Users split into variants by id parity
    (the deterministic hash-bucketing device shared with
    events_ab_welch/events_ab_srm); per event type, BOTH variants'
    values are ranked together with AVERAGE ranks on ties, and
    U_a = R_a − n_a(n_a+1)/2.

    Exactness: tie-averaged ranks are half-integers, so everything is
    carried as 2× the textbook quantity — r2 = 2·rank is
    2·min_rank + (tie_size − 1) via rank() + a per-(type,value) count
    window, both BIGINT; the driver-compared outputs are the integer
    columns r2sum_a and u2_a (= 2·U_a), plus the exact integer
    cross-check identity column u2_sum = 2·n_a·n_b (U_a + U_b sums to
    n_a·n_b regardless of ties — emitting it driver-pins the tie
    handling on both engines).

    Scale shape: one scan → one rank window partitioned by event_type →
    one hash agg; no joins, nothing corpus-sized broadcast. Honest
    100 TB caveat: event_type is low-cardinality, so each rank
    partition is huge — exact global ranking at that scale goes through
    the two-phase offset ranking in ``operators/batching.py`` (count
    per range-partition, broadcast prefix offsets, rank locally); this
    declared form keeps the driver-provable single-window shape and
    names the swap.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "value", (F.col("user_id") % 2 == 0).cast("int").alias("_a")
    )
    w_rank = Window.partitionBy("event_type").orderBy("value")
    w_tie = Window.partitionBy("event_type", "value")
    ranked = ev.select(
        "event_type",
        "_a",
        (2 * F.rank().over(w_rank) + F.count(F.lit(1)).over(w_tie) - 1)
        .cast("long")
        .alias("_r2"),
    )
    agg = ranked.groupBy("event_type").agg(
        F.sum("_a").cast("long").alias("n_a"),
        F.sum(1 - F.col("_a")).cast("long").alias("n_b"),
        F.sum(F.col("_a") * F.col("_r2")).cast("long").alias("r2sum_a"),
    )
    return agg.select(
        "event_type",
        "n_a",
        "n_b",
        "r2sum_a",
        (F.col("r2sum_a") - F.col("n_a") * (F.col("n_a") + 1)).alias("u2_a"),
        (2 * F.col("n_a") * F.col("n_b")).alias("u2_sum"),
    ).orderBy("event_type")


_MANNWHITNEY_ORACLE = """
    WITH ranked AS (
      SELECT event_type,
             CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS a,
             2 * rank() OVER (PARTITION BY event_type ORDER BY value)
               + count(*) OVER (PARTITION BY event_type, value) - 1 AS r2
      FROM events
    )
    SELECT event_type,
           CAST(sum(a) AS BIGINT)                        AS n_a,
           CAST(sum(1 - a) AS BIGINT)                    AS n_b,
           CAST(sum(a * r2) AS BIGINT)                   AS r2sum_a,
           CAST(sum(a * r2) - sum(a) * (sum(a) + 1) AS BIGINT)  AS u2_a,
           CAST(2 * sum(a) * sum(1 - a) AS BIGINT)       AS u2_sum
    FROM ranked
    GROUP BY event_type
    ORDER BY event_type
"""


def agg_spearman_corr_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between a customer's account balance
    and their realized total spend, per market segment — the RANK
    member of the correlation family (agg_correlation_stats is
    Pearson): monotone-association strength that is immune to the
    heavy right tail of spend.

    Determinism: both rank permutations are row_number() with the
    unique c_custkey tiebreak (the house rule for every rank edge), so
    the permutation — and therefore sum_d2 — is identical on both
    engines even where balances tie; with unique ranks the classic
    rho = 1 − 6·Σd²/(n(n²−1)) closed form is exact. Spend is summed in
    integer cents before ranking (order-independent), and rho's single
    terminal division of two exact BIGINTs is the only float, rounded
    4dp on both sides.

    Scale shape: orders pre-aggregates per customer (one shuffle on
    o_custkey), joins customer once on the same key, then two
    row_number windows per segment and one hash agg — no broadcast of
    anything customer-sized, no self-join.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    spend = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(rnd_cents("o_totalprice")).alias("_cents"))
    )
    j = cust.join(spend, cust["c_custkey"] == spend["o_custkey"], "inner")
    w_bal = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    w_spend = Window.partitionBy("c_mktsegment").orderBy("_cents", "c_custkey")
    ranked = j.select(
        "c_mktsegment",
        F.row_number().over(w_bal).cast("long").alias("_rb"),
        F.row_number().over(w_spend).cast("long").alias("_rs"),
    )
    d2 = (F.col("_rb") - F.col("_rs")) * (F.col("_rb") - F.col("_rs"))
    agg = ranked.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(d2).cast("long").alias("sum_d2"),
    )
    denom = F.col("n") * (F.col("n") * F.col("n") - 1)
    return agg.select(
        "c_mktsegment",
        "n",
        "sum_d2",
        rnd(F.lit(1.0) - (6.0 * F.col("sum_d2")) / denom, 4).alias("rho"),
    ).orderBy("c_mktsegment")


rho_expr_spearman = (
    "1.0 - (6.0 * sum((rb - rs) * (rb - rs)))"
    " / (count(*) * (count(*) * count(*) - 1))"
)

_SPEARMAN_ORACLE = f"""
    WITH spend AS (
      SELECT o_custkey, SUM({rnd_cents_sql('o_totalprice')}) AS cents
      FROM orders GROUP BY 1
    ), ranked AS (
      SELECT c.c_mktsegment,
             row_number() OVER (PARTITION BY c.c_mktsegment
                                ORDER BY c.c_acctbal, c.c_custkey) AS rb,
             row_number() OVER (PARTITION BY c.c_mktsegment
                                ORDER BY s.cents, c.c_custkey)     AS rs
      FROM customer c JOIN spend s ON c.c_custkey = s.o_custkey
    )
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT)              AS n,
           CAST(sum((rb - rs) * (rb - rs)) AS BIGINT) AS sum_d2,
           {rnd_sql(rho_expr_spearman, 4)} AS rho
    FROM ranked
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
"""


def join_null_safe_equi_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi join (`<=>` / IS NOT DISTINCT FROM) — the join
    surface's NULL-semantics row (fn_null_semantics pins the SCALAR
    operators; this pins the JOIN operator, where a plain `=` silently
    drops every NULL-keyed row instead of matching NULL to NULL).

    The key is genuinely nullable on both sides: orders outside the
    priority whitelist get a NULL class (nullif-style CASE), and the
    dim side carries an explicit NULL row. The declared output counts
    orders and revenue per matched dim label, so the NULL⋈NULL match
    arm contributes a visible row — an equality join would silently
    produce one fewer group, which is exactly the bug class this pins.

    Scale shape: Spark plans `<=>` as a hash-joinable equality
    (EqualNullSafe is a join key, not a filter), and the 4-row dim
    broadcasts; the fact side scans once. Money in exact cents.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
            F.col("o_orderpriority"),
        ).alias("prio_class"),
        rnd_cents("o_totalprice").alias("_cents"),
    )
    dim = spark.createDataFrame(
        [("1-URGENT", "fast-lane"), ("2-HIGH", "fast-lane"), (None, "standard")],
        "prio_key string, lane string",
    )
    j = orders.join(
        F.broadcast(dim), orders["prio_class"].eqNullSafe(dim["prio_key"]), "inner"
    )
    return (
        j.groupBy("lane", "prio_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("_cents").alias("revenue_cents"),
        )
        .orderBy("lane", "prio_class")
    )


_NULL_SAFE_JOIN_ORACLE = f"""
    WITH o AS (
      SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN o_orderpriority END AS prio_class,
             {rnd_cents_sql('o_totalprice')} AS cents
      FROM orders
    ), dim(prio_key, lane) AS (
      VALUES ('1-URGENT', 'fast-lane'), ('2-HIGH', 'fast-lane'),
             (NULL, 'standard')
    )
    SELECT d.lane, o.prio_class,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(o.cents) AS BIGINT) AS revenue_cents
    FROM o JOIN dim d ON o.prio_class IS NOT DISTINCT FROM d.prio_key
    GROUP BY d.lane, o.prio_class
    ORDER BY d.lane, o.prio_class
"""


def orders_quartile_migration_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-value quartile migration — the BI classic behind every
    'customer movement' dashboard: spend quartile in 1996 vs spend
    quartile in 1997, transition counts for customers active in both
    years plus explicit churn-in/churn-out rows (quartile 0 = absent
    that year), so the matrix accounts for every active customer.

    Exactness: yearly spend in integer cents; ntile(4) over the
    (cents, custkey) order — the unique-key tiebreak makes each ntile
    edge deterministic, so the transition COUNTS are exact integers on
    both engines. FULL OUTER join between the two years keys on the
    customer — at scale both sides pre-aggregate (shuffle on custkey)
    before the join, so the matrix costs two hash aggs + one
    equi-join, never a fact-×-fact pass.

    Scale note on the rank windows: quartiles are per MARKET SEGMENT
    (also the analytically right grain — segments have different spend
    scales), so the ntile windows parallelize across segments instead
    of funnelling the whole customer base into one partition; for a
    genuinely global quartile at 100 TB the two-phase offset ranking
    in ``operators/batching.py`` is the scale path.
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.year("o_orderdate").alias("_yr"),
        rnd_cents("o_totalprice").alias("_cents"),
    )

    def year_quartile(yr: int) -> DataFrame:
        spend = (
            orders.where(F.col("_yr") == yr)
            .groupBy("o_custkey")
            .agg(F.sum("_cents").alias("_spend"))
            .join(cust, F.col("o_custkey") == cust["c_custkey"], "inner")
        )
        w = Window.partitionBy("c_mktsegment").orderBy("_spend", "o_custkey")
        return spend.select(
            "o_custkey",
            F.col("c_mktsegment").alias(f"seg{yr}"),
            F.ntile(4).over(w).cast("long").alias(f"q{yr}"),
        )

    a, b = year_quartile(1996), year_quartile(1997)
    j = a.join(b, "o_custkey", "full_outer")
    return (
        j.select(
            F.coalesce("seg1996", "seg1997").alias("segment"),
            F.coalesce("q1996", F.lit(0)).alias("q_from"),
            F.coalesce("q1997", F.lit(0)).alias("q_to"),
        )
        .groupBy("segment", "q_from", "q_to")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
        .orderBy("segment", "q_from", "q_to")
    )


_QUARTILE_MIGRATION_ORACLE = f"""
    WITH yr AS (
      SELECT o.o_custkey, c.c_mktsegment, EXTRACT(year FROM o.o_orderdate) AS y,
             SUM({rnd_cents_sql('o.o_totalprice')}) AS spend
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE EXTRACT(year FROM o.o_orderdate) IN (1996, 1997)
      GROUP BY 1, 2, 3
    ), a AS (
      SELECT o_custkey, c_mktsegment,
             ntile(4) OVER (PARTITION BY c_mktsegment
                            ORDER BY spend, o_custkey) AS q
      FROM yr WHERE y = 1996
    ), b AS (
      SELECT o_custkey, c_mktsegment,
             ntile(4) OVER (PARTITION BY c_mktsegment
                            ORDER BY spend, o_custkey) AS q
      FROM yr WHERE y = 1997
    )
    SELECT COALESCE(a.c_mktsegment, b.c_mktsegment) AS segment,
           CAST(COALESCE(a.q, 0) AS BIGINT) AS q_from,
           CAST(COALESCE(b.q, 0) AS BIGINT) AS q_to,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
"""



def events_kendall_tau_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-a between daily event VOLUME and daily event VALUE
    per event type — the third correlation member (Pearson =
    agg_correlation_stats, Spearman = agg_spearman_corr): concordance
    of two time series, robust to any monotone rescaling of either.

    Exactness: the series points are (day, n BIGINT, cents BIGINT);
    a pair is concordant when (n_i−n_j)·(c_i−c_j) > 0, discordant
    when < 0 — pure integer sign tests, tie pairs counted explicitly
    so C + D + ties = n(n−1)/2 is an emitted identity. tau_a =
    (C−D)/(n(n−1)/2) is one terminal division rounded half-up 4dp.

    Scale shape: the pair join runs over the AGGREGATED daily series
    (calendar-bounded: ≤31 rows per event type at any corpus size),
    never over raw events — the bounded-aggregate self-join pattern
    shared with the basket/co-occurrence family. The raw scan
    aggregates once (map-side combinable) and everything after is
    O(types · days²) driver-negligible work.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(rnd_cents("value")).alias("cents"),
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.day") < F.col("b.day")),
    )
    prod = (F.col("a.n") - F.col("b.n")) * (F.col("a.cents") - F.col("b.cents"))
    agg = pairs.groupBy(F.col("a.event_type").alias("event_type")).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum((prod > 0).cast("long")).alias("concordant"),
        F.sum((prod < 0).cast("long")).alias("discordant"),
        F.sum((prod == 0).cast("long")).alias("tie_pairs"),
    )
    return agg.select(
        "event_type",
        "n_pairs",
        "concordant",
        "discordant",
        "tie_pairs",
        rnd(
            (F.col("concordant") - F.col("discordant"))
            / F.col("n_pairs").cast("double"),
            4,
        ).alias("tau_a"),
    ).orderBy("event_type")


_KENDALL_ORACLE = f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n,
             SUM({rnd_cents_sql('value')}) AS cents
      FROM events GROUP BY 1, 2
    ), pairs AS (
      SELECT a.event_type,
             (a.n - b.n) * (a.cents - b.cents) AS prod
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.day < b.day
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(CASE WHEN prod > 0 THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
           CAST(sum(CASE WHEN prod < 0 THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
           CAST(sum(CASE WHEN prod = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tie_pairs,
           {rnd_sql('(sum(CASE WHEN prod > 0 THEN 1 ELSE 0 END)'
                    ' - sum(CASE WHEN prod < 0 THEN 1 ELSE 0 END))'
                    ' / CAST(count(*) AS DOUBLE)', 4)} AS tau_a
    FROM pairs
    GROUP BY event_type
    ORDER BY event_type
"""


def agg_trimmed_mean_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric 5-each-side trimmed mean of order value per market
    segment — the robust-location member completing the robust-stats
    family (agg_mad_robust = dispersion, llm_winsorize_stats = clipping,
    events_outlier_tukey = flagging): drop the k most extreme rows on
    EACH side, then average what remains, so a single corrupted price
    cannot move the segment statistic.

    Exactness: money in integer cents; the two row_number windows use
    the unique o_orderkey tiebreak so the dropped row SET is
    deterministic; the kept-rows sum is an exact BIGINT and the mean is
    one terminal division rounded half-up 4dp.

    Scale shape: one orders⋈customer equi join (both shuffle once on
    custkey), two rank windows per segment, one hash agg. For a global
    (unsegmented) trim at 100 TB the rank windows swap to the two-phase
    offset ranking in ``operators/batching.py``, same as the quartile
    note.
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", rnd_cents("o_totalprice").alias("_cents")
    )
    j = orders.join(cust, orders["o_custkey"] == cust["c_custkey"], "inner")
    w_asc = Window.partitionBy("c_mktsegment").orderBy("_cents", "o_orderkey")
    w_desc = Window.partitionBy("c_mktsegment").orderBy(
        F.col("_cents").desc(), F.col("o_orderkey").desc()
    )
    ranked = j.select(
        "c_mktsegment",
        "_cents",
        F.row_number().over(w_asc).alias("_lo"),
        F.row_number().over(w_desc).alias("_hi"),
    )
    kept = ranked.where((F.col("_lo") > 5) & (F.col("_hi") > 5))
    agg = kept.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.sum("_cents").cast("long").alias("sum_cents"),
    )
    return agg.select(
        "c_mktsegment",
        "n_kept",
        "sum_cents",
        rnd(F.col("sum_cents") / (100.0 * F.col("n_kept")), 4).alias("trimmed_mean"),
    ).orderBy("c_mktsegment")


_TRIMMED_MEAN_ORACLE = f"""
    WITH j AS (
      SELECT c.c_mktsegment, o.o_orderkey,
             {rnd_cents_sql('o.o_totalprice')} AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), ranked AS (
      SELECT c_mktsegment, cents,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY cents, o_orderkey) AS lo,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY cents DESC, o_orderkey DESC) AS hi
      FROM j
    ), kept AS (
      SELECT c_mktsegment, cents FROM ranked WHERE lo > 5 AND hi > 5
    )
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(cents) AS BIGINT) AS sum_cents,
           {rnd_sql('sum(cents) / (100.0 * count(*))', 4)} AS trimmed_mean
    FROM kept
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
"""


def ml_knn_confusion_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-NN classification quality as a confusion matrix — the
    model-EVALUATION member of the ML family (ml_knn_label predicts;
    this measures): for every 20th vector, predict its label from its
    nearest neighbor under int8-quantized cosine
    (operators/quantization.py, the driver-proven exact arithmetic from
    sim_quantized_topk) and cross-tabulate true vs predicted.

    Exactness: quantization is floor-half-up, dots are exact integers,
    the 4dp-rounded qcos ordering ties break on neighbor_id — the
    selected neighbor is deterministic on both engines, so the
    confusion COUNTS are exact integers.

    Scale shape: the query subset broadcasts over one corpus scan (the
    corpus never shuffles — brute exact serving is the documented
    oracle anchor; the scale path is the IVF/LSH serving family);
    the label attach is one broadcast join on neighbor_id against the
    (id,label) projection.
    """
    from spotify_data_pipeline_spark.operators.quantization import (
        cosine_topk_quantized,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 20 == 0)
    nn = cosine_topk_quantized(queries, emb, k=1)
    labels = emb.select("vec_id", F.col("label").cast("long").alias("_lbl"))
    true_l = labels.select(
        F.col("vec_id").alias("query_id"), F.col("_lbl").alias("true_label")
    )
    pred_l = labels.select(
        F.col("vec_id").alias("neighbor_id"), F.col("_lbl").alias("pred_label")
    )
    j = nn.join(F.broadcast(true_l), "query_id").join(
        F.broadcast(pred_l), "neighbor_id"
    )
    return (
        j.groupBy("true_label", "pred_label")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("true_label", "pred_label")
    )


_QCOS13 = (
    "(list_dot_product(a.q, b.q)"
    " / (sqrt(list_dot_product(a.q, a.q)) * sqrt(list_dot_product(b.q, b.q))))"
)

_KNN_CONFUSION_ORACLE = f"""
    WITH z AS (
      SELECT vec_id, label, embedding,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS m
      FROM embeddings
    ), qz AS (
      SELECT vec_id, label,
             CASE WHEN m = 0
                  THEN list_transform(embedding, x -> CAST(0 AS DOUBLE))
                  ELSE list_transform(embedding, x -> CAST(least(greatest(
                         floor(CAST(x AS DOUBLE) * 127 / m + 0.5),
                         -127.0), 127.0) AS DOUBLE))
             END AS q
      FROM z
    ), nn AS (
      SELECT query_id, neighbor_id FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY floor({_QCOS13} * 10000 + 0.5) / 10000 DESC, b.vec_id ASC
               ) AS rn
        FROM qz a JOIN qz b ON a.vec_id <> b.vec_id
        WHERE a.vec_id % 20 = 0
      ) WHERE rn = 1
    )
    SELECT CAST(t.label AS BIGINT) AS true_label,
           CAST(p.label AS BIGINT) AS pred_label,
           CAST(count(*) AS BIGINT) AS n
    FROM nn
    JOIN embeddings t ON nn.query_id = t.vec_id
    JOIN embeddings p ON nn.neighbor_id = p.vec_id
    GROUP BY 1, 2
    ORDER BY 1, 2
"""


@dataclass(frozen=True)
class PendingQuery:
    name: str
    fn: object
    oracle: str | None
    headline: bool = False
    tags: tuple[str, ...] = ()


PENDING: tuple[PendingQuery, ...] = (
    PendingQuery(
        "events_ab_mannwhitney",
        events_ab_mannwhitney_query,
        _MANNWHITNEY_ORACLE,
        tags=("events", "abtest", "statistics", "nonparametric", "rank"),
    ),
    PendingQuery(
        "agg_spearman_corr",
        agg_spearman_corr_query,
        _SPEARMAN_ORACLE,
        tags=("agg", "statistics", "correlation", "rank"),
    ),
    PendingQuery(
        "join_null_safe_equi",
        join_null_safe_equi_query,
        _NULL_SAFE_JOIN_ORACLE,
        tags=("join", "null-safe", "semantics"),
    ),
    PendingQuery(
        "orders_quartile_migration",
        orders_quartile_migration_query,
        _QUARTILE_MIGRATION_ORACLE,
        tags=("orders", "analytics", "cohort", "ntile"),
    ),
    PendingQuery(
        "events_kendall_tau",
        events_kendall_tau_query,
        _KENDALL_ORACLE,
        tags=("events", "statistics", "correlation", "timeseries"),
    ),
    PendingQuery(
        "agg_trimmed_mean",
        agg_trimmed_mean_query,
        _TRIMMED_MEAN_ORACLE,
        tags=("agg", "statistics", "robust"),
    ),
    PendingQuery(
        "ml_knn_confusion",
        ml_knn_confusion_query,
        _KNN_CONFUSION_ORACLE,
        tags=("ml", "evaluation", "knn", "similarity"),
    ),
)
