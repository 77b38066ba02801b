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
    handling on both engines). The rank-sum accumulator runs in
    DECIMAL(38,0) on Spark (matching DuckDB's HUGEINT sum — Spark's
    long sum would wrap silently); the declared BIGINT output columns
    bound the domain at ~3·10⁹ rows per event_type, since r2sum is
    Θ(n²) — past that the statistic itself needs a wider declared
    type, not different arithmetic.

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
        # DECIMAL accumulator (ADVICE r05 int64-headroom note): Spark's
        # sum(long) wraps silently while DuckDB's sum(BIGINT) promotes
        # to HUGEINT — accumulate exactly, bound only at the final
        # BIGINT output cast (domain limit ~3e9 rows per event_type,
        # stated in the docstring).
        F.sum((F.col("_a") * F.col("_r2")).cast("decimal(38,0)"))
        .cast("long")
        .alias("r2sum_a"),
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



def events_rapid_repeat_screen_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rapid-repeat transaction screen — the payments-audit classic
    (duplicate-submission / double-charge detection): pairs of
    purchases by the SAME user within 180 minutes whose amounts differ
    by at most $20. This is proximity matching on TWO numeric axes at
    once (time AND amount) — a different capability from exact dedup
    (equality) and text near-dup (set similarity).

    Scale shape: the naive form is a per-user all-pairs theta join —
    quadratic in per-user history length at 100 TB. Here each left
    event explodes to its 3-hour time bin and both neighbors
    (bin−1, bin, bin+1), the join runs on the (user, bin) EQUI key,
    and the exact |Δts| ≤ 180 min / |Δcents| ≤ 2000 predicates filter
    after — any qualifying pair's bins differ by ≤ 1, so it is found
    exactly ONCE (no post-dedup), and no BNLJ appears (plan-asserted;
    the events_window_count / operators/rangejoin.py device). The
    DuckDB oracle is the NAIVE theta join, so the hash match IS the
    binned ≡ naive equivalence proof at driver level.

    Note the deliberately tuned thresholds: $20/180 min produce
    non-vacuous pair sets at every test SF (1 / 32 / 354 — measured
    before design, the vacuousness lesson applied).
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "event_id",
            "ts",
            rnd_cents("value").alias("_c"),
            F.unix_micros("ts").alias("_us"),
            (F.unix_micros("ts") / F.lit(10800 * 1000000)).cast("long").alias("_bin"),
        )
    )
    left = ev.select(
        F.col("user_id").alias("u"),
        F.col("event_id").alias("id_a"),
        F.col("_us").alias("us_a"),
        F.col("_c").alias("c_a"),
        F.explode(
            F.array(F.col("_bin") - 1, F.col("_bin"), F.col("_bin") + 1)
        ).alias("_jb"),
    )
    right = ev.select(
        F.col("user_id").alias("u2"),
        F.col("event_id").alias("id_b"),
        F.col("_us").alias("us_b"),
        F.col("_c").alias("c_b"),
        F.col("_bin").alias("_jb2"),
    )
    pairs = left.join(
        right, (F.col("u") == F.col("u2")) & (F.col("_jb") == F.col("_jb2"))
    ).where(
        (F.col("id_a") < F.col("id_b"))
        & (F.col("us_a") != F.col("us_b"))
        & (F.abs(F.col("us_a") - F.col("us_b")) <= 180 * 60 * 1000000)
        & (F.abs(F.col("c_a") - F.col("c_b")) <= 2000)
    )
    return pairs.select(
        F.col("u").alias("user_id"),
        "id_a",
        "id_b",
        F.abs(F.col("c_a") - F.col("c_b")).alias("cents_apart"),
        (F.abs(F.col("us_a") - F.col("us_b")) / F.lit(60 * 1000000))
        .cast("long")
        .alias("minutes_apart"),
    ).orderBy("user_id", "id_a", "id_b")


_RAPID_REPEAT_ORACLE = f"""
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS us, {rnd_cents_sql('value')} AS c
      FROM events WHERE event_type = 'purchase'
    )
    SELECT a.user_id,
           a.event_id AS id_a, b.event_id AS id_b,
           abs(a.c - b.c) AS cents_apart,
           CAST(abs(a.us - b.us) // 60000000 AS BIGINT) AS minutes_apart
    FROM e a JOIN e b
      ON a.user_id = b.user_id AND a.event_id < b.event_id
     AND a.us <> b.us
     AND abs(a.us - b.us) <= CAST(180 AS BIGINT) * 60 * 1000000
     AND abs(a.c - b.c) <= 2000
    ORDER BY a.user_id, id_a, id_b
"""


def dq_freshness_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-freshness report — the operational check next to the
    validity checks (data_quality_report) and the reconciliation
    checks (dq_order_reconciliation): per event type, how far behind
    the corpus high-water mark is this slice's newest record, and how
    much of its volume arrived in the trailing day?

    Exactness: all lag arithmetic in integer epoch seconds (one
    terminal DIV to whole minutes); trailing-day share in exact ppm
    via integer cross-multiplication ((1440-min window chosen against
    the 30-day span so both branches are exercised at every SF)).

    Scale shape: ONE scan feeds a per-type hash agg; the 1-row
    high-water-mark aggregate broadcasts back over the ≤|types| result
    (the bounded-broadcast pattern, pre-whitelisted) — nothing
    corpus-sized moves twice.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.unix_micros("ts").alias("_ep")
    )
    anchor = ev.agg(F.max("_ep").alias("_hwm"))
    per_type = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.max("_ep").alias("_newest"),
    )
    trailing = (
        ev.join(
            F.broadcast(anchor),
            F.col("_ep") > F.col("_hwm") - F.lit(86400 * 1000000),
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("_n_day"))
    )
    out = (
        per_type.crossJoin(F.broadcast(anchor))
        .join(trailing, "event_type", "left")
        .select(
            "event_type",
            "n_rows",
            ((F.col("_hwm") - F.col("_newest")) / F.lit(60 * 1000000))
            .cast("long")
            .alias("staleness_min"),
            F.coalesce("_n_day", F.lit(0)).alias("n_trailing_day"),
            (
                F.coalesce("_n_day", F.lit(0)) * 1000000 / F.col("n_rows")
            ).cast("long").alias("trailing_share_ppm"),
        )
    )
    return out.orderBy("event_type")


_FRESHNESS_ORACLE = """
    WITH hwm AS (SELECT max(epoch_us(ts)) AS h FROM events),
    per_type AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
             max(epoch_us(ts)) AS newest
      FROM events GROUP BY 1
    ), trail AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_day
      FROM events, hwm WHERE epoch_us(ts) > h - 86400000000 GROUP BY 1
    )
    SELECT p.event_type, p.n_rows,
           CAST((h - p.newest) // 60000000 AS BIGINT) AS staleness_min,
           CAST(coalesce(t.n_day, 0) AS BIGINT) AS n_trailing_day,
           CAST(coalesce(t.n_day, 0) * 1000000 // p.n_rows AS BIGINT)
             AS trailing_share_ppm
    FROM per_type p CROSS JOIN hwm LEFT JOIN trail t USING (event_type)
    ORDER BY p.event_type
"""


def events_ratio_delta_ci_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-metric inference by the delta method — the
    experimentation-stats member that fixes the standard A/B mistake:
    "revenue per event" is a RATIO of sums whose denominator is
    random, and treating per-event values as i.i.d. understates the
    variance because events cluster within users. The unit of analysis
    here is the USER: X_u = user's value sum (cents), Y_u = user's
    event count; R = ΣX/ΣY is the ratio-of-sums estimator and its
    linearization variance is Var(R) = n/(n−1) · (ΣX² − 2RΣXY + R²ΣY²)
    / (ΣY)² — every moment an exact BIGINT, so the float work is one
    composite expression over five exact integers, identical on both
    engines (the welch_t precedent, which already crosses sqrt).

    Scale shape: per-user rollup (one shuffle on user_id) then a
    per-type hash agg of five moments — the same two-stage shape as
    the cluster bootstrap (events_bootstrap_user_mean) WITHOUT the ×B
    replicate fan-out: the closed form is the cheap deterministic twin
    the bootstrap validates against.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id", rnd_cents("value").alias("_c")
    )
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.sum("_c").alias("_x"), F.count(F.lit(1)).cast("long").alias("_y")
    )
    m = per_user.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("_x").cast("long").alias("_sx"),
        F.sum("_y").cast("long").alias("_sy"),
        F.sum(F.col("_x") * F.col("_x")).cast("long").alias("_sxx"),
        F.sum(F.col("_x") * F.col("_y")).cast("long").alias("_sxy"),
        F.sum(F.col("_y") * F.col("_y")).cast("long").alias("_syy"),
    )
    r = F.col("_sx") / F.col("_sy")
    var = (
        (F.col("n_users") / (F.col("n_users") - 1))
        * (F.col("_sxx") - 2 * r * F.col("_sxy") + r * r * F.col("_syy"))
        / (F.col("_sy") * F.col("_sy"))
    )
    return m.select(
        "event_type",
        "n_users",
        "_sx",
        "_sy",
        rnd(r / 100.0, 4).alias("ratio_dollars"),
        rnd(F.sqrt(var) / 100.0, 4).alias("se_dollars"),
    ).withColumnRenamed("_sx", "sum_cents").withColumnRenamed(
        "_sy", "n_events"
    ).orderBy("event_type")


_RATIO_DELTA_ORACLE = f"""
    WITH per_user AS (
      SELECT event_type, user_id,
             SUM({rnd_cents_sql('value')}) AS x,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ), m AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM per_user GROUP BY 1
    )
    SELECT event_type, n_users,
           sx AS sum_cents, sy AS n_events,
           {rnd_sql('(sx / sy) / 100.0', 4)} AS ratio_dollars,
           {rnd_sql('sqrt((n_users / (n_users - 1.0)) * (sxx - 2 * (sx / sy) * sxy + (sx / sy) * (sx / sy) * syy) / (sy * sy)) / 100.0', 4)} AS se_dollars
    FROM m
    ORDER BY event_type
"""



def llm_langid_agreement_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-metadata audit — the labeled-data DQ composition: the
    corpus carries a DECLARED ``lang`` column, the engine carries a
    heuristic language-ID classifier (operators/textops.language_id,
    the curation-pipeline gate); this query cross-tabulates the two
    into an agreement matrix with per-declared-language accuracy in
    exact ppm. In a real ingest this is the check that catches both
    bad metadata (declared ≠ content) and classifier drift — the
    confusion-matrix device from ml_knn_confusion applied to the text
    modality.

    Exactness: the classifier is a pure expression tree whose SQL twin
    (language_id_sql) is generated from the SAME stopword profiles, so
    agreement counts are exact integers; accuracy is one integer
    cross-multiplication (no division until the ppm scale).

    Scale shape: map-only classification (one scan, no shuffle) into a
    |langs|² hash agg; the accuracy join is vs a |langs|-row aggregate.
    """
    from spotify_data_pipeline_spark.functions.text import is_nonblank
    from spotify_data_pipeline_spark.operators.textops import language_id

    docs = load_table(spark, sf_dir, "documents").where(
        is_nonblank(F.col("text"))
    )
    pred = language_id(docs).select("lang", "pred_lang")
    cells = pred.groupBy("lang", "pred_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    per_lang = cells.groupBy("lang").agg(
        F.sum("n").alias("_tot"),
        F.sum(F.when(F.col("lang") == F.col("pred_lang"), F.col("n"))).alias(
            "_agree"
        ),
    )
    return (
        cells.join(per_lang, "lang")
        .select(
            "lang",
            "pred_lang",
            "n",
            (F.coalesce("_agree", F.lit(0)) * 1000000 / F.col("_tot"))
            .cast("long")
            .alias("lang_accuracy_ppm"),
        )
        .orderBy("lang", "pred_lang")
    )


def _langid_agreement_oracle() -> str:
    from spotify_data_pipeline_spark.operators.textops import language_id_sql

    return r"""
    WITH t AS (
      SELECT lang,
             string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
      FROM documents WHERE length(trim(text)) > 0
    ), pred AS (
      SELECT lang, __LANGID__ AS pred_lang FROM t
    ), cells AS (
      SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n
      FROM pred GROUP BY 1, 2
    ), per_lang AS (
      SELECT lang, sum(n) AS tot,
             coalesce(sum(CASE WHEN lang = pred_lang THEN n END), 0) AS agree
      FROM cells GROUP BY 1
    )
    SELECT c.lang, c.pred_lang, c.n,
           CAST(p.agree * 1000000 // p.tot AS BIGINT) AS lang_accuracy_ppm
    FROM cells c JOIN per_lang p USING (lang)
    ORDER BY c.lang, c.pred_lang
    """.replace("__LANGID__", language_id_sql("toks"))


_LANGID_AGREEMENT_ORACLE = _langid_agreement_oracle()


def customer_360_snapshot_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-360 feature snapshot — the feature-store
    materialization every ML/analytics platform builds: ONE wide row
    per customer assembling identity (segment, nation), transactional
    aggregates (order count, lifetime spend in exact cents, average
    order value), temporal features (first/last order date, recency
    in whole days behind the corpus max date — a 1-row broadcast
    anchor, the trending/aging precedent), and a within-segment spend
    quintile (ntile with the unique-key tiebreak). Customers with no
    orders survive the LEFT join with explicit zeros/NULLs — a feature
    table must cover the whole entity population, not just the active
    subset (pinned in pytest).

    Scale shape: orders pre-aggregate per customer (one shuffle on the
    key), one equi join to the customer spine, broadcast nation dim,
    one per-segment window. No fact-sized broadcast, no self-join —
    the materialization is two shuffles end to end.
    """
    return customer_360(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "orders"),
    )


def customer_360(cust: DataFrame, nation: DataFrame, orders: DataFrame) -> DataFrame:
    """The snapshot builder itself, DataFrame-parameterized so the
    zero-order LEFT-join contract is testable on a constructed fixture
    (no test SF happens to contain an orderless customer)."""
    nation = nation.select(F.col("n_nationkey"), F.col("n_name").alias("nation"))
    anchor = orders.agg(F.max(F.to_date("o_orderdate")).alias("_maxd"))
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(rnd_cents("o_totalprice")).alias("spend_cents"),
        F.min(F.to_date("o_orderdate")).alias("first_order"),
        F.max(F.to_date("o_orderdate")).alias("last_order"),
    )
    j = (
        cust.join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .join(per_cust, cust["c_custkey"] == per_cust["o_custkey"], "left")
        .crossJoin(F.broadcast(anchor))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.coalesce("spend_cents", F.lit(0)), "c_custkey"
    )
    return j.select(
        "c_custkey",
        "c_mktsegment",
        "nation",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("spend_cents", F.lit(0)).alias("spend_cents"),
        "first_order",
        "last_order",
        F.datediff(F.col("_maxd"), F.col("last_order")).cast("long").alias(
            "recency_days"
        ),
        rnd(
            F.coalesce("spend_cents", F.lit(0))
            / (100.0 * F.greatest(F.coalesce("n_orders", F.lit(0)), F.lit(1))),
            4,
        ).alias("avg_order_value"),
        F.ntile(5).over(w).cast("long").alias("spend_quintile"),
    ).orderBy("c_custkey")


_CUSTOMER_360_ORACLE = f"""
    WITH anchor AS (SELECT max(CAST(o_orderdate AS DATE)) AS maxd FROM orders),
    per_cust AS (
      SELECT o_custkey,
             CAST(count(*) AS BIGINT) AS n_orders,
             SUM({rnd_cents_sql('o_totalprice')}) AS spend_cents,
             min(CAST(o_orderdate AS DATE)) AS first_order,
             max(CAST(o_orderdate AS DATE)) AS last_order
      FROM orders GROUP BY 1
    )
    SELECT c.c_custkey, c.c_mktsegment, n.n_name AS nation,
           CAST(coalesce(p.n_orders, 0) AS BIGINT) AS n_orders,
           CAST(coalesce(p.spend_cents, 0) AS BIGINT) AS spend_cents,
           p.first_order, p.last_order,
           CAST(date_diff('day', p.last_order, a.maxd) AS BIGINT) AS recency_days,
           {rnd_sql('coalesce(p.spend_cents, 0) / (100.0 * greatest(coalesce(p.n_orders, 0), 1))', 4)} AS avg_order_value,
           CAST(ntile(5) OVER (PARTITION BY c.c_mktsegment
                               ORDER BY coalesce(p.spend_cents, 0), c.c_custkey)
                AS BIGINT) AS spend_quintile
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    LEFT JOIN per_cust p ON c.c_custkey = p.o_custkey
    CROSS JOIN anchor a
    ORDER BY c.c_custkey
"""


def sim_embedding_norm_audit_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-data-quality audit — the embeddings-column twin of the
    tabular validity checks: per label, vector count, dimensionality
    bounds (min = max ⇒ the column is rectangular — a ragged dim is
    the classic silent ANN corruption), zero-vector count (cosine is
    undefined on them; the serving paths must know), and the squared-
    norm range at 4dp (min/max are order-INDEPENDENT picks of per-row
    rounded values — no cross-row float summation anywhere, the same
    per-row-dot + rnd4 device sim_cosine_topk has driver-proven since
    round 2).

    Scale shape: map-only per-vector features into a |labels|-row hash
    agg; one scan, one tiny shuffle.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    feats = emb.select(
        "label",
        F.size("embedding").alias("_dim"),
        rnd(
            F.aggregate(
                F.zip_with("embedding", "embedding", lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            4,
        ).alias("_n2"),
    )
    return (
        feats.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.min("_dim").cast("long").alias("dim_min"),
            F.max("_dim").cast("long").alias("dim_max"),
            F.sum((F.col("_n2") == 0.0).cast("long")).alias("n_zero_vecs"),
            F.min("_n2").alias("norm2_min"),
            F.max("_n2").alias("norm2_max"),
        )
        .orderBy("label")
    )


_NORM_AUDIT_ORACLE = """
    WITH f AS (
      SELECT label,
             len(embedding) AS dim,
             floor(list_dot_product(embedding, embedding) * 10000 + 0.5) / 10000 AS n2
      FROM embeddings
    )
    SELECT CAST(label AS BIGINT) AS label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(min(dim) AS BIGINT) AS dim_min,
           CAST(max(dim) AS BIGINT) AS dim_max,
           CAST(sum(CASE WHEN n2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_vecs,
           min(n2) AS norm2_min,
           max(n2) AS norm2_max
    FROM f
    GROUP BY label
    ORDER BY label
"""



def events_segment_behavior_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral cohorts by CRM attribute — the first cross-DATASET
    join in the engine: the clickstream (events.user_id) keyed against
    the customer master (c_custkey; the id domains align — measured,
    all event users resolve), rolling per-market-segment engagement:
    active users, events, purchases, purchase share in exact ppm, and
    event value per active user in exact cents → 4dp dollars. This is
    the product-analytics ⋈ warehouse integration every platform needs
    (segment-level engagement dashboards) and no single-dataset query
    exercises.

    Scale shape: the event log pre-aggregates PER USER before the
    join (the cluster-bootstrap discipline: events ≫ users, so the
    join's left side is user-sized, one shuffle each side on the user
    key), then a |segments|-row hash agg. Unmatched users would be
    dropped by the inner join — the match-rate is emitted per segment
    (n_users vs n_matched is corpus-wide checkable) so silent key
    drift shows up in the output, not in a missing row.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        rnd_cents("value").alias("_c"),
    )
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("_n_events"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias("_n_purch"),
        F.sum("_c").alias("_cents"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey"), F.col("c_mktsegment").alias("segment")
    )
    j = per_user.join(cust, per_user["user_id"] == cust["c_custkey"], "inner")
    agg = j.groupBy("segment").agg(
        F.count(F.lit(1)).cast("long").alias("n_active_users"),
        F.sum("_n_events").cast("long").alias("n_events"),
        F.sum("_n_purch").cast("long").alias("n_purchases"),
        F.sum("_cents").cast("long").alias("value_cents"),
    )
    return agg.select(
        "segment",
        "n_active_users",
        "n_events",
        "n_purchases",
        (F.col("n_purchases") * 1000000 / F.col("n_events"))
        .cast("long")
        .alias("purchase_share_ppm"),
        rnd(F.col("value_cents") / (100.0 * F.col("n_active_users")), 4).alias(
            "value_per_user"
        ),
    ).orderBy("segment")


_SEGMENT_BEHAVIOR_ORACLE = f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purch,
             SUM({rnd_cents_sql('value')}) AS cents
      FROM events GROUP BY 1
    ), j AS (
      SELECT c.c_mktsegment AS segment, u.n_events, u.n_purch, u.cents
      FROM per_user u JOIN customer c ON u.user_id = c.c_custkey
    ), agg AS (
      SELECT segment,
             CAST(count(*) AS BIGINT) AS n_active_users,
             CAST(sum(n_events) AS BIGINT) AS n_events,
             CAST(sum(n_purch) AS BIGINT) AS n_purchases,
             CAST(sum(cents) AS BIGINT) AS value_cents
      FROM j GROUP BY 1
    )
    SELECT segment, n_active_users, n_events, n_purchases,
           CAST(n_purchases * 1000000 // n_events AS BIGINT) AS purchase_share_ppm,
           {rnd_sql('value_cents / (100.0 * n_active_users)', 4)} AS value_per_user
    FROM agg
    ORDER BY segment
"""



def agg_cohen_kappa_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa over the language-agreement matrix — the
    chance-corrected agreement statistic every labeling/annotation
    pipeline reports (raw accuracy rewards majority-class guessing;
    kappa subtracts the agreement two independent raters would reach
    by chance). Raters here: the declared ``lang`` metadata vs the
    heuristic classifier (llm_langid_agreement's two sides).

    Exactness: kappa = (p_o − p_e)/(1 − p_e) algebraically clears to
    (N·Σdiag − Σ_l row_l·col_l) / (N² − Σ_l row_l·col_l) — numerator
    and denominator computed in DECIMAL(38,0) on the Spark side and
    HUGEINT in the oracle (ADVICE r05: the earlier BIGINT num·10⁶
    wrapped silently past ~3M docs — int64 headroom is N²·10⁶), then
    both engines convert the SAME exact integers to double and divide
    BEFORE any scaling, so the ppm rounding is IEEE-identical
    cross-engine up to N ≈ 3·10⁹ (the BIGINT bound of the raw
    sum_row_col output column, documented domain limit).

    Scale shape: map-only classification → |langs|² cell agg →
    |langs|-row marginals; everything after the scan is constant-size.
    """
    from spotify_data_pipeline_spark.functions.text import is_nonblank
    from spotify_data_pipeline_spark.operators.textops import language_id

    docs = load_table(spark, sf_dir, "documents").where(is_nonblank(F.col("text")))
    cells = (
        language_id(docs)
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    rows_m = cells.groupBy("lang").agg(F.sum("n").alias("_row"))
    cols_m = cells.groupBy("pred_lang").agg(F.sum("n").alias("_col"))
    chance = (
        rows_m.join(cols_m, rows_m["lang"] == cols_m["pred_lang"], "inner")
        .agg(
            F.sum(F.col("_row").cast("decimal(38,0)") * F.col("_col"))
            .cast("decimal(38,0)")
            .alias("_sum_rc")
        )
    )
    totals = cells.agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.sum(F.when(F.col("lang") == F.col("pred_lang"), F.col("n")))
        .cast("long")
        .alias("n_agree"),
    )
    j = totals.crossJoin(F.broadcast(chance))
    nd = F.col("n_docs").cast("decimal(38,0)")
    num = (nd * F.col("n_agree") - F.col("_sum_rc")).cast("double")
    den = (nd * F.col("n_docs") - F.col("_sum_rc")).cast("double")
    return j.select(
        "n_docs",
        "n_agree",
        F.col("_sum_rc").cast("long").alias("sum_row_col"),
        F.floor(F.lit(1000000.0) * num / den + F.lit(0.5))
        .cast("long")
        .alias("kappa_ppm"),
    )


def _cohen_kappa_oracle() -> str:
    from spotify_data_pipeline_spark.operators.textops import language_id_sql

    return r"""
    WITH t AS (
      SELECT lang,
             string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
      FROM documents WHERE length(trim(text)) > 0
    ), cells AS (
      SELECT lang, __LANGID__ AS pred_lang, CAST(count(*) AS BIGINT) AS n
      FROM t GROUP BY 1, 2
    ), rm AS (SELECT lang, sum(n) AS r FROM cells GROUP BY 1),
    cm AS (SELECT pred_lang, sum(n) AS c FROM cells GROUP BY 1),
    chance AS (
      -- HUGEINT products (Spark side: DECIMAL(38,0)) — BIGINT wrapped
      -- silently past ~3M docs once the old num*1e6 scaling applied
      SELECT sum(CAST(rm.r AS HUGEINT) * cm.c) AS sum_rc
      FROM rm JOIN cm ON rm.lang = cm.pred_lang
    ), totals AS (
      SELECT CAST(sum(n) AS BIGINT) AS n_docs,
             CAST(coalesce(sum(CASE WHEN lang = pred_lang THEN n END), 0) AS BIGINT) AS n_agree
      FROM cells
    )
    SELECT n_docs, n_agree, CAST(sum_rc AS BIGINT) AS sum_row_col,
           CAST(floor(1000000.0
                      * CAST(CAST(n_docs AS HUGEINT) * n_agree - sum_rc AS DOUBLE)
                      / CAST(CAST(n_docs AS HUGEINT) * n_docs - sum_rc AS DOUBLE)
                      + 0.5) AS BIGINT) AS kappa_ppm
    FROM totals CROSS JOIN chance
    """.replace("__LANGID__", language_id_sql("toks"))


_COHEN_KAPPA_ORACLE = _cohen_kappa_oracle()


def ml_knn_prf_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision / recall / F1 for the 1-NN classifier — the
    metric layer over ml_knn_confusion's matrix (accuracy alone hides
    class imbalance; P/R/F1 per class is what a model card reports).

    Exactness: tp = diagonal cell, row/col marginals from the same
    exact integer matrix; precision = tp/col, recall = tp/row,
    F1 = 2·tp/(row+col) — each ONE integer cross-multiplication to
    ppm (floor), zero float accumulation anywhere.

    Scale shape: identical to ml_knn_confusion (bounded query subset
    broadcast over one corpus scan) plus constant-size marginal aggs.
    """
    from spotify_data_pipeline_spark.operators.quantization import (
        cosine_topk_quantized,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 20 == 0)
    nn = cosine_topk_quantized(queries, emb, k=1)
    labels = emb.select("vec_id", F.col("label").cast("long").alias("_lbl"))
    j = nn.join(
        F.broadcast(
            labels.select(F.col("vec_id").alias("query_id"), F.col("_lbl").alias("t"))
        ),
        "query_id",
    ).join(
        F.broadcast(
            labels.select(
                F.col("vec_id").alias("neighbor_id"), F.col("_lbl").alias("p")
            )
        ),
        "neighbor_id",
    )
    cells = j.groupBy("t", "p").agg(F.count(F.lit(1)).cast("long").alias("n"))
    rows_m = cells.groupBy("t").agg(F.sum("n").cast("long").alias("row_n"))
    cols_m = cells.groupBy("p").agg(F.sum("n").cast("long").alias("col_n"))
    diag = cells.where(F.col("t") == F.col("p")).select(
        F.col("t").alias("label"), F.col("n").alias("tp")
    )
    out = (
        rows_m.select(F.col("t").alias("label"), "row_n")
        .join(cols_m.select(F.col("p").alias("label"), "col_n"), "label", "full_outer")
        .join(diag, "label", "left")
        .select(
            "label",
            F.coalesce("tp", F.lit(0)).alias("tp"),
            F.coalesce("row_n", F.lit(0)).alias("n_true"),
            F.coalesce("col_n", F.lit(0)).alias("n_pred"),
        )
    )
    pr = F.when(
        F.col("n_pred") > 0, F.floor(F.col("tp") * 1000000 / F.col("n_pred"))
    ).cast("long")
    rc = F.when(
        F.col("n_true") > 0, F.floor(F.col("tp") * 1000000 / F.col("n_true"))
    ).cast("long")
    f1 = F.when(
        F.col("n_true") + F.col("n_pred") > 0,
        F.floor(2 * F.col("tp") * 1000000 / (F.col("n_true") + F.col("n_pred"))),
    ).cast("long")
    return out.select(
        "label",
        "tp",
        "n_true",
        "n_pred",
        pr.alias("precision_ppm"),
        rc.alias("recall_ppm"),
        f1.alias("f1_ppm"),
    ).orderBy("label")


_QCOS13B = (
    "(list_dot_product(a.q, b.q)"
    " / (sqrt(list_dot_product(a.q, a.q)) * sqrt(list_dot_product(b.q, b.q))))"
)

_KNN_PRF_ORACLE = f"""
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
                 ORDER BY floor({_QCOS13B} * 10000 + 0.5) / 10000 DESC, b.vec_id ASC
               ) AS rn
        FROM qz a JOIN qz b ON a.vec_id <> b.vec_id
        WHERE a.vec_id % 20 = 0
      ) WHERE rn = 1
    ), cells AS (
      SELECT CAST(t.label AS BIGINT) AS t, CAST(p.label AS BIGINT) AS p,
             CAST(count(*) AS BIGINT) AS n
      FROM nn JOIN embeddings t ON nn.query_id = t.vec_id
              JOIN embeddings p ON nn.neighbor_id = p.vec_id
      GROUP BY 1, 2
    ), rm AS (SELECT t AS label, CAST(sum(n) AS BIGINT) AS row_n FROM cells GROUP BY 1),
    cm AS (SELECT p AS label, CAST(sum(n) AS BIGINT) AS col_n FROM cells GROUP BY 1),
    d AS (SELECT t AS label, n AS tp FROM cells WHERE t = p),
    m AS (
      SELECT coalesce(rm.label, cm.label) AS label,
             CAST(coalesce(d.tp, 0) AS BIGINT) AS tp,
             CAST(coalesce(rm.row_n, 0) AS BIGINT) AS n_true,
             CAST(coalesce(cm.col_n, 0) AS BIGINT) AS n_pred
      FROM rm FULL OUTER JOIN cm ON rm.label = cm.label
              LEFT JOIN d ON coalesce(rm.label, cm.label) = d.label
    )
    SELECT label, tp, n_true, n_pred,
           CASE WHEN n_pred > 0 THEN CAST(floor(tp * 1000000.0 / n_pred) AS BIGINT) END AS precision_ppm,
           CASE WHEN n_true > 0 THEN CAST(floor(tp * 1000000.0 / n_true) AS BIGINT) END AS recall_ppm,
           CASE WHEN n_true + n_pred > 0 THEN CAST(floor(2 * tp * 1000000.0 / (n_true + n_pred)) AS BIGINT) END AS f1_ppm
    FROM m
    ORDER BY label
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
    PendingQuery(
        "events_rapid_repeat_screen",
        events_rapid_repeat_screen_query,
        _RAPID_REPEAT_ORACLE,
        tags=("events", "audit", "proximity", "rangejoin"),
    ),
    PendingQuery(
        "dq_freshness_report",
        dq_freshness_report_query,
        _FRESHNESS_ORACLE,
        tags=("dq", "ops", "freshness"),
    ),
    PendingQuery(
        "events_ratio_delta_ci",
        events_ratio_delta_ci_query,
        _RATIO_DELTA_ORACLE,
        tags=("events", "abtest", "statistics", "ratio", "delta-method"),
    ),
    PendingQuery(
        "llm_langid_agreement",
        llm_langid_agreement_query,
        _LANGID_AGREEMENT_ORACLE,
        tags=("llmops", "text", "dq", "langid", "confusion"),
    ),
    PendingQuery(
        "customer_360_snapshot",
        customer_360_snapshot_query,
        _CUSTOMER_360_ORACLE,
        tags=("warehouse", "featurestore", "denormalize", "ntile"),
    ),
    PendingQuery(
        "sim_embedding_norm_audit",
        sim_embedding_norm_audit_query,
        _NORM_AUDIT_ORACLE,
        tags=("similarity", "dq", "vectors"),
    ),
    PendingQuery(
        "events_segment_behavior",
        events_segment_behavior_query,
        _SEGMENT_BEHAVIOR_ORACLE,
        tags=("events", "warehouse", "cross-dataset", "analytics"),
    ),
    PendingQuery(
        "agg_cohen_kappa",
        agg_cohen_kappa_query,
        _COHEN_KAPPA_ORACLE,
        tags=("agg", "statistics", "agreement", "evaluation"),
    ),
    PendingQuery(
        "ml_knn_prf",
        ml_knn_prf_query,
        _KNN_PRF_ORACLE,
        tags=("ml", "evaluation", "knn", "precision-recall"),
    ),
)
