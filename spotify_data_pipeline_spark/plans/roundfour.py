"""Round-4 queries — built and 3-SF oracle-verified in round 3 (as
``plans/roundfour_pending.py``), ACTIVATED in round 4.

Round 3 ended with the driver's 50-row evidence window exactly full, so
these 17 exact-oracle queries were staged unregistered. After the r03
pass every window occupant earned a green row, freeing the window: this
module now registers at the FRONT of ``_QUERY_MODULES`` (positions
0–16), followed by windows/multimodal/dedup/similarity/text (33 prior-
green re-proofs) — exactly 50. events/llmops/aggregates/relational form
the tail, every name prior-green AND source-hash-pinned
(tests/evidence_hashes.json, tests/test_registry.py).

Registration happens via the ``PENDING`` loop at the bottom of this
module so each oracle constant can stay next to its query function.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.io import load_table
from spotify_data_pipeline_spark.plans.registry import declare

# Shared with dedup_ngram_jaccard's oracle (plans/dedup_queries.py):
# the exact 3-token-shingle Jaccard pair graph at threshold 0.5.
_PAIRS_SQL = """
    WITH t AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
      FROM documents WHERE length(trim(text)) > 0
    ), s AS (
      SELECT doc_id, unnest(
        CASE WHEN len(toks) >= 3
             THEN list_distinct(list_transform(range(1, len(toks) - 1),
                                               i -> array_to_string(toks[i:i+2], ' ')))
             ELSE [array_to_string(toks, ' ')] END) AS sh
      FROM t
    ), keep AS (
      SELECT sh FROM (SELECT sh, count(*) AS df FROM s GROUP BY 1)
      WHERE df <= greatest(100, CAST(floor(0.10 * (SELECT count(*) FROM documents)) AS BIGINT))
    ), sz AS (
      SELECT doc_id, count(*) AS n_sh FROM s GROUP BY 1
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
      FROM s a JOIN keep k ON a.sh = k.sh
               JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), pairs AS (
      SELECT id_a, id_b
      FROM inter JOIN sz za ON inter.id_a = za.doc_id
                 JOIN sz zb ON inter.id_b = zb.doc_id
      WHERE floor(n_common / (za.n_sh + zb.n_sh - n_common) * 10000 + 0.5) / 10000 >= 0.5
    )
"""


def dedup_components_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster labels: connected components of the exact
    n-gram-Jaccard pair graph (threshold 0.5), component = min doc_id.

    The pair graph is the already-hash-matched ``dedup_ngram_jaccard``
    output; the labeling is ``operators/components.py`` (alternating
    large-star/small-star — O(log² n) rounds, per-round one group-min +
    one equi-join). The oracle replicates reachability with a recursive
    CTE, so the hash pins TRANSITIVE semantics the pair queries can't:
    A~B~C must label C with A's id even though (A, C) is not a pair.
    """
    from spotify_data_pipeline_spark.operators.components import (
        connected_components,
    )
    from spotify_data_pipeline_spark.operators.dedup import ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs, id_col="doc_id", text_col="text", threshold=0.5
    ).select("id_a", "id_b")
    return connected_components(pairs).select(
        F.col("id").alias("doc_id"), F.col("component").alias("component")
    )


_DEDUP_COMPONENTS_ORACLE = (
    _PAIRS_SQL
    + """
    , e AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b AS u, id_a AS v FROM pairs
    ), reach(u, v) AS (
      SELECT DISTINCT u, u FROM e
      UNION
      SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u
    )
    SELECT u AS doc_id, CAST(min(v) AS BIGINT) AS component
    FROM reach GROUP BY u
    """
).replace("WITH t AS", "WITH RECURSIVE t AS")


def data_quality_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The declarative data-quality gate (operators/constraints.py) as a
    query: five check kinds over ``orders`` — not-null, accepted-values,
    range, regex full-match, key uniqueness, and a foreign key into
    ``customer``. All row-level checks share ONE aggregate scan; unique
    is one groupBy; the FK is one anti-join (broadcast-eligible dim).
    """
    from spotify_data_pipeline_spark.operators.constraints import (
        accepted_values,
        foreign_key,
        in_range,
        matches,
        not_null,
        unique,
        validate,
    )

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return validate(
        orders,
        [
            not_null("o_orderkey"),
            accepted_values("o_orderstatus", ["O", "F", "P"]),
            in_range("o_totalprice", 0.0, 1e7),
            matches("o_orderpriority", "[1-5]-[A-Z ]+"),
            unique("o_orderkey"),
            foreign_key("o_custkey", customer, "c_custkey"),
        ],
    )


_DATA_QUALITY_ORACLE = """
    WITH base AS (SELECT count(*) AS total FROM orders)
    SELECT 'not_null' AS "check", 'o_orderkey' AS "column",
           CAST((SELECT count(*) FROM orders WHERE o_orderkey IS NULL) AS BIGINT) AS violations,
           CAST(total AS BIGINT) AS total,
           (SELECT count(*) FROM orders WHERE o_orderkey IS NULL) = 0 AS passed
    FROM base
    UNION ALL
    SELECT 'accepted_values', 'o_orderstatus',
           CAST((SELECT count(*) FROM orders
                 WHERE o_orderstatus NOT IN ('O','F','P') OR o_orderstatus IS NULL) AS BIGINT),
           CAST(total AS BIGINT),
           (SELECT count(*) FROM orders
            WHERE o_orderstatus NOT IN ('O','F','P') OR o_orderstatus IS NULL) = 0
    FROM base
    UNION ALL
    SELECT 'in_range', 'o_totalprice',
           CAST((SELECT count(*) FROM orders
                 WHERE o_totalprice NOT BETWEEN 0.0 AND 10000000.0 OR o_totalprice IS NULL) AS BIGINT),
           CAST(total AS BIGINT),
           (SELECT count(*) FROM orders
            WHERE o_totalprice NOT BETWEEN 0.0 AND 10000000.0 OR o_totalprice IS NULL) = 0
    FROM base
    UNION ALL
    SELECT 'matches', 'o_orderpriority',
           CAST((SELECT count(*) FROM orders
                 WHERE NOT regexp_full_match(o_orderpriority, '[1-5]-[A-Z ]+')
                       OR o_orderpriority IS NULL) AS BIGINT),
           CAST(total AS BIGINT),
           (SELECT count(*) FROM orders
            WHERE NOT regexp_full_match(o_orderpriority, '[1-5]-[A-Z ]+')
                  OR o_orderpriority IS NULL) = 0
    FROM base
    UNION ALL
    SELECT 'unique', 'o_orderkey',
           CAST((SELECT coalesce(sum(n), 0) FROM
                   (SELECT count(*) AS n FROM orders GROUP BY o_orderkey HAVING count(*) > 1)) AS BIGINT),
           CAST(total AS BIGINT),
           (SELECT coalesce(sum(n), 0) FROM
              (SELECT count(*) AS n FROM orders GROUP BY o_orderkey HAVING count(*) > 1)) = 0
    FROM base
    UNION ALL
    SELECT 'foreign_key', 'o_custkey',
           CAST((SELECT count(*) FROM orders o
                 WHERE o.o_custkey IS NOT NULL
                   AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS BIGINT),
           CAST(total AS BIGINT),
           (SELECT count(*) FROM orders o
            WHERE o.o_custkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) = 0
    FROM base
"""


def scd2_customer_tier_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history built from an observation stream
    (operators/upsert.scd2_from_observations): each customer's spending
    tier (floor(o_totalprice / 50000)) observed at every order date,
    compressed to change-points, each version closed by the next
    (valid_from/valid_to/is_current). Within one (customer, date) the
    max-orderkey order wins — deterministic on both engines
    (``max_by`` ≡ ``arg_max``).

    Plan: one shuffle on the key; lag (change detection) and lead
    (close-out) share the partitioning+sort. The oracle replicates the
    window chain with IS DISTINCT FROM null-safe compression.
    """
    from spotify_data_pipeline_spark.operators.upsert import (
        scd2_from_observations,
    )

    orders = load_table(spark, sf_dir, "orders")
    obs = (
        orders.withColumn(
            "tier", F.floor(F.col("o_totalprice") / F.lit(50000.0)).cast("long")
        )
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max_by("tier", "o_orderkey").alias("tier"))
    )
    hist = scd2_from_observations(obs, ["o_custkey"], "o_orderdate", ["tier"])
    return hist.select(
        "o_custkey",
        "tier",
        F.col("o_orderdate").alias("valid_from"),
        "valid_to",
        "is_current",
    )


_SCD2_ORACLE = """
    WITH obs AS (
      SELECT o_custkey, o_orderdate,
             arg_max(CAST(floor(o_totalprice / 50000.0) AS BIGINT), o_orderkey) AS tier
      FROM orders GROUP BY 1, 2
    ), chg AS (
      SELECT o_custkey, o_orderdate, tier,
             lag(tier) OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS prev
      FROM obs
    ), kept AS (
      SELECT o_custkey, o_orderdate, tier
      FROM chg WHERE prev IS NULL OR tier IS DISTINCT FROM prev
    )
    SELECT o_custkey, tier, o_orderdate AS valid_from,
           lead(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS valid_to,
           lead(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate) IS NULL AS is_current
    FROM kept
"""


def incremental_agg_fold_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental-maintenance fold (operators/incremental.py) as a
    checkable query: lineitem split into three deterministic batches
    (orderkey mod 3), folded into per-(returnflag, linestatus) state,
    finalized. The oracle is the ONE-SHOT aggregate — the hash match IS
    the fold-equals-rebuild invariant, pinned cross-engine.

    Money sums are carried in integer cents (exact bigint arithmetic,
    summation-order-proof); avg is one float division of exact
    integers on both engines. The HLL metric is excluded here — its
    merged estimate is bounded, not bit-stable (see incremental.py).
    """
    from spotify_data_pipeline_spark.operators.incremental import (
        build_partial,
        finalize,
        incremental_update,
        m_avg,
        m_count,
        m_max,
        m_min,
        m_sum,
    )

    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "price_cents", F.round(F.col("l_extendedprice") * 100).cast("long")
    )
    groups = ["l_returnflag", "l_linestatus"]
    metrics = [
        m_sum("l_quantity", "sum_qty"),
        m_count("l_extendedprice", "n_rows"),
        m_min("l_shipdate", "first_ship"),
        m_max("l_shipdate", "last_ship"),
        m_sum("price_cents", "cents"),
        m_avg("price_cents", "avg_cents"),
    ]
    state = build_partial(li.where(F.col("l_orderkey") % 3 == 0), groups, metrics)
    for i in (1, 2):
        state = incremental_update(
            state, li.where(F.col("l_orderkey") % 3 == i), groups, metrics
        )
    out = finalize(state, groups, metrics)
    return out.select(
        *groups,
        F.col("sum_qty").cast("long").alias("sum_qty"),
        F.col("n_rows").cast("long").alias("n_rows"),
        "first_ship",
        "last_ship",
        (F.col("cents") / F.lit(100.0)).alias("revenue"),
        (F.col("avg_cents") / F.lit(100.0)).alias("avg_price"),
    )


_INCREMENTAL_ORACLE = """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
           CAST(count(l_extendedprice) AS BIGINT) AS n_rows,
           min(l_shipdate) AS first_ship,
           max(l_shipdate) AS last_ship,
           sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS revenue,
           (CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
              / count(l_extendedprice)) / 100.0 AS avg_price
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
"""


def dedup_incremental_screen_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup screen (EXACT): the 'newest fifth' of the
    corpus (doc_id % 5 == 4, standing in for an arriving batch) is
    screened against the rest via ``operators/dedup.ngram_jaccard_join``
    — the exact two-table twin of ``minhash_lsh_join`` (whose candidate
    step is xxhash64-banded and therefore rows-only; this query pins
    the shared incremental-join SEMANTICS with an exact oracle, and a
    pytest asserts the two operators agree on the cross-table pairs).

    DF-cap statistics are computed over the COMBINED corpus, so the
    oracle's per-shingle document frequencies are identical to the
    self-join query's (the split partitions ``documents``).
    """
    from spotify_data_pipeline_spark.operators.dedup import ngram_jaccard_join

    docs = load_table(spark, sf_dir, "documents")
    new = docs.where(F.col("doc_id") % 5 == 4)
    corpus = docs.where(F.col("doc_id") % 5 != 4)
    return ngram_jaccard_join(
        new, corpus, id_col="doc_id", text_col="text", threshold=0.5
    )


_INCREMENTAL_SCREEN_ORACLE = """
    WITH t AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
      FROM documents WHERE length(trim(text)) > 0
    ), s AS (
      SELECT doc_id, unnest(
        CASE WHEN len(toks) >= 3
             THEN list_distinct(list_transform(range(1, len(toks) - 1),
                                               i -> array_to_string(toks[i:i+2], ' ')))
             ELSE [array_to_string(toks, ' ')] END) AS sh
      FROM t
    ), keep AS (
      SELECT sh FROM (SELECT sh, count(*) AS df FROM s GROUP BY 1)
      WHERE df <= greatest(100, CAST(floor(0.10 * (SELECT count(*) FROM documents)) AS BIGINT))
    ), sz AS (
      SELECT doc_id, count(*) AS n_sh FROM s GROUP BY 1
    ), inter AS (
      SELECT a.doc_id AS new_id, b.doc_id AS corpus_id, count(*) AS n_common
      FROM s a JOIN keep k ON a.sh = k.sh
               JOIN s b ON a.sh = b.sh
      WHERE a.doc_id % 5 = 4 AND b.doc_id % 5 <> 4
      GROUP BY 1, 2
    )
    SELECT new_id, corpus_id,
           floor(n_common / (za.n_sh + zb.n_sh - n_common) * 10000 + 0.5) / 10000 AS jaccard
    FROM inter JOIN sz za ON inter.new_id = za.doc_id
               JOIN sz zb ON inter.corpus_id = zb.doc_id
    WHERE floor(n_common / (za.n_sh + zb.n_sh - n_common) * 10000 + 0.5) / 10000 >= 0.5
"""


def events_funnel_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel over the event stream: signup → view →
    click → purchase, each stage's event STRICTLY after the user's
    earliest qualifying previous-stage event. Output (stage_idx, stage,
    n_users) — classic product-analytics funnel.

    Plan: four conditional min-aggregates chained by per-user joins.
    Every shuffle keys on user_id, so the chain re-uses one hash
    partitioning (AQE coalesces); per-stage frames shrink monotonically
    (stage n is a subset of stage n−1's users). No per-user event
    arrays are ever collected — works for users with millions of
    events."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    stages = ["signup", "view", "click", "purchase"]

    reached = ev.where(F.col("event_type") == stages[0]).groupBy("user_id").agg(
        F.min("ts").alias("t")
    )
    counts = [reached.agg(F.count("*").alias("n_users"))]
    for s in stages[1:]:
        nxt = (
            ev.where(F.col("event_type") == s)
            .join(reached.select("user_id", F.col("t").alias("_prev")), "user_id")
            .where(F.col("ts") > F.col("_prev"))
            .groupBy("user_id")
            .agg(F.min("ts").alias("t"))
        )
        counts.append(nxt.agg(F.count("*").alias("n_users")))
        reached = nxt

    out = None
    for i, (s, c) in enumerate(zip(stages, counts)):
        row = c.select(
            F.lit(i + 1).cast("int").alias("stage_idx"),
            F.lit(s).alias("stage"),
            F.col("n_users").cast("long").alias("n_users"),
        )
        out = row if out is None else out.unionAll(row)
    return out


_EVENTS_FUNNEL_ORACLE = """
    WITH s1 AS (
      SELECT user_id, min(ts) AS t FROM events WHERE event_type = 'signup' GROUP BY 1
    ), s2 AS (
      SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'view' AND e.ts > s1.t GROUP BY 1
    ), s3 AS (
      SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > s2.t GROUP BY 1
    ), s4 AS (
      SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s3 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s3.t GROUP BY 1
    )
    SELECT CAST(1 AS INTEGER) AS stage_idx, 'signup' AS stage, CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users
    UNION ALL
    SELECT 2, 'view', (SELECT count(*) FROM s2)
    UNION ALL
    SELECT 3, 'click', (SELECT count(*) FROM s3)
    UNION ALL
    SELECT 4, 'purchase', (SELECT count(*) FROM s4)
"""


def events_retention_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users cohorted by first-activity date; for each
    (cohort_date, day_offset) the count of distinct cohort members
    active that day. Output (cohort_date, day_offset, n_users).

    Plan: one agg for the cohort map (min date per user — shuffles on
    user_id), one join back (same key — co-partitioned), one distinct
    agg on (cohort, offset). The cohort map is user_id→date, tiny
    relative to events, broadcast-eligible under AQE."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    cohorts = ev.groupBy("user_id").agg(F.min("d").alias("cohort_date"))
    return (
        ev.join(cohorts, "user_id")
        .select(
            "user_id",
            "cohort_date",
            F.datediff(F.col("d"), F.col("cohort_date")).cast("int").alias("day_offset"),
        )
        .groupBy("cohort_date", "day_offset")
        .agg(F.count_distinct("user_id").cast("long").alias("n_users"))
    )


_EVENTS_RETENTION_ORACLE = """
    WITH c AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS cohort_date FROM events GROUP BY 1
    )
    SELECT c.cohort_date,
           CAST(date_diff('day', c.cohort_date, CAST(e.ts AS DATE)) AS INTEGER) AS day_offset,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM events e JOIN c USING (user_id)
    GROUP BY 1, 2
"""


def events_transitions_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix (first-order Markov counts): per
    user, events ordered by (ts, event_id); count each consecutive
    (from_type → to_type) step. Output (from_type, to_type, n_steps).

    Plan: ONE window (lead over the per-user sequence — a single
    shuffle on user_id) feeding a hash agg on the 25-row transition
    key space; the agg's map-side combine collapses each partition to
    ≤25 rows before the final exchange. event_id tiebreak makes the
    sequence — and therefore the counts — deterministic."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "event_type", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    return steps.groupBy("from_type", "to_type").agg(
        F.count("*").cast("long").alias("n_steps")
    )


_EVENTS_TRANSITIONS_ORACLE = """
    WITH seq AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      FROM events
    )
    SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n_steps
    FROM seq WHERE to_type IS NOT NULL
    GROUP BY 1, 2
"""


def events_window_count_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preceding-hour activity count per purchase: for each 'purchase'
    event, how many events (any user, any type, excluding itself) fall
    in the half-open hour (ts − 1h, ts]. A pure range join — there is
    NO equi key between the sides — the textbook case where naive Spark
    produces a BroadcastNestedLoopJoin that cannot survive two large
    sides.

    Plan: ``operators/rangejoin.point_in_interval_join`` with
    bin_width = the interval length (1 h), so each purchase interval
    explodes to ≤2 bins and each event is compared only against
    purchases in its own hour-bin — an AQE-planned equi-join shuffle on
    the bin id, then one hash agg. Purchases with zero preceding events
    are kept via a left join back (count 0). The oracle states the
    same join as a plain theta join — DuckDB's IEJoin handles it — so
    the hash match pins the binned plan to the naive semantics.
    """
    from spotify_data_pipeline_spark.operators.rangejoin import (
        point_in_interval_join,
    )

    hour = 3_600_000_000  # µs
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", F.unix_micros("ts").alias("pt")
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("purchase_id"), F.col("pt").alias("hi"))
        .withColumn("lo", F.col("hi") - hour)
    )
    pairs = point_in_interval_join(
        ev.select("event_id", "pt"),
        purchases,
        "pt",
        "lo",
        "hi",
        bin_width=hour,
        closed="right",
    ).where(F.col("event_id") != F.col("purchase_id"))
    counts = pairs.groupBy("purchase_id").agg(F.count("*").alias("n"))
    return (
        purchases.select("purchase_id")
        .join(counts, "purchase_id", "left")
        .select(
            "purchase_id",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events_1h"),
        )
    )


_EVENTS_WINDOW_COUNT_ORACLE = """
    SELECT p.event_id AS purchase_id,
           CAST(count(e.event_id) AS BIGINT) AS n_events_1h
    FROM (SELECT event_id, ts FROM events WHERE event_type = 'purchase') p
    LEFT JOIN events e
      ON e.ts > p.ts - INTERVAL 1 HOUR AND e.ts <= p.ts
     AND e.event_id <> p.event_id
    GROUP BY 1
"""


def sim_quantized_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 neighbors for the first 10 query vectors under
    **int8-quantized** cosine (operators/quantization.py): per-vector
    max-abs scaling to ``array<tinyint>``, integer dot products, scales
    cancel in the cosine. 4× smaller vector payloads in every shuffle/
    broadcast; recall vs float32 brute force pinned ≥0.9 in pytest.

    Quantization is floor-half-up and the dots are exact integers, so
    the oracle replicates the identical arithmetic — an exact hash
    match, unlike float32 paths whose sums are order-dependent.
    """
    from spotify_data_pipeline_spark.operators.quantization import (
        cosine_topk_quantized,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    return cosine_topk_quantized(queries, emb, k=5)


_QCOS = (
    "(list_dot_product(a.q, b.q)"
    " / (sqrt(list_dot_product(a.q, a.q)) * sqrt(list_dot_product(b.q, b.q))))"
)

_SIM_QUANTIZED_ORACLE = f"""
    WITH z AS (
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
    )
    SELECT query_id, neighbor_id, qcos, rn FROM (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             floor({_QCOS} * 10000 + 0.5) / 10000 AS qcos,
             CAST(row_number() OVER (
               PARTITION BY a.vec_id
               ORDER BY floor({_QCOS} * 10000 + 0.5) / 10000 DESC, b.vec_id ASC
             ) AS BIGINT) AS rn
      FROM qz a JOIN qz b ON a.vec_id <> b.vec_id
      WHERE a.vec_id < 10
    ) WHERE rn <= 5
"""


def llm_quality_gopher_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rules quality filter (operators/textops.gopher_quality):
    word-count bounds, mean-word-length bounds, symbol ratio, alphabetic
    -word ratio, stopword floor → per-doc features + keep verdict.
    Map-only single-scan Catalyst; the oracle recomputes every feature
    from the same tokenization with identical half-up rounding.
    """
    from spotify_data_pipeline_spark.operators.textops import gopher_quality

    return gopher_quality(load_table(spark, sf_dir, "documents"))


_GOPHER_ORACLE = r"""
    WITH t AS (
      SELECT doc_id,
             CASE WHEN length(trim(text)) > 0
                  THEN string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')
                  ELSE CAST([] AS VARCHAR[]) END AS toks
      FROM documents
    ), f AS (
      SELECT doc_id,
             len(toks) AS nw,
             greatest(len(toks), 1) AS safe_n,
             coalesce(list_sum(list_transform(toks, x -> length(x))), 0) AS char_sum,
             len(list_filter(toks, x -> regexp_matches(x, '#|\.\.\.|…'))) AS n_symbol,
             len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS n_alpha,
             len(list_filter(toks, x -> list_contains(
               ['the','be','to','of','and','that','have','with'], x))) AS n_stop
      FROM t
    ), r AS (
      SELECT doc_id,
             CAST(nw AS BIGINT) AS n_words,
             floor(CAST(char_sum AS DOUBLE) / safe_n * 10000 + 0.5) / 10000 AS mean_word_len,
             floor(CAST(n_symbol AS DOUBLE) / safe_n * 10000 + 0.5) / 10000 AS symbol_ratio,
             floor(CAST(n_alpha AS DOUBLE) / safe_n * 10000 + 0.5) / 10000 AS alpha_word_ratio,
             CAST(n_stop AS BIGINT) AS n_stopwords
      FROM f
    )
    SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_word_ratio, n_stopwords,
           (n_words BETWEEN 50 AND 100000)
           AND (mean_word_len BETWEEN 3.0 AND 10.0)
           AND (symbol_ratio <= 0.1)
           AND (alpha_word_ratio >= 0.8)
           AND (n_stopwords >= 2) AS keep
    FROM r
"""


def text_bigram_lm_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram language-model statistics: the 20 most frequent
    (w1, w2) bigrams with conditional probability P(w2|w1) =
    count(w1,w2) / count(w1·), denominator derived from the bigram
    counts themselves (count of bigram *starts* — one lineage).

    Plan: one tokenization scan, in-array bigram construction (no
    self-join on positions), explode → hash agg on (w1,w2) with
    map-side combine, then the denominator as a window sum over the
    ALREADY-AGGREGATED pairs table — deriving it with a separate agg +
    self-join would make Catalyst recompute the whole scan+tokenize
    subtree (no cross-branch CSE), doubling the 100 TB read. The
    window's per-w1 groups are bounded by |vocab| rows (not corpus
    rows), so it is not the term-skew bomb the tfidf docstring
    rejects. Top-20 via TakeOrderedAndProject (n_pairs desc, w1, w2
    tiebreak).
    """
    from spotify_data_pipeline_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select(tokens(F.col("text")).alias("_toks"))
    bigrams = toked.where(F.size("_toks") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(_toks) - 1),"
                " i -> struct(_toks[i-1] AS w1, _toks[i] AS w2))"
            )
        ).alias("_bg")
    ).select("_bg.w1", "_bg.w2")
    from pyspark.sql import Window

    from spotify_data_pipeline_spark.plans.parity import rnd

    pairs = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("n_pairs"))
    n_w1 = F.sum("n_pairs").over(Window.partitionBy("w1"))
    scored = pairs.select(
        "w1",
        "w2",
        F.col("n_pairs").cast("long").alias("n_pairs"),
        rnd(F.col("n_pairs") / n_w1, 4).alias("p_cond"),
    )
    return scored.orderBy(F.col("n_pairs").desc(), "w1", "w2").limit(20)


_BIGRAM_ORACLE = r"""
    WITH t AS (
      SELECT string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
      FROM documents WHERE length(trim(text)) > 0
    ), bg AS (
      SELECT unnest(list_transform(range(2, len(toks) + 1),
                                   i -> struct_pack(w1 := toks[i-1], w2 := toks[i]))) AS s
      FROM t WHERE len(toks) >= 2
    ), pairs AS (
      SELECT s.w1 AS w1, s.w2 AS w2, count(*) AS n_pairs FROM bg GROUP BY 1, 2
    ), tot AS (
      SELECT w1, sum(n_pairs) AS n_w1 FROM pairs GROUP BY 1
    )
    SELECT p.w1, p.w2, CAST(p.n_pairs AS BIGINT) AS n_pairs,
           floor(CAST(p.n_pairs AS DOUBLE) / t.n_w1 * 10000 + 0.5) / 10000 AS p_cond
    FROM pairs p JOIN tot t USING (w1)
    ORDER BY p.n_pairs DESC, p.w1, p.w2
    LIMIT 20
"""


def agg_histogram_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order value: 24 bins of 25k plus a
    clamped tail bin — bin id, inclusive lower edge, order count, and
    exact revenue (integer-cents sum). One scan, one hash agg with
    map-side combine collapsing every partition to ≤24 rows; the
    floor-of-division binning is identical IEEE float64 on both
    engines, so bin edges cannot drift cross-engine.
    """
    from spotify_data_pipeline_spark.plans.parity import rnd_cents

    orders = load_table(spark, sf_dir, "orders")
    bin_col = F.least(
        F.floor(F.col("o_totalprice") / F.lit(25000.0)), F.lit(23).cast("long")
    ).cast("long")
    return (
        orders.select(bin_col.alias("bin"), rnd_cents("o_totalprice").alias("_c"))
        .groupBy("bin")
        .agg(F.count("*").alias("n_orders"), F.sum("_c").alias("_cents"))
        .select(
            "bin",
            (F.col("bin") * 25000.0).alias("bin_lo"),
            F.col("n_orders").cast("long").alias("n_orders"),
            (F.col("_cents") / 100.0).alias("revenue"),
        )
    )


_HISTOGRAM_ORACLE = """
    SELECT bin,
           bin * 25000.0 AS bin_lo,
           CAST(count(*) AS BIGINT) AS n_orders,
           sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) / 100.0 AS revenue
    FROM (
      SELECT least(CAST(floor(o_totalprice / 25000.0) AS BIGINT), 23) AS bin, o_totalprice
      FROM orders
    )
    GROUP BY bin
"""


def text_heavy_hitters_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 corpus tokens through the Misra–Gries mergeable summary
    (operators/heavyhitters.py) — the driver-checkable anchor for the
    sketch: capacity (200) exceeds this corpus's token vocabulary, so
    no counter is ever truncated and the summary's lower bounds ARE the
    exact counts (the capacity-exceeded guarantee path is pytest-gated
    in tests/test_heavyhitters.py, like the HLL/banding rows-only
    split). Output (v, cnt_lb, rank), rank tiebroken by token.
    """
    from spotify_data_pipeline_spark.functions.text import tokens
    from spotify_data_pipeline_spark.operators.heavyhitters import mg_build, mg_topk

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.lit("all").alias("g"), F.explode(tokens(F.col("text"))).alias("tok")
    )
    state = mg_build(toks, ["g"], "tok", capacity=200)
    return mg_topk(state, ["g"], 10).select("v", "cnt_lb", "rank")


_HEAVY_HITTERS_ORACLE = r"""
    WITH t AS (
      SELECT string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
      FROM documents WHERE length(trim(text)) > 0
    ), tok AS (
      SELECT unnest(toks) AS v FROM t
    ), c AS (
      SELECT v, CAST(count(*) AS BIGINT) AS cnt_lb FROM tok GROUP BY 1
    )
    SELECT v, cnt_lb, rank FROM (
      SELECT v, cnt_lb,
             CAST(row_number() OVER (ORDER BY cnt_lb DESC, v ASC) AS BIGINT) AS rank
      FROM c
    ) WHERE rank <= 10
"""


def agg_quantile_sketch_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p95/p99 of lineitem price (integer cents) per returnflag via
    the HdrHistogram-style mergeable sketch (operators/quantiles.py).
    The bucketing is integer-only (bitlen + shifts), so the oracle
    replicates the ENTIRE sketch — bucket, cumulate, rank — and the
    hash match pins the sketch itself, not a tolerance band (the
    mergeable-refresh guarantee — merged ≡ rebuilt, bit-equal — is
    pytest-gated in tests/test_quantiles.py).
    """
    from spotify_data_pipeline_spark.operators.quantiles import (
        hdr_build,
        hdr_quantiles,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.expr("CAST(floor(l_extendedprice * 100 + 0.5) AS LONG)").alias("cents"),
    )
    state = hdr_build(li, ["l_returnflag"], "cents", sub_bits=3)
    return hdr_quantiles(state, ["l_returnflag"], [0.5, 0.95, 0.99])


_QUANTILE_SKETCH_ORACLE = """
    WITH v AS (
      SELECT l_returnflag,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
      FROM lineitem
    ), b AS (
      SELECT l_returnflag,
             (cents >> greatest(length(printf('%b', cents)) - 4, 0))
               << greatest(length(printf('%b', cents)) - 4, 0) AS bucket_lo
      FROM v
    ), cnt AS (
      SELECT l_returnflag, bucket_lo, count(*) AS c FROM b GROUP BY 1, 2
    ), cum AS (
      SELECT l_returnflag, bucket_lo,
             sum(c) OVER (PARTITION BY l_returnflag ORDER BY bucket_lo) AS cum,
             sum(c) OVER (PARTITION BY l_returnflag) AS n
      FROM cnt
    ), qs AS (
      SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.95 AS DOUBLE), CAST(0.99 AS DOUBLE)]) AS q
    )
    SELECT l_returnflag, q, CAST(min(bucket_lo) AS BIGINT) AS est
    FROM cum CROSS JOIN qs
    WHERE cum >= ceil(q * n)
    GROUP BY 1, 2
"""


def dedup_tfidf_cosine_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDF-weighted shingle cosine near-dup pairs
    (operators/dedup.tfidf_shingle_cosine_pairs) at threshold 0.5 —
    the weighted family next to set-Jaccard. Integer weights make the
    whole sparse-vector pipeline (idf, norms, dots) exact, so the
    oracle replicates it bit-for-bit.
    """
    from spotify_data_pipeline_spark.operators.dedup import (
        tfidf_shingle_cosine_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    return tfidf_shingle_cosine_pairs(
        docs, id_col="doc_id", text_col="text", threshold=0.5
    )


_TFIDF_COSINE_ORACLE = r"""
    WITH t AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
      FROM documents WHERE length(trim(text)) > 0
    ), s AS (
      SELECT doc_id, unnest(
        CASE WHEN len(toks) >= 3
             THEN list_distinct(list_transform(range(1, len(toks) - 1),
                                               i -> array_to_string(toks[i:i+2], ' ')))
             ELSE [array_to_string(toks, ' ')] END) AS sh
      FROM t
    ), nn AS (
      SELECT count(*) AS n FROM documents
    ), dfc AS (
      SELECT sh, count(*) AS df FROM s GROUP BY 1
    ), w AS (
      SELECT s.doc_id, s.sh, ((SELECT n FROM nn) * 1000) // dfc.df AS w, dfc.df
      FROM s JOIN dfc USING (sh)
    ), nrm AS (
      SELECT doc_id, sum(w * w) AS nsq FROM w GROUP BY 1
    ), kept AS (
      SELECT doc_id, sh, w FROM w, nn
      WHERE df <= greatest(100, CAST(floor(0.10 * n) AS BIGINT))
    ), dots AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, sum(a.w * b.w) AS d
      FROM kept a JOIN kept b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           floor(d / (sqrt(CAST(na.nsq AS DOUBLE)) * sqrt(CAST(nb.nsq AS DOUBLE)))
                 * 10000 + 0.5) / 10000 AS cos
    FROM dots JOIN nrm na ON id_a = na.doc_id
              JOIN nrm nb ON id_b = nb.doc_id
    WHERE floor(d / (sqrt(CAST(na.nsq AS DOUBLE)) * sqrt(CAST(nb.nsq AS DOUBLE)))
                * 10000 + 0.5) / 10000 >= 0.5
"""


def events_anomaly_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection: 10-minute tumbling counts per
    event_type, flagged where the count deviates > 3σ from that type's
    own mean (population σ over its windows). The monitoring query a
    pipeline runs over its OWN event stream.

    Exactness: per-type Σn, Σn² and window counts are exact bigints
    (one window pass over the ALREADY-AGGREGATED counts table — a
    second agg + self-join would recompute the events scan, the
    bigram-LM lesson), so mean/σ/z are single identical float64
    expressions on both engines. Rows selected only where σ > 0, so z
    is always defined. Output (event_type, window_start, n_events, z).
    """
    from pyspark.sql import Window

    from spotify_data_pipeline_spark.plans.parity import rnd

    ev = load_table(spark, sf_dir, "events")
    counts = (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    wt = Window.partitionBy("event_type")
    stats = (
        counts.withColumn("_s1", F.sum("n").over(wt))
        .withColumn("_s2", F.sum(F.col("n") * F.col("n")).over(wt))
        .withColumn("_cnt", F.count("*").over(wt))
    )
    mean = F.col("_s1").cast("double") / F.col("_cnt")
    var = F.col("_s2").cast("double") / F.col("_cnt") - mean * mean
    std = F.sqrt(var)
    return (
        stats.where(F.abs(F.col("n") - mean) > 3.0 * std)
        .select(
            "event_type",
            "window_start",
            F.col("n").cast("long").alias("n_events"),
            rnd((F.col("n") - mean) / std, 4).alias("z"),
        )
    )


_EVENTS_ANOMALY_ORACLE = """
    WITH c AS (
      SELECT event_type, time_bucket(INTERVAL 10 MINUTE, ts) AS window_start,
             count(*) AS n
      FROM events GROUP BY 1, 2
    ), s AS (
      SELECT event_type, window_start, n,
             sum(n) OVER (PARTITION BY event_type) AS s1,
             sum(n*n) OVER (PARTITION BY event_type) AS s2,
             count(*) OVER (PARTITION BY event_type) AS cnt
      FROM c
    )
    SELECT event_type, window_start, CAST(n AS BIGINT) AS n_events,
           floor((n - CAST(s1 AS DOUBLE)/cnt)
                 / sqrt(CAST(s2 AS DOUBLE)/cnt
                        - (CAST(s1 AS DOUBLE)/cnt)*(CAST(s1 AS DOUBLE)/cnt))
                 * 10000 + 0.5) / 10000 AS z
    FROM s
    WHERE abs(n - CAST(s1 AS DOUBLE)/cnt) >
          3.0 * sqrt(CAST(s2 AS DOUBLE)/cnt
                     - (CAST(s1 AS DOUBLE)/cnt)*(CAST(s1 AS DOUBLE)/cnt))
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
        "dedup_components",
        dedup_components_query,
        _DEDUP_COMPONENTS_ORACLE,
        tags=("dedup", "graph", "components"),
    ),
    PendingQuery(
        "data_quality_report",
        data_quality_report_query,
        _DATA_QUALITY_ORACLE,
        tags=("quality", "validation"),
    ),
    PendingQuery(
        "scd2_customer_tier",
        scd2_customer_tier_query,
        _SCD2_ORACLE,
        tags=("warehouse", "scd2", "history"),
    ),
    PendingQuery(
        "incremental_agg_fold",
        incremental_agg_fold_query,
        _INCREMENTAL_ORACLE,
        tags=("warehouse", "incremental", "agg"),
    ),
    PendingQuery(
        "dedup_incremental_screen",
        dedup_incremental_screen_query,
        _INCREMENTAL_SCREEN_ORACLE,
        tags=("dedup", "incremental", "text"),
    ),
    PendingQuery(
        "events_funnel",
        events_funnel_query,
        _EVENTS_FUNNEL_ORACLE,
        tags=("events", "analytics", "funnel"),
    ),
    PendingQuery(
        "events_retention",
        events_retention_query,
        _EVENTS_RETENTION_ORACLE,
        tags=("events", "analytics", "retention"),
    ),
    PendingQuery(
        "events_transitions",
        events_transitions_query,
        _EVENTS_TRANSITIONS_ORACLE,
        tags=("events", "analytics", "markov"),
    ),
    PendingQuery(
        "events_window_count",
        events_window_count_query,
        _EVENTS_WINDOW_COUNT_ORACLE,
        # headline: the binned range join is the most expensive new
        # physical shape this round — benched so BENCH_r04 exercises
        # every plan family (agg, SMJ, window, minhash, tfidf, range).
        headline=True,
        tags=("events", "rangejoin", "analytics"),
    ),
    PendingQuery(
        "sim_quantized_topk",
        sim_quantized_topk_query,
        _SIM_QUANTIZED_ORACLE,
        tags=("similarity", "quantization", "topk"),
    ),
    PendingQuery(
        "llm_quality_gopher",
        llm_quality_gopher_query,
        _GOPHER_ORACLE,
        tags=("llmops", "quality", "filter"),
    ),
    PendingQuery(
        "text_bigram_lm",
        text_bigram_lm_query,
        _BIGRAM_ORACLE,
        tags=("text", "ngram", "lm"),
    ),
    PendingQuery(
        "agg_histogram",
        agg_histogram_query,
        _HISTOGRAM_ORACLE,
        tags=("agg", "histogram"),
    ),
    PendingQuery(
        "text_heavy_hitters",
        text_heavy_hitters_query,
        _HEAVY_HITTERS_ORACLE,
        tags=("text", "sketch", "heavyhitters"),
    ),
    PendingQuery(
        "agg_quantile_sketch",
        agg_quantile_sketch_query,
        _QUANTILE_SKETCH_ORACLE,
        tags=("agg", "sketch", "quantiles", "incremental"),
    ),
    PendingQuery(
        "dedup_tfidf_cosine",
        dedup_tfidf_cosine_query,
        _TFIDF_COSINE_ORACLE,
        tags=("dedup", "text", "tfidf", "sparse"),
    ),
    PendingQuery(
        "events_anomaly",
        events_anomaly_query,
        _EVENTS_ANOMALY_ORACLE,
        tags=("events", "monitoring", "anomaly"),
    ),
)

# Activation (round 4): register every staged query in PENDING order.
# declare() records a monotonic sequence per name, and registry order is
# (_QUERY_MODULES index, declaration sequence) — with this module first
# in _QUERY_MODULES these occupy driver positions 0–16.
for _pq in PENDING:
    declare(_pq.name, oracle=_pq.oracle, headline=_pq.headline, tags=_pq.tags)(_pq.fn)
