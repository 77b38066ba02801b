"""Round-10 declared-query staging area (same contract as the
round-6..9 areas: built and oracle-verified NOW, deliberately NOT
declared — the earlier activation windows are fully planned).

Each entry: exact-oracle query + DuckDB SQL, exercised by
``tests/test_roundten_pending.py`` with the driver-shaped comparison.
Families: alert-fatigue suppression (the emit-then-cooldown
non-associative fold — which surfaced and works around a NEW DuckDB
1.0.0 list_reduce cross-group misalignment, pinned in tests),
randomness screening (Wald-Wolfowitz runs), training-mixture planning
(epochs via exact largest-remainder budgeting), Kaplan-Meier survival
with right censoring (integer ppm prefix folds), regex-function
breadth, the skyline/Pareto-frontier operator (set-based, naive
NOT EXISTS oracle), integer-exact STL-lite seasonal
decomposition, least-squares changepoint localization (binary
segmentation's first split, exact integer atoms + IEEE-identical
score), Kneser-Ney continuation counts (the KN unigram numerator),
the chi-square test of independence (the contingency-table
member of the chi-square family), exact mergeable bitmap distinct
counting (the production exact counterpart of the HLL family),
time-weighted averages (LOCF duration weighting, DECIMAL/HUGEINT
numerators), exact join-size estimation from key histograms
(the self-join blowup detector), l-diversity (the homogeneity
attack k-anonymity misses, reported as the exact l distribution),
an exact 1R decision stump (integer majority-vote errors), and
cross-correlation Pearson atoms at calendar lags (the ACF query's
bivariate lead/lag sibling), cross-table financial reconciliation
(header vs line totals, full-outer categories), open-pipeline aging
brackets (the AR-aging shape), and the purchase graph's log2 degree
histogram (the skew diagnostic the hub-cap designs presuppose).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
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


_COOLDOWN_US = 14_400_000_000  # 4 hours — chosen so the rule BITES
# at every SF (sf0.001's minimum inter-error gap is ~49 min; the 5th
# percentile ~2.1 h; the median ~35 h — both branches data-exercised)


def events_alert_suppression_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alert-fatigue suppression — the paging rule every monitoring
    stack applies: per user, an error EMITS a page only if >= 4
    hours have passed since the last EMITTED page; everything closer
    is suppressed. The recursion references its own output (the last
    *emitted* time, not the last event), so no window frame computes
    it — like the wallet and rate-limit folds it runs the per-user
    ordered event array through the ``aggregate`` HOF: per-key
    sequential, corpus-parallel, zero Python. TWO DuckDB list_reduce
    1.0.0 hazards are engineered around, one known and one NEW: (a)
    state field order (emt, sup, last) — each field reads only fields
    updated later (the rate-limit lesson); (b) a result field must
    never return the accumulator field VERBATIM in a branch — 'last''s
    ELSE acc.last alone made DuckDB pair fold RESULTS with the WRONG
    GROUPS (32/150 users got another user's totals; minimal repro in
    tests), because the in-place evaluator mishandles the copy-self
    branch across the vector of concurrent folds. Wrapping in
    greatest(acc.last, CASE ...) forces every branch to COMPUTE —
    semantics identical (times ascend), bug gone; both engines carry
    the same wrapped tree. Sentinel last=-10^18 makes the first error
    always page. Exact epoch-µs integers."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "error"
    )
    fold = f"""
      aggregate(
        array_sort(collect_list(named_struct('pus', _us, 'eid', event_id))),
        named_struct('emt', CAST(0 AS BIGINT), 'sup', CAST(0 AS BIGINT),
                     'last', CAST(-1000000000000000000 AS BIGINT)),
        (acc, e) -> named_struct(
          'emt', acc.emt + CASE WHEN e.pus - acc.last >= {_COOLDOWN_US}
                                THEN 1 ELSE 0 END,
          'sup', acc.sup + CASE WHEN e.pus - acc.last >= {_COOLDOWN_US}
                                THEN 0 ELSE 1 END,
          'last', greatest(acc.last,
                           CASE WHEN e.pus - acc.last >= {_COOLDOWN_US}
                                THEN e.pus ELSE acc.last END)))
    """
    per_user = (
        ev.select(
            "user_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("_us"),
            "event_id",
        )
        .groupBy("user_id")
        .agg(F.count("*").alias("n_errors"), F.expr(fold).alias("_st"))
    )
    return per_user.select(
        "user_id",
        F.col("n_errors").cast("long").alias("n_errors"),
        F.col("_st.emt").alias("pages_sent"),
        F.col("_st.sup").alias("suppressed"),
        F.col("_st.last").alias("last_page_us"),
    ).orderBy("user_id")


_ALERT_ORACLE = f"""
    WITH ev AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'error'
    ), st AS (
      -- field order (emt, sup, last): every field reads only fields
      -- updated LATER (DuckDB list_reduce mutates the accumulator
      -- field-by-field — the rate-limit fold's documented pattern)
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_errors,
             list_reduce(
               list_prepend(
                 {{'emt': CAST(0 AS BIGINT), 'sup': CAST(0 AS BIGINT),
                   'last': CAST(-1000000000000000000 AS BIGINT)}},
                 list({{'emt': CAST(0 AS BIGINT), 'sup': CAST(0 AS BIGINT),
                        'last': epoch_us(ts)}} ORDER BY ts, event_id)),
               (acc, e) -> {{
                 'emt': acc.emt + CASE WHEN e.last - acc.last >= {_COOLDOWN_US}
                                       THEN 1 ELSE 0 END,
                 'sup': acc.sup + CASE WHEN e.last - acc.last >= {_COOLDOWN_US}
                                       THEN 0 ELSE 1 END,
                 'last': greatest(acc.last,
                                  CASE WHEN e.last - acc.last >= {_COOLDOWN_US}
                                       THEN e.last ELSE acc.last END)}}
             ) AS s
      FROM ev GROUP BY 1
    )
    SELECT user_id, n_errors, s.emt AS pages_sent, s.sup AS suppressed,
           s.last AS last_page_us
    FROM st ORDER BY user_id
"""


def agg_runs_test_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs screening of daily revenue — the randomness
    check a forecasting/fraud pipeline runs before trusting a series
    (too FEW runs = trending/sticky, too MANY = oscillating): per
    year, the up/down sign sequence of day-over-day changes (zero
    changes dropped, the standard treatment), its run count (sign !=
    previous sign starts a run), and the n_up/n_down counts the
    expected-runs formula consumes downstream — the z-score's sqrt
    stays OUT (the non-reproducible step, as with the ACF atoms).
    Two window passes over the daily frame, all integers."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    )
    daily = orders.groupBy(
        F.to_date(F.date_trunc("day", "o_orderdate")).alias("day")
    ).agg(
        F.expr(
            "sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))"
        ).alias("cents")
    )
    w = Window.partitionBy().orderBy("day")
    signed = (
        daily.withColumn("prev", F.lag("cents").over(w))
        .where(F.col("prev").isNotNull() & (F.col("cents") != F.col("prev")))
        .select(
            F.year("day").alias("yr"),
            "day",
            F.when(F.col("cents") > F.col("prev"), 1).otherwise(-1).alias("sgn"),
        )
    )
    wy = Window.partitionBy("yr").orderBy("day")
    runs = signed.withColumn("prev_sgn", F.lag("sgn").over(wy)).withColumn(
        "new_run",
        (F.col("prev_sgn").isNull() | (F.col("sgn") != F.col("prev_sgn"))).cast(
            "long"
        ),
    )
    return (
        runs.groupBy("yr")
        .agg(
            F.sum(F.when(F.col("sgn") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_up"),
            F.sum(F.when(F.col("sgn") == -1, 1).otherwise(0))
            .cast("long")
            .alias("n_down"),
            F.sum("new_run").cast("long").alias("n_runs"),
        )
        .orderBy("yr")
    )


_RUNS_TEST_ORACLE = """
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
      FROM orders GROUP BY 1
    ), signed AS (
      SELECT year(day) AS yr, day,
             CASE WHEN cents > prev THEN 1 ELSE -1 END AS sgn
      FROM (SELECT day, cents, lag(cents) OVER (ORDER BY day) AS prev FROM daily)
      WHERE prev IS NOT NULL AND cents <> prev
    ), runs AS (
      SELECT yr, sgn,
             CASE WHEN prev_sgn IS NULL OR sgn <> prev_sgn THEN 1 ELSE 0 END AS new_run
      FROM (SELECT yr, day, sgn,
                   lag(sgn) OVER (PARTITION BY yr ORDER BY day) AS prev_sgn
            FROM signed)
    )
    SELECT yr,
           CAST(sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
           CAST(sum(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_down,
           CAST(sum(new_run) AS BIGINT) AS n_runs
    FROM runs
    GROUP BY yr ORDER BY yr
"""


_MIX_BUDGET = 1_000_000  # target training tokens
_MIX_WEIGHTS = {  # the desired mixture, summing to 100
    "src0": 40,
    "src1": 20,
    "src2": 20,
    "src3": 10,
    "src4": 10,
}


def llm_mixture_epochs_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture planning — given a target token budget and a
    desired source mixture, how many tokens does each source owe, and
    how many EPOCHS (repeats) of that source does that imply? The
    budget splits by ``largest_remainder_allocation``
    (operators/allocation.py — sums to the budget EXACTLY, quota
    property per source); epochs are a parts-per-thousand integer
    ratio target*1000 DIV available (>1000 = the source must repeat,
    the up-sampling regime; <1000 = subsample). Unknown sources get
    weight 0 and fall out of the plan with an explicit zero row —
    visible, not silently dropped. One aggregation over documents +
    window arithmetic on the tiny per-source frame."""
    from spotify_data_pipeline_spark.operators.allocation import (
        largest_remainder_allocation,
    )

    docs = load_table(spark, sf_dir, "documents")
    wexpr = F.coalesce(
        *[
            F.when(F.col("source") == s, F.lit(w))
            for s, w in _MIX_WEIGHTS.items()
        ],
        F.lit(0),
    ).cast("long")
    avail = (
        docs.select("source", "n_chars")
        .groupBy("source")
        .agg(F.sum("n_chars").cast("long").alias("available"))
        .withColumn("w", wexpr)
    )
    alloc = largest_remainder_allocation(
        avail, "source", "w", _MIX_BUDGET, out_col="target_tokens"
    )
    return alloc.select(
        "source",
        "available",
        F.col("w").alias("weight"),
        "target_tokens",
        F.expr("target_tokens * 1000 DIV available").cast("long").alias(
            "epochs_x1000"
        ),
    ).orderBy("source")


def _mixture_oracle() -> str:
    cases = " ".join(
        f"WHEN '{s}' THEN {w}" for s, w in _MIX_WEIGHTS.items()
    )
    return f"""
    WITH avail AS (
      SELECT source, CAST(sum(n_chars) AS BIGINT) AS available,
             CAST(CASE source {cases} ELSE 0 END AS BIGINT) AS w
      FROM documents GROUP BY 1
    ), staged AS (
      SELECT *, sum(w) OVER () AS tot,
             ({_MIX_BUDGET} * w) // sum(w) OVER () AS base,
             ({_MIX_BUDGET} * w) % sum(w) OVER () AS rem
      FROM avail
    ), ranked AS (
      SELECT *, row_number() OVER (ORDER BY rem DESC, source ASC) AS rk,
             {_MIX_BUDGET} - sum(base) OVER () AS leftover
      FROM staged
    )
    SELECT source, available, w AS weight,
           CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
             AS target_tokens,
           CAST(((base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END) * 1000)
                // available AS BIGINT) AS epochs_x1000
    FROM ranked
    ORDER BY source
    """


_KM_HORIZON_H = 72  # observation horizon (hours): conversions later than
# this are CENSORED — chosen so both branches bite at every SF (at
# sf0.001 every signup converts within 0-4 days, so an unbounded
# horizon would leave the censoring branch vacuous — the Q7 lesson)


def events_survival_km_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival of signup->purchase conversion (right-
    censored at a 72h observation horizon) — the survival-analysis
    family's entry point, exact: the KM table (t, n_at_risk, d_events,
    c_censored) comes from ONE descending cumulative window (everyone
    leaves the risk set at exactly their observed time, so n_t is the
    suffix sum of leavers — no per-t join), and the survival curve
    S(t) = prod (1 - d/n), the sequential floor-ppm fold no window
    can express, folds a PREFIX SLICE of the broadcast (t, n, d)
    array per output row: the timepoint domain is horizon-bounded
    (<=73 rows), so O(T^2) prefix folds are trivial while the USER
    table scales freely. (n, d) pack into one BIGINT (n*2^20 + d —
    n < 2^20 documented) because DuckDB's list_reduce demands
    accumulator type == element type; the scalar-BIGINT fold shape is
    the one measured IMMUNE to the copy-self hazard pinned below.
    S_ppm is floor-rounded at every step — the deterministic
    sequential definition both engines replicate exactly."""
    ev = load_table(spark, sf_dir, "events")
    signup = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.expr("unix_micros(ts)")).alias("s_us"))
    )
    purch = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.expr("unix_micros(ts)").alias("p_us")
    )
    first_p = (
        signup.join(purch, "user_id")
        .where(F.col("p_us") >= F.col("s_us"))
        .groupBy("user_id")
        .agg(F.min("p_us").alias("fp_us"))
    )
    obs = (
        signup.join(first_p, "user_id", "left")
        .select(
            "user_id",
            F.expr("(fp_us - s_us) DIV 3600000000").alias("dur_h"),
        )
        .select(
            F.when(
                F.col("dur_h").isNotNull() & (F.col("dur_h") <= _KM_HORIZON_H),
                F.col("dur_h"),
            )
            .otherwise(F.lit(_KM_HORIZON_H))
            .alias("t"),
            (
                F.col("dur_h").isNotNull()
                & (F.col("dur_h") <= _KM_HORIZON_H)
            )
            .cast("long")
            .alias("event"),
        )
    )
    km = obs.groupBy("t").agg(
        F.sum("event").alias("d"),
        F.sum(1 - F.col("event")).alias("c"),
    )
    from pyspark.sql import Window

    w_desc = Window.partitionBy().orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_asc = Window.partitionBy().orderBy("t")
    km2 = (
        km.withColumn("n", F.sum(F.col("d") + F.col("c")).over(w_desc))
        .withColumn("idx", F.row_number().over(w_asc))
        .withColumn("packed", F.expr("n * 1048576 + d"))
    )
    arr = km2.groupBy().agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("t"), F.col("packed")))
        ).alias("karr")
    )
    folded = km2.crossJoin(F.broadcast(arr)).withColumn(
        "s_ppm",
        F.expr(
            "aggregate(slice(transform(karr, e -> e.packed), 1, idx),"
            " CAST(1000000 AS BIGINT),"
            " (acc, e) -> (acc * ((e DIV 1048576) - (e % 1048576)))"
            " DIV (e DIV 1048576))"
        ),
    )
    return folded.select(
        F.col("t").cast("long").alias("t_hours"),
        F.col("n").cast("long").alias("n_at_risk"),
        F.col("d").cast("long").alias("d_events"),
        F.col("c").cast("long").alias("c_censored"),
        F.col("s_ppm").cast("long").alias("s_ppm"),
    ).orderBy("t_hours")


_KM_ORACLE = f"""
    WITH signup AS (
      SELECT user_id, min(epoch_us(ts)) AS s_us
      FROM events WHERE event_type = 'signup' GROUP BY 1
    ), first_p AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS fp_us
      FROM events e JOIN signup s
        ON e.user_id = s.user_id AND epoch_us(e.ts) >= s.s_us
      WHERE e.event_type = 'purchase'
      GROUP BY 1
    ), obs AS (
      SELECT CASE WHEN dur_h IS NOT NULL AND dur_h <= {_KM_HORIZON_H}
                  THEN dur_h ELSE {_KM_HORIZON_H} END AS t,
             CASE WHEN dur_h IS NOT NULL AND dur_h <= {_KM_HORIZON_H}
                  THEN 1 ELSE 0 END AS event
      FROM (
        SELECT s.user_id, (f.fp_us - s.s_us) // 3600000000 AS dur_h
        FROM signup s LEFT JOIN first_p f USING (user_id)
      )
    ), km AS (
      SELECT t, sum(event) AS d, sum(1 - event) AS c FROM obs GROUP BY t
    ), km2 AS (
      SELECT t, d, c,
             sum(d + c) OVER (ORDER BY t DESC
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS n,
             row_number() OVER (ORDER BY t) AS idx
      FROM km
    ), arr AS (
      SELECT list(n * 1048576 + d ORDER BY t) AS karr FROM km2
    )
    SELECT CAST(t AS BIGINT) AS t_hours,
           CAST(n AS BIGINT) AS n_at_risk,
           CAST(d AS BIGINT) AS d_events,
           CAST(c AS BIGINT) AS c_censored,
           CAST(list_reduce(
             list_prepend(CAST(1000000 AS BIGINT), karr[1:idx]),
             (acc, e) -> (acc * ((e // 1048576) - (e % 1048576)))
                         // (e // 1048576)) AS BIGINT) AS s_ppm
    FROM km2, arr
    ORDER BY t_hours
"""


def fn_regex_suite_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex-function breadth row (the pattern-matching sibling of the
    string/datetime suites): extract-with-group, global replace (via
    md5 to bound the compared payload), occurrence counting (Spark's
    regexp_count vs DuckDB's len(regexp_extract_all) — different
    spellings, same semantics, pinned), and boolean match as BIGINT
    0/1. Map-only, one scan."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_extract(F.col("text"), r"^(\w+)", 1).alias("first_word"),
        F.md5(
            F.regexp_replace(F.lower(F.col("text")), r"[aeiou]", "")
        ).alias("devoweled_md5"),
        F.expr(r"regexp_count(text, '[0-9]')").cast("long").alias("n_digits"),
        F.col("text").rlike(r"[0-9]{2,}").cast("long").alias("has_long_number"),
    ).orderBy("doc_id")


_REGEX_SUITE_ORACLE = r"""
    SELECT doc_id,
           regexp_extract(text, '^(\w+)', 1) AS first_word,
           md5(regexp_replace(lower(text), '[aeiou]', '', 'g'))
             AS devoweled_md5,
           CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digits,
           CAST(CASE WHEN regexp_matches(text, '[0-9]{2,}')
                     THEN 1 ELSE 0 END AS BIGINT) AS has_long_number
    FROM documents
    ORDER BY doc_id
"""


def part_skyline_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto-frontier) query — the classic multi-objective
    operator (Borzsony/Kossmann/Stocker ICDE'01): parts not DOMINATED
    in (minimize retail price, maximize size); q dominates p iff q is
    <= on price and >= on size with at least one strict. Identical
    (price, size) points do not dominate each other — all survive.
    Set-based form, no O(n^2) self-join: collapse to distinct prices
    with their per-price max size, one running strict-predecessor max
    over that (domain-bounded) price frame, then p survives iff its
    size exceeds every cheaper point's best size AND equals its own
    price group's best. The ORACLE is the naive NOT EXISTS dominance
    scan — the optimized-vs-naive proof pattern (events_window_count
    precedent). Price enters as exact cents."""
    from pyspark.sql import Window

    part = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_name",
        F.expr("CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)").alias(
            "price_cents"
        ),
        F.col("p_size").cast("long").alias("size"),
    )
    per_price = part.groupBy("price_cents").agg(F.max("size").alias("gmax"))
    w = Window.partitionBy().orderBy("price_cents").rowsBetween(
        Window.unboundedPreceding, -1
    )
    bests = per_price.withColumn(
        "prev_best", F.max("gmax").over(w)
    )
    return (
        part.join(bests, "price_cents")
        .where(
            (F.col("size") == F.col("gmax"))
            & (
                F.col("prev_best").isNull()
                | (F.col("size") > F.col("prev_best"))
            )
        )
        .select("p_partkey", "p_name", "price_cents", "size")
        .orderBy("price_cents", "size", "p_partkey")
    )


_SKYLINE_ORACLE = """
    WITH p AS (
      SELECT p_partkey, p_name,
             CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_cents,
             CAST(p_size AS BIGINT) AS size
      FROM part
    )
    SELECT p_partkey, p_name, price_cents, size
    FROM p
    WHERE NOT EXISTS (
      SELECT 1 FROM p q
      WHERE q.price_cents <= p.price_cents AND q.size >= p.size
        AND (q.price_cents < p.price_cents OR q.size > p.size)
    )
    ORDER BY price_cents, size, p_partkey
"""


def orders_seasonal_decompose_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical seasonal decomposition of daily revenue, STL-lite and
    INTEGER-EXACT end to end: trend = centered 7-day moving average
    (floor-DIV, emitted only where the full window exists), detrended
    = x - trend, seasonal = per-day-of-week LOWER MEDIAN of the
    detrended series (the discrete order statistic — DuckDB's median()
    averages the middle pair into a float on even counts, so both
    engines instead pick the element at rank (n+1) DIV 2), residual =
    detrended - seasonal. Additive decomposition x = trend + seasonal
    + residual holds by construction. Windows partition trivially (the
    daily frame is calendar-bounded); the heavy lifting — orders to
    daily — is one hash agg."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    )
    daily = orders.groupBy(
        F.to_date(F.date_trunc("day", "o_orderdate")).alias("day")
    ).agg(
        F.expr(
            "sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) DIV 100"
        ).alias("x")
    )
    w7 = Window.partitionBy().orderBy("day").rowsBetween(-3, 3)
    trended = (
        daily.withColumn("n7", F.count("*").over(w7))
        .withColumn("sum7", F.sum("x").over(w7))
        .where(F.col("n7") == 7)
        .select("day", "x", F.expr("sum7 DIV 7").alias("trend"))
        .withColumn("detrended", F.col("x") - F.col("trend"))
        .withColumn("dow", F.dayofweek("day"))
    )
    wd = Window.partitionBy("dow").orderBy("detrended", "day")
    wdn = Window.partitionBy("dow")
    med = (
        trended.withColumn("rn", F.row_number().over(wd))
        .withColumn("nd", F.count("*").over(wdn))
        .where(F.col("rn") == F.expr("(nd + 1) DIV 2"))
        .select("dow", F.col("detrended").alias("seasonal"))
    )
    return (
        trended.join(med, "dow")
        .select(
            "day",
            F.col("x").cast("long").alias("revenue_dollars"),
            F.col("trend").cast("long").alias("trend"),
            F.col("detrended").cast("long").alias("detrended"),
            F.col("seasonal").cast("long").alias("seasonal"),
            (F.col("detrended") - F.col("seasonal")).cast("long").alias("residual"),
        )
        .orderBy("day")
    )


_SEASONAL_ORACLE = """
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) // 100 AS x
      FROM orders GROUP BY 1
    ), trended AS (
      SELECT day, x, sum7 // 7 AS trend, x - sum7 // 7 AS detrended,
             dayofweek(day) + 1 AS dow
      FROM (
        SELECT day, x,
               count(*) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING
                              AND 3 FOLLOWING) AS n7,
               sum(x) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING
                            AND 3 FOLLOWING) AS sum7
        FROM daily
      ) WHERE n7 = 7
    ), med AS (
      SELECT dow, detrended AS seasonal
      FROM (
        SELECT dow, detrended,
               row_number() OVER (PARTITION BY dow
                                  ORDER BY detrended, day) AS rn,
               count(*) OVER (PARTITION BY dow) AS nd
        FROM trended
      ) WHERE rn = (nd + 1) // 2
    )
    SELECT t.day,
           CAST(t.x AS BIGINT) AS revenue_dollars,
           CAST(t.trend AS BIGINT) AS trend,
           CAST(t.detrended AS BIGINT) AS detrended,
           CAST(m.seasonal AS BIGINT) AS seasonal,
           CAST(t.detrended - m.seasonal AS BIGINT) AS residual
    FROM trended t JOIN med m USING (dow)
    ORDER BY t.day
"""


_HIER_BUDGET = 10_000_000  # cents


def agg_hierarchical_allocation_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical largest-remainder budgeting — the scale discipline
    the allocation operator's docstring prescribes, demonstrated: a
    global budget first splits across NATIONS by revenue weight (the
    GLOBAL form — the nation frame is tiny, its unpartitioned windows
    are free), then each nation's share splits across its MARKET
    SEGMENTS (the PER-GROUP form — partitioned windows, a billion
    leaf groups would parallelize). Exactness composes: leaf
    allocations sum EXACTLY to each nation's share, nation shares sum
    EXACTLY to the budget, so the leaf total is the budget to the
    cent — the property naive two-level rounding loses twice over.
    Weights are exact revenue cents from one orders+customer join."""
    from spotify_data_pipeline_spark.operators.allocation import (
        largest_remainder_allocation,
        largest_remainder_allocation_per_group,
    )

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    leaf = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(F.sum("cents").alias("w"))
    )
    nation = leaf.groupBy("c_nationkey").agg(F.sum("w").alias("nw"))
    nation_alloc = largest_remainder_allocation(
        nation, "c_nationkey", "nw", _HIER_BUDGET, out_col="nation_budget"
    )
    leaf_in = leaf.join(
        nation_alloc.select("c_nationkey", "nation_budget"), "c_nationkey"
    )
    allocated = largest_remainder_allocation_per_group(
        leaf_in,
        "c_nationkey",
        "c_mktsegment",
        "w",
        "nation_budget",
        out_col="leaf_alloc",
    )
    return allocated.select(
        F.col("c_nationkey").cast("int").alias("c_nationkey"),
        "c_mktsegment",
        F.col("w").cast("long").alias("revenue_cents"),
        F.col("nation_budget").cast("long").alias("nation_budget"),
        F.col("leaf_alloc").cast("long").alias("leaf_alloc"),
    ).orderBy("c_nationkey", "c_mktsegment")


_HIER_ALLOC_ORACLE = f"""
    WITH leaf AS (
      SELECT c_nationkey, c_mktsegment,
             sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS w
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2
    ), nation AS (
      SELECT c_nationkey, sum(w) AS nw FROM leaf GROUP BY 1
    ), nstage AS (
      SELECT *, ({_HIER_BUDGET} * nw) // sum(nw) OVER () AS base,
             ({_HIER_BUDGET} * nw) % sum(nw) OVER () AS rem
      FROM nation
    ), nalloc AS (
      SELECT c_nationkey, nw,
             base + CASE WHEN row_number() OVER (ORDER BY rem DESC, c_nationkey ASC)
                         <= {_HIER_BUDGET} - sum(base) OVER () THEN 1 ELSE 0 END
               AS nation_budget
      FROM nstage
    ), lstage AS (
      SELECT l.c_nationkey, l.c_mktsegment, l.w, n.nation_budget,
             (n.nation_budget * l.w)
               // sum(l.w) OVER (PARTITION BY l.c_nationkey) AS base,
             (n.nation_budget * l.w)
               % sum(l.w) OVER (PARTITION BY l.c_nationkey) AS rem
      FROM leaf l JOIN nalloc n USING (c_nationkey)
    )
    SELECT CAST(c_nationkey AS INTEGER) AS c_nationkey, c_mktsegment,
           CAST(w AS BIGINT) AS revenue_cents,
           CAST(nation_budget AS BIGINT) AS nation_budget,
           CAST(base + CASE WHEN row_number() OVER (
                              PARTITION BY c_nationkey
                              ORDER BY rem DESC, c_mktsegment ASC)
                            <= nation_budget - sum(base) OVER (
                                 PARTITION BY c_nationkey)
                            THEN 1 ELSE 0 END AS BIGINT) AS leaf_alloc
    FROM lstage
    ORDER BY c_nationkey, c_mktsegment
"""


def events_ab_srm_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic A/B bucketing + the Sample-Ratio-Mismatch guard —
    the experimentation-platform admission check run before trusting
    any test readout: users hash into arms via md5 (engine-portable,
    unlike xxhash — the seeded-sampling precedent), and the report
    carries per-arm user counts plus the exact integer chi-square
    NUMERATOR cells against the intended 50/50 split: cell =
    (2*observed - total)^2 scaled by 1e6 DIV (2*total) per arm — the
    z/p-value conversion stays downstream (its sqrt/exp are the
    non-reproducible steps, per house rule). One distinct-users agg +
    a 2-row report."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select("user_id").distinct()
    arm = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("ab1:"), F.col("user_id").cast("string"))),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    counts = ev.select(arm.alias("arm")).groupBy("arm").agg(
        F.count("*").alias("n")
    )
    return (
        counts.withColumn("total", F.sum("n").over(Window.partitionBy()))
        .select(
            F.col("arm").cast("long").alias("arm"),
            F.col("n").cast("long").alias("n_users"),
            F.expr(
                "(2 * n - total) * (2 * n - total) * 1000000 DIV (2 * total)"
            )
            .cast("long")
            .alias("chi2_cell_x1e6"),
        )
        .orderBy("arm")
    )


_AB_SRM_ORACLE = """
    WITH u AS (
      SELECT DISTINCT user_id FROM events
    ), armed AS (
      -- DuckDB lacks conv(): 4-hex-digit positional fold, the
      -- rowset-digest oracle's precedent
      SELECT ((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 4096 + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 256 + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 16 + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1) * 1) % 2 AS arm
      FROM (SELECT substr(md5('ab1:' || CAST(user_id AS VARCHAR)), 1, 4) AS h
            FROM u)
    ), counts AS (
      SELECT arm, count(*) AS n FROM armed GROUP BY 1
    )
    SELECT CAST(arm AS BIGINT) AS arm,
           CAST(n AS BIGINT) AS n_users,
           CAST(((2 * n - sum(n) OVER ()) * (2 * n - sum(n) OVER ()) * 1000000)
                // (2 * sum(n) OVER ()) AS BIGINT) AS chi2_cell_x1e6
    FROM counts
    ORDER BY arm
"""


def orders_changepoint_day_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares changepoint LOCALIZATION on daily revenue — the
    first step of binary segmentation (Scott & Knott 1974; the AMOC
    model): pick the split day k that maximizes the between-segment
    sum of squares f(k) = s1²/n1 + s2²/n2 over prefix/suffix
    (count, sum) pairs. Complements the round-7 CUSUM query, which
    DETECTS drift against a fixed reference; this one LOCATES the
    single best break with no tuning constant.

    Exactness discipline: s1/s2 are exact whole-dollar BIGINTs; the
    numerator A = s1²·n2 + s2²·n1 is computed exactly in
    DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — s² exceeds int64 from
    sf0.1 up. The SCORE A/D (D = n1·n2) is compared in float64: an
    exact-rational argmax needs either an O(days²) tournament join or
    an M-scaled integer key that leaves DECIMAL(38) around sf5, so
    both engines instead cast the SAME exact integers A and D and
    perform the SAME single correctly-rounded division — identical
    IEEE doubles, identical argmax (the histogram precedent's
    argument). Ties (exact or rounded) break to the EARLIEST day via
    lexicographic (score, -i) max.

    Scale shape: one scan → one hash agg to the day table (calendar-
    bounded: ~2,405 rows at EVERY SF — the axis that does not grow
    with data), unpartitioned running windows over that bounded table,
    one struct max. No join anywhere; the 100 TB cost is the scan."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("_day")).agg(
        F.sum(F.expr("CAST(round(o_totalprice) AS BIGINT)")).alias("_dollars")
    )
    from pyspark.sql import Window

    w = Window.orderBy("_day")
    wall = Window.orderBy("_day").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cands = daily.select(
        "_day",
        F.row_number().over(w).alias("_i"),
        F.sum("_dollars").over(w).alias("_s1"),
        F.sum("_dollars").over(wall).alias("_s"),
        F.count("*").over(wall).alias("_t"),
    ).where(F.col("_i") < F.col("_t"))
    scored = cands.select(
        "_day",
        "_i",
        (F.col("_t") - F.col("_i")).alias("_n2"),
        "_s1",
        (F.col("_s") - F.col("_s1")).alias("_s2"),
    ).select(
        "_day",
        "_i",
        "_n2",
        "_s1",
        "_s2",
        (
            (
                F.col("_s1").cast("decimal(19,0)")
                * F.col("_s1").cast("decimal(19,0)")
                * F.col("_n2").cast("decimal(19,0)")
                + F.col("_s2").cast("decimal(19,0)")
                * F.col("_s2").cast("decimal(19,0)")
                * F.col("_i").cast("decimal(19,0)")
            ).cast("double")
            / (F.col("_i") * F.col("_n2")).cast("double")
        ).alias("_score"),
    )
    best = scored.agg(
        F.max(
            F.struct(
                F.col("_score").alias("s"),
                (-F.col("_i")).alias("ni"),
                F.col("_day").alias("day"),
                F.col("_i").alias("n1"),
                F.col("_n2").alias("n2"),
                F.col("_s1").alias("s1"),
                F.col("_s2").alias("s2"),
            )
        ).alias("_b")
    )
    return best.select(
        F.col("_b.day").cast("timestamp").alias("split_day"),
        F.col("_b.n1").cast("long").alias("n_days_before"),
        F.col("_b.n2").cast("long").alias("n_days_after"),
        F.col("_b.s1").cast("long").alias("dollars_before"),
        F.col("_b.s2").cast("long").alias("dollars_after"),
    ).select(
        "*",
        F.expr("dollars_before div n_days_before").alias("mean_before"),
        F.expr("dollars_after div n_days_after").alias("mean_after"),
    )


_CHANGEPOINT_ORACLE = """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             sum(CAST(round(o_totalprice) AS BIGINT)) AS dollars
      FROM orders GROUP BY 1
    ), cands AS (
      SELECT day,
             row_number() OVER (ORDER BY day) AS i,
             sum(dollars) OVER (ORDER BY day
                                ROWS UNBOUNDED PRECEDING) AS s1,
             sum(dollars) OVER () AS s,
             count(*) OVER () AS t
      FROM daily
    ), scored AS (
      SELECT day, i, t - i AS n2, s1, s - s1 AS s2,
             -- exact HUGEINT numerator, ONE correctly-rounded cast +
             -- ONE division: the identical IEEE double Spark computes
             CAST(CAST(s1 AS HUGEINT) * s1 * (t - i)
                  + CAST(s - s1 AS HUGEINT) * (s - s1) * i AS DOUBLE)
             / CAST(i * (t - i) AS DOUBLE) AS score
      FROM cands WHERE i < t
    )
    SELECT CAST(day AS TIMESTAMP) AS split_day,
           CAST(i AS BIGINT) AS n_days_before,
           CAST(n2 AS BIGINT) AS n_days_after,
           CAST(s1 AS BIGINT) AS dollars_before,
           CAST(s2 AS BIGINT) AS dollars_after,
           CAST(s1 // i AS BIGINT) AS mean_before,
           CAST(s2 // n2 AS BIGINT) AS mean_after
    FROM scored
    ORDER BY score DESC, i ASC
    LIMIT 1
"""


def text_kn_continuation_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser–Ney continuation counts (Kneser & Ney 1995; Chen &
    Goodman 1999) — the statistic that separates KN smoothing from
    plain frequency backoff: N1+(•w) = the number of DISTINCT left
    contexts word w follows, the KN unigram numerator ('how many
    bigram TYPES end in w'), famously small for 'francisco' despite
    its high raw frequency. Also emitted: N1+(w•) (distinct right
    contexts — the denominator atom of the KN lambda) and the raw
    bigram-start frequency (the one-lineage denominator trick the
    bigram-LM query documents). Top 50 by continuation count, term
    tiebreak (50 covers the synthetic corpus's whole vocabulary, so
    the low-continuation tail is in the checked result).

    Plan: ONE tokenize scan → in-array bigram construction → hash agg
    to the bigram-type table (vocab²-bounded, not corpus-bounded) —
    then each aggregated pair fans out to its two (term, side) rows
    IN-PLAN and a second vocab-bounded agg folds both direction
    counts and the start frequency in one pass. Deriving the three
    stats as separate aggs would rescan and re-tokenize the corpus
    per branch (no cross-branch CSE — the bigram-LM lesson); the
    explode keeps one lineage, two shuffles total."""
    from spotify_data_pipeline_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select(tokens(F.col("text")).alias("_toks"))
    bigrams = (
        toked.where(F.size("_toks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(_toks) - 1),"
                    " i -> struct(_toks[i-1] AS w1, _toks[i] AS w2))"
                )
            ).alias("_bg")
        )
        .select("_bg.w1", "_bg.w2")
    )
    pairs = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("_n"))
    sides = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("w2").alias("term"),
                    F.lit(0).alias("is_right"),
                    F.col("_n").alias("n"),
                ),
                F.struct(
                    F.col("w1").alias("term"),
                    F.lit(1).alias("is_right"),
                    F.col("_n").alias("n"),
                ),
            )
        ).alias("_s")
    ).select("_s.term", "_s.is_right", "_s.n")
    stats = sides.groupBy("term").agg(
        F.sum(F.when(F.col("is_right") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_left_types"),
        F.sum(F.when(F.col("is_right") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_right_types"),
        F.sum(F.when(F.col("is_right") == 1, F.col("n")).otherwise(0))
        .cast("long")
        .alias("freq_starts"),
    )
    return stats.orderBy(F.col("n_left_types").desc(), "term").limit(50)


_KN_CONTINUATION_ORACLE = r"""
    WITH t AS (
      SELECT string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
      FROM documents WHERE length(trim(text)) > 0
    ), bg AS (
      SELECT unnest(list_transform(range(2, len(toks) + 1),
                                   i -> struct_pack(w1 := toks[i-1], w2 := toks[i]))) AS s
      FROM t WHERE len(toks) >= 2
    ), pairs AS (
      SELECT s.w1 AS w1, s.w2 AS w2, count(*) AS n FROM bg GROUP BY 1, 2
    ), sides AS (
      SELECT w2 AS term, 0 AS is_right, n FROM pairs
      UNION ALL
      SELECT w1 AS term, 1 AS is_right, n FROM pairs
    )
    SELECT term,
           CAST(sum(CASE WHEN is_right = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_left_types,
           CAST(sum(CASE WHEN is_right = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_right_types,
           CAST(sum(CASE WHEN is_right = 1 THEN n ELSE 0 END) AS BIGINT)
             AS freq_starts
    FROM sides
    GROUP BY term
    ORDER BY n_left_types DESC, term
    LIMIT 50
"""


def events_chisq_independence_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of INDEPENDENCE between event type and
    day-of-week — the two-way contingency-table test, completing the
    chi-square family's third shape (goodness-of-fit vs uniform =
    orders_dow_seasonality; 2-cell sample-ratio = events_ab_srm;
    independence = this). Each cell's statistic
    (O - E)²/E with E = R·C/n enters cross-multiplied:
    cell·1e6 = (n·O - R·C)²·1e6 div (n·R·C) — every atom an exact
    integer, the deviation squared in DECIMAL(38,0)/HUGEINT (it
    exceeds int64 from sf0.1). Headroom: (n·O - R·C)²·1e6 stays
    inside DECIMAL(38) to ~100× this row count; past that the 1e6
    display scale is the documented dial (the ACF precedent).

    Day-of-week cross-engine trap (the fn_datetime_suite pin): Spark
    dayofweek() is 1=Sunday, DuckDB's is 0=Sunday — Spark subtracts 1
    so both emit 0=Sunday.

    Plan: one scan → one hash agg to the (type × dow) table (≤ 7·k
    rows, k = |event types| — bounded at every SF), then marginals as
    unpartitioned window sums over that bounded table. No join."""
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", (F.dayofweek("ts") - 1).cast("long").alias("dow")
    ).agg(F.count("*").alias("n_obs"))
    from pyspark.sql import Window

    r = F.sum("n_obs").over(Window.partitionBy("event_type"))
    c = F.sum("n_obs").over(Window.partitionBy("dow"))
    n = F.sum("n_obs").over(
        Window.partitionBy()
    )
    enriched = cells.select(
        "event_type",
        "dow",
        F.col("n_obs").cast("long").alias("n_obs"),
        r.cast("long").alias("row_total"),
        c.cast("long").alias("col_total"),
        n.cast("long").alias("_n"),
    )
    return enriched.select(
        "event_type",
        "dow",
        "n_obs",
        "row_total",
        "col_total",
        # ONE division by the full DECIMAL denominator: a chained
        # per-factor div's intermediate quotient (dev²·1e6/n) already
        # exceeds BIGINT, and n·R·C itself leaves int64 past ~sf10
        F.expr(
            "CAST((CAST(_n * n_obs - row_total * col_total AS DECIMAL(19,0))"
            "      * CAST(_n * n_obs - row_total * col_total AS DECIMAL(19,0))"
            "      * CAST(1000000 AS DECIMAL(19,0)))"
            " div (CAST(_n AS DECIMAL(19,0)) * row_total * col_total)"
            " AS BIGINT)"
        ).alias("chi2_cell_x1e6"),
    ).orderBy("event_type", "dow")


_CHISQ_INDEP_ORACLE = """
    WITH cells AS (
      SELECT event_type, CAST(dayofweek(ts) AS BIGINT) AS dow,
             CAST(count(*) AS BIGINT) AS n_obs
      FROM events GROUP BY 1, 2
    ), m AS (
      SELECT event_type, dow, n_obs,
             sum(n_obs) OVER (PARTITION BY event_type) AS row_total,
             sum(n_obs) OVER (PARTITION BY dow) AS col_total,
             sum(n_obs) OVER () AS n
      FROM cells
    )
    SELECT event_type, dow, n_obs,
           CAST(row_total AS BIGINT) AS row_total,
           CAST(col_total AS BIGINT) AS col_total,
           CAST((CAST(n * n_obs - row_total * col_total AS HUGEINT)
                 * (n * n_obs - row_total * col_total) * 1000000)
                // (CAST(n AS HUGEINT) * row_total * col_total)
                AS BIGINT) AS chi2_cell_x1e6
    FROM m
    ORDER BY event_type, dow
"""


def agg_bitmap_distinct_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable distinct counting via integer bitmaps — the
    production counterpart (ClickHouse groupBitmap / Doris BITMAP
    columns) of the approximate-mergeable HLL the engine already
    carries: user ids bucket into 63-bit words (word = id div 63,
    bit = id mod 63 — bit 63 stays clear because BOTH engines fault
    or sign-flip on 1<<63), words OR-merge associatively, and
    popcount-sum recovers the EXACT distinct count at any rollup
    level. The query proves the mergeability end-to-end: daily word
    bitmaps are built first, MONTH words are derived by OR-merging
    the day words (never re-touching raw events), and the oracle is
    plain COUNT(DISTINCT) — exactness of the merged path is what the
    driver hash-checks. Also emitted: the nonzero word count (bitmap
    memory accounting), oracle COUNT(DISTINCT id div 63).

    This solves the non-additivity trap events_uniques_rollup
    demonstrates (distinct counts cannot be summed up a hierarchy) by
    the OTHER production route: recompute-free exact rollup at the
    cost of |id-space|/63 words per group. At 100 TB the refinement
    is roaring-style containers + dictionary-encoded ids; the word
    relation here IS that design's dense container. (Library form:
    operators/bitmap.py — build/merge/cardinality with their own
    property suite.)"""
    from spotify_data_pipeline_spark.operators.bitmap import (
        bitmap_build,
        bitmap_cardinality,
        bitmap_merge,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("_day"), "user_id"
    )
    daily = bitmap_build(ev, "user_id", ["event_type", "_day"])
    monthly = bitmap_merge(
        daily.select(
            "event_type",
            F.trunc("_day", "month").alias("_month"),
            "_word",
            "_w",
        ),
        ["event_type", "_month"],
    )
    return (
        bitmap_cardinality(
            monthly, ["event_type", "_month"], out_col="n_distinct_users"
        )
        .select(
            "event_type",
            F.col("_month").cast("timestamp").alias("month"),
            "n_distinct_users",
            "n_words",
        )
        .orderBy("event_type", "month")
    )


_BITMAP_DISTINCT_ORACLE = """
    SELECT event_type,
           CAST(date_trunc('month', ts) AS TIMESTAMP) AS month,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct_users,
           CAST(count(DISTINCT user_id // 63) AS BIGINT) AS n_words
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
"""


def events_twap_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (TWAP) — the financial /
    IoT aggregate where each observation counts for HOW LONG it was
    the latest, not how often it was reported: under LOCF each value
    holds from its event to the next, so
    twap = Σ vᵢ·(tᵢ₊₁ − tᵢ) / (t_last − t_first). A plain AVG
    over-weights chatty reporting periods; the duration weighting is
    what de-biases it. Exactness: values as integer cents, gaps as
    exact epoch-µs; the numerator Σ cents·gap_µs exceeds int64 on
    multi-year spans, so it accumulates in DECIMAL(38,0)/HUGEINT and
    only the final BIGINT quotient (twap in cents) is emitted.
    Equal-timestamp ties are harmless by construction: both engines
    order by (ts, event_id) and a zero-length interval contributes
    zero weight whatever its value. Single-event users carry no
    interval and are excluded (den = 0). One window pass (lead), one
    hash agg — no join, no Python."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("_us"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("_cents"),
    )
    w = Window.partitionBy("user_id").orderBy("_us", "event_id")
    seg = ev.withColumn("_next", F.lead("_us").over(w)).where(
        F.col("_next").isNotNull()
    )
    per_user = seg.groupBy("user_id").agg(
        (F.count("*") + 1).cast("long").alias("n_events"),
        F.sum(
            F.col("_cents").cast("decimal(19,0)")
            * (F.col("_next") - F.col("_us")).cast("decimal(19,0)")
        ).alias("_num"),
        F.sum(F.col("_next") - F.col("_us")).cast("long").alias("span_us"),
    )
    return per_user.select(
        "user_id",
        "n_events",
        "span_us",
        F.expr("CAST(_num div span_us AS BIGINT)").alias("twap_cents"),
    ).orderBy("user_id")


_TWAP_ORACLE = """
    WITH seg AS (
      SELECT user_id,
             epoch_us(ts) AS us,
             CAST(round(value * 100) AS BIGINT) AS cents,
             lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
      FROM events
    )
    SELECT user_id,
           CAST(count(*) + 1 AS BIGINT) AS n_events,
           CAST(sum(nxt - us) AS BIGINT) AS span_us,
           CAST(sum(CAST(cents AS HUGEINT) * (nxt - us))
                // sum(CAST(nxt - us AS HUGEINT)) AS BIGINT) AS twap_cents
    FROM seg
    WHERE nxt IS NOT NULL
    GROUP BY user_id
    ORDER BY user_id
"""


def ops_join_size_estimate_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact join-output-size accounting from a key histogram — the
    optimizer's cardinality question answered precisely BEFORE the
    join runs: for the lineitem×lineitem self-join on l_partkey,
    |A ⋈ A| = Σₖ cnt(k)², computed from the per-key counts alone
    (the histogram is |keys|-sized; the join it predicts is
    quadratically larger). The skew complement of ops_skew_report:
    that query flags LINEAR per-key shuffle share; this one flags the
    QUADRATIC blowup a hot key contributes to a self-join — the
    all-pairs bomb the dedup operators' capped-bucket designs exist
    to avoid. Emitted: the 10 heaviest keys with their pair counts
    and ppm share of the total predicted join size, plus the global
    totals each row carries from a 1-row broadcast aggregate (the
    documented tfidf/sim_cosine pattern; whitelisted). The histogram
    lineage is referenced twice (top-10 branch + totals branch) —
    at 100 TB the production move is checkpointing the tiny
    histogram; the recompute here is two scans, stated honestly."""
    li = load_table(spark, sf_dir, "lineitem")
    hist = li.groupBy("l_partkey").agg(F.count("*").alias("_cnt"))
    contrib = hist.select(
        "l_partkey",
        F.col("_cnt").cast("long").alias("n_rows"),
        (F.col("_cnt") * F.col("_cnt")).cast("long").alias("pair_rows"),
    )
    totals = contrib.agg(
        F.sum("n_rows").cast("long").alias("total_rows"),
        F.sum("pair_rows").cast("long").alias("total_join_rows"),
        F.count("*").cast("long").alias("n_keys"),
    )
    top = contrib.orderBy(
        F.col("pair_rows").desc(), "l_partkey"
    ).limit(10)
    return (
        top.crossJoin(F.broadcast(totals))
        .select(
            "l_partkey",
            "n_rows",
            "pair_rows",
            "total_rows",
            "total_join_rows",
            "n_keys",
            F.expr(
                "CAST(pair_rows * 1000000 div total_join_rows AS BIGINT)"
            ).alias("share_ppm"),
        )
        .orderBy(F.col("pair_rows").desc(), "l_partkey")
    )


_JOIN_SIZE_ORACLE = """
    WITH hist AS (
      SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(*) * count(*) AS BIGINT) AS pair_rows
      FROM lineitem GROUP BY 1
    ), tot AS (
      SELECT CAST(sum(n_rows) AS BIGINT) AS total_rows,
             CAST(sum(pair_rows) AS BIGINT) AS total_join_rows,
             CAST(count(*) AS BIGINT) AS n_keys
      FROM hist
    )
    SELECT h.l_partkey, h.n_rows, h.pair_rows,
           t.total_rows, t.total_join_rows, t.n_keys,
           CAST(h.pair_rows * 1000000 // t.total_join_rows AS BIGINT)
             AS share_ppm
    FROM hist h CROSS JOIN tot t
    ORDER BY h.pair_rows DESC, h.l_partkey
    LIMIT 10
"""


def privacy_l_diversity_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity risk report (Machanavajjhala et al. ICDE'06) —
    the attack k-anonymity misses: a QI group can have k >= 10 rows
    yet leak the sensitive attribute outright if every row SHARES the
    same sensitive value (the homogeneity attack). Released table =
    orders joined to the customer quasi-identifier the k-anonymity
    query defines (nation, market segment, account-balance band of
    1000); sensitive attribute = order priority. Per QI group,
    l = exact distinct sensitive values; the report is the FULL l
    distribution (group count, row count, exact ppm population share
    per observed l — integer DIV, the k-anonymity precedent), with
    l=1 rows being the homogeneity attack whenever present.
    Deliberately NOT fixed risk buckets: on this synthetic data the
    measured minimum is l=2 at every SF (near-uniform priorities
    over ~10-order groups make a homogeneous group ~(1/5)^(n-1)
    rare), so an l=1 bucket would be a permanently-dead branch — the
    vacuousness lesson; the distribution form has no such branch and
    the accompanying test pins the measured minimum so a testdata
    change surfaces. Plan: one equi join riding the custkey, one QI
    hash agg with an exact distinct, one <=5-row l agg — at 100 TB
    the join broadcasts or buckets on the natural key and nothing is
    driver-side."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    )
    released = orders.join(
        cust, orders.o_custkey == cust.c_custkey
    )
    groups = released.groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(
        F.count("*").alias("n"),
        F.countDistinct("o_orderpriority").alias("l"),
    )
    from pyspark.sql import Window

    agg = groups.groupBy("l").agg(
        F.count("*").cast("long").alias("n_groups"),
        F.sum("n").cast("long").alias("n_rows"),
    )
    # <=|sensitive domain|-row result: the all-rows window total is
    # trivially safe here
    total = F.sum("n_rows").over(Window.partitionBy())
    return agg.select(
        F.col("l").cast("long").alias("l"),
        "n_groups",
        "n_rows",
        total.cast("long").alias("_tot"),
    ).select(
        "l",
        "n_groups",
        "n_rows",
        F.expr("CAST(n_rows * 1000000 AS BIGINT) div _tot").alias(
            "share_ppm"
        ),
    ).orderBy("l")


_L_DIVERSITY_ORACLE = """
    WITH released AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
             o_orderpriority
      FROM orders JOIN customer ON o_custkey = c_custkey
    ), groups AS (
      SELECT c_nationkey, c_mktsegment, bal_band,
             CAST(count(*) AS BIGINT) AS n,
             CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS l
      FROM released GROUP BY 1, 2, 3
    ), agg AS (
      SELECT l, CAST(count(*) AS BIGINT) AS n_groups,
             CAST(sum(n) AS BIGINT) AS n_rows
      FROM groups GROUP BY 1
    )
    SELECT l, n_groups, n_rows,
           CAST(n_rows * 1000000 // sum(n_rows) OVER () AS BIGINT)
             AS share_ppm
    FROM agg
    ORDER BY l
"""


_STUMP_THRESHOLD = 200_000  # whole dollars; splits this data ~60/40


def ml_decision_stump_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 1R decision stump (Holte 1993 — 'very simple
    classification rules perform well'): for the binary label
    high-value order (totalprice >= $200k literal), evaluate the
    three categorical features (priority, status, order day-of-week)
    by their majority-vote training error — per feature value the
    rule predicts the majority class, so its errors are
    min(n_high, n - n_high); the feature with the fewest summed
    errors is the stump. Completes the exact-relational-ML pair with
    ml_nb_segment (naive Bayes): counts in, argmin by integer
    compare, zero floats. The feature axis melts IN-PLAN (explode of
    three (feature, value) structs — one scan, no per-feature
    branches), then (feature, value)-keyed agg, feature agg, and a
    3-row window rank. Day-of-week uses the Spark-1=Sunday vs
    DuckDB-0=Sunday pin (both emit 0=Sunday)."""
    orders = load_table(spark, sf_dir, "orders")
    melted = orders.select(
        (F.col("o_totalprice") >= _STUMP_THRESHOLD).cast("long").alias("_hi"),
        F.explode(
            F.array(
                F.struct(
                    F.lit("priority").alias("feature"),
                    F.col("o_orderpriority").alias("value"),
                ),
                F.struct(
                    F.lit("status").alias("feature"),
                    F.col("o_orderstatus").alias("value"),
                ),
                F.struct(
                    F.lit("dow").alias("feature"),
                    (F.dayofweek("o_orderdate") - 1).cast("string").alias(
                        "value"
                    ),
                ),
            )
        ).alias("_f"),
    ).select("_f.feature", "_f.value", "_hi")
    per_value = melted.groupBy("feature", "value").agg(
        F.count("*").alias("n"), F.sum("_hi").alias("n_high")
    )
    per_feature = per_value.groupBy("feature").agg(
        F.count("*").cast("long").alias("n_values"),
        F.sum(F.least(F.col("n_high"), F.col("n") - F.col("n_high")))
        .cast("long")
        .alias("n_errors"),
        F.sum("n").cast("long").alias("n_total"),
    )
    from pyspark.sql import Window

    # 3-row frame: the unpartitioned rank is trivially safe
    rk = F.row_number().over(
        Window.partitionBy().orderBy("n_errors", "feature")
    )
    return per_feature.select(
        "feature",
        "n_values",
        "n_errors",
        F.expr("n_errors * 1000000 div n_total").alias("error_ppm"),
        rk.cast("long").alias("rank"),
    ).orderBy("rank")


_STUMP_ORACLE = f"""
    WITH melted AS (
      SELECT f.feature, f.value,
             CASE WHEN o_totalprice >= {_STUMP_THRESHOLD} THEN 1 ELSE 0 END
               AS hi
      FROM orders,
           LATERAL (SELECT unnest([
             {{'feature': 'priority', 'value': o_orderpriority}},
             {{'feature': 'status',   'value': o_orderstatus}},
             {{'feature': 'dow',
               'value': CAST(dayofweek(o_orderdate) AS VARCHAR)}}
           ]) AS f)
    ), per_value AS (
      SELECT feature, value, count(*) AS n, sum(hi) AS n_high
      FROM melted GROUP BY 1, 2
    ), per_feature AS (
      SELECT feature,
             CAST(count(*) AS BIGINT) AS n_values,
             CAST(sum(least(n_high, n - n_high)) AS BIGINT) AS n_errors,
             CAST(sum(n) AS BIGINT) AS n_total
      FROM per_value GROUP BY 1
    )
    SELECT feature, n_values, n_errors,
           CAST(n_errors * 1000000 // n_total AS BIGINT) AS error_ppm,
           CAST(row_number() OVER (ORDER BY n_errors, feature) AS BIGINT)
             AS rank
    FROM per_feature
    ORDER BY rank
"""


def agg_crosscorrelation_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation sufficient statistics between the daily
    PURCHASE count and the daily ERROR count at calendar lags -3..+3
    — the lead/lag discovery question ('do error spikes precede
    purchase dips?') the ACF query answers for a series against
    itself. Per lag the exact integer Pearson atoms (n, Sx, Sy, Sxy,
    Sxx, Syy) over day pairs (d, d+lag) where BOTH days are observed;
    the correlation's sqrt stays OUT (the ACF precedent — the one
    non-bit-reproducible step). Daily COUNTS are small integers, so
    the atoms sit far inside int64 at any SF. One scan → conditional
    day agg (both series from the same pass), 7x in-row lag explode,
    ONE date-shift equi join — no lag table, no self-join fan."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("x"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias(
            "y"
        ),
    )
    lagged = daily.select(
        "day", "x", F.explode(F.sequence(F.lit(-3), F.lit(3))).alias("lag")
    ).withColumn("match_day", F.expr("date_add(day, CAST(lag AS INT))"))
    right = daily.select(F.col("day").alias("match_day"), F.col("y").alias("y2"))
    pairs = lagged.join(right, "match_day")
    return (
        pairs.groupBy("lag")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y2").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("y2")).cast("long").alias("sxy"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
            F.sum(F.col("y2") * F.col("y2")).cast("long").alias("syy"),
        )
        .select(
            F.col("lag").cast("long").alias("lag"),
            "n",
            "sx",
            "sy",
            "sxy",
            "sxx",
            "syy",
        )
        .orderBy("lag")
    )


_CCF_ORACLE = """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS x,
             sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS y
      FROM events GROUP BY 1
    ), lagged AS (
      SELECT day, x, lag, day + to_days(CAST(lag AS INT)) AS match_day
      FROM daily, LATERAL (SELECT unnest(range(-3, 4)) AS lag)
    ), pairs AS (
      SELECT l.lag, l.x, d.y
      FROM lagged l JOIN daily d ON l.match_day = d.day
    )
    SELECT CAST(lag AS BIGINT) AS lag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS sx,
           CAST(sum(y) AS BIGINT) AS sy,
           CAST(sum(x * y) AS BIGINT) AS sxy,
           CAST(sum(x * x) AS BIGINT) AS sxx,
           CAST(sum(y * y) AS BIGINT) AS syy
    FROM pairs
    GROUP BY lag
    ORDER BY lag
"""


def dq_order_reconciliation_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table financial reconciliation — the data-quality check
    the single-table constraint suite (operators/constraints.py)
    cannot express: does each order's header total agree with the sum
    of its lines? Orders FULL OUTER JOIN the lineitem rollup on the
    order key; every order lands in exactly one category: 'no_lines'
    (header without lines — 27 orphans at sf0.001, a real finding),
    'orphan_lines' (lines without a header — zero here, but the
    branch is the other half of any real reconciliation and costs
    nothing: absent categories produce no row, not a dead zero row),
    'exact' (to-the-cent agreement), or a mismatch bucket keyed by
    the DIGIT COUNT of |header − lines| in cents
    (length(CAST ... AS STRING)) — a pure integer bucket both engines
    compute identically, the length(bin()) precedent's decimal
    sibling). Per category: order count, summed |diff| cents, and
    exact ppm share. Plan: lineitem rolls up on its natural key, one
    equi full-outer join, tiny category agg — at 100 TB everything
    rides l_orderkey/o_orderkey."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.expr(
                "sum(CAST(round(l_extendedprice * 100) AS BIGINT))"
            ).alias("_li_cents")
        )
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("_o_cents"),
    )
    joined = orders.join(
        li, orders.o_orderkey == li.l_orderkey, "full_outer"
    )
    diff = F.col("_li_cents") - F.col("_o_cents")
    cat = (
        F.when(F.col("l_orderkey").isNull(), F.lit("no_lines"))
        .when(F.col("o_orderkey").isNull(), F.lit("orphan_lines"))
        .when(diff == 0, F.lit("exact"))
        .otherwise(
            F.concat(
                F.lit("diff_digits_"),
                F.lpad(
                    F.length(F.abs(diff).cast("string")), 2, "0"
                ),
            )
        )
    )
    from pyspark.sql import Window

    agg = joined.select(
        cat.alias("category"),
        F.coalesce(F.abs(diff), F.lit(0)).alias("_abs_diff"),
    ).groupBy("category").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum("_abs_diff").cast("long").alias("abs_diff_cents"),
    )
    total = F.sum("n_orders").over(Window.partitionBy())
    return agg.select(
        "category",
        "n_orders",
        "abs_diff_cents",
        total.cast("long").alias("_tot"),
    ).select(
        "category",
        "n_orders",
        "abs_diff_cents",
        F.expr("CAST(n_orders * 1000000 AS BIGINT) div _tot").alias(
            "share_ppm"
        ),
    ).orderBy("category")


_RECONCILIATION_ORACLE = """
    WITH li AS (
      SELECT l_orderkey,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS li_cents
      FROM lineitem GROUP BY 1
    ), o AS (
      SELECT o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS o_cents
      FROM orders
    ), joined AS (
      SELECT o.o_orderkey, li.l_orderkey, li.li_cents - o.o_cents AS diff
      FROM o FULL OUTER JOIN li ON o.o_orderkey = li.l_orderkey
    ), cats AS (
      SELECT CASE
               WHEN l_orderkey IS NULL THEN 'no_lines'
               WHEN o_orderkey IS NULL THEN 'orphan_lines'
               WHEN diff = 0 THEN 'exact'
               ELSE 'diff_digits_' ||
                    lpad(CAST(length(CAST(abs(diff) AS VARCHAR)) AS VARCHAR),
                         2, '0')
             END AS category,
             coalesce(abs(diff), 0) AS abs_diff
      FROM joined
    ), agg AS (
      SELECT category, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(abs_diff) AS BIGINT) AS abs_diff_cents
      FROM cats GROUP BY 1
    )
    SELECT category, n_orders, abs_diff_cents,
           CAST(n_orders * 1000000 // sum(n_orders) OVER () AS BIGINT)
             AS share_ppm
    FROM agg
    ORDER BY category
"""


def orders_aging_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-pipeline aging — the accounts-receivable-style report:
    orders still open (status 'O') bucketed by age at the dataset's
    anchor date (max order date, a 1-row broadcast aggregate — the
    events_trending precedent, whitelisted) into the standard
    0-30 / 31-90 / 91-365 / 365+ day brackets, with order count,
    exact open cents, the oldest age per bracket, and ppm share of
    open value. Every bracket is populated at every SF (statuses are
    ~uniform over a 6.5-year span — measured, not assumed). One scan,
    a 1-row max, a 4-row agg."""
    orders = load_table(spark, sf_dir, "orders")
    anchor = orders.agg(F.max(F.to_date("o_orderdate")).alias("_anchor"))
    open_orders = orders.where(F.col("o_orderstatus") == "O").select(
        F.to_date("o_orderdate").alias("_day"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("_cents"),
    )
    aged = open_orders.crossJoin(F.broadcast(anchor)).select(
        F.datediff(F.col("_anchor"), F.col("_day")).cast("long").alias(
            "_age"
        ),
        "_cents",
    )
    bucket = (
        F.when(F.col("_age") <= 30, F.lit("1:0-30d"))
        .when(F.col("_age") <= 90, F.lit("2:31-90d"))
        .when(F.col("_age") <= 365, F.lit("3:91-365d"))
        .otherwise(F.lit("4:365d+"))
    )
    from pyspark.sql import Window

    agg = aged.select(bucket.alias("age_bucket"), "_age", "_cents").groupBy(
        "age_bucket"
    ).agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum("_cents").cast("long").alias("open_cents"),
        F.max("_age").cast("long").alias("oldest_days"),
    )
    total = F.sum("open_cents").over(Window.partitionBy())
    return agg.select(
        "age_bucket",
        "n_orders",
        "open_cents",
        "oldest_days",
        total.cast("long").alias("_tot"),
    ).select(
        "age_bucket",
        "n_orders",
        "open_cents",
        "oldest_days",
        F.expr("CAST(open_cents * 1000000 AS BIGINT) div _tot").alias(
            "value_share_ppm"
        ),
    ).orderBy("age_bucket")


_AGING_ORACLE = """
    WITH anchor AS (
      SELECT max(CAST(o_orderdate AS DATE)) AS a FROM orders
    ), aged AS (
      SELECT date_diff('day', CAST(o_orderdate AS DATE), anchor.a) AS age,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders, anchor
      WHERE o_orderstatus = 'O'
    ), bucketed AS (
      SELECT CASE WHEN age <= 30 THEN '1:0-30d'
                  WHEN age <= 90 THEN '2:31-90d'
                  WHEN age <= 365 THEN '3:91-365d'
                  ELSE '4:365d+' END AS age_bucket,
             age, cents
      FROM aged
    ), agg AS (
      SELECT age_bucket, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(cents) AS BIGINT) AS open_cents,
             CAST(max(age) AS BIGINT) AS oldest_days
      FROM bucketed GROUP BY 1
    )
    SELECT age_bucket, n_orders, open_cents, oldest_days,
           CAST(open_cents * 1000000 // sum(open_cents) OVER () AS BIGINT)
             AS value_share_ppm
    FROM agg
    ORDER BY age_bucket
"""


def graph_degree_histogram_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the customer→supplier purchase graph on
    log2 buckets — the first diagnostic every graph pipeline runs
    before choosing algorithms (is this graph skewed enough to need
    the hub caps link-prediction and the dedup buckets apply?).
    Distinct edges from orders⋈lineitem, per-customer degree, bucket
    = length(bin(degree)) ≡ 64−clz — the interarrival precedent's
    pure INTEGER log2 (floor(log2(x)) on doubles disagrees at
    power-of-two boundaries). Per bucket: customer count, min/max
    degree, and total incident edges. Everything rides natural keys;
    the histogram frame is <=64 rows."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    deg = edges.groupBy("o_custkey").agg(F.count("*").alias("_deg"))
    return (
        deg.select(
            F.expr("CAST(length(bin(_deg)) AS BIGINT)").alias("log2_bucket"),
            "_deg",
        )
        .groupBy("log2_bucket")
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.min("_deg").cast("long").alias("min_degree"),
            F.max("_deg").cast("long").alias("max_degree"),
            F.sum("_deg").cast("long").alias("n_edges"),
        )
        .orderBy("log2_bucket")
    )


_DEGREE_HIST_ORACLE = """
    WITH edges AS (
      SELECT DISTINCT o_custkey, l_suppkey
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ), deg AS (
      SELECT o_custkey, CAST(count(*) AS BIGINT) AS d
      FROM edges GROUP BY 1
    )
    SELECT CAST(length(bin(d)) AS BIGINT) AS log2_bucket,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(min(d) AS BIGINT) AS min_degree,
           CAST(max(d) AS BIGINT) AS max_degree,
           CAST(sum(d) AS BIGINT) AS n_edges
    FROM deg
    GROUP BY 1
    ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Wave 9: DRIVER-PROVABLE approximation — the engine's MinHash and
# SimHash families are declared rows-only because xxhash64 has no DuckDB
# twin (VERDICT G3/D4). These variants swap the internal hash for md5
# (which both engines compute identically over the same strings), so the
# APPROXIMATION ITSELF — signatures, banding, match-count estimates,
# Hamming distances — becomes an exact-oracle claim, the KMV precedent
# (agg_kmv_distinct) applied to the two flagship near-dup families.
# xxhash64 stays the production fast path; md5 is the auditable twin.

_MH_K = 16  # signature length (16 independent md5 "permutations")


def dedup_minhash_estimate_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-provable MinHash: per doc a 16-component signature
    (min over distinct 3-token shingles of md5('m<k>:' || shingle) —
    lexicographic min over lowercase hex is identical cross-engine),
    LSH candidates from 16 single-row bands (r=1, b=16: the
    high-recall regime — collision prob per band IS the Jaccard), and
    per candidate pair the match-count estimate in exact integer ppm
    (matches · 62500). Bucket widths capped at 50 (the minhash_lsh
    discipline: a w-wide band bucket is w²/2 pairs; boilerplate
    clusters are caught by exact hash dedup, not here). Plan: one
    shingle scan → one 16-column min agg → capped band self-join →
    signature re-join; every join rides an equi key. The estimator's
    accuracy vs exact Jaccard is pinned in pytest on planted pairs;
    THIS query pins that the estimate the engine serves is the
    arithmetic it claims."""
    docs = load_table(spark, sf_dir, "documents").where(
        F.length(F.trim(F.col("text"))) > 0
    )
    from spotify_data_pipeline_spark.functions.text import shingles, tokens

    sh = docs.select(
        "doc_id",
        F.explode(F.array_distinct(shingles(tokens(F.col("text")), 3))).alias("sh"),
    )
    mins = [
        F.min(F.md5(F.concat(F.lit(f"m{k}:"), F.col("sh")))).alias(f"h{k}")
        for k in range(_MH_K)
    ]
    sig = (
        sh.groupBy("doc_id")
        .agg(*mins)
        .select("doc_id", F.array(*[f"h{k}" for k in range(_MH_K)]).alias("sig"))
    )
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"), F.col("sig")[b].alias("key")
                    )
                    for b in range(_MH_K)
                ]
            )
        ).alias("_bk"),
    ).select("doc_id", F.col("_bk.band").alias("band"), F.col("_bk.key").alias("key"))
    keep = (
        bands.groupBy("band", "key")
        .agg(F.count("*").alias("_w"))
        .where((F.col("_w") >= 2) & (F.col("_w") <= 50))
        .select("band", "key")
    )
    kept = bands.join(keep, ["band", "key"], "left_semi")
    pairs = (
        kept.alias("a")
        .join(kept.alias("b"), ["band", "key"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )
    matches = F.aggregate(
        F.zip_with(
            F.col("sa"), F.col("sb"), lambda x, y: F.when(x == y, 1).otherwise(0)
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return (
        pairs.join(
            sig.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("sa")),
            "id_a",
        )
        .join(
            sig.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("sb")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            matches.cast("long").alias("sig_matches"),
            (matches * F.lit(1_000_000 // _MH_K)).cast("long").alias("est_jaccard_ppm"),
        )
        .orderBy("id_a", "id_b")
    )


def _minhash_estimate_oracle() -> str:
    min_cols = ",\n             ".join(
        f"min(md5('m{k}:' || sh)) AS h{k}" for k in range(_MH_K)
    )
    sig_list = ", ".join(f"h{k}" for k in range(_MH_K))
    band_rows = "\n      UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, h{b} AS key FROM m" for b in range(_MH_K)
    )
    return rf"""
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
    ), m AS (
      SELECT doc_id,
             {min_cols}
      FROM s GROUP BY 1
    ), sig AS (
      SELECT doc_id, [{sig_list}] AS sg FROM m
    ), bands AS (
      {band_rows}
    ), keep AS (
      SELECT band, key FROM (
        SELECT band, key, count(*) AS w FROM bands GROUP BY 1, 2
      ) WHERE w BETWEEN 2 AND 50
    ), kept AS (
      SELECT b.doc_id, b.band, b.key
      FROM bands b JOIN keep k ON b.band = k.band AND b.key = k.key
    ), pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM kept a JOIN kept b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    )
    SELECT p.id_a, p.id_b,
           CAST(len(list_filter(range(1, {_MH_K + 1}),
                                i -> za.sg[i] = zb.sg[i])) AS BIGINT) AS sig_matches,
           CAST(len(list_filter(range(1, {_MH_K + 1}),
                                i -> za.sg[i] = zb.sg[i]))
                * {1_000_000 // _MH_K} AS BIGINT) AS est_jaccard_ppm
    FROM pairs p
    JOIN sig za ON p.id_a = za.doc_id
    JOIN sig zb ON p.id_b = zb.doc_id
    ORDER BY id_a, id_b
"""


_SH_BITS = 60  # 15 md5 hex digits; bit 60..63 unused (the bitmap
# operator's sign-bit discipline: DuckDB faults on 1<<63, Spark flips)
_SH_CHUNK = 15  # 4 chunks of 15 bits — pigeonhole: hamming <= 3 found


def dedup_simhash_md5_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-provable SimHash: a 60-bit fingerprint per doc — bit j is
    the majority vote over distinct tokens of bit j of md5(token),
    decoded from the hex digits with instr()/DIV/% integer arithmetic
    (both engines carry the same tree; no conv(), which DuckDB lacks).
    Candidates share one of four 15-bit fingerprint chunks (pigeonhole:
    every pair within Hamming 3 collides in some chunk); output is the
    top-20 closest pairs under the total (hamming, id_a, id_b) order —
    a top-k surface can't go vacuous when true near-dups are absent at
    a small SF. Plan: one token scan → one 60-column conditional-sum
    agg → chunk equi self-join → bit_count(xor) re-rank. The xxhash64
    production path (dedup_simhash) keeps its banding; this twin makes
    the fingerprint arithmetic itself a hash-checked claim."""
    docs = load_table(spark, sf_dir, "documents").where(
        F.length(F.trim(F.col("text"))) > 0
    )
    from spotify_data_pipeline_spark.functions.text import tokens

    tok = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens(F.col("text")))).alias("tok")
    ).withColumn("_h", F.md5(F.col("tok")))
    sign_cols = [
        F.expr(
            f"2 * (((instr('0123456789abcdef', substr(_h, {j // 4 + 1}, 1)) - 1)"
            f" DIV {1 << (j % 4)}) % 2) - 1"
        ).alias(f"s{j}")
        for j in range(_SH_BITS)
    ]
    sums = tok.select("doc_id", *sign_cols).groupBy("doc_id").agg(
        *[F.sum(f"s{j}").alias(f"s{j}") for j in range(_SH_BITS)]
    )
    fp_expr = " + ".join(
        f"IF(s{j} > 0, {1 << j}L, 0L)" for j in range(_SH_BITS)
    )
    fps = sums.select("doc_id", F.expr(fp_expr).alias("fp"))
    chunks = fps.select(
        "doc_id",
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.expr(
                            f"(fp DIV {1 << (c * _SH_CHUNK)}) % {1 << _SH_CHUNK}"
                        ).alias("val"),
                    )
                    for c in range(_SH_BITS // _SH_CHUNK)
                ]
            )
        ).alias("_ck"),
    ).select("doc_id", "fp", F.col("_ck.chunk").alias("chunk"), F.col("_ck.val").alias("val"))
    pairs = (
        chunks.alias("a")
        .join(chunks.alias("b"), ["chunk", "val"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.fp").alias("fp_a"),
            F.col("b.fp").alias("fp_b"),
        )
        .distinct()
        .withColumn("hamming", F.expr("CAST(bit_count(fp_a ^ fp_b) AS BIGINT)"))
    )
    return pairs.select("id_a", "id_b", "fp_a", "fp_b", "hamming").orderBy(
        "hamming", "id_a", "id_b"
    ).limit(20)


def _simhash_md5_oracle() -> str:
    sign_cols = ",\n             ".join(
        f"2 * (((instr('0123456789abcdef', substr(h, {j // 4 + 1}, 1)) - 1)"
        f" // {1 << (j % 4)}) % 2) - 1 AS s{j}"
        for j in range(_SH_BITS)
    )
    sum_cols = ",\n             ".join(
        f"sum(s{j}) AS s{j}" for j in range(_SH_BITS)
    )
    fp_expr = " + ".join(
        f"CASE WHEN s{j} > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END"
        for j in range(_SH_BITS)
    )
    chunk_rows = "\n      UNION ALL ".join(
        f"SELECT doc_id, fp, {c} AS chunk,"
        f" (fp // {1 << (c * _SH_CHUNK)}) % {1 << _SH_CHUNK} AS val FROM fps"
        for c in range(_SH_BITS // _SH_CHUNK)
    )
    return rf"""
    WITH t AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
      FROM documents WHERE length(trim(text)) > 0
    ), tk AS (
      SELECT doc_id, md5(tok) AS h
      FROM (SELECT doc_id, unnest(list_distinct(toks)) AS tok FROM t)
    ), bits AS (
      SELECT doc_id,
             {sign_cols}
      FROM tk
    ), sums AS (
      SELECT doc_id,
             {sum_cols}
      FROM bits GROUP BY 1
    ), fps AS (
      SELECT doc_id, {fp_expr} AS fp FROM sums
    ), chunks AS (
      {chunk_rows}
    ), pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.fp AS fp_a, b.fp AS fp_b
      FROM chunks a JOIN chunks b
        ON a.chunk = b.chunk AND a.val = b.val AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, fp_a, fp_b,
           CAST(bit_count(xor(fp_a, fp_b)) AS BIGINT) AS hamming
    FROM pairs
    ORDER BY hamming, id_a, id_b
    LIMIT 20
"""


def ml_knn_label_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-nearest-neighbor classification — the third member of the
    exact-relational-ML family (naive Bayes r9, 1R stump wave 7): every
    37th vector is the evaluation batch, classified by majority label
    of its 5 nearest training vectors under int8-quantized cosine
    (operators/quantization.py — integer dots, scales cancel, the
    sim_quantized_topk exact-arithmetic precedent). The batch
    broadcasts over the corpus scan (the sim_cosine_topk pattern:
    queries ship, the corpus never shuffles); majority = (votes DESC,
    label ASC) deterministic argmax. Ties in qcos break by neighbor
    id, so the neighbor set — and therefore the vote — is total-order
    deterministic cross-engine."""
    from spotify_data_pipeline_spark.operators.quantization import (
        cosine_topk_quantized,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    test = emb.where(F.col("vec_id") % 37 == 0)
    train = emb.where(F.col("vec_id") % 37 != 0)
    top = cosine_topk_quantized(test, train, k=5)
    votes = (
        top.join(
            train.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("label").alias("_nl"),
            ),
            "neighbor_id",
        )
        .groupBy("query_id", "_nl")
        .agg(F.count("*").alias("n_votes"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), F.col("_nl").asc()
    )
    pred = (
        votes.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("query_id", F.col("_nl").alias("pred_label"), "n_votes")
    )
    return (
        pred.join(
            test.select(F.col("vec_id").alias("query_id"), "label"), "query_id"
        )
        .select(
            F.col("query_id").alias("vec_id"),
            F.col("pred_label").cast("long").alias("pred_label"),
            F.col("label").cast("long").alias("true_label"),
            F.col("n_votes").cast("long").alias("n_votes"),
        )
        .orderBy("vec_id")
    )


_KNN_QCOS = (
    "(list_dot_product(a.q, b.q)"
    " / (sqrt(list_dot_product(a.q, a.q)) * sqrt(list_dot_product(b.q, b.q))))"
)

_KNN_ORACLE = f"""
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
    ), scored AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, b.label AS nl,
             CAST(row_number() OVER (
               PARTITION BY a.vec_id
               ORDER BY floor({_KNN_QCOS} * 10000 + 0.5) / 10000 DESC, b.vec_id ASC
             ) AS BIGINT) AS rn
      FROM qz a JOIN qz b ON b.vec_id % 37 <> 0 AND a.vec_id <> b.vec_id
      WHERE a.vec_id % 37 = 0
    ), votes AS (
      SELECT query_id, nl, CAST(count(*) AS BIGINT) AS n_votes
      FROM scored WHERE rn <= 5 GROUP BY 1, 2
    ), pred AS (
      SELECT query_id, nl AS pred_label, n_votes,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY n_votes DESC, nl ASC) AS pr
      FROM votes
    )
    SELECT p.query_id AS vec_id,
           CAST(p.pred_label AS BIGINT) AS pred_label,
           CAST(t.label AS BIGINT) AS true_label,
           p.n_votes
    FROM pred p JOIN qz t ON p.query_id = t.vec_id
    WHERE p.pr = 1
    ORDER BY vec_id
"""


# ---------------------------------------------------------------------------
# Wave 10: graph metrics closure + classic ops-analytics screens.


def graph_clustering_coefficient_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global clustering coefficient (transitivity) of the part
    co-order graph — the graph family's density-of-closure metric,
    joining triangles (numerator, the staged graph_triangle_count's
    degree-ordered wedge operator) with the wedge count
    W = Σ d(d−1)/2 over the same canonical edge set. Transitivity
    = 3·T/W reported in exact integer ppm (DIV, never float). Both
    aggregates are 1-row; assembly is the documented broadcast-1-row
    cross join. Same graph window as graph_triangle_count (1997 H1)
    so the oracle brute-force stays cheap; the operator itself is the
    O(√m)-fan-out enumeration that survives power-law hubs."""
    from spotify_data_pipeline_spark.operators.triangles import (
        cooccurrence_edges,
        triangle_count,
    )

    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey")
    deg = (
        edges.select(F.col("src").alias("u"))
        .unionAll(edges.select(F.col("dst").alias("u")))
        .groupBy("u")
        .agg(F.count("*").alias("d"))
    )
    wedges = deg.agg(
        F.sum(F.expr("d * (d - 1) DIV 2")).cast("long").alias("n_wedges")
    )
    return (
        triangle_count(edges)
        .crossJoin(F.broadcast(wedges))
        .select(
            F.col("n_nodes").cast("long").alias("n_nodes"),
            F.col("n_edges").cast("long").alias("n_edges"),
            F.col("n_triangles").cast("long").alias("n_triangles"),
            "n_wedges",
            F.expr(
                "CAST((3 * n_triangles * 1000000) DIV nullif(n_wedges, 0) AS BIGINT)"
            ).alias("transitivity_ppm"),
        )
    )


_CLUSTERING_ORACLE = """
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-07-01'
    ), sized AS (
      SELECT l_orderkey FROM li GROUP BY l_orderkey
      HAVING count(*) BETWEEN 2 AND 200
    ), e AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM li a
      JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      JOIN sized s ON a.l_orderkey = s.l_orderkey
    ), deg AS (
      SELECT u, CAST(count(*) AS BIGINT) AS d
      FROM (SELECT src AS u FROM e UNION ALL SELECT dst FROM e)
      GROUP BY 1
    ), atoms AS (
      SELECT
        (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
        (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
        (SELECT CAST(count(*) AS BIGINT)
           FROM e e1 JOIN e e2 ON e1.dst = e2.src JOIN e e3
             ON e3.src = e1.src AND e3.dst = e2.dst) AS n_triangles,
        (SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) FROM deg) AS n_wedges
    )
    SELECT n_nodes, n_edges, n_triangles, n_wedges,
           CAST((3 * n_triangles * 1000000) // nullif(n_wedges, 0) AS BIGINT)
             AS transitivity_ppm
    FROM atoms
"""


def orders_abc_classification_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification — the 80/15/5 revenue-concentration
    screen every supply-chain stack runs: parts ranked by revenue
    (exact per-row cents, the rnd_cents precedent), class A while the
    running share is ≤ 80% of total, B to 95%, C after — boundaries
    evaluated CROSS-MULTIPLIED (cum·5 ≤ tot·4, cum·20 ≤ tot·19), never
    via float shares. One part-keyed agg, one global-order cumsum
    window (the dimension frame — parts, not lineitems; the two-phase
    split in operators/batching is the documented 100 TB form), a
    1-row broadcast total, and a 3-row class rollup with exact ppm
    shares."""
    li = load_table(spark, sf_dir, "lineitem")
    from pyspark.sql import Window

    rev = li.groupBy("l_partkey").agg(
        F.sum(
            rnd_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        ).alias("rev_cents")
    )
    w = (
        Window.orderBy(F.col("rev_cents").desc(), F.col("l_partkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = rev.withColumn("cum_cents", F.sum("rev_cents").over(w))
    tot = rev.agg(F.sum("rev_cents").alias("tot_cents"))
    classed = cum.crossJoin(F.broadcast(tot)).withColumn(
        "abc_class",
        F.when(F.col("cum_cents") * 5 <= F.col("tot_cents") * 4, F.lit("A"))
        .when(F.col("cum_cents") * 20 <= F.col("tot_cents") * 19, F.lit("B"))
        .otherwise(F.lit("C")),
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count("*").cast("long").alias("n_parts"),
            F.sum("rev_cents").cast("long").alias("rev_cents"),
            F.expr("CAST(sum(rev_cents) * 1000000 DIV any_value(tot_cents) AS BIGINT)").alias(
                "rev_share_ppm"
            ),
        )
        .orderBy("abc_class")
    )


_ABC_ORACLE = """
    WITH rev AS (
      SELECT l_partkey,
             CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                           AS BIGINT)) AS BIGINT) AS rev_cents
      FROM lineitem GROUP BY 1
    ), cum AS (
      SELECT l_partkey, rev_cents,
             sum(rev_cents) OVER (ORDER BY rev_cents DESC, l_partkey ASC
                                  ROWS UNBOUNDED PRECEDING) AS cum_cents,
             (SELECT sum(rev_cents) FROM rev) AS tot_cents
      FROM rev
    ), classed AS (
      SELECT *,
             CASE WHEN cum_cents * 5 <= tot_cents * 4 THEN 'A'
                  WHEN cum_cents * 20 <= tot_cents * 19 THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM cum
    )
    SELECT abc_class,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(rev_cents) AS BIGINT) AS rev_cents,
           CAST(sum(rev_cents) * 1000000 // any_value(tot_cents) AS BIGINT)
             AS rev_share_ppm
    FROM classed
    GROUP BY 1
    ORDER BY 1
"""


def events_outlier_tukey_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier screen on per-(user, event_type) volume —
    the IQR rule (x outside [Q1 − 1.5·IQR, Q3 + 1.5·IQR]) evaluated
    WITHOUT floats: quartiles are DISCRETE order statistics at ranks
    (m+1) DIV 4 and 3(m+1) DIV 4 within each event_type (the
    seasonal-decompose lower-median precedent — interpolating
    quantiles average to engine-dependent floats), and the ×1.5 fence
    is cross-multiplied (2·x vs 2·Q3 + 3·IQR). The output is the FULL
    per-type fence table — q1/q3/fences plus high/low outlier-user
    counts, zeros included — never a bare outlier list: at some SFs
    the distribution is tight enough that no user breaches a fence,
    and an empty-vs-empty driver match proves nothing (the
    duplicate-invoice lesson). Rank windows are partitioned by
    event_type; the fence check joins back on the same key."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    counts = ev.groupBy("event_type", "user_id").agg(
        F.count("*").alias("n_events")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("n_events").asc(), F.col("user_id").asc()
    )
    ranked = counts.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_m",
        F.count("*").over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ),
    )
    stats = ranked.groupBy("event_type").agg(
        F.max("_m").cast("long").alias("n_users"),
        F.max(
            F.when(
                F.col("_rn") == F.expr("greatest(1, (_m + 1) DIV 4)"),
                F.col("n_events"),
            )
        ).cast("long").alias("q1"),
        F.max(
            F.when(
                F.col("_rn") == F.expr("least(_m, (3 * (_m + 1)) DIV 4)"),
                F.col("n_events"),
            )
        ).cast("long").alias("q3"),
    )
    flagged = counts.join(stats, "event_type").select(
        "event_type",
        "n_users",
        "q1",
        "q3",
        (
            2 * F.col("n_events") > 2 * F.col("q3") + 3 * (F.col("q3") - F.col("q1"))
        ).cast("long").alias("_hi"),
        (
            2 * F.col("n_events") < 2 * F.col("q1") - 3 * (F.col("q3") - F.col("q1"))
        ).cast("long").alias("_lo"),
    )
    return (
        flagged.groupBy("event_type", "n_users", "q1", "q3")
        .agg(
            F.sum("_hi").cast("long").alias("n_outliers_high"),
            F.sum("_lo").cast("long").alias("n_outliers_low"),
        )
        .orderBy("event_type")
    )


_TUKEY_ORACLE = """
    WITH counts AS (
      SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    ), ranked AS (
      SELECT *,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY n_events ASC, user_id ASC) AS rn,
             count(*) OVER (PARTITION BY event_type) AS m
      FROM counts
    ), stats AS (
      SELECT event_type,
             CAST(max(m) AS BIGINT) AS n_users,
             CAST(max(CASE WHEN rn = greatest(1, (m + 1) // 4)
                           THEN n_events END) AS BIGINT) AS q1,
             CAST(max(CASE WHEN rn = least(m, (3 * (m + 1)) // 4)
                           THEN n_events END) AS BIGINT) AS q3
      FROM ranked GROUP BY 1
    )
    SELECT c.event_type, s.n_users, s.q1, s.q3,
           CAST(sum(CASE WHEN 2 * c.n_events > 2 * s.q3 + 3 * (s.q3 - s.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers_high,
           CAST(sum(CASE WHEN 2 * c.n_events < 2 * s.q1 - 3 * (s.q3 - s.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers_low
    FROM counts c JOIN stats s USING (event_type)
    GROUP BY 1, 2, 3, 4
    ORDER BY 1
"""


def graph_assortativity_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-assortativity Pearson atoms of the customer→supplier
    purchase graph (do high-degree customers buy from high-degree
    suppliers?) — the graph family's mixing-pattern metric, in the ACF
    discipline: every atom of r = (nΣxy − ΣxΣy)/√((nΣx²−(Σx)²)(nΣy²−(Σy)²))
    is an exact BIGINT (x = customer degree, y = supplier degree, one
    row per distinct edge); the √ stays downstream as the one
    non-bit-reproducible step. cov_num's sign alone answers the
    assortative/disassortative question exactly. Two degree aggs ride
    the edge keys; no window, no nested loop."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    dc = edges.groupBy("o_custkey").agg(F.count("*").alias("dx"))
    ds = edges.groupBy("l_suppkey").agg(F.count("*").alias("dy"))
    xy = edges.join(dc, "o_custkey").join(ds, "l_suppkey")
    return xy.agg(
        F.count("*").cast("long").alias("n_edges"),
        F.sum("dx").cast("long").alias("sum_x"),
        F.sum("dy").cast("long").alias("sum_y"),
        (F.count("*") * F.sum(F.col("dx") * F.col("dy")) - F.sum("dx") * F.sum("dy"))
        .cast("long")
        .alias("cov_num"),
        (F.count("*") * F.sum(F.col("dx") * F.col("dx")) - F.sum("dx") * F.sum("dx"))
        .cast("long")
        .alias("var_x_num"),
        (F.count("*") * F.sum(F.col("dy") * F.col("dy")) - F.sum("dy") * F.sum("dy"))
        .cast("long")
        .alias("var_y_num"),
    )


_ASSORTATIVITY_ORACLE = """
    WITH edges AS (
      SELECT DISTINCT o_custkey, l_suppkey
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ), dc AS (
      SELECT o_custkey, CAST(count(*) AS BIGINT) AS dx FROM edges GROUP BY 1
    ), ds AS (
      SELECT l_suppkey, CAST(count(*) AS BIGINT) AS dy FROM edges GROUP BY 1
    ), xy AS (
      SELECT dx, dy
      FROM edges JOIN dc USING (o_custkey) JOIN ds USING (l_suppkey)
    )
    SELECT CAST(count(*) AS BIGINT) AS n_edges,
           CAST(sum(dx) AS BIGINT) AS sum_x,
           CAST(sum(dy) AS BIGINT) AS sum_y,
           CAST(count(*) * sum(dx * dy) - sum(dx) * sum(dy) AS BIGINT) AS cov_num,
           CAST(count(*) * sum(dx * dx) - sum(dx) * sum(dx) AS BIGINT) AS var_x_num,
           CAST(count(*) * sum(dy * dy) - sum(dy) * sum(dy) AS BIGINT) AS var_y_num
    FROM xy
"""


# ---------------------------------------------------------------------------
# Wave 11: itemset mining, community quality, weighted order statistics.


def orders_basket_triples_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Apriori frequent-itemset frontier of order baskets, levels
    2 and 3 together (operators/itemsets.py): candidate pairs/triples
    generate IN-ARRAY per L1-filtered basket (bounded by the basket
    cap, not the catalog), and candidate triples are pruned by three
    left-semi joins against the frequent-pair set BEFORE the counting
    shuffle. The pruning is result-invariant (the Apriori property),
    so the naive count-all-HAVING oracle pins the optimized plan
    exactly — the bloom-semireduction proof pattern. Emitting BOTH
    levels keeps the surface honest and never vacuous: at sf0.1 the
    catalog outgrows repeat triples (L3 is genuinely empty — measured)
    while L2 carries 3.5k rows; at sf0.001/0.01 L3 holds 92/12
    itemsets. min_support=2."""
    from spotify_data_pipeline_spark.operators.itemsets import (
        frequent_pairs,
        frequent_triples,
    )

    li = load_table(spark, sf_dir, "lineitem")
    l2 = frequent_pairs(
        li, "l_orderkey", "l_partkey", min_support=2, max_items_per_group=200
    ).select(
        F.lit(2).cast("long").alias("level"),
        "p1",
        "p2",
        F.lit(None).cast("long").alias("p3"),
        F.col("support").cast("long").alias("support"),
    )
    l3 = frequent_triples(
        li, "l_orderkey", "l_partkey", min_support=2, max_items_per_group=200
    ).select(
        F.lit(3).cast("long").alias("level"),
        "p1",
        "p2",
        F.col("p3").cast("long").alias("p3"),
        F.col("support").cast("long").alias("support"),
    )
    return l2.unionAll(l3).orderBy("level", "p1", "p2", "p3")


_BASKET_TRIPLES_ORACLE = """
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), sized AS (
      SELECT l_orderkey FROM li GROUP BY 1 HAVING count(*) <= 200
    ), p AS (
      SELECT a.l_partkey AS p1, b.l_partkey AS p2,
             CAST(count(*) AS BIGINT) AS support
      FROM li a
      JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      JOIN sized s ON a.l_orderkey = s.l_orderkey
      GROUP BY 1, 2
    ), t AS (
      SELECT a.l_partkey AS p1, b.l_partkey AS p2, c.l_partkey AS p3,
             CAST(count(*) AS BIGINT) AS support
      FROM li a
      JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      JOIN li c ON a.l_orderkey = c.l_orderkey AND b.l_partkey < c.l_partkey
      JOIN sized s ON a.l_orderkey = s.l_orderkey
      GROUP BY 1, 2, 3
    )
    SELECT CAST(2 AS BIGINT) AS level, p1, p2, CAST(NULL AS BIGINT) AS p3, support
    FROM p WHERE support >= 2
    UNION ALL
    SELECT CAST(3 AS BIGINT) AS level, p1, p2, p3, support
    FROM t WHERE support >= 2
    ORDER BY level, p1, p2, p3
"""


def graph_brand_modularity_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does the part co-order graph cluster by brand? Modularity atoms
    of the p_brand labeling (operators/community.py — Newman-Girvan Q
    as EXACT integers: per brand e_c, d_c, and the cross-multiplied
    contribution q_num = 4·m·e_c − d_c²; Σ q_num / 4m² = Q, the one
    division left downstream like the ACF/assortativity sqrt). The
    honest answer on this synthetic data is "no" (Q near/below zero) —
    the value is that the atoms are exact and the sign is the claim.
    Full-lineitem co-order graph (no date window — the oracle here is
    linear, unlike the triangle brute force)."""
    from spotify_data_pipeline_spark.operators.community import modularity_atoms
    from spotify_data_pipeline_spark.operators.triangles import cooccurrence_edges

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey")
    labels = part.select(
        F.col("p_partkey").alias("node"), F.col("p_brand").alias("label")
    )
    return modularity_atoms(edges, labels).orderBy("label")


_BRAND_MODULARITY_ORACLE = """
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), sized AS (
      SELECT l_orderkey FROM li GROUP BY 1
      HAVING count(*) BETWEEN 2 AND 200
    ), e AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM li a
      JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      JOIN sized s ON a.l_orderkey = s.l_orderkey
    ), lab AS (
      SELECT p_partkey AS n, p_brand AS lb FROM part
    ), el AS (
      SELECT e.src, e.dst, ls.lb AS lsrc, ld.lb AS ldst
      FROM e LEFT JOIN lab ls ON e.src = ls.n LEFT JOIN lab ld ON e.dst = ld.n
    ), m AS (
      SELECT CAST(count(*) AS BIGINT) AS m FROM el
    ), intra AS (
      SELECT lsrc AS label, CAST(count(*) AS BIGINT) AS intra_edges
      FROM el WHERE lsrc IS NOT NULL AND lsrc = ldst GROUP BY 1
    ), deg AS (
      SELECT lb AS label,
             CAST(count(DISTINCT n) AS BIGINT) AS n_nodes,
             CAST(count(*) AS BIGINT) AS degree_sum
      FROM (
        SELECT src AS n, lsrc AS lb FROM el
        UNION ALL
        SELECT dst AS n, ldst AS lb FROM el
      ) WHERE lb IS NOT NULL GROUP BY 1
    )
    SELECT d.label, d.n_nodes, d.degree_sum,
           coalesce(i.intra_edges, 0) AS intra_edges,
           m.m AS n_edges,
           CAST(4 * m.m * coalesce(i.intra_edges, 0)
                - d.degree_sum * d.degree_sum AS BIGINT) AS q_num
    FROM deg d LEFT JOIN intra i USING (label), m
    ORDER BY d.label
"""


def lineitem_weighted_median_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median unit price per return flag — the weighted order
    statistic production latency/price reporting needs (each price
    weighted by shipped quantity, so a 50-unit line moves the median
    50× more than a 1-unit line). DISCRETE definition, float-free: the
    first price (in (cents, orderkey, linenumber) order) whose running
    weight crosses half the total, evaluated cross-multiplied
    (2·cumw ≥ W). Because prices ascend, the qualifying set is a
    suffix and min() picks its first row — no second window. Weights
    are integral quantities cast to BIGINT; one partitioned cumsum
    window over each mode's frame."""
    li = load_table(spark, sf_dir, "lineitem")
    from pyspark.sql import Window

    rows = li.select(
        "l_returnflag",
        rnd_cents(F.col("l_extendedprice")).alias("_cents"),
        F.col("l_quantity").cast("long").alias("_w"),
        "l_orderkey",
        "l_linenumber",
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        "_cents", "l_orderkey", "l_linenumber"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wfull = Window.partitionBy("l_returnflag").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = rows.withColumn("_cumw", F.sum("_w").over(w)).withColumn(
        "_W", F.sum("_w").over(wfull)
    )
    return (
        cum.where(2 * F.col("_cumw") >= F.col("_W"))
        .groupBy("l_returnflag")
        .agg(
            F.min("_cents").cast("long").alias("w_median_cents"),
            F.max("_W").cast("long").alias("total_weight"),
        )
        .orderBy("l_returnflag")
    )


_WEIGHTED_MEDIAN_ORACLE = """
    WITH rows_ AS (
      SELECT l_returnflag,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
             CAST(l_quantity AS BIGINT) AS w,
             l_orderkey, l_linenumber
      FROM lineitem
    ), cum AS (
      SELECT l_returnflag, cents,
             sum(w) OVER (PARTITION BY l_returnflag
                          ORDER BY cents, l_orderkey, l_linenumber
                          ROWS UNBOUNDED PRECEDING) AS cumw,
             sum(w) OVER (PARTITION BY l_returnflag) AS totw
      FROM rows_
    )
    SELECT l_returnflag,
           CAST(min(cents) AS BIGINT) AS w_median_cents,
           CAST(max(totw) AS BIGINT) AS total_weight
    FROM cum
    WHERE 2 * cumw >= totw
    GROUP BY 1
    ORDER BY 1
"""


PENDING: tuple[PendingQuery, ...] = (
    PendingQuery(
        "orders_changepoint_day",
        orders_changepoint_day_query,
        _CHANGEPOINT_ORACLE,
        tags=("orders", "timeseries", "changepoint", "segmentation"),
    ),
    PendingQuery(
        "text_kn_continuation",
        text_kn_continuation_query,
        _KN_CONTINUATION_ORACLE,
        tags=("text", "ngram", "lm", "kneser-ney", "integer-exact"),
    ),
    PendingQuery(
        "events_chisq_independence",
        events_chisq_independence_query,
        _CHISQ_INDEP_ORACLE,
        tags=("events", "statistics", "chisquare", "independence", "integer-exact"),
    ),
    PendingQuery(
        "agg_bitmap_distinct",
        agg_bitmap_distinct_query,
        _BITMAP_DISTINCT_ORACLE,
        tags=("agg", "bitmap", "distinct", "mergeable", "exact"),
    ),
    PendingQuery(
        "events_twap",
        events_twap_query,
        _TWAP_ORACLE,
        tags=("events", "timeseries", "twap", "locf", "integer-exact"),
    ),
    PendingQuery(
        "ops_join_size_estimate",
        ops_join_size_estimate_query,
        _JOIN_SIZE_ORACLE,
        tags=("ops", "cardinality", "skew", "selfjoin", "integer-exact"),
    ),
    PendingQuery(
        "privacy_l_diversity",
        privacy_l_diversity_query,
        _L_DIVERSITY_ORACLE,
        tags=("privacy", "l-diversity", "homogeneity", "integer-exact"),
    ),
    PendingQuery(
        "ml_decision_stump",
        ml_decision_stump_query,
        _STUMP_ORACLE,
        tags=("ml", "stump", "1r", "classification", "integer-exact"),
    ),
    PendingQuery(
        "agg_crosscorrelation",
        agg_crosscorrelation_query,
        _CCF_ORACLE,
        tags=("agg", "timeseries", "ccf", "leadlag", "integer-exact"),
    ),
    PendingQuery(
        "dq_order_reconciliation",
        dq_order_reconciliation_query,
        _RECONCILIATION_ORACLE,
        tags=("dq", "reconciliation", "crosstable", "integer-exact"),
    ),
    PendingQuery(
        "orders_aging_report",
        orders_aging_report_query,
        _AGING_ORACLE,
        tags=("orders", "aging", "pipeline", "integer-exact"),
    ),
    PendingQuery(
        "graph_degree_histogram",
        graph_degree_histogram_query,
        _DEGREE_HIST_ORACLE,
        tags=("graph", "degree", "histogram", "log2"),
    ),
    PendingQuery(
        "events_alert_suppression",
        events_alert_suppression_query,
        _ALERT_ORACLE,
        tags=("events", "fold", "alerting", "suppression", "non-associative"),
    ),
    PendingQuery(
        "agg_runs_test",
        agg_runs_test_query,
        _RUNS_TEST_ORACLE,
        tags=("agg", "runs-test", "randomness", "integer-exact"),
    ),
    PendingQuery(
        "llm_mixture_epochs",
        llm_mixture_epochs_query,
        _mixture_oracle(),
        tags=("llmops", "mixture", "epochs", "allocation", "integer-exact"),
    ),
    PendingQuery(
        "events_survival_km",
        events_survival_km_query,
        _KM_ORACLE,
        tags=("events", "survival", "kaplan-meier", "censoring", "integer-exact"),
    ),
    PendingQuery(
        "fn_regex_suite",
        fn_regex_suite_query,
        _REGEX_SUITE_ORACLE,
        tags=("functions", "regex", "parity"),
    ),
    PendingQuery(
        "part_skyline",
        part_skyline_query,
        _SKYLINE_ORACLE,
        tags=("skyline", "pareto", "multi-objective", "integer-exact"),
    ),
    PendingQuery(
        "orders_seasonal_decompose",
        orders_seasonal_decompose_query,
        _SEASONAL_ORACLE,
        tags=("timeseries", "decomposition", "stl", "integer-exact"),
    ),
    PendingQuery(
        "agg_hierarchical_allocation",
        agg_hierarchical_allocation_query,
        _HIER_ALLOC_ORACLE,
        tags=("agg", "allocation", "hierarchical", "integer-exact"),
    ),
    PendingQuery(
        "events_ab_srm",
        events_ab_srm_query,
        _AB_SRM_ORACLE,
        tags=("events", "experimentation", "srm", "bucketing"),
    ),
    PendingQuery(
        "dedup_minhash_estimate",
        dedup_minhash_estimate_query,
        _minhash_estimate_oracle(),
        tags=("dedup", "minhash", "lsh", "driver-provable", "integer-exact"),
    ),
    PendingQuery(
        "dedup_simhash_md5",
        dedup_simhash_md5_query,
        _simhash_md5_oracle(),
        tags=("dedup", "simhash", "hamming", "driver-provable", "integer-exact"),
    ),
    PendingQuery(
        "ml_knn_label",
        ml_knn_label_query,
        _KNN_ORACLE,
        tags=("ml", "knn", "classification", "quantized", "integer-exact"),
    ),
    PendingQuery(
        "graph_clustering_coefficient",
        graph_clustering_coefficient_query,
        _CLUSTERING_ORACLE,
        tags=("graph", "clustering", "transitivity", "integer-exact"),
    ),
    PendingQuery(
        "orders_abc_classification",
        orders_abc_classification_query,
        _ABC_ORACLE,
        tags=("orders", "abc", "concentration", "integer-exact"),
    ),
    PendingQuery(
        "events_outlier_tukey",
        events_outlier_tukey_query,
        _TUKEY_ORACLE,
        tags=("events", "outlier", "tukey", "iqr", "integer-exact"),
    ),
    PendingQuery(
        "graph_assortativity",
        graph_assortativity_query,
        _ASSORTATIVITY_ORACLE,
        tags=("graph", "assortativity", "pearson-atoms", "integer-exact"),
    ),
    PendingQuery(
        "orders_basket_triples",
        orders_basket_triples_query,
        _BASKET_TRIPLES_ORACLE,
        tags=("orders", "itemsets", "apriori", "market-basket", "integer-exact"),
    ),
    PendingQuery(
        "graph_brand_modularity",
        graph_brand_modularity_query,
        _BRAND_MODULARITY_ORACLE,
        tags=("graph", "modularity", "community", "integer-exact"),
    ),
    PendingQuery(
        "lineitem_weighted_median",
        lineitem_weighted_median_query,
        _WEIGHTED_MEDIAN_ORACLE,
        tags=("agg", "weighted-median", "order-statistic", "integer-exact"),
    ),
)
