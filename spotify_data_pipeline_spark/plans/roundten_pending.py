"""Round-10 declared-query staging area (same contract as the
round-6..9 areas: built and oracle-verified NOW, deliberately NOT
declared — the earlier activation windows are fully planned).

Each entry: exact-oracle query + DuckDB SQL, exercised by
``tests/test_roundten_pending.py`` with the driver-shaped comparison.
Families this wave: alert-fatigue suppression (the emit-then-cooldown
non-associative fold), randomness screening (Wald-Wolfowitz runs), and
training-mixture planning (epochs/repeat factors via exact
largest-remainder budgeting).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.io import load_table


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


PENDING: tuple[PendingQuery, ...] = (
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
)
