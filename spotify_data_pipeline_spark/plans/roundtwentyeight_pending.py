"""Round-28 declared-query staging area — the RANKING-AND-TREND wave:
preference fitting, nonparametric trend, and sequence predictability,
each exact cross-engine.

- **Bradley-Terry strengths** (Hunter '04 MM algorithm, the
  reward-model / preference-fitting primitive RLHF pipelines run):
  pairwise wins synthesized from supplier competition within parts
  (the per-part volume leader beats every other supplier of that
  part), then 2 UNROLLED minorize-maximize updates
  w_i' = floor(W_i * 1e12 / D_i + 0.5),
  D_i = sum over opponents of floor(n_pair * 1e12 / (w_i+w_j) + 0.5)
  — every division a BIGINT/BIGINT double floored per term (the
  micro-nat device applied to MM), so the iterate is bit-identical
  on both engines. Un-normalized by design (documented; MM scale
  drift does not change the ranking).
- **Mann-Kendall trend test** (the nonparametric twin of the OLS/
  Theil-Sen rows): S = sum of pairwise sign(x_j - x_i) over the
  first 128 days of daily revenue — pure integer, plus the 18-scaled
  variance n(n-1)(2n+5).
- **Markov entropy rate** (sequence predictability): per current
  event type, the conditional next-event entropy in micro-nats from
  per-user transition counts — how predictable the event stream is,
  state by state.

Per-wave staging module (nothing evidenced imports this file).
Exactness rules as earlier waves: integer ppm/e6 via DIV/`//`,
BIGINT casts, epoch-microsecond ordering, deterministic tiebreaks.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
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


# ---------------------------------------------------------------------------
# 1. Bradley-Terry strengths — 2 unrolled MM updates
# ---------------------------------------------------------------------------

_BT_STEPS = 2
_BT_TOP = 15


def supplier_bradley_terry_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry supplier strengths from within-part competition:
    for every part, the supplier with the highest total quantity sold
    (suppkey tiebreak) beats each other supplier of that part once;
    the win matrix feeds 2 unrolled MM updates (module docstring) and
    the top-15 strengths ship with win/match counts. The exact shape
    of RLHF preference fitting — pairwise outcomes to latent
    strengths — on the engine's own data.

    Scale shape: one (part, supplier) agg; the winner per part is a
    window top-1; pairwise match rows are a part-keyed equi-join of
    the winner against the losers (bounded by per-part supplier
    counts, never corpus x corpus); each MM step is one pair-keyed
    join + per-supplier agg over symmetric match rows. The bounded
    match matrix is lineage-cut with localCheckpoint (the PageRank /
    k-means / components device) so the unrolled steps reference a
    materialized table instead of re-deriving the corpus scan per
    plan reference.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty")
    )
    w_win = Window.partitionBy("l_partkey").orderBy(
        F.col("qty").desc(), F.col("l_suppkey").asc()
    )
    ranked = ps.withColumn("rk", F.row_number().over(w_win))
    winners = ranked.where(F.col("rk") == 1).select(
        "l_partkey", F.col("l_suppkey").alias("win_s")
    )
    losers = ranked.where(F.col("rk") > 1).select(
        "l_partkey", F.col("l_suppkey").alias("lose_s")
    )
    matches = (
        winners.join(losers, "l_partkey")
        .groupBy("win_s", "lose_s")
        .agg(F.count(F.lit(1)).cast("long").alias("n_win"))
    )
    # symmetric pair view: (i, j, wins_of_i_over_j, total matches i-j)
    pairs = (
        matches.select(
            F.col("win_s").alias("i"),
            F.col("lose_s").alias("j"),
            F.col("n_win").alias("w_ij"),
        )
        .unionByName(
            matches.select(
                F.col("lose_s").alias("i"),
                F.col("win_s").alias("j"),
                F.lit(0).cast("long").alias("w_ij"),
            )
        )
        .groupBy("i", "j")
        .agg(F.sum("w_ij").cast("long").alias("w_ij"))
    )
    totals = pairs.select(
        "i", "j", "w_ij"
    ).join(
        pairs.select(
            F.col("j").alias("i"), F.col("i").alias("j"),
            F.col("w_ij").alias("w_ji"),
        ),
        ["i", "j"],
    ).withColumn("n_pair", (F.col("w_ij") + F.col("w_ji")).cast("long"))
    # lineage cut: the match matrix is bounded (supplier-pair count),
    # and every unrolled MM step references it — without the cut the
    # plan re-derives the corpus scan once per reference
    totals = totals.localCheckpoint(eager=True)
    wins = pairs.groupBy("i").agg(F.sum("w_ij").cast("long").alias("n_wins"))
    wins = wins.localCheckpoint(eager=True)
    strengths = wins.select("i", F.lit(1000000).cast("long").alias("w"))
    for _ in range(_BT_STEPS):
        s_j = strengths.select(
            F.col("i").alias("j"), F.col("w").alias("w_j")
        )
        d = (
            totals.join(strengths, "i")
            .join(s_j, "j")
            .select(
                "i",
                F.floor(
                    F.col("n_pair")
                    * F.lit(1000000000000.0)
                    / (F.col("w") + F.col("w_j"))
                    + F.lit(0.5)
                )
                .cast("long")
                .alias("term"),
            )
            .groupBy("i")
            .agg(F.sum("term").cast("long").alias("d"))
        )
        strengths = (
            wins.join(d, "i")
            .select(
                "i",
                F.floor(
                    F.col("n_wins") * F.lit(1000000000000.0) / F.col("d")
                    + F.lit(0.5)
                )
                .cast("long")
                .alias("w"),
            )
        )
    n_pairs = totals.groupBy("i").agg(
        F.sum("n_pair").cast("long").alias("n_matches")
    )
    return (
        strengths.join(wins, "i")
        .join(n_pairs, "i")
        .orderBy(F.col("w").desc(), F.col("i").asc())
        .limit(_BT_TOP)
        .select(
            F.col("i").cast("long").alias("suppkey"),
            F.col("w").alias("strength_e6"),
            F.col("n_wins").alias("wins"),
            "n_matches",
        )
    )


def _bt_oracle() -> str:
    steps = []
    prev = "s0"
    for k in range(1, _BT_STEPS + 1):
        steps.append(
            f"""d{k} AS (
    SELECT t.i,
           CAST(sum(CAST(floor(n_pair * 1000000000000.0
                                / (a.w + b.w) + 0.5) AS BIGINT))
                AS BIGINT) AS d
    FROM totals t
    JOIN {prev} a ON a.i = t.i
    JOIN {prev} b ON b.i = t.j
    GROUP BY 1
  ), s{k} AS (
    SELECT wins.i,
           CAST(floor(n_wins * 1000000000000.0 / d + 0.5) AS BIGINT) AS w
    FROM wins JOIN d{k} ON d{k}.i = wins.i
  )"""
        )
        prev = f"s{k}"
    chain = ", ".join(steps)
    return f"""
  WITH ps AS (
    SELECT l_partkey, l_suppkey,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
    FROM lineitem GROUP BY 1, 2
  ), ranked AS (
    SELECT *, row_number() OVER (PARTITION BY l_partkey
                                 ORDER BY qty DESC, l_suppkey) AS rk
    FROM ps
  ), matches AS (
    SELECT w.l_suppkey AS win_s, l.l_suppkey AS lose_s,
           CAST(count(*) AS BIGINT) AS n_win
    FROM (SELECT l_partkey, l_suppkey FROM ranked WHERE rk = 1) w
    JOIN (SELECT l_partkey, l_suppkey FROM ranked WHERE rk > 1) l
      USING (l_partkey)
    GROUP BY 1, 2
  ), pairs AS (
    SELECT i, j, CAST(sum(w_ij) AS BIGINT) AS w_ij FROM (
      SELECT win_s AS i, lose_s AS j, n_win AS w_ij FROM matches
      UNION ALL
      SELECT lose_s, win_s, 0 FROM matches
    ) GROUP BY 1, 2
  ), totals AS (
    SELECT a.i, a.j, CAST(a.w_ij + b.w_ij AS BIGINT) AS n_pair
    FROM pairs a JOIN pairs b ON a.i = b.j AND a.j = b.i
  ), wins AS (
    SELECT i, CAST(sum(w_ij) AS BIGINT) AS n_wins FROM pairs GROUP BY 1
  ), s0 AS (
    SELECT i, CAST(1000000 AS BIGINT) AS w FROM wins
  ), {chain}
  SELECT CAST({prev}.i AS BIGINT) AS suppkey,
         {prev}.w AS strength_e6,
         wins.n_wins AS wins,
         np.n_matches
  FROM {prev}
  JOIN wins ON wins.i = {prev}.i
  JOIN (SELECT i, CAST(sum(n_pair) AS BIGINT) AS n_matches
        FROM totals GROUP BY 1) np ON np.i = {prev}.i
  ORDER BY {prev}.w DESC, {prev}.i ASC LIMIT {_BT_TOP}
"""


# ---------------------------------------------------------------------------
# 2. Mann-Kendall trend test
# ---------------------------------------------------------------------------

_MK_N = 128


def agg_mann_kendall_trend_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall nonparametric trend test over the first 128 days
    of daily revenue: S = sum over all i < j of sign(x_j - x_i) —
    pure integer (revenue in cents), with the 18-scaled variance
    n(n-1)(2n+5) and the trend verdict — the distribution-free twin
    of the OLS and Theil-Sen trend rows.

    Scale shape: one day-grain agg builds the bounded 128-row series;
    the pairwise pass is a bounded self-join of the series METADATA
    (128^2/2 = 8k sign evaluations), then a 1-row agg.
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
        .where(F.col("rn") <= _MK_N)
        .select(F.col("rn").alias("i"), "x")
    )
    a = series.select(F.col("i").alias("ia"), F.col("x").alias("xa"))
    b = series.select(F.col("i").alias("ib"), F.col("x").alias("xb"))
    pairs = a.join(b, F.col("ia") < F.col("ib")).select(
        F.signum(F.col("xb") - F.col("xa")).cast("long").alias("s")
    )
    return pairs.agg(
        F.lit(_MK_N).cast("long").alias("n_days"),
        F.sum("s").cast("long").alias("s_stat"),
        F.lit(_MK_N * (_MK_N - 1) * (2 * _MK_N + 5))
        .cast("long")
        .alias("var18"),
        F.when(F.sum("s") > 0, F.lit("increasing"))
        .when(F.sum("s") < 0, F.lit("decreasing"))
        .otherwise(F.lit("none"))
        .alias("trend"),
    )


_MK_ORACLE = f"""
  WITH daily AS (
    SELECT date_trunc('day', o_orderdate) AS day,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS x
    FROM orders GROUP BY 1
  ), series AS (
    SELECT rn AS i, x FROM (
      SELECT x, row_number() OVER (ORDER BY day) AS rn FROM daily)
    WHERE rn <= {_MK_N}
  ), pairs AS (
    SELECT CAST(CASE WHEN b.x > a.x THEN 1
                     WHEN b.x < a.x THEN -1 ELSE 0 END AS BIGINT) AS s
    FROM series a JOIN series b ON a.i < b.i
  )
  SELECT CAST({_MK_N} AS BIGINT) AS n_days,
         CAST(sum(s) AS BIGINT) AS s_stat,
         CAST({_MK_N * (_MK_N - 1) * (2 * _MK_N + 5)} AS BIGINT) AS var18,
         CASE WHEN sum(s) > 0 THEN 'increasing'
              WHEN sum(s) < 0 THEN 'decreasing'
              ELSE 'none' END AS trend
  FROM pairs
"""


# ---------------------------------------------------------------------------
# 3. Markov entropy rate — per-state next-event predictability
# ---------------------------------------------------------------------------


def events_entropy_rate_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-state conditional entropy of the next event type: from
    per-user consecutive transitions (ts, event_id order), H(next |
    cur = i) = sum_j (n_ij/n_i) * ln(n_i/n_ij), each term floored to
    micro-nats — the sequence-predictability readout next to the raw
    transition-matrix row (events_markov_transitions). Low entropy =
    the stream is predictable from one state; max is ln(#states).

    Scale shape: one user-keyed lag window builds transitions, one
    (cur, nxt) agg (bounded by type-pair count), one cur agg.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = (
        ev.withColumn("nxt", F.lead("event_type").over(w))
        .where(F.col("nxt").isNotNull())
        .select(F.col("event_type").alias("cur"), "nxt")
    )
    n_ij = tr.groupBy("cur", "nxt").agg(
        F.count(F.lit(1)).cast("long").alias("n_ij")
    )
    n_i = tr.groupBy("cur").agg(F.count(F.lit(1)).cast("long").alias("n_i"))
    terms = n_ij.join(n_i, "cur").select(
        "cur",
        "n_i",
        F.floor(
            (F.col("n_ij") / F.col("n_i"))
            * F.log(F.col("n_i") / F.col("n_ij"))
            * 1000000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("term_e6"),
        F.lit(1).cast("long").alias("one"),
    )
    return (
        terms.groupBy("cur", "n_i")
        .agg(
            F.sum("one").cast("long").alias("n_next_states"),
            F.sum("term_e6").cast("long").alias("entropy_e6"),
        )
        .select(
            F.col("cur").alias("event_type"),
            F.col("n_i").alias("n_transitions"),
            "n_next_states",
            "entropy_e6",
        )
        .orderBy("event_type")
    )


_ER_ORACLE = """
  WITH tr AS (
    SELECT event_type AS cur, nxt FROM (
      SELECT event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ) WHERE nxt IS NOT NULL
  ), n_ij AS (
    SELECT cur, nxt, CAST(count(*) AS BIGINT) AS n_ij
    FROM tr GROUP BY 1, 2
  ), n_i AS (
    SELECT cur, CAST(count(*) AS BIGINT) AS n_i FROM tr GROUP BY 1
  ), terms AS (
    SELECT cur, n_i,
           CAST(floor((n_ij / n_i) * ln(n_i / n_ij) * 1000000 + 0.5)
                AS BIGINT) AS term_e6
    FROM n_ij JOIN n_i USING (cur)
  )
  SELECT cur AS event_type,
         n_i AS n_transitions,
         CAST(count(*) AS BIGINT) AS n_next_states,
         CAST(sum(term_e6) AS BIGINT) AS entropy_e6
  FROM terms GROUP BY 1, 2 ORDER BY 1
"""


PENDING: tuple[PendingQuery, ...] = (
    PendingQuery(
        "supplier_bradley_terry",
        supplier_bradley_terry_query,
        _bt_oracle(),
        tags=("ranking", "bradley-terry", "mm", "unrolled",
              "integer-exact"),
    ),
    PendingQuery(
        "agg_mann_kendall_trend",
        agg_mann_kendall_trend_query,
        _MK_ORACLE,
        tags=("agg", "trend", "mann-kendall", "nonparametric",
              "integer-exact"),
    ),
    PendingQuery(
        "events_entropy_rate",
        events_entropy_rate_query,
        _ER_ORACLE,
        tags=("events", "markov", "entropy", "micro-nats",
              "integer-exact"),
    ),
)
