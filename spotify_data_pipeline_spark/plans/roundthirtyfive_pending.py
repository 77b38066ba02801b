"""Round-35 declared-query staging area — the SERIES / INEQUALITY /
INIT wave closing the round-11 window: change detection, concentration
curves, vocabulary economics, seeding for clustering, outlier and
whiteness tests, readability, and long-memory diagnostics.

- **Page-Hinkley**: change detection over the daily event-count
  series — PH_t = cum_t - min_{s<=t} cum_s of the drift-adjusted
  deviations (global-mean two-pass variant, stated), alarms when PH
  exceeds 5x the mean level. Running-min windows, exact integers.
- **Lorenz curve**: cumulative revenue share by customer decile —
  the concentration curve under the Gini row, exact integer ppm.
- **Vocabulary coverage curve**: token-mass coverage of the top
  {100, 1000, 10000} words — the vocab-sizing table a tokenizer
  build reads (Zipf's integral, measured exactly).
- **k-means++ farthest-point init**: 4 unrolled rounds of exact
  farthest-point seeding on e6-QUANTIZED embeddings (squared L2 on
  integers — no floats anywhere), vec_id tiebreak. The
  deterministic init the kmeans row consumes.
- **Grubbs outlier**: max studentized deviation — the argmax row by
  the INTEGER deviation |x n - sum| (ties to the smaller cents),
  G assembled in exact-double with one e6 floor.
- **Ljung-Box**: omnibus whiteness test of the daily count series at
  lags 1..5 — every autocorrelation numerator/denominator expanded
  to INTEGER form over the common n^2 scale (n^2 Sxy - n tot (head +
  tail) + (n-k) tot^2), doubles only in the final ratios.
- **Flesch-Kincaid readability**: vowel-group syllable proxy, words
  per sentence, the FK grade in e2 — the readability screen beside
  the C4/Gopher rules.
- **Rescaled range (R/S)**: per-block range of cumulative deviations
  over block std at window sizes {16, 64} — the long-memory
  diagnostic (Hurst > 1/2 regime detection); deviations scaled by W
  so the cumulative series is integer-exact.

Per-wave staging module (nothing evidenced imports this file).
Exactness rules as earlier waves.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.functions.text import is_nonblank, tokens
from spotify_data_pipeline_spark.io import load_table
from spotify_data_pipeline_spark.plans.parity import rnd_cents


@dataclass(frozen=True)
class PendingQuery:
    name: str
    fn: object
    oracle: str | None
    headline: bool = False
    tags: tuple[str, ...] = ()


_TOKENS_SQL = "string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')"


# ---------------------------------------------------------------------------
# 1. Page-Hinkley change detection
# ---------------------------------------------------------------------------


def events_page_hinkley_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley change detection on the daily event-count series
    (two-pass global-mean variant, stated): deviations dev_t = x_t *
    n - tot - drift (drift = tot DIV 10 — half-width 5% of the mean,
    everything scaled by n so the series is integer-exact), running
    cumulative cum_t, PH_t = cum_t - min_{s<=t} cum_s, alarm when
    PH_t > 5 * tot (5 mean-days of excess). Emits the full daily
    trace — day, count, ph (n-scaled), alarm.

    Scale shape: one day agg; running-sum and running-min windows
    over the day series (ordered, single partition at fixture scale;
    a production series partitions by coarse time range first).
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", F.col("ts")).alias("day")
    )
    daily = ev.groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("x"))
    tot = Window.partitionBy()
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    staged = (
        daily.withColumn("n", F.count(F.lit(1)).over(tot).cast("long"))
        .withColumn("tot", F.sum("x").over(tot).cast("long"))
        .withColumn(
            "dev",
            (
                F.col("x") * F.col("n")
                - F.col("tot")
                - F.expr("tot DIV 10")
            ).cast("long"),
        )
        .withColumn("cum", F.sum("dev").over(w).cast("long"))
        .withColumn("runmin", F.min("cum").over(w).cast("long"))
    )
    return staged.select(
        "day",
        "x",
        (F.col("cum") - F.col("runmin")).cast("long").alias("ph_scaled"),
        F.when(F.col("cum") - F.col("runmin") > 5 * F.col("tot"), 1)
        .otherwise(0)
        .cast("long")
        .alias("alarm"),
    ).orderBy("day")


_PH_ORACLE = """
  WITH daily AS (
    SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS x
    FROM events GROUP BY 1
  ), staged AS (
    SELECT day, x,
           CAST(count(*) OVER () AS BIGINT) AS n,
           CAST(sum(x) OVER () AS BIGINT) AS tot
    FROM daily
  ), dev AS (
    SELECT day, x, n, tot,
           CAST(x * n - tot - tot // 10 AS BIGINT) AS dev
    FROM staged
  ), cum1 AS (
    SELECT day, x, tot,
           CAST(sum(dev) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum
    FROM dev
  ), cums AS (
    SELECT day, x, tot, cum,
           CAST(min(cum) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS runmin
    FROM cum1
  )
  SELECT day, x, CAST(cum - runmin AS BIGINT) AS ph_scaled,
         CAST(CASE WHEN cum - runmin > 5 * tot THEN 1 ELSE 0 END AS BIGINT)
           AS alarm
  FROM cums
  ORDER BY day
"""


# ---------------------------------------------------------------------------
# 2. Lorenz curve by customer decile
# ---------------------------------------------------------------------------


def orders_lorenz_curve_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz concentration curve of revenue across customer deciles:
    per-customer total cents, deciles via ntile(10) ordered (cents,
    custkey) ascending, and per decile the customer count, revenue,
    cumulative revenue, and exact-integer ppm shares. The curve the
    Gini row integrates.

    Scale shape: one customer agg, one global ntile window (a
    production run substitutes the exact-percentile device), one
    10-row assembly.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", rnd_cents(F.col("o_totalprice")).alias("cents")
    )
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum("cents").cast("long").alias("rev")
    )
    w = Window.orderBy(F.col("rev").asc(), F.col("o_custkey").asc())
    deciled = per_cust.withColumn("decile", F.ntile(10).over(w).cast("long"))
    per_dec = deciled.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("customers"),
        F.sum("rev").cast("long").alias("revenue"),
    )
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    return (
        per_dec.withColumn("cum_revenue", F.sum("revenue").over(wc).cast("long"))
        .withColumn("total", F.sum("revenue").over(wall).cast("long"))
        .select(
            "decile",
            "customers",
            "revenue",
            "cum_revenue",
            F.expr("(revenue * 1000000) DIV total").cast("long").alias("share_ppm"),
            F.expr("(cum_revenue * 1000000) DIV total")
            .cast("long")
            .alias("cum_share_ppm"),
        )
        .orderBy("decile")
    )


_LORENZ_ORACLE = """
  WITH per_cust AS (
    SELECT o_custkey,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS rev
    FROM orders GROUP BY 1
  ), deciled AS (
    SELECT rev, CAST(ntile(10) OVER (ORDER BY rev, o_custkey) AS BIGINT)
             AS decile
    FROM per_cust
  ), per_dec AS (
    SELECT decile, CAST(count(*) AS BIGINT) AS customers,
           CAST(sum(rev) AS BIGINT) AS revenue
    FROM deciled GROUP BY 1
  ), cums AS (
    SELECT *,
           CAST(sum(revenue) OVER (ORDER BY decile
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_revenue,
           CAST(sum(revenue) OVER () AS BIGINT) AS total
    FROM per_dec
  )
  SELECT decile, customers, revenue, cum_revenue,
         CAST((revenue * 1000000) // total AS BIGINT) AS share_ppm,
         CAST((cum_revenue * 1000000) // total AS BIGINT) AS cum_share_ppm
  FROM cums
  ORDER BY decile
"""


# ---------------------------------------------------------------------------
# 3. Vocabulary coverage curve
# ---------------------------------------------------------------------------

_VC_CUTS = (100, 1000, 10000)


def llm_vocab_coverage_curve_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-sizing table: token mass covered by the top
    {100, 1000, 10000} words (frequency-ranked, word tiebreak) — the
    exact Zipf integral a tokenizer build reads to pick its vocab
    size. Emits per cutoff the effective rank used (min(cutoff,
    vocab)), covered and total mass, and coverage ppm.

    Scale shape: one word agg (the only corpus shuffle), a rank
    window over the word table, a 3-literal explode for the cuts.
    """
    docs = load_table(spark, sf_dir, "documents").where(is_nonblank(F.col("text")))
    words = (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    w = Window.orderBy(F.col("c").desc(), F.col("w").asc())
    wall = Window.partitionBy()
    ranked = (
        words.withColumn("rk", F.row_number().over(w).cast("long"))
        .withColumn(
            "cum",
            F.sum("c")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long"),
        )
        .withColumn("total", F.sum("c").over(wall).cast("long"))
        .withColumn("vocab", F.count(F.lit(1)).over(wall).cast("long"))
    )
    cuts = ranked.select(
        "rk",
        "cum",
        "total",
        "vocab",
        F.explode(
            F.array(*[F.lit(k).cast("long") for k in _VC_CUTS])
        ).alias("cutoff"),
    ).where(F.col("rk") == F.least(F.col("cutoff"), F.col("vocab")))
    return cuts.select(
        "cutoff",
        F.col("rk").alias("rank_used"),
        "vocab",
        F.col("cum").alias("covered"),
        "total",
        F.expr("(cum * 1000000) DIV total").cast("long").alias("coverage_ppm"),
    ).orderBy("cutoff")


_VOCAB_ORACLE = rf"""
  WITH words AS (
    SELECT w, CAST(count(*) AS BIGINT) AS c FROM (
      SELECT unnest({_TOKENS_SQL}) AS w
      FROM documents WHERE length(trim(text)) > 0)
    GROUP BY 1
  ), ranked AS (
    SELECT CAST(row_number() OVER (ORDER BY c DESC, w) AS BIGINT) AS rk,
           CAST(sum(c) OVER (ORDER BY c DESC, w
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum,
           CAST(sum(c) OVER () AS BIGINT) AS total,
           CAST(count(*) OVER () AS BIGINT) AS vocab
    FROM words
  ), cuts AS (
    SELECT r.*, k.cutoff
    FROM ranked r
    CROSS JOIN (SELECT unnest([{", ".join(f"CAST({k} AS BIGINT)" for k in _VC_CUTS)}]) AS cutoff) k
    WHERE r.rk = least(k.cutoff, r.vocab)
  )
  SELECT cutoff, rk AS rank_used, vocab, cum AS covered, total,
         CAST((cum * 1000000) // total AS BIGINT) AS coverage_ppm
  FROM cuts
  ORDER BY cutoff
"""


# ---------------------------------------------------------------------------
# 4. k-means++ farthest-point init
# ---------------------------------------------------------------------------

_KPP_DIMS = 16
_KPP_ROUNDS = 3  # centers beyond the seed (4 total)


def _quant(df: DataFrame) -> DataFrame:
    cols = [
        F.floor(
            F.element_at("embedding", i + 1).cast("double") * 1000000 + F.lit(0.5)
        )
        .cast("long")
        .alias(f"q{i}")
        for i in range(_KPP_DIMS)
    ]
    return df.select("vec_id", *cols)


def sim_kmeanspp_farthest_init_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic farthest-point (k-means++ max-min) seeding on
    e6-quantized embeddings (first 16 dims): center 0 is vec 0; each
    of 3 unrolled rounds picks the point with the MAXIMUM squared L2
    distance to its nearest chosen center — all distances are exact
    int64 sums of squared integer differences, ties to the smaller
    vec_id. Emits the chosen centers with their max-min distance at
    selection time (center 0 carries 0).

    Scale shape: per round one broadcast of the <=4-row chosen set +
    a map-side min-distance + a global top-1 (TakeOrdered) — k
    rounds cost k corpus passes, never a pairwise join.
    """
    emb = _quant(load_table(spark, sf_dir, "embeddings"))

    def d2(prefix_a: str, prefix_b: str):
        t = None
        for i in range(_KPP_DIMS):
            diff = F.col(f"{prefix_a}q{i}") - F.col(f"{prefix_b}q{i}")
            term = diff * diff
            t = term if t is None else t + term
        return t

    chosen = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("c_id"),
        *[F.col(f"q{i}").alias(f"cq{i}") for i in range(_KPP_DIMS)],
    )
    out_rows = [
        chosen.select(
            F.lit(0).cast("long").alias("round"),
            F.col("c_id").alias("vec_id"),
            F.lit(0).cast("long").alias("mind2"),
        )
    ]
    for r in range(1, _KPP_ROUNDS + 1):
        scored = (
            emb.join(F.broadcast(chosen), emb.vec_id != chosen.c_id)
            .select(
                "vec_id",
                *[F.col(f"q{i}") for i in range(_KPP_DIMS)],
                d2("", "c").alias("d2"),
            )
            .groupBy("vec_id", *[f"q{i}" for i in range(_KPP_DIMS)])
            .agg(F.min("d2").cast("long").alias("mind2"))
            # points already chosen have mind2 = 0 via self-pairing
            # exclusion; exclude them explicitly by anti-join
            .join(
                chosen.select(F.col("c_id").alias("vec_id")),
                "vec_id",
                "left_anti",
            )
        )
        pick = scored.orderBy(
            F.col("mind2").desc(), F.col("vec_id").asc()
        ).limit(1)
        out_rows.append(
            pick.select(
                F.lit(r).cast("long").alias("round"),
                "vec_id",
                "mind2",
            )
        )
        chosen = chosen.unionByName(
            pick.select(
                F.col("vec_id").alias("c_id"),
                *[F.col(f"q{i}").alias(f"cq{i}") for i in range(_KPP_DIMS)],
            )
        ).localCheckpoint(eager=True)
    res = out_rows[0]
    for o in out_rows[1:]:
        res = res.unionByName(o)
    return res.orderBy("round")


def _kpp_oracle() -> str:
    q_cols = ", ".join(
        f"CAST(floor(CAST(embedding[{i + 1}] AS DOUBLE) * 1000000 + 0.5)"
        f" AS BIGINT) AS q{i}"
        for i in range(_KPP_DIMS)
    )
    d2 = " + ".join(
        f"(e.q{i} - c.q{i}) * (e.q{i} - c.q{i})" for i in range(_KPP_DIMS)
    )
    # unrolled rounds: chosen_r CTEs accumulate picked ids
    ctes = [f"q AS (SELECT vec_id, {q_cols} FROM embeddings)"]
    ctes.append("chosen0 AS (SELECT vec_id FROM q WHERE vec_id = 0)")
    picks = ["SELECT CAST(0 AS BIGINT) AS round, CAST(0 AS BIGINT) AS vec_id,"
             " CAST(0 AS BIGINT) AS mind2"]
    for r in range(1, _KPP_ROUNDS + 1):
        ctes.append(
            f"""scored{r} AS (
      SELECT e.vec_id, CAST(min({d2}) AS BIGINT) AS mind2
      FROM q e JOIN q c ON c.vec_id IN (SELECT vec_id FROM chosen{r - 1})
      WHERE e.vec_id NOT IN (SELECT vec_id FROM chosen{r - 1})
      GROUP BY e.vec_id
    ), pick{r} AS (
      SELECT vec_id, mind2 FROM scored{r}
      ORDER BY mind2 DESC, vec_id LIMIT 1
    ), chosen{r} AS (
      SELECT vec_id FROM chosen{r - 1}
      UNION ALL SELECT vec_id FROM pick{r}
    )"""
        )
        picks.append(
            f"SELECT CAST({r} AS BIGINT) AS round, CAST(vec_id AS BIGINT)"
            f" AS vec_id, mind2 FROM pick{r}"
        )
    return (
        "WITH " + ",\n    ".join(ctes) + "\n    "
        + "\n    UNION ALL ".join(picks) + "\n    ORDER BY round"
    )


# ---------------------------------------------------------------------------
# 5. Grubbs outlier
# ---------------------------------------------------------------------------


def agg_grubbs_outlier_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs' max studentized deviation on order revenue: the outlier
    candidate is the argmax of the INTEGER deviation |cents * n -
    sum| (ties to the smaller cents — stated), and G = |x - mean| /
    s assembled in exact-double from integer moments (DECIMAL(38,0)
    second moment) with one e6 floor. One summary row carrying the
    candidate and the pieces.

    Scale shape: one moment agg, one 1-row broadcast back, a global
    top-1 on the integer deviation.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        rnd_cents(F.col("o_totalprice")).alias("cents")
    )
    moments = orders.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(
            F.col("cents").cast("decimal(38,0)") * F.col("cents").cast("decimal(38,0)")
        ).alias("ssq"),
    )
    dev = (
        orders.crossJoin(F.broadcast(moments))
        .select(
            "cents",
            "n",
            "s",
            "ssq",
            F.abs(
                F.col("cents").cast("decimal(38,0)") * F.col("n") - F.col("s")
            )
            .cast("decimal(38,0)")
            .alias("dev_num"),
        )
        .orderBy(F.col("dev_num").desc(), F.col("cents").asc())
        .limit(1)
    )
    return dev.select(
        F.col("cents").alias("outlier_cents"),
        "n",
        F.col("dev_num").cast("long").alias("dev_num"),
        F.floor(
            F.col("dev_num").cast("double")
            / F.col("n").cast("double")
            / F.sqrt(
                (
                    F.col("n").cast("double") * F.col("ssq").cast("double")
                    - F.col("s").cast("double") * F.col("s").cast("double")
                )
                / (
                    F.col("n").cast("double")
                    * (F.col("n").cast("double") - 1)
                )
            )
            * 1000000
        )
        .cast("long")
        .alias("g_e6"),
    )


_GRUBBS_ORACLE = """
  WITH o AS (
    SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
    FROM orders
  ), m AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(cents) AS BIGINT) AS s,
           sum(CAST(cents AS DECIMAL(38,0)) * CAST(cents AS DECIMAL(38,0)))
             AS ssq
    FROM o
  ), dev AS (
    SELECT o.cents, m.n, m.s, m.ssq,
           abs(CAST(o.cents AS DECIMAL(38,0)) * m.n - m.s) AS dev_num
    FROM o CROSS JOIN m
    ORDER BY dev_num DESC, o.cents
    LIMIT 1
  )
  SELECT cents AS outlier_cents, n,
         CAST(dev_num AS BIGINT) AS dev_num,
         CAST(floor(CAST(dev_num AS DOUBLE) / CAST(n AS DOUBLE)
                    / sqrt((CAST(n AS DOUBLE) * CAST(ssq AS DOUBLE)
                            - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                           / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)))
                    * 1000000) AS BIGINT) AS g_e6
  FROM dev
"""


# ---------------------------------------------------------------------------
# 6. Ljung-Box whiteness test
# ---------------------------------------------------------------------------

_LB_LAGS = 5


def events_ljung_box_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box omnibus whiteness test of the daily event-count
    series at lags 1..5: each autocorrelation's numerator and
    denominator are expanded to INTEGER form over the common n^2
    scale — num_k = n^2 Sxy_k - n tot (head_k + tail_k) + (n-k)
    tot^2, den = n^2 Sxx - n tot^2 — so doubles appear only in the
    final ratio r_k and in Q = n (n+2) sum r_k^2 / (n-k), each
    floored to e6 once. Emits one row per lag with its integer
    pieces, r_e6, and the shared q_e6.

    Scale shape: one day agg, 5 lag-window columns in one pass, one
    1-row assembly.
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", F.col("ts")).alias("day")
    )
    daily = ev.groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("x"))
    w = Window.orderBy("day")
    lagged = daily.select(
        "x",
        *[F.lag("x", k).over(w).alias(f"lag{k}") for k in range(1, _LB_LAGS + 1)],
    )
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("tot"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    ]
    for k in range(1, _LB_LAGS + 1):
        aggs += [
            F.sum(F.col("x") * F.col(f"lag{k}")).cast("long").alias(f"sxy{k}"),
            F.sum(F.when(F.col(f"lag{k}").isNotNull(), F.col("x")).otherwise(0))
            .cast("long")
            .alias(f"tail{k}"),
            F.sum(F.coalesce(F.col(f"lag{k}"), F.lit(0)))
            .cast("long")
            .alias(f"head{k}"),
        ]
    sums = lagged.agg(*aggs)
    lag_structs = []
    for k in range(1, _LB_LAGS + 1):
        num = (
            F.col("n") * F.col("n") * F.col(f"sxy{k}")
            - F.col("n") * F.col("tot") * (F.col(f"head{k}") + F.col(f"tail{k}"))
            + (F.col("n") - k) * F.col("tot") * F.col("tot")
        )
        lag_structs.append(
            F.struct(
                F.lit(k).cast("long").alias("lag"),
                num.cast("long").alias("num_scaled"),
            )
        )
    den = (
        F.col("n") * F.col("n") * F.col("sxx")
        - F.col("n") * F.col("tot") * F.col("tot")
    )
    per_lag = sums.select(
        "n",
        den.cast("long").alias("den_scaled"),
        F.explode(F.array(*lag_structs)).alias("c"),
    ).select(
        "n",
        "den_scaled",
        F.col("c.lag").alias("lag"),
        F.col("c.num_scaled").alias("num_scaled"),
        F.floor(
            F.col("c.num_scaled").cast("double")
            / F.col("den_scaled").cast("double")
            * 1000000
        )
        .cast("long")
        .alias("r_e6"),
    )
    q = per_lag.agg(
        F.floor(
            F.max("n").cast("double")
            * (F.max("n").cast("double") + 2)
            * F.sum(
                (
                    F.col("num_scaled").cast("double")
                    / F.col("den_scaled").cast("double")
                )
                * (
                    F.col("num_scaled").cast("double")
                    / F.col("den_scaled").cast("double")
                )
                / (F.max("n").over(Window.partitionBy()) - F.col("lag"))
            )
            * 1000000
        )
        .cast("long")
        .alias("q_e6")
        if False
        else F.floor(
            F.max("n").cast("double")
            * (F.max("n").cast("double") + 2)
            * F.sum(
                F.col("num_scaled").cast("double")
                * F.col("num_scaled").cast("double")
                / (
                    F.col("den_scaled").cast("double")
                    * F.col("den_scaled").cast("double")
                )
                / (F.col("n") - F.col("lag")).cast("double")
            )
            * 1000000
        )
        .cast("long")
        .alias("q_e6")
    )
    return (
        per_lag.crossJoin(F.broadcast(q))
        .select("lag", "n", "num_scaled", "den_scaled", "r_e6", "q_e6")
        .orderBy("lag")
    )


def _lb_oracle() -> str:
    lag_cols = ",\n           ".join(
        f"lag(x, {k}) OVER (ORDER BY day) AS lag{k}"
        for k in range(1, _LB_LAGS + 1)
    )
    sum_cols = ",\n           ".join(
        f"CAST(sum(x * lag{k}) AS BIGINT) AS sxy{k},"
        f" CAST(sum(CASE WHEN lag{k} IS NOT NULL THEN x ELSE 0 END)"
        f" AS BIGINT) AS tail{k},"
        f" CAST(sum(coalesce(lag{k}, 0)) AS BIGINT) AS head{k}"
        for k in range(1, _LB_LAGS + 1)
    )
    lag_rows = "\n      UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS lag,"
        f" CAST(n * n * sxy{k} - n * tot * (head{k} + tail{k})"
        f" + (n - {k}) * tot * tot AS BIGINT) AS num_scaled,"
        f" CAST(n * n * sxx - n * tot * tot AS BIGINT) AS den_scaled, n"
        f" FROM sums"
        for k in range(1, _LB_LAGS + 1)
    )
    return f"""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ), lagged AS (
      SELECT x,
           {lag_cols}
      FROM daily
    ), sums AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS tot,
           CAST(sum(x * x) AS BIGINT) AS sxx,
           {sum_cols}
      FROM lagged
    ), per_lag AS (
      {lag_rows}
    ), q AS (
      SELECT CAST(floor(CAST(max(n) AS DOUBLE) * (CAST(max(n) AS DOUBLE) + 2)
               * sum(CAST(num_scaled AS DOUBLE) * CAST(num_scaled AS DOUBLE)
                     / (CAST(den_scaled AS DOUBLE) * CAST(den_scaled AS DOUBLE))
                     / CAST(n - lag AS DOUBLE))
               * 1000000) AS BIGINT) AS q_e6
      FROM per_lag
    )
    SELECT p.lag, p.n, p.num_scaled, p.den_scaled,
           CAST(floor(CAST(p.num_scaled AS DOUBLE)
                      / CAST(p.den_scaled AS DOUBLE) * 1000000) AS BIGINT)
             AS r_e6,
           q.q_e6
    FROM per_lag p CROSS JOIN q
    ORDER BY p.lag
    """


# ---------------------------------------------------------------------------
# 7. Flesch-Kincaid readability
# ---------------------------------------------------------------------------


def text_readability_fk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-Kincaid grade screen: syllables approximated by vowel
    groups [aeiouy]+ over the lowercased text (the standard
    dictionary-free proxy), sentences as non-blank [.!?]+ segments
    (min 1), and grade = 0.39 w/s + 11.8 syl/w - 15.59 assembled in
    exact-double from the three integer counts with one e2 floor.
    The readability member of the curation screen family.

    Scale shape: map-only (two regex scans per row), one pass.
    """
    docs = load_table(spark, sf_dir, "documents").where(is_nonblank(F.col("text")))
    per_doc = docs.select(
        "doc_id",
        F.size(tokens(F.col("text"))).cast("long").alias("words"),
        F.greatest(
            F.size(
                F.filter(
                    F.split(F.col("text"), r"[.!?]+"),
                    lambda s: F.length(F.trim(s)) > 0,
                )
            ),
            F.lit(1),
        )
        .cast("long")
        .alias("sentences"),
        F.size(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[aeiouy]+"), F.lit(0))
        )
        .cast("long")
        .alias("syllables"),
    ).where(F.col("words") > 0)
    return per_doc.select(
        "doc_id",
        "words",
        "sentences",
        "syllables",
        F.floor(
            (
                F.lit(0.39) * F.col("words").cast("double")
                / F.col("sentences").cast("double")
                + F.lit(11.8)
                * F.col("syllables").cast("double")
                / F.col("words").cast("double")
                - F.lit(15.59)
            )
            * 100
        )
        .cast("long")
        .alias("fk_grade_e2"),
    ).orderBy("doc_id")


_FK_ORACLE = rf"""
  WITH per_doc AS (
    SELECT doc_id,
           CAST(len({_TOKENS_SQL}) AS BIGINT) AS words,
           CAST(greatest(len(list_filter(
                 string_split_regex(text, '[.!?]+'),
                 s -> length(trim(s)) > 0)), 1) AS BIGINT) AS sentences,
           CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                AS BIGINT) AS syllables
    FROM documents WHERE length(trim(text)) > 0
  )
  SELECT doc_id, words, sentences, syllables,
         CAST(floor((0.39 * CAST(words AS DOUBLE) / CAST(sentences AS DOUBLE)
                     + 11.8 * CAST(syllables AS DOUBLE)
                       / CAST(words AS DOUBLE)
                     - 15.59) * 100) AS BIGINT) AS fk_grade_e2
  FROM per_doc
  WHERE words > 0
  ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# 8. Rescaled range (R/S)
# ---------------------------------------------------------------------------

_RS_WINDOWS = (16, 64)


def orders_rs_range_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rescaled-range statistic of the daily revenue series at block
    sizes 16 and 64 (the Hurst long-memory diagnostic): days are
    indexed and cut into consecutive complete blocks; within a block
    the deviations are scaled by W (dev = W x - block_sum, integer),
    the cumulative-deviation range R_scaled = max cum - min cum is
    exact, S is the block std in exact-double, and rs_e6 =
    floor(R_scaled / (W S) * 1e6). Emits per window size the block
    count and the mean rs (integer DIV of summed floors — stated).

    Scale shape: one day agg; per window size a block-keyed window
    pass (blocks are consecutive index ranges — at production scale
    the series partitions by coarse range first).
    """
    ev = load_table(spark, sf_dir, "orders").select(
        F.date_trunc("day", F.col("o_orderdate")).alias("day"),
        rnd_cents(F.col("o_totalprice")).alias("cents"),
    )
    daily = ev.groupBy("day").agg(F.sum("cents").cast("long").alias("x"))
    w_idx = Window.orderBy("day")
    indexed = daily.withColumn(
        "idx", (F.row_number().over(w_idx) - 1).cast("long")
    )
    outs = []
    for W in _RS_WINDOWS:
        blocks = indexed.withColumn("blk", F.expr(f"idx DIV {W}"))
        sizes = blocks.groupBy("blk").agg(
            F.count(F.lit(1)).alias("bn"),
            F.sum("x").cast("long").alias("bsum"),
            F.sum(
                F.col("x").cast("decimal(38,0)") * F.col("x").cast("decimal(38,0)")
            ).alias("bssq"),
        ).where(F.col("bn") == W)
        staged = (
            blocks.join(sizes, "blk")
            .withColumn("dev", (F.col("x") * W - F.col("bsum")).cast("long"))
            .withColumn(
                "cum",
                F.sum("dev")
                .over(
                    Window.partitionBy("blk")
                    .orderBy("idx")
                    .rowsBetween(Window.unboundedPreceding, 0)
                )
                .cast("long"),
            )
        )
        per_block = staged.groupBy("blk", "bsum", "bssq").agg(
            (F.max("cum") - F.min("cum")).cast("long").alias("r_scaled")
        )
        rs = per_block.select(
            F.floor(
                F.col("r_scaled").cast("double")
                / (
                    F.lit(float(W))
                    * F.sqrt(
                        (
                            F.lit(float(W)) * F.col("bssq").cast("double")
                            - F.col("bsum").cast("double")
                            * F.col("bsum").cast("double")
                        )
                        / F.lit(float(W * W))
                    )
                )
                * 1000000
            )
            .cast("long")
            .alias("rs_e6")
        )
        outs.append(
            rs.agg(
                F.count(F.lit(1)).cast("long").alias("n_blocks"),
                F.expr("sum(rs_e6) DIV count(1)").cast("long").alias("mean_rs_e6"),
            ).select(
                F.lit(W).cast("long").alias("w"),
                "n_blocks",
                "mean_rs_e6",
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res.orderBy("w")


def _rs_oracle() -> str:
    parts = []
    for W in _RS_WINDOWS:
        parts.append(
            f"""
    SELECT CAST({W} AS BIGINT) AS w,
           CAST(count(*) AS BIGINT) AS n_blocks,
           CAST(sum(rs_e6) // count(*) AS BIGINT) AS mean_rs_e6
    FROM (
      SELECT blk,
             CAST(floor(CAST(max(cum) - min(cum) AS DOUBLE)
                  / ({W} * sqrt(({W} * CAST(max(bssq) AS DOUBLE)
                                 - CAST(max(bsum) AS DOUBLE)
                                   * CAST(max(bsum) AS DOUBLE))
                                / {W * W}))
                  * 1000000) AS BIGINT) AS rs_e6
      FROM (
        SELECT b.blk, b.idx,
               CAST(sum(b.x * {W} - s.bsum) OVER (PARTITION BY b.blk
                     ORDER BY b.idx
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum,
               s.bsum, s.bssq
        FROM blocks{W} b JOIN sizes{W} s USING (blk))
      GROUP BY blk)"""
        )
    block_ctes = ",\n  ".join(
        f"""blocks{W} AS (
    SELECT idx, x, CAST(idx // {W} AS BIGINT) AS blk FROM indexed
  ), sizes{W} AS (
    SELECT blk, CAST(sum(x) AS BIGINT) AS bsum,
           sum(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0))) AS bssq
    FROM blocks{W} GROUP BY 1 HAVING count(*) = {W}
  )"""
        for W in _RS_WINDOWS
    )
    union = "\n    UNION ALL".join(parts)
    return f"""
  WITH daily AS (
    SELECT date_trunc('day', o_orderdate) AS day,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS x
    FROM orders GROUP BY 1
  ), indexed AS (
    SELECT CAST(row_number() OVER (ORDER BY day) - 1 AS BIGINT) AS idx, x
    FROM daily
  ),
  {block_ctes}
  {union}
  ORDER BY w
"""


PENDING: tuple[PendingQuery, ...] = (
    PendingQuery(
        "events_page_hinkley",
        events_page_hinkley_query,
        _PH_ORACLE,
        tags=("events", "change-detection", "page-hinkley",
              "integer-exact"),
    ),
    PendingQuery(
        "orders_lorenz_curve",
        orders_lorenz_curve_query,
        _LORENZ_ORACLE,
        tags=("orders", "lorenz", "concentration", "integer-exact"),
    ),
    PendingQuery(
        "llm_vocab_coverage_curve",
        llm_vocab_coverage_curve_query,
        _VOCAB_ORACLE,
        tags=("llm", "vocabulary", "zipf-coverage", "integer-exact"),
    ),
    PendingQuery(
        "sim_kmeanspp_farthest_init",
        sim_kmeanspp_farthest_init_query,
        _kpp_oracle(),
        tags=("sim", "kmeanspp", "farthest-point", "e6-quantized",
              "integer-exact"),
    ),
    PendingQuery(
        "agg_grubbs_outlier",
        agg_grubbs_outlier_query,
        _GRUBBS_ORACLE,
        tags=("agg", "grubbs", "outlier", "decimal38", "exact-double"),
    ),
    PendingQuery(
        "events_ljung_box",
        events_ljung_box_query,
        _lb_oracle(),
        tags=("events", "ljung-box", "whiteness", "integer-scaled",
              "exact-double"),
    ),
    PendingQuery(
        "text_readability_fk",
        text_readability_fk_query,
        _FK_ORACLE,
        tags=("text", "readability", "flesch-kincaid",
              "curation-screen", "exact-double"),
    ),
    PendingQuery(
        "orders_rs_range",
        orders_rs_range_query,
        _rs_oracle(),
        tags=("orders", "rescaled-range", "hurst", "long-memory",
              "exact-double"),
    ),
)
