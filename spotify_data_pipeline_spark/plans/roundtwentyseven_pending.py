"""Round-27 declared-query staging area — the OBJECTIVE-PLUMBING
wave: the deterministic planning arithmetic behind three stochastic
production mechanisms, each exactness-checkable because the
randomness is replaced by the seeded-md5 device (the stratified-
sampling precedent) while the ARITHMETIC under test is the real one.

- **Span-corruption plan** (T5 / Raffel et al. '20 §3.1.4): which
  tokens a mean-length-3 span-corruption pass masks, at a ~15%
  corruption budget — span starts and lengths drawn from md5 bits,
  coverage resolved with a bounded window (a span reaches at most 3
  back), per-source corruption share reported. The denoising-
  objective data layout, as a checkable query.
- **Randomized response** (Warner '65, the local-DP primitive):
  per-user sensitive bit, md5-coin report flips with keep probability
  p=3/4, and the UNBIASED-ESTIMATOR arithmetic (est*2 = 4*reported -
  n) against the known ground truth — what's under test is the
  de-biasing algebra and its per-group error, not the entropy source
  (production swaps the md5 coin for a real RNG; documented).
- **Funnel window sweep**: view -> click -> purchase conversion at
  attribution windows {1 h, 6 h, 24 h} — the window-parameter tuning
  curve for the funnel rows, one first-touch pass shared by all
  windows.

Per-wave staging module (nothing evidenced imports this file).
Exactness rules as earlier waves: integer ppm via DIV/`//`, BIGINT
casts, epoch-microsecond arithmetic, deterministic tiebreaks, the
corrected 16^14 md5 head-15 device.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.functions.text import is_nonblank, tokens
from spotify_data_pipeline_spark.io import load_table


@dataclass(frozen=True)
class PendingQuery:
    name: str
    fn: object
    oracle: str | None
    headline: bool = False
    tags: tuple[str, ...] = ()


_TOKENS_SQL = "string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')"

_MD5_HEAD15 = (
    "(strpos('0123456789abcdef', substr(md5({arg}), 1, 1)) - 1)"
    " * 72057594037927936"
    " + CAST(('0x' || substr(md5({arg}), 2, 14)) AS BIGINT)"
)


def _md5_mod_sql(arg_sql: str, m: int) -> str:
    return f"CAST(({_MD5_HEAD15.format(arg=arg_sql)}) % {m} AS BIGINT)"


def _md5_mod(col: F.Column, m: int) -> F.Column:
    return (
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long") % m
    )


# ---------------------------------------------------------------------------
# 1. Span-corruption plan
# ---------------------------------------------------------------------------

_SC_START_MOD = 20  # ~5% span-start rate
_SC_LEN_MOD = 3  # span length = 2 + md5 % 3  (2..4, mean 3)
_SC_MAX_REACH = 3  # a span covers at most 3 positions behind its start


def llm_span_corruption_plan_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """T5-style span-corruption layout: position i starts a span when
    md5('sc:doc:i') % 20 == 0 (5% start rate), the span length is
    2 + md5('sl:doc:i') % 3 (mean 3 — so the expected corruption
    budget is ~15%); a token is corrupted when any span starting at
    most 3 positions back still covers it (bounded reach by
    construction, resolved with a 3-row window max — no join). Per
    source: tokens, corrupted tokens, span starts, corruption ppm.
    This is the masked-token layout a denoising objective feeds to
    the trainer, as a deterministic checkable query.

    Scale shape: map-only position explode + hashing; ONE bounded
    window (3 preceding rows, per doc); one source agg. No shuffle
    beyond the doc-keyed window and the final bounded agg.
    """
    docs = load_table(spark, sf_dir, "documents").where(
        is_nonblank(F.col("text"))
    )
    pos = docs.select(
        "doc_id",
        "source",
        F.posexplode(tokens(F.col("text"))).alias("i", "term"),
    )
    hashed = pos.select(
        "doc_id",
        "source",
        "i",
        (
            _md5_mod(
                F.concat(F.lit("sc:"), F.col("doc_id"), F.lit(":"), F.col("i")),
                _SC_START_MOD,
            )
            == 0
        ).alias("is_start"),
        (
            F.lit(2)
            + _md5_mod(
                F.concat(F.lit("sl:"), F.col("doc_id"), F.lit(":"), F.col("i")),
                _SC_LEN_MOD,
            )
        ).alias("span_len"),
    ).withColumn(
        "reach",
        F.when(F.col("is_start"), F.col("i") + F.col("span_len") - 1).otherwise(
            F.lit(-1)
        ),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(-_SC_MAX_REACH, 0)
    )
    covered = hashed.withColumn(
        "corrupted", (F.max("reach").over(w) >= F.col("i")).cast("long")
    )
    return (
        covered.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("corrupted").cast("long").alias("corrupted_tokens"),
            F.sum(F.col("is_start").cast("long"))
            .cast("long")
            .alias("span_starts"),
            F.expr("(sum(corrupted) * 1000000) DIV count(1)")
            .cast("long")
            .alias("corruption_ppm"),
        )
        .orderBy("source")
    )


_SC_ORACLE = f"""
  WITH pos AS (
    SELECT doc_id, source,
           CAST(unnest(range(0, len(toks))) AS BIGINT) AS i
    FROM (
      SELECT doc_id, source, {_TOKENS_SQL} AS toks
      FROM documents WHERE length(trim(text)) > 0
    )
  ), hashed AS (
    SELECT doc_id, source, i,
           {_md5_mod_sql("'sc:' || doc_id || ':' || i", _SC_START_MOD)} = 0
             AS is_start,
           2 + {_md5_mod_sql("'sl:' || doc_id || ':' || i", _SC_LEN_MOD)}
             AS span_len
    FROM pos
  ), reach AS (
    SELECT *, CASE WHEN is_start THEN i + span_len - 1 ELSE -1 END AS reach
    FROM hashed
  ), covered AS (
    SELECT source,
           CASE WHEN max(reach) OVER (PARTITION BY doc_id ORDER BY i
             ROWS BETWEEN {_SC_MAX_REACH} PRECEDING AND CURRENT ROW) >= i
             THEN 1 ELSE 0 END AS corrupted,
           CASE WHEN is_start THEN 1 ELSE 0 END AS started
    FROM reach
  )
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(corrupted) AS BIGINT) AS corrupted_tokens,
         CAST(sum(started) AS BIGINT) AS span_starts,
         CAST((sum(corrupted) * 1000000) // count(*) AS BIGINT)
           AS corruption_ppm
  FROM covered GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# 2. Randomized response — local-DP estimator algebra
# ---------------------------------------------------------------------------

_RR_SENSITIVE_MOD = 3  # ground truth: user_id % 3 == 0 holds the bit
_RR_FLIP_MOD = 4  # md5 coin: % 4 == 0 -> flip  (keep prob p = 3/4)


def privacy_randomized_response_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Warner randomized response over the distinct event users,
    grouped by their dominant event type (first-touch type, ts/id
    tiebreak): each user's sensitive bit (user_id % 3 == 0) is
    reported FLIPPED when the md5 coin (% 4 == 0) fires, so the keep
    probability is p = 3/4 and the unbiased estimate of the true
    count is est = (reported - n(1-p)) / (2p-1) = 2*reported - n/2 —
    carried as est_x2 = 4*reported - n to stay integer. Emits per
    group: n, true count (known here — that is the point of the
    check), reported count, est_x2, and the signed error err_x2 =
    est_x2 - 2*true. The de-biasing algebra is what production DP
    aggregation runs; the md5 coin stands in for the RNG so both
    engines agree bit-for-bit (documented).

    Scale shape: one distinct-user agg (first-touch via min struct),
    map-only bit/coin hashing, one bounded group agg.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    users = (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("grp"))
    )
    bits = users.select(
        "grp",
        (F.col("user_id") % _RR_SENSITIVE_MOD == 0).alias("truth"),
        (
            _md5_mod(F.concat(F.lit("rr:"), F.col("user_id")), _RR_FLIP_MOD)
            == 0
        ).alias("flip"),
    ).withColumn(
        "reported",
        (F.col("truth") != F.col("flip")).cast("long"),
    )
    return (
        bits.groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum(F.col("truth").cast("long")).cast("long").alias("true_cnt"),
            F.sum("reported").cast("long").alias("reported_cnt"),
        )
        .select(
            "grp",
            "n_users",
            "true_cnt",
            "reported_cnt",
            F.expr("4 * reported_cnt - n_users").cast("long").alias("est_x2"),
            F.expr("4 * reported_cnt - n_users - 2 * true_cnt")
            .cast("long")
            .alias("err_x2"),
        )
        .orderBy("grp")
    )


_RR_ORACLE = f"""
  WITH users AS (
    SELECT user_id, event_type AS grp FROM (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events) WHERE rn = 1
  ), bits AS (
    SELECT grp,
           user_id % {_RR_SENSITIVE_MOD} = 0 AS truth,
           {_md5_mod_sql("'rr:' || user_id", _RR_FLIP_MOD)} = 0 AS flip
    FROM users
  ), reported AS (
    SELECT grp, truth,
           CASE WHEN truth != flip THEN 1 ELSE 0 END AS reported
    FROM bits
  )
  SELECT grp,
         CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(CASE WHEN truth THEN 1 ELSE 0 END) AS BIGINT) AS true_cnt,
         CAST(sum(reported) AS BIGINT) AS reported_cnt,
         CAST(4 * sum(reported) - count(*) AS BIGINT) AS est_x2,
         CAST(4 * sum(reported) - count(*)
              - 2 * sum(CASE WHEN truth THEN 1 ELSE 0 END) AS BIGINT)
           AS err_x2
  FROM reported GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# 3. Funnel window sweep
# ---------------------------------------------------------------------------

_FW_HOURS = (1, 6, 24)


def events_funnel_window_sweep_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """view -> click -> purchase conversion at attribution windows
    {1 h, 6 h, 24 h}: per user, the FIRST view anchors the funnel;
    the first click within the window after it and the first purchase
    within the window after that click complete it. Emits per window:
    users with a view, click-converted, fully-converted, and both
    conversion ppm readings — the window-parameter tuning curve for
    the funnel family, sharing one first-touch pass.

    Scale shape: three bounded per-user min-aggs (view anchor, then
    conditional mins via min(CASE)), a 3-element explode, one window
    agg. The funnel never materializes event pairs.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("us"),
    )
    v = ev.where(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("us").alias("t_view")
    )
    swept = v.select(
        "user_id",
        "t_view",
        F.explode(
            F.array(*[F.lit(h).cast("long") for h in _FW_HOURS])
        ).alias("window_h"),
    ).withColumn("lim_us", F.col("window_h") * 3600000000)
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_uid"), F.col("us").alias("t_click")
    )
    first_click = (
        swept.join(
            clicks,
            (F.col("user_id") == F.col("c_uid"))
            & (F.col("t_click") >= F.col("t_view"))
            & (F.col("t_click") <= F.col("t_view") + F.col("lim_us")),
            "left",
        )
        .groupBy("user_id", "window_h", "t_view", "lim_us")
        .agg(F.min("t_click").alias("t_click"))
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_uid"), F.col("us").alias("t_buy")
    )
    first_buy = (
        first_click.join(
            purchases,
            (F.col("user_id") == F.col("p_uid"))
            & F.col("t_click").isNotNull()
            & (F.col("t_buy") >= F.col("t_click"))
            & (F.col("t_buy") <= F.col("t_click") + F.col("lim_us")),
            "left",
        )
        .groupBy("user_id", "window_h", "t_click")
        .agg(F.min("t_buy").alias("t_buy"))
    )
    return (
        first_buy.groupBy("window_h")
        .agg(
            F.count(F.lit(1)).cast("long").alias("users_with_view"),
            F.sum(F.col("t_click").isNotNull().cast("long"))
            .cast("long")
            .alias("click_converted"),
            F.sum(
                (F.col("t_click").isNotNull() & F.col("t_buy").isNotNull())
                .cast("long")
            )
            .cast("long")
            .alias("fully_converted"),
            F.expr(
                "(sum(CAST(t_click IS NOT NULL AS LONG)) * 1000000)"
                " DIV count(1)"
            )
            .cast("long")
            .alias("click_ppm"),
            F.expr(
                "(sum(CAST(t_click IS NOT NULL AND t_buy IS NOT NULL"
                " AS LONG)) * 1000000) DIV count(1)"
            )
            .cast("long")
            .alias("full_ppm"),
        )
        .orderBy("window_h")
    )


_FW_LIST = ", ".join(f"({h})" for h in _FW_HOURS)

_FW_ORACLE = f"""
  WITH ev AS (
    SELECT user_id, event_type, epoch_us(ts) AS us FROM events
  ), v AS (
    SELECT user_id, min(us) AS t_view FROM ev
    WHERE event_type = 'view' GROUP BY 1
  ), swept AS (
    SELECT v.user_id, v.t_view, CAST(w.h AS BIGINT) AS window_h,
           CAST(w.h AS BIGINT) * 3600000000 AS lim_us
    FROM v, (VALUES {_FW_LIST}) w(h)
  ), first_click AS (
    SELECT s.user_id, s.window_h, s.t_view, s.lim_us,
           min(c.us) AS t_click
    FROM swept s LEFT JOIN ev c
      ON c.user_id = s.user_id AND c.event_type = 'click'
     AND c.us >= s.t_view AND c.us <= s.t_view + s.lim_us
    GROUP BY 1, 2, 3, 4
  ), first_buy AS (
    SELECT f.user_id, f.window_h, f.t_click, min(p.us) AS t_buy
    FROM first_click f LEFT JOIN ev p
      ON p.user_id = f.user_id AND p.event_type = 'purchase'
     AND f.t_click IS NOT NULL
     AND p.us >= f.t_click AND p.us <= f.t_click + f.lim_us
    GROUP BY 1, 2, 3
  )
  SELECT window_h,
         CAST(count(*) AS BIGINT) AS users_with_view,
         CAST(sum(CASE WHEN t_click IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS click_converted,
         CAST(sum(CASE WHEN t_click IS NOT NULL AND t_buy IS NOT NULL
                       THEN 1 ELSE 0 END) AS BIGINT) AS fully_converted,
         CAST((sum(CASE WHEN t_click IS NOT NULL THEN 1 ELSE 0 END)
               * 1000000) // count(*) AS BIGINT) AS click_ppm,
         CAST((sum(CASE WHEN t_click IS NOT NULL AND t_buy IS NOT NULL
                        THEN 1 ELSE 0 END) * 1000000) // count(*)
              AS BIGINT) AS full_ppm
  FROM first_buy GROUP BY 1 ORDER BY 1
"""


PENDING: tuple[PendingQuery, ...] = (
    PendingQuery(
        "llm_span_corruption_plan",
        llm_span_corruption_plan_query,
        _SC_ORACLE,
        tags=("llmops", "span-corruption", "t5", "md5",
              "integer-exact"),
    ),
    PendingQuery(
        "privacy_randomized_response",
        privacy_randomized_response_query,
        _RR_ORACLE,
        tags=("privacy", "local-dp", "randomized-response", "md5",
              "integer-exact"),
    ),
    PendingQuery(
        "events_funnel_window_sweep",
        events_funnel_window_sweep_query,
        _FW_ORACLE,
        tags=("events", "funnel", "attribution-window",
              "tuning-curve", "integer-exact"),
    ),
)
