"""Round-36 declared-query staging area — the CLOSING wave of the
round-11 window (5 queries, filling the 50-slot window exactly):
span-granularity substring dedup, the SimHash cross-snapshot twin,
the Ansari-Bradley scale test, the distilled classifier's calibration
curve, and tolerance-bounded as-of joins.

- **Substring spans**: the run device of dedup_substring_runs emits
  the duplicated SPANS themselves — (doc, start, end, tokens) for
  every maximal duplicated run of >= 15 tokens — the surgical-removal
  artifact (Lee et al. remove spans, not docs).
- **Cross-snapshot SimHash**: the minhash row's bitwise twin — 16-bit
  md5-majority SimHash per doc, NEW x OLD candidate pairs via two
  8-bit band buckets, exact Hamming on candidates.
- **Ansari-Bradley**: rank-based scale test in PURE integers — AB
  scores from doubled ranks, ab2 = min(rank2, 2(n+1) - rank2), summed
  per group (returned vs non-returned prices).
- **Logit calibration bins**: the Fisher-step classifier's
  reliability curve — score deciles vs empirical is-English rate, the
  calibration readout that decides whether the distilled scores can
  gate thresholds (composes the r31 Fisher step with the r25
  calibration-bin device).
- **As-of with tolerance**: the J6 family's tolerance variant (pandas
  merge_asof's `tolerance=`): each click joins the latest prior
  purchase of the same user ONLY if within 48 hours — matched /
  stale-rejected / never-matched accounting per outcome.

Per-wave staging module (nothing evidenced imports this file).
Exactness rules as earlier waves.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.functions.text import is_nonblank, shingles, tokens
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
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long") % m


# ---------------------------------------------------------------------------
# 1. Duplicated substring SPANS
# ---------------------------------------------------------------------------

_SP_K = 5
_SP_MIN_TOKENS = 15


def dedup_substring_spans_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-granularity substring dedup: the islands device of
    dedup_substring_runs, emitting each maximal duplicated run as a
    SPAN — (doc_id, 1-based start token, end token, span_tokens =
    end - start + 1) for runs covering >= 15 tokens. This is the
    removal list a surgical substring-dedup pass consumes (remove the
    span, keep the document).

    Scale shape: identical to the runs row — one posexplode scan, one
    shingle-keyed count, a semi-join back, per-DOC windows; the span
    list adds no new shuffle.
    """
    docs = load_table(spark, sf_dir, "documents").where(is_nonblank(F.col("text")))
    toks = docs.select("doc_id", tokens(F.col("text")).alias("t")).where(
        F.size("t") >= _SP_K
    )
    sh = toks.select(
        "doc_id",
        F.posexplode(shingles(F.col("t"), _SP_K)).alias("pos", "sh"),
    )
    dup_keys = (
        sh.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= 2)
        .select("sh")
    )
    dup_pos = sh.join(dup_keys, "sh", "left_semi")
    w = Window.partitionBy("doc_id").orderBy("pos")
    spans = (
        dup_pos.withColumn("isl", F.col("pos") - F.row_number().over(w))
        .groupBy("doc_id", "isl")
        .agg(
            F.min("pos").cast("long").alias("min_pos"),
            F.max("pos").cast("long").alias("max_pos"),
        )
        .select(
            "doc_id",
            # posexplode is 0-based; spans are reported 1-based
            (F.col("min_pos") + 1).cast("long").alias("start_token"),
            (F.col("max_pos") + _SP_K).cast("long").alias("end_token"),
            (F.col("max_pos") + _SP_K - F.col("min_pos")).cast("long").alias(
                "span_tokens"
            ),
        )
        .where(F.col("span_tokens") >= _SP_MIN_TOKENS)
    )
    return spans.orderBy("doc_id", "start_token")


_SPANS_ORACLE = rf"""
  WITH t AS (
    SELECT doc_id, {_TOKENS_SQL} AS toks
    FROM documents WHERE length(trim(text)) > 0
  ), f AS (
    SELECT doc_id, toks FROM t WHERE len(toks) >= {_SP_K}
  ), s AS (
    SELECT doc_id,
           unnest(range(1, len(toks) - {_SP_K - 2})) AS pos,
           unnest(list_transform(range(1, len(toks) - {_SP_K - 2}),
                                 i -> array_to_string(toks[i:i+{_SP_K - 1}], ' '))) AS sh
    FROM f
  ), dup_keys AS (
    SELECT sh FROM s GROUP BY sh HAVING count(*) >= 2
  ), dup_pos AS (
    SELECT s.doc_id, s.pos FROM s JOIN dup_keys USING (sh)
  ), runs AS (
    SELECT doc_id, pos,
           pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS isl
    FROM dup_pos
  ), spans AS (
    SELECT doc_id,
           CAST(min(pos) AS BIGINT) AS start_token,
           CAST(max(pos) + {_SP_K - 1} AS BIGINT) AS end_token,
           CAST(max(pos) + {_SP_K - 1} - min(pos) + 1 AS BIGINT)
             AS span_tokens
    FROM runs GROUP BY doc_id, isl
  )
  SELECT doc_id, start_token, end_token, span_tokens
  FROM spans
  WHERE span_tokens >= {_SP_MIN_TOKENS}
  ORDER BY doc_id, start_token
"""


# ---------------------------------------------------------------------------
# 2. Cross-snapshot SimHash
# ---------------------------------------------------------------------------

_XSH_BITS = 16
_XSH_CAP = 50
_XSH_HAMMING = 3


def dedup_cross_snapshot_simhash_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SimHash twin of the cross-snapshot MinHash row: per doc a
    16-bit SimHash (bit b set iff the MAJORITY of its distinct
    3-shingles hash to 1 on md5 bit-channel b — ties round down,
    stated), candidates restricted to NEW (odd doc_id) x OLD (even)
    pairs sharing EITHER 8-bit half (two band buckets, width-capped),
    exact Hamming distance on candidates, near-dup flag at <= 3.

    Scale shape: one shingle scan with 16 conditional majority sums;
    the pair join rides two (band, key) equi-buckets — never
    all-pairs, and never NEW x NEW / OLD x OLD.
    """
    from spotify_data_pipeline_spark.operators.parallelism import (
        ensure_min_parallelism,
    )

    # r13 (guide §2.5): the shingle explode + 16 md5 bit-channel sums
    # below are compute-dense over a one-row-group scan (1 task) —
    # the same guard r12 applied to text_simhash_baseline /
    # dedup_simhash_merge_rebuild; this sibling was missed.
    docs = ensure_min_parallelism(
        load_table(spark, sf_dir, "documents").where(is_nonblank(F.col("text")))
    )
    sh = docs.select(
        "doc_id",
        F.explode(F.array_distinct(shingles(tokens(F.col("text")), 3))).alias("sh"),
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n_sh")]
    for b in range(_XSH_BITS):
        aggs.append(
            F.sum(_md5_mod(F.concat(F.lit(f"sb{b}:"), F.col("sh")), 2))
            .cast("long")
            .alias(f"v{b}")
        )
    per_doc = sh.groupBy("doc_id").agg(*aggs)
    h = F.lit(0).cast("long")
    for b in range(_XSH_BITS):
        h = h + F.when(
            F.col(f"v{b}") * 2 > F.col("n_sh"), F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    hashed = per_doc.select(
        "doc_id",
        (F.col("doc_id") % 2 == 1).alias("is_new"),
        h.alias("sh16"),
    )
    bands = hashed.select(
        "doc_id",
        "is_new",
        "sh16",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("band"),
                    (F.col("sh16") % 256).cast("long").alias("key"),
                ),
                F.struct(
                    F.lit(1).alias("band"),
                    F.expr("sh16 DIV 256").cast("long").alias("key"),
                ),
            )
        ).alias("_bk"),
    ).select(
        "doc_id", "is_new", "sh16",
        F.col("_bk.band").alias("band"), F.col("_bk.key").alias("key"),
    )
    widths = bands.groupBy("band", "key").agg(
        F.sum(F.when(F.col("is_new"), 1).otherwise(0)).alias("w_new"),
        F.sum(F.when(F.col("is_new"), 0).otherwise(1)).alias("w_old"),
    )
    keep = widths.where(
        (F.col("w_new").between(1, _XSH_CAP))
        & (F.col("w_old").between(1, _XSH_CAP))
    ).select("band", "key")
    kept = bands.join(keep, ["band", "key"], "left_semi")
    pairs = (
        kept.where(F.col("is_new"))
        .select("band", "key", F.col("doc_id").alias("id_new"), F.col("sh16").alias("h_new"))
        .join(
            kept.where(~F.col("is_new")).select(
                "band", "key", F.col("doc_id").alias("id_old"), F.col("sh16").alias("h_old")
            ),
            ["band", "key"],
        )
        .select("id_new", "id_old", "h_new", "h_old")
        .distinct()
    )
    return pairs.select(
        "id_new",
        "id_old",
        F.bit_count(F.col("h_new").bitwiseXOR(F.col("h_old")))
        .cast("long")
        .alias("hamming"),
        F.when(
            F.bit_count(F.col("h_new").bitwiseXOR(F.col("h_old"))) <= _XSH_HAMMING,
            1,
        )
        .otherwise(0)
        .cast("long")
        .alias("near_dup"),
    ).orderBy("id_new", "id_old")


def _xs_simhash_oracle() -> str:
    v_cols = ",\n           ".join(
        "CAST(sum({h}) AS BIGINT) AS v{b}".format(
            h=_md5_mod_sql(f"'sb{b}:' || sh", 2), b=b
        )
        for b in range(_XSH_BITS)
    )
    bits = " + ".join(
        f"CASE WHEN v{b} * 2 > n_sh THEN CAST({1 << b} AS BIGINT) ELSE 0 END"
        for b in range(_XSH_BITS)
    )
    return rf"""
    WITH t AS (
      SELECT doc_id, {_TOKENS_SQL} AS toks
      FROM documents WHERE length(trim(text)) > 0
    ), s AS (
      SELECT doc_id, unnest(
        CASE WHEN len(toks) >= 3
             THEN list_distinct(list_transform(range(1, len(toks) - 1),
                                               i -> array_to_string(toks[i:i+2], ' ')))
             ELSE [array_to_string(toks, ' ')] END) AS sh
      FROM t
    ), per_doc AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh,
           {v_cols}
      FROM s GROUP BY 1
    ), hashed AS (
      SELECT doc_id, (doc_id % 2 = 1) AS is_new,
             CAST({bits} AS BIGINT) AS sh16
      FROM per_doc
    ), bands AS (
      SELECT doc_id, is_new, sh16, 0 AS band,
             CAST(sh16 % 256 AS BIGINT) AS key FROM hashed
      UNION ALL
      SELECT doc_id, is_new, sh16, 1 AS band,
             CAST(sh16 // 256 AS BIGINT) AS key FROM hashed
    ), widths AS (
      SELECT band, key,
             sum(CASE WHEN is_new THEN 1 ELSE 0 END) AS w_new,
             sum(CASE WHEN is_new THEN 0 ELSE 1 END) AS w_old
      FROM bands GROUP BY 1, 2
    ), keep AS (
      SELECT band, key FROM widths
      WHERE w_new BETWEEN 1 AND {_XSH_CAP} AND w_old BETWEEN 1 AND {_XSH_CAP}
    ), kept AS (
      SELECT b.* FROM bands b JOIN keep k
        ON b.band = k.band AND b.key = k.key
    ), pairs AS (
      SELECT DISTINCT n.doc_id AS id_new, o.doc_id AS id_old,
             n.sh16 AS h_new, o.sh16 AS h_old
      FROM kept n JOIN kept o
        ON n.band = o.band AND n.key = o.key
       AND n.is_new AND NOT o.is_new
    )
    SELECT id_new, id_old,
           CAST(bit_count(xor(h_new, h_old)) AS BIGINT) AS hamming,
           CAST(CASE WHEN bit_count(xor(h_new, h_old)) <= {_XSH_HAMMING}
                     THEN 1 ELSE 0 END AS BIGINT) AS near_dup
    FROM pairs
    ORDER BY id_new, id_old
    """


# ---------------------------------------------------------------------------
# 3. Ansari-Bradley scale test (pure integers)
# ---------------------------------------------------------------------------


def agg_ansari_bradley_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ansari-Bradley test for equality of SCALE between returned
    ('R') and non-returned ('N') item prices — in pure integers:
    doubled combined ranks via the exact tie device (a tie run at
    positions p..p+c-1 gets rank2 = 2p + c - 1), doubled AB scores
    ab2 = min(rank2, 2 (n + 1) - rank2) (small scores at both ends —
    a dispersed group accumulates small scores), summed per group.
    Emits per group n and the doubled score sum; the identity
    sum ab2 over everyone = the fixed total pinned in pytest.

    Scale shape: one value-keyed agg (the only corpus shuffle), a
    running total over the distinct-value table, one group agg.
    """
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag").isin("R", "N")
    ).select(
        F.col("l_returnflag").alias("grp"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("v"),
    )
    by_val = li.groupBy("v").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum(F.when(F.col("grp") == "R", 1).otherwise(0))
        .cast("long")
        .alias("cr"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    wall = Window.partitionBy()
    ranked = (
        by_val.withColumn(
            "before", F.coalesce(F.sum("cnt").over(w), F.lit(0)).cast("long")
        )
        .withColumn("n", F.sum("cnt").over(wall).cast("long"))
        .select(
            "cnt",
            "cr",
            "n",
            (F.lit(2) * (F.col("before") + 1) + F.col("cnt") - 1)
            .cast("long")
            .alias("rank2"),
        )
        .withColumn(
            "ab2",
            F.least(
                F.col("rank2"), F.lit(2) * (F.col("n") + 1) - F.col("rank2")
            ).cast("long"),
        )
    )
    return ranked.agg(
        F.sum(F.col("cr")).cast("long").alias("n_r"),
        F.sum(F.col("cnt") - F.col("cr")).cast("long").alias("n_n"),
        F.sum(F.col("cr") * F.col("ab2")).cast("long").alias("ab2_r"),
        F.sum((F.col("cnt") - F.col("cr")) * F.col("ab2"))
        .cast("long")
        .alias("ab2_n"),
    )


_ANSARI_ORACLE = """
  WITH li AS (
    SELECT l_returnflag AS grp,
           CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v
    FROM lineitem WHERE l_returnflag IN ('R', 'N')
  ), by_val AS (
    SELECT v, CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(CASE WHEN grp = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS cr
    FROM li GROUP BY 1
  ), ranked AS (
    SELECT cnt, cr,
           CAST(sum(cnt) OVER () AS BIGINT) AS n,
           CAST(2 * (coalesce(sum(cnt) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1)
                + cnt - 1 AS BIGINT) AS rank2
    FROM by_val
  ), scored AS (
    SELECT cnt, cr,
           CAST(least(rank2, 2 * (n + 1) - rank2) AS BIGINT) AS ab2
    FROM ranked
  )
  SELECT CAST(sum(cr) AS BIGINT) AS n_r,
         CAST(sum(cnt - cr) AS BIGINT) AS n_n,
         CAST(sum(cr * ab2) AS BIGINT) AS ab2_r,
         CAST(sum((cnt - cr) * ab2) AS BIGINT) AS ab2_n
  FROM scored
"""


# ---------------------------------------------------------------------------
# 4. Logit calibration bins
# ---------------------------------------------------------------------------

_LC_BINS = 10


def ml_logit_calibration_bins_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability curve of the distilled Fisher-step classifier
    (ml_logit_fisher_step's exact device re-derived inline — staging
    modules never import each other): every doc scored with the
    e6-quantized weights, scores cut into 10 ntile bins (score,
    doc_id tiebreak), per bin the count, mean score (integer-e6 DIV),
    and empirical is-English rate ppm. A well-calibrated score is
    monotone in the empirical rate — the readout that decides whether
    the distilled scores can gate a threshold.

    Scale shape: one scan for 5 sums, a 1-row weight broadcast, one
    ntile window, one bin agg.
    """
    docs = load_table(spark, sf_dir, "documents").where(is_nonblank(F.col("text")))
    feats = docs.select(
        "doc_id",
        F.when(F.col("lang") == "en", 1).otherwise(0).cast("long").alias("y"),
        F.size(tokens(F.col("text"))).cast("long").alias("x"),
    ).withColumn("t", (F.col("y") * 2 - 1).cast("long"))
    sums = feats.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum("t").cast("long").alias("st"),
        F.sum(F.col("x") * F.col("t")).cast("long").alias("sxt"),
    )
    den = (
        F.col("n").cast("double") * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    weights = sums.select(
        F.floor(
            F.lit(2.0)
            * (
                F.col("sxx").cast("double") * F.col("st").cast("double")
                - F.col("sx").cast("double") * F.col("sxt").cast("double")
            )
            / den
            * 1000000
        )
        .cast("long")
        .alias("w0_e6"),
        F.floor(
            F.lit(2.0)
            * (
                F.col("n").cast("double") * F.col("sxt").cast("double")
                - F.col("sx").cast("double") * F.col("st").cast("double")
            )
            / den
            * 1000000
        )
        .cast("long")
        .alias("w1_e6"),
    )
    scored = feats.crossJoin(F.broadcast(weights)).select(
        "doc_id",
        "y",
        (F.col("w0_e6") + F.col("w1_e6") * F.col("x")).cast("long").alias(
            "score_e6"
        ),
    )
    w = Window.orderBy(F.col("score_e6").asc(), F.col("doc_id").asc())
    binned = scored.withColumn("bin", F.ntile(_LC_BINS).over(w).cast("long"))
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.expr("sum(score_e6) DIV count(1)").cast("long").alias(
                "mean_score_e6"
            ),
            F.expr("(sum(y) * 1000000) DIV count(1)").cast("long").alias(
                "en_rate_ppm"
            ),
        )
        .orderBy("bin")
    )


_LOGIT_CAL_ORACLE = rf"""
  WITH feats AS (
    SELECT doc_id,
           CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS y,
           CAST(len({_TOKENS_SQL}) AS BIGINT) AS x,
           CAST(CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS BIGINT) AS t
    FROM documents WHERE length(trim(text)) > 0
  ), sums AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS sx,
           CAST(sum(x * x) AS BIGINT) AS sxx,
           CAST(sum(t) AS BIGINT) AS st,
           CAST(sum(x * t) AS BIGINT) AS sxt
    FROM feats
  ), weights AS (
    SELECT CAST(floor(
             (2.0 * (CAST(sxx AS DOUBLE) * CAST(st AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sxt AS DOUBLE))
              / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * 1000000)
             AS BIGINT) AS w0_e6,
           CAST(floor(
             (2.0 * (CAST(n AS DOUBLE) * CAST(sxt AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(st AS DOUBLE))
              / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * 1000000)
             AS BIGINT) AS w1_e6
    FROM sums
  ), scored AS (
    SELECT f.doc_id, f.y,
           CAST(w.w0_e6 + w.w1_e6 * f.x AS BIGINT) AS score_e6
    FROM feats f CROSS JOIN weights w
  ), binned AS (
    SELECT y, score_e6,
           CAST(ntile({_LC_BINS}) OVER (ORDER BY score_e6, doc_id)
                AS BIGINT) AS bin
    FROM scored
  )
  SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(score_e6) // count(*) AS BIGINT) AS mean_score_e6,
         CAST((sum(y) * 1000000) // count(*) AS BIGINT) AS en_rate_ppm
  FROM binned GROUP BY 1
  ORDER BY bin
"""


# ---------------------------------------------------------------------------
# 5. As-of join with tolerance
# ---------------------------------------------------------------------------

_ASOF_TOL_HOURS = 48


def events_asof_tolerance_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance-bounded backward as-of join (pandas merge_asof's
    `tolerance=` semantics — the J6 family's missing variant): each
    CLICK joins the latest prior-or-equal PURCHASE of the same user
    (ties at the same timestamp resolved by event_id order in the
    running window), and the match is kept only if the gap is within
    48 hours. Emits per-user accounting: clicks, matched-within-
    tolerance, stale-rejected (a prior purchase exists but too old),
    never-matched — the freshness audit of a point-in-time feature
    join.

    Scale shape: ONE union-window pass (the tagged-stream as-of
    device: running max of purchase timestamps per user) — no join at
    all; the tolerance check is a map-side filter on the gap.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    ).where(F.col("event_type").isin("click", "purchase"))
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    staged = ev.withColumn(
        "last_purchase_ts",
        F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))).over(w),
    )
    clicks = staged.where(F.col("event_type") == "click").select(
        "user_id",
        F.when(F.col("last_purchase_ts").isNull(), F.lit("never_matched"))
        .when(
            F.col("ts").cast("long") - F.col("last_purchase_ts").cast("long")
            <= _ASOF_TOL_HOURS * 3600,
            F.lit("matched"),
        )
        .otherwise(F.lit("stale_rejected"))
        .alias("outcome"),
    )
    return (
        clicks.groupBy("user_id", "outcome")
        .agg(F.count(F.lit(1)).cast("long").alias("clicks"))
        .orderBy("user_id", "outcome")
    )


_ASOF_TOL_ORACLE = f"""
  WITH ev AS (
    SELECT user_id, event_type, ts, event_id
    FROM events WHERE event_type IN ('click', 'purchase')
  ), staged AS (
    SELECT *,
           max(CASE WHEN event_type = 'purchase' THEN ts END)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS last_purchase_ts
    FROM ev
  ), clicks AS (
    SELECT user_id,
           CASE WHEN last_purchase_ts IS NULL THEN 'never_matched'
                WHEN epoch(ts) - epoch(last_purchase_ts)
                     <= {_ASOF_TOL_HOURS} * 3600 THEN 'matched'
                ELSE 'stale_rejected' END AS outcome
    FROM staged WHERE event_type = 'click'
  )
  SELECT user_id, outcome, CAST(count(*) AS BIGINT) AS clicks
  FROM clicks GROUP BY 1, 2
  ORDER BY user_id, outcome
"""


PENDING: tuple[PendingQuery, ...] = (
    PendingQuery(
        "dedup_substring_spans",
        dedup_substring_spans_query,
        _SPANS_ORACLE,
        tags=("dedup", "substring", "spans", "surgical-removal",
              "integer-exact"),
    ),
    PendingQuery(
        "dedup_cross_snapshot_simhash",
        dedup_cross_snapshot_simhash_query,
        _xs_simhash_oracle(),
        tags=("dedup", "simhash", "cross-snapshot", "banded-hamming"),
    ),
    PendingQuery(
        "agg_ansari_bradley",
        agg_ansari_bradley_query,
        _ANSARI_ORACLE,
        tags=("agg", "ansari-bradley", "scale-test", "doubled-rank",
              "pure-integer"),
    ),
    PendingQuery(
        "ml_logit_calibration_bins",
        ml_logit_calibration_bins_query,
        _LOGIT_CAL_ORACLE,
        tags=("ml", "calibration", "reliability-curve", "distillation"),
    ),
    PendingQuery(
        "events_asof_tolerance",
        events_asof_tolerance_query,
        _ASOF_TOL_ORACLE,
        tags=("events", "asof", "tolerance", "point-in-time",
              "integer-exact"),
    ),
)
