"""Round-16 declared-query staging area — the curation-ops wave:
quality threshold sweeps, PII redaction audits, incremental
(batch-vs-history) exact dedup, token-budget allocation, referential
integrity screens, seasonality grids, and value histograms.

Per-wave staging module (nothing evidenced imports this file).

Cross-engine exactness rules as in earlier waves: ppm by integer
DIV/`//` over non-negative numerators, BIGINT casts everywhere,
deterministic tiebreaks on every rank/ORDER BY, md5 over the SAME
normalized string on both engines.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.io import load_table
from spotify_data_pipeline_spark.plans.parity import rnd_cents, rnd_cents_sql


@dataclass(frozen=True)
class PendingQuery:
    name: str
    fn: object
    oracle: str | None
    headline: bool = False
    tags: tuple[str, ...] = ()


# ---------------------------------------------------------------------
# 1. quality threshold sweep (curation frontier)
# ---------------------------------------------------------------------

_SWEEP_THRESHOLDS = (8, 16, 32, 64, 128, 256)


def llm_quality_threshold_sweep_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation-frontier sweep over a minimum-length quality gate: for
    each candidate threshold t (tokens ≥ t), how many documents and
    tokens survive, and the exact ppm of the corpus token budget kept —
    the table a data-mix owner reads before picking the cut (every
    threshold is a point on the quality/volume frontier; Gopher §A1.1
    applies exactly this kind of length rule).

    Scale shape: one map-only token count per doc, a 6-way in-row
    explode of the threshold list (map-side, no join), one agg keyed on
    (threshold) — |thresholds| output rows.
    """
    from spotify_data_pipeline_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents").select(
        F.size(tokens(F.col("text"))).cast("long").alias("n_tok")
    )
    thr = F.array(*[F.lit(t) for t in _SWEEP_THRESHOLDS])
    exploded = docs.select("n_tok", F.explode(thr).alias("threshold"))
    totals = docs.agg(
        F.count(F.lit(1)).cast("long").alias("_docs"),
        F.sum("n_tok").cast("long").alias("_toks"),
    )
    kept = exploded.groupBy("threshold").agg(
        F.sum(F.when(F.col("n_tok") >= F.col("threshold"), 1).otherwise(0))
        .cast("long")
        .alias("docs_kept"),
        F.coalesce(
            F.sum(F.when(F.col("n_tok") >= F.col("threshold"), F.col("n_tok"))),
            F.lit(0),
        )
        .cast("long")
        .alias("tokens_kept"),
    )
    return (
        kept.crossJoin(F.broadcast(totals))
        .select(
            F.col("threshold").cast("long").alias("threshold"),
            "docs_kept",
            "tokens_kept",
            F.expr("(docs_kept * 1000000) DIV _docs").cast("long").alias("docs_ppm"),
            F.expr("(tokens_kept * 1000000) DIV _toks")
            .cast("long")
            .alias("tokens_ppm"),
        )
        .orderBy("threshold")
    )


_SWEEP_ORACLE = r"""
  WITH d AS (
    SELECT CASE WHEN length(trim(text)) > 0
                THEN len(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '))
                ELSE 0 END AS n_tok
    FROM documents
  ), totals AS (
    SELECT CAST(count(*) AS BIGINT) AS _docs, CAST(sum(n_tok) AS BIGINT) AS _toks FROM d
  ), sweep AS (
    SELECT t.threshold,
           CAST(sum(CASE WHEN d.n_tok >= t.threshold THEN 1 ELSE 0 END) AS BIGINT) AS docs_kept,
           CAST(coalesce(sum(CASE WHEN d.n_tok >= t.threshold THEN d.n_tok END), 0) AS BIGINT)
             AS tokens_kept
    FROM d CROSS JOIN (SELECT unnest([8, 16, 32, 64, 128, 256]) AS threshold) t
    GROUP BY 1
  )
  SELECT CAST(threshold AS BIGINT) AS threshold, docs_kept, tokens_kept,
         CAST((docs_kept * 1000000) // _docs AS BIGINT) AS docs_ppm,
         CAST((tokens_kept * 1000000) // _toks AS BIGINT) AS tokens_ppm
  FROM sweep CROSS JOIN totals
  ORDER BY threshold
"""


# ---------------------------------------------------------------------
# 2. PII redaction audit
# ---------------------------------------------------------------------

_EMAIL_RE = r"[a-z0-9._+-]+@[a-z0-9.-]+"
_PHONE_RE = r"\+1-555-[0-9]{4}"


def text_pii_redaction_audit_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII REDACTION audit — the removal step the existing PII
    *detection* screens (operators/textops) stop short of: deterministic
    emails and phone numbers are embedded into every document, redacted
    with fixed placeholder tokens, and the audit reports per source:
    spans found per class, characters before/after, and the exact ppm
    of characters removed. Both engines run the IDENTICAL regexes and
    replacement literals, so lengths match exactly.

    Scale shape: map-only (extract-count + two regexp_replace passes),
    one source-keyed agg.
    """
    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id").cast("string")
    pii_text = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        d,
        F.lit("@mail.example.org or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    stage = docs.select("source", pii_text.alias("t"))
    n_email = F.size(F.regexp_extract_all(F.col("t"), F.lit(_EMAIL_RE), 0))
    n_phone = F.size(F.regexp_extract_all(F.col("t"), F.lit(_PHONE_RE), 0))
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("t"), _EMAIL_RE, "[EMAIL]"), _PHONE_RE, "[PHONE]"
    )
    audited = stage.select(
        "source",
        n_email.cast("long").alias("_ne"),
        n_phone.cast("long").alias("_np"),
        F.length("t").cast("long").alias("_before"),
        F.length(redacted).cast("long").alias("_after"),
    )
    return (
        audited.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_ne").cast("long").alias("n_emails"),
            F.sum("_np").cast("long").alias("n_phones"),
            F.sum("_before").cast("long").alias("chars_before"),
            F.sum("_after").cast("long").alias("chars_after"),
        )
        .withColumn(
            "removed_ppm",
            F.expr("((chars_before - chars_after) * 1000000) DIV chars_before")
            .cast("long"),
        )
        .orderBy("source")
    )


_PII_ORACLE = r"""
  WITH stage AS (
    SELECT source,
           text || ' contact user' || doc_id || '@mail.example.org or +1-555-'
                || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
    FROM documents
  ), audited AS (
    SELECT source,
           CAST(len(regexp_extract_all(t, '[a-z0-9._+-]+@[a-z0-9.-]+')) AS BIGINT) AS _ne,
           CAST(len(regexp_extract_all(t, '\+1-555-[0-9]{4}')) AS BIGINT) AS _np,
           CAST(length(t) AS BIGINT) AS _before,
           CAST(length(regexp_replace(
                  regexp_replace(t, '[a-z0-9._+-]+@[a-z0-9.-]+', '[EMAIL]', 'g'),
                  '\+1-555-[0-9]{4}', '[PHONE]', 'g')) AS BIGINT) AS _after
    FROM stage
  )
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(_ne) AS BIGINT) AS n_emails,
         CAST(sum(_np) AS BIGINT) AS n_phones,
         CAST(sum(_before) AS BIGINT) AS chars_before,
         CAST(sum(_after) AS BIGINT) AS chars_after,
         CAST(((sum(_before) - sum(_after)) * 1000000) // sum(_before) AS BIGINT)
           AS removed_ppm
  FROM audited
  GROUP BY 1
  ORDER BY 1
"""


# ---------------------------------------------------------------------
# 3. incremental (batch-vs-history) exact dedup
# ---------------------------------------------------------------------


def dedup_incremental_batch_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact dedup — the shape every RECURRING crawl runs:
    classify an arriving batch against the accumulated history without
    rescanning history content (keys only). History = docs with
    doc_id % 10 != 0; the batch is the % 10 == 0 docs plus a synthetic
    re-crawl (verbatim copies of % 20 == 1 history docs under new ids)
    plus a double-submission (two copies of % 30 == 0 batch docs) — so
    every classification branch provably fires. Key = md5 of the
    whitespace-normalized lowercased text.

    Classification (precedence): dup_of_history (key exists in
    history) → else first key occurrence in the batch by doc_id =
    new_unique, later ones = dup_in_batch.

    Scale shape: key extraction is map-only; the history side reduces
    to DISTINCT keys before the join (at 100 TB that key table is the
    only thing the daily job rereads — the operators/incremental MV
    discipline); one key join + one first-wins window + a source agg.
    """
    from pyspark.sql import Window

    from spotify_data_pipeline_spark.functions.text import normalize_whitespace

    docs = load_table(spark, sf_dir, "documents")
    key = F.md5(F.lower(normalize_whitespace(F.col("text"))))
    base = docs.select("doc_id", "source", key.alias("k"))
    history = base.where(F.col("doc_id") % 10 != 0)
    batch = (
        base.where(F.col("doc_id") % 10 == 0)
        .unionByName(
            base.where(F.col("doc_id") % 20 == 1).select(
                (F.col("doc_id") + 1_000_000).alias("doc_id"), "source", "k"
            )
        )
        .unionByName(
            base.where((F.col("doc_id") % 10 == 0) & (F.col("doc_id") % 30 == 0)).select(
                (F.col("doc_id") + 2_000_000).alias("doc_id"), "source", "k"
            )
        )
    )
    hist_keys = history.select("k").distinct().withColumn("_in_hist", F.lit(True))
    w = Window.partitionBy("k").orderBy("doc_id")
    classified = (
        batch.join(hist_keys, "k", "left")
        .withColumn("_rk", F.row_number().over(w))
        .select(
            "source",
            F.when(F.col("_in_hist"), F.lit("dup_of_history"))
            .when(F.col("_rk") == 1, F.lit("new_unique"))
            .otherwise(F.lit("dup_in_batch"))
            .alias("verdict"),
        )
    )
    return (
        classified.groupBy("source", "verdict")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("source", "verdict")
    )


_INCR_DEDUP_ORACLE = r"""
  WITH base AS (
    SELECT doc_id, source,
           md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS k
    FROM documents
  ), history AS (SELECT * FROM base WHERE doc_id % 10 <> 0),
  batch AS (
    SELECT doc_id, source, k FROM base WHERE doc_id % 10 = 0
    UNION ALL
    SELECT doc_id + 1000000, source, k FROM base WHERE doc_id % 20 = 1
    UNION ALL
    SELECT doc_id + 2000000, source, k FROM base
    WHERE doc_id % 10 = 0 AND doc_id % 30 = 0
  ), hist_keys AS (SELECT DISTINCT k FROM history),
  classified AS (
    SELECT b.source,
           CASE WHEN h.k IS NOT NULL THEN 'dup_of_history'
                WHEN row_number() OVER (PARTITION BY b.k ORDER BY b.doc_id) = 1
                  THEN 'new_unique'
                ELSE 'dup_in_batch' END AS verdict
    FROM batch b LEFT JOIN hist_keys h ON b.k = h.k
  )
  SELECT source, verdict, CAST(count(*) AS BIGINT) AS n
  FROM classified
  GROUP BY 1, 2
  ORDER BY 1, 2
"""


# ---------------------------------------------------------------------
# 4. token-budget allocation (Hamilton quota)
# ---------------------------------------------------------------------

_TOKEN_BUDGET = 1_000_000


def llm_token_budget_allocation_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampling-budget allocation across sources — the data-mix step
    after the threshold sweep: a 1M-token training budget split across
    sources proportionally to their token supply with Hamilton
    largest-remainder rounding (operators/allocation.py — Σ alloc ==
    budget EXACTLY, each source within one token of its real quota),
    plus each source's exact supply ppm for comparison.

    Scale shape: one token-count agg to |sources| rows, then the
    allocation windows run on that tiny frame.
    """
    from pyspark.sql import Window

    from spotify_data_pipeline_spark.functions.text import tokens
    from spotify_data_pipeline_spark.operators.allocation import (
        largest_remainder_allocation,
    )

    docs = load_table(spark, sf_dir, "documents")
    supply = docs.groupBy("source").agg(
        F.sum(F.size(tokens(F.col("text")))).cast("long").alias("n_tokens")
    )
    alloc = largest_remainder_allocation(
        supply, "source", "n_tokens", _TOKEN_BUDGET, out_col="token_alloc"
    )
    return (
        alloc.withColumn("_total", F.sum("n_tokens").over(Window.partitionBy(F.lit(1))))
        .select(
            "source",
            "n_tokens",
            F.expr("(n_tokens * 1000000) DIV _total").cast("long").alias("supply_ppm"),
            F.col("token_alloc").cast("long").alias("token_alloc"),
        )
        .orderBy("source")
    )


_ALLOCATION_ORACLE = r"""
  WITH supply AS (
    SELECT source,
           CAST(sum(CASE WHEN length(trim(text)) > 0
                THEN len(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '))
                ELSE 0 END) AS BIGINT) AS n_tokens
    FROM documents GROUP BY 1
  ), staged AS (
    SELECT source, n_tokens,
           sum(n_tokens) OVER () AS _total,
           (1000000 * n_tokens) // sum(n_tokens) OVER () AS _base,
           (1000000 * n_tokens) % sum(n_tokens) OVER () AS _rem
    FROM supply
  ), ranked AS (
    SELECT *,
           row_number() OVER (ORDER BY _rem DESC, source ASC) AS _rk,
           1000000 - sum(_base) OVER () AS _leftover
    FROM staged
  )
  SELECT source, n_tokens,
         CAST((n_tokens * 1000000) // _total AS BIGINT) AS supply_ppm,
         CAST(_base + CASE WHEN _rk <= _leftover THEN 1 ELSE 0 END AS BIGINT)
           AS token_alloc
  FROM ranked
  ORDER BY source
"""


# ---------------------------------------------------------------------
# 5. referential-integrity orphan screen
# ---------------------------------------------------------------------


def dq_referential_orphans_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity screen over the star schema's four FK
    edges (orders→customer, lineitem→orders, lineitem→part,
    lineitem→supplier): child rows whose key has NO parent, as count +
    exact ppm — the standing DQ report operators/constraints.py's
    fail-loud gate is the enforcement arm of.

    Scale shape: one LEFT ANTI join per relationship on its natural
    key (each co-partitionable/bucketable), each reduced to one row;
    4-row union output.
    """
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")

    def screen(child, child_key, parent, parent_key, label):
        n_child = child.agg(F.count(F.lit(1)).cast("long").alias("n_child"))
        orphans = (
            child.join(parent, child[child_key] == parent[parent_key], "left_anti")
            .agg(F.count(F.lit(1)).cast("long").alias("n_orphans"))
        )
        return (
            n_child.crossJoin(F.broadcast(orphans))
            .select(
                F.lit(label).alias("relationship"),
                "n_child",
                "n_orphans",
                F.expr("(n_orphans * 1000000) DIV n_child")
                .cast("long")
                .alias("orphan_ppm"),
            )
        )

    out = screen(orders, "o_custkey", customer, "c_custkey", "orders->customer")
    for args in (
        (lineitem, "l_orderkey", orders, "o_orderkey", "lineitem->orders"),
        (lineitem, "l_partkey", part, "p_partkey", "lineitem->part"),
        (lineitem, "l_suppkey", supplier, "s_suppkey", "lineitem->supplier"),
    ):
        out = out.unionByName(screen(*args))
    return out.orderBy("relationship")


_ORPHANS_ORACLE = """
  WITH s1 AS (
    SELECT 'orders->customer' AS relationship,
           CAST((SELECT count(*) FROM orders) AS BIGINT) AS n_child,
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
                AS BIGINT) AS n_orphans
  ), s2 AS (
    SELECT 'lineitem->orders',
           CAST((SELECT count(*) FROM lineitem) AS BIGINT),
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT)
  ), s3 AS (
    SELECT 'lineitem->part',
           CAST((SELECT count(*) FROM lineitem) AS BIGINT),
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
                AS BIGINT)
  ), s4 AS (
    SELECT 'lineitem->supplier',
           CAST((SELECT count(*) FROM lineitem) AS BIGINT),
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
                AS BIGINT)
  ), u AS (
    SELECT * FROM s1 UNION ALL SELECT * FROM s2
    UNION ALL SELECT * FROM s3 UNION ALL SELECT * FROM s4
  )
  SELECT relationship, n_child, n_orphans,
         CAST((n_orphans * 1000000) // n_child AS BIGINT) AS orphan_ppm
  FROM u
  ORDER BY relationship
"""


# ---------------------------------------------------------------------
# 6. weekday × month seasonality grid
# ---------------------------------------------------------------------


def orders_seasonality_heatmap_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday × calendar-month seasonality grid over order revenue —
    the ops heatmap behind staffing/campaign timing. Weekday is
    computed ENGINE-NEUTRALLY as days-since-a-known-Monday mod 7
    (0=Monday; Spark's dayofweek starts Sunday=1, DuckDB has two
    competing conventions — the arithmetic sidesteps both), months are
    calendar months; each cell reports orders, exact cents, and ppm of
    its month's revenue.

    Scale shape: one scan, one 7×12-bounded agg, one window over the
    84-row frame.
    """
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    cells = orders.groupBy(
        F.expr("((datediff(o_orderdate, DATE'1995-01-02') % 7) + 7) % 7")
        .cast("long")
        .alias("weekday"),
        F.month("o_orderdate").cast("long").alias("month"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(rnd_cents(F.col("o_totalprice"))).cast("long").alias("revenue_cents"),
    )
    w_m = Window.partitionBy("month")
    return (
        cells.withColumn("_mtotal", F.sum("revenue_cents").over(w_m))
        .select(
            "weekday",
            "month",
            "n_orders",
            "revenue_cents",
            F.expr("(revenue_cents * 1000000) DIV _mtotal")
            .cast("long")
            .alias("of_month_ppm"),
        )
        .orderBy("weekday", "month")
    )


_SEASONALITY_ORACLE = f"""
  WITH cells AS (
    SELECT CAST(((date_diff('day', DATE '1995-01-02', o_orderdate) % 7) + 7) % 7 AS BIGINT)
             AS weekday,
           CAST(month(o_orderdate) AS BIGINT) AS month,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum({rnd_cents_sql('o_totalprice')}) AS BIGINT) AS revenue_cents
    FROM orders GROUP BY 1, 2
  )
  SELECT weekday, month, n_orders, revenue_cents,
         CAST((revenue_cents * 1000000) // sum(revenue_cents) OVER (PARTITION BY month)
              AS BIGINT) AS of_month_ppm
  FROM cells
  ORDER BY weekday, month
"""


# ---------------------------------------------------------------------
# 7. decade histogram of purchase values
# ---------------------------------------------------------------------


def events_value_log_histogram_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-of-magnitude (decade) histogram of event values per type —
    the heavy-tail triage view (log-scale buckets without log():
    bucket = digit count of the integer cents, exact on both engines;
    float log2/log10 flips buckets at representation boundaries).
    Cells report count, min/max cents, and ppm of the type's rows.

    Scale shape: map-only bucketing, one (type, bucket) agg, window
    over the bounded cell frame.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", rnd_cents(F.col("value")).alias("cents")
    )
    cells = (
        ev.where(F.col("cents") >= 0)
        .groupBy(
            "event_type",
            F.length(F.col("cents").cast("string")).cast("long").alias("decade"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("cents").cast("long").alias("min_cents"),
            F.max("cents").cast("long").alias("max_cents"),
        )
    )
    w_t = Window.partitionBy("event_type")
    return (
        cells.withColumn("_ttotal", F.sum("n").over(w_t))
        .select(
            "event_type",
            "decade",
            "n",
            "min_cents",
            "max_cents",
            F.expr("(n * 1000000) DIV _ttotal").cast("long").alias("of_type_ppm"),
        )
        .orderBy("event_type", "decade")
    )


_VALUE_HIST_ORACLE = f"""
  WITH ev AS (
    SELECT event_type, {rnd_cents_sql('value')} AS cents FROM events
  ), cells AS (
    SELECT event_type,
           CAST(length(CAST(cents AS VARCHAR)) AS BIGINT) AS decade,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(cents) AS BIGINT) AS min_cents,
           CAST(max(cents) AS BIGINT) AS max_cents
    FROM ev WHERE cents >= 0
    GROUP BY 1, 2
  )
  SELECT event_type, decade, n, min_cents, max_cents,
         CAST((n * 1000000) // sum(n) OVER (PARTITION BY event_type) AS BIGINT)
           AS of_type_ppm
  FROM cells
  ORDER BY event_type, decade
"""


PENDING: tuple[PendingQuery, ...] = (
    PendingQuery(
        "llm_quality_threshold_sweep",
        llm_quality_threshold_sweep_query,
        _SWEEP_ORACLE,
        tags=("llm", "curation", "threshold-sweep", "integer-exact"),
    ),
    PendingQuery(
        "text_pii_redaction_audit",
        text_pii_redaction_audit_query,
        _PII_ORACLE,
        tags=("text", "pii", "redaction", "integer-exact"),
    ),
    PendingQuery(
        "dedup_incremental_batch",
        dedup_incremental_batch_query,
        _INCR_DEDUP_ORACLE,
        tags=("dedup", "incremental", "batch-vs-history", "integer-exact"),
    ),
    PendingQuery(
        "llm_token_budget_allocation",
        llm_token_budget_allocation_query,
        _ALLOCATION_ORACLE,
        tags=("llm", "allocation", "hamilton", "data-mix", "integer-exact"),
    ),
    PendingQuery(
        "dq_referential_orphans",
        dq_referential_orphans_query,
        _ORPHANS_ORACLE,
        tags=("dq", "referential-integrity", "anti-join", "integer-exact"),
    ),
    PendingQuery(
        "orders_seasonality_heatmap",
        orders_seasonality_heatmap_query,
        _SEASONALITY_ORACLE,
        tags=("orders", "seasonality", "heatmap", "integer-exact"),
    ),
    PendingQuery(
        "events_value_log_histogram",
        events_value_log_histogram_query,
        _VALUE_HIST_ORACLE,
        tags=("events", "histogram", "heavy-tail", "integer-exact"),
    ),
)
