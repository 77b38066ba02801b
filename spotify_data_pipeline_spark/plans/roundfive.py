"""Round-5 declared queries (staged and oracle-verified in round 4 as
``roundfive_pending``, ACTIVATED in round 5 after
``tools/snapshot_evidence.py`` refreshed the evidence hashes —
registration-only change, query bodies untouched).

Each entry: exact-oracle query + DuckDB SQL, exercised by
``tests/test_roundfive.py`` with the driver-shaped comparison.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.io import load_table
from spotify_data_pipeline_spark.operators.parallelism import ensure_min_parallelism
from spotify_data_pipeline_spark.plans.registry import declare


def dedup_exact_passage_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHARACTER-level exact duplicated-passage detection — the missing
    granularity between whole-doc exact dedup (hash the full text) and
    token-shingle near-dup (Jaccard over 3-token sets): documents that
    share verbatim 64-char normalized passages, the standard screen for
    boilerplate/quotation reuse in training corpora (cf. suffix-array
    substring dedup, Lee et al. 2022 — this is the fingerprint-sampled
    scalable form).

    Fingerprint selection is CONTENT-DEFINED (winnowing/CDC-style,
    Schleimer et al. SIGMOD'03): every char offset is hashed and a
    window is selected when its md5's last hex digit is '0' (expected
    1/16 of positions — the volume of a stride-16 scheme WITHOUT its
    fatal flaw: strided windows only match when the shared passage
    sits at equal offsets mod stride in both docs; content-defined
    selection depends only on the passage bytes, so detection is
    alignment-independent). A shared passage of L chars carries L−63
    windows ⇒ miss probability (15/16)^(L−63), <2% at L≥300.

    Exactness: selection AND grouping both key on md5(window) — DuckDB
    computes the identical hex — so the oracle replicates the entire
    pipeline with no cross-engine hash asymmetry.
    """
    return exact_passage_pairs(load_table(spark, sf_dir, "documents"))


def exact_passage_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 64,
    select_hex: str = "0",
    max_docs_per_passage: int = 50,
) -> DataFrame:
    """(id_a, id_b, n_shared): pairs of docs sharing ≥1 selected exact
    normalized ``window``-char passage, with the count of distinct
    shared fingerprints. Docs shorter than ``window`` normalized chars
    produce no fingerprints (identical short docs are exact whole-doc
    dedup's territory). Fingerprints carried by more than
    ``max_docs_per_passage`` docs are dropped before pair generation
    (corpus-wide boilerplate — the w²/2 fan-out cap, same policy and
    same in-array pair device as minhash_lsh_dedup).

    Plan: one normalization pass; position explode + substring + md5
    run codegen'd (NOT in-array HOF lambdas — those evaluate
    interpreted and measured 6× slower on the minhash signatures);
    the selection filter drops ~15/16 of rows before the ONE shuffle
    (fingerprint → collect_set of ids), pairs generated in-array per
    bucket, then one pair-count agg. No self-join, no all-pairs."""
    s_expr = f"lower(trim(regexp_replace({text_col}, '\\\\s+', ' ')))"
    # r12 optimization (guide §2.5 input skew / §2.6 idle capacity): the
    # per-offset md5 fingerprint scan is the engine's densest map stage,
    # and a one-row-group parquet input feeds it exactly ONE task — the
    # whole stage serialized on one core (measured 3.5 s warm at sf0.1
    # on local[32]; ~0.5 s spread). The guard repartitions only the
    # (id, normalized-text) projection of qualifying docs — a few bytes
    # per doc cross the exchange, the L·md5 work fans out — and is a
    # no-op on well-split (production-scale) inputs.
    normalized = ensure_min_parallelism(
        docs.select(F.col(id_col), F.expr(s_expr).alias("_s")).where(
            F.length("_s") >= window
        )
    )
    fingerprinted = (
        normalized.select(
            id_col,
            "_s",
            F.explode(
                F.sequence(F.lit(1), F.length("_s") - F.lit(window - 1))
            ).alias("_p"),
        )
        .select(
            id_col,
            F.md5(F.expr(f"substring(_s, _p, {window})")).alias("_fp"),
        )
        .where(F.expr(f"substring(_fp, 32, 1) = '{select_hex}'"))
    )
    grouped = (
        fingerprinted.groupBy("_fp")
        .agg(F.array_sort(F.collect_set(id_col)).alias("_ids"))
        .where(F.size("_ids").between(2, max_docs_per_passage))
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("_ids"),
            lambda x, i: F.transform(
                F.slice(F.col("_ids"), i + 2, F.size(F.col("_ids"))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    return (
        grouped.select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .agg(F.count("*").cast("long").alias("n_shared"))
    )


_EXACT_PASSAGE_ORACLE = r"""
    WITH t AS (
      SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS s
      FROM documents
    ), fp AS (
      SELECT DISTINCT doc_id, md5(substring(s, CAST(i AS BIGINT), 64)) AS f
      FROM t, unnest(range(1, length(s) - 62)) AS u(i)
      WHERE length(s) >= 64
        AND substring(md5(substring(s, CAST(i AS BIGINT), 64)), 32, 1) = '0'
    ), keep AS (
      SELECT f FROM (SELECT f, count(*) AS c FROM fp GROUP BY 1)
      WHERE c BETWEEN 2 AND 50
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS n_shared
    FROM fp a JOIN keep k ON a.f = k.f
              JOIN fp b ON a.f = b.f AND a.doc_id < b.doc_id
    GROUP BY 1, 2
"""


def events_cumulative_users_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per day — the growth curve every
    product dashboard needs. Naive running COUNT(DISTINCT) over an
    expanding window re-scans history per day; the scalable form is the
    first-seen trick: distinct-count is ONE user-keyed agg (min date
    per user), the running total is a window over the per-DAY frame,
    which is bounded by calendar days, not data volume (the
    events_anomaly / bigram-LM lesson: windows belong on
    already-aggregated frames). Output (d, n_new, cum_users)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    first = ev.groupBy("user_id").agg(F.min("d").alias("d"))
    daily = first.groupBy("d").agg(F.count("*").alias("n_new"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        "d",
        F.col("n_new").cast("long").alias("n_new"),
        F.sum("n_new").over(w).cast("long").alias("cum_users"),
    )


_CUMULATIVE_USERS_ORACLE = """
    WITH f AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS d FROM events GROUP BY 1
    ), daily AS (
      SELECT d, count(*) AS n_new FROM f GROUP BY 1
    )
    SELECT d, CAST(n_new AS BIGINT) AS n_new,
           CAST(sum(n_new) OVER (ORDER BY d
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
    FROM daily
"""


def llm_neardup_source_matrix_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: near-dup pairs (exact 3-token
    Jaccard ≥ 0.5, the hash-matched ``dedup_ngram_jaccard`` graph)
    bucketed by the SOURCE pair — which corpus sources duplicate each
    other, the curation signal that decides which source to drop when a
    mixture double-counts content. Sources are canonicalized with
    least/greatest so (a,b) and (b,a) land in one cell.

    Plan: the pair graph (bare ids — no text after candidate
    generation) joins the tiny (doc_id, source) projection twice —
    both broadcast-eligible at any corpus size ≪ the pair count — then
    one ≤\\|sources\\|² hash agg. Output (source_a, source_b, n_pairs)."""
    from spotify_data_pipeline_spark.operators.dedup import ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs, id_col="doc_id", text_col="text", threshold=0.5
    ).select("id_a", "id_b")
    src = docs.select("doc_id", "source")
    labeled = (
        pairs.join(src.select(F.col("doc_id").alias("id_a"), F.col("source").alias("_sa")), "id_a")
        .join(src.select(F.col("doc_id").alias("id_b"), F.col("source").alias("_sb")), "id_b")
        .select(
            F.least("_sa", "_sb").alias("source_a"),
            F.greatest("_sa", "_sb").alias("source_b"),
        )
    )
    return labeled.groupBy("source_a", "source_b").agg(
        F.count("*").cast("long").alias("n_pairs")
    )


# The pair graph replicates plans/dedup_queries' hash-matched oracle
# (same normalization, shingling, DF cap, 4dp threshold).
_NEARDUP_SOURCE_ORACLE = r"""
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
    SELECT least(da.source, db.source) AS source_a,
           greatest(da.source, db.source) AS source_b,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM pairs JOIN documents da ON pairs.id_a = da.doc_id
               JOIN documents db ON pairs.id_b = db.doc_id
    GROUP BY 1, 2
"""


def join_point_in_time_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join — the feature-store primitive that
    prevents training-label leakage: for each order, the customer's
    spending-tier version valid STRICTLY BEFORE the order date ("state
    entering the order", never the state the order itself creates).
    Joins the SCD2 history built by ``scd2_from_observations`` (the
    hash-matched ``scd2_customer_tier`` lineage) back to the order
    stream. First-ever orders have no prior version → NULL prev_tier
    (kept via left join).

    Plan: the non-equi validity predicate rides ON an equi key
    (custkey), so Spark plans an equi-key join (broadcast-hash while
    the history fits the threshold, sort-merge at warehouse scale)
    with the range test as a post-filter over each customer's handful
    of versions — no BroadcastNestedLoopJoin, no binning needed (the
    per-key fan-out is the version count, bounded by change-points,
    not by corpus size). SCD2 intervals are disjoint by construction,
    so at most one version matches per order — row count is exactly
    \\|orders\\|.
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
    hist = scd2_from_observations(obs, ["o_custkey"], "o_orderdate", ["tier"]).select(
        F.col("o_custkey").alias("_ck"),
        F.col("tier").alias("prev_tier"),
        F.col("o_orderdate").alias("_from"),
        F.col("valid_to").alias("_to"),
    )
    return (
        orders.select("o_orderkey", "o_custkey", "o_orderdate")
        .join(
            hist,
            (F.col("o_custkey") == F.col("_ck"))
            & (F.col("_from") < F.col("o_orderdate"))
            & (F.col("_to").isNull() | (F.col("_to") >= F.col("o_orderdate"))),
            "left",
        )
        .select("o_orderkey", "o_custkey", "prev_tier")
    )


_POINT_IN_TIME_ORACLE = """
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
    ), hist AS (
      SELECT o_custkey, tier, o_orderdate AS valid_from,
             lead(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS valid_to
      FROM kept
    )
    SELECT o.o_orderkey, o.o_custkey, h.tier AS prev_tier
    FROM orders o LEFT JOIN hist h
      ON o.o_custkey = h.o_custkey
     AND h.valid_from < o.o_orderdate
     AND (h.valid_to IS NULL OR h.valid_to >= o.o_orderdate)
"""


def events_top_sessions_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 busiest sessions (30-minute idle gap): per (user,
    session) the event count and span, globally ranked. The
    sessionization is the hash-matched ``events_sessionization``
    lineage (lag-gap cumulative-flag form); the global top-k is
    TakeOrderedAndProject over the ALREADY-AGGREGATED per-session
    frame (one window shuffle on user_id, one session agg, then a
    k-row ordered take — never a global sort of events). Ties broken
    by (user_id, session_start) for a deterministic row set."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    flagged = ev.withColumn(
        "_new", F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0)
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    per = sess.groupBy("user_id", "session_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )
    return (
        per.orderBy(F.col("n_events").desc(), "user_id", "session_start")
        .limit(10)
        .select("user_id", "n_events", "session_start", "session_end")
    )


_TOP_SESSIONS_ORACLE = """
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR date_diff('microsecond', lag(ts) OVER w, ts) > 30 * 60 * 1000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM g
    ), per AS (
      SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events,
             min(ts) AS session_start, max(ts) AS session_end
      FROM s GROUP BY 1, 2
    )
    SELECT user_id, n_events, session_start, session_end
    FROM per
    ORDER BY n_events DESC, user_id, session_start
    LIMIT 10
"""


def events_sliding_distinct_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per 1-hour sliding window (20-min slide) per
    event type — the DAU-style engagement metric where plain counts
    (``events_sliding_window``) overcount multi-event users.

    Exact distinct over sliding windows without per-window user sets:
    pre-group to (window, event_type, user) — the slide already
    replicates each event into its ≤3 covering windows, so one
    dropDuplicates-shaped agg then one count gives the exact distinct.
    Shuffle volume is bounded by (windows × active users), not events.
    Output (window_start, event_type, n_users)."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.select(
        F.window("ts", "1 hour", "20 minutes").alias("w"), "event_type", "user_id"
    ).distinct()
    return per_user.groupBy(
        F.col("w.start").alias("window_start"), "event_type"
    ).agg(F.count("*").cast("long").alias("n_users"))


_SLIDING_DISTINCT_ORACLE = """
    WITH slides AS (
      SELECT user_id, event_type,
             time_bucket(INTERVAL 20 MINUTE, ts) - (s.i * INTERVAL 20 MINUTE) AS window_start
      FROM events, (SELECT unnest(range(0, 3)) AS i) s
      WHERE time_bucket(INTERVAL 20 MINUTE, ts) - (s.i * INTERVAL 20 MINUTE)
            > ts - INTERVAL 1 HOUR
    )
    SELECT window_start, event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM slides
    GROUP BY 1, 2
"""


def llm_pack_efficiency_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing observability: per source, how well the concat-and-chunk
    step (hash-matched ``llm_sequence_packing`` lineage) fills its
    512-token training sequences — doc/sequence counts, exact total
    tokens, and the fill ratio a data team watches to size budgets
    (chronically low fill ⇒ wasted context window; the trailing partial
    sequence makes fill < 1 even at perfect packing).

    Exactness: token counts and sequence counts are exact bigints; the
    single fill division is one float64 op rounded 4dp on both engines.
    One extra hash agg over the packed frame — the packing plan itself
    is unchanged (two-phase running sum, no per-source funneling)."""
    from spotify_data_pipeline_spark.functions.text import is_nonblank, tokens
    from spotify_data_pipeline_spark.operators.packing import packed_sequence_ids
    from spotify_data_pipeline_spark.plans.llmops_queries import _PACK_BUDGET
    from spotify_data_pipeline_spark.plans.parity import rnd

    docs = load_table(spark, sf_dir, "documents").where(is_nonblank(F.col("text")))
    weighted = docs.select(
        "doc_id", "source", F.size(tokens(F.col("text"))).cast("long").alias("n_tokens")
    )
    packed = packed_sequence_ids(
        weighted, group_col="source", order_col="doc_id",
        weight_col="n_tokens", budget=_PACK_BUDGET,
    )
    return (
        packed.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.count_distinct("seq_id").cast("long").alias("n_seqs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .select(
            "source",
            "n_docs",
            "n_seqs",
            "total_tokens",
            rnd(
                F.col("total_tokens") / (F.col("n_seqs") * F.lit(_PACK_BUDGET)), 4
            ).alias("fill"),
        )
    )


_PACK_EFFICIENCY_ORACLE = r"""
    WITH packed AS (
      SELECT doc_id, source, n_tokens,
             CAST(floor(COALESCE(sum(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               / 512) AS BIGINT) AS seq_id
      FROM (
        SELECT doc_id, source,
               CAST(len(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS BIGINT) AS n_tokens
        FROM documents WHERE length(trim(text)) > 0
      )
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT seq_id) AS BIGINT) AS n_seqs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           floor(CAST(sum(n_tokens) AS DOUBLE)
                 / (count(DISTINCT seq_id) * 512) * 10000 + 0.5) / 10000 AS fill
    FROM packed
    GROUP BY source
"""


def text_novelty_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty scoring — the redundancy curve a curation
    pipeline uses to order or prune an ingest stream: what fraction of
    each document's distinct 3-token shingles was never seen in any
    EARLIER document (doc_id order = arrival order)? Repeated
    boilerplate scores near 0, fresh content near 1.

    Plan: one tokenization pass (the shared shingle pipeline), one
    shingle-keyed agg for first-seen doc (min doc_id — the same
    first-seen trick as events_cumulative_users, applied to content
    instead of users), join back on shingle, one per-doc agg. The
    novelty ratio is one float division of exact bigints, rounded 4dp.
    Output (doc_id, n_shingles, n_novel, novelty).
    """
    from spotify_data_pipeline_spark.operators.dedup import shingle_hash_sets
    from spotify_data_pipeline_spark.plans.parity import rnd

    docs = load_table(spark, sf_dir, "documents")
    sh = shingle_hash_sets(docs, id_col="doc_id", text_col="text").select(
        "doc_id", F.explode("hset").alias("_h")
    )
    first_seen = sh.groupBy("_h").agg(F.min("doc_id").alias("_first"))
    return (
        sh.join(first_seen, "_h")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.sum(
                F.when(F.col("_first") == F.col("doc_id"), 1).otherwise(0)
            ).cast("long").alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            rnd(F.col("n_novel") / F.col("n_shingles"), 4).alias("novelty"),
        )
    )


# Shingle identity matches the Spark side via the string domain (the
# xxhash64-vs-string equivalence argument of the contamination screen:
# distinct hashed shingles ≡ distinct shingle strings up to ~2^-32).
_TEXT_NOVELTY_ORACLE = r"""
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
    ), fs AS (
      SELECT sh, min(doc_id) AS first_seen FROM s GROUP BY 1
    )
    SELECT s.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN fs.first_seen = s.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
           floor(CAST(sum(CASE WHEN fs.first_seen = s.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*) * 10000 + 0.5) / 10000 AS novelty
    FROM s JOIN fs USING (sh)
    GROUP BY s.doc_id
"""


def events_pareto_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-concentration (Pareto) curve: users ranked by event count
    descending, with each rank's cumulative share of all events — the
    "top 20% of users drive X% of activity" curve, and the skew signal
    that decides whether a user-keyed operator needs salting.

    Plan: one user agg (events collapse to ≤|users| rows), then rank +
    cumulative sums as windows over the aggregated frame (bounded by
    the user count, the events_anomaly lesson); the total is an in-plan
    window sum, not a driver round-trip. Shares are float divisions of
    exact bigints, 4dp. Output (rank, user_id, n_events, cum_share)."""
    from pyspark.sql import Window

    from spotify_data_pipeline_spark.plans.parity import rnd

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    w_rank = Window.orderBy(F.col("n").desc(), F.col("user_id").asc())
    w_cum = w_rank.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy()
    return per_user.select(
        F.row_number().over(w_rank).cast("long").alias("rank"),
        "user_id",
        F.col("n").cast("long").alias("n_events"),
        rnd(
            F.sum("n").over(w_cum).cast("double") / F.sum("n").over(w_all), 4
        ).alias("cum_share"),
    )


_EVENTS_PARETO_ORACLE = """
    WITH per_user AS (
      SELECT user_id, count(*) AS n FROM events GROUP BY 1
    )
    SELECT CAST(row_number() OVER w AS BIGINT) AS rank,
           user_id,
           CAST(n AS BIGINT) AS n_events,
           floor(CAST(sum(n) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                 / (SELECT sum(n) FROM per_user) * 10000 + 0.5) / 10000 AS cum_share
    FROM per_user
    WINDOW w AS (ORDER BY n DESC, user_id ASC)
"""


def dedup_passage_removal_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-passage REMOVAL (operators/passage.py) over the
    documents table: the Lee et al. 2022 span-cutting step that
    completes the substring-dedup story (detection is
    ``dedup_exact_passage``). Driver-proven end to end: the oracle
    replicates normalization, content-defined fingerprint selection,
    winner election, gaps-and-islands extent merging, AND the stitched
    clean text (compared by md5 + length — both engines compute
    identical md5 hex)."""
    from spotify_data_pipeline_spark.operators.passage import (
        remove_duplicate_passages,
    )

    cleaned = remove_duplicate_passages(load_table(spark, sf_dir, "documents"))
    return cleaned.select(
        "doc_id",
        "n_extents",
        "n_cut",
        F.length("text_clean").cast("long").alias("clean_len"),
        F.md5("text_clean").alias("clean_md5"),
    )


_PASSAGE_REMOVAL_ORACLE = r"""
    WITH t AS (
      SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS s
      FROM documents
    ), fpos AS (
      SELECT doc_id, CAST(i AS BIGINT) AS p,
             md5(substring(s, CAST(i AS BIGINT), 64)) AS f
      FROM t, unnest(range(1, length(s) - 62)) AS u(i)
      WHERE length(s) >= 64
        AND substring(md5(substring(s, CAST(i AS BIGINT), 64)), 32, 1) = '0'
    ), winners AS (
      SELECT f, min(doc_id) AS w
      FROM fpos GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
    ), ext AS (
      SELECT fpos.doc_id, p AS lo, p + 63 AS hi
      FROM fpos JOIN winners USING (f)
      WHERE fpos.doc_id <> winners.w
    ), isl AS (
      SELECT doc_id, lo, hi,
             CASE WHEN max(hi) OVER w IS NULL OR lo > max(hi) OVER w + 1
                  THEN 1 ELSE 0 END AS nw
      FROM ext
      WINDOW w AS (PARTITION BY doc_id ORDER BY lo
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ), isl2 AS (
      SELECT doc_id, lo, hi,
             sum(nw) OVER (PARTITION BY doc_id ORDER BY lo
                           ROWS UNBOUNDED PRECEDING) AS g
      FROM isl
    ), merged AS (
      SELECT doc_id, g, min(lo) AS lo, max(hi) AS hi
      FROM isl2 GROUP BY 1, 2
    ), segs AS (
      SELECT doc_id, lo, hi,
             coalesce(lag(hi) OVER (PARTITION BY doc_id ORDER BY lo), 0) + 1 AS ss
      FROM merged
    ), agg AS (
      SELECT segs.doc_id,
             string_agg(substring(t.s, CAST(ss AS BIGINT), CAST(lo - ss AS BIGINT)), ''
                        ORDER BY lo) AS head,
             max(hi) AS maxhi,
             CAST(count(*) AS BIGINT) AS n_extents,
             CAST(sum(hi - lo + 1) AS BIGINT) AS n_cut
      FROM segs JOIN t ON t.doc_id = segs.doc_id
      GROUP BY 1
    )
    SELECT t.doc_id,
           CAST(coalesce(a.n_extents, 0) AS BIGINT) AS n_extents,
           CAST(coalesce(a.n_cut, 0) AS BIGINT) AS n_cut,
           CAST(length(CASE WHEN a.doc_id IS NULL THEN t.s
                ELSE a.head || substring(t.s, CAST(maxhi AS BIGINT) + 1) END) AS BIGINT)
             AS clean_len,
           md5(CASE WHEN a.doc_id IS NULL THEN t.s
               ELSE a.head || substring(t.s, CAST(maxhi AS BIGINT) + 1) END) AS clean_md5
    FROM t LEFT JOIN agg a ON a.doc_id = t.doc_id
"""


def events_interval_join_outer_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream LEFT OUTER interval join
    (streaming/events.py::purchase_window_join_outer), declared so the
    round-4 round's most subtle streaming semantics — exactly ONE null
    row per lonely purchase — is driver-proven against a naive LEFT
    theta join oracle, not just pytest-pinned (r04 verdict item 4).

    Same composition as the streaming form: Structured Streaming (and
    any 100 TB batch plan) cannot afford the BroadcastNestedLoopJoin a
    naive theta join produces, so each EVENT advertises into its own
    5-minute bin and the next one (the two bins whose purchase windows
    can cover it) while each purchase keeps ONE row at its own bin —
    an unmatched purchase survives the left join as exactly one null
    row, and a matching event meets each purchase through exactly one
    advertised bin (e_bin ∈ {p_bin-1, p_bin} ⇒ p_bin is in the event's
    {e_bin, e_bin+1} exactly once), so no dedup pass is needed.
    Purchases are restricted by a deterministic key filter (id % 4 = 3)
    purely to bound driver-compared output; both engines apply it.
    """
    from spotify_data_pipeline_spark.operators.rangejoin import _floordiv_sql

    win_us = 5 * 60 * 1_000_000
    ev_all = load_table(spark, sf_dir, "events")
    ev = ev_all.select("event_id", "ts").withColumn(
        "_bin",
        F.explode(
            F.array(
                F.expr(_floordiv_sql("unix_micros(ts)", win_us)),
                F.expr(_floordiv_sql("unix_micros(ts)", win_us) + " + 1"),
            )
        ),
    )
    purchases = (
        ev_all.where((F.col("event_type") == "purchase") & (F.col("event_id") % 4 == 3))
        .select(F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts"))
        .withColumn("_bin", F.expr(_floordiv_sql("unix_micros(p_ts)", win_us)))
    )
    cond = F.expr(
        "ev._bin = p._bin AND ts > p_ts - interval 5 minutes"
        " AND ts <= p_ts AND event_id != purchase_id"
    )
    return (
        purchases.alias("p")
        .join(ev.alias("ev"), cond, "left_outer")
        .select("purchase_id", "p_ts", "event_id", F.col("ts").alias("ev_ts"))
    )


_INTERVAL_OUTER_ORACLE = """
    SELECT p.event_id AS purchase_id, p.ts AS p_ts,
           e.event_id AS event_id, e.ts AS ev_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase' AND event_id % 4 = 3) p
    LEFT JOIN events e
      ON e.ts > p.ts - INTERVAL 5 MINUTE AND e.ts <= p.ts
     AND e.event_id <> p.event_id
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
        "dedup_exact_passage",
        dedup_exact_passage_query,
        _EXACT_PASSAGE_ORACLE,
        headline=True,  # the round's new physical shape: char-level fingerprint dedup
        tags=("dedup", "text", "passage", "charlevel"),
    ),
    PendingQuery(
        "events_cumulative_users",
        events_cumulative_users_query,
        _CUMULATIVE_USERS_ORACLE,
        tags=("events", "analytics", "growth"),
    ),
    PendingQuery(
        "llm_neardup_source_matrix",
        llm_neardup_source_matrix_query,
        _NEARDUP_SOURCE_ORACLE,
        tags=("llmops", "dedup", "curation"),
    ),
    PendingQuery(
        "join_point_in_time",
        join_point_in_time_query,
        _POINT_IN_TIME_ORACLE,
        tags=("join", "temporal", "scd2", "featurestore"),
    ),
    PendingQuery(
        "events_top_sessions",
        events_top_sessions_query,
        _TOP_SESSIONS_ORACLE,
        tags=("events", "session", "topk"),
    ),
    PendingQuery(
        "events_sliding_distinct",
        events_sliding_distinct_query,
        _SLIDING_DISTINCT_ORACLE,
        tags=("events", "window", "distinct"),
    ),
    PendingQuery(
        "llm_pack_efficiency",
        llm_pack_efficiency_query,
        _PACK_EFFICIENCY_ORACLE,
        tags=("llmops", "packing", "observability"),
    ),
    PendingQuery(
        "text_novelty",
        text_novelty_query,
        _TEXT_NOVELTY_ORACLE,
        tags=("text", "curation", "novelty"),
    ),
    PendingQuery(
        "events_pareto",
        events_pareto_query,
        _EVENTS_PARETO_ORACLE,
        tags=("events", "analytics", "skew"),
    ),
    PendingQuery(
        "events_interval_join_outer",
        events_interval_join_outer_query,
        _INTERVAL_OUTER_ORACLE,
        tags=("events", "join", "interval", "outer", "streaming-twin"),
    ),
    PendingQuery(
        "dedup_passage_removal",
        dedup_passage_removal_query,
        _PASSAGE_REMOVAL_ORACLE,
        tags=("dedup", "text", "passage", "removal", "charlevel"),
    ),
)

# Activation (round 5): register every staged query in PENDING order.
# declare() records a monotonic sequence per name, and registry order is
# pinned to _QUERY_MODULES order (registry._module_rank), so these nine
# occupy positions 0-8 of the driver's evidence window.
for _pq in PENDING:
    declare(_pq.name, oracle=_pq.oracle, headline=_pq.headline, tags=_pq.tags)(_pq.fn)


# --- Declared after the PENDING activation loop (window position 11):
# the MG->CMS sketch composition (VERDICT r04 item 7). Rows-only by the
# same structural reason as the HLL estimate and the LSH banding:
# cms_estimate's probe buckets are xxhash64, which DuckDB cannot
# replicate, so the (lower bound <= true <= estimate) bracket is pinned
# by tests/test_countmin.py::test_mg_cms_composition_bracket on a
# skewed fixture instead of a SQL oracle. The driver records rows>0.
def text_heavy_hitters_cms_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source trending tokens with BOTH frequency bounds: the
    Misra-Gries summary proposes the candidate heavy hitters (cnt_lb =
    guaranteed lower bound, exact when never truncated), then the
    Count-Min sketch tightens each candidate from above (est >= true
    count) — the textbook two-sketch composition from
    ``operators/countmin.py``: MG finds the candidates, CMS answers
    point queries, and together they bracket the true count without
    either sketch ever holding more than bounded per-group state.

    Scale shape: ONE token scan feeds both builds (each a map-side-
    combinable hash agg); the CMS state is depth*width longs per source
    (80 KB at 5x2048) and is BROADCAST into the candidate probe join —
    at 100 TB the candidate side is |sources| * k rows and the state
    side |sources| rows, so nothing corpus-sized ever shuffles twice.
    """
    from spotify_data_pipeline_spark.functions.text import tokens
    from spotify_data_pipeline_spark.operators.countmin import cms_build, cms_estimate
    from spotify_data_pipeline_spark.operators.heavyhitters import mg_build, mg_topk

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("source", F.explode(tokens(F.col("text"))).alias("tok"))
    candidates = mg_topk(mg_build(toks, ["source"], "tok", capacity=24), ["source"], 10)
    cms_state = cms_build(toks, ["source"], "tok", depth=5, width=2048)
    bracketed = cms_estimate(
        F.broadcast(cms_state), candidates, ["source"], "v", depth=5, width=2048
    )
    return bracketed.select("source", "v", "cnt_lb", "est", "rank").orderBy(
        "source", "rank"
    )


declare(
    "text_heavy_hitters_cms",
    oracle=None,  # xxhash64 probe buckets — see comment above
    tags=("text", "sketch", "heavyhitters", "countmin", "composition"),
)(text_heavy_hitters_cms_query)
