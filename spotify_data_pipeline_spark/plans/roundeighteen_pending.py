"""Round-18 declared-query staging area — the corpus-statistics wave
LLM data curation runs after dedup/quality screens: unigram-LM
cross-entropy (the perplexity proxy), Jensen-Shannon divergence
between source distributions (mixture drift), n-gram novelty scoring,
eval-set decontamination overlap, character-bigram entropy (gibberish
screen), and customer-LTV deciles (the revenue-concentration twin of
the Pareto row).

Per-wave staging module (nothing evidenced imports this file — the
one-module-per-wave rule from plans/active.py).

Cross-engine exactness rules carried from earlier waves: integer ppm
via DIV/`//`, cents, BIGINT casts, deterministic tiebreaks. New device
here: **scaled-integer log terms** — every ln() result is rounded to
an integer micro-nat (floor(x*1e6 + 0.5)) PER TERM before any
summation, so float-summation order can never differ across engines
(the integer-cents discipline applied to information measures; the
per-term double itself is identical on both engines: same BIGINT/
BIGINT double division, same libm-quality ln, same floor — the
TF-IDF rnd(...,4) precedent, green since round 1, at e6 instead of
e4)."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.functions.text import (
    is_nonblank,
    shingles,
    tokens,
)
from spotify_data_pipeline_spark.io import load_table
from spotify_data_pipeline_spark.operators.parallelism import ensure_min_parallelism
from spotify_data_pipeline_spark.plans.parity import rnd_cents, rnd_cents_sql


@dataclass(frozen=True)
class PendingQuery:
    name: str
    fn: object
    oracle: str | None
    headline: bool = False
    tags: tuple[str, ...] = ()


_TOKENS_SQL = "string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')"


def llm_unigram_xent_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source cross-entropy of documents against the CORPUS unigram
    LM — the cheapest perplexity proxy a curation pipeline has (docs
    whose token distribution is far from the corpus LM are boilerplate,
    tables, or another language). Per-token log-probabilities are
    integer micro-nats (see module docstring), so the per-doc sum and
    the per-source average are exact integers on both engines:
    xent_e6(doc) = (-Σ_occurrences lp_e6(term)) DIV n_tokens.

    Scale shape: token explode → term-keyed LM agg (map-side
    combinable) → term-keyed equi-join back (AQE skew handles
    stopwords) → doc agg → source agg. The 1-row corpus-total is the
    whitelisted broadcast; the LM table shuffles on term, never
    broadcast (vocabulary grows with the corpus).
    """
    docs = load_table(spark, sf_dir, "documents").where(is_nonblank(F.col("text")))
    tok = docs.select(
        "doc_id", "source", F.explode(tokens(F.col("text"))).alias("term")
    )
    lm = tok.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    total = tok.agg(F.count(F.lit(1)).cast("long").alias("tot"))
    lp = lm.crossJoin(F.broadcast(total)).select(
        "term",
        F.floor(F.log(F.col("tf") / F.col("tot")) * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("lp_e6"),
    )
    per_doc = (
        tok.join(lp, "term")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tok"),
            F.sum("lp_e6").cast("long").alias("sum_lp"),
        )
        .select(
            "source",
            F.expr("((-sum_lp)) DIV n_tok").cast("long").alias("xent_e6"),
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.expr("sum(xent_e6) DIV count(1)").cast("long").alias("avg_xent_e6"),
            F.min("xent_e6").cast("long").alias("min_xent_e6"),
            F.max("xent_e6").cast("long").alias("max_xent_e6"),
        )
        .orderBy("source")
    )


_XENT_ORACLE = f"""
  WITH tok AS (
    SELECT doc_id, source, unnest({_TOKENS_SQL}) AS term
    FROM documents WHERE length(trim(text)) > 0
  ), lm AS (
    SELECT term, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1
  ), total AS (
    SELECT CAST(count(*) AS BIGINT) AS tot FROM tok
  ), lp AS (
    SELECT term,
           CAST(floor(ln(tf / tot) * 1000000 + 0.5) AS BIGINT) AS lp_e6
    FROM lm CROSS JOIN total
  ), per_doc AS (
    SELECT t.source,
           CAST((-sum(lp_e6)) // count(*) AS BIGINT) AS xent_e6
    FROM tok t JOIN lp USING (term)
    GROUP BY t.doc_id, t.source
  )
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(xent_e6) // count(*) AS BIGINT) AS avg_xent_e6,
         CAST(min(xent_e6) AS BIGINT) AS min_xent_e6,
         CAST(max(xent_e6) AS BIGINT) AS max_xent_e6
  FROM per_doc GROUP BY 1 ORDER BY 1
"""


def text_js_divergence_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between every source pair's unigram
    distribution — the mixture-drift matrix a pretraining-mix owner
    watches (JSD is symmetric and bounded by ln 2, unlike KL). Dense
    grid device: sources × vocab with p = tf/tot (0 where absent) so
    disjoint-support terms contribute their exact p·ln2 share; per-term
    contributions are micro-nat integers, summed as integers.

    Scale shape: the grid is |sources| × |vocab| (the llm_ks_drift
    bounded-grid precedent — sources is a domain constant, the pair
    join is term-keyed equi); the corpus is scanned once for tf. The
    metric is DEFINED as the sum of per-term micro-nat roundings, so
    both engines compute it bit-equal by construction.
    """
    docs = load_table(spark, sf_dir, "documents").where(is_nonblank(F.col("text")))
    tok = docs.select("source", F.explode(tokens(F.col("text"))).alias("term"))
    st = tok.groupBy("source", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    stot = tok.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("tot"))
    vocab = tok.select("term").distinct()
    sources = tok.select("source").distinct()
    grid = (
        sources.crossJoin(vocab)
        .join(stot, "source")
        .join(st, ["source", "term"], "left")
        .select(
            "source",
            "term",
            (F.coalesce(F.col("tf"), F.lit(0)) / F.col("tot")).alias("p"),
        )
    )
    ga = grid.select(
        F.col("source").alias("src_a"), "term", F.col("p").alias("pa")
    )
    gb = grid.select(
        F.col("source").alias("src_b"), "term", F.col("p").alias("pb")
    )
    pa, pb = F.col("pa"), F.col("pb")
    contrib = F.lit(0.5) * (
        F.when(pa > 0, pa * F.log((F.lit(2) * pa) / (pa + pb))).otherwise(F.lit(0.0))
        + F.when(pb > 0, pb * F.log((F.lit(2) * pb) / (pa + pb))).otherwise(
            F.lit(0.0)
        )
    )
    pairs = ga.join(gb, "term").where(F.col("src_a") < F.col("src_b"))
    return (
        pairs.select(
            "src_a",
            "src_b",
            ((pa > 0) & (pb > 0)).cast("long").alias("_both"),
            F.floor(contrib * 1000000 + F.lit(0.5)).cast("long").alias("_c_e6"),
        )
        .groupBy("src_a", "src_b")
        .agg(
            F.sum("_both").cast("long").alias("n_common_terms"),
            F.sum("_c_e6").cast("long").alias("jsd_e6"),
        )
        .orderBy("src_a", "src_b")
    )


_JSD_ORACLE = f"""
  WITH tok AS (
    SELECT source, unnest({_TOKENS_SQL}) AS term
    FROM documents WHERE length(trim(text)) > 0
  ), st AS (
    SELECT source, term, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2
  ), stot AS (
    SELECT source, CAST(count(*) AS BIGINT) AS tot FROM tok GROUP BY 1
  ), vocab AS (SELECT DISTINCT term FROM tok),
  sources AS (SELECT DISTINCT source FROM tok),
  grid AS (
    SELECT s.source, v.term, coalesce(st.tf, 0) / stot.tot AS p
    FROM sources s
    CROSS JOIN vocab v
    JOIN stot ON stot.source = s.source
    LEFT JOIN st ON st.source = s.source AND st.term = v.term
  ), pairs AS (
    SELECT a.source AS src_a, b.source AS src_b, a.p AS pa, b.p AS pb
    FROM grid a JOIN grid b ON a.term = b.term AND a.source < b.source
  )
  SELECT src_a, src_b,
         CAST(sum(CAST(pa > 0 AND pb > 0 AS BIGINT)) AS BIGINT) AS n_common_terms,
         CAST(sum(CAST(floor((0.5 * (
             CASE WHEN pa > 0 THEN pa * ln((2 * pa) / (pa + pb)) ELSE 0.0 END
           + CASE WHEN pb > 0 THEN pb * ln((2 * pb) / (pa + pb)) ELSE 0.0 END
         )) * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS jsd_e6
  FROM pairs GROUP BY 1, 2 ORDER BY 1, 2
"""


_NOVELTY_K = 5


def dedup_ngram_novelty_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source n-gram novelty profile — the inverse of the
    boilerplate screens: what fraction of each document's distinct
    5-token shingles appear in NO other document (df = 1)? High
    novelty = original content worth keeping; near-zero = templated.
    Per-doc novelty is exact integer ppm; the report aggregates
    per source (min / integer-mean / max).

    Scale shape: distinct (doc, shingle) explode → shingle-keyed df
    agg (map-side combinable, a hot template shingle is ONE grouped
    row) → shingle-keyed equi-join back → doc agg → source agg. Never
    any doc-pair join — novelty needs only df, not pair identity.
    """
    docs = load_table(spark, sf_dir, "documents").where(is_nonblank(F.col("text")))
    sh = docs.select(
        "doc_id",
        "source",
        F.explode(shingles(tokens(F.col("text")), _NOVELTY_K)).alias("sh"),
    ).distinct()
    df_tab = sh.groupBy("sh").agg(F.count(F.lit(1)).cast("long").alias("df"))
    per_doc = (
        sh.join(df_tab, "sh")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sh"),
            F.sum((F.col("df") == 1).cast("long")).cast("long").alias("n_unique"),
        )
        .select(
            "source",
            F.expr("(n_unique * 1000000) DIV n_sh").cast("long").alias("nov_ppm"),
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.expr("sum(nov_ppm) DIV count(1)").cast("long").alias("avg_novelty_ppm"),
            F.min("nov_ppm").cast("long").alias("min_novelty_ppm"),
            F.max("nov_ppm").cast("long").alias("max_novelty_ppm"),
        )
        .orderBy("source")
    )


_NOVELTY_ORACLE = f"""
  WITH t AS (
    SELECT doc_id, source, {_TOKENS_SQL} AS toks
    FROM documents WHERE length(trim(text)) > 0
  ), s AS (
    SELECT DISTINCT doc_id, source, unnest(
      CASE WHEN len(toks) >= {_NOVELTY_K}
           THEN list_transform(range(1, len(toks) - {_NOVELTY_K - 2}),
                               i -> array_to_string(toks[i:i+{_NOVELTY_K - 1}], ' '))
           ELSE [array_to_string(toks, ' ')] END) AS sh
    FROM t
  ), df_tab AS (
    SELECT sh, CAST(count(*) AS BIGINT) AS df FROM s GROUP BY 1
  ), per_doc AS (
    SELECT s.source,
           CAST((sum(CAST(df = 1 AS BIGINT)) * 1000000) // count(*) AS BIGINT)
             AS nov_ppm
    FROM s JOIN df_tab USING (sh)
    GROUP BY s.doc_id, s.source
  )
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(nov_ppm) // count(*) AS BIGINT) AS avg_novelty_ppm,
         CAST(min(nov_ppm) AS BIGINT) AS min_novelty_ppm,
         CAST(max(nov_ppm) AS BIGINT) AS max_novelty_ppm
  FROM per_doc GROUP BY 1 ORDER BY 1
"""


_DECONTAM_K = 8
_EVAL_N = 20


def llm_decontam_overlap_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination screen (GPT-3 §5 / PaLM-style 8-gram
    overlap): treat the corpus's 20 longest documents (n_chars DESC,
    doc_id ASC — deterministic) as the held-out eval set and report,
    per eval doc, how many OTHER documents share at least one 8-token
    shingle with it and how many distinct shingles leak. Eval docs
    with zero overlap still report (0, 0) rows — a silent drop would
    hide the clean case.

    Scale shape: the eval side is a bounded top-k (TakeOrderedAndProject
    → ≤ 20 docs), its shingle set broadcast-hash-joins against the
    corpus shingle explode on the shingle key — the corpus is scanned
    once and never self-joined.
    """
    docs = load_table(spark, sf_dir, "documents").where(is_nonblank(F.col("text")))
    ev = docs.orderBy(F.col("n_chars").desc(), F.col("doc_id").asc()).limit(_EVAL_N)
    ev_sh = ev.select(
        F.col("doc_id").alias("eval_doc_id"),
        F.explode(shingles(tokens(F.col("text")), _DECONTAM_K)).alias("sh"),
    ).distinct()
    corpus_sh = docs.select(
        "doc_id", F.explode(shingles(tokens(F.col("text")), _DECONTAM_K)).alias("sh")
    ).distinct()
    hits = (
        corpus_sh.join(ev_sh, "sh")
        .where(F.col("doc_id") != F.col("eval_doc_id"))
        .groupBy("eval_doc_id")
        .agg(
            F.count_distinct("doc_id").cast("long").alias("n_contaminated_docs"),
            F.count_distinct("sh").cast("long").alias("n_shared_shingles"),
        )
    )
    return (
        ev.select(F.col("doc_id").alias("eval_doc_id"), "n_chars")
        .join(hits, "eval_doc_id", "left")
        .select(
            "eval_doc_id",
            F.col("n_chars").cast("long").alias("n_chars"),
            F.coalesce(F.col("n_contaminated_docs"), F.lit(0))
            .cast("long")
            .alias("n_contaminated_docs"),
            F.coalesce(F.col("n_shared_shingles"), F.lit(0))
            .cast("long")
            .alias("n_shared_shingles"),
        )
        .orderBy("eval_doc_id")
    )


_DECONTAM_ORACLE = f"""
  WITH nb AS (
    SELECT * FROM documents WHERE length(trim(text)) > 0
  ), ev AS (
    SELECT doc_id, n_chars, text FROM nb
    ORDER BY n_chars DESC, doc_id ASC LIMIT {_EVAL_N}
  ), tok_ev AS (
    SELECT doc_id AS eval_doc_id, {_TOKENS_SQL} AS toks FROM ev
  ), ev_sh AS (
    SELECT DISTINCT eval_doc_id, unnest(
      CASE WHEN len(toks) >= {_DECONTAM_K}
           THEN list_transform(range(1, len(toks) - {_DECONTAM_K - 2}),
                               i -> array_to_string(toks[i:i+{_DECONTAM_K - 1}], ' '))
           ELSE [array_to_string(toks, ' ')] END) AS sh
    FROM tok_ev
  ), tok_all AS (
    SELECT doc_id, {_TOKENS_SQL} AS toks FROM nb
  ), corpus_sh AS (
    SELECT DISTINCT doc_id, unnest(
      CASE WHEN len(toks) >= {_DECONTAM_K}
           THEN list_transform(range(1, len(toks) - {_DECONTAM_K - 2}),
                               i -> array_to_string(toks[i:i+{_DECONTAM_K - 1}], ' '))
           ELSE [array_to_string(toks, ' ')] END) AS sh
    FROM tok_all
  ), hits AS (
    SELECT e.eval_doc_id,
           CAST(count(DISTINCT c.doc_id) AS BIGINT) AS n_contaminated_docs,
           CAST(count(DISTINCT c.sh) AS BIGINT) AS n_shared_shingles
    FROM corpus_sh c JOIN ev_sh e USING (sh)
    WHERE c.doc_id <> e.eval_doc_id
    GROUP BY 1
  )
  SELECT ev.doc_id AS eval_doc_id,
         CAST(ev.n_chars AS BIGINT) AS n_chars,
         CAST(coalesce(h.n_contaminated_docs, 0) AS BIGINT) AS n_contaminated_docs,
         CAST(coalesce(h.n_shared_shingles, 0) AS BIGINT) AS n_shared_shingles
  FROM ev LEFT JOIN hits h ON h.eval_doc_id = ev.doc_id
  ORDER BY eval_doc_id
"""


def text_char_bigram_entropy_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source character-bigram entropy — the gibberish/encoding
    screen (natural text sits in a narrow entropy band; base64 blobs
    and mojibake fall far outside it). Distribution over bigrams of
    the whitespace-normalized lowercase text; per-bigram -p·ln p terms
    are micro-nat integers summed as integers.

    Scale shape: map-only bigram explode → (source, bigram) agg
    (map-side combinable, alphabet-bounded) → source-keyed totals
    equi-join → source agg. |bigrams| ≤ alphabet² per source.
    """
    docs = ensure_min_parallelism(
        load_table(spark, sf_dir, "documents").where(is_nonblank(F.col("text")))
    )
    # substring with a per-element start position needs the SQL-level
    # transform lambda (F.substring takes literal ints only).
    # r12 optimization (guide §1.2 per-task work; the shingles binding
    # lesson): the normalized string used to be re-spelled INSIDE the
    # per-position lambda, so the regex normalization re-ran once per
    # character position — O(len²) regex work per document (measured
    # 20 s at sf0.1). Materialized once as a column, the lambda only
    # slices it; plus the input-parallelism guard (the explode ran in
    # the single scan task). Result unchanged.
    norm = docs.select(
        "source",
        F.expr("lower(trim(regexp_replace(text, '\\\\s+', ' ')))").alias("_s"),
    )
    bg = norm.select(
        "source",
        F.explode(
            F.expr(
                "CASE WHEN length(_s) >= 2 "
                "THEN transform(sequence(1, length(_s) - 1), "
                "i -> substring(_s, i, 2)) "
                "ELSE array() END"
            )
        ).alias("bg"),
    )
    tf = bg.groupBy("source", "bg").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    tot = bg.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("tot"))
    p = F.col("tf") / F.col("tot")
    return (
        tf.join(tot, "source")
        .select(
            "source",
            F.floor((-p * F.log(p)) * 1000000 + F.lit(0.5)).cast("long").alias("_h_e6"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_distinct_bigrams"),
            F.sum("_h_e6").cast("long").alias("entropy_e6"),
        )
        .orderBy("source")
    )


_CHAR_ENTROPY_ORACLE = r"""
  WITH norm AS (
    SELECT source, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS s
    FROM documents WHERE length(trim(text)) > 0
  ), bg AS (
    SELECT source, unnest(
      CASE WHEN length(s) >= 2
           THEN list_transform(range(1, length(s)), i -> substr(s, CAST(i AS INT), 2))
           ELSE []::VARCHAR[] END) AS bg
    FROM norm
  ), tf AS (
    SELECT source, bg, CAST(count(*) AS BIGINT) AS tf FROM bg GROUP BY 1, 2
  ), tot AS (
    SELECT source, CAST(count(*) AS BIGINT) AS tot FROM bg GROUP BY 1
  )
  SELECT tf.source,
         CAST(count(*) AS BIGINT) AS n_distinct_bigrams,
         CAST(sum(CAST(floor((-(tf / tot) * ln(tf / tot)) * 1000000 + 0.5)
                       AS BIGINT)) AS BIGINT) AS entropy_e6
  FROM tf JOIN tot USING (source)
  GROUP BY 1 ORDER BY 1
"""


def orders_ltv_deciles_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer lifetime-value deciles — the revenue-concentration
    table (the per-customer twin of the Pareto 80/20 row): rank every
    ordering customer by exact lifetime cents, cut into 10 ntile
    bands (ties broken by custkey — deterministic on both engines),
    and report each band's size, revenue, bounds, and exact revenue
    share ppm.

    Scale shape: order-keyed agg → customer frame → single ntile
    window (one sort exchange) → 10-row report; the share window runs
    on the 10-row frame.
    """
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(rnd_cents(F.col("o_totalprice"))).cast("long").alias("cents"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
    )
    w = Window.orderBy(F.col("cents").desc(), F.col("o_custkey").asc())
    deciled = per_cust.withColumn("decile", F.ntile(10).over(w).cast("long"))
    hist = deciled.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("cents").cast("long").alias("revenue_cents"),
        F.min("cents").cast("long").alias("min_cents"),
        F.max("cents").cast("long").alias("max_cents"),
        F.sum("n_orders").cast("long").alias("n_orders"),
    )
    one = Window.partitionBy(F.lit(1))
    return (
        hist.withColumn("_t", F.sum("revenue_cents").over(one))
        .select(
            "decile",
            "n_customers",
            "n_orders",
            "revenue_cents",
            "min_cents",
            "max_cents",
            F.expr("(revenue_cents * 1000000) DIV _t").cast("long").alias("revenue_share_ppm"),
        )
        .orderBy("decile")
    )


_LTV_ORACLE = f"""
  WITH per_cust AS (
    SELECT o_custkey,
           CAST(sum({rnd_cents_sql('o_totalprice')}) AS BIGINT) AS cents,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY 1
  ), deciled AS (
    SELECT *, CAST(ntile(10) OVER (ORDER BY cents DESC, o_custkey ASC) AS BIGINT)
              AS decile
    FROM per_cust
  ), hist AS (
    SELECT decile,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(n_orders) AS BIGINT) AS n_orders,
           CAST(sum(cents) AS BIGINT) AS revenue_cents,
           CAST(min(cents) AS BIGINT) AS min_cents,
           CAST(max(cents) AS BIGINT) AS max_cents
    FROM deciled GROUP BY 1
  )
  SELECT decile, n_customers, n_orders, revenue_cents, min_cents, max_cents,
         CAST((revenue_cents * 1000000) // sum(revenue_cents) OVER () AS BIGINT)
           AS revenue_share_ppm
  FROM hist ORDER BY decile
"""


def ops_similarity_path_advice_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The similarity-join path advisor (operators/advisor.py, VERDICT
    r07 item 6) as a driver-checkable query: the corpus's posting rows
    (Σ df over distinct 3-token shingles), the naive self-join's exact
    candidate-pair count (Σ C(df,2) — both integers), the density
    ratio in ppm, and the recommended candidate path on a single node
    vs a network-bound cluster at the BENCH_r07-calibrated crossovers
    (ratio ≥ 30 local, ≥ 2 network — operators/advisor.py constants).

    This query's stats run over raw STRING shingles so DuckDB computes
    them identically; the operator's production path hashes shingles
    (xxhash64) first — df counts are equal up to 32-bit collisions,
    which is the usual md5/xxhash64 twin split (SURVEY §2.12).

    Scale shape: distinct (doc, shingle) explode → shingle-keyed df agg
    (map-side combinable) → one 1-row total — the same single pass the
    prefix path's own df aggregate costs.
    """
    from spotify_data_pipeline_spark.operators.advisor import (
        LOCAL_CROSSOVER_RATIO,
        NETWORK_CROSSOVER_RATIO,
    )

    local_x, net_x = int(LOCAL_CROSSOVER_RATIO), int(NETWORK_CROSSOVER_RATIO)
    docs = load_table(spark, sf_dir, "documents").where(is_nonblank(F.col("text")))
    sh = docs.select(
        "doc_id", F.explode(shingles(tokens(F.col("text")), 3)).alias("sh")
    ).distinct()
    df_tab = sh.groupBy("sh").agg(F.count(F.lit(1)).cast("long").alias("df"))
    totals = df_tab.agg(
        F.sum("df").cast("long").alias("posting_rows"),
        F.sum(F.expr("(df * (df - 1)) DIV 2")).cast("long").alias("naive_candidate_pairs"),
    )
    return totals.select(
        "posting_rows",
        "naive_candidate_pairs",
        F.expr("(naive_candidate_pairs * 1000000) DIV posting_rows")
        .cast("long")
        .alias("density_ppm"),
        F.when(
            F.col("naive_candidate_pairs") >= F.lit(local_x) * F.col("posting_rows"),
            F.lit("prefix"),
        )
        .otherwise(F.lit("naive"))
        .alias("local_path"),
        F.when(
            F.col("naive_candidate_pairs") >= F.lit(net_x) * F.col("posting_rows"),
            F.lit("prefix"),
        )
        .otherwise(F.lit("naive"))
        .alias("network_path"),
    )


_PATH_ADVICE_ORACLE = f"""
  WITH t AS (
    SELECT doc_id, {_TOKENS_SQL} AS toks
    FROM documents WHERE length(trim(text)) > 0
  ), s AS (
    SELECT DISTINCT doc_id, unnest(
      CASE WHEN len(toks) >= 3
           THEN list_transform(range(1, len(toks) - 1),
                               i -> array_to_string(toks[i:i+2], ' '))
           ELSE [array_to_string(toks, ' ')] END) AS sh
    FROM t
  ), df_tab AS (
    SELECT sh, CAST(count(*) AS BIGINT) AS df FROM s GROUP BY 1
  ), totals AS (
    SELECT CAST(sum(df) AS BIGINT) AS posting_rows,
           CAST(sum((df * (df - 1)) // 2) AS BIGINT) AS naive_candidate_pairs
    FROM df_tab
  )
  SELECT posting_rows, naive_candidate_pairs,
         CAST((naive_candidate_pairs * 1000000) // posting_rows AS BIGINT)
           AS density_ppm,
         CASE WHEN naive_candidate_pairs >= 30 * posting_rows
              THEN 'prefix' ELSE 'naive' END AS local_path,
         CASE WHEN naive_candidate_pairs >= 2 * posting_rows
              THEN 'prefix' ELSE 'naive' END AS network_path
  FROM totals
"""


PENDING: tuple[PendingQuery, ...] = (
    PendingQuery(
        "llm_unigram_xent",
        llm_unigram_xent_query,
        _XENT_ORACLE,
        tags=("llmops", "language-model", "cross-entropy", "micro-nats",
              "integer-exact"),
    ),
    PendingQuery(
        "text_js_divergence",
        text_js_divergence_query,
        _JSD_ORACLE,
        tags=("text", "jsd", "mixture-drift", "micro-nats", "integer-exact"),
    ),
    PendingQuery(
        "dedup_ngram_novelty",
        dedup_ngram_novelty_query,
        _NOVELTY_ORACLE,
        tags=("dedup", "novelty", "shingles", "integer-exact"),
    ),
    PendingQuery(
        "llm_decontam_overlap",
        llm_decontam_overlap_query,
        _DECONTAM_ORACLE,
        tags=("llmops", "decontamination", "8-gram", "integer-exact"),
    ),
    PendingQuery(
        "text_char_bigram_entropy",
        text_char_bigram_entropy_query,
        _CHAR_ENTROPY_ORACLE,
        tags=("text", "entropy", "quality-screen", "micro-nats",
              "integer-exact"),
    ),
    PendingQuery(
        "orders_ltv_deciles",
        orders_ltv_deciles_query,
        _LTV_ORACLE,
        tags=("orders", "ltv", "deciles", "concentration", "integer-exact"),
    ),
    PendingQuery(
        "ops_similarity_path_advice",
        ops_similarity_path_advice_query,
        _PATH_ADVICE_ORACLE,
        tags=("ops", "advisor", "similarity-join", "crossover",
              "integer-exact"),
    ),
)
