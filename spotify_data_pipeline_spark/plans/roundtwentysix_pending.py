"""Round-26 declared-query staging area — the TUNING-CURVE wave:
parameter sweeps and quality measurements that tell an operator WHICH
setting to ship, plus the TextRank keyword extractor.

- **TextRank keywords** (Mihalcea & Tarau '04): PageRank over the
  token co-occurrence graph, 3 unrolled integer iterations — the
  graph-based keyword extractor next to the frequency-based RAKE row.
  All rank state is integer micro-units: r' = 150000 + (85 * sum of
  (r_u DIV deg_u)) DIV 100, identical truncating arithmetic on both
  engines.
- **ER blocking quality** (Christen '12 ch. 4): reduction ratio vs
  pair completeness for two blocking strategies over a corpus with
  SYNTHESIZED dirty duplicates (deterministic one-character name
  mutation) — the measurement that picks a blocking key before an
  entity-resolution run.
- **OOV rate** (tokenizer coverage): per-source out-of-vocabulary
  token share against the frozen top-K corpus vocabulary — the
  readout that decides whether a tokenizer/vocab ships.
- **Session gap sweep**: session counts and mean lengths at gap
  thresholds {5, 15, 30, 60} minutes — the sessionization-parameter
  tuning curve (the nprobe-sweep pattern applied to the streaming
  axis' batch twin).

Per-wave staging module (nothing evidenced imports this file).
Exactness rules as earlier waves: integer ppm via DIV/`//`, BIGINT
casts, deterministic tiebreaks, truncating integer division for all
signed state.
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


# ---------------------------------------------------------------------------
# 1. TextRank keywords — 3 unrolled integer PageRank steps
# ---------------------------------------------------------------------------

_TR_STEPS = 3
_TR_TOP = 20


def graph_textrank_keywords_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank: PageRank over the undirected token co-occurrence
    graph (adjacent-token pairs, deduplicated corpus-wide), 3 unrolled
    iterations with damping 0.85 in pure integer arithmetic:
    r0 = 1e6; r' = 150000 + (85 * sum over neighbors of
    (r_u DIV deg_u)) DIV 100. Emits the top-20 tokens by final rank
    (token tiebreak) with their degree — the graph-centrality
    keywords the frequency-based RAKE row cannot see.

    Scale shape: one bigram explode + distinct builds the edge list
    (vocabulary-bounded, not corpus-bounded); each iteration is one
    edge equi-join + node agg — the PageRank dataflow with integer
    state, no float ranks crossing steps.
    """
    docs = load_table(spark, sf_dir, "documents").where(
        is_nonblank(F.col("text"))
    )
    t = tokens(F.col("text"))
    n = F.size(t)
    bigr = docs.select(
        F.explode(
            F.when(
                n >= 2,
                F.zip_with(
                    F.slice(t, 1, n - 1),
                    F.slice(t, 2, n - 1),
                    lambda x, y: F.struct(
                        F.least(x, y).alias("a"), F.greatest(x, y).alias("b")
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        ).alias("e")
    ).select(F.col("e.a").alias("a"), F.col("e.b").alias("b"))
    edges_ud = bigr.where(F.col("a") != F.col("b")).distinct()
    edges = edges_ud.select(
        F.col("a").alias("u"), F.col("b").alias("v")
    ).unionAll(edges_ud.select(F.col("b").alias("u"), F.col("a").alias("v")))
    # lineage cut: the vocabulary-bounded edge list feeds every
    # unrolled iteration — materialize once (the PageRank device)
    edges = edges.localCheckpoint(eager=True)
    deg = edges.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    deg = deg.localCheckpoint(eager=True)
    ranks = deg.select(
        F.col("u").alias("node"), F.lit(1000000).cast("long").alias("r")
    )
    for _ in range(_TR_STEPS):
        contrib = (
            edges.join(
                deg.withColumnRenamed("u", "cu"), F.col("u") == F.col("cu")
            )
            .join(
                ranks.withColumnRenamed("node", "rn_node"),
                F.col("u") == F.col("rn_node"),
            )
            .select(
                F.col("v").alias("node"),
                F.expr("r DIV deg").cast("long").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").cast("long").alias("s"))
        )
        ranks = contrib.select(
            "node",
            (F.lit(150000) + F.expr("(85 * s) DIV 100"))
            .cast("long")
            .alias("r"),
        )
    return (
        ranks.join(deg.withColumnRenamed("u", "node"), "node")
        .orderBy(F.col("r").desc(), F.col("node").asc())
        .limit(_TR_TOP)
        .select(
            F.col("node").alias("token"),
            F.col("r").alias("rank_e6"),
            F.col("deg").alias("degree"),
        )
    )


def _tr_oracle() -> str:
    steps = []
    prev = "r0"
    for k in range(1, _TR_STEPS + 1):
        steps.append(
            f"""r{k} AS (
    SELECT e.v AS node,
           CAST(150000 + (85 * sum(r // deg)) // 100 AS BIGINT) AS r
    FROM edges e
    JOIN deg ON deg.u = e.u
    JOIN {prev} ON {prev}.node = e.u
    GROUP BY 1
  )"""
        )
        prev = f"r{k}"
    chain = ", ".join(steps)
    return f"""
  WITH base AS (
    SELECT {_TOKENS_SQL} AS toks
    FROM documents WHERE length(trim(text)) > 0
  ), bigr AS (
    SELECT DISTINCT least(p.a, p.b) AS a, greatest(p.a, p.b) AS b
    FROM (
      SELECT unnest(CASE WHEN len(toks) >= 2
        THEN list_transform(range(1, len(toks)),
                            i -> {{'a': toks[i], 'b': toks[i + 1]}})
        ELSE [] END) AS p
      FROM base
    ) WHERE p.a != p.b
  ), edges AS (
    SELECT a AS u, b AS v FROM bigr
    UNION ALL
    SELECT b AS u, a AS v FROM bigr
  ), deg AS (
    SELECT u, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY 1
  ), r0 AS (
    SELECT u AS node, CAST(1000000 AS BIGINT) AS r FROM deg
  ), {chain}
  SELECT node AS token, r AS rank_e6, deg AS degree
  FROM {prev} JOIN deg ON deg.u = {prev}.node
  ORDER BY r DESC, node ASC LIMIT {_TR_TOP}
"""


# ---------------------------------------------------------------------------
# 2. ER blocking quality — reduction ratio vs pair completeness
# ---------------------------------------------------------------------------

_ER_DUP_MOD = 5  # every 5th customer gets a dirty duplicate


def er_blocking_quality_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-strategy scorecard (Christen '12): synthesize a dirty
    duplicate for every 5th customer (ONE name character mutated to
    'X' at position 10 + custkey % 9 — deterministic, stated
    identically in the oracle), then measure two blocking strategies:
    (a) name-digit block substr(name, 14, 4) (the discriminating middle
    digits — the leading digits are all zeros at these SFs) — small
    blocks, but a mutation inside the window breaks the block; (b) (nationkey,
    mktsegment) — never misses a duplicate (the mutation never touches
    those fields); whether it floods candidates depends on the key
    cardinality vs corpus size, WHICH IS THE POINT of running the
    scorecard (at these SFs it happens to reduce more than the digit
    window — the measurement, not a textbook assumption, decides).
    Per strategy: candidate pairs (sum of C(block,2)), true duplicate
    pairs found, pair completeness ppm, reduction ratio ppm vs the
    all-pairs baseline. The measurement that picks a blocking key
    BEFORE an entity-resolution run burns cluster time.

    Scale shape: map-only synthesis + two block-keyed count aggs
    (candidate arithmetic from block sizes — the itemsets-probe
    device, no pair materialization) + one truth equi-join per
    strategy + 1-row assembly.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment"
    )
    orig = cust.select(
        F.col("c_custkey").alias("ek"),
        F.lit(0).alias("copy"),
        F.col("c_name").alias("name"),
        "c_nationkey",
        "c_mktsegment",
    )
    dup_pos = (F.col("c_custkey") % 9 + 10).cast("int")
    dups = cust.where(F.col("c_custkey") % _ER_DUP_MOD == 0).select(
        F.col("c_custkey").alias("ek"),
        F.lit(1).alias("copy"),
        F.concat(
            F.expr("substr(c_name, 1, CAST(c_custkey % 9 + 10 AS INT) - 1)"),
            F.lit("X"),
            F.substring(F.col("c_name"), dup_pos + 1, 100),
        ).alias("name"),
        "c_nationkey",
        "c_mktsegment",
    )
    ents = orig.unionByName(dups)
    keyed = ents.select(
        "ek",
        "copy",
        F.substring(F.col("name"), 14, 4).alias("key_prefix"),
        F.concat_ws(
            "|", F.col("c_nationkey"), F.col("c_mktsegment")
        ).alias("key_dim"),
    )
    n1 = keyed.agg(F.count(F.lit(1)).cast("long").alias("n"))

    def strategy(label: str, key: str) -> DataFrame:
        blocks = keyed.groupBy(key).agg(
            F.count(F.lit(1)).cast("long").alias("cnt")
        )
        cand = blocks.agg(
            F.sum(F.expr("(cnt * (cnt - 1)) DIV 2")).cast("long").alias(
                "candidate_pairs"
            )
        )
        o = keyed.where(F.col("copy") == 0).select(
            "ek", F.col(key).alias("ka")
        )
        d = keyed.where(F.col("copy") == 1).select(
            "ek", F.col(key).alias("kb")
        )
        truth = o.join(d, "ek").agg(
            F.count(F.lit(1)).cast("long").alias("true_pairs"),
            F.sum((F.col("ka") == F.col("kb")).cast("long"))
            .cast("long")
            .alias("found_pairs"),
        )
        return (
            cand.crossJoin(F.broadcast(truth))
            .crossJoin(F.broadcast(n1))
            .select(
                F.lit(label).alias("strategy"),
                "candidate_pairs",
                "true_pairs",
                "found_pairs",
                F.expr("(found_pairs * 1000000) DIV true_pairs")
                .cast("long")
                .alias("completeness_ppm"),
                F.expr(
                    "1000000 - (candidate_pairs * 1000000)"
                    " DIV ((n * (n - 1)) DIV 2)"
                )
                .cast("long")
                .alias("reduction_ppm"),
            )
        )

    return (
        strategy("name_prefix", "key_prefix")
        .unionAll(strategy("nation_segment", "key_dim"))
        .orderBy("strategy")
    )


_ER_ORACLE = f"""
  WITH ents AS (
    SELECT c_custkey AS ek, 0 AS copy, c_name AS name,
           c_nationkey, c_mktsegment
    FROM customer
    UNION ALL
    SELECT c_custkey, 1,
           substr(c_name, 1, CAST(c_custkey % 9 + 10 AS INT) - 1)
             || 'X'
             || substr(c_name, CAST(c_custkey % 9 + 10 AS INT) + 1, 100),
           c_nationkey, c_mktsegment
    FROM customer WHERE c_custkey % {_ER_DUP_MOD} = 0
  ), keyed AS (
    SELECT ek, copy,
           substr(name, 14, 4) AS key_prefix,
           CAST(c_nationkey AS VARCHAR) || '|' || c_mktsegment AS key_dim
    FROM ents
  ), n1 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM keyed),
  strat AS (
    SELECT 'name_prefix' AS strategy, key_prefix AS k, ek, copy FROM keyed
    UNION ALL
    SELECT 'nation_segment', key_dim, ek, copy FROM keyed
  ), cand AS (
    SELECT strategy,
           CAST(sum((cnt * (cnt - 1)) // 2) AS BIGINT) AS candidate_pairs
    FROM (SELECT strategy, k, count(*) AS cnt FROM strat GROUP BY 1, 2)
    GROUP BY 1
  ), truth AS (
    SELECT o.strategy,
           CAST(count(*) AS BIGINT) AS true_pairs,
           CAST(sum(CASE WHEN o.k = d.k THEN 1 ELSE 0 END) AS BIGINT)
             AS found_pairs
    FROM strat o JOIN strat d
      ON o.strategy = d.strategy AND o.ek = d.ek
     AND o.copy = 0 AND d.copy = 1
    GROUP BY 1
  )
  SELECT c.strategy, c.candidate_pairs, t.true_pairs, t.found_pairs,
         CAST((t.found_pairs * 1000000) // t.true_pairs AS BIGINT)
           AS completeness_ppm,
         CAST(1000000 - (c.candidate_pairs * 1000000)
              // ((n * (n - 1)) // 2) AS BIGINT) AS reduction_ppm
  FROM cand c JOIN truth t USING (strategy) CROSS JOIN n1
  ORDER BY strategy
"""


# ---------------------------------------------------------------------------
# 3. OOV rate — tokenizer/vocab coverage per source
# ---------------------------------------------------------------------------

_OOV_VOCAB = 20


def llm_oov_rate_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per source against the frozen top-K
    corpus vocabulary (tf DESC, term ASC — deterministic cut): the
    coverage readout that decides whether a vocab ships. K = 20 here
    because the synthetic corpus holds only 31 distinct terms (the
    cut must exclude a real tail to measure anything); at production
    scale the same query runs with K = 50k+. Emits per
    source: token total, OOV occurrences, distinct OOV types, oov
    ppm.

    Scale shape: term-keyed tf agg -> bounded top-k vocabulary
    (TakeOrderedAndProject) -> broadcast anti-membership via left
    join on the term key -> source agg. The vocabulary is the
    bounded side by construction; the corpus never self-joins.
    """
    docs = load_table(spark, sf_dir, "documents").where(
        is_nonblank(F.col("text"))
    )
    tok = docs.select(
        "source", F.explode(tokens(F.col("text"))).alias("term")
    )
    vocab = (
        tok.groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .orderBy(F.col("tf").desc(), F.col("term").asc())
        .limit(_OOV_VOCAB)
        .select("term", F.lit(1).alias("_in_vocab"))
    )
    flagged = tok.join(F.broadcast(vocab), "term", "left").select(
        "source",
        "term",
        F.col("_in_vocab").isNull().alias("oov"),
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(F.col("oov").cast("long")).cast("long").alias("oov_tokens"),
            F.countDistinct(
                F.when(F.col("oov"), F.col("term"))
            )
            .cast("long")
            .alias("oov_types"),
            F.expr("(sum(CAST(oov AS LONG)) * 1000000) DIV count(1)")
            .cast("long")
            .alias("oov_ppm"),
        )
        .orderBy("source")
    )


_OOV_ORACLE = f"""
  WITH tok AS (
    SELECT source, unnest({_TOKENS_SQL}) AS term
    FROM documents WHERE length(trim(text)) > 0
  ), vocab AS (
    SELECT term FROM (
      SELECT term, count(*) AS tf FROM tok GROUP BY 1)
    ORDER BY tf DESC, term ASC LIMIT {_OOV_VOCAB}
  ), flagged AS (
    SELECT source, term, term NOT IN (SELECT term FROM vocab) AS oov
    FROM tok
  )
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(CASE WHEN oov THEN 1 ELSE 0 END) AS BIGINT) AS oov_tokens,
         CAST(count(DISTINCT CASE WHEN oov THEN term END) AS BIGINT)
           AS oov_types,
         CAST((sum(CASE WHEN oov THEN 1 ELSE 0 END) * 1000000)
              // count(*) AS BIGINT) AS oov_ppm
  FROM flagged GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# 4. Session gap sweep — the sessionization tuning curve
# ---------------------------------------------------------------------------

_GAP_MINUTES = (5, 15, 30, 60)


def events_session_gap_sweep_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization-parameter tuning curve: for gap thresholds
    {5, 15, 30, 60} minutes, the session count, mean session length
    (events DIV sessions) and mean session span seconds — the sweep
    an analytics owner runs before freezing the session definition.
    A session starts where the per-user inter-event gap exceeds the
    threshold; all thresholds share ONE lag pass (the gap is computed
    once, compared four times).

    Scale shape: one user-keyed window (the sessionization shuffle),
    a 4-element explode, one (threshold) agg; span seconds via
    min/max per session then a threshold agg.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros(F.col("ts")).alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gaps = ev.withColumn(
        "gap_us",
        (F.col("us") - F.lag("us").over(w)).cast("long"),
    )
    swept = gaps.select(
        "user_id",
        "event_id",
        "us",
        "gap_us",
        F.explode(
            F.array(*[F.lit(m).cast("long") for m in _GAP_MINUTES])
        ).alias("gap_min"),
    ).withColumn(
        "new_session",
        (
            F.col("gap_us").isNull()
            | (F.col("gap_us") > F.col("gap_min") * 60000000)
        ).cast("long"),
    )
    w2 = Window.partitionBy("gap_min", "user_id").orderBy("us", "event_id")
    sessions = swept.withColumn(
        "sid", F.sum("new_session").over(w2)
    )
    per_session = sessions.groupBy("gap_min", "user_id", "sid").agg(
        F.count(F.lit(1)).cast("long").alias("n_ev"),
        F.expr("(max(us) - min(us)) DIV 1000000").cast("long").alias(
            "span_s"
        ),
    )
    return (
        per_session.groupBy("gap_min")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum("n_ev").cast("long").alias("n_events"),
            F.expr("sum(n_ev) DIV count(1)").cast("long").alias(
                "mean_events_per_session"
            ),
            F.expr("sum(span_s) DIV count(1)").cast("long").alias(
                "mean_span_s"
            ),
        )
        .orderBy("gap_min")
    )


_GAP_LIST = ", ".join(f"({m})" for m in _GAP_MINUTES)

_GAP_ORACLE = f"""
  WITH gaps AS (
    SELECT user_id, event_id, epoch_us(ts) AS us,
           epoch_us(ts)
             - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                       ORDER BY epoch_us(ts), event_id)
             AS gap_us
    FROM events
  ), swept AS (
    SELECT g.user_id, g.event_id, g.us, CAST(m.gap_min AS BIGINT) AS gap_min,
           CASE WHEN g.gap_us IS NULL
                  OR g.gap_us > CAST(m.gap_min AS BIGINT) * 60000000
                THEN 1 ELSE 0 END AS new_session
    FROM gaps g, (VALUES {_GAP_LIST}) m(gap_min)
  ), sessions AS (
    SELECT gap_min, user_id, us,
           sum(new_session) OVER (PARTITION BY gap_min, user_id
                                  ORDER BY us, event_id) AS sid
    FROM swept
  ), per_session AS (
    SELECT gap_min, user_id, sid,
           CAST(count(*) AS BIGINT) AS n_ev,
           CAST((max(us) - min(us)) // 1000000 AS BIGINT) AS span_s
    FROM sessions GROUP BY 1, 2, 3
  )
  SELECT gap_min,
         CAST(count(*) AS BIGINT) AS n_sessions,
         CAST(sum(n_ev) AS BIGINT) AS n_events,
         CAST(sum(n_ev) // count(*) AS BIGINT) AS mean_events_per_session,
         CAST(sum(span_s) // count(*) AS BIGINT) AS mean_span_s
  FROM per_session GROUP BY 1 ORDER BY 1
"""


PENDING: tuple[PendingQuery, ...] = (
    PendingQuery(
        "graph_textrank_keywords",
        graph_textrank_keywords_query,
        _tr_oracle(),
        tags=("graph", "textrank", "keywords", "unrolled",
              "integer-exact"),
    ),
    PendingQuery(
        "er_blocking_quality",
        er_blocking_quality_query,
        _ER_ORACLE,
        tags=("er", "blocking", "reduction-ratio", "completeness",
              "integer-exact"),
    ),
    PendingQuery(
        "llm_oov_rate",
        llm_oov_rate_query,
        _OOV_ORACLE,
        tags=("llmops", "vocabulary", "coverage", "integer-exact"),
    ),
    PendingQuery(
        "events_session_gap_sweep",
        events_session_gap_sweep_query,
        _GAP_ORACLE,
        tags=("events", "sessionization", "tuning-curve",
              "integer-exact"),
    ),
)
