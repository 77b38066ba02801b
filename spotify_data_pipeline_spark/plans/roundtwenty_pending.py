"""Round-20 declared-query staging area — BPE merge training, the
LLM-native ITERATIVE algorithm (Sennrich et al. 2016 §3.2), driver-
hash-checkable end to end: 4 unrolled merge rounds over adjacent-token
pair frequencies (word-granularity symbols — phrase-vocabulary
induction, the word2vec-phrases shape of the same algorithm), plus the
per-round vocabulary compression curve.

Why it is exactly-checkable (the kmeans/pagerank unrolling precedent
applied to tokenizer training):
- pair selection is a deterministic argmax (count DESC, pair ASC);
- merge APPLICATION is plain substring ``replace`` — measured
  left-to-right non-overlapping in BOTH engines (``'a a a'`` with
  merge (a,a) → ``'aa a'``), which is precisely BPE's greedy pass;
- symbols are wrapped in STX/ETX markers (chr(2)/chr(3)) and merged
  with US (chr(31)), so the junction pattern ``ETX SP STX`` occurs
  exactly once per adjacent pair and never inside a symbol (token
  content is whitespace-split, so it contains no spaces; merges only
  ever insert US).

Scale shape per round: one pair explode → pair-keyed count (map-side
combinable) → global top-1 (TakeOrderedAndProject) → 1-row broadcast
into a map-only replace. State is the symbolized corpus itself — no
driver-side loops over data, only the fixed 4-round unrolling; a
production run would checkpoint the state between rounds instead of
recomputing lineage (documented; at 4 rounds the recompute is the
cheaper local plan).

Per-wave staging module (nothing evidenced imports this file).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.functions.text import is_nonblank, tokens
from spotify_data_pipeline_spark.io import load_table
from spotify_data_pipeline_spark.operators.parallelism import ensure_min_parallelism


@dataclass(frozen=True)
class PendingQuery:
    name: str
    fn: object
    oracle: str | None
    headline: bool = False
    tags: tuple[str, ...] = ()


_TOKENS_SQL = "string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')"
_ROUNDS = 4
_STX, _ETX, _US = "\x02", "\x03", "\x1f"


def _state0(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r12: parallelize the symbol-building map stage (single-task scan)
    docs = ensure_min_parallelism(
        load_table(spark, sf_dir, "documents").where(is_nonblank(F.col("text")))
    )
    sym = F.transform(
        tokens(F.col("text")), lambda t: F.concat(F.lit(_STX), t, F.lit(_ETX))
    )
    return docs.select("doc_id", F.array_join(sym, " ").alias("s"))


def _pair_counts(state: DataFrame) -> DataFrame:
    arr = F.split(F.col("s"), " ")
    # r12 optimization (binding lesson): the old expression re-split
    # the symbol string inside the per-position lambda — one split per
    # adjacent pair instead of one per row. Bound through a lambda
    # variable the split runs once; identical pairs.
    pairs = F.expr(
        "element_at(transform(array(split(s, ' ')), a ->"
        " transform(sequence(1, size(a) - 1),"
        " i -> concat(element_at(a, i), ' ', element_at(a, i + 1)))), 1)"
    )
    return (
        state.where(F.size(arr) >= 2)
        .select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).cast("long").alias("pair_count"))
    )


def _top1(state: DataFrame, rank: int) -> DataFrame:
    return (
        _pair_counts(state)
        .orderBy(F.col("pair_count").desc(), F.col("pair").asc())
        .limit(1)
        .select(
            F.lit(rank).cast("long").alias("merge_rank"), "pair", "pair_count"
        )
    )


def _apply(state: DataFrame, top: DataFrame) -> DataFrame:
    rep = F.replace(F.col("pair"), F.lit(_ETX + " " + _STX), F.lit(_US))
    # r12 optimization (guide §3.3 truncate iterative plans — the
    # ktruss/MMR lineage-cut device): each merge round references the
    # previous state TWICE (pair counting + rewrite), so without a cut
    # round r replays round r-1's plan 2x — 2^rounds state0 scans by
    # round 4 (measured 15-19 s per BPE query at sf0.1). One eager
    # materialization per round keeps it linear. Result unchanged.
    return (
        state.crossJoin(F.broadcast(top.select("pair")))
        .select("doc_id", F.replace(F.col("s"), F.col("pair"), rep).alias("s"))
        .localCheckpoint(eager=True)
    )


def _display(col: Column) -> Column:
    """Strip the STX/ETX markers and render prior-merge US joins as
    spaces for the report."""
    out = F.replace(col, F.lit(_STX), F.lit(""))
    out = F.replace(out, F.lit(_ETX), F.lit(""))
    return F.replace(out, F.lit(_US), F.lit(" "))


def llm_bpe_phrase_merges_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 4 learned merges, in order: rank, the two merged symbols
    (human-readable — markers stripped, earlier merges shown with
    spaces), and the pair's occurrence count at selection time."""
    state = _state0(spark, sf_dir)
    merges = None
    for r in range(1, _ROUNDS + 1):
        top = _top1(state, r)
        merges = top if merges is None else merges.unionByName(top)
        if r < _ROUNDS:
            state = _apply(state, top)
    halves = F.split(F.col("pair"), " ")
    return merges.select(
        "merge_rank",
        _display(halves.getItem(0)).alias("left_symbol"),
        _display(halves.getItem(1)).alias("right_symbol"),
        "pair_count",
    ).orderBy("merge_rank")


def llm_bpe_compression_curve_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The vocabulary-compression curve: after 0..4 merges, the corpus
    symbol total and distinct-symbol count — the number a tokenizer
    trainer watches to decide how many merges to buy."""
    state = _state0(spark, sf_dir)
    rows = None
    for r in range(0, _ROUNDS + 1):
        arr = F.split(F.col("s"), " ")
        stats = (
            state.where(F.col("s") != "")
            .select(F.explode(arr).alias("sym"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("total_symbols"),
                F.count_distinct("sym").cast("long").alias("distinct_symbols"),
            )
            .select(
                F.lit(r).cast("long").alias("n_merges"),
                "total_symbols",
                "distinct_symbols",
            )
        )
        rows = stats if rows is None else rows.unionByName(stats)
        if r < _ROUNDS:
            state = _apply(state, _top1(state, r + 1))
    return rows.orderBy("n_merges")


def _oracle_rounds() -> str:
    """The unrolled CTE chain shared by both oracles: s0..s4 states,
    m1..m4 merges."""
    parts = [
        f"""
  t AS (
    SELECT doc_id, {_TOKENS_SQL} AS toks
    FROM documents WHERE length(trim(text)) > 0
  ), s0 AS (
    SELECT doc_id,
           array_to_string(list_transform(toks, x -> chr(2) || x || chr(3)), ' ') AS s
    FROM t
  )"""
    ]
    for r in range(1, _ROUNDS + 1):
        parts.append(
            f""", p{r} AS (
    SELECT pair, CAST(count(*) AS BIGINT) AS pair_count FROM (
      SELECT unnest(list_transform(range(1, len(a)), i -> a[i] || ' ' || a[i+1])) AS pair
      FROM (SELECT string_split(s, ' ') AS a FROM s{r - 1} WHERE s <> '' AND len(string_split(s, ' ')) >= 2)
    ) GROUP BY 1
  ), m{r} AS (
    SELECT CAST({r} AS BIGINT) AS merge_rank, pair, pair_count
    FROM p{r} ORDER BY pair_count DESC, pair ASC LIMIT 1
  ), s{r} AS (
    SELECT doc_id,
           replace(s, (SELECT pair FROM m{r}),
                   replace((SELECT pair FROM m{r}), chr(3) || ' ' || chr(2), chr(31))) AS s
    FROM s{r - 1}
  )"""
        )
    return "".join(parts)


_MERGES_ORACLE = f"""
  WITH {_oracle_rounds()},
  merges AS (
    {' UNION ALL '.join(f'SELECT * FROM m{r}' for r in range(1, _ROUNDS + 1))}
  )
  SELECT merge_rank,
         replace(replace(replace(string_split(pair, ' ')[1], chr(2), ''), chr(3), ''), chr(31), ' ') AS left_symbol,
         replace(replace(replace(string_split(pair, ' ')[2], chr(2), ''), chr(3), ''), chr(31), ' ') AS right_symbol,
         pair_count
  FROM merges ORDER BY merge_rank
"""

_CURVE_ORACLE = f"""
  WITH {_oracle_rounds()},
  curve AS (
    {' UNION ALL '.join(
        f"SELECT CAST({r} AS BIGINT) AS n_merges,"
        f" CAST(count(*) AS BIGINT) AS total_symbols,"
        f" CAST(count(DISTINCT sym) AS BIGINT) AS distinct_symbols"
        f" FROM (SELECT unnest(string_split(s, ' ')) AS sym FROM s{r} WHERE s <> '')"
        for r in range(0, _ROUNDS + 1)
    )}
  )
  SELECT * FROM curve ORDER BY n_merges
"""


PENDING: tuple[PendingQuery, ...] = (
    PendingQuery(
        "llm_bpe_phrase_merges",
        llm_bpe_phrase_merges_query,
        _MERGES_ORACLE,
        tags=("llmops", "bpe", "tokenizer", "iterative", "integer-exact"),
    ),
    PendingQuery(
        "llm_bpe_compression_curve",
        llm_bpe_compression_curve_query,
        _CURVE_ORACLE,
        tags=("llmops", "bpe", "vocabulary", "iterative", "integer-exact"),
    ),
)
