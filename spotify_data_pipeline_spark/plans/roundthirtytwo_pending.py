"""Round-32 declared-query staging area — the TOKENIZER / EMBEDDING /
SERVING wave of the post-backlog era: the per-language tokenizer
economics, embedding-space diagnostics, and retrieval-serving
transforms a training-data platform runs beside curation.

- **Fertility by language**: tokens-per-word and chars-per-token by
  language bucket — the tokenizer-cost table that decides whether a
  vocabulary underserves a language (high fertility = more compute
  per word).
- **Sentence-length screen**: sentence segmentation stats (regex
  [.!?]+ segments) with wall-of-text / staccato flags — a C4-family
  curation heuristic on sentence granularity.
- **Padding-waste curve**: for context lengths 128/256/512, exact
  sequence counts and pad-token waste under one-doc-per-sequence
  packing — the overhead table that motivates sequence packing.
- **Embedding covariance**: per-dimension-pair exact covariance over
  e6-quantized embeddings (first 8 dims) with IEEE-deterministic
  correlation — the whitening/anisotropy diagnostic (a collapsed
  embedding space inflates near-dup cosines).
- **MIPS norm transform**: the augmented-vector reduction of
  max-inner-product search to cosine search (phi(c) = [c,
  sqrt(M^2-|c|^2)] puts every candidate on a sphere of radius M) —
  top-k by inner product with the transformed cosine emitted, and
  the provable monotonicity flag (non-increasing cos within a
  query's ip-ranked list).
- **Hard-negative mining**: per anchor the 3 LOWEST-cosine
  co-members of its IVF cell — the contrastive-training pairs that
  are cheap at scale precisely because they reuse the coarse
  quantizer's cells (no corpus-wide pair join).
- **Harmonic centrality**: k-source depth-3 BFS on the
  supplier<->customer purchase graph with per-term e6 floors
  (1/d in micro-units is an exact integer sum) — the betweenness
  row's cheaper sibling.
- **Ridge regression path**: closed-form 2x2 ridge (Cramer on exact
  DECIMAL moments) at lambda in {0, 1e6, 1e9}, weights e6-floored,
  and the MSE of the QUANTIZED weights per lambda (floor on both
  engines — the gbdt truncate-vs-round lesson applied from birth).

Per-wave staging module (nothing evidenced imports this file).
Exactness rules as earlier waves; embedding floats are e6-quantized
BEFORE any sum so no float accumulation order matters anywhere
except the established list-fold dot-product device.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.functions.text import (
    BPE_ISH_PATTERN,
    is_nonblank,
    normalize_whitespace,
    tokens,
)
from spotify_data_pipeline_spark.functions.vectors import (
    cosine_similarity,
    dot,
)
from spotify_data_pipeline_spark.io import load_table
from spotify_data_pipeline_spark.plans.parity import rnd, rnd_cents


@dataclass(frozen=True)
class PendingQuery:
    name: str
    fn: object
    oracle: str | None
    headline: bool = False
    tags: tuple[str, ...] = ()


_TOKENS_SQL = "string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')"
_BPE_SQL = r"len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^\sA-Za-z0-9_]'))"

#: DuckDB twin of functions.vectors.dot / cosine (same left-to-right
#: fold — the established sim_cosine_topk device).
_DOT_SQL = "list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"


# ---------------------------------------------------------------------------
# 1. Tokenizer fertility by language
# ---------------------------------------------------------------------------


def text_fertility_by_lang_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-economics table per language: docs, whitespace words,
    BPE-ish tokens (the shared regex device), chars, fertility ppm
    (BPE tokens per word x 1e6) and chars-per-BPE-token ppm. High
    fertility marks languages the vocabulary underserves — the table
    a multilingual curation run reads before fixing its token budget
    per language.

    Scale shape: map-only token counting + one lang-keyed agg.
    """
    docs = load_table(spark, sf_dir, "documents").where(is_nonblank(F.col("text")))
    per_doc = docs.select(
        "lang",
        F.size(tokens(F.col("text"))).cast("long").alias("words"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_ISH_PATTERN), F.lit(0)))
        .cast("long")
        .alias("bpe"),
        F.col("n_chars").cast("long").alias("chars"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("words").cast("long").alias("words"),
            F.sum("bpe").cast("long").alias("bpe_tokens"),
            F.sum("chars").cast("long").alias("chars"),
        )
        .select(
            "lang",
            "n_docs",
            "words",
            "bpe_tokens",
            "chars",
            F.expr("(bpe_tokens * 1000000) DIV words")
            .cast("long")
            .alias("fertility_ppm"),
            F.expr("(chars * 1000000) DIV bpe_tokens")
            .cast("long")
            .alias("chars_per_token_ppm"),
        )
        .orderBy("lang")
    )


_FERTILITY_ORACLE = rf"""
  WITH per_doc AS (
    SELECT lang,
           CAST(len({_TOKENS_SQL}) AS BIGINT) AS words,
           CAST({_BPE_SQL} AS BIGINT) AS bpe,
           CAST(n_chars AS BIGINT) AS chars
    FROM documents WHERE length(trim(text)) > 0
  ), g AS (
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(words) AS BIGINT) AS words,
           CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
           CAST(sum(chars) AS BIGINT) AS chars
    FROM per_doc GROUP BY 1
  )
  SELECT lang, n_docs, words, bpe_tokens, chars,
         CAST((bpe_tokens * 1000000) // words AS BIGINT) AS fertility_ppm,
         CAST((chars * 1000000) // bpe_tokens AS BIGINT)
           AS chars_per_token_ppm
  FROM g
  ORDER BY lang
"""


# ---------------------------------------------------------------------------
# 2. Sentence-length screen
# ---------------------------------------------------------------------------

_SENT_WALL_E2 = 40 * 100  # mean words/sentence >= 40 -> wall of text
_SENT_STACCATO_E2 = 3 * 100  # mean words/sentence <= 3 -> staccato


def text_sentence_length_screen_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sentence-granularity curation screen: sentences are the
    non-blank segments of the normalized text split on [.!?]+ runs;
    emits per doc the sentence count, word count, mean words per
    sentence in e2 (integer DIV), and wall-of-text / staccato flags
    (>= 40 or <= 3 words per sentence). The sentence-shape sibling of
    the C4 line-level screen.

    Scale shape: map-only (regex split + array filter), one pass.
    """
    docs = load_table(spark, sf_dir, "documents").where(is_nonblank(F.col("text")))
    per_doc = docs.select(
        "doc_id",
        F.size(
            F.filter(
                F.split(normalize_whitespace(F.col("text")), r"[.!?]+"),
                lambda s: F.length(F.trim(s)) > 0,
            )
        )
        .cast("long")
        .alias("n_sentences"),
        F.size(tokens(F.col("text"))).cast("long").alias("words"),
    ).where(F.col("n_sentences") > 0)
    return per_doc.select(
        "doc_id",
        "n_sentences",
        "words",
        F.expr("(words * 100) DIV n_sentences").cast("long").alias(
            "mean_words_per_sentence_e2"
        ),
        F.when(
            F.expr("(words * 100) DIV n_sentences") >= _SENT_WALL_E2, F.lit(1)
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("flag_wall"),
        F.when(
            F.expr("(words * 100) DIV n_sentences") <= _SENT_STACCATO_E2,
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("flag_staccato"),
    ).orderBy("doc_id")


_SENTENCE_ORACLE = rf"""
  WITH per_doc AS (
    SELECT doc_id,
           CAST(len(list_filter(
                 string_split_regex(
                   trim(regexp_replace(text, '\s+', ' ', 'g')), '[.!?]+'),
                 s -> length(trim(s)) > 0)) AS BIGINT) AS n_sentences,
           CAST(len({_TOKENS_SQL}) AS BIGINT) AS words
    FROM documents WHERE length(trim(text)) > 0
  )
  SELECT doc_id, n_sentences, words,
         CAST((words * 100) // n_sentences AS BIGINT)
           AS mean_words_per_sentence_e2,
         CAST(CASE WHEN (words * 100) // n_sentences >= {_SENT_WALL_E2}
                   THEN 1 ELSE 0 END AS BIGINT) AS flag_wall,
         CAST(CASE WHEN (words * 100) // n_sentences <= {_SENT_STACCATO_E2}
                   THEN 1 ELSE 0 END AS BIGINT) AS flag_staccato
  FROM per_doc
  WHERE n_sentences > 0
  ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# 3. Padding-waste curve
# ---------------------------------------------------------------------------

_PAD_CTXS = (128, 256, 512)


def llm_padding_waste_curve_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact padding overhead of one-doc-per-sequence batching at
    context lengths 128/256/512: per doc sequences = ceil(tokens /
    ctx) (integer arithmetic), pad = sequences x ctx - tokens; per
    ctx the totals and pad ppm of the padded token volume — the
    overhead table that justifies sequence packing (compare
    llm_pack_efficiency's packed twin).

    Scale shape: one scan; the ctx dimension is a 3-literal explode,
    so the whole curve costs one corpus aggregate.
    """
    docs = load_table(spark, sf_dir, "documents").where(is_nonblank(F.col("text")))
    per_doc = docs.select(F.size(tokens(F.col("text"))).cast("long").alias("toks"))
    expl = per_doc.select(
        "toks",
        F.explode(
            F.array(*[F.lit(c).cast("long") for c in _PAD_CTXS])
        ).alias("ctx"),
    ).select(
        "ctx",
        "toks",
        F.expr("(toks + ctx - 1) DIV ctx").cast("long").alias("seqs"),
    )
    return (
        expl.groupBy("ctx")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("toks").cast("long").alias("total_tokens"),
            F.sum("seqs").cast("long").alias("total_sequences"),
            F.sum(F.col("seqs") * F.col("ctx") - F.col("toks"))
            .cast("long")
            .alias("pad_tokens"),
        )
        .select(
            "ctx",
            "n_docs",
            "total_tokens",
            "total_sequences",
            "pad_tokens",
            F.expr("(pad_tokens * 1000000) DIV (total_sequences * ctx)")
            .cast("long")
            .alias("pad_ppm"),
        )
        .orderBy("ctx")
    )


_PAD_ORACLE = rf"""
  WITH per_doc AS (
    SELECT CAST(len({_TOKENS_SQL}) AS BIGINT) AS toks
    FROM documents WHERE length(trim(text)) > 0
  ), expl AS (
    SELECT ctx, toks, CAST((toks + ctx - 1) // ctx AS BIGINT) AS seqs
    FROM per_doc
    CROSS JOIN (SELECT unnest([{", ".join(f"CAST({c} AS BIGINT)" for c in _PAD_CTXS)}]) AS ctx)
  ), g AS (
    SELECT ctx,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(toks) AS BIGINT) AS total_tokens,
           CAST(sum(seqs) AS BIGINT) AS total_sequences,
           CAST(sum(seqs * ctx - toks) AS BIGINT) AS pad_tokens
    FROM expl GROUP BY 1
  )
  SELECT ctx, n_docs, total_tokens, total_sequences, pad_tokens,
         CAST((pad_tokens * 1000000) // (total_sequences * ctx) AS BIGINT)
           AS pad_ppm
  FROM g
  ORDER BY ctx
"""


# ---------------------------------------------------------------------------
# 4. Embedding covariance (first 8 dims, e6-quantized exact)
# ---------------------------------------------------------------------------

_COV_DIMS = 8


def sim_embedding_covariance_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anisotropy diagnostic: exact covariance between the first 8
    embedding dimensions over e6-QUANTIZED values (q = floor(x * 1e6
    + 0.5), an exact integer — no float accumulation order anywhere),
    cov_num = n * Sxy - Sx * Sy in int64 (|q| <= ~2e6, n <= ~1e5 at
    fixture scales: documented headroom; a 1e9-row corpus moves these
    sums to DECIMAL), and correlation via the exact-double device
    (int64 -> double casts and IEEE sqrt/divide are identical on both
    engines), floored to e6. Emits one row per ordered dim pair
    i <= j; the diagonal rows carry corr_e6 = 1e6 by construction.

    Scale shape: ONE scan with 1 + 8 + 36 integer sums, then a 36-row
    explode — the covariance of d dims is one aggregate, never a
    join.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    qcols = [
        F.floor(
            F.element_at("embedding", i + 1).cast("double") * 1000000
            + F.lit(0.5)
        )
        .cast("long")
        .alias(f"q{i}")
        for i in range(_COV_DIMS)
    ]
    q = emb.select(*qcols)
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for i in range(_COV_DIMS):
        aggs.append(F.sum(f"q{i}").cast("long").alias(f"s{i}"))
    for i in range(_COV_DIMS):
        for j in range(i, _COV_DIMS):
            aggs.append(
                F.sum(F.col(f"q{i}") * F.col(f"q{j}"))
                .cast("long")
                .alias(f"p{i}_{j}")
            )
    sums = q.agg(*aggs)
    pairs = sums.select(
        "n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("long").alias("dim_i"),
                        F.lit(j).cast("long").alias("dim_j"),
                        (
                            F.col("n") * F.col(f"p{i}_{j}")
                            - F.col(f"s{i}") * F.col(f"s{j}")
                        )
                        .cast("long")
                        .alias("cov_num"),
                        (
                            F.col("n") * F.col(f"p{i}_{i}")
                            - F.col(f"s{i}") * F.col(f"s{i}")
                        )
                        .cast("long")
                        .alias("var_i"),
                        (
                            F.col("n") * F.col(f"p{j}_{j}")
                            - F.col(f"s{j}") * F.col(f"s{j}")
                        )
                        .cast("long")
                        .alias("var_j"),
                    )
                    for i in range(_COV_DIMS)
                    for j in range(i, _COV_DIMS)
                ]
            )
        ).alias("c"),
    ).select(
        F.col("c.dim_i").alias("dim_i"),
        F.col("c.dim_j").alias("dim_j"),
        "n",
        F.col("c.cov_num").alias("cov_num"),
        F.floor(
            F.col("c.cov_num").cast("double")
            / F.sqrt(
                F.col("c.var_i").cast("double") * F.col("c.var_j").cast("double")
            )
            * 1000000
        )
        .cast("long")
        .alias("corr_e6"),
    )
    return pairs.orderBy("dim_i", "dim_j")


def _cov_oracle() -> str:
    s_cols = ",\n           ".join(
        f"CAST(sum(q{i}) AS BIGINT) AS s{i}" for i in range(_COV_DIMS)
    )
    p_cols = ",\n           ".join(
        f"CAST(sum(q{i} * q{j}) AS BIGINT) AS p{i}_{j}"
        for i in range(_COV_DIMS)
        for j in range(i, _COV_DIMS)
    )
    q_cols = ",\n           ".join(
        f"CAST(floor(CAST(embedding[{i + 1}] AS DOUBLE) * 1000000 + 0.5)"
        f" AS BIGINT) AS q{i}"
        for i in range(_COV_DIMS)
    )
    rows = "\n      UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS dim_i, CAST({j} AS BIGINT) AS dim_j,"
        f" n, CAST(n * p{i}_{j} - s{i} * s{j} AS BIGINT) AS cov_num,"
        f" CAST(n * p{i}_{i} - s{i} * s{i} AS BIGINT) AS var_i,"
        f" CAST(n * p{j}_{j} - s{j} * s{j} AS BIGINT) AS var_j"
        f" FROM sums"
        for i in range(_COV_DIMS)
        for j in range(i, _COV_DIMS)
    )
    return f"""
    WITH q AS (
      SELECT {q_cols}
      FROM embeddings
    ), sums AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
           {s_cols},
           {p_cols}
      FROM q
    ), pairs AS (
      {rows}
    )
    SELECT dim_i, dim_j, n, cov_num,
           CAST(floor(CAST(cov_num AS DOUBLE)
                / sqrt(CAST(var_i AS DOUBLE) * CAST(var_j AS DOUBLE))
                * 1000000) AS BIGINT) AS corr_e6
    FROM pairs
    ORDER BY dim_i, dim_j
    """


# ---------------------------------------------------------------------------
# 5. MIPS norm transform
# ---------------------------------------------------------------------------

_MIPS_QUERIES = 5
_MIPS_TOPK = 5


def sim_mips_norm_transform_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-inner-product search via the augmented-vector reduction:
    with M = the corpus max L2 norm, phi(c) = [c, sqrt(M^2 - |c|^2)]
    has |phi(c)| = M for every candidate, so cosine ranking of
    [q, 0] against phi(c) IS inner-product ranking (cos = ip /
    (|q| M), a positive per-query scaling). Emits for the first 5
    query vectors their ip-top-5 (4dp-rounded ip ranking key, vec_id
    tiebreak) with the transformed cosine and cos_nonincreasing = 1:
    rounding is monotone, so the non-strict order transfers exactly —
    the algebra the MIPS serving path rests on.

    Scale shape: brute-force scoring is the exact baseline twin (the
    IVF rows carry the scale path); the transform itself is one
    1-row max-norm broadcast, map-side per candidate.
    """
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    norms = emb.select(
        "vec_id",
        "embedding",
        dot(F.col("embedding"), F.col("embedding")).alias("sq_norm"),
    )
    mx = norms.agg(F.max("sq_norm").alias("m_sq"))
    q = norms.where(F.col("vec_id") < _MIPS_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("qe"),
        F.sqrt(F.col("sq_norm")).alias("q_norm"),
    )
    scored = (
        q.join(norms.withColumnRenamed("vec_id", "c_id"), F.col("c_id") != F.col("q_id"))
        .crossJoin(F.broadcast(mx))
        .select(
            "q_id",
            "c_id",
            rnd(dot(F.col("qe"), F.col("embedding")), 4).alias("ip_4dp"),
            rnd(
                dot(F.col("qe"), F.col("embedding"))
                / (F.col("q_norm") * F.sqrt(F.col("m_sq"))),
                4,
            ).alias("cos_t_4dp"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("ip_4dp").desc(), F.col("c_id").asc()
    )
    top = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= _MIPS_TOPK)
    )
    wl = Window.partitionBy("q_id").orderBy(F.col("rank").asc())
    return (
        top.withColumn(
            "cos_nonincreasing",
            F.when(
                F.lag("cos_t_4dp").over(wl).isNull()
                | (F.lag("cos_t_4dp").over(wl) >= F.col("cos_t_4dp")),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .cast("long"),
        )
        .select(
            "q_id",
            F.col("rank").cast("long").alias("rank"),
            "c_id",
            "ip_4dp",
            "cos_t_4dp",
            "cos_nonincreasing",
        )
        .orderBy("q_id", "rank")
    )


_MIPS_ORACLE = f"""
  WITH norms AS (
    SELECT vec_id, embedding,
           {_DOT_SQL.format(a="embedding", b="embedding")} AS sq_norm
    FROM embeddings
  ), mx AS (
    SELECT max(sq_norm) AS m_sq FROM norms
  ), q AS (
    SELECT vec_id AS q_id, embedding AS qe, sqrt(sq_norm) AS q_norm
    FROM norms WHERE vec_id < {_MIPS_QUERIES}
  ), scored AS (
    SELECT q.q_id, c.vec_id AS c_id,
           floor({_DOT_SQL.format(a="q.qe", b="c.embedding")} * 10000 + 0.5)
             / 10000 AS ip_4dp,
           floor({_DOT_SQL.format(a="q.qe", b="c.embedding")}
                 / (q.q_norm * sqrt(m.m_sq)) * 10000 + 0.5) / 10000
             AS cos_t_4dp
    FROM q JOIN norms c ON c.vec_id <> q.q_id
    CROSS JOIN mx m
  ), ranked AS (
    SELECT *, row_number() OVER (PARTITION BY q_id
                                 ORDER BY ip_4dp DESC, c_id) AS rank
    FROM scored
  ), top AS (
    SELECT * FROM ranked WHERE rank <= {_MIPS_TOPK}
  )
  SELECT q_id, CAST(rank AS BIGINT) AS rank, c_id, ip_4dp, cos_t_4dp,
         CAST(CASE WHEN lag(cos_t_4dp) OVER (PARTITION BY q_id
                                             ORDER BY rank) IS NULL
                    OR lag(cos_t_4dp) OVER (PARTITION BY q_id
                                            ORDER BY rank) >= cos_t_4dp
                   THEN 1 ELSE 0 END AS BIGINT) AS cos_nonincreasing
  FROM top
  ORDER BY q_id, rank
"""


# ---------------------------------------------------------------------------
# 6. Hard-negative mining
# ---------------------------------------------------------------------------

_HN_CELLS = 8
_HN_ANCHORS = 30
_HN_K = 3


def sim_hard_negative_mining_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard negatives from the coarse quantizer: every
    vector is assigned to its max-cosine cell (centroids = the first
    8 vectors, 4dp ranking key + centroid-id tiebreak — the frozen-
    quantizer device of the IVF rows), and for each of the first 30
    anchors the 3 LOWEST-cosine members of its OWN cell are emitted —
    semantically closest-cluster-but-least-similar examples, the
    hard negatives contrastive training wants.

    Scale shape: the pair join is a CELL equi-join (the SemDeDup
    shape, inverted objective) — candidates per anchor are its cell's
    members, never the corpus; cells are capped by the quantizer.
    """
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = emb.where(F.col("vec_id") < _HN_CELLS).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.col("cos_c").desc(), F.col("cid").asc()
    )
    assigned = (
        emb.crossJoin(F.broadcast(cents))
        .withColumn(
            "cos_c", rnd(cosine_similarity(F.col("embedding"), F.col("ce")), 4)
        )
        .withColumn("rn", F.row_number().over(w_assign))
        .where(F.col("rn") == 1)
        .select("vec_id", "embedding", F.col("cid").alias("cell"))
    )
    anchors = assigned.where(F.col("vec_id") < _HN_ANCHORS).select(
        F.col("vec_id").alias("anchor"),
        F.col("embedding").alias("ae"),
        "cell",
    )
    pairs = (
        anchors.join(
            assigned.select(
                F.col("vec_id").alias("neg"), F.col("embedding").alias("ne"), "cell"
            ),
            "cell",
        )
        .where(F.col("neg") != F.col("anchor"))
        .select(
            "anchor",
            "cell",
            "neg",
            rnd(cosine_similarity(F.col("ae"), F.col("ne")), 4).alias("cos_4dp"),
        )
    )
    w_hard = Window.partitionBy("anchor").orderBy(
        F.col("cos_4dp").asc(), F.col("neg").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w_hard))
        .where(F.col("rank") <= _HN_K)
        .select(
            "anchor",
            "cell",
            F.col("rank").cast("long").alias("rank"),
            "neg",
            "cos_4dp",
        )
        .orderBy("anchor", "rank")
    )


_HN_COS_SQL = (
    "floor({dot} / (sqrt({na}) * sqrt({nb})) * 10000 + 0.5) / 10000"
)


def _hard_negative_oracle() -> str:
    def cos(a, b):
        return _HN_COS_SQL.format(
            dot=_DOT_SQL.format(a=a, b=b),
            na=_DOT_SQL.format(a=a, b=a),
            nb=_DOT_SQL.format(a=b, b=b),
        )

    return f"""
    WITH cents AS (
      SELECT vec_id AS cid, embedding AS ce FROM embeddings
      WHERE vec_id < {_HN_CELLS}
    ), scored AS (
      SELECT e.vec_id, e.embedding, c.cid,
             {cos("e.embedding", "c.ce")} AS cos_c
      FROM embeddings e CROSS JOIN cents c
    ), assigned AS (
      SELECT vec_id, embedding, cid AS cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY cos_c DESC, cid) AS rn
        FROM scored) WHERE rn = 1
    ), anchors AS (
      SELECT vec_id AS anchor, embedding AS ae, cell
      FROM assigned WHERE vec_id < {_HN_ANCHORS}
    ), pairs AS (
      SELECT a.anchor, a.cell, m.vec_id AS neg,
             {cos("a.ae", "m.embedding")} AS cos_4dp
      FROM anchors a JOIN assigned m ON a.cell = m.cell
      WHERE m.vec_id <> a.anchor
    )
    SELECT anchor, cell, CAST(rank AS BIGINT) AS rank, neg, cos_4dp
    FROM (
      SELECT *, row_number() OVER (PARTITION BY anchor
                                   ORDER BY cos_4dp ASC, neg) AS rank
      FROM pairs)
    WHERE rank <= {_HN_K}
    ORDER BY anchor, rank
    """


# ---------------------------------------------------------------------------
# 7. Harmonic centrality (k-source, depth-capped)
# ---------------------------------------------------------------------------

_HC_SOURCES = 4


def graph_harmonic_centrality_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-source depth-3 harmonic centrality on the bipartite
    supplier<->customer purchase graph (edges = distinct (suppkey,
    custkey) pairs via lineitem x orders — the betweenness row's
    graph): per source the BFS level sizes n1/n2/n3 and harmonic_e6 =
    n1 * 1e6 + n2 * 5e5 + n3 * 333333 (1/d in micro-units is an
    exact integer per term, so the sum is exact — the per-term floor
    device).

    Scale shape: per level one frontier equi-join + anti-join dedup
    keyed (source, node); sources vectorized into the key — k sources
    cost one plan. The depth cap bounds the rounds.
    """
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(F.col("l_suppkey").alias("s"), F.col("o_custkey").alias("c"))
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey")
    seeds = (
        supp.orderBy("s_suppkey")
        .limit(_HC_SOURCES)
        .select(F.col("s_suppkey").alias("src"))
    )
    l1 = edges.join(seeds, edges.s == seeds.src).select("src", "c").distinct()
    l2 = (
        l1.join(edges, "c")
        .where(F.col("s") != F.col("src"))
        .select("src", "s")
        .distinct()
    )
    l3 = (
        l2.join(edges, "s")
        .join(l1.withColumn("_seen", F.lit(1)), ["src", "c"], "left")
        .where(F.col("_seen").isNull())
        .select("src", "c")
        .distinct()
    )
    n1 = l1.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("n_d1"))
    n2 = l2.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("n_d2"))
    n3 = l3.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("n_d3"))
    return (
        seeds.join(n1, seeds.src == n1.src, "left")
        .drop(n1.src)
        .join(n2, "src", "left")
        .join(n3, "src", "left")
        .select(
            F.col("src").alias("s_suppkey"),
            F.coalesce("n_d1", F.lit(0)).cast("long").alias("n_d1"),
            F.coalesce("n_d2", F.lit(0)).cast("long").alias("n_d2"),
            F.coalesce("n_d3", F.lit(0)).cast("long").alias("n_d3"),
            (
                F.coalesce("n_d1", F.lit(0)) * 1000000
                + F.coalesce("n_d2", F.lit(0)) * 500000
                + F.coalesce("n_d3", F.lit(0)) * 333333
            )
            .cast("long")
            .alias("harmonic_e6"),
        )
        .orderBy("s_suppkey")
    )


_HARMONIC_ORACLE = f"""
  WITH edges AS (
    SELECT DISTINCT l.l_suppkey AS s, o.o_custkey AS c
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  ), seeds AS (
    SELECT s_suppkey AS src FROM supplier ORDER BY s_suppkey
    LIMIT {_HC_SOURCES}
  ), l1 AS (
    SELECT DISTINCT sd.src, e.c FROM edges e JOIN seeds sd ON e.s = sd.src
  ), l2 AS (
    SELECT DISTINCT l1.src, e.s FROM l1 JOIN edges e ON l1.c = e.c
    WHERE e.s <> l1.src
  ), l3 AS (
    SELECT DISTINCT l2.src, e.c
    FROM l2 JOIN edges e ON l2.s = e.s
    LEFT JOIN l1 ON l1.src = l2.src AND l1.c = e.c
    WHERE l1.c IS NULL
  ), n1 AS (SELECT src, CAST(count(*) AS BIGINT) AS n_d1 FROM l1 GROUP BY 1),
  n2 AS (SELECT src, CAST(count(*) AS BIGINT) AS n_d2 FROM l2 GROUP BY 1),
  n3 AS (SELECT src, CAST(count(*) AS BIGINT) AS n_d3 FROM l3 GROUP BY 1)
  SELECT sd.src AS s_suppkey,
         CAST(coalesce(n1.n_d1, 0) AS BIGINT) AS n_d1,
         CAST(coalesce(n2.n_d2, 0) AS BIGINT) AS n_d2,
         CAST(coalesce(n3.n_d3, 0) AS BIGINT) AS n_d3,
         CAST(coalesce(n1.n_d1, 0) * 1000000
              + coalesce(n2.n_d2, 0) * 500000
              + coalesce(n3.n_d3, 0) * 333333 AS BIGINT) AS harmonic_e6
  FROM seeds sd
  LEFT JOIN n1 ON sd.src = n1.src
  LEFT JOIN n2 ON sd.src = n2.src
  LEFT JOIN n3 ON sd.src = n3.src
  ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# 8. Ridge regression path (closed-form 2x2 Cramer)
# ---------------------------------------------------------------------------

_RIDGE_LAMBDAS = (0, 1_000_000, 1_000_000_000)


def ml_ridge_cramer_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form ridge path: regress lineitem extended price
    (integer cents) on quantity at lambda in {0, 1e6, 1e9},
    penalizing the SLOPE only (the intercept stays unpenalized —
    standard practice, and what makes shrinkage monotone: w1 =
    (n Sxy - Sx Sy) / (n Sxx - Sx^2 + n lambda), so |w1| strictly
    decreases in lambda). The 2x2 solve is Cramer on exact integer
    moments promoted to DECIMAL(38,0) (the Sy-scale numerators
    overflow int64), weights floored to e6 via the exact-double
    device, and the MSE of the E6-QUANTIZED weights per lambda —
    with an explicit floor on BOTH engines (Spark's DECIMAL->BIGINT
    cast truncates, DuckDB's rounds: the gbdt lesson applied from
    birth).

    Scale shape: one scan for 5 moments, a 3-row lambda explode, a
    3-row broadcast back for scoring, one MSE agg per lambda in a
    single grouped pass.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("x"),
        rnd_cents(F.col("l_extendedprice")).alias("y"),
    )
    sums = li.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y").cast("decimal(38,0)"))
        .alias("sxy"),
    )
    lam_rows = sums.select(
        "n",
        "sx",
        "sxx",
        "sy",
        "sxy",
        F.explode(
            F.array(*[F.lit(v).cast("long") for v in _RIDGE_LAMBDAS])
        ).alias("lam"),
    )
    weights = lam_rows.select(
        "lam",
        F.floor(
            (
                (F.col("sxx") + F.col("lam")).cast("double")
                * F.col("sy").cast("double")
                - F.col("sx").cast("double") * F.col("sxy").cast("double")
            )
            / (
                F.col("n").cast("double")
                * (F.col("sxx") + F.col("lam")).cast("double")
                - F.col("sx").cast("double") * F.col("sx").cast("double")
            )
            * 1000000
        )
        .cast("long")
        .alias("w0_e6"),
        F.floor(
            (
                F.col("n").cast("double")
                * F.col("sxy").cast("double")
                - F.col("sx").cast("double") * F.col("sy").cast("double")
            )
            / (
                F.col("n").cast("double")
                * (F.col("sxx") + F.col("lam")).cast("double")
                - F.col("sx").cast("double") * F.col("sx").cast("double")
            )
            * 1000000
        )
        .cast("long")
        .alias("w1_e6"),
    )
    scored = li.crossJoin(F.broadcast(weights)).select(
        "lam",
        "w0_e6",
        "w1_e6",
        (
            F.col("y")
            - F.expr("(w0_e6 + w1_e6 * x) DIV 1000000")
        )
        .cast("long")
        .alias("r"),
    )
    return (
        scored.groupBy("lam", "w0_e6", "w1_e6")
        .agg(
            F.expr(
                "CAST(floor(sum(CAST(r AS DECIMAL(38,0)) * CAST(r AS DECIMAL(38,0)))"
                " / count(1)) AS BIGINT)"
            ).alias("mse_cents2")
        )
        .select("lam", "w0_e6", "w1_e6", "mse_cents2")
        .orderBy("lam")
    )


_RIDGE_ORACLE = f"""
  WITH li AS (
    SELECT CAST(l_quantity AS BIGINT) AS x,
           CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
    FROM lineitem
  ), sums AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS sx,
           CAST(sum(x * x) AS BIGINT) AS sxx,
           CAST(sum(y) AS BIGINT) AS sy,
           sum(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))) AS sxy
    FROM li
  ), lams AS (
    SELECT s.*, lam FROM sums s CROSS JOIN (
      SELECT unnest([{", ".join(f"CAST({v} AS BIGINT)" for v in _RIDGE_LAMBDAS)}]) AS lam)
  ), weights AS (
    SELECT lam,
           CAST(floor(
             (CAST(sxx + lam AS DOUBLE) * CAST(sy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sxy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx + lam AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             * 1000000) AS BIGINT) AS w0_e6,
           CAST(floor(
             (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx + lam AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             * 1000000) AS BIGINT) AS w1_e6
    FROM lams
  ), scored AS (
    SELECT w.lam, w.w0_e6, w.w1_e6,
           CAST(li.y - (w.w0_e6 + w.w1_e6 * li.x) // 1000000 AS BIGINT) AS r
    FROM li CROSS JOIN weights w
  )
  SELECT lam, w0_e6, w1_e6,
         CAST(floor(sum(CAST(r AS DECIMAL(38,0)) * CAST(r AS DECIMAL(38,0)))
                    / count(*)) AS BIGINT) AS mse_cents2
  FROM scored
  GROUP BY 1, 2, 3
  ORDER BY lam
"""


PENDING: tuple[PendingQuery, ...] = (
    PendingQuery(
        "text_fertility_by_lang",
        text_fertility_by_lang_query,
        _FERTILITY_ORACLE,
        tags=("text", "tokenizer", "fertility", "multilingual",
              "integer-exact"),
    ),
    PendingQuery(
        "text_sentence_length_screen",
        text_sentence_length_screen_query,
        _SENTENCE_ORACLE,
        tags=("text", "sentence", "curation-screen", "integer-exact"),
    ),
    PendingQuery(
        "llm_padding_waste_curve",
        llm_padding_waste_curve_query,
        _PAD_ORACLE,
        tags=("llm", "packing", "padding", "integer-exact"),
    ),
    PendingQuery(
        "sim_embedding_covariance",
        sim_embedding_covariance_query,
        _cov_oracle(),
        tags=("sim", "covariance", "anisotropy", "e6-quantized",
              "exact-double"),
    ),
    PendingQuery(
        "sim_mips_norm_transform",
        sim_mips_norm_transform_query,
        _MIPS_ORACLE,
        tags=("sim", "mips", "norm-transform", "topk"),
    ),
    PendingQuery(
        "sim_hard_negative_mining",
        sim_hard_negative_mining_query,
        _hard_negative_oracle(),
        tags=("sim", "contrastive", "hard-negatives", "ivf-cell"),
    ),
    PendingQuery(
        "graph_harmonic_centrality",
        graph_harmonic_centrality_query,
        _HARMONIC_ORACLE,
        tags=("graph", "harmonic", "bfs", "k-source", "integer-exact"),
    ),
    PendingQuery(
        "ml_ridge_cramer",
        ml_ridge_cramer_query,
        _RIDGE_ORACLE,
        tags=("ml", "ridge", "cramer", "regularization-path",
              "decimal38", "exact-double"),
    ),
)
