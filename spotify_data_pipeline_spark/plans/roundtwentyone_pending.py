"""Round-21 declared-query staging area — the LLM-curation DEPTH wave:
the published data-curation algorithms a 100 TB pretraining pipeline
runs after the breadth screens already in the engine.

- **SemDeDup** (Abbas et al. '23): cluster embeddings with a fixed
  coarse quantizer, prune near-duplicate pairs WITHIN clusters only —
  the cluster equi-join is what makes embedding dedup tractable at
  scale (never all-pairs).
- **DSIR importance weights** (Xie et al. '23): hashed-unigram
  log-likelihood ratio between a target domain and the raw corpus;
  the importance-resampling selection step of data mixing.
- **Bigram doc perplexity** (CCNet / Wenzek et al. '19 shape): score
  every document under a corpus bigram LM with add-V smoothing and
  flag the worst — the KenLM perplexity filter re-expressed exactly.
- **C4 rule screen** (Raffel et al. '20 §2.2): terminal-punctuation
  line filter, >=3-sentence rule, lorem-ipsum and curly-brace doc
  drops, javascript line removal — on deterministically synthesized
  punctuation-bearing pages (the roundfourteen in-query synthesis
  device; the raw documents carry no punctuation).
- **Matryoshka truncation recall** (Kusupati et al. '22): top-k
  agreement between full-dimension and prefix-truncated cosine
  ranking — the cheap-retrieval/rerank design check.
- **NB quality classifier** (the GPT-3 quality-filter shape, Brown
  et al. '20 App. A): multinomial naive Bayes over hashed token
  buckets, trained in-query, integer log-margin scoring, confusion
  matrix against the held label.

Per-wave staging module (nothing evidenced imports this file — the
one-module-per-wave rule from plans/active.py).

Cross-engine exactness rules carried from earlier waves: integer ppm
via DIV/`//`, BIGINT casts, deterministic tiebreaks, micro-nat
scaled-integer log terms (every ln() floored to integer e6 PER TERM
before summation — the roundeighteen device), 4dp-rounded cosines
over sequentially-summed float64 dot products (the dedup_embedding_
cosine device, bit-identical on both engines), and the 15-hex-digit
md5 bucket hash (the llm_shard_manifest device).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.functions.text import is_nonblank, tokens
from spotify_data_pipeline_spark.functions.vectors import cosine_similarity
from spotify_data_pipeline_spark.io import load_table
from spotify_data_pipeline_spark.plans.parity import rnd


@dataclass(frozen=True)
class PendingQuery:
    name: str
    fn: object
    oracle: str | None
    headline: bool = False
    tags: tuple[str, ...] = ()


_TOKENS_SQL = "string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')"

# DuckDB twin of Spark's conv(substr(md5(x),1,15),16,10): split the 15
# hex digits as first*16^14 + next-14 (60 bits, always < 2^63). The
# 16^14 weight (72057594037927936) makes this the TRUE head-15 value,
# exact for every modulus — the llm_shard_manifest oracle wrote 16^13
# here, invisible under its power-of-2 modulus (low 52 bits agree)
# but wrong beyond it.
def _md5_bucket_sql(arg_sql: str, n_buckets: int) -> str:
    return (
        f"CAST((  (strpos('0123456789abcdef', substr(md5({arg_sql}), 1, 1)) - 1)"
        f" * 72057594037927936"
        f" + CAST(('0x' || substr(md5({arg_sql}), 2, 14)) AS BIGINT)"
        f") % {n_buckets} AS BIGINT)"
    )


def _md5_bucket(col: F.Column, n_buckets: int) -> F.Column:
    return (
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long") % n_buckets
    )


# ---------------------------------------------------------------------------
# 1. SemDeDup — fixed-quantizer semantic dedup (cluster-local pruning)
# ---------------------------------------------------------------------------

_SEM_N_CENTROIDS = 8
_SEM_THRESHOLD = 0.30  # 4dp cosine; ~240 within-cell pairs at sf0.001


def sim_semdedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. '23): assign every embedding to its
    nearest fixed centroid (the vectors with vec_id < 8 — a frozen
    coarse quantizer, the sim_ann_ivf_fixed device), then prune a
    vector when a LOWER-id vector in the SAME cell has 4dp cosine >=
    0.30 with it. Emits (removed_id, keeper_id, cell, cos4) where
    keeper is the lowest qualifying id (first-wins canonicalization).

    Scale shape: the 8-row quantizer broadcasts (bounded nested loop —
    whitelisted); the pair join is a CELL equi-join, never all-pairs —
    the entire point of SemDeDup is that candidate pairs are bounded
    by the cluster partition, so the shuffle key is the cell id and
    per-cell fanout is |cell|^2, tunable by k. Assignment tiebreak:
    unrounded cosine DESC, centroid id ASC (bit-identical float64
    dot products on both engines).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", F.col("embedding").alias("e"))
    cents = (
        v.where(F.col("vec_id") < _SEM_N_CENTROIDS)
        .select(F.col("vec_id").alias("cid"), F.col("e").alias("ce"))
    )
    scored = v.crossJoin(F.broadcast(cents)).withColumn(
        "cos_c", cosine_similarity(F.col("e"), F.col("ce"))
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.col("cos_c").desc(), F.col("cid").asc()
    )
    cell = (
        scored.withColumn("rn", F.row_number().over(w_assign))
        .where(F.col("rn") == 1)
        .select("vec_id", F.col("cid").alias("cell"))
    )
    # lineage cut: the assignment feeds BOTH sides of the cell pair
    # join — materialize it once (the PageRank/k-means device) instead
    # of recomputing the 8-centroid scoring per plan reference
    sided = cell.join(v, "vec_id").localCheckpoint(eager=True)
    a = sided.select(
        F.col("vec_id").alias("id_a"), "cell", F.col("e").alias("ea")
    )
    b = sided.select(
        F.col("vec_id").alias("id_b"), "cell", F.col("e").alias("eb")
    )
    pairs = (
        a.join(b, "cell")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cos4", rnd(cosine_similarity(F.col("ea"), F.col("eb")), 4))
        .where(F.col("cos4") >= _SEM_THRESHOLD)
    )
    w_keep = Window.partitionBy("id_b").orderBy(F.col("id_a").asc())
    return (
        pairs.withColumn("rn", F.row_number().over(w_keep))
        .where(F.col("rn") == 1)
        .select(
            F.col("id_b").cast("long").alias("removed_id"),
            F.col("id_a").cast("long").alias("keeper_id"),
            F.col("cell").cast("long").alias("cell"),
            F.col("cos4").alias("cos4"),
        )
        .orderBy("removed_id")
    )


_SEMDEDUP_ORACLE = f"""
  WITH v AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
  ), c AS (
    SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < {_SEM_N_CENTROIDS}
  ), scored AS (
    SELECT v.vec_id, c.cid,
           list_dot_product(v.e, c.ce)
             / (sqrt(list_dot_product(v.e, v.e))
                * sqrt(list_dot_product(c.ce, c.ce))) AS cos_c
    FROM v CROSS JOIN c
  ), cell AS (
    SELECT vec_id, cid AS cell FROM (
      SELECT vec_id, cid,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY cos_c DESC, cid) AS rn
      FROM scored) WHERE rn = 1
  ), pairs AS (
    SELECT x.vec_id AS id_a, y.vec_id AS id_b, x.cell,
           floor(list_dot_product(xv.e, yv.e)
             / (sqrt(list_dot_product(xv.e, xv.e))
                * sqrt(list_dot_product(yv.e, yv.e)))
             * 10000 + 0.5) / 10000 AS cos4
    FROM cell x
    JOIN cell y ON x.cell = y.cell AND x.vec_id < y.vec_id
    JOIN v xv ON xv.vec_id = x.vec_id
    JOIN v yv ON yv.vec_id = y.vec_id
  )
  SELECT CAST(id_b AS BIGINT) AS removed_id,
         CAST(id_a AS BIGINT) AS keeper_id,
         CAST(cell AS BIGINT) AS cell,
         cos4
  FROM (
    SELECT *, row_number() OVER (PARTITION BY id_b ORDER BY id_a) AS rn
    FROM pairs WHERE cos4 >= {_SEM_THRESHOLD}
  ) WHERE rn = 1
  ORDER BY removed_id
"""


# ---------------------------------------------------------------------------
# 2. DSIR importance weights — hashed-unigram domain selection
# ---------------------------------------------------------------------------

_DSIR_BUCKETS = 64
_DSIR_TARGET = ("src0", "src1", "src2", "src3")
_DSIR_TOP = 20


def llm_dsir_weights_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (Xie et al. '23): importance weights for selecting raw
    documents that look like a target domain. Features are hashed
    unigram buckets (md5 % 64); bucket log-likelihood ratio
    lambda_e6[b] = e6(ln p_target[b]) - e6(ln p_raw[b]) with add-one
    smoothing, each ln floored to integer micro-nats SEPARATELY (the
    per-term device); a document's weight is the integer sum of
    lambda_e6 over its token occurrences. Emits the top-20 docs by
    weight (doc_id tiebreak) with their source and target membership —
    the resampling step then samples proportionally to these weights.

    Scale shape: token explode -> 64-bucket agg (map-side combinable,
    bounded state) -> bucket equi-join back -> doc agg -> global
    top-20 (TakeOrderedAndProject). The two 1-row corpus totals are
    the whitelisted broadcasts.
    """
    docs = load_table(spark, sf_dir, "documents").where(
        is_nonblank(F.col("text"))
    )
    tok = docs.select(
        "doc_id",
        "source",
        F.explode(tokens(F.col("text"))).alias("term"),
    ).withColumn(
        "bucket",
        _md5_bucket(F.concat(F.lit("dsir:"), F.col("term")), _DSIR_BUCKETS),
    )
    is_target = F.col("source").isin(*_DSIR_TARGET)
    per_bucket = tok.groupBy("bucket").agg(
        F.sum(F.when(is_target, 1).otherwise(0)).cast("long").alias("c_t"),
        F.count(F.lit(1)).cast("long").alias("c_r"),
    )
    totals = tok.agg(
        F.sum(F.when(is_target, 1).otherwise(0)).cast("long").alias("n_t"),
        F.count(F.lit(1)).cast("long").alias("n_r"),
    )
    lam = per_bucket.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.floor(
                F.log(
                    (F.col("c_t") + 1) / (F.col("n_t") + _DSIR_BUCKETS)
                )
                * 1000000
                + F.lit(0.5)
            ).cast("long")
            - F.floor(
                F.log(
                    (F.col("c_r") + 1) / (F.col("n_r") + _DSIR_BUCKETS)
                )
                * 1000000
                + F.lit(0.5)
            ).cast("long")
        ).alias("lam_e6"),
    )
    per_doc = (
        tok.join(lam, "bucket")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tok"),
            F.sum("lam_e6").cast("long").alias("weight_e6"),
        )
        .withColumn(
            "is_target", F.col("source").isin(*_DSIR_TARGET).cast("boolean")
        )
    )
    return (
        per_doc.orderBy(F.col("weight_e6").desc(), F.col("doc_id").asc())
        .limit(_DSIR_TOP)
        .select("doc_id", "source", "is_target", "n_tok", "weight_e6")
    )


_DSIR_TARGET_SQL = ", ".join(f"'{s}'" for s in _DSIR_TARGET)

_DSIR_ORACLE = f"""
  WITH tok AS (
    SELECT doc_id, source,
           {_md5_bucket_sql("'dsir:' || term", _DSIR_BUCKETS)} AS bucket
    FROM (
      SELECT doc_id, source, unnest({_TOKENS_SQL}) AS term
      FROM documents WHERE length(trim(text)) > 0
    )
  ), per_bucket AS (
    SELECT bucket,
           CAST(sum(CASE WHEN source IN ({_DSIR_TARGET_SQL}) THEN 1 ELSE 0 END) AS BIGINT) AS c_t,
           CAST(count(*) AS BIGINT) AS c_r
    FROM tok GROUP BY 1
  ), totals AS (
    SELECT CAST(sum(CASE WHEN source IN ({_DSIR_TARGET_SQL}) THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
           CAST(count(*) AS BIGINT) AS n_r
    FROM tok
  ), lam AS (
    SELECT bucket,
           CAST(floor(ln((c_t + 1) / (n_t + {_DSIR_BUCKETS})) * 1000000 + 0.5) AS BIGINT)
         - CAST(floor(ln((c_r + 1) / (n_r + {_DSIR_BUCKETS})) * 1000000 + 0.5) AS BIGINT)
           AS lam_e6
    FROM per_bucket CROSS JOIN totals
  )
  SELECT doc_id, source,
         source IN ({_DSIR_TARGET_SQL}) AS is_target,
         CAST(count(*) AS BIGINT) AS n_tok,
         CAST(sum(lam_e6) AS BIGINT) AS weight_e6
  FROM tok JOIN lam USING (bucket)
  GROUP BY doc_id, source
  ORDER BY weight_e6 DESC, doc_id ASC
  LIMIT {_DSIR_TOP}
"""


# ---------------------------------------------------------------------------
# 3. Bigram document perplexity filter (the CCNet/KenLM shape)
# ---------------------------------------------------------------------------

_PPL_WORST = 15


def llm_bigram_doc_ppl_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document cross-entropy under the corpus BIGRAM language
    model with add-V smoothing: p(w2|w1) = (c(w1 w2)+1)/(c(w1)+V) —
    the CCNet perplexity filter (Wenzek et al. '19) with the corpus
    itself as the LM. Every log-probability is an integer micro-nat
    (per-term floor), so per-doc sums are exact; xent_e6(doc) =
    (-sum lp_e6) DIV n_bigrams. Emits the 15 WORST documents (the
    removal candidates), xent DESC with doc_id tiebreak.

    Scale shape: bigrams via zip_with over the token array (no
    self-join); bigram-keyed LM agg; unigram-keyed denominator agg;
    two equi-joins back; doc agg; global top-15. The 1-row vocabulary
    size is the whitelisted broadcast.
    """
    docs = load_table(spark, sf_dir, "documents").where(
        is_nonblank(F.col("text"))
    )
    t = tokens(F.col("text"))
    n = F.size(t)
    with_bigrams = docs.select(
        "doc_id",
        "source",
        t.alias("toks"),
        F.when(
            n >= 2,
            F.zip_with(
                F.slice(t, 1, n - 1),
                F.slice(t, 2, n - 1),
                lambda x, y: F.concat_ws(" ", x, y),
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("bigrams"),
    )
    uni = with_bigrams.select(F.explode("toks").alias("w1")).groupBy("w1").agg(
        F.count(F.lit(1)).cast("long").alias("c1")
    )
    vocab = uni.agg(F.count(F.lit(1)).cast("long").alias("v"))
    bg = with_bigrams.select(
        "doc_id", "source", F.explode("bigrams").alias("bigram")
    ).withColumn("w1", F.split(F.col("bigram"), " ").getItem(0))
    c2 = bg.groupBy("bigram").agg(F.count(F.lit(1)).cast("long").alias("c2"))
    lp = (
        bg.join(c2, "bigram")
        .join(uni, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            "source",
            F.floor(
                F.log((F.col("c2") + 1) / (F.col("c1") + F.col("v")))
                * 1000000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("lp_e6"),
        )
    )
    per_doc = lp.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.expr("(-sum(lp_e6)) DIV count(1)").cast("long").alias("xent_e6"),
    )
    return (
        per_doc.orderBy(F.col("xent_e6").desc(), F.col("doc_id").asc())
        .limit(_PPL_WORST)
        .select("doc_id", "source", "n_bigrams", "xent_e6")
    )


_PPL_ORACLE = f"""
  WITH base AS (
    SELECT doc_id, source, {_TOKENS_SQL} AS toks
    FROM documents WHERE length(trim(text)) > 0
  ), uni AS (
    SELECT w1, CAST(count(*) AS BIGINT) AS c1
    FROM (SELECT unnest(toks) AS w1 FROM base) GROUP BY 1
  ), vocab AS (
    SELECT CAST(count(*) AS BIGINT) AS v FROM uni
  ), bg AS (
    SELECT doc_id, source, bigram,
           string_split(bigram, ' ')[1] AS w1
    FROM (
      SELECT doc_id, source,
             unnest(CASE WHEN len(toks) >= 2
               THEN list_transform(range(1, len(toks)),
                                   i -> toks[i] || ' ' || toks[i + 1])
               ELSE []::VARCHAR[] END) AS bigram
      FROM base
    )
  ), c2 AS (
    SELECT bigram, CAST(count(*) AS BIGINT) AS c2 FROM bg GROUP BY 1
  ), lp AS (
    SELECT doc_id, source,
           CAST(floor(ln((c2 + 1) / (c1 + v)) * 1000000 + 0.5) AS BIGINT)
             AS lp_e6
    FROM bg JOIN c2 USING (bigram) JOIN uni USING (w1) CROSS JOIN vocab
  )
  SELECT doc_id, source,
         CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST((-sum(lp_e6)) // count(*) AS BIGINT) AS xent_e6
  FROM lp GROUP BY doc_id, source
  ORDER BY xent_e6 DESC, doc_id ASC
  LIMIT {_PPL_WORST}
"""


# ---------------------------------------------------------------------------
# 4. C4 rule screen — on synthesized punctuation-bearing pages
# ---------------------------------------------------------------------------

_C4_CHUNK = 8
_C4_MIN_SENTENCES = 3


def text_c4_screen_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C4 cleaning rules (Raffel et al. '20 §2.2) per source:
    keep only lines ending in terminal punctuation, drop lines
    mentioning javascript, drop whole docs with < 3 surviving
    sentences / 'lorem ipsum' / a curly brace. The raw documents carry
    no punctuation, so pages are SYNTHESIZED deterministically (the
    roundfourteen device, stated identically in the oracle): 8-token
    sentences with terminal punctuation keyed by (doc_id + i) % 5
    (variant 0 gets NO terminal — the dropped-line case) plus
    javascript / lorem-ipsum / curly-brace boilerplate lines injected
    on doc_id % 7 / % 11 / % 13.

    Scale shape: map-only synthesis + array HOFs (filter/size — no
    explode, the per-doc rule state never leaves the row), then one
    source-keyed agg. Everything is whole-stage-codegen arithmetic.
    """
    docs = load_table(spark, sf_dir, "documents").where(
        is_nonblank(F.col("text"))
    )
    t = tokens(F.col("text"))
    nchunk = F.floor((F.size(t) + F.lit(_C4_CHUNK - 1)) / _C4_CHUNK).cast(
        "int"
    )
    punct = lambda i: F.element_at(  # noqa: E731
        F.array(F.lit(""), F.lit("."), F.lit("!"), F.lit("?"), F.lit(".")),
        ((F.col("doc_id") + i) % 5 + 1).cast("int"),
    )
    sentences = F.transform(
        F.sequence(F.lit(0), nchunk - 1),
        lambda i: F.concat(
            F.array_join(F.slice(t, i * _C4_CHUNK + 1, _C4_CHUNK), " "),
            punct(i),
        ),
    )
    maybe = lambda cond, s: F.when(cond, F.array(F.lit(s))).otherwise(  # noqa: E731
        F.array().cast("array<string>")
    )
    lines = F.concat(
        sentences,
        maybe(
            F.col("doc_id") % 7 == 0,
            "please enable javascript to continue.",
        ),
        maybe(F.col("doc_id") % 11 == 0, "lorem ipsum dolor sit amet."),
        maybe(F.col("doc_id") % 13 == 0, "widget { color red }"),
    )
    ends_punct = lambda l: F.substring(l, -1, 1).isin(".", "!", "?")  # noqa: E731
    has_js = lambda l: F.instr(l, "javascript") > 0  # noqa: E731
    per_doc = docs.select(
        "doc_id",
        "source",
        F.size(lines).cast("long").alias("n_lines"),
        F.size(F.filter(lines, lambda l: ends_punct(l) & ~has_js(l)))
        .cast("long")
        .alias("n_kept_lines"),
        F.size(F.filter(lines, lambda l: ends_punct(l) & has_js(l)))
        .cast("long")
        .alias("n_js_lines"),
        (F.instr(F.array_join(lines, "\n"), "lorem ipsum") > 0).alias(
            "has_lorem"
        ),
        (F.instr(F.array_join(lines, "\n"), "{") > 0).alias("has_brace"),
    ).withColumn(
        "doc_kept",
        (F.col("n_kept_lines") >= _C4_MIN_SENTENCES)
        & ~F.col("has_lorem")
        & ~F.col("has_brace"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.col("doc_kept").cast("long"))
            .cast("long")
            .alias("n_docs_kept"),
            F.sum("n_lines").cast("long").alias("lines_total"),
            F.sum("n_kept_lines").cast("long").alias("lines_kept"),
            F.sum("n_js_lines").cast("long").alias("js_lines"),
            F.sum(F.col("has_lorem").cast("long"))
            .cast("long")
            .alias("lorem_docs"),
            F.sum(F.col("has_brace").cast("long"))
            .cast("long")
            .alias("brace_docs"),
            F.expr(
                "(sum(CAST(doc_kept AS LONG)) * 1000000) DIV count(1)"
            )
            .cast("long")
            .alias("kept_ppm"),
        )
        .orderBy("source")
    )


_C4_ORACLE = f"""
  WITH base AS (
    SELECT doc_id, source, {_TOKENS_SQL} AS toks
    FROM documents WHERE length(trim(text)) > 0
  ), synth AS (
    SELECT doc_id, source,
      list_transform(
        range(0, CAST(floor((len(toks) + {_C4_CHUNK - 1}) / {_C4_CHUNK}.0) AS INT)),
        i -> array_to_string(toks[i*{_C4_CHUNK}+1 : i*{_C4_CHUNK}+{_C4_CHUNK}], ' ')
             || (['', '.', '!', '?', '.'])[CAST((doc_id + i) % 5 AS INT) + 1])
      || CASE WHEN doc_id % 7 = 0
              THEN ['please enable javascript to continue.']
              ELSE []::VARCHAR[] END
      || CASE WHEN doc_id % 11 = 0
              THEN ['lorem ipsum dolor sit amet.'] ELSE []::VARCHAR[] END
      || CASE WHEN doc_id % 13 = 0
              THEN ['widget {{ color red }}'] ELSE []::VARCHAR[] END
      AS lines
    FROM base
  ), per_doc AS (
    SELECT source,
      CAST(len(lines) AS BIGINT) AS n_lines,
      CAST(len(list_filter(lines,
        l -> right(l, 1) IN ('.', '!', '?')
             AND strpos(l, 'javascript') = 0)) AS BIGINT) AS n_kept_lines,
      CAST(len(list_filter(lines,
        l -> right(l, 1) IN ('.', '!', '?')
             AND strpos(l, 'javascript') > 0)) AS BIGINT) AS n_js_lines,
      strpos(array_to_string(lines, chr(10)), 'lorem ipsum') > 0 AS has_lorem,
      strpos(array_to_string(lines, chr(10)), '{{') > 0 AS has_brace
    FROM synth
  ), flagged AS (
    SELECT *,
      (n_kept_lines >= {_C4_MIN_SENTENCES}
       AND NOT has_lorem AND NOT has_brace) AS doc_kept
    FROM per_doc
  )
  SELECT source,
    CAST(count(*) AS BIGINT) AS n_docs,
    CAST(sum(CASE WHEN doc_kept THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_kept,
    CAST(sum(n_lines) AS BIGINT) AS lines_total,
    CAST(sum(n_kept_lines) AS BIGINT) AS lines_kept,
    CAST(sum(n_js_lines) AS BIGINT) AS js_lines,
    CAST(sum(CASE WHEN has_lorem THEN 1 ELSE 0 END) AS BIGINT) AS lorem_docs,
    CAST(sum(CASE WHEN has_brace THEN 1 ELSE 0 END) AS BIGINT) AS brace_docs,
    CAST((sum(CASE WHEN doc_kept THEN 1 ELSE 0 END) * 1000000) // count(*)
         AS BIGINT) AS kept_ppm
  FROM flagged GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# 5. Matryoshka truncation recall — prefix-dim vs full-dim top-k
# ---------------------------------------------------------------------------

_MRL_QUERIES = 10
_MRL_K = 5
_MRL_PREFIX = 16


def sim_matryoshka_recall_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka design check (Kusupati et al. '22): how much of the
    full-dimension top-5 survives when ranking by the first 16 of 64
    dims? Per query vector (vec_id < 10): n_overlap (|full top5 ∩
    prefix top5|) plus both rank-1 neighbor ids. Ranking key is the
    4dp cosine with neighbor-id tiebreak on BOTH rankings (the
    sim_cosine_topk determinism device).

    Scale shape: the 10-query set broadcasts against the corpus twice
    (bounded nested loop, whitelisted — the brute-force anchor); the
    overlap is a (query, neighbor) equi-join of two 50-row sets. At
    scale the prefix ranking is the cheap first pass and the full
    ranking the rerank — this query measures exactly that contract.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", F.col("embedding").alias("e"))
    q = v.where(F.col("vec_id") < _MRL_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )

    def _topk(vec_expr_q, vec_expr_c):
        scored = (
            F.broadcast(q)
            .crossJoin(v.select(F.col("vec_id").alias("neighbor_id"), "e"))
            .where(F.col("query_id") != F.col("neighbor_id"))
            .withColumn(
                "cos4", rnd(cosine_similarity(vec_expr_q, vec_expr_c), 4)
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cos4").desc(), F.col("neighbor_id").asc()
        )
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= _MRL_K)
            .select("query_id", "neighbor_id", "rn")
        )

    full = _topk(F.col("qe"), F.col("e"))
    trunc = _topk(
        F.slice(F.col("qe"), 1, _MRL_PREFIX), F.slice(F.col("e"), 1, _MRL_PREFIX)
    )
    overlap = (
        full.select("query_id", "neighbor_id")
        .join(trunc.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_overlap"))
    )
    top1_full = full.where(F.col("rn") == 1).select(
        "query_id", F.col("neighbor_id").alias("full_top1")
    )
    top1_trunc = trunc.where(F.col("rn") == 1).select(
        "query_id", F.col("neighbor_id").alias("trunc_top1")
    )
    return (
        q.select("query_id")
        .join(overlap, "query_id", "left")
        .join(top1_full, "query_id")
        .join(top1_trunc, "query_id")
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            F.coalesce(F.col("n_overlap"), F.lit(0)).cast("long").alias("n_overlap"),
            F.col("full_top1").cast("long").alias("full_top1"),
            F.col("trunc_top1").cast("long").alias("trunc_top1"),
        )
        .orderBy("query_id")
    )


_MRL_ORACLE = f"""
  WITH v AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
  ), q AS (
    SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < {_MRL_QUERIES}
  ), full_rank AS (
    SELECT query_id, vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos4 DESC, vec_id) AS rn
    FROM (
      SELECT q.query_id, v.vec_id,
             floor(list_dot_product(q.qe, v.e)
               / (sqrt(list_dot_product(q.qe, q.qe))
                  * sqrt(list_dot_product(v.e, v.e)))
               * 10000 + 0.5) / 10000 AS cos4
      FROM q CROSS JOIN v WHERE q.query_id != v.vec_id)
  ), trunc_rank AS (
    SELECT query_id, vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos4 DESC, vec_id) AS rn
    FROM (
      SELECT q.query_id, v.vec_id,
             floor(list_dot_product(q.qe[1:{_MRL_PREFIX}], v.e[1:{_MRL_PREFIX}])
               / (sqrt(list_dot_product(q.qe[1:{_MRL_PREFIX}], q.qe[1:{_MRL_PREFIX}]))
                  * sqrt(list_dot_product(v.e[1:{_MRL_PREFIX}], v.e[1:{_MRL_PREFIX}])))
               * 10000 + 0.5) / 10000 AS cos4
      FROM q CROSS JOIN v WHERE q.query_id != v.vec_id)
  ), f5 AS (SELECT query_id, neighbor_id FROM full_rank WHERE rn <= {_MRL_K}),
  t5 AS (SELECT query_id, neighbor_id FROM trunc_rank WHERE rn <= {_MRL_K}),
  ov AS (
    SELECT query_id, CAST(count(*) AS BIGINT) AS n_overlap
    FROM f5 JOIN t5 USING (query_id, neighbor_id) GROUP BY 1
  )
  SELECT CAST(q.query_id AS BIGINT) AS query_id,
         CAST(coalesce(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
         CAST(f1.neighbor_id AS BIGINT) AS full_top1,
         CAST(t1.neighbor_id AS BIGINT) AS trunc_top1
  FROM q
  LEFT JOIN ov ON ov.query_id = q.query_id
  JOIN (SELECT query_id, neighbor_id FROM full_rank WHERE rn = 1) f1
    ON f1.query_id = q.query_id
  JOIN (SELECT query_id, neighbor_id FROM trunc_rank WHERE rn = 1) t1
    ON t1.query_id = q.query_id
  ORDER BY query_id
"""


# ---------------------------------------------------------------------------
# 6. NB quality classifier — the GPT-3 quality-filter shape
# ---------------------------------------------------------------------------

_NBQ_BUCKETS = 128


def llm_nb_quality_filter_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-3-style quality classifier (Brown et al. '20 App. A trains
    a linear classifier on hashed features to score documents against
    a 'high-quality' reference; here multinomial naive Bayes, trained
    in-query): positive class = lang 'en' docs, features = hashed
    token buckets (md5 % 128), add-one smoothing. Per-bucket weight
    lw_e6 = e6(ln p(b|hq)) - e6(ln p(b|lq)) (each ln floored to
    micro-nats separately), doc margin = prior_e6 + sum of lw_e6 over
    occurrences, predict hq when margin >= 0. Emits the one-row
    confusion matrix + accuracy ppm — the calibration readout before
    the filter is applied to the raw corpus.

    Scale shape: token explode -> 128-bucket agg (bounded) -> bucket
    equi-join back -> doc agg -> single-row confusion agg. The 1-row
    totals/priors are the whitelisted broadcasts.
    """
    docs = load_table(spark, sf_dir, "documents").where(
        is_nonblank(F.col("text"))
    )
    labeled = docs.withColumn("is_hq", (F.col("lang") == "en"))
    tok = labeled.select(
        "doc_id", "is_hq", F.explode(tokens(F.col("text"))).alias("term")
    ).withColumn(
        "bucket",
        _md5_bucket(F.concat(F.lit("nbq:"), F.col("term")), _NBQ_BUCKETS),
    )
    per_bucket = tok.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_hq"), 1).otherwise(0))
        .cast("long")
        .alias("c_hq"),
        F.sum(F.when(~F.col("is_hq"), 1).otherwise(0))
        .cast("long")
        .alias("c_lq"),
    )
    totals = tok.agg(
        F.sum(F.when(F.col("is_hq"), 1).otherwise(0)).cast("long").alias("n_hq"),
        F.sum(F.when(~F.col("is_hq"), 1).otherwise(0)).cast("long").alias("n_lq"),
    )
    priors = labeled.agg(
        F.sum(F.when(F.col("is_hq"), 1).otherwise(0)).cast("long").alias("d_hq"),
        F.sum(F.when(~F.col("is_hq"), 1).otherwise(0)).cast("long").alias("d_lq"),
    )
    lw = per_bucket.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.floor(
                F.log((F.col("c_hq") + 1) / (F.col("n_hq") + _NBQ_BUCKETS))
                * 1000000
                + F.lit(0.5)
            ).cast("long")
            - F.floor(
                F.log((F.col("c_lq") + 1) / (F.col("n_lq") + _NBQ_BUCKETS))
                * 1000000
                + F.lit(0.5)
            ).cast("long")
        ).alias("lw_e6"),
    )
    per_doc = (
        tok.join(lw, "bucket")
        .groupBy("doc_id", "is_hq")
        .agg(F.sum("lw_e6").cast("long").alias("sum_lw_e6"))
    )
    scored = per_doc.crossJoin(F.broadcast(priors)).select(
        "doc_id",
        "is_hq",
        (
            F.col("sum_lw_e6")
            + F.floor(
                F.log(F.col("d_hq") / (F.col("d_hq") + F.col("d_lq")))
                * 1000000
                + F.lit(0.5)
            ).cast("long")
            - F.floor(
                F.log(F.col("d_lq") / (F.col("d_hq") + F.col("d_lq")))
                * 1000000
                + F.lit(0.5)
            ).cast("long")
        ).alias("margin_e6"),
    ).withColumn("pred_hq", F.col("margin_e6") >= 0)
    return scored.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("pred_hq") & F.col("is_hq"), 1).otherwise(0))
        .cast("long")
        .alias("tp"),
        F.sum(F.when(F.col("pred_hq") & ~F.col("is_hq"), 1).otherwise(0))
        .cast("long")
        .alias("fp"),
        F.sum(F.when(~F.col("pred_hq") & F.col("is_hq"), 1).otherwise(0))
        .cast("long")
        .alias("fn"),
        F.sum(F.when(~F.col("pred_hq") & ~F.col("is_hq"), 1).otherwise(0))
        .cast("long")
        .alias("tn"),
        F.expr(
            "(sum(CASE WHEN pred_hq = is_hq THEN 1 ELSE 0 END) * 1000000)"
            " DIV count(1)"
        )
        .cast("long")
        .alias("accuracy_ppm"),
    )


_NBQ_ORACLE = f"""
  WITH labeled AS (
    SELECT doc_id, lang = 'en' AS is_hq, text
    FROM documents WHERE length(trim(text)) > 0
  ), tok AS (
    SELECT doc_id, is_hq,
           {_md5_bucket_sql("'nbq:' || term", _NBQ_BUCKETS)} AS bucket
    FROM (
      SELECT doc_id, is_hq, unnest({_TOKENS_SQL}) AS term FROM labeled
    )
  ), per_bucket AS (
    SELECT bucket,
           CAST(sum(CASE WHEN is_hq THEN 1 ELSE 0 END) AS BIGINT) AS c_hq,
           CAST(sum(CASE WHEN is_hq THEN 0 ELSE 1 END) AS BIGINT) AS c_lq
    FROM tok GROUP BY 1
  ), totals AS (
    SELECT CAST(sum(CASE WHEN is_hq THEN 1 ELSE 0 END) AS BIGINT) AS n_hq,
           CAST(sum(CASE WHEN is_hq THEN 0 ELSE 1 END) AS BIGINT) AS n_lq
    FROM tok
  ), priors AS (
    SELECT CAST(sum(CASE WHEN is_hq THEN 1 ELSE 0 END) AS BIGINT) AS d_hq,
           CAST(sum(CASE WHEN is_hq THEN 0 ELSE 1 END) AS BIGINT) AS d_lq
    FROM labeled
  ), lw AS (
    SELECT bucket,
           CAST(floor(ln((c_hq + 1) / (n_hq + {_NBQ_BUCKETS})) * 1000000 + 0.5) AS BIGINT)
         - CAST(floor(ln((c_lq + 1) / (n_lq + {_NBQ_BUCKETS})) * 1000000 + 0.5) AS BIGINT)
           AS lw_e6
    FROM per_bucket CROSS JOIN totals
  ), per_doc AS (
    SELECT doc_id, is_hq,
           CAST(sum(lw_e6) AS BIGINT) AS sum_lw_e6
    FROM tok JOIN lw USING (bucket) GROUP BY doc_id, is_hq
  ), scored AS (
    SELECT doc_id, is_hq,
           sum_lw_e6
           + CAST(floor(ln(d_hq / (d_hq + d_lq)) * 1000000 + 0.5) AS BIGINT)
           - CAST(floor(ln(d_lq / (d_hq + d_lq)) * 1000000 + 0.5) AS BIGINT)
           >= 0 AS pred_hq,
           is_hq AS actual
    FROM per_doc CROSS JOIN priors
  )
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
    CAST(sum(CASE WHEN pred_hq AND actual THEN 1 ELSE 0 END) AS BIGINT) AS tp,
    CAST(sum(CASE WHEN pred_hq AND NOT actual THEN 1 ELSE 0 END) AS BIGINT) AS fp,
    CAST(sum(CASE WHEN NOT pred_hq AND actual THEN 1 ELSE 0 END) AS BIGINT) AS fn,
    CAST(sum(CASE WHEN NOT pred_hq AND NOT actual THEN 1 ELSE 0 END) AS BIGINT) AS tn,
    CAST((sum(CASE WHEN pred_hq = actual THEN 1 ELSE 0 END) * 1000000)
         // count(*) AS BIGINT) AS accuracy_ppm
  FROM scored
"""


PENDING: tuple[PendingQuery, ...] = (
    PendingQuery(
        "sim_semdedup",
        sim_semdedup_query,
        _SEMDEDUP_ORACLE,
        tags=("similarity", "semdedup", "embedding", "cluster-local",
              "integer-exact"),
    ),
    PendingQuery(
        "llm_dsir_weights",
        llm_dsir_weights_query,
        _DSIR_ORACLE,
        tags=("llmops", "dsir", "importance-sampling", "md5",
              "micro-nats", "integer-exact"),
    ),
    PendingQuery(
        "llm_bigram_doc_ppl",
        llm_bigram_doc_ppl_query,
        _PPL_ORACLE,
        tags=("llmops", "perplexity-filter", "bigram-lm", "micro-nats",
              "integer-exact"),
    ),
    PendingQuery(
        "text_c4_screen",
        text_c4_screen_query,
        _C4_ORACLE,
        tags=("text", "c4", "quality-screen", "synthesis",
              "integer-exact"),
    ),
    PendingQuery(
        "sim_matryoshka_recall",
        sim_matryoshka_recall_query,
        _MRL_ORACLE,
        tags=("similarity", "matryoshka", "truncation", "recall",
              "integer-exact"),
    ),
    PendingQuery(
        "llm_nb_quality_filter",
        llm_nb_quality_filter_query,
        _NBQ_ORACLE,
        tags=("llmops", "quality-classifier", "naive-bayes", "md5",
              "micro-nats", "integer-exact"),
    ),
)
