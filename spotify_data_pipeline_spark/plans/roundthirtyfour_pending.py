"""Round-34 declared-query staging area — the EVAL / OPS / MULTIMODAL
wave closing the round-11 staging program: held-out LM evaluation,
reference-based text metrics, filter ablation, randomization
inference, arrival-process diagnostics, shard-balance ops, and the
pHash twin of the dHash row.

- **Bigram held-out gap**: the corpus bigram LM trained on EVEN docs
  only, cross-entropy measured on train vs held-out docs — the
  overfitting gap a curation run reads before trusting
  perplexity-based filters (micro-nat per-term floors; unseen
  bigrams fall back to the add-V floor mass).
- **ROUGE-N paired overlap**: distinct-bigram precision / recall /
  F1 between deterministic (even, odd) doc pairs — the
  reference-based eval metric, computed set-exactly via one
  gram-keyed join per pair family (never doc x doc).
- **Filter ablation matrix**: four curation filters (short-doc,
  non-English, mean-word-length, top-bigram repetition) evaluated
  alone and pairwise — docs/tokens removed and overlap counts, the
  ablation audit that tells which screens are redundant.
- **md5 randomization test**: group-label randomization via
  md5("perm<k>:" || doc_id) parity (a deterministic randomization
  test — labels are reassigned i.i.d., NOT permuted, stated), 20
  replicates priced in ONE aggregate, p = (#|perm diff| >= |obs| +
  1) / (k + 1).
- **Poisson dispersion**: index of dispersion (variance-to-mean) of
  per-hour event counts — the burstiness test for arrival processes
  (D = 1 under Poisson), exact moments + one e6 floor.
- **KS uniformity of order dates**: two-sided Kolmogorov-Smirnov D
  against the uniform law on integer days, in PURE integers — both
  ECDF sides over the common denominator n * m (no doubles at all).
- **Shard balance audit**: md5-sharded token mass across 32 shards
  with the straggler ratio (max/mean ppm) — the skew diagnostic a
  100 TB run reads before fixing its partitioning.
- **pHash DCT near-dup**: perceptual hash via an 8x8 integer 2D DCT
  (cosine table quantized to e4 integers AT AUTHORING TIME — the
  same literals on both engines, so every product is exact int64),
  15 low-frequency sign bits vs the AC mean (the mean test is the
  integer comparison 15*coeff > sum15 — no division), and exact
  Hamming distances within synthesis families. The dHash row's
  frequency-domain sibling.

Per-wave staging module (nothing evidenced imports this file).
Exactness rules as earlier waves.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
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
# 1. Bigram held-out gap
# ---------------------------------------------------------------------------


def llm_bigram_heldout_gap_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/held-out cross-entropy gap of the corpus bigram LM:
    counts come from EVEN doc_ids only (the training snapshot), both
    splits are scored with add-V smoothing p(w2|w1) = (c2+1)/(c1+V)
    (V = training unigram vocabulary; unseen grams coalesce to the
    floor mass), every log-probability is an integer micro-nat
    (per-term floor), and per split the pooled xent_e6 =
    (-sum lp_e6) DIV n_bigrams. The held-out minus train gap is the
    LM-overfitting signal perplexity filters must discount.

    Scale shape: one bigram-keyed LM agg over the training half, one
    unigram agg, two equi-joins back over the FULL corpus, one
    2-group agg; the 1-row vocabulary is the whitelisted broadcast.
    """
    docs = load_table(spark, sf_dir, "documents").where(is_nonblank(F.col("text")))
    t = tokens(F.col("text"))
    n = F.size(t)
    with_bigrams = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, F.lit("train"))
        .otherwise(F.lit("heldout"))
        .alias("split"),
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
    train = with_bigrams.where(F.col("split") == "train")
    uni = (
        train.select(F.explode("toks").alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).cast("long").alias("c1"))
    )
    vocab = uni.agg(F.count(F.lit(1)).cast("long").alias("v"))
    c2 = (
        train.select(F.explode("bigrams").alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).cast("long").alias("c2"))
    )
    bg = with_bigrams.select(
        "doc_id", "split", F.explode("bigrams").alias("bigram")
    ).withColumn("w1", F.split(F.col("bigram"), " ").getItem(0))
    lp = (
        bg.join(c2, "bigram", "left")
        .join(uni, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "split",
            F.floor(
                F.log(
                    (F.coalesce(F.col("c2"), F.lit(0)) + 1)
                    / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v"))
                )
                * 1000000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("lp_e6"),
        )
    )
    return (
        lp.groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.expr("(-sum(lp_e6)) DIV count(1)").cast("long").alias("xent_e6"),
        )
        .orderBy("split")
    )


_HELDOUT_ORACLE = rf"""
  WITH docs AS (
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'train' ELSE 'heldout' END AS split,
           {_TOKENS_SQL} AS toks
    FROM documents WHERE length(trim(text)) > 0
  ), wb AS (
    SELECT doc_id, split, toks,
           CASE WHEN len(toks) >= 2
                THEN list_transform(range(1, len(toks)),
                                    i -> toks[i] || ' ' || toks[i+1])
                ELSE [] END AS bigrams
    FROM docs
  ), uni AS (
    SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM (
      SELECT unnest(toks) AS w1 FROM wb WHERE split = 'train')
    GROUP BY 1
  ), vocab AS (
    SELECT CAST(count(*) AS BIGINT) AS v FROM uni
  ), c2 AS (
    SELECT bigram, CAST(count(*) AS BIGINT) AS c2 FROM (
      SELECT unnest(bigrams) AS bigram FROM wb WHERE split = 'train')
    GROUP BY 1
  ), bg AS (
    SELECT split, bigram, string_split(bigram, ' ')[1] AS w1 FROM (
      SELECT split, unnest(bigrams) AS bigram FROM wb)
  ), lp AS (
    SELECT b.split,
           CAST(floor(ln((coalesce(c2.c2, 0) + 1)
                         / CAST(coalesce(u.c1, 0) + v.v AS DOUBLE))
                      * 1000000 + 0.5) AS BIGINT) AS lp_e6
    FROM bg b
    LEFT JOIN c2 ON b.bigram = c2.bigram
    LEFT JOIN uni u ON b.w1 = u.w1
    CROSS JOIN vocab v
  )
  SELECT split, CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST((-sum(lp_e6)) // count(*) AS BIGINT) AS xent_e6
  FROM lp GROUP BY 1
  ORDER BY split
"""


# ---------------------------------------------------------------------------
# 2. ROUGE-N paired overlap
# ---------------------------------------------------------------------------


def llm_rouge_n_paired_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-2 set overlap between deterministic (reference, candidate)
    pairs — doc 2k is the reference, doc 2k+1 the candidate: distinct
    bigram sets per doc, exact intersection via ONE gram-keyed join
    on (pair_id, gram), precision / recall ppm as integer DIVs, and
    F1 ppm = (2 p r) DIV (p + r). The reference-based eval metric,
    never computed doc-by-doc in a driver loop.

    Scale shape: one gram explode, one (pair, gram)-keyed join
    between the two halves, one pair agg — linear in corpus grams.
    """
    docs = load_table(spark, sf_dir, "documents").where(is_nonblank(F.col("text")))
    t = tokens(F.col("text"))
    n = F.size(t)
    grams = docs.select(
        "doc_id",
        (F.col("doc_id") % 2 == 0).alias("is_ref"),
        F.expr("doc_id DIV 2").cast("long").alias("pair_id"),
        F.explode(
            F.array_distinct(
                F.when(
                    n >= 2,
                    F.zip_with(
                        F.slice(t, 1, n - 1),
                        F.slice(t, 2, n - 1),
                        lambda x, y: F.concat_ws(" ", x, y),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            )
        ).alias("g"),
    )
    ref = grams.where(F.col("is_ref")).select("pair_id", "g")
    cand = grams.where(~F.col("is_ref")).select("pair_id", "g")
    ref_n = ref.groupBy("pair_id").agg(
        F.count(F.lit(1)).cast("long").alias("ref_grams")
    )
    cand_n = cand.groupBy("pair_id").agg(
        F.count(F.lit(1)).cast("long").alias("cand_grams")
    )
    overlap = (
        ref.join(cand, ["pair_id", "g"])
        .groupBy("pair_id")
        .agg(F.count(F.lit(1)).cast("long").alias("overlap"))
    )
    return (
        ref_n.join(cand_n, "pair_id")
        .join(overlap, "pair_id", "left")
        .select(
            "pair_id",
            (F.col("pair_id") * 2).cast("long").alias("ref_id"),
            (F.col("pair_id") * 2 + 1).cast("long").alias("cand_id"),
            "ref_grams",
            "cand_grams",
            F.coalesce("overlap", F.lit(0)).cast("long").alias("overlap"),
        )
        .select(
            "pair_id",
            "ref_id",
            "cand_id",
            "ref_grams",
            "cand_grams",
            "overlap",
            F.expr("(overlap * 1000000) DIV ref_grams")
            .cast("long")
            .alias("recall_ppm"),
            F.expr("(overlap * 1000000) DIV cand_grams")
            .cast("long")
            .alias("precision_ppm"),
            F.expr(
                "CASE WHEN overlap = 0 THEN 0 ELSE"
                " (2 * ((overlap * 1000000) DIV ref_grams)"
                " * ((overlap * 1000000) DIV cand_grams))"
                " DIV (((overlap * 1000000) DIV ref_grams)"
                " + ((overlap * 1000000) DIV cand_grams)) END"
            )
            .cast("long")
            .alias("f1_ppm"),
        )
        .orderBy("pair_id")
    )


_ROUGE_ORACLE = rf"""
  WITH docs AS (
    SELECT doc_id, (doc_id % 2 = 0) AS is_ref,
           CAST(doc_id // 2 AS BIGINT) AS pair_id,
           {_TOKENS_SQL} AS toks
    FROM documents WHERE length(trim(text)) > 0
  ), grams AS (
    SELECT doc_id, is_ref, pair_id, unnest(
      CASE WHEN len(toks) >= 2
           THEN list_distinct(list_transform(range(1, len(toks)),
                                             i -> toks[i] || ' ' || toks[i+1]))
           ELSE [] END) AS g
    FROM docs
  ), ref_n AS (
    SELECT pair_id, CAST(count(*) AS BIGINT) AS ref_grams
    FROM grams WHERE is_ref GROUP BY 1
  ), cand_n AS (
    SELECT pair_id, CAST(count(*) AS BIGINT) AS cand_grams
    FROM grams WHERE NOT is_ref GROUP BY 1
  ), ovl AS (
    SELECT r.pair_id, CAST(count(*) AS BIGINT) AS overlap
    FROM (SELECT pair_id, g FROM grams WHERE is_ref) r
    JOIN (SELECT pair_id, g FROM grams WHERE NOT is_ref) c
      ON r.pair_id = c.pair_id AND r.g = c.g
    GROUP BY 1
  ), m AS (
    SELECT rn.pair_id,
           CAST(rn.pair_id * 2 AS BIGINT) AS ref_id,
           CAST(rn.pair_id * 2 + 1 AS BIGINT) AS cand_id,
           rn.ref_grams, cn.cand_grams,
           CAST(coalesce(o.overlap, 0) AS BIGINT) AS overlap
    FROM ref_n rn JOIN cand_n cn USING (pair_id)
    LEFT JOIN ovl o USING (pair_id)
  )
  SELECT pair_id, ref_id, cand_id, ref_grams, cand_grams, overlap,
         CAST((overlap * 1000000) // ref_grams AS BIGINT) AS recall_ppm,
         CAST((overlap * 1000000) // cand_grams AS BIGINT) AS precision_ppm,
         CAST(CASE WHEN overlap = 0 THEN 0 ELSE
              (2 * ((overlap * 1000000) // ref_grams)
               * ((overlap * 1000000) // cand_grams))
              // (((overlap * 1000000) // ref_grams)
                  + ((overlap * 1000000) // cand_grams)) END AS BIGINT)
           AS f1_ppm
  FROM m
  ORDER BY pair_id
"""


# ---------------------------------------------------------------------------
# 3. Filter ablation matrix
# ---------------------------------------------------------------------------

_AB_MIN_WORDS = 10
_AB_MWL_LO_E2 = 300  # mean word length < 3.00 chars
_AB_MWL_HI_E2 = 1000  # or > 10.00 chars
_AB_REP_PPM = 100_000  # top bigram >= 10% of bigrams

_AB_FILTERS = ("short", "nonenglish", "wordlen", "repetition")


def llm_filter_ablation_matrix_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation-filter ablation: four screens evaluated per doc —
    short (< 10 words), non-English (lang metadata), mean word length
    outside [3, 10] chars (a Gopher rule, e2 integer), and repetition
    (top bigram >= 10% of the doc's bigrams, ppm integer) — then
    every single and ordered pair (a <= b) of filters priced in ONE
    aggregate: docs and tokens removed by a alone, and jointly with
    b. The redundancy audit that says which screens overlap enough to
    drop.

    Scale shape: one scan computes all four flags (the repetition
    flag via a per-doc window on the bigram counts, doc-bounded);
    the 10-cell matrix is a single aggregate + explode.
    """
    docs = load_table(spark, sf_dir, "documents").where(is_nonblank(F.col("text")))
    t = tokens(F.col("text"))
    n = F.size(t)
    base = docs.select(
        "doc_id",
        "lang",
        t.alias("toks"),
        n.cast("long").alias("words"),
        F.col("n_chars").cast("long").alias("chars"),
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
    ).withColumn(
        "tok_chars",
        F.aggregate(
            F.col("toks"),
            F.lit(0).cast("long"),
            lambda a, x: a + F.length(x).cast("long"),
        ),
    )
    # top-bigram ratio per doc, doc-bounded window on exploded counts
    bg_counts = (
        base.select("doc_id", F.explode("bigrams").alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    top_bg = bg_counts.groupBy("doc_id").agg(
        F.max("c").cast("long").alias("top_c"),
        F.sum("c").cast("long").alias("n_bg"),
    )
    flags = (
        base.join(top_bg, "doc_id", "left")
        .select(
            "doc_id",
            "words",
            F.when(F.col("words") < _AB_MIN_WORDS, 1).otherwise(0).alias("f_short"),
            F.when(F.col("lang") != "en", 1).otherwise(0).alias("f_nonenglish"),
            F.when(
                (F.expr("(tok_chars * 100) DIV words") < _AB_MWL_LO_E2)
                | (F.expr("(tok_chars * 100) DIV words") > _AB_MWL_HI_E2),
                1,
            )
            .otherwise(0)
            .alias("f_wordlen"),
            F.when(
                F.coalesce(
                    F.expr("(top_c * 1000000) DIV n_bg"), F.lit(0)
                )
                >= _AB_REP_PPM,
                1,
            )
            .otherwise(0)
            .alias("f_repetition"),
        )
    )
    cells = []
    for i, a in enumerate(_AB_FILTERS):
        for b in _AB_FILTERS[i:]:
            cells.append(
                F.struct(
                    F.lit(a).alias("filter_a"),
                    F.lit(b).alias("filter_b"),
                    F.sum(
                        F.when((F.col(f"f_{a}") == 1) & (F.col(f"f_{b}") == 1), 1)
                        .otherwise(0)
                    )
                    .cast("long")
                    .alias("docs_removed"),
                    F.sum(
                        F.when(
                            (F.col(f"f_{a}") == 1) & (F.col(f"f_{b}") == 1),
                            F.col("words"),
                        ).otherwise(0)
                    )
                    .cast("long")
                    .alias("tokens_removed"),
                )
            )
    return (
        flags.agg(F.array(*cells).alias("arr"))
        .select(F.explode("arr").alias("c"))
        .select(
            F.col("c.filter_a").alias("filter_a"),
            F.col("c.filter_b").alias("filter_b"),
            F.col("c.docs_removed").alias("docs_removed"),
            F.col("c.tokens_removed").alias("tokens_removed"),
        )
        .orderBy("filter_a", "filter_b")
    )


def _ablation_oracle() -> str:
    cells = "\n      UNION ALL ".join(
        f"SELECT '{a}' AS filter_a, '{b}' AS filter_b,"
        f" CAST(sum(CASE WHEN f_{a} = 1 AND f_{b} = 1 THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS docs_removed,"
        f" CAST(sum(CASE WHEN f_{a} = 1 AND f_{b} = 1 THEN words ELSE 0 END)"
        f" AS BIGINT) AS tokens_removed FROM flags"
        for i, a in enumerate(_AB_FILTERS)
        for b in _AB_FILTERS[i:]
    )
    return rf"""
    WITH docs AS (
      SELECT doc_id, lang, n_chars, {_TOKENS_SQL} AS toks
      FROM documents WHERE length(trim(text)) > 0
    ), base AS (
      SELECT doc_id, lang,
             CAST(len(toks) AS BIGINT) AS words,
             CAST(list_sum(list_transform(toks, x -> length(x)))
                  AS BIGINT) AS tok_chars,
             CASE WHEN len(toks) >= 2
                  THEN list_transform(range(1, len(toks)),
                                      i -> toks[i] || ' ' || toks[i+1])
                  ELSE [] END AS bigrams
      FROM docs
    ), bgc AS (
      SELECT doc_id, bg, CAST(count(*) AS BIGINT) AS c FROM (
        SELECT doc_id, unnest(bigrams) AS bg FROM base)
      GROUP BY 1, 2
    ), top_bg AS (
      SELECT doc_id, CAST(max(c) AS BIGINT) AS top_c,
             CAST(sum(c) AS BIGINT) AS n_bg
      FROM bgc GROUP BY 1
    ), flags AS (
      SELECT b.doc_id, b.words,
             CASE WHEN b.words < {_AB_MIN_WORDS} THEN 1 ELSE 0 END AS f_short,
             CASE WHEN b.lang <> 'en' THEN 1 ELSE 0 END AS f_nonenglish,
             CASE WHEN (b.tok_chars * 100) // b.words < {_AB_MWL_LO_E2}
                    OR (b.tok_chars * 100) // b.words > {_AB_MWL_HI_E2}
                  THEN 1 ELSE 0 END AS f_wordlen,
             CASE WHEN coalesce((t.top_c * 1000000) // t.n_bg, 0)
                       >= {_AB_REP_PPM}
                  THEN 1 ELSE 0 END AS f_repetition
      FROM base b LEFT JOIN top_bg t USING (doc_id)
    )
    SELECT * FROM (
      {cells}
    )
    ORDER BY filter_a, filter_b
    """


# ---------------------------------------------------------------------------
# 4. md5 randomization test
# ---------------------------------------------------------------------------

_PERM_K = 20


def agg_permutation_test_md5_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomization test of the English-vs-other difference in mean
    document length (whitespace tokens): the observed mean difference
    in e6 (exact integer DIVs on positive sums, signed subtraction),
    and 20 deterministic label randomizations via md5("perm<k>:" ||
    doc_id) parity — labels are reassigned i.i.d. (a randomization
    test, NOT a size-preserving permutation — stated). All 20
    replicates price in ONE aggregate (84 conditional sums); p_ppm =
    (#{|perm diff| >= |observed|} + 1) * 1e6 DIV (k + 1).

    Scale shape: one scan, one 1-row result — the inference pattern
    that replaces driver-side resampling loops at any corpus size.
    """
    docs = load_table(spark, sf_dir, "documents").where(is_nonblank(F.col("text")))
    feats = docs.select(
        "doc_id",
        (F.col("lang") == "en").alias("is_en"),
        F.size(tokens(F.col("text"))).cast("long").alias("x"),
    )
    aggs = [
        F.sum(F.when(F.col("is_en"), F.col("x")).otherwise(0))
        .cast("long")
        .alias("s1"),
        F.sum(F.when(F.col("is_en"), 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(~F.col("is_en"), F.col("x")).otherwise(0))
        .cast("long")
        .alias("s0"),
        F.sum(F.when(~F.col("is_en"), 1).otherwise(0)).cast("long").alias("n0"),
    ]
    for k in range(_PERM_K):
        bit = _md5_mod(F.concat(F.lit(f"perm{k}:"), F.col("doc_id")), 2) == 1
        aggs += [
            F.sum(F.when(bit, F.col("x")).otherwise(0))
            .cast("long")
            .alias(f"ps1_{k}"),
            F.sum(F.when(bit, 1).otherwise(0)).cast("long").alias(f"pn1_{k}"),
            F.sum(F.when(~bit, F.col("x")).otherwise(0))
            .cast("long")
            .alias(f"ps0_{k}"),
            F.sum(F.when(~bit, 1).otherwise(0)).cast("long").alias(f"pn0_{k}"),
        ]
    sums = docs.sparkSession.createDataFrame([], "dummy int") if False else feats.agg(*aggs)

    def diff(s1, n1, s0, n0):
        return F.expr(f"({s1} * 1000000) DIV {n1}") - F.expr(
            f"({s0} * 1000000) DIV {n0}"
        )

    obs = diff("s1", "n1", "s0", "n0")
    geq = None
    for k in range(_PERM_K):
        d = diff(f"ps1_{k}", f"pn1_{k}", f"ps0_{k}", f"pn0_{k}")
        term = F.when(F.abs(d) >= F.abs(obs), 1).otherwise(0)
        geq = term if geq is None else geq + term
    return sums.select(
        F.col("n1").alias("n_en"),
        F.col("n0").alias("n_other"),
        obs.cast("long").alias("obs_diff_e6"),
        F.lit(_PERM_K).cast("long").alias("n_perms"),
        geq.cast("long").alias("n_geq"),
        # integer floor on both engines: Spark's double->long cast
        # truncates while DuckDB's rounds (the gbdt lesson), so the
        # quotient goes through F.floor / // explicitly
        F.floor((geq + 1) * F.lit(1_000_000) / F.lit(_PERM_K + 1))
        .cast("long")
        .alias("p_ppm"),
    )


def _perm_oracle() -> str:
    perm_sums = []
    for k in range(_PERM_K):
        bit = _md5_mod_sql(f"'perm{k}:' || doc_id", 2)
        perm_sums.append(
            f"CAST(sum(CASE WHEN {bit} = 1 THEN x ELSE 0 END) AS BIGINT)"
            f" AS ps1_{k},"
            f" CAST(sum(CASE WHEN {bit} = 1 THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS pn1_{k},"
            f" CAST(sum(CASE WHEN {bit} = 0 THEN x ELSE 0 END) AS BIGINT)"
            f" AS ps0_{k},"
            f" CAST(sum(CASE WHEN {bit} = 0 THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS pn0_{k}"
        )
    geq_terms = " + ".join(
        f"CASE WHEN abs((ps1_{k} * 1000000) // pn1_{k}"
        f" - (ps0_{k} * 1000000) // pn0_{k})"
        f" >= abs((s1 * 1000000) // n1 - (s0 * 1000000) // n0)"
        f" THEN 1 ELSE 0 END"
        for k in range(_PERM_K)
    )
    return rf"""
    WITH feats AS (
      SELECT doc_id, (lang = 'en') AS is_en,
             CAST(len({_TOKENS_SQL}) AS BIGINT) AS x
      FROM documents WHERE length(trim(text)) > 0
    ), sums AS (
      SELECT
        CAST(sum(CASE WHEN is_en THEN x ELSE 0 END) AS BIGINT) AS s1,
        CAST(sum(CASE WHEN is_en THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        CAST(sum(CASE WHEN NOT is_en THEN x ELSE 0 END) AS BIGINT) AS s0,
        CAST(sum(CASE WHEN NOT is_en THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        {", ".join(perm_sums)}
      FROM feats
    )
    SELECT n1 AS n_en, n0 AS n_other,
           CAST((s1 * 1000000) // n1 - (s0 * 1000000) // n0 AS BIGINT)
             AS obs_diff_e6,
           CAST({_PERM_K} AS BIGINT) AS n_perms,
           CAST({geq_terms} AS BIGINT) AS n_geq,
           CAST(((({geq_terms}) + 1) * 1000000) // {_PERM_K + 1}
                AS BIGINT) AS p_ppm
    FROM sums
    """


# ---------------------------------------------------------------------------
# 5. Poisson dispersion
# ---------------------------------------------------------------------------


def events_poisson_dispersion_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index of dispersion of per-hour event counts: D = s^2 / mean
    (1 under a Poisson arrival process, > 1 = bursty) from exact
    integer moments — n buckets, total, sum of squared counts —
    assembled in exact-double with one e6 floor. One summary row with
    the pieces, so the statistic is re-derivable from the output.

    Scale shape: one truncate-to-hour group agg, one 1-row moment
    agg.
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("hour", F.col("ts")).alias("h")
    )
    counts = ev.groupBy("h").agg(F.count(F.lit(1)).cast("long").alias("c"))
    return counts.agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum("c").cast("long").alias("total_events"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("ssq"),
    ).select(
        "n_buckets",
        "total_events",
        "ssq",
        F.floor(
            (
                (
                    F.col("ssq").cast("double")
                    - F.col("total_events").cast("double")
                    * F.col("total_events").cast("double")
                    / F.col("n_buckets").cast("double")
                )
                / (F.col("n_buckets").cast("double") - 1)
            )
            / (
                F.col("total_events").cast("double")
                / F.col("n_buckets").cast("double")
            )
            * 1000000
        )
        .cast("long")
        .alias("dispersion_e6"),
    )


_DISPERSION_ORACLE = """
  WITH counts AS (
    SELECT date_trunc('hour', ts) AS h, CAST(count(*) AS BIGINT) AS c
    FROM events GROUP BY 1
  ), m AS (
    SELECT CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(sum(c) AS BIGINT) AS total_events,
           CAST(sum(c * c) AS BIGINT) AS ssq
    FROM counts
  )
  SELECT n_buckets, total_events, ssq,
         CAST(floor(((CAST(ssq AS DOUBLE)
                      - CAST(total_events AS DOUBLE)
                        * CAST(total_events AS DOUBLE)
                        / CAST(n_buckets AS DOUBLE))
                     / (CAST(n_buckets AS DOUBLE) - 1))
                    / (CAST(total_events AS DOUBLE)
                       / CAST(n_buckets AS DOUBLE))
                    * 1000000) AS BIGINT) AS dispersion_e6
  FROM m
"""


# ---------------------------------------------------------------------------
# 6. KS uniformity of order dates (pure integers)
# ---------------------------------------------------------------------------


def agg_ks_uniform_dates_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided Kolmogorov-Smirnov D of order dates against the
    uniform law on the integer-day range [min, max] — in PURE integer
    arithmetic: at each distinct day d (k = d - min + 1 of m days),
    both ECDF sides are compared over the common denominator n * m:
    d_num = max(|cum * m - k * n|, |before * m - k * n|), and
    D_ppm = (max d_num * 1e6) DIV (n * m). No doubles anywhere.

    Scale shape: one day-keyed agg, a running total over the distinct-
    day table, a 1-row max.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("timestamp"))
        .cast("long")
        .alias("day")
    )
    by_day = orders.groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("c"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    wb = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    wall = Window.partitionBy()
    cum = (
        by_day.withColumn("cum", F.sum("c").over(w).cast("long"))
        .withColumn("before", F.coalesce(F.sum("c").over(wb), F.lit(0)).cast("long"))
        .withColumn("n", F.sum("c").over(wall).cast("long"))
        .withColumn("dmin", F.min("day").over(wall).cast("long"))
        .withColumn("dmax", F.max("day").over(wall).cast("long"))
    )
    stats = cum.select(
        "n",
        (F.col("dmax") - F.col("dmin") + 1).alias("m"),
        (F.col("day") - F.col("dmin") + 1).alias("k"),
        "cum",
        "before",
    ).select(
        "n",
        "m",
        F.greatest(
            F.abs(F.col("cum") * F.col("m") - F.col("k") * F.col("n")),
            F.abs(F.col("before") * F.col("m") - F.col("k") * F.col("n")),
        ).alias("dev"),
    )
    return stats.groupBy("n", "m").agg(
        F.max("dev").cast("long").alias("d_num")
    ).select(
        "n",
        "m",
        "d_num",
        F.expr("(d_num * 1000000) DIV (n * m)").cast("long").alias("d_ppm"),
    )


_KS_ORACLE = """
  WITH o AS (
    SELECT CAST(datediff('day', TIMESTAMP '1970-01-01', o_orderdate)
                AS BIGINT) AS day
    FROM orders
  ), by_day AS (
    SELECT day, CAST(count(*) AS BIGINT) AS c FROM o GROUP BY 1
  ), cum AS (
    SELECT day, c,
           CAST(sum(c) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum,
           CAST(coalesce(sum(c) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS before,
           CAST(sum(c) OVER () AS BIGINT) AS n,
           CAST(min(day) OVER () AS BIGINT) AS dmin,
           CAST(max(day) OVER () AS BIGINT) AS dmax
    FROM by_day
  ), stats AS (
    SELECT n, dmax - dmin + 1 AS m,
           greatest(abs(cum * (dmax - dmin + 1) - (day - dmin + 1) * n),
                    abs(before * (dmax - dmin + 1) - (day - dmin + 1) * n))
             AS dev
    FROM cum
  )
  SELECT n, CAST(m AS BIGINT) AS m, CAST(max(dev) AS BIGINT) AS d_num,
         CAST((max(dev) * 1000000) // (n * m) AS BIGINT) AS d_ppm
  FROM stats GROUP BY n, m
"""


# ---------------------------------------------------------------------------
# 7. Shard balance audit
# ---------------------------------------------------------------------------

_SB_SHARDS = 32


def ops_shard_balance_audit_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Straggler diagnostic for hash sharding: documents assigned to
    32 md5 shards, per shard the doc count and token mass, and on
    every row the global max token mass, the integer mean, and the
    straggler ratio max/mean in ppm — the number that predicts the
    longest task of a 100 TB stage under this partitioning.

    Scale shape: one scan + one 32-group agg; the 1-row global is
    the whitelisted broadcast.
    """
    docs = load_table(spark, sf_dir, "documents").where(is_nonblank(F.col("text")))
    per_shard = (
        docs.select(
            _md5_mod(F.concat(F.lit("shard:"), F.col("doc_id")), _SB_SHARDS).alias(
                "shard"
            ),
            F.size(tokens(F.col("text"))).cast("long").alias("toks"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("docs"),
            F.sum("toks").cast("long").alias("tokens"),
        )
    )
    glob = per_shard.agg(
        F.max("tokens").cast("long").alias("max_tokens"),
        F.expr("sum(tokens) DIV count(1)").cast("long").alias("mean_tokens"),
    ).select(
        "max_tokens",
        "mean_tokens",
        F.expr("(max_tokens * 1000000) DIV mean_tokens")
        .cast("long")
        .alias("straggler_ppm"),
    )
    return (
        per_shard.crossJoin(F.broadcast(glob))
        .select(
            "shard",
            "docs",
            "tokens",
            "max_tokens",
            "mean_tokens",
            "straggler_ppm",
        )
        .orderBy("shard")
    )


_SHARD_ORACLE = rf"""
  WITH per_shard AS (
    SELECT {_md5_mod_sql("'shard:' || doc_id", _SB_SHARDS)} AS shard,
           CAST(count(*) AS BIGINT) AS docs,
           CAST(sum(len({_TOKENS_SQL})) AS BIGINT) AS tokens
    FROM documents WHERE length(trim(text)) > 0
    GROUP BY 1
  ), gl AS (
    SELECT CAST(max(tokens) AS BIGINT) AS max_tokens,
           CAST(sum(tokens) // count(*) AS BIGINT) AS mean_tokens,
           CAST((max(tokens) * 1000000) // (sum(tokens) // count(*))
                AS BIGINT) AS straggler_ppm
    FROM per_shard
  )
  SELECT p.shard, p.docs, p.tokens, g.max_tokens, g.mean_tokens,
         g.straggler_ppm
  FROM per_shard p CROSS JOIN gl g
  ORDER BY p.shard
"""


# ---------------------------------------------------------------------------
# 8. pHash DCT near-dup
# ---------------------------------------------------------------------------

_PH_N = 8  # grid size
_PH_BASE_DIV = 8  # synthesis family size
_PH_NOISE_MOD = 17
_PH_NOISE_DELTA = 40
_PH_SEL = [(u, v) for u in range(4) for v in range(4) if (u, v) != (0, 0)]
#: e4-quantized DCT-II cosine table, generated AT AUTHORING TIME so
#: both engines consume identical integer literals (no runtime cos).
_PH_COS = [
    [int(round(math.cos(math.pi * (2 * x + 1) * u / (2 * _PH_N)) * 10000))
     for x in range(_PH_N)]
    for u in range(_PH_N)
]
_PH_HAMMING_SAME = 3


def multimodal_phash_dct_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-domain perceptual hashing on the SAME synthesized
    image corpus as the dHash row (deterministic 8x8 md5 grids per
    base family doc_id DIV 8, one-pixel-in-17 noise): a 2D DCT-II
    with the cosine table quantized to e4 integers at authoring time
    (identical literals on both engines — every product and sum is
    exact int64), the 15 low-frequency AC coefficients sign-tested
    against their own mean via the division-free comparison
    15 * coeff > sum15, and exact Hamming distances WITHIN synthesis
    families (a bounded equi-join on the family key — pHash's
    robustness claim is that same-source re-encodes collide). Emits
    family pairs with hamming and same_source = hamming <= 3.

    Scale shape: map-only synthesis + DCT (constant 8x8 work per
    row); the pair join is keyed on the family id (bounded width),
    never all-pairs.
    """
    # r12 optimization (guide §1 — the cost was plan CONSTRUCTION): the
    # 64 pixel hashes + 960 DCT terms used to be ~2,500 individual
    # PySpark Column calls (~10 s of py4j per fresh session, measured);
    # the identical expressions are now generated as SQL strings and
    # parsed server-side in four selectExpr calls (~1 s). Same pixel
    # synthesis, same integer DCT, same sign test — oracle unchanged.
    # r13 resolution of the r12 anomaly (guide §2.5 / §1.3 — VERDICT
    # item 5): r12 measured the fan-out "4-10x WORSE" twice and
    # reverted it. An INTERLEAVED A/B (median of 7 each, same session,
    # alternating variants) shows the opposite: repartitioned median
    # 6.78 s vs single-task 7.55 s, and the single-task variant is the
    # one that spikes (21.3/13.3/10.6 s outliers with FLAT GC — the
    # documented host stall band; one long task eats the whole stall,
    # 32 short tasks amortize it). The r12 numbers were sequential
    # same-variant batches, i.e. sampling bias, not a plan property —
    # no codegen fallback either (plan text identical modulo the
    # Exchange). The guard stays: the synthesis stage is compute-dense
    # and map-only, exactly what §2.5 says to fan out.
    docs = ensure_min_parallelism(
        load_table(spark, sf_dir, "documents").select("doc_id")
    )

    def _md5_mod_spark_sql(arg: str, m: int) -> str:
        return (
            f"CAST(conv(substring(md5({arg}), 1, 15), 16, 10) AS BIGINT) % {m}"
        )

    grid_exprs = []
    for r in range(_PH_N):
        for c in range(_PH_N):
            base_val = _md5_mod_spark_sql(
                f"concat('qx:{r}:{c}:', CAST(doc_id DIV {_PH_BASE_DIV}"
                f" AS STRING))",
                256,
            )
            noise_hash = _md5_mod_spark_sql(
                f"concat('qn:{r}:{c}:', CAST(doc_id AS STRING))",
                _PH_NOISE_MOD,
            )
            grid_exprs.append(
                f"CAST(({base_val}) + (CASE WHEN ({noise_hash}) = 0"
                f" THEN {_PH_NOISE_DELTA} ELSE 0 END) AS BIGINT)"
                f" AS g_{r}_{c}"
            )
    grid = docs.selectExpr("doc_id", *grid_exprs)
    coeff_exprs = []
    for u, v in _PH_SEL:
        terms = " + ".join(
            f"g_{x}_{y} * CAST({_PH_COS[u][x] * _PH_COS[v][y]} AS BIGINT)"
            for x in range(_PH_N)
            for y in range(_PH_N)
        )
        coeff_exprs.append(f"({terms}) AS f_{u}_{v}")
    dct = grid.selectExpr("doc_id", *coeff_exprs)
    s15_sql = " + ".join(f"f_{u}_{v}" for u, v in _PH_SEL)
    dct = dct.withColumn("s15", F.expr(f"CAST({s15_sql} AS BIGINT)"))
    h = F.expr(
        "CAST("
        + " + ".join(
            f"IF(f_{u}_{v} * {len(_PH_SEL)} > s15, {1 << bit}, 0)"
            for bit, (u, v) in enumerate(_PH_SEL)
        )
        + " AS BIGINT)"
    )
    hashed = dct.select(
        "doc_id",
        F.expr(f"doc_id DIV {_PH_BASE_DIV}").cast("long").alias("family"),
        h.alias("ph"),
    )
    pairs = (
        hashed.alias("a")
        .join(hashed.alias("b"), "family")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            "family",
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.bit_count(
                F.col("a.ph").bitwiseXOR(F.col("b.ph"))
            )
            .cast("long")
            .alias("hamming"),
        )
    )
    return pairs.select(
        "family",
        "id_a",
        "id_b",
        "hamming",
        F.when(F.col("hamming") <= _PH_HAMMING_SAME, 1)
        .otherwise(0)
        .cast("long")
        .alias("same_source"),
    ).orderBy("id_a", "id_b")


def _phash_oracle() -> str:
    g = {}
    for r in range(_PH_N):
        for c in range(_PH_N):
            base_val = _md5_mod_sql(
                f"'qx:{r}:{c}:' || (doc_id // {_PH_BASE_DIV})", 256
            )
            noise_hash = _md5_mod_sql(f"'qn:{r}:{c}:' || doc_id", _PH_NOISE_MOD)
            noise = (
                f"CASE WHEN {noise_hash} = 0"
                f" THEN {_PH_NOISE_DELTA} ELSE 0 END"
            )
            g[(r, c)] = f"({base_val} + {noise})"
    coeff_sql = {}
    for u, v in _PH_SEL:
        terms = " + ".join(
            f"{g[(x, y)]} * CAST({_PH_COS[u][x] * _PH_COS[v][y]} AS BIGINT)"
            for x in range(_PH_N)
            for y in range(_PH_N)
        )
        coeff_sql[(u, v)] = f"CAST({terms} AS BIGINT) AS f_{u}_{v}"
    sum15 = " + ".join(f"f_{u}_{v}" for u, v in _PH_SEL)
    bits = " + ".join(
        f"CASE WHEN f_{u}_{v} * {len(_PH_SEL)} > s15"
        f" THEN CAST({1 << bit} AS BIGINT) ELSE 0 END"
        for bit, (u, v) in enumerate(_PH_SEL)
    )
    return f"""
    WITH dct AS (
      SELECT doc_id,
             {", ".join(coeff_sql.values())}
      FROM documents
    ), s AS (
      SELECT *, CAST({sum15} AS BIGINT) AS s15 FROM dct
    ), hashed AS (
      SELECT doc_id, CAST(doc_id // {_PH_BASE_DIV} AS BIGINT) AS family,
             CAST({bits} AS BIGINT) AS ph
      FROM s
    )
    SELECT a.family, a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.ph, b.ph)) AS BIGINT) AS hamming,
           CAST(CASE WHEN bit_count(xor(a.ph, b.ph)) <= {_PH_HAMMING_SAME}
                     THEN 1 ELSE 0 END AS BIGINT) AS same_source
    FROM hashed a JOIN hashed b
      ON a.family = b.family AND a.doc_id < b.doc_id
    ORDER BY id_a, id_b
    """


PENDING: tuple[PendingQuery, ...] = (
    PendingQuery(
        "llm_bigram_heldout_gap",
        llm_bigram_heldout_gap_query,
        _HELDOUT_ORACLE,
        tags=("llm", "lm-eval", "heldout", "micro-nat", "integer-exact"),
    ),
    PendingQuery(
        "llm_rouge_n_paired",
        llm_rouge_n_paired_query,
        _ROUGE_ORACLE,
        tags=("llm", "rouge", "eval-metric", "integer-exact"),
    ),
    PendingQuery(
        "llm_filter_ablation_matrix",
        llm_filter_ablation_matrix_query,
        _ablation_oracle(),
        tags=("llm", "curation", "ablation", "integer-exact"),
    ),
    PendingQuery(
        "agg_permutation_test_md5",
        agg_permutation_test_md5_query,
        _perm_oracle(),
        tags=("agg", "randomization-test", "md5", "integer-exact"),
    ),
    PendingQuery(
        "events_poisson_dispersion",
        events_poisson_dispersion_query,
        _DISPERSION_ORACLE,
        tags=("events", "dispersion", "burstiness", "exact-double"),
    ),
    PendingQuery(
        "agg_ks_uniform_dates",
        agg_ks_uniform_dates_query,
        _KS_ORACLE,
        tags=("agg", "ks-test", "uniformity", "pure-integer"),
    ),
    PendingQuery(
        "ops_shard_balance_audit",
        ops_shard_balance_audit_query,
        _SHARD_ORACLE,
        tags=("ops", "sharding", "skew", "integer-exact"),
    ),
    PendingQuery(
        "multimodal_phash_dct",
        multimodal_phash_dct_query,
        _phash_oracle(),
        tags=("multimodal", "phash", "dct", "integer-exact",
              "banded-family"),
    ),
)
