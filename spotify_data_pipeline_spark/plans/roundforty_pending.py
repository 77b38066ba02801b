"""Round-40 declared-query staging area — STAGED FOR ROUND 13 (the
round-12 window is full at exactly 50: 14 NEW + 36 roundsix-closure
DRIFT re-proofs — so these five carry the full kit but are NOT
activated; the staged-ahead pattern of roundthirtyseven/thirtyeight).

Dedup/curation/serving depth, continuing VERDICT r11 item 4's bias:

- **MinHash S-curve tuning**: the SAME 8 min-hashes laid out as
  (8x1), (4x2), (2x4) band configs in one scan — per config the
  bucket census and exact candidate-pair price. The empirical twin
  of the analytic 1-(1-s^r)^b S-curve: which layout this corpus can
  afford BEFORE anyone pays for a pair join.
- **Duplicated-token coverage by source**: the exact number of token
  positions covered by corpus-duplicated 5-shingles, per source —
  overlap-safe (distinct covered positions, not summed span lengths)
  — the yield forecast a surgical substring-removal pass (the
  dedup_substring_spans artifact) is priced by.
- **IVF residual energy**: per fixed-quantizer cell, the exact
  integer squared-L2 residual mass to its centroid — cell population
  says how long a probe takes, residual energy says how USEFUL the
  cell's centroid is; both audits together are the IVF health check.
- **Char-trigram language confusion**: nearest-profile language
  prediction from each language's own top-20 character trigrams,
  scored against the labeled lang column as a confusion census — the
  language-ID heuristic measured instead of assumed.
- **1-bit PQ code balance**: sign-bit product quantization (4
  subspaces x 4 dims -> 4-bit codes), per-subspace code-utilization
  census — unused and overloaded codes are how binary-embedding
  indexes lose recall; the PQ-side sibling of the quantizer balance
  audit.

Per-wave staging module (nothing evidenced imports this file).
Exactness rules as earlier waves: integer arithmetic end-to-end,
md5 device identical on both engines, deterministic tiebreaks.
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

_SHINGLES_SQL = rf"""
      SELECT doc_id, unnest(
        CASE WHEN len(toks) >= 3
             THEN list_distinct(list_transform(range(1, len(toks) - 1),
                                               i -> array_to_string(toks[i:i+2], ' ')))
             ELSE [array_to_string(toks, ' ')] END) AS sh
      FROM (SELECT doc_id, {_TOKENS_SQL} AS toks
            FROM documents WHERE length(trim(text)) > 0)
"""


# ---------------------------------------------------------------------------
# 1. MinHash S-curve tuning
# ---------------------------------------------------------------------------

_SC_HASHES = 8
#: (config name, rows per band) — bands = _SC_HASHES / rows
_SC_CONFIGS = (("b8r1", 1), ("b4r2", 2), ("b2r4", 4))


def dedup_minhash_scurve_tuning_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Empirical S-curve tuning table: one corpus pass computes 8
    min-hashes per doc, then lays them out as 8 bands of 1, 4 bands
    of 2, and 2 bands of 4, and prices each layout from bucket sizes
    alone — total buckets, max width, exact candidate pairs
    sum(c choose 2), and candidate ppm of all-pairs. More rows per
    band moves the S-curve right (fewer, higher-precision
    candidates); this is the measured version of that tradeoff on
    THIS corpus, the number a production near-dedup run is configured
    from. No pair join is ever executed.

    Scale shape: shingle scan -> per-doc 8 min-aggs -> (config, band,
    bucket) census -> one 3-row agg; the config axis is a literal
    explode over already-reduced per-doc rows, and the all-pairs
    denominator rides a 1-row broadcast.
    """
    docs = load_table(spark, sf_dir, "documents").where(is_nonblank(F.col("text")))
    sh = docs.select(
        "doc_id",
        F.explode(F.array_distinct(shingles(tokens(F.col("text")), 3))).alias("sh"),
    )
    mins = sh.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"g{k}:"), F.col("sh")))).alias(f"m{k}")
            for k in range(_SC_HASHES)
        ]
    )
    entries = []
    for cfg, rows in _SC_CONFIGS:
        for band in range(_SC_HASHES // rows):
            entries.append(
                F.struct(
                    F.lit(cfg).alias("cfg"),
                    F.lit(band).cast("long").alias("band"),
                    F.md5(
                        F.concat_ws(
                            "|",
                            *[F.col(f"m{band * rows + j}") for j in range(rows)],
                        )
                    ).alias("bucket"),
                )
            )
    per_bucket = (
        mins.select("doc_id", F.explode(F.array(*entries)).alias("_e"))
        .select(
            F.col("_e.cfg").alias("cfg"),
            F.col("_e.band").alias("band"),
            F.col("_e.bucket").alias("bucket"),
        )
        .groupBy("cfg", "band", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    n = docs.agg(F.count(F.lit(1)).cast("long").alias("_n"))
    pairs = (F.col("c") * (F.col("c") - 1) / 2).cast("long")
    return (
        per_bucket.groupBy("cfg")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
            F.max("c").cast("long").alias("max_width"),
            F.sum(pairs).cast("long").alias("cand_pairs"),
        )
        .crossJoin(F.broadcast(n))
        .select(
            "cfg",
            "n_buckets",
            "max_width",
            "cand_pairs",
            F.expr("(cand_pairs * 1000000) DIV (_n * (_n - 1) DIV 2)")
            .cast("long")
            .alias("cand_ppm_of_all_pairs"),
        )
        .orderBy("cfg")
    )


def _sc_oracle() -> str:
    mins = ",\n             ".join(
        f"min(md5('g{k}:' || sh)) AS m{k}" for k in range(_SC_HASHES)
    )
    entries = []
    for cfg, rows in _SC_CONFIGS:
        for band in range(_SC_HASHES // rows):
            key = " || '|' || ".join(
                f"m{band * rows + j}" for j in range(rows)
            )
            entries.append(f"('{cfg}', CAST({band} AS BIGINT), md5({key}))")
    return rf"""
    WITH s AS ({_SHINGLES_SQL}),
    mins AS (
      SELECT doc_id, {mins}
      FROM s GROUP BY 1
    ), per_band AS (
      SELECT doc_id, e[1]::VARCHAR AS cfg, e[2]::BIGINT AS band,
             e[3]::VARCHAR AS bucket
      FROM mins, unnest([{", ".join(entries)}]) AS u(e)
    ), widths AS (
      SELECT cfg, band, bucket, CAST(count(*) AS BIGINT) AS c
      FROM per_band GROUP BY 1, 2, 3
    ), census AS (
      SELECT cfg,
             CAST(count(*) AS BIGINT) AS n_buckets,
             CAST(max(c) AS BIGINT) AS max_width,
             CAST(sum(c * (c - 1) // 2) AS BIGINT) AS cand_pairs
      FROM widths GROUP BY cfg
    ), tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n
      FROM documents WHERE length(trim(text)) > 0
    )
    SELECT cfg, n_buckets, max_width, cand_pairs,
           CAST((cand_pairs * 1000000) // (n * (n - 1) // 2) AS BIGINT)
             AS cand_ppm_of_all_pairs
    FROM census CROSS JOIN tot
    ORDER BY cfg
    """


# ---------------------------------------------------------------------------
# 2. Duplicated-token coverage by source
# ---------------------------------------------------------------------------

_CV_K = 5


def dedup_dup_token_coverage_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per source, the EXACT fraction of token positions covered by a
    corpus-duplicated 5-shingle — the yield forecast for surgical
    substring removal (dedup_substring_spans emits the removal list;
    this row prices, per source, how many tokens that pass would
    reclaim). Overlap-safe by construction: coverage counts DISTINCT
    covered positions (each duplicated shingle at 0-based pos covers
    pos..pos+4; overlapping shingles never double-count), not summed
    span lengths.

    Scale shape: one posexplode scan, one shingle-keyed dup screen
    (HAVING count >= 2), a semi-join back, a bounded x5 positional
    explode of only the DUPLICATED positions, then per-(doc, position)
    distinct and one source agg. Linear in corpus tokens; the x5
    expansion applies only to duplicated mass.
    """
    docs = load_table(spark, sf_dir, "documents").where(is_nonblank(F.col("text")))
    toks = docs.select(
        "doc_id", "source", tokens(F.col("text")).alias("t")
    ).where(F.size("t") >= _CV_K)
    sh = toks.select(
        "doc_id",
        F.posexplode(shingles(F.col("t"), _CV_K)).alias("pos", "sh"),
    )
    dup_keys = (
        sh.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= 2)
        .select("sh")
    )
    covered = (
        sh.join(dup_keys, "sh", "left_semi")
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("pos"), F.col("pos") + _CV_K - 1)).alias("p"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("cov"))
    )
    per_doc = toks.select(
        "doc_id", "source", F.size("t").cast("long").alias("n_toks")
    ).join(covered, "doc_id", "left")
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_toks").cast("long").alias("total_tokens"),
            F.sum(F.coalesce(F.col("cov"), F.lit(0))).cast("long")
            .alias("covered_tokens"),
        )
        .select(
            "source",
            "n_docs",
            "total_tokens",
            "covered_tokens",
            F.expr("(covered_tokens * 1000000) DIV total_tokens")
            .cast("long")
            .alias("coverage_ppm"),
        )
        .orderBy("source")
    )


_CV_ORACLE = rf"""
  WITH t AS (
    SELECT doc_id, source, {_TOKENS_SQL} AS toks
    FROM documents WHERE length(trim(text)) > 0
  ), f AS (
    SELECT doc_id, source, toks FROM t WHERE len(toks) >= {_CV_K}
  ), s AS (
    SELECT doc_id,
           unnest(range(0, len(toks) - {_CV_K - 1})) AS pos,
           unnest(list_transform(range(1, len(toks) - {_CV_K - 2}),
                                 i -> array_to_string(toks[i:i+{_CV_K - 1}], ' '))) AS sh
    FROM f
  ), dup_keys AS (
    SELECT sh FROM s GROUP BY sh HAVING count(*) >= 2
  ), covered AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS cov FROM (
      SELECT DISTINCT doc_id, pos + off AS p
      FROM s JOIN dup_keys USING (sh)
      CROSS JOIN (SELECT unnest(range(0, {_CV_K})) AS off)
    ) GROUP BY doc_id
  ), per_doc AS (
    SELECT f.doc_id, f.source, CAST(len(f.toks) AS BIGINT) AS n_toks,
           coalesce(c.cov, 0) AS cov
    FROM f LEFT JOIN covered c USING (doc_id)
  )
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_toks) AS BIGINT) AS total_tokens,
         CAST(sum(cov) AS BIGINT) AS covered_tokens,
         CAST((sum(cov) * 1000000) // sum(n_toks) AS BIGINT) AS coverage_ppm
  FROM per_doc GROUP BY source
  ORDER BY source
"""


# ---------------------------------------------------------------------------
# 3. IVF residual energy
# ---------------------------------------------------------------------------

_RE_DIMS = 16
_RE_CELLS = 4  # fixed quantizer: centroids = vectors with vec_id < 4


def sim_ivf_residual_energy_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantization-quality audit of the fixed 4-centroid IVF (the
    sim_ann_ivf_fixed quantizer: centroids are vectors 0..3 on
    e6-quantized 16-dim embeddings): per cell, population, total and
    mean integer squared-L2 residual, and the worst-quantized vector
    (max residual, vec_id tiebreak). Population says how long a probe
    of the cell takes; residual energy says how much the centroid
    actually summarizes it — a cell can be balanced AND useless, which
    population-only audits (sim_quantizer_balance_audit) cannot see.

    Scale shape: one 4-row centroid broadcast, one assign pass
    (integer d2, row_number per vec over 4 candidates), one 4-row agg.
    The argmax rides max(struct(d2, -vec_id)) — no second pass.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    qcols = [
        F.floor(
            F.element_at("embedding", i + 1).cast("double") * 1000000 + F.lit(0.5)
        )
        .cast("long")
        .alias(f"q{i}")
        for i in range(_RE_DIMS)
    ]
    q = emb.select("vec_id", *qcols)
    cents = q.where(F.col("vec_id") < _RE_CELLS).select(
        F.col("vec_id").alias("c_id"),
        *[F.col(f"q{i}").alias(f"cq{i}") for i in range(_RE_DIMS)],
    )
    d2 = None
    for i in range(_RE_DIMS):
        diff = F.col(f"q{i}") - F.col(f"cq{i}")
        term = diff * diff
        d2 = term if d2 is None else d2 + term
    w = Window.partitionBy("vec_id").orderBy(F.col("d2").asc(), F.col("c_id").asc())
    assigned = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("d2", d2.cast("long"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
    )
    return (
        assigned.groupBy(F.col("c_id").alias("cell"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("population"),
            F.sum("d2").cast("long").alias("residual_energy"),
            F.expr("sum(d2) DIV count(1)").cast("long").alias("mean_residual"),
            F.max(F.struct(F.col("d2"), (-F.col("vec_id")).alias("nid"))).alias("_w"),
        )
        .select(
            "cell",
            "population",
            "residual_energy",
            "mean_residual",
            F.col("_w.d2").cast("long").alias("worst_residual"),
            (-F.col("_w.nid")).cast("long").alias("worst_vec_id"),
        )
        .orderBy("cell")
    )


def _re_oracle() -> str:
    q_cols = ", ".join(
        f"CAST(floor(CAST(embedding[{i + 1}] AS DOUBLE) * 1000000 + 0.5)"
        f" AS BIGINT) AS q{i}"
        for i in range(_RE_DIMS)
    )
    d2_ec = " + ".join(
        f"(e.q{i} - c.q{i}) * (e.q{i} - c.q{i})" for i in range(_RE_DIMS)
    )
    return rf"""
    WITH qv AS (SELECT vec_id, {q_cols} FROM embeddings),
    cents AS (SELECT vec_id AS c_id, {", ".join(f"q{i}" for i in range(_RE_DIMS))}
              FROM qv WHERE vec_id < {_RE_CELLS}),
    assigned AS (
      SELECT * FROM (
        SELECT e.vec_id, c.c_id, CAST({d2_ec} AS BIGINT) AS d2,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY ({d2_ec}), c.c_id) AS rn
        FROM qv e CROSS JOIN cents c)
      WHERE rn = 1
    )
    SELECT a.c_id AS cell,
           CAST(count(*) AS BIGINT) AS population,
           CAST(sum(a.d2) AS BIGINT) AS residual_energy,
           CAST(sum(a.d2) // count(*) AS BIGINT) AS mean_residual,
           CAST(max(a.d2) AS BIGINT) AS worst_residual,
           -- worst vector: max d2, min vec_id on ties (the Spark
           -- max(struct(d2, -vec_id)) tiebreak)
           CAST(min(CASE WHEN a.d2 = m.mx THEN a.vec_id END) AS BIGINT)
             AS worst_vec_id
    FROM assigned a
    JOIN (SELECT c_id, max(d2) AS mx FROM assigned GROUP BY 1) m
      USING (c_id)
    GROUP BY 1
    ORDER BY cell
    """


# ---------------------------------------------------------------------------
# 4. Char-trigram language confusion
# ---------------------------------------------------------------------------

_LC_PROFILE_K = 20  # top trigrams kept per language profile


def text_trigram_lang_confusion_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic, measured: build each language's profile
    (its top-20 character trigrams over normalized text, count DESC /
    trigram ASC tiebreak), predict each doc's language as the profile
    sharing the most DISTINCT trigrams with it (overlap count; ties
    broken toward the lexicographically smaller language; docs
    overlapping no profile predict '?'), and emit the confusion census
    (lang, pred_lang, n_docs). The diagonal mass is the heuristic's
    accuracy — measured against the labeled lang column instead of
    assumed.

    Scale shape: trigram explode -> (lang, trigram) agg for profiles
    (per-lang top-k window over the vocabulary-bounded distinct-
    trigram table); the |langs| x 20 profile BROADCASTS to the
    per-doc distinct-trigram scan; per-doc argmax is a max(struct)
    aggregate, no window over the corpus.
    """
    docs = load_table(spark, sf_dir, "documents").where(is_nonblank(F.col("text")))
    norm = F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    # Bind the normalized text once (the shingles() lesson: referencing
    # the regex expression inside the per-trigram lambda would re-run
    # the normalization once per trigram). Guard length < 3: Spark's
    # sequence(1, n) DESCENDS when n < 1.
    tri = (
        docs.select("doc_id", "lang", norm.alias("nt"))
        .where(F.length("nt") >= 3)
        .select(
            "doc_id",
            "lang",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("nt") - 2),
                    lambda i: F.col("nt").substr(i, F.lit(3)),
                )
            ).alias("tg"),
        )
    )
    profiles_src = tri.groupBy("lang", "tg").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    w_p = Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("tg"))
    profiles = (
        profiles_src.withColumn("rn", F.row_number().over(w_p))
        .where(F.col("rn") <= _LC_PROFILE_K)
        .select(F.col("lang").alias("p_lang"), "tg")
    )
    doc_tri = tri.select("doc_id", "lang", "tg").distinct()
    overlaps = (
        doc_tri.join(F.broadcast(profiles), "tg")
        .groupBy("doc_id", "lang", "p_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("ov"))
    )
    # argmax profile per doc: max overlap, lexicographically smaller
    # language on ties — max(struct(ov, neg-ordered lang)) needs a
    # DESCENDING tiebreak on a string, so rank with one row_number
    # over the per-doc candidate set (<= |langs| rows per doc).
    w_a = Window.partitionBy("doc_id").orderBy(
        F.desc("ov"), F.asc("p_lang")
    )
    pred = (
        overlaps.withColumn("rn", F.row_number().over(w_a))
        .where(F.col("rn") == 1)
        .select("doc_id", "lang", F.col("p_lang").alias("pred_lang"))
    )
    labeled = docs.select("doc_id", "lang").join(
        pred.select("doc_id", "pred_lang"), "doc_id", "left"
    )
    return (
        labeled.select(
            "lang", F.coalesce(F.col("pred_lang"), F.lit("?")).alias("pred_lang")
        )
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("lang", "pred_lang")
    )


_LC_ORACLE = rf"""
  WITH d AS (
    SELECT doc_id, lang,
           lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS nt
    FROM documents WHERE length(trim(text)) > 0
  ), tri AS (
    SELECT doc_id, lang,
           unnest(list_transform(range(1, length(nt) - 1),
                                 i -> substr(nt, i, 3))) AS tg
    FROM d WHERE length(nt) >= 3
  ), prof_src AS (
    SELECT lang, tg, CAST(count(*) AS BIGINT) AS c
    FROM tri GROUP BY 1, 2
  ), profiles AS (
    SELECT lang AS p_lang, tg FROM (
      SELECT lang, tg,
             row_number() OVER (PARTITION BY lang ORDER BY c DESC, tg) AS rn
      FROM prof_src
    ) WHERE rn <= {_LC_PROFILE_K}
  ), doc_tri AS (
    SELECT DISTINCT doc_id, lang, tg FROM tri
  ), ovl AS (
    SELECT t.doc_id, t.lang, p.p_lang, CAST(count(*) AS BIGINT) AS ov
    FROM doc_tri t JOIN profiles p USING (tg)
    GROUP BY 1, 2, 3
  ), pred AS (
    SELECT doc_id, lang, p_lang AS pred_lang FROM (
      SELECT doc_id, lang, p_lang,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY ov DESC, p_lang) AS rn
      FROM ovl
    ) WHERE rn = 1
  )
  SELECT d.lang, coalesce(p.pred_lang, '?') AS pred_lang,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM d LEFT JOIN pred p USING (doc_id)
  GROUP BY 1, 2
  ORDER BY d.lang, pred_lang
"""


# ---------------------------------------------------------------------------
# 5. 1-bit PQ code balance
# ---------------------------------------------------------------------------

_PQ_DIMS = 16
_PQ_SUBSPACES = 4
_PQ_SUBDIM = _PQ_DIMS // _PQ_SUBSPACES  # 4 dims -> 4-bit codes, 16 possible


def sim_pq_code_balance_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-utilization census of a 1-bit product quantizer (binary
    embedding): each 16-dim vector splits into 4 subspaces of 4 dims;
    a subspace's code is its 4 sign bits (bit j set iff e6-quantized
    component >= 0), giving 16 possible codes per subspace. Per
    subspace: distinct codes used, population of the fullest code,
    max/mean ppm, and the exact same-code candidate-pair price — a
    subspace whose vectors pile into few codes contributes nothing to
    Hamming discrimination, the binary-index analogue of an
    imbalanced IVF cell (sim_quantizer_balance_audit /
    sim_ivf_residual_energy complete the trio).

    Scale shape: one scan computes all 4 codes per vector (pure bit
    arithmetic), a (subspace, code) census bounded at 4 x 16 rows,
    and a 4-row final agg. Nothing here is ever joined to the corpus.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    entries = []
    for s in range(_PQ_SUBSPACES):
        code = F.lit(0).cast("long")
        for j in range(_PQ_SUBDIM):
            comp = F.floor(
                F.element_at("embedding", s * _PQ_SUBDIM + j + 1).cast("double")
                * 1000000
                + F.lit(0.5)
            ).cast("long")
            code = code + F.when(comp >= 0, F.lit(1 << j).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        entries.append(
            F.struct(F.lit(s).cast("long").alias("subspace"), code.alias("code"))
        )
    codes = emb.select(F.explode(F.array(*entries)).alias("_e")).select(
        F.col("_e.subspace").alias("subspace"), F.col("_e.code").alias("code")
    )
    census = codes.groupBy("subspace", "code").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    pairs = (F.col("c") * (F.col("c") - 1) / 2).cast("long")
    return (
        census.groupBy("subspace")
        .agg(
            F.count(F.lit(1)).cast("long").alias("codes_used"),
            F.max("c").cast("long").alias("max_pop"),
            F.expr("sum(c) DIV count(1)").cast("long").alias("mean_pop"),
            F.sum(pairs).cast("long").alias("same_code_pairs"),
        )
        .select(
            "subspace",
            "codes_used",
            "max_pop",
            "mean_pop",
            F.expr("(max_pop * 1000000) DIV mean_pop")
            .cast("long")
            .alias("imbalance_ppm"),
            "same_code_pairs",
        )
        .orderBy("subspace")
    )


def _pq_oracle() -> str:
    entries = []
    for s in range(_PQ_SUBSPACES):
        bits = " + ".join(
            f"CASE WHEN CAST(floor(CAST(embedding[{s * _PQ_SUBDIM + j + 1}] AS DOUBLE)"
            f" * 1000000 + 0.5) AS BIGINT) >= 0"
            f" THEN CAST({1 << j} AS BIGINT) ELSE 0 END"
            for j in range(_PQ_SUBDIM)
        )
        entries.append(f"(CAST({s} AS BIGINT), CAST({bits} AS BIGINT))")
    return rf"""
    WITH codes AS (
      SELECT e[1]::BIGINT AS subspace, e[2]::BIGINT AS code
      FROM embeddings, unnest([{", ".join(entries)}]) AS u(e)
    ), census AS (
      SELECT subspace, code, CAST(count(*) AS BIGINT) AS c
      FROM codes GROUP BY 1, 2
    )
    SELECT subspace,
           CAST(count(*) AS BIGINT) AS codes_used,
           CAST(max(c) AS BIGINT) AS max_pop,
           CAST(sum(c) // count(*) AS BIGINT) AS mean_pop,
           CAST((max(c) * 1000000) // (sum(c) // count(*)) AS BIGINT)
             AS imbalance_ppm,
           CAST(sum(c * (c - 1) // 2) AS BIGINT) AS same_code_pairs
    FROM census GROUP BY 1
    ORDER BY subspace
    """


PENDING: tuple[PendingQuery, ...] = (
    PendingQuery(
        "dedup_minhash_scurve_tuning",
        dedup_minhash_scurve_tuning_query,
        _sc_oracle(),
        tags=("dedup", "lsh", "tuning", "integer-exact"),
    ),
    PendingQuery(
        "dedup_dup_token_coverage",
        dedup_dup_token_coverage_query,
        _CV_ORACLE,
        tags=("dedup", "substring", "yield", "integer-exact"),
    ),
    PendingQuery(
        "sim_ivf_residual_energy",
        sim_ivf_residual_energy_query,
        _re_oracle(),
        tags=("sim", "ivf", "residual", "audit", "integer-exact"),
    ),
    PendingQuery(
        "text_trigram_lang_confusion",
        text_trigram_lang_confusion_query,
        _LC_ORACLE,
        tags=("text", "langid", "confusion", "integer-exact"),
    ),
    PendingQuery(
        "sim_pq_code_balance",
        sim_pq_code_balance_query,
        _pq_oracle(),
        tags=("sim", "pq", "binary", "audit", "integer-exact"),
    ),
)

#: documented 1-row / bounded broadcast assemblies (read by
#: tools/plan_audit.py; migrate into test_plan_hygiene's whitelist at
#: activation): scurve = 1-row corpus-count broadcast under the ppm
#: denominator; residual_energy = 4-row fixed-centroid broadcast
#: crossJoin (the sim_ann_ivf_fixed anchor pattern).
_BNLJ_OK = ("dedup_minhash_scurve_tuning", "sim_ivf_residual_energy")
