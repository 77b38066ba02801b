"""Round-31 declared-query staging area — the POST-BACKLOG dedup &
curation depth wave (NOTES_r10 §9 item 5 executed): the operators a
100 TB training-data pipeline runs between crawl snapshots.

- **Substring-run dedup** (the SQL-expressible core of suffix-array
  substring dedup, Lee et al. 2022 "Deduplicating Training Data
  Makes Language Models Better"): a doc-level deterministic
  approximation — k-token shingles with positions, corpus-duplicated
  shingles (freq >= 2 anywhere, including within-doc repeats), and
  per-doc maximal runs of consecutive duplicated positions; a run of
  r shingles is a duplicated substring of r+k-1 tokens. Exact
  integers throughout.
- **Cross-snapshot incremental MinHash**: the two-crawl dedup join —
  signatures for OLD (even doc_id) and NEW (odd doc_id) snapshots,
  banded candidates restricted to NEW x OLD only (never NEW x NEW /
  OLD x OLD: the incremental property that makes re-crawls linear in
  the new data, not quadratic in the corpus).
- **MinHash merge == rebuild**: the mergeability law that lets 100 TB
  shard signatures union without rescanning — signature(A u B) =
  elementwise min(sig(A), sig(B)), pinned per doc by splitting its
  shingle set in half and comparing merged vs rebuilt.
- **LSH + Levenshtein verify**: the two-stage near-dup pipeline —
  banded MinHash candidates (capped buckets), then exact edit
  distance on the normalized text of candidate pairs ONLY (the
  verify stage is linear in candidates, never corpus-quadratic).
- **Domain-mix water-filling**: exact integer water-filling of a
  token budget across sources under per-domain epoch caps — the
  data-mixture allocation a curation run solves before training.
- **Dedup impact by source**: the curation audit table — exact-dup
  removal rates per source (which domains shrink when the corpus is
  deduplicated).
- **Shard n-gram saturation**: diminishing-returns curve — new
  distinct 3-grams contributed by each additional shard (min-shard
  ownership device: ONE distinct-gram aggregate, no per-shard
  rescans).
- **Logistic distillation, one exact Fisher step**: the quality-
  classifier distillation step as exact arithmetic — from w = 0 the
  IRLS/Fisher update is w = 2 (X'X)^-1 X't with t = 2y-1 (the
  sigmoid is exactly 1/2 and the weight matrix exactly I/4), so the
  first step needs NO transcendentals; weights floored to e6 and
  predictions scored with the quantized weights (the PQ-style
  quantize-then-serve device).

Per-wave staging module (nothing evidenced imports this file).
Exactness rules as earlier waves: integer ppm via DIV/`//`, BIGINT
casts, DECIMAL(38,0) second moments, exact-double assembly (int64
inputs < 2^53) with a single terminal floor, md5 head-15 device for
hash splits, deterministic tiebreaks everywhere.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.functions.text import (
    is_nonblank,
    normalize_whitespace,
    shingles,
    tokens,
)
from spotify_data_pipeline_spark.io import load_table


@dataclass(frozen=True)
class PendingQuery:
    name: str
    fn: object
    oracle: str | None
    headline: bool = False
    tags: tuple[str, ...] = ()


_TOKENS_SQL = "string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')"

#: DuckDB's md5() hex head as the true 60-bit integer (the corrected
#: 16^14 device — see roundtwentyfour_pending for the derivation).
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
# 1. Substring-run dedup (suffix-array-style, doc-level approximation)
# ---------------------------------------------------------------------------

_SUB_K = 5  # shingle length (tokens)
_SUB_FLAG_TOKENS = 15  # flag docs with a duplicated substring this long


def dedup_substring_runs_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-level substring dedup via duplicated-shingle runs: every
    5-token shingle WITH its position, shingles occurring >= 2 times
    anywhere in the corpus (within-doc repeats count — substring
    dedup removes self-repetition too), and per-doc maximal runs of
    consecutive duplicated positions (islands: pos - row_number is
    constant within a run). A run of r shingles is a duplicated
    substring of r + 4 tokens; docs whose longest run reaches 15
    tokens are flagged. This is the deterministic SQL-expressible
    core of suffix-array substring dedup (the suffix array finds the
    same maximal duplicated spans; the shingle lattice quantizes
    their boundaries to token positions).

    Scale shape: one posexplode scan, one shingle-keyed count (the
    only corpus-wide shuffle, equi-keyed and combinable), a semi-join
    back, and per-DOC windows (bounded by document length, never
    corpus-wide). No pairwise joins anywhere — cost is linear in
    corpus tokens at any scale.
    """
    docs = load_table(spark, sf_dir, "documents").where(is_nonblank(F.col("text")))
    toks = docs.select("doc_id", tokens(F.col("text")).alias("t")).where(
        F.size("t") >= _SUB_K
    )
    sh = toks.select(
        "doc_id",
        F.posexplode(shingles(F.col("t"), _SUB_K)).alias("pos", "sh"),
    )
    dup_keys = (
        sh.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= 2)
        .select("sh")
    )
    dup_pos = sh.join(dup_keys, "sh", "left_semi")
    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = (
        dup_pos.withColumn("isl", F.col("pos") - F.row_number().over(w))
        .groupBy("doc_id", "isl")
        .agg(F.count(F.lit(1)).cast("long").alias("run_len"))
    )
    per_doc = runs.groupBy("doc_id").agg(
        F.max("run_len").cast("long").alias("max_run"),
        F.sum("run_len").cast("long").alias("dup_shingles"),
    )
    base = sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_shingles")
    )
    return (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce(F.col("dup_shingles"), F.lit(0)).cast("long").alias(
                "dup_shingles"
            ),
            F.when(F.col("max_run").isNull(), F.lit(0))
            .otherwise(F.col("max_run") + (_SUB_K - 1))
            .cast("long")
            .alias("max_dup_run_tokens"),
            F.expr(
                "(coalesce(dup_shingles, 0) * 1000000) DIV n_shingles"
            )
            .cast("long")
            .alias("dup_ppm"),
            F.when(
                F.coalesce(F.col("max_run"), F.lit(0)) + (_SUB_K - 1)
                >= _SUB_FLAG_TOKENS,
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("flagged"),
        )
        .orderBy("doc_id")
    )


_SUBSTR_ORACLE = rf"""
  WITH t AS (
    SELECT doc_id, {_TOKENS_SQL} AS toks
    FROM documents WHERE length(trim(text)) > 0
  ), f AS (
    SELECT doc_id, toks FROM t WHERE len(toks) >= {_SUB_K}
  ), s AS (
    SELECT doc_id,
           unnest(range(1, len(toks) - {_SUB_K - 2})) AS pos,
           unnest(list_transform(range(1, len(toks) - {_SUB_K - 2}),
                                 i -> array_to_string(toks[i:i+{_SUB_K - 1}], ' '))) AS sh
    FROM f
  ), dup_keys AS (
    SELECT sh FROM s GROUP BY sh HAVING count(*) >= 2
  ), dup_pos AS (
    SELECT s.doc_id, s.pos FROM s JOIN dup_keys USING (sh)
  ), runs AS (
    SELECT doc_id,
           pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS isl
    FROM dup_pos
  ), r2 AS (
    SELECT doc_id, isl, CAST(count(*) AS BIGINT) AS run_len
    FROM runs GROUP BY 1, 2
  ), per_doc AS (
    SELECT doc_id, CAST(max(run_len) AS BIGINT) AS max_run,
           CAST(sum(run_len) AS BIGINT) AS dup_shingles
    FROM r2 GROUP BY 1
  ), base AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles FROM s GROUP BY 1
  )
  SELECT b.doc_id, b.n_shingles,
         CAST(coalesce(p.dup_shingles, 0) AS BIGINT) AS dup_shingles,
         CAST(CASE WHEN p.max_run IS NULL THEN 0
                   ELSE p.max_run + {_SUB_K - 1} END AS BIGINT)
           AS max_dup_run_tokens,
         CAST((coalesce(p.dup_shingles, 0) * 1000000) // b.n_shingles
              AS BIGINT) AS dup_ppm,
         CAST(CASE WHEN coalesce(p.max_run, 0) + {_SUB_K - 1}
                        >= {_SUB_FLAG_TOKENS}
                   THEN 1 ELSE 0 END AS BIGINT) AS flagged
  FROM base b LEFT JOIN per_doc p USING (doc_id)
  ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# 2. Cross-snapshot incremental MinHash
# ---------------------------------------------------------------------------

_XS_K = 8  # signature components == bands (r=1, high-recall regime)
_XS_CAP = 50  # band-bucket width cap per snapshot side


def dedup_cross_snapshot_minhash_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental cross-snapshot near-dup screen: OLD snapshot = even
    doc_id, NEW = odd (a deterministic stand-in for two crawl dates).
    Per doc an 8-component MinHash signature (lexicographic min of
    md5('c<k>:' || shingle) over distinct 3-token shingles — identical
    cross-engine), banded r=1/b=8, and candidates ONLY from NEW-side
    band rows joined to OLD-side band rows on (band, key) — never
    NEW x NEW or OLD x OLD. Per candidate the signature match count
    and exact-integer Jaccard estimate (matches * 125000 ppm).

    Scale shape: the incremental property — each re-crawl pays
    |NEW| x bucket-collision cost, not |corpus|^2; bucket widths
    capped at 50 PER SIDE; every join equi-keyed on (band, key).
    """
    docs = load_table(spark, sf_dir, "documents").where(is_nonblank(F.col("text")))
    sh = docs.select(
        "doc_id",
        F.explode(F.array_distinct(shingles(tokens(F.col("text")), 3))).alias("sh"),
    )
    mins = [
        F.min(F.md5(F.concat(F.lit(f"c{k}:"), F.col("sh")))).alias(f"h{k}")
        for k in range(_XS_K)
    ]
    sig = (
        sh.groupBy("doc_id")
        .agg(*mins)
        .select(
            "doc_id",
            (F.col("doc_id") % 2 == 1).alias("is_new"),
            F.array(*[f"h{k}" for k in range(_XS_K)]).alias("sig"),
        )
    )
    bands = sig.select(
        "doc_id",
        "is_new",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), F.col("sig")[b].alias("key"))
                    for b in range(_XS_K)
                ]
            )
        ).alias("_bk"),
    ).select("doc_id", "is_new", F.col("_bk.band").alias("band"), F.col("_bk.key").alias("key"))
    widths = bands.groupBy("band", "key").agg(
        F.sum(F.when(F.col("is_new"), 1).otherwise(0)).alias("w_new"),
        F.sum(F.when(F.col("is_new"), 0).otherwise(1)).alias("w_old"),
    )
    keep = widths.where(
        (F.col("w_new") >= 1)
        & (F.col("w_old") >= 1)
        & (F.col("w_new") <= _XS_CAP)
        & (F.col("w_old") <= _XS_CAP)
    ).select("band", "key")
    kept = bands.join(keep, ["band", "key"], "left_semi")
    pairs = (
        kept.where(F.col("is_new"))
        .select("band", "key", F.col("doc_id").alias("id_new"))
        .join(
            kept.where(~F.col("is_new")).select(
                "band", "key", F.col("doc_id").alias("id_old")
            ),
            ["band", "key"],
        )
        .select("id_new", "id_old")
        .distinct()
    )
    matches = F.aggregate(
        F.zip_with(
            F.col("sa"), F.col("sb"), lambda x, y: F.when(x == y, 1).otherwise(0)
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return (
        pairs.join(
            sig.select(F.col("doc_id").alias("id_new"), F.col("sig").alias("sa")),
            "id_new",
        )
        .join(
            sig.select(F.col("doc_id").alias("id_old"), F.col("sig").alias("sb")),
            "id_old",
        )
        .select(
            "id_new",
            "id_old",
            matches.cast("long").alias("sig_matches"),
            (matches * F.lit(1_000_000 // _XS_K)).cast("long").alias(
                "est_jaccard_ppm"
            ),
        )
        .orderBy("id_new", "id_old")
    )


def _cross_snapshot_oracle() -> str:
    min_cols = ",\n             ".join(
        f"min(md5('c{k}:' || sh)) AS h{k}" for k in range(_XS_K)
    )
    sig_list = ", ".join(f"h{k}" for k in range(_XS_K))
    band_rows = "\n      UNION ALL ".join(
        f"SELECT doc_id, is_new, {b} AS band, h{b} AS key FROM m" for b in range(_XS_K)
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
    ), m AS (
      SELECT doc_id, (doc_id % 2 = 1) AS is_new,
             {min_cols}
      FROM s GROUP BY 1, 2
    ), sig AS (
      SELECT doc_id, [{sig_list}] AS sg FROM m
    ), bands AS (
      {band_rows}
    ), widths AS (
      SELECT band, key,
             sum(CASE WHEN is_new THEN 1 ELSE 0 END) AS w_new,
             sum(CASE WHEN is_new THEN 0 ELSE 1 END) AS w_old
      FROM bands GROUP BY 1, 2
    ), keep AS (
      SELECT band, key FROM widths
      WHERE w_new BETWEEN 1 AND {_XS_CAP} AND w_old BETWEEN 1 AND {_XS_CAP}
    ), kept AS (
      SELECT b.doc_id, b.is_new, b.band, b.key
      FROM bands b JOIN keep k ON b.band = k.band AND b.key = k.key
    ), pairs AS (
      SELECT DISTINCT n.doc_id AS id_new, o.doc_id AS id_old
      FROM kept n JOIN kept o
        ON n.band = o.band AND n.key = o.key
       AND n.is_new AND NOT o.is_new
    )
    SELECT p.id_new, p.id_old,
           CAST(len(list_filter(range(1, {_XS_K + 1}),
                                i -> za.sg[i] = zb.sg[i])) AS BIGINT)
             AS sig_matches,
           CAST(len(list_filter(range(1, {_XS_K + 1}),
                                i -> za.sg[i] = zb.sg[i]))
                * {1_000_000 // _XS_K} AS BIGINT) AS est_jaccard_ppm
    FROM pairs p
    JOIN sig za ON p.id_new = za.doc_id
    JOIN sig zb ON p.id_old = zb.doc_id
    ORDER BY p.id_new, p.id_old
    """


# ---------------------------------------------------------------------------
# 3. MinHash merge == rebuild (mergeability law)
# ---------------------------------------------------------------------------

_MR_K = 8


def dedup_minhash_merge_rebuild_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mergeability pin for MinHash signatures: split each doc's
    distinct 3-shingle set into two halves by md5 parity, build an
    8-component signature per half, merge as the elementwise min
    (empty halves contribute a 'z' sentinel > any md5 hex), and
    compare against the signature rebuilt over ALL shingles. Emits
    per doc the half sizes and merged_eq_rebuilt — which the algebra
    forces to 1 (min is associative/commutative over set union).
    This law is why 100 TB shard signatures union in a reduce
    without rescanning any shard.

    Scale shape: ONE scan with conditional min aggregates (3k
    columns of state per doc, constant-size); no joins at all.
    """
    docs = load_table(spark, sf_dir, "documents").where(is_nonblank(F.col("text")))
    sh = docs.select(
        "doc_id",
        F.explode(F.array_distinct(shingles(tokens(F.col("text")), 3))).alias("sh"),
    ).withColumn("half", _md5_mod(F.concat(F.lit("h:"), F.col("sh")), 2))
    aggs = [
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_half_a"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_half_b"),
    ]
    for k in range(_MR_K):
        h = F.md5(F.concat(F.lit(f"g{k}:"), F.col("sh")))
        aggs.append(F.min(F.when(F.col("half") == 0, h)).alias(f"a{k}"))
        aggs.append(F.min(F.when(F.col("half") == 1, h)).alias(f"b{k}"))
        aggs.append(F.min(h).alias(f"r{k}"))
    per_doc = sh.groupBy("doc_id").agg(*aggs)
    eq = None
    for k in range(_MR_K):
        merged = F.least(
            F.coalesce(F.col(f"a{k}"), F.lit("z")),
            F.coalesce(F.col(f"b{k}"), F.lit("z")),
        )
        this = merged == F.col(f"r{k}")
        eq = this if eq is None else (eq & this)
    return per_doc.select(
        "doc_id",
        "n_half_a",
        "n_half_b",
        F.when(eq, 1).otherwise(0).cast("long").alias("merged_eq_rebuilt"),
    ).orderBy("doc_id")


def _merge_rebuild_oracle() -> str:
    half = _md5_mod_sql("'h:' || sh", 2)
    aggs = []
    for k in range(_MR_K):
        aggs.append(
            f"min(CASE WHEN {half} = 0 THEN md5('g{k}:' || sh) END) AS a{k}"
        )
        aggs.append(
            f"min(CASE WHEN {half} = 1 THEN md5('g{k}:' || sh) END) AS b{k}"
        )
        aggs.append(f"min(md5('g{k}:' || sh)) AS r{k}")
    agg_sql = ",\n           ".join(aggs)
    eq = " AND ".join(
        f"least(coalesce(a{k}, 'z'), coalesce(b{k}, 'z')) = r{k}"
        for k in range(_MR_K)
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
      SELECT doc_id,
           CAST(sum(CASE WHEN {half} = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_half_a,
           CAST(sum(CASE WHEN {half} = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_half_b,
           {agg_sql}
      FROM s GROUP BY 1
    )
    SELECT doc_id, n_half_a, n_half_b,
           CAST(CASE WHEN {eq} THEN 1 ELSE 0 END AS BIGINT)
             AS merged_eq_rebuilt
    FROM per_doc
    ORDER BY doc_id
    """


# ---------------------------------------------------------------------------
# 4. LSH candidates + Levenshtein verification
# ---------------------------------------------------------------------------

_LV_K = 8
_LV_CAP = 20
_LV_CONFIRM_PPM = 600_000


def dedup_lsh_levenshtein_verify_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The two-stage near-dup pipeline: banded MinHash candidates
    (8 single-row bands, bucket cap 20), then EXACT edit-distance
    verification on the whitespace-normalized lowercase text of
    candidate pairs only. Emits per pair the edit distance, both
    lengths, similarity ppm = (max_len - dist) * 1e6 DIV max_len,
    and confirmed = similarity >= 0.6 — all exact integers
    (levenshtein is the same DP on both engines).

    Scale shape: the verify stage costs O(candidates x len^2), and
    candidates are LSH-bounded (capped buckets), never corpus^2 —
    exactly how production near-dup pipelines afford an exact
    verifier at 100 TB.
    """
    docs = load_table(spark, sf_dir, "documents").where(is_nonblank(F.col("text")))
    norm = docs.select(
        "doc_id", F.lower(normalize_whitespace(F.col("text"))).alias("nt")
    )
    # r12 optimization (guide §2.4 remove shuffles): the signature used
    # to be explode + groupBy(doc_id) with 8 min(md5(...)) aggregates —
    # min over STRING has an immutable buffer, so Spark planned a
    # SortAggregate (full sort of the exploded shingle stream, twice,
    # per consumer subtree). The per-doc minimum over a doc-local array
    # needs no shuffle at all: array_min(transform(...)) computes the
    # IDENTICAL lexicographic minimum map-side. Same md5 count (the
    # per-band salt hashes are oracle-pinned), zero exchanges, no sort.
    hs = docs.select(
        "doc_id",
        F.array_distinct(shingles(tokens(F.col("text")), 3)).alias("_sh"),
    ).where(F.size("_sh") > 0)
    def _band_min(k: int) -> F.Column:
        return F.array_min(
            F.transform(
                F.col("_sh"), lambda s: F.md5(F.concat(F.lit(f"v{k}:"), s))
            )
        ).alias(f"h{k}")

    sig = hs.select("doc_id", *[_band_min(k) for k in range(_LV_K)])
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), F.col(f"h{b}").alias("key"))
                    for b in range(_LV_K)
                ]
            )
        ).alias("_bk"),
    ).select("doc_id", F.col("_bk.band").alias("band"), F.col("_bk.key").alias("key"))
    keep = (
        bands.groupBy("band", "key")
        .agg(F.count("*").alias("_w"))
        .where((F.col("_w") >= 2) & (F.col("_w") <= _LV_CAP))
        .select("band", "key")
    )
    kept = bands.join(keep, ["band", "key"], "left_semi")
    pairs = (
        kept.alias("a")
        .join(kept.alias("b"), ["band", "key"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    # r12 optimization (guide §2.2/§2.5 — partition by WORK, not bytes):
    # the candidate-pair relation is bytes-tiny (16 B/row), so AQE's
    # byte-based coalescing packs it into 1-2 post-shuffle partitions —
    # and the downstream stage is the O(len²) edit-distance DP, the most
    # CPU-dense per-row operator in the engine (measured 131 s at sf0.1
    # on 83k pairs: ~350 core-seconds of DP on two coalesced cores).
    # One explicit round-robin fan-out of the bare id pairs (a few MB)
    # spreads the DP over the cluster; ~5 s after. Result unchanged.
    pairs = pairs.repartition(spark.sparkContext.defaultParallelism)
    return (
        pairs.join(
            norm.select(F.col("doc_id").alias("id_a"), F.col("nt").alias("ta")),
            "id_a",
        )
        .join(
            norm.select(F.col("doc_id").alias("id_b"), F.col("nt").alias("tb")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.levenshtein("ta", "tb").cast("long").alias("edit_dist"),
            F.length("ta").cast("long").alias("len_a"),
            F.length("tb").cast("long").alias("len_b"),
        )
        .select(
            "id_a",
            "id_b",
            "edit_dist",
            "len_a",
            "len_b",
            F.expr(
                "((greatest(len_a, len_b) - edit_dist) * 1000000)"
                " DIV greatest(len_a, len_b)"
            )
            .cast("long")
            .alias("sim_ppm"),
            F.when(
                F.expr(
                    "((greatest(len_a, len_b) - edit_dist) * 1000000)"
                    " DIV greatest(len_a, len_b)"
                )
                >= _LV_CONFIRM_PPM,
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("confirmed"),
        )
        .orderBy("id_a", "id_b")
    )


def _lsh_lev_oracle() -> str:
    min_cols = ",\n             ".join(
        f"min(md5('v{k}:' || sh)) AS h{k}" for k in range(_LV_K)
    )
    band_rows = "\n      UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, h{b} AS key FROM m" for b in range(_LV_K)
    )
    return rf"""
    WITH t AS (
      SELECT doc_id, {_TOKENS_SQL} AS toks,
             lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS nt
      FROM documents WHERE length(trim(text)) > 0
    ), s AS (
      SELECT doc_id, unnest(
        CASE WHEN len(toks) >= 3
             THEN list_distinct(list_transform(range(1, len(toks) - 1),
                                               i -> array_to_string(toks[i:i+2], ' ')))
             ELSE [array_to_string(toks, ' ')] END) AS sh
      FROM t
    ), m AS (
      SELECT doc_id,
             {min_cols}
      FROM s GROUP BY 1
    ), bands AS (
      {band_rows}
    ), keep AS (
      SELECT band, key FROM (
        SELECT band, key, count(*) AS w FROM bands GROUP BY 1, 2
      ) WHERE w BETWEEN 2 AND {_LV_CAP}
    ), kept AS (
      SELECT b.doc_id, b.band, b.key
      FROM bands b JOIN keep k ON b.band = k.band AND b.key = k.key
    ), pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM kept a JOIN kept b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    ), met AS (
      SELECT p.id_a, p.id_b,
             CAST(levenshtein(na.nt, nb.nt) AS BIGINT) AS edit_dist,
             CAST(length(na.nt) AS BIGINT) AS len_a,
             CAST(length(nb.nt) AS BIGINT) AS len_b
      FROM pairs p
      JOIN t na ON p.id_a = na.doc_id
      JOIN t nb ON p.id_b = nb.doc_id
    )
    SELECT id_a, id_b, edit_dist, len_a, len_b,
           CAST(((greatest(len_a, len_b) - edit_dist) * 1000000)
                // greatest(len_a, len_b) AS BIGINT) AS sim_ppm,
           CAST(CASE WHEN ((greatest(len_a, len_b) - edit_dist) * 1000000)
                          // greatest(len_a, len_b) >= {_LV_CONFIRM_PPM}
                     THEN 1 ELSE 0 END AS BIGINT) AS confirmed
    FROM met
    ORDER BY id_a, id_b
    """


# ---------------------------------------------------------------------------
# 5. Domain-mix water-filling
# ---------------------------------------------------------------------------

_WF_EPOCH_CAP = 2  # max epochs per domain
_WF_BUDGET_NUM, _WF_BUDGET_DEN = 3, 2  # budget = 1.5 x corpus tokens


def llm_domain_mix_waterfill_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact integer water-filling of a training-token budget across
    source domains: budget B = floor(1.5 x total corpus tokens),
    per-domain cap = 2 epochs (2 x that domain's unique tokens).
    Sorted by cap ascending, domain i SATURATES iff giving its cap
    level to every remaining domain still fits the remaining budget
    (cap_i * (n - i + 1) <= B - cumcap_{i-1}); unsaturated domains
    all receive the common level lambda = (B - sum of saturated
    caps) DIV (n - n_saturated). Emits per domain its unique tokens,
    cap, saturated flag, exact allocation, and the shared lambda and
    budget — the data-mixture allocation solved before a training
    run (DoReMi/epoch-capped uniform regime).

    Scale shape: ONE corpus scan for token counts; everything after
    runs on the k-domain table (k ~ tens) — windows and a 1-row
    assembly broadcast, no corpus-side shuffle beyond the group agg.
    """
    docs = load_table(spark, sf_dir, "documents").where(is_nonblank(F.col("text")))
    dom = docs.groupBy("source").agg(
        F.sum(F.size(tokens(F.col("text")))).cast("long").alias("toks")
    )
    dom = dom.withColumn("cap", (F.col("toks") * _WF_EPOCH_CAP).cast("long"))
    totals = dom.agg(
        F.count(F.lit(1)).cast("long").alias("n_dom"),
        F.expr(
            f"(sum(toks) * {_WF_BUDGET_NUM}) DIV {_WF_BUDGET_DEN}"
        )
        .cast("long")
        .alias("budget"),
    )
    w = Window.orderBy(F.col("cap").asc(), F.col("source").asc())
    ranked = (
        dom.crossJoin(F.broadcast(totals))
        .withColumn("idx", F.row_number().over(w))
        .withColumn(
            "cumcap_before",
            F.coalesce(
                F.sum("cap").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ).cast("long"),
        )
        .withColumn(
            "saturated",
            F.when(
                F.col("cap") * (F.col("n_dom") - F.col("idx") + 1)
                <= F.col("budget") - F.col("cumcap_before"),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .cast("long"),
        )
    )
    level = ranked.agg(
        F.sum(F.when(F.col("saturated") == 1, F.col("cap")).otherwise(0))
        .cast("long")
        .alias("sat_cap"),
        F.sum("saturated").cast("long").alias("n_sat"),
        F.max("n_dom").cast("long").alias("n_dom2"),
        F.max("budget").cast("long").alias("budget2"),
    ).select(
        F.expr(
            "CASE WHEN n_dom2 > n_sat THEN (budget2 - sat_cap) DIV (n_dom2 - n_sat)"
            " ELSE 0 END"
        )
        .cast("long")
        .alias("lambda_tokens")
    )
    return (
        ranked.crossJoin(F.broadcast(level))
        .select(
            "source",
            "toks",
            "cap",
            "saturated",
            F.when(F.col("saturated") == 1, F.col("cap"))
            .otherwise(F.col("lambda_tokens"))
            .cast("long")
            .alias("alloc_tokens"),
            "lambda_tokens",
            "budget",
        )
        .orderBy("source")
    )


_WATERFILL_ORACLE = rf"""
  WITH docs AS (
    SELECT source, {_TOKENS_SQL} AS toks
    FROM documents WHERE length(trim(text)) > 0
  ), dom AS (
    SELECT source, CAST(sum(len(toks)) AS BIGINT) AS toks,
           CAST(sum(len(toks)) * {_WF_EPOCH_CAP} AS BIGINT) AS cap
    FROM docs GROUP BY 1
  ), totals AS (
    SELECT CAST(count(*) AS BIGINT) AS n_dom,
           CAST((sum(toks) * {_WF_BUDGET_NUM}) // {_WF_BUDGET_DEN} AS BIGINT)
             AS budget
    FROM dom
  ), ranked AS (
    SELECT d.source, d.toks, d.cap, t.n_dom, t.budget,
           row_number() OVER (ORDER BY d.cap, d.source) AS idx,
           CAST(coalesce(sum(d.cap) OVER (
                 ORDER BY d.cap, d.source
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS cumcap_before
    FROM dom d CROSS JOIN totals t
  ), flags AS (
    SELECT *,
           CAST(CASE WHEN cap * (n_dom - idx + 1) <= budget - cumcap_before
                     THEN 1 ELSE 0 END AS BIGINT) AS saturated
    FROM ranked
  ), level AS (
    SELECT CAST(CASE WHEN max(n_dom) > sum(saturated)
                     THEN (max(budget) - sum(CASE WHEN saturated = 1
                                                  THEN cap ELSE 0 END))
                          // (max(n_dom) - sum(saturated))
                     ELSE 0 END AS BIGINT) AS lambda_tokens
    FROM flags
  )
  SELECT f.source, f.toks, f.cap, f.saturated,
         CAST(CASE WHEN f.saturated = 1 THEN f.cap
                   ELSE l.lambda_tokens END AS BIGINT) AS alloc_tokens,
         l.lambda_tokens, f.budget
  FROM flags f CROSS JOIN level l
  ORDER BY f.source
"""


# ---------------------------------------------------------------------------
# 6. Dedup impact by source
# ---------------------------------------------------------------------------


def llm_dedup_impact_by_source_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation audit: exact-dup removal rates per source under
    first-wins dedup on md5 of the normalized lowercase text. Emits
    per source total docs, removed docs (non-minimal doc_id within a
    content group), removal ppm, total chars and removed chars —
    which domains shrink when the corpus is deduplicated (the
    survivorship audit a mixture re-weighting reads before training).

    Scale shape: one hash-keyed group (min doc_id per content hash),
    one join back, one source-keyed agg — all equi-keyed shuffles.
    """
    docs = load_table(spark, sf_dir, "documents").where(is_nonblank(F.col("text")))
    hashed = docs.select(
        "doc_id",
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.md5(F.lower(normalize_whitespace(F.col("text")))).alias("h"),
    )
    keep = hashed.groupBy("h").agg(F.min("doc_id").alias("keep_id"))
    flagged = hashed.join(keep, "h").withColumn(
        "removed", F.when(F.col("doc_id") != F.col("keep_id"), 1).otherwise(0)
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("docs_total"),
            F.sum("removed").cast("long").alias("docs_removed"),
            F.sum("n_chars").cast("long").alias("chars_total"),
            F.sum(F.when(F.col("removed") == 1, F.col("n_chars")).otherwise(0))
            .cast("long")
            .alias("chars_removed"),
        )
        .select(
            "source",
            "docs_total",
            "docs_removed",
            F.expr("(docs_removed * 1000000) DIV docs_total")
            .cast("long")
            .alias("removed_ppm"),
            "chars_total",
            "chars_removed",
        )
        .orderBy("source")
    )


_DEDUP_IMPACT_ORACLE = r"""
  WITH hashed AS (
    SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
           md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS h
    FROM documents WHERE length(trim(text)) > 0
  ), keep AS (
    SELECT h, min(doc_id) AS keep_id FROM hashed GROUP BY 1
  ), flagged AS (
    SELECT hashed.*, CASE WHEN doc_id <> keep_id THEN 1 ELSE 0 END AS removed
    FROM hashed JOIN keep USING (h)
  ), g AS (
    SELECT source,
           CAST(count(*) AS BIGINT) AS docs_total,
           CAST(sum(removed) AS BIGINT) AS docs_removed,
           CAST(sum(n_chars) AS BIGINT) AS chars_total,
           CAST(sum(CASE WHEN removed = 1 THEN n_chars ELSE 0 END) AS BIGINT)
             AS chars_removed
    FROM flagged GROUP BY 1
  )
  SELECT source, docs_total, docs_removed,
         CAST((docs_removed * 1000000) // docs_total AS BIGINT) AS removed_ppm,
         chars_total, chars_removed
  FROM g
  ORDER BY source
"""


# ---------------------------------------------------------------------------
# 7. Shard n-gram saturation (diminishing-returns curve)
# ---------------------------------------------------------------------------

_SAT_SHARDS = 8


def llm_shard_ngram_saturation_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diminishing-returns curve for corpus growth: docs split into 8
    shards (doc_id % 8), and for each distinct 3-gram its OWNING
    shard = min shard containing it. New grams per shard = grams it
    owns; the running total is the distinct-gram count after
    ingesting shards 0..s in order. Emits per shard the new-gram
    count, cumulative count, and new-gram ppm of the corpus total —
    the saturation curve that says when more crawl stops buying new
    vocabulary.

    Scale shape: the min-shard ownership device costs ONE distinct
    (gram -> min shard) aggregate — never one scan per shard; the
    curve assembles on an 8-row table.
    """
    docs = load_table(spark, sf_dir, "documents").where(is_nonblank(F.col("text")))
    grams = docs.select(
        (F.col("doc_id") % _SAT_SHARDS).alias("shard"),
        F.explode(F.array_distinct(shingles(tokens(F.col("text")), 3))).alias("g"),
    )
    owner = grams.groupBy("g").agg(F.min("shard").cast("long").alias("first_shard"))
    per_shard = owner.groupBy("first_shard").agg(
        F.count(F.lit(1)).cast("long").alias("new_grams")
    )
    w = Window.orderBy("first_shard").rowsBetween(Window.unboundedPreceding, 0)
    curve = per_shard.withColumn(
        "cum_grams", F.sum("new_grams").over(w).cast("long")
    )
    total = curve.agg(F.max("cum_grams").cast("long").alias("total_grams"))
    return (
        curve.crossJoin(F.broadcast(total))
        .select(
            F.col("first_shard").alias("shard"),
            "new_grams",
            "cum_grams",
            F.expr("(new_grams * 1000000) DIV total_grams")
            .cast("long")
            .alias("new_ppm"),
        )
        .orderBy("shard")
    )


_SATURATION_ORACLE = rf"""
  WITH t AS (
    SELECT doc_id % {_SAT_SHARDS} AS shard, {_TOKENS_SQL} AS toks
    FROM documents WHERE length(trim(text)) > 0
  ), grams AS (
    SELECT shard, unnest(
      CASE WHEN len(toks) >= 3
           THEN list_distinct(list_transform(range(1, len(toks) - 1),
                                             i -> array_to_string(toks[i:i+2], ' ')))
           ELSE [array_to_string(toks, ' ')] END) AS g
    FROM t
  ), owner AS (
    SELECT g, CAST(min(shard) AS BIGINT) AS first_shard FROM grams GROUP BY 1
  ), per_shard AS (
    SELECT first_shard, CAST(count(*) AS BIGINT) AS new_grams
    FROM owner GROUP BY 1
  ), curve AS (
    SELECT first_shard, new_grams,
           CAST(sum(new_grams) OVER (ORDER BY first_shard
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_grams
    FROM per_shard
  ), total AS (
    SELECT CAST(max(cum_grams) AS BIGINT) AS total_grams FROM curve
  )
  SELECT c.first_shard AS shard, c.new_grams, c.cum_grams,
         CAST((c.new_grams * 1000000) // t.total_grams AS BIGINT) AS new_ppm
  FROM curve c CROSS JOIN total t
  ORDER BY shard
"""


# ---------------------------------------------------------------------------
# 8. Logistic distillation — one exact Fisher-scoring step
# ---------------------------------------------------------------------------


def ml_logit_fisher_step_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-classifier distillation as exact arithmetic: logistic
    regression of is-English (y in {0,1}) on whitespace token count,
    fit with ONE Fisher-scoring / IRLS step from w = 0 — where the
    sigmoid is exactly 1/2 and the IRLS weight matrix exactly I/4, so
    w = 2 (X'X)^{-1} X't with t = 2y - 1 needs NO transcendentals:
    every sum is an int64, the 2x2 solve is Cramer on exact integers
    (all < 2^53, so the double division is the same IEEE op on both
    engines — the exact-double device), and the weights floor to e6.
    Documents are then scored with the QUANTIZED weights (score_e6 =
    w0_e6 + w1_e6 * x, an integer — the PQ quantize-then-serve
    device) and classified at score > 0. Emits the confusion matrix
    (y_true, pred, n) with the weights and overall accuracy ppm on
    every row.

    Scale shape: one scan for 5 sums, a 1-row weight broadcast back,
    one confusion-matrix agg — residual data never shuffles.
    """
    docs = load_table(spark, sf_dir, "documents").where(is_nonblank(F.col("text")))
    feats = docs.select(
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
    weights = sums.select(
        F.floor(
            (
                F.lit(2.0)
                * (
                    F.col("sxx").cast("double") * F.col("st").cast("double")
                    - F.col("sx").cast("double") * F.col("sxt").cast("double")
                )
                / (
                    F.col("n").cast("double") * F.col("sxx").cast("double")
                    - F.col("sx").cast("double") * F.col("sx").cast("double")
                )
            )
            * 1000000
        )
        .cast("long")
        .alias("w0_e6"),
        F.floor(
            (
                F.lit(2.0)
                * (
                    F.col("n").cast("double") * F.col("sxt").cast("double")
                    - F.col("sx").cast("double") * F.col("st").cast("double")
                )
                / (
                    F.col("n").cast("double") * F.col("sxx").cast("double")
                    - F.col("sx").cast("double") * F.col("sx").cast("double")
                )
            )
            * 1000000
        )
        .cast("long")
        .alias("w1_e6"),
    )
    scored = feats.crossJoin(F.broadcast(weights)).withColumn(
        "pred",
        F.when(F.col("w0_e6") + F.col("w1_e6") * F.col("x") > 0, 1)
        .otherwise(0)
        .cast("long"),
    )
    conf = scored.groupBy("y", "pred", "w0_e6", "w1_e6").agg(
        F.count(F.lit(1)).cast("long").alias("n_cell")
    )
    acc = scored.agg(
        F.expr(
            "(sum(CASE WHEN y = pred THEN 1 ELSE 0 END) * 1000000) DIV count(1)"
        )
        .cast("long")
        .alias("acc_ppm")
    )
    return (
        conf.crossJoin(F.broadcast(acc))
        .select(
            F.col("y").alias("y_true"),
            "pred",
            "n_cell",
            "w0_e6",
            "w1_e6",
            "acc_ppm",
        )
        .orderBy("y_true", "pred")
    )


_LOGIT_ORACLE = rf"""
  WITH feats AS (
    SELECT CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS y,
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
    SELECT f.y, f.x, w.w0_e6, w.w1_e6,
           CAST(CASE WHEN w.w0_e6 + w.w1_e6 * f.x > 0 THEN 1 ELSE 0 END
                AS BIGINT) AS pred
    FROM feats f CROSS JOIN weights w
  ), acc AS (
    SELECT CAST((sum(CASE WHEN y = pred THEN 1 ELSE 0 END) * 1000000)
                // count(*) AS BIGINT) AS acc_ppm
    FROM scored
  )
  SELECT s.y AS y_true, s.pred, CAST(count(*) AS BIGINT) AS n_cell,
         s.w0_e6, s.w1_e6, a.acc_ppm
  FROM scored s CROSS JOIN acc a
  GROUP BY 1, 2, 4, 5, 6
  ORDER BY y_true, pred
"""


PENDING: tuple[PendingQuery, ...] = (
    PendingQuery(
        "dedup_substring_runs",
        dedup_substring_runs_query,
        _SUBSTR_ORACLE,
        tags=("dedup", "substring", "suffix-style", "llm-curation",
              "integer-exact"),
    ),
    PendingQuery(
        "dedup_cross_snapshot_minhash",
        dedup_cross_snapshot_minhash_query,
        _cross_snapshot_oracle(),
        tags=("dedup", "minhash", "incremental", "cross-snapshot",
              "llm-curation"),
    ),
    PendingQuery(
        "dedup_minhash_merge_rebuild",
        dedup_minhash_merge_rebuild_query,
        _merge_rebuild_oracle(),
        tags=("dedup", "minhash", "mergeable", "sketch-law"),
    ),
    PendingQuery(
        "dedup_lsh_levenshtein_verify",
        dedup_lsh_levenshtein_verify_query,
        _lsh_lev_oracle(),
        tags=("dedup", "lsh", "levenshtein", "verify-stage",
              "llm-curation"),
    ),
    PendingQuery(
        "llm_domain_mix_waterfill",
        llm_domain_mix_waterfill_query,
        _WATERFILL_ORACLE,
        tags=("llm", "mixture", "water-filling", "integer-exact"),
    ),
    PendingQuery(
        "llm_dedup_impact_by_source",
        llm_dedup_impact_by_source_query,
        _DEDUP_IMPACT_ORACLE,
        tags=("llm", "dedup", "audit", "integer-exact"),
    ),
    PendingQuery(
        "llm_shard_ngram_saturation",
        llm_shard_ngram_saturation_query,
        _SATURATION_ORACLE,
        tags=("llm", "saturation", "diminishing-returns",
              "integer-exact"),
    ),
    PendingQuery(
        "ml_logit_fisher_step",
        ml_logit_fisher_step_query,
        _LOGIT_ORACLE,
        tags=("ml", "logistic", "irls", "distillation", "exact-double"),
    ),
)
