"""Round-42 declared-query staging area — STAGED FOR ROUND 13 (third
staged-ahead wave beside roundforty/roundfortyone; the round-12 window
is full at exactly 50, so these carry the full kit but are NOT
activated).

Dedup-lifecycle depth — the delete, re-crawl, ordering, and blocking
stories a production dedup service owns:

- **LSH tombstone delta**: deletion locality — MinHash state is
  per-doc, so deleting docs from an LSH index is a FILTER of the
  bucket table, no rehash. Pinned executably: the filtered full
  index equals the index rebuilt from surviving docs' text, band by
  band, down to exact candidate-pair counts (contrast: a SimHash
  majority-bit structure has NO such locality — its maintenance unit
  is the counter, per dedup_simhash_merge_rebuild).
- **URL -> content dedup funnel**: the two-level production order —
  collapse re-crawls by canonical URL first (3 snapshots share a
  page), then exact-content dedup on survivors; per source the
  funnel counts and ppm at each level.
- **IVF probe coverage**: cells ranked by population with cumulative
  corpus-coverage ppm and the minimal probe count reaching 80% — the
  probe-BUDGET side of the IVF health trio (balance, residual,
  recall are already rows).
- **Dedup order sensitivity**: first-wins dedup over the re-crawl
  groups under two scan orders (doc_id vs md5). Group counts are
  order-invariant; WHICH doc — and therefore which SOURCE — survives
  is not. The per-source keeper shift is the number a
  reproducibility audit must bound before anyone calls a dedup pass
  "deterministic".
- **Family blocking census**: the (length, 3-token prefix, 3-token
  suffix) blocking signature's family-size histogram and pair mass —
  the cheapest candidate-blocking key, priced before anyone builds
  an index on it.

Per-wave staging module (nothing evidenced imports this file).
Exactness rules as earlier waves.
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
_NORM_SQL = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"

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
# 1. LSH tombstone delta
# ---------------------------------------------------------------------------

_TD_HASHES = 8
_TD_BANDS = 4
_TD_DEL_MOD = 7  # tombstoned docs: doc_id % 7 == 0


def _band_census(per_band: DataFrame) -> DataFrame:
    """(band, bucket) occupancy -> per-band bucket count + exact pair
    mass. Shared by the full/filtered/rebuilt paths so the comparison
    is about the INPUT pipeline, not the census code."""
    widths = per_band.groupBy("band", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    return widths.groupBy("band").agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum((F.col("c") * (F.col("c") - 1) / 2).cast("long"))
        .cast("long")
        .alias("cand_pairs"),
    )


def _minhash_bands(docs: DataFrame) -> DataFrame:
    sh = docs.select(
        "doc_id",
        F.explode(F.array_distinct(shingles(tokens(F.col("text")), 3))).alias("sh"),
    )
    mins = sh.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"g{k}:"), F.col("sh")))).alias(f"m{k}")
            for k in range(_TD_HASHES)
        ]
    )
    return mins.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).cast("long").alias("band"),
                        F.md5(
                            F.concat_ws("|", F.col(f"m{2 * b}"), F.col(f"m{2 * b + 1}"))
                        ).alias("bucket"),
                    )
                    for b in range(_TD_BANDS)
                ]
            )
        ).alias("_e"),
    ).select("doc_id", F.col("_e.band").alias("band"), F.col("_e.bucket").alias("bucket"))


def dedup_lsh_tombstone_delta_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Deletion locality of an LSH index, pinned executably: MinHash
    signatures are doc-local, so applying tombstones (doc_id % 7 == 0)
    to the FULL index's (doc, band, bucket) table by anti-join equals
    the index REBUILT from the surviving docs' raw text — two plans,
    one truth. Per band: the full census, the filtered census, the
    rebuilt census, and filtered == rebuilt on both bucket count and
    exact candidate-pair mass. This is why a 100 TB LSH index deletes
    in O(delta) while the SimHash majority structure must re-merge
    counters (dedup_simhash_merge_rebuild) — the two maintenance
    laws, side by side.

    Scale shape: two shingle scans (full + live; a production system
    keeps the first as state), three bounded band censuses, one 4-row
    assembly join.
    """
    docs = load_table(spark, sf_dir, "documents").where(is_nonblank(F.col("text")))
    full_bands = _minhash_bands(docs)
    tomb = docs.where(F.col("doc_id") % _TD_DEL_MOD == 0).select("doc_id")
    filtered_bands = full_bands.join(tomb, "doc_id", "left_anti")
    rebuilt_bands = _minhash_bands(docs.where(F.col("doc_id") % _TD_DEL_MOD != 0))
    full_c = _band_census(full_bands).select(
        "band",
        F.col("n_buckets").alias("full_buckets"),
        F.col("cand_pairs").alias("full_pairs"),
    )
    filt_c = _band_census(filtered_bands).select(
        "band",
        F.col("n_buckets").alias("after_buckets"),
        F.col("cand_pairs").alias("after_pairs"),
    )
    reb_c = _band_census(rebuilt_bands).select(
        "band",
        F.col("n_buckets").alias("rebuilt_buckets"),
        F.col("cand_pairs").alias("rebuilt_pairs"),
    )
    return (
        full_c.join(filt_c, "band")
        .join(reb_c, "band")
        .select(
            "band",
            "full_buckets",
            "full_pairs",
            "after_buckets",
            "after_pairs",
            "rebuilt_buckets",
            "rebuilt_pairs",
            F.when(
                (F.col("after_buckets") == F.col("rebuilt_buckets"))
                & (F.col("after_pairs") == F.col("rebuilt_pairs")),
                1,
            )
            .otherwise(0)
            .cast("long")
            .alias("filter_eq_rebuild"),
        )
        .orderBy("band")
    )


def _td_oracle() -> str:
    mins = ",\n             ".join(
        f"min(md5('g{k}:' || sh)) AS m{k}" for k in range(_TD_HASHES)
    )
    bands = ", ".join(
        f"(CAST({b} AS BIGINT), md5(m{2 * b} || '|' || m{2 * b + 1}))"
        for b in range(_TD_BANDS)
    )
    return rf"""
    WITH s AS ({_SHINGLES_SQL}),
    mins AS (SELECT doc_id, {mins} FROM s GROUP BY 1),
    per_band AS (
      SELECT doc_id, e[1]::BIGINT AS band, e[2]::VARCHAR AS bucket
      FROM mins, unnest([{bands}]) AS u(e)
    ),
    census_full AS (
      SELECT band, CAST(count(*) AS BIGINT) AS full_buckets,
             CAST(sum(c * (c - 1) // 2) AS BIGINT) AS full_pairs
      FROM (SELECT band, bucket, CAST(count(*) AS BIGINT) AS c
            FROM per_band GROUP BY 1, 2) GROUP BY band
    ),
    census_after AS (
      SELECT band, CAST(count(*) AS BIGINT) AS after_buckets,
             CAST(sum(c * (c - 1) // 2) AS BIGINT) AS after_pairs
      FROM (SELECT band, bucket, CAST(count(*) AS BIGINT) AS c
            FROM per_band WHERE doc_id % {_TD_DEL_MOD} <> 0
            GROUP BY 1, 2) GROUP BY band
    )
    SELECT f.band, f.full_buckets, f.full_pairs,
           a.after_buckets, a.after_pairs,
           a.after_buckets AS rebuilt_buckets,
           a.after_pairs AS rebuilt_pairs,
           CAST(1 AS BIGINT) AS filter_eq_rebuild
    FROM census_full f JOIN census_after a USING (band)
    ORDER BY f.band
    """


# ---------------------------------------------------------------------------
# 2. URL -> content dedup funnel
# ---------------------------------------------------------------------------

_UF_SNAPSHOTS = 3  # docs per shared page URL (re-crawl group)


def dedup_url_content_funnel_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production two-level dedup order, as a per-source funnel:
    level 1 collapses re-crawls by canonical URL (pages are shared by
    doc_id DIV 3 — three snapshots each, URL variants differing in
    host case and a utm param, canonicalized as in
    dedup_url_canonical; keeper = min doc_id); level 2 exact-content
    dedup (md5 of whitespace-normalized text; keeper = min doc_id)
    on the URL-level survivors. Emits per source: docs, after-URL
    count, after-content count, and the ppm removed at each level —
    URL dedup is metadata-priced and runs FIRST precisely because it
    never reads the body; this row shows what each level actually
    removes on this corpus.

    Scale shape: canonicalization is map-only; each level is one
    keyed min-aggregate + one semi-join; keepers are attributed to
    their own source (a funnel, not a join explosion).
    """
    docs = load_table(spark, sf_dir, "documents").where(is_nonblank(F.col("text")))
    # each page is shared by 3 consecutive snapshots (doc_id DIV 3) on
    # one constant archive host — the raw variants (host case, utm
    # param) collapse to this canonical form; dedup_url_canonical
    # exercises the canonicalizer itself, here only the canonical key
    # participates
    canon = F.concat(
        F.lit("http://archive.example.org/page/"),
        F.expr(f"CAST(doc_id DIV {_UF_SNAPSHOTS} AS STRING)"),
    )
    base = docs.select(
        "doc_id",
        "source",
        canon.alias("canon"),
        F.md5(F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))))
        .alias("content_key"),
    )
    url_keep = base.groupBy("canon").agg(F.min("doc_id").alias("doc_id"))
    lvl1 = base.join(url_keep, ["canon", "doc_id"], "left_semi")
    content_keep = lvl1.groupBy("content_key").agg(F.min("doc_id").alias("doc_id"))
    lvl2 = lvl1.join(content_keep, ["content_key", "doc_id"], "left_semi")
    per_src = (
        base.groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .join(
            lvl1.groupBy("source").agg(
                F.count(F.lit(1)).cast("long").alias("after_url")
            ),
            "source",
            "left",
        )
        .join(
            lvl2.groupBy("source").agg(
                F.count(F.lit(1)).cast("long").alias("after_content")
            ),
            "source",
            "left",
        )
    )
    return per_src.select(
        "source",
        "n_docs",
        F.coalesce("after_url", F.lit(0)).cast("long").alias("after_url"),
        F.coalesce("after_content", F.lit(0)).cast("long").alias("after_content"),
        F.expr("((n_docs - coalesce(after_url, 0)) * 1000000) DIV n_docs")
        .cast("long")
        .alias("url_removed_ppm"),
        F.expr(
            "CASE WHEN coalesce(after_url, 0) = 0 THEN 0 "
            "ELSE ((coalesce(after_url, 0) - coalesce(after_content, 0)) * 1000000)"
            " DIV coalesce(after_url, 0) END"
        )
        .cast("long")
        .alias("content_removed_ppm"),
    ).orderBy("source")


_UF_ORACLE = rf"""
  WITH base AS (
    SELECT doc_id, source,
           'http://archive.example.org/page/'
             || CAST(doc_id // {_UF_SNAPSHOTS} AS VARCHAR) AS canon,
           md5({_NORM_SQL}) AS content_key
    FROM documents WHERE length(trim(text)) > 0
  ), url_keep AS (
    SELECT canon, min(doc_id) AS doc_id FROM base GROUP BY 1
  ), lvl1 AS (
    SELECT b.* FROM base b JOIN url_keep k
      ON b.canon = k.canon AND b.doc_id = k.doc_id
  ), content_keep AS (
    SELECT content_key, min(doc_id) AS doc_id FROM lvl1 GROUP BY 1
  ), lvl2 AS (
    SELECT l.* FROM lvl1 l JOIN content_keep k
      ON l.content_key = k.content_key AND l.doc_id = k.doc_id
  )
  SELECT b.source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(coalesce(u.c, 0) AS BIGINT) AS after_url,
         CAST(coalesce(v.c, 0) AS BIGINT) AS after_content,
         CAST(((count(*) - coalesce(u.c, 0)) * 1000000) // count(*)
              AS BIGINT) AS url_removed_ppm,
         CAST(CASE WHEN coalesce(u.c, 0) = 0 THEN 0
                   ELSE ((coalesce(u.c, 0) - coalesce(v.c, 0)) * 1000000)
                        // coalesce(u.c, 0) END AS BIGINT)
           AS content_removed_ppm
  FROM base b
  LEFT JOIN (SELECT source, count(*) AS c FROM lvl1 GROUP BY 1) u
    ON u.source = b.source
  LEFT JOIN (SELECT source, count(*) AS c FROM lvl2 GROUP BY 1) v
    ON v.source = b.source
  GROUP BY b.source, u.c, v.c
  ORDER BY b.source
"""


# ---------------------------------------------------------------------------
# 3. IVF probe coverage
# ---------------------------------------------------------------------------

_PC_DIMS = 16
_PC_CELLS = 8  # fixed quantizer: centroids = vectors with vec_id < 8
_PC_TARGET_PPM = 800000


def sim_ivf_probe_coverage_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe-budget table for the fixed 8-centroid IVF: cells ranked
    by population (cell id tiebreak), cumulative corpus-coverage ppm,
    and per row whether the rank is within the minimal probe budget
    reaching 80% coverage. A probe planner reads this top-down: the
    smallest prefix of ranked cells covering the target IS nprobe for
    a population-proportional workload. Completes the IVF health trio
    with sim_quantizer_balance_audit (balance) and
    sim_ivf_residual_energy (usefulness); sim_ivf_nprobe_sweep
    measures recall, this row prices budget.

    Scale shape: one 8-row centroid broadcast + assign pass; ranking
    and running sums are windows over the 8-row cell table only.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    qcols = [
        F.floor(
            F.element_at("embedding", i + 1).cast("double") * 1000000 + F.lit(0.5)
        )
        .cast("long")
        .alias(f"q{i}")
        for i in range(_PC_DIMS)
    ]
    q = emb.select("vec_id", *qcols)
    cents = q.where(F.col("vec_id") < _PC_CELLS).select(
        F.col("vec_id").alias("c_id"),
        *[F.col(f"q{i}").alias(f"cq{i}") for i in range(_PC_DIMS)],
    )
    d2 = None
    for i in range(_PC_DIMS):
        diff = F.col(f"q{i}") - F.col(f"cq{i}")
        term = diff * diff
        d2 = term if d2 is None else d2 + term
    w_a = Window.partitionBy("vec_id").orderBy(F.col("d2").asc(), F.col("c_id").asc())
    cells = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("d2", d2.cast("long"))
        .withColumn("rn", F.row_number().over(w_a))
        .where(F.col("rn") == 1)
        .groupBy(F.col("c_id").alias("cell"))
        .agg(F.count(F.lit(1)).cast("long").alias("population"))
    )
    w_rank = Window.orderBy(F.desc("population"), F.asc("cell"))
    n = cells.agg(F.sum("population").cast("long").alias("_n"))
    ranked = (
        cells.crossJoin(F.broadcast(n))
        .withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .withColumn(
            "cum_ppm",
            F.expr("(sum(population) OVER (ORDER BY population DESC, cell"
                   " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
                   f" * 1000000) DIV _n").cast("long"),
        )
    )
    # minimal budget: the smallest rank whose cum_ppm >= target
    budget = ranked.where(F.col("cum_ppm") >= _PC_TARGET_PPM).agg(
        F.min("rank").cast("long").alias("_n80")
    )
    return (
        ranked.crossJoin(F.broadcast(budget))
        .select(
            "cell",
            "population",
            "rank",
            "cum_ppm",
            (F.col("rank") <= F.col("_n80")).cast("long").alias("in_80pct_budget"),
            F.col("_n80").alias("probes_for_80pct"),
        )
        .orderBy("rank")
    )


def _pc_oracle() -> str:
    q_cols = ", ".join(
        f"CAST(floor(CAST(embedding[{i + 1}] AS DOUBLE) * 1000000 + 0.5)"
        f" AS BIGINT) AS q{i}"
        for i in range(_PC_DIMS)
    )
    d2_ec = " + ".join(
        f"(e.q{i} - c.q{i}) * (e.q{i} - c.q{i})" for i in range(_PC_DIMS)
    )
    return rf"""
    WITH qv AS (SELECT vec_id, {q_cols} FROM embeddings),
    cents AS (SELECT vec_id AS c_id, {", ".join(f"q{i}" for i in range(_PC_DIMS))}
              FROM qv WHERE vec_id < {_PC_CELLS}),
    assigned AS (
      SELECT * FROM (
        SELECT e.vec_id, c.c_id,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY ({d2_ec}), c.c_id) AS rn
        FROM qv e CROSS JOIN cents c)
      WHERE rn = 1
    ), cells AS (
      SELECT c_id AS cell, CAST(count(*) AS BIGINT) AS population
      FROM assigned GROUP BY 1
    ), ranked AS (
      SELECT cell, population,
             CAST(row_number() OVER (ORDER BY population DESC, cell)
                  AS BIGINT) AS rank,
             CAST((sum(population) OVER (ORDER BY population DESC, cell
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   * 1000000) // (SELECT sum(population) FROM cells)
                  AS BIGINT) AS cum_ppm
      FROM cells
    ), budget AS (
      SELECT CAST(min(rank) AS BIGINT) AS n80 FROM ranked
      WHERE cum_ppm >= {_PC_TARGET_PPM}
    )
    SELECT r.cell, r.population, r.rank, r.cum_ppm,
           CAST(CASE WHEN r.rank <= b.n80 THEN 1 ELSE 0 END AS BIGINT)
             AS in_80pct_budget,
           b.n80 AS probes_for_80pct
    FROM ranked r CROSS JOIN budget b
    ORDER BY r.rank
    """


# ---------------------------------------------------------------------------
# 4. Dedup order sensitivity
# ---------------------------------------------------------------------------


def dedup_order_sensitivity_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-wins dedup over the re-crawl groups (the funnel row's
    page key: doc_id DIV 3 — three snapshots per page, spanning
    sources) run under two scan orders — doc_id and
    md5('ord:' || doc_id) — and compared per source: how many docs
    each source KEEPS under each order, and the shift between them.
    Total kept is order-invariant (one keeper per group — recounted
    by the pytest); per-SOURCE keeper counts are NOT when groups span
    sources, and that shift is exactly what a "deterministic dedup"
    claim must pin down: determinism requires an ORDER, not just a
    tie-break. Both engines use the same md5 order so the comparison
    is exact.

    Scale shape: one group-key agg computing both keepers in the
    same pass (min(doc_id) and min-by-unique-hash), one source-level
    census of each keeper set; no self-joins.
    """
    docs = load_table(spark, sf_dir, "documents").where(is_nonblank(F.col("text")))
    base = docs.select(
        "doc_id",
        "source",
        F.expr("CAST(doc_id DIV 3 AS STRING)").alias("ck"),
        F.md5(F.concat(F.lit("ord:"), F.col("doc_id").cast("string"))).alias("ok"),
    )
    groups = base.groupBy("ck").agg(
        F.min("doc_id").alias("keep_id"),
        F.min(F.struct(F.col("ok"), F.col("doc_id"))).alias("_kh"),
    )
    keep_a = groups.select(F.col("keep_id").alias("doc_id"))
    keep_b = groups.select(F.col("_kh.doc_id").alias("doc_id"))
    src_a = (
        base.join(keep_a, "doc_id", "left_semi")
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("kept_by_id"))
    )
    src_b = (
        base.join(keep_b, "doc_id", "left_semi")
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("kept_by_hash"))
    )
    allsrc = base.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    return (
        allsrc.join(src_a, "source", "left")
        .join(src_b, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("kept_by_id", F.lit(0)).cast("long").alias("kept_by_id"),
            F.coalesce("kept_by_hash", F.lit(0)).cast("long").alias("kept_by_hash"),
            F.abs(
                F.coalesce("kept_by_id", F.lit(0))
                - F.coalesce("kept_by_hash", F.lit(0))
            )
            .cast("long")
            .alias("keeper_shift"),
        )
        .orderBy("source")
    )


_OS_ORACLE = rf"""
  WITH base AS (
    SELECT doc_id, source, CAST(doc_id // 3 AS VARCHAR) AS ck,
           md5('ord:' || CAST(doc_id AS VARCHAR)) AS ok
    FROM documents WHERE length(trim(text)) > 0
  ), groups AS (
    -- ok = md5 of the doc_id is UNIQUE per doc, so min(ok) names one
    -- keeper with no tie to break; the keeper's id is recovered by
    -- joining the unique key back
    SELECT ck, min(doc_id) AS keep_id, min(ok) AS min_ok
    FROM base GROUP BY 1
  ), src_a AS (
    SELECT b.source, CAST(count(*) AS BIGINT) AS kept_by_id
    FROM base b JOIN groups g ON b.doc_id = g.keep_id GROUP BY 1
  ), src_b AS (
    SELECT b.source, CAST(count(*) AS BIGINT) AS kept_by_hash
    FROM base b JOIN groups g ON b.ck = g.ck AND b.ok = g.min_ok GROUP BY 1
  )
  SELECT s.source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(coalesce(a.kept_by_id, 0) AS BIGINT) AS kept_by_id,
         CAST(coalesce(b.kept_by_hash, 0) AS BIGINT) AS kept_by_hash,
         CAST(abs(coalesce(a.kept_by_id, 0) - coalesce(b.kept_by_hash, 0))
              AS BIGINT) AS keeper_shift
  FROM base s
  LEFT JOIN src_a a ON a.source = s.source
  LEFT JOIN src_b b ON b.source = s.source
  GROUP BY s.source, a.kept_by_id, b.kept_by_hash
  ORDER BY s.source
"""


# ---------------------------------------------------------------------------
# 5. Family blocking census
# ---------------------------------------------------------------------------

_FB_AFFIX = 3  # tokens taken from each end for the blocking signature


def dedup_family_blocking_census_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Blocking-key audit for the cheapest dedup signature there is:
    (token count, first 3 tokens, last 3 tokens). Census over family
    sizes: per size s, the family count, doc mass, and exact
    candidate-pair mass s*(s-1)/2 summed — plus each size's share of
    the total pair mass in ppm. A signature whose mass concentrates
    in huge families blocks nothing; this is the table that says
    whether the cheap key suffices or the corpus needs MinHash
    (dedup_minhash_scurve_tuning prices that ladder's next rung).

    Scale shape: one scan builds the signature (head/tail slices of
    the token array), one signature-keyed count, one size-keyed
    census; the pair-mass total for the ppm share is a 1-row
    broadcast. Output is bounded by the distinct family sizes.
    """
    docs = load_table(spark, sf_dir, "documents").where(is_nonblank(F.col("text")))
    t = tokens(F.col("text"))
    sig = docs.select(
        F.concat_ws(
            "|",
            F.size(t).cast("string"),
            F.concat_ws(" ", F.slice(t, 1, _FB_AFFIX)),
            F.concat_ws(" ", F.slice(t, -_FB_AFFIX, _FB_AFFIX)),
        ).alias("sig")
    ).where(F.size(t) >= _FB_AFFIX)
    fams = sig.groupBy("sig").agg(F.count(F.lit(1)).cast("long").alias("s"))
    pairs = (F.col("s") * (F.col("s") - 1) / 2).cast("long")
    census = fams.groupBy(F.col("s").alias("family_size")).agg(
        F.count(F.lit(1)).cast("long").alias("n_families"),
        (F.count(F.lit(1)) * F.first("s")).cast("long").alias("n_docs"),
        F.sum(pairs).cast("long").alias("cand_pairs"),
    )
    tot = fams.agg(F.sum(pairs).cast("long").alias("_tot"))
    return (
        census.crossJoin(F.broadcast(tot))
        .select(
            "family_size",
            "n_families",
            "n_docs",
            "cand_pairs",
            F.expr(
                "CASE WHEN _tot = 0 THEN 0"
                " ELSE (cand_pairs * 1000000) DIV _tot END"
            )
            .cast("long")
            .alias("pair_share_ppm"),
        )
        .orderBy("family_size")
    )


_FB_ORACLE = rf"""
  WITH t AS (
    SELECT {_TOKENS_SQL} AS toks
    FROM documents WHERE length(trim(text)) > 0
  ), sig AS (
    SELECT CAST(len(toks) AS VARCHAR) || '|'
           || array_to_string(toks[1:{_FB_AFFIX}], ' ') || '|'
           || array_to_string(toks[-{_FB_AFFIX}:], ' ') AS sig
    FROM t WHERE len(toks) >= {_FB_AFFIX}
  ), fams AS (
    SELECT sig, CAST(count(*) AS BIGINT) AS s FROM sig GROUP BY 1
  ), census AS (
    SELECT s AS family_size,
           CAST(count(*) AS BIGINT) AS n_families,
           CAST(count(*) * s AS BIGINT) AS n_docs,
           CAST(sum(s * (s - 1) // 2) AS BIGINT) AS cand_pairs
    FROM fams GROUP BY s
  ), tot AS (
    SELECT CAST(sum(s * (s - 1) // 2) AS BIGINT) AS t FROM fams
  )
  SELECT family_size, n_families, n_docs, cand_pairs,
         CAST(CASE WHEN t.t = 0 THEN 0
                   ELSE (cand_pairs * 1000000) // t.t END AS BIGINT)
           AS pair_share_ppm
  FROM census CROSS JOIN tot t
  ORDER BY family_size
"""


PENDING: tuple[PendingQuery, ...] = (
    PendingQuery(
        "dedup_lsh_tombstone_delta",
        dedup_lsh_tombstone_delta_query,
        _td_oracle(),
        tags=("dedup", "lsh", "deletes", "incremental", "integer-exact"),
    ),
    PendingQuery(
        "dedup_url_content_funnel",
        dedup_url_content_funnel_query,
        _UF_ORACLE,
        tags=("dedup", "url", "funnel", "integer-exact"),
    ),
    PendingQuery(
        "sim_ivf_probe_coverage",
        sim_ivf_probe_coverage_query,
        _pc_oracle(),
        tags=("sim", "ivf", "probe-budget", "serving", "integer-exact"),
    ),
    PendingQuery(
        "dedup_order_sensitivity",
        dedup_order_sensitivity_query,
        _OS_ORACLE,
        tags=("dedup", "determinism", "audit", "integer-exact"),
    ),
    PendingQuery(
        "dedup_family_blocking_census",
        dedup_family_blocking_census_query,
        _FB_ORACLE,
        tags=("dedup", "blocking", "census", "integer-exact"),
    ),
)

#: documented 1-row / bounded broadcast assemblies (read by
#: tools/plan_audit.py; migrate into test_plan_hygiene's whitelist at
#: activation): probe_coverage = 8-row centroid broadcast crossJoin +
#: 1-row total/budget broadcasts (windows are over the 8-row cell
#: table only); family_blocking_census = 1-row pair-mass total
#: broadcast under the ppm share.
_BNLJ_OK = ("sim_ivf_probe_coverage", "dedup_family_blocking_census")
