"""Round-19 declared-query staging area — curation/ops breadth wave:
asymmetric shingle CONTAINMENT (Broder's second resemblance measure —
the one that catches quote-inclusion where Jaccard misses it),
deterministic shard manifests (the dataset-publishing step), per-source
embedding-centroid drift (integer-quantized), a stopword/short-token
quality profile, clerk-workload concentration (Herfindahl index), and
brand price dispersion (coefficient of variation on DECIMAL(38,0)
moments).

Per-wave staging module (nothing evidenced imports this file).
Exactness rules as in earlier waves: integer ppm via DIV/`//`, cents,
BIGINT casts, deterministic tiebreaks, micro-nat/e4 scaled-integer
rounding of any float BEFORE summation, DECIMAL(38,0) for
second-moment sums (the agg_cohen_kappa overflow precedent)."""

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
from spotify_data_pipeline_spark.plans.parity import rnd_cents, rnd_cents_sql


@dataclass(frozen=True)
class PendingQuery:
    name: str
    fn: object
    oracle: str | None
    headline: bool = False
    tags: tuple[str, ...] = ()


_TOKENS_SQL = "string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')"

_SHINGLE_SQL_K3 = """
      CASE WHEN len(toks) >= 3
           THEN list_transform(range(1, len(toks) - 1),
                               i -> array_to_string(toks[i:i+2], ' '))
           ELSE [array_to_string(toks, ' ')] END"""


_CONTAIN_MIN_PPM = 800_000  # containment >= 0.8
_CONTAIN_DF_CAP = 100  # drop shingles in > this many docs (stopword 3-grams)


def dedup_shingle_containment_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment dedup (Broder '97 §2: resemblance AND
    containment — Jaccard misses a short doc fully quoted inside a long
    one because the union is large; containment |A∩B|/|A| ≥ 0.8 catches
    it). Reports ordered (contained, container) pairs with exact
    intersection counts and containment ppm.

    Scale shape: distinct (doc, 3-shingle) explode → df-capped postings
    (the ngram-Jaccard cap device: shingles in > 100 docs are dropped
    BEFORE the pair join, so no stopword shingle ever fans out) →
    shingle-keyed pair agg → size join → ppm filter. Never all-pairs;
    the cap bounds per-shingle fanout at C(100,2).
    """
    docs = load_table(spark, sf_dir, "documents").where(is_nonblank(F.col("text")))
    sh = docs.select(
        "doc_id", F.explode(shingles(tokens(F.col("text")), 3)).alias("sh")
    ).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("n_sh"))
    keep = (
        sh.groupBy("sh")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .where(F.col("df") <= _CONTAIN_DF_CAP)
        .select("sh")
    )
    posting = sh.join(keep, "sh")
    inter = (
        posting.select(F.col("doc_id").alias("id_a"), "sh")
        .join(posting.select(F.col("doc_id").alias("id_b"), "sh"), "sh")
        .where(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    return (
        inter.join(
            sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("n_a")),
            "id_a",
        )
        .withColumn(
            "containment_ppm",
            F.expr("(n_common * 1000000) DIV n_a").cast("long"),
        )
        .where(F.col("containment_ppm") >= _CONTAIN_MIN_PPM)
        .select(
            F.col("id_a").alias("contained_id"),
            F.col("id_b").alias("container_id"),
            "n_common",
            F.col("n_a").alias("n_contained_shingles"),
            "containment_ppm",
        )
        .orderBy("contained_id", "container_id")
    )


_CONTAINMENT_ORACLE = f"""
  WITH t AS (
    SELECT doc_id, {_TOKENS_SQL} AS toks
    FROM documents WHERE length(trim(text)) > 0
  ), s AS (
    SELECT DISTINCT doc_id, unnest({_SHINGLE_SQL_K3}) AS sh FROM t
  ), sizes AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM s GROUP BY 1
  ), keep AS (
    SELECT sh FROM (SELECT sh, count(*) AS df FROM s GROUP BY 1)
    WHERE df <= {_CONTAIN_DF_CAP}
  ), posting AS (
    SELECT s.doc_id, s.sh FROM s JOIN keep USING (sh)
  ), inter AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(count(*) AS BIGINT) AS n_common
    FROM posting a JOIN posting b ON a.sh = b.sh AND a.doc_id <> b.doc_id
    GROUP BY 1, 2
  )
  SELECT id_a AS contained_id, id_b AS container_id, n_common,
         z.n_sh AS n_contained_shingles,
         CAST((n_common * 1000000) // z.n_sh AS BIGINT) AS containment_ppm
  FROM inter JOIN sizes z ON inter.id_a = z.doc_id
  WHERE (n_common * 1000000) // z.n_sh >= {_CONTAIN_MIN_PPM}
  ORDER BY contained_id, container_id
"""


_N_SHARDS = 16


def llm_shard_manifest_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic shard manifest — the dataset-publishing step every
    exported training set needs: assign each document to one of 16
    shards by the first 15 hex digits of md5('shard:' || doc_id)
    (re-run/repartition-stable, the stratified-sampling device), and
    report per shard: docs, token and char totals, doc-id range, and
    the balance deviation from the ideal 1/16 share in signed ppm —
    the number a publishing pipeline alerts on.

    Scale shape: map-only hash + token count, one 16-group agg
    (map-side combinable), one 16-row window for the totals.
    """
    docs = load_table(spark, sf_dir, "documents").where(is_nonblank(F.col("text")))
    shard = (
        F.conv(F.substring(F.md5(F.concat(F.lit("shard:"), F.col("doc_id"))), 1, 15), 16, 10)
        .cast("long")
        % _N_SHARDS
    )
    per_doc = docs.select(
        shard.alias("shard"),
        F.col("doc_id"),
        F.size(tokens(F.col("text"))).cast("long").alias("n_tok"),
        F.length("text").cast("long").alias("n_char"),
    )
    hist = per_doc.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
        F.sum("n_char").cast("long").alias("n_chars"),
        F.min("doc_id").cast("long").alias("min_doc_id"),
        F.max("doc_id").cast("long").alias("max_doc_id"),
    )
    one = Window.partitionBy(F.lit(1))
    return (
        hist.withColumn("_t", F.sum("n_docs").over(one))
        .select(
            "shard",
            "n_docs",
            "n_tokens",
            "n_chars",
            "min_doc_id",
            "max_doc_id",
            (
                F.expr(f"(n_docs * 1000000 * {_N_SHARDS}) DIV _t").cast("long")
                - F.lit(1_000_000)
            ).alias("balance_dev_ppm"),
        )
        .orderBy("shard")
    )


_SHARD_ORACLE = f"""
  WITH per_doc AS (
    SELECT CAST((
        (strpos('0123456789abcdef', substr(md5('shard:' || doc_id), 1, 1)) - 1) * 4503599627370496
      + CAST(('0x' || substr(md5('shard:' || doc_id), 2, 14)) AS BIGINT)
      ) % {_N_SHARDS} AS BIGINT) AS shard,
      doc_id,
      CAST(len({_TOKENS_SQL}) AS BIGINT) AS n_tok,
      CAST(length(text) AS BIGINT) AS n_char
    FROM documents WHERE length(trim(text)) > 0
  ), hist AS (
    SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           CAST(sum(n_char) AS BIGINT) AS n_chars,
           CAST(min(doc_id) AS BIGINT) AS min_doc_id,
           CAST(max(doc_id) AS BIGINT) AS max_doc_id
    FROM per_doc GROUP BY 1
  )
  SELECT shard, n_docs, n_tokens, n_chars, min_doc_id, max_doc_id,
         CAST((n_docs * 1000000 * {_N_SHARDS}) // sum(n_docs) OVER () AS BIGINT)
           - 1000000 AS balance_dev_ppm
  FROM hist ORDER BY shard
"""


_QUANT = 1_000_000  # per-dimension e6 quantization of embeddings


def sim_source_centroid_drift_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids and their pairwise cosine — the
    corpus-drift monitor for embedding spaces (two labels whose
    centroids drift apart are candidates for separate index shards or
    re-embedding). Float sums are order-dependent, so every embedding
    coordinate is quantized to an e6 integer FIRST; centroid sums, dot
    products, and norms are then exact integer arithmetic on
    DECIMAL(38,0) (64 dims × (1e6)² products overflow int64 — the
    cohen-kappa precedent), and only the final cosine touches doubles
    (sqrt), rounded half-up to e4.

    Scale shape: posexplode → (label, dim) integer agg (map-side
    combinable, |labels|·64 rows) → dim-keyed pair join on the bounded
    centroid frame (|labels|²·64) → pair agg. The corpus is scanned
    once; everything after the first agg is label-domain-bounded.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "label", F.posexplode("embedding").alias("dim", "x")
    ).select(
        "label",
        "dim",
        F.floor(F.col("x").cast("double") * _QUANT + F.lit(0.5))
        .cast("long")
        .alias("q"),
    )
    cent = dims.groupBy("label", "dim").agg(
        F.sum("q").cast("decimal(38,0)").alias("s"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    a = cent.select(
        F.col("label").alias("label_a"),
        "dim",
        F.col("s").alias("sa"),
        F.col("n").alias("na"),
    )
    b = cent.select(
        F.col("label").alias("label_b"),
        "dim",
        F.col("s").alias("sb"),
        F.col("n").alias("nb"),
    )
    pairs = (
        a.join(b, "dim")
        .where(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(
            F.sum(F.col("sa") * F.col("sb")).cast("decimal(38,0)").alias("dot"),
            F.sum(F.col("sa") * F.col("sa")).cast("decimal(38,0)").alias("naa"),
            F.sum(F.col("sb") * F.col("sb")).cast("decimal(38,0)").alias("nbb"),
            F.max("na").cast("long").alias("n_a"),
            F.max("nb").cast("long").alias("n_b"),
        )
    )
    cos = F.col("dot").cast("double") / (
        F.sqrt(F.col("naa").cast("double")) * F.sqrt(F.col("nbb").cast("double"))
    )
    return pairs.select(
        "label_a",
        "label_b",
        "n_a",
        "n_b",
        F.floor(cos * 10000 + F.lit(0.5)).cast("long").alias("cosine_e4"),
    ).orderBy("label_a", "label_b")


_CENTROID_ORACLE = """
  WITH dims AS (
    SELECT label, generate_subscripts(embedding, 1) - 1 AS dim,
           CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5)
                AS BIGINT) AS q
    FROM embeddings
  ), cent AS (
    SELECT label, dim, CAST(sum(q) AS HUGEINT) AS s,
           CAST(count(*) AS BIGINT) AS n
    FROM dims GROUP BY 1, 2
  ), pairs AS (
    SELECT a.label AS label_a, b.label AS label_b,
           sum(a.s * b.s) AS dot,
           sum(a.s * a.s) AS naa,
           sum(b.s * b.s) AS nbb,
           CAST(max(a.n) AS BIGINT) AS n_a,
           CAST(max(b.n) AS BIGINT) AS n_b
    FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
    GROUP BY 1, 2
  )
  SELECT label_a, label_b, n_a, n_b,
         CAST(floor((CAST(dot AS DOUBLE)
                     / (sqrt(CAST(naa AS DOUBLE)) * sqrt(CAST(nbb AS DOUBLE))))
                    * 10000 + 0.5) AS BIGINT) AS cosine_e4
  FROM pairs ORDER BY label_a, label_b
"""


#: shared literal stopword list (both engines see the same string set)
_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "be", "this", "that", "are",
)


def text_stopword_profile_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source stopword/short-token quality profile — the two
    cheapest Gopher-adjacent signals not yet in the quality family:
    stopword-occurrence share and short-token (<= 2 chars) share, plus
    integer mean token length (e2). Natural text has a stable stopword
    band; templated or keyword-stuffed text falls outside it.

    Scale shape: token explode → per-source counting agg with literal
    IN-list predicates (map-only before the single agg).
    """
    docs = load_table(spark, sf_dir, "documents").where(is_nonblank(F.col("text")))
    tok = docs.select("source", F.explode(tokens(F.col("text"))).alias("t"))
    is_stop = F.col("t").isin(*_STOPWORDS).cast("long")
    is_short = (F.length("t") <= 2).cast("long")
    return (
        tok.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(is_stop).cast("long").alias("n_stopword"),
            F.sum(is_short).cast("long").alias("n_short"),
            F.sum(F.length("t")).cast("long").alias("_chars"),
        )
        .select(
            "source",
            "n_tokens",
            F.expr("(n_stopword * 1000000) DIV n_tokens").cast("long").alias("stopword_ppm"),
            F.expr("(n_short * 1000000) DIV n_tokens").cast("long").alias("short_token_ppm"),
            F.expr("(_chars * 100) DIV n_tokens").cast("long").alias("avg_token_len_e2"),
        )
        .orderBy("source")
    )


_STOPWORD_ORACLE = f"""
  WITH tok AS (
    SELECT source, unnest({_TOKENS_SQL}) AS t
    FROM documents WHERE length(trim(text)) > 0
  ), agg AS (
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CAST(t IN ({', '.join("'" + w + "'" for w in _STOPWORDS)})
                         AS BIGINT)) AS BIGINT) AS n_stopword,
           CAST(sum(CAST(length(t) <= 2 AS BIGINT)) AS BIGINT) AS n_short,
           CAST(sum(length(t)) AS BIGINT) AS chars
    FROM tok GROUP BY 1
  )
  SELECT source, n_tokens,
         CAST((n_stopword * 1000000) // n_tokens AS BIGINT) AS stopword_ppm,
         CAST((n_short * 1000000) // n_tokens AS BIGINT) AS short_token_ppm,
         CAST((chars * 100) // n_tokens AS BIGINT) AS avg_token_len_e2
  FROM agg ORDER BY source
"""


def lineitem_supplier_hhi_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier revenue concentration: per-supplier share of lineitem
    revenue (exact cents) in ppm and the Herfindahl-Hirschman index
    Σ share_ppm² // 1e6 — the standard concentration index (≈ 1e6/N
    when perfectly even across N suppliers, 1 000 000 when one supplier
    ships everything; antitrust's 'highly concentrated' is HHI > 2500
    on the 1e4 scale = 250 000 here). One row: suppliers, revenue, HHI,
    the max single-supplier share, and that supplier (ties broken by
    suppkey).

    Scale shape: one supplier-keyed agg (map-side combinable); the
    total is a 1-row broadcast (an ``OVER ()`` window here would drag
    every supplier row into ONE window partition — suppliers grow with
    the corpus, so that's a skew bomb, not a bounded frame); HHI is a
    second 1-row agg; the top supplier is a global top-1
    (TakeOrderedAndProject). Assembly is the triangle-count 1-row
    cross-join pattern.
    """
    li = load_table(spark, sf_dir, "lineitem")
    per_supp = li.groupBy("l_suppkey").agg(
        F.sum(rnd_cents(F.col("l_extendedprice"))).cast("long").alias("cents")
    )
    totals = per_supp.agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
        F.sum("cents").cast("long").alias("revenue_cents"),
    )
    shares = per_supp.crossJoin(F.broadcast(totals)).withColumn(
        "share_ppm", F.expr("(cents * 1000000) DIV revenue_cents").cast("long")
    )
    hhi = shares.agg(
        F.expr("sum(share_ppm * share_ppm) DIV 1000000").cast("long").alias("hhi")
    )
    top = (
        shares.orderBy(F.col("share_ppm").desc(), F.col("l_suppkey").asc())
        .limit(1)
        .select(
            F.col("share_ppm").alias("top_share_ppm"),
            F.col("l_suppkey").cast("long").alias("top_suppkey"),
        )
    )
    return (
        totals.crossJoin(F.broadcast(hhi))
        .crossJoin(F.broadcast(top))
        .select(
            "n_suppliers",
            "revenue_cents",
            "hhi",
            "top_share_ppm",
            "top_suppkey",
        )
    )


_SUPPLIER_HHI_ORACLE = f"""
  WITH per_supp AS (
    SELECT l_suppkey,
           CAST(sum({rnd_cents_sql('l_extendedprice')}) AS BIGINT) AS cents
    FROM lineitem GROUP BY 1
  ), shares AS (
    SELECT l_suppkey, cents,
           CAST((cents * 1000000) // sum(cents) OVER () AS BIGINT) AS share_ppm,
           CAST(count(*) OVER () AS BIGINT) AS n_suppliers,
           CAST(sum(cents) OVER () AS BIGINT) AS revenue_cents
    FROM per_supp
  )
  SELECT n_suppliers, revenue_cents,
         CAST(sum(share_ppm * share_ppm) OVER () // 1000000 AS BIGINT) AS hhi,
         share_ppm AS top_share_ppm,
         CAST(l_suppkey AS BIGINT) AS top_suppkey
  FROM shares
  ORDER BY share_ppm DESC, l_suppkey ASC
  LIMIT 1
"""


def part_price_dispersion_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand retail-price dispersion: exact integer moments in
    cents (Σx and Σx² on DECIMAL(38,0) — cent-squared sums overflow
    int64 at scale, the cohen-kappa precedent), population variance
    from the moments, and the coefficient of variation in e4 (the
    only float step is one sqrt + one division, rounded half-up).
    Brands whose CV explodes have mispriced or mistyped parts.

    Scale shape: map-only cents projection → one brand-keyed agg
    (map-side combinable) → |brands|-row arithmetic.
    """
    part = load_table(spark, sf_dir, "part")
    cents = rnd_cents(F.col("p_retailprice"))
    agg = part.select(F.col("p_brand").alias("brand"), cents.alias("c")).groupBy(
        "brand"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum("c").cast("decimal(38,0)").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("decimal(38,0)").alias("s2"),
    )
    # population variance * n^2 = n*s2 - s1^2 (exact integers)
    var_num = (F.col("n_parts") * F.col("s2") - F.col("s1") * F.col("s1")).cast(
        "decimal(38,0)"
    )
    mean_e2 = F.expr("CAST(s1 AS DECIMAL(38,0)) DIV n_parts").cast("long")
    cv = F.sqrt(var_num.cast("double")) / F.col("s1").cast("double")
    return agg.select(
        "brand",
        "n_parts",
        mean_e2.alias("mean_cents"),
        F.floor(cv * 10000 + F.lit(0.5)).cast("long").alias("cv_e4"),
    ).orderBy("brand")


_DISPERSION_ORACLE = f"""
  WITH agg AS (
    SELECT p_brand AS brand,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum({rnd_cents_sql('p_retailprice')}) AS HUGEINT) AS s1,
           CAST(sum(CAST({rnd_cents_sql('p_retailprice')} AS HUGEINT)
                    * {rnd_cents_sql('p_retailprice')}) AS HUGEINT) AS s2
    FROM part GROUP BY 1
  )
  SELECT brand, n_parts,
         CAST(s1 // n_parts AS BIGINT) AS mean_cents,
         CAST(floor((sqrt(CAST(n_parts * s2 - s1 * s1 AS DOUBLE))
                     / CAST(s1 AS DOUBLE)) * 10000 + 0.5) AS BIGINT) AS cv_e4
  FROM agg ORDER BY brand
"""


PENDING: tuple[PendingQuery, ...] = (
    PendingQuery(
        "dedup_shingle_containment",
        dedup_shingle_containment_query,
        _CONTAINMENT_ORACLE,
        tags=("dedup", "containment", "broder", "df-capped", "integer-exact"),
    ),
    PendingQuery(
        "llm_shard_manifest",
        llm_shard_manifest_query,
        _SHARD_ORACLE,
        tags=("llmops", "sharding", "manifest", "md5", "integer-exact"),
    ),
    PendingQuery(
        "sim_source_centroid_drift",
        sim_source_centroid_drift_query,
        _CENTROID_ORACLE,
        tags=("similarity", "centroid", "drift", "quantized",
              "decimal38", "integer-exact"),
    ),
    PendingQuery(
        "text_stopword_profile",
        text_stopword_profile_query,
        _STOPWORD_ORACLE,
        tags=("text", "quality", "stopwords", "integer-exact"),
    ),
    PendingQuery(
        "lineitem_supplier_hhi",
        lineitem_supplier_hhi_query,
        _SUPPLIER_HHI_ORACLE,
        tags=("lineitem", "concentration", "hhi", "integer-exact"),
    ),
    PendingQuery(
        "part_price_dispersion",
        part_price_dispersion_query,
        _DISPERSION_ORACLE,
        tags=("part", "dispersion", "cv", "decimal38", "integer-exact"),
    ),
)
