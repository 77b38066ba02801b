"""Round-14 declared-query staging area — the web-text axis
(operators/webtext.py) SURVEY.md §2.12 lists as testdata-blocked:
paragraph-level dedup and URL/domain statistics (NOTES_r05 item 3 —
the driver's documents carry no newlines and no URLs).

Unblocking device: each query SYNTHESIZES the web structure
deterministically from the documents table inside the query itself —
token-chunked paragraphs joined with real ``\\n`` separators plus
per-source header/footer template paragraphs (the C4/RefinedWeb
boilerplate shape), and embedded ``https?://`` URLs — with the
IDENTICAL synthesis stated in the DuckDB oracle. The operators under
test therefore process genuine newline/URL-bearing text AND carry
exact cross-engine oracles, which a spark-warehouse-local fixture
could never give (the driver's oracle sees only the sf tables).
Operator semantics on hand-built multiline/URL fixtures are pinned by
``tests/test_webtext.py``; this module pins them at corpus scale.

Per-wave staging module (ADVICE r06: pending edits must never share a
file with already-evidenced queries — this file holds ONLY round-14
wave queries and is imported by nothing evidenced).

Cross-engine exactness rules carried from earlier waves: ratios are
integer parts-per-million via ``DIV`` / ``//``, every ORDER BY carries
a deterministic key, all counters CAST to BIGINT on both sides.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.io import load_table
from spotify_data_pipeline_spark.operators.webtext import (
    extract_urls,
    remove_boilerplate_paragraphs,
    split_paragraphs,
    url_domain,
)


@dataclass(frozen=True)
class PendingQuery:
    name: str
    fn: object
    oracle: str | None
    headline: bool = False
    tags: tuple[str, ...] = ()


_CHUNK = 8  # tokens per synthesized paragraph
_MIN_DF = 3  # paragraphs in >= this many docs (per source) are template


def _synth_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> newline-separated 'web pages': per-source header +
    8-token content paragraphs + per-source footer. Header/footer are
    the template paragraphs every page of a 'site' (source) repeats —
    exactly the boilerplate the C4 screen removes."""
    from spotify_data_pipeline_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    npar = F.floor((F.size(toks) + F.lit(_CHUNK - 1)) / _CHUNK).cast("int")
    content = F.when(
        npar > 0,
        F.transform(
            F.sequence(F.lit(0), npar - 1),
            lambda i: F.array_join(F.slice(toks, i * _CHUNK + 1, _CHUNK), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    header = F.concat(F.lit("about "), F.lower("source"), F.lit(" catalog pages"))
    footer = F.concat(F.lit("contact "), F.lower("source"), F.lit(" support team"))
    page = F.array_join(
        F.concat(F.array(header), content, F.array(footer)), "\n"
    )
    return docs.select("doc_id", "source", page.alias("text"))


# shared synthesis SQL: (doc_id, source, text) pages with chr(10) seps
_PAGES_SQL = r"""
  base AS (
    SELECT doc_id, source,
           string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks,
           length(trim(text)) > 0 AS nonblank
    FROM documents
  ), pages AS (
    SELECT doc_id, source,
      array_to_string(
        ['about ' || lower(source) || ' catalog pages']
        || CASE WHEN nonblank
             THEN list_transform(
                    range(0, CAST(floor((len(toks) + 7) / 8.0) AS INT)),
                    i -> array_to_string(toks[i*8+1 : i*8+8], ' '))
             ELSE []::VARCHAR[] END
        || ['contact ' || lower(source) || ' support team'],
        chr(10)) AS text
    FROM base
  )
"""


def text_paragraph_dedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level boilerplate dedup report (C4 §2.2 / RefinedWeb
    line-wise filtering): synthesize newline-separated pages, remove
    every occurrence of any paragraph that appears in >= 3 distinct
    docs of its source (the per-site template rule), and report per
    source: page count, paragraph totals/distincts, how many template
    paragraphs were found, occurrence counts removed vs kept, and the
    total character length of the CLEANED reassembled pages — the last
    column pins the operator's reassembly semantics (paragraph order +
    separator), not just its counting.

    Scale shape: paragraph df-count and verdict join both shuffle on
    the (source, paragraph) key — a hot template paragraph is one
    grouped row, never a skew cell; reassembly is one page-keyed agg;
    the report is |sources| rows. No joins wider than the paragraph
    key, nothing driver-side.
    """
    pages = _synth_pages(spark, sf_dir)
    paras = split_paragraphs(pages)
    freq = paras.groupBy("source", "para").agg(
        F.count_distinct("doc_id").alias("df_"), F.count(F.lit(1)).alias("occ")
    )
    stats = freq.groupBy("source").agg(
        F.sum("occ").cast("long").alias("paras_total"),
        F.count(F.lit(1)).cast("long").alias("paras_distinct"),
        F.sum(F.when(F.col("df_") >= _MIN_DF, 1).otherwise(0))
        .cast("long")
        .alias("boiler_distinct"),
        F.coalesce(F.sum(F.when(F.col("df_") >= _MIN_DF, F.col("occ"))), F.lit(0))
        .cast("long")
        .alias("occ_removed"),
        F.coalesce(F.sum(F.when(F.col("df_") < _MIN_DF, F.col("occ"))), F.lit(0))
        .cast("long")
        .alias("occ_kept"),
    )
    cleaned = remove_boilerplate_paragraphs(
        pages, "doc_id", "text", ("source",), _MIN_DF
    )
    lens = cleaned.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_pages"),
        F.sum(F.length("text")).cast("long").alias("cleaned_chars_sum"),
    )
    return (
        stats.join(lens, "source")
        .select(
            "source",
            "n_pages",
            "paras_total",
            "paras_distinct",
            "boiler_distinct",
            "occ_removed",
            "occ_kept",
            "cleaned_chars_sum",
        )
        .orderBy("source")
    )


_PARAGRAPH_DEDUP_ORACLE = (
    "WITH "
    + _PAGES_SQL
    + r""",
  paras AS (
    SELECT doc_id, source,
           unnest(string_split(text, chr(10))) AS para,
           unnest(range(0, len(string_split(text, chr(10))))) AS para_idx
    FROM pages
  ), freq AS (
    SELECT source, para, count(DISTINCT doc_id) AS df_, count(*) AS occ
    FROM paras GROUP BY 1, 2
  ), stats AS (
    SELECT source,
           CAST(sum(occ) AS BIGINT) AS paras_total,
           CAST(count(*) AS BIGINT) AS paras_distinct,
           CAST(sum(CASE WHEN df_ >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS boiler_distinct,
           CAST(coalesce(sum(CASE WHEN df_ >= 3 THEN occ END), 0) AS BIGINT) AS occ_removed,
           CAST(coalesce(sum(CASE WHEN df_ < 3 THEN occ END), 0) AS BIGINT) AS occ_kept
    FROM freq GROUP BY 1
  ), kept AS (
    SELECT p.doc_id, p.source, p.para_idx, p.para
    FROM paras p JOIN freq f ON p.source = f.source AND p.para = f.para
    WHERE f.df_ < 3
  ), cleaned AS (
    SELECT doc_id, source, string_agg(para, chr(10) ORDER BY para_idx) AS text
    FROM kept GROUP BY 1, 2
  ), lens AS (
    SELECT g.source,
           CAST(count(*) AS BIGINT) AS n_pages,
           CAST(sum(coalesce(length(c.text), 0)) AS BIGINT) AS cleaned_chars_sum
    FROM pages g LEFT JOIN cleaned c ON g.doc_id = c.doc_id
    GROUP BY 1
  )
  SELECT s.source, n_pages, paras_total, paras_distinct, boiler_distinct,
         occ_removed, occ_kept, cleaned_chars_sum
  FROM stats s JOIN lens l ON s.source = l.source
  ORDER BY s.source
"""
)


def text_url_domain_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL extraction + per-domain source-mix report (the curation
    stats every web-pipeline publishes; Dolma / RefinedWeb report
    exactly this table): embed two deterministic URLs per document
    (one https per-source host, one http CDN host sharded by
    doc_id % 7), extract with the regex operator, parse the authority,
    and report per domain: URL occurrences, distinct documents, https
    count, and each domain's exact ppm share of all URLs.

    Scale shape: extraction is map-only; the aggregate keys on domain
    (web-bounded cardinality); the ppm total is a window over the
    |domains|-row frame, never over the corpus. No joins at all.
    """
    docs = load_table(spark, sf_dir, "documents")
    page = F.concat(
        F.col("text"),
        F.lit(" visit https://"),
        F.lower("source"),
        F.lit(".example.com/doc/"),
        F.col("doc_id").cast("string"),
        F.lit(" mirror http://cdn-"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".example.net/asset?id="),
        F.col("doc_id").cast("string"),
    )
    urls = extract_urls(docs.select("doc_id", page.alias("text")))
    per_domain = (
        urls.select("doc_id", "url", url_domain(F.col("url")).alias("domain"))
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.count_distinct("doc_id").cast("long").alias("n_docs"),
            F.sum(F.when(F.col("url").startswith("https://"), 1).otherwise(0))
            .cast("long")
            .alias("n_https"),
        )
    )
    w = Window.partitionBy(F.lit(1))
    return (
        per_domain.withColumn("_total", F.sum("n_urls").over(w))
        .withColumn(
            "url_share_ppm",
            F.expr("(n_urls * 1000000) DIV _total").cast("long"),
        )
        .drop("_total")
        .orderBy("domain")
    )


_URL_DOMAIN_ORACLE = r"""
  WITH pages AS (
    SELECT doc_id,
           text || ' visit https://' || lower(source) || '.example.com/doc/' || doc_id
                || ' mirror http://cdn-' || (doc_id % 7) || '.example.net/asset?id=' || doc_id
             AS text
    FROM documents
  ), urls AS (
    SELECT doc_id, unnest(regexp_extract_all(text, 'https?://[^\s]+')) AS url
    FROM pages
  ), per_domain AS (
    SELECT regexp_extract(url, '^https?://([^/\s]+)', 1) AS domain,
           CAST(count(*) AS BIGINT) AS n_urls,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN url LIKE 'https://%' THEN 1 ELSE 0 END) AS BIGINT) AS n_https
    FROM urls GROUP BY 1
  )
  SELECT domain, n_urls, n_docs, n_https,
         CAST((n_urls * 1000000) // sum(n_urls) OVER () AS BIGINT) AS url_share_ppm
  FROM per_domain
  ORDER BY domain
"""


PENDING: tuple[PendingQuery, ...] = (
    PendingQuery(
        "text_paragraph_dedup",
        text_paragraph_dedup_query,
        _PARAGRAPH_DEDUP_ORACLE,
        tags=("text", "dedup", "paragraph", "boilerplate", "c4",
              "integer-exact"),
    ),
    PendingQuery(
        "text_url_domain_stats",
        text_url_domain_stats_query,
        _URL_DOMAIN_ORACLE,
        tags=("text", "url", "domain", "source-mix", "integer-exact"),
    ),
)
