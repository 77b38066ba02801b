"""Declared text-analysis queries (SURVEY.md §2.9 F1-F8 + §2.12).

Scalar-function parity queries (string/date/math/json) plus the
LLM-pipeline text operators over the documents table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.functions.text import normalize_whitespace, tokens
from spotify_data_pipeline_spark.io import load_table
from spotify_data_pipeline_spark.operators.textops import (
    fingerprint_md5,
    language_id,
    language_id_sql,
    quality_features,
    token_count,
)
from spotify_data_pipeline_spark.plans.parity import rnd
from spotify_data_pipeline_spark.plans.registry import declare


@declare(
    "fn_string_suite",
    oracle="""
    SELECT
      p_partkey                                   AS part_id,
      upper(p_brand)                              AS brand_upper,
      lower(p_type)                               AS type_lower,
      substr(p_name, 1, 10)                       AS name_prefix,
      concat(p_brand, ':', p_type)                AS brand_type,
      CAST(length(p_name) AS BIGINT)              AS name_len,
      CASE WHEN p_name LIKE '%gold%' THEN 1 ELSE 0 END AS has_gold,
      array_to_string(string_split(p_type, ' '), '|') AS type_words,
      printf('batch_%06d', p_partkey)               AS batch_label,
      lpad(CAST(p_partkey AS VARCHAR), 9, '0')      AS key_padded
    FROM part
    """,
    tags=("functions", "string"),
)
def fn_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function parity: substr/upper/lower/concat/like/split/length
    (SURVEY §2.9 F8) + zero-padded formatting (F3 — the reference's
    `f'batch_{id:06d}'`, create_artist_batches.py:34,
    search_artist_id_and_name.py:48) via format_string and lpad."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        F.col("p_partkey").alias("part_id"),
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.substring("p_name", 1, 10).alias("name_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").cast("long").alias("name_len"),
        F.when(F.col("p_name").like("%gold%"), 1).otherwise(0).cast("int").alias("has_gold"),
        F.array_join(F.split("p_type", " "), "|").alias("type_words"),
        F.format_string("batch_%06d", "p_partkey").alias("batch_label"),
        F.lpad(F.col("p_partkey").cast("string"), 9, "0").alias("key_padded"),
    )


@declare(
    "fn_normalize_whitespace",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(text, '\\s+', ' ', 'g')) AS text_norm,
           replace(source, '"', '\\"')                  AS source_escaped
    FROM documents
    """,
    tags=("functions", "string"),
)
def fn_normalize_whitespace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's exact string ops: whitespace normalization
    `' '.join(s.strip().split())` (search_artist_id_and_name.py:21, F1)
    and quote escaping `s.replace('"','\\"')` (ibid.:38, F2)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        normalize_whitespace(F.col("text")).alias("text_norm"),
        F.regexp_replace("source", '"', '\\\\"').alias("source_escaped"),
    )


@declare(
    "fn_date_suite",
    oracle="""
    SELECT
      o_orderkey                                         AS order_id,
      CAST(year(o_orderdate) AS BIGINT)                  AS order_year,
      CAST(month(o_orderdate) AS BIGINT)                 AS order_month,
      date_trunc('quarter', o_orderdate)                 AS order_quarter,
      CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01') AS BIGINT) AS days_to_2002,
      CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP)  AS plus3m,
      strftime(o_orderdate, '%Y%m%d')                    AS ds_nodash
    FROM orders
    """,
    tags=("functions", "date"),
)
def fn_date_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-function parity: year/month/date_trunc/datediff/add_months +
    the reference's `ds_nodash` partition-key format (F4,
    spotify_etl_v2.py:93-94,104)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").alias("order_id"),
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.date_trunc("quarter", "o_orderdate").alias("order_quarter"),
        F.datediff(F.lit("2002-01-01").cast("timestamp"), "o_orderdate")
        .cast("long")
        .alias("days_to_2002"),
        F.add_months("o_orderdate", 3).cast("timestamp").alias("plus3m"),
        F.date_format("o_orderdate", "yyyyMMdd").alias("ds_nodash"),
    )


@declare(
    "fn_math_suite",
    oracle="""
    SELECT
      l_orderkey AS order_id, l_linenumber AS line_no,
      floor((abs(l_discount - 0.05)) * 10000 + 0.5) / 10000               AS disc_dev,
      floor((power(l_quantity, 2)) * 100 + 0.5) / 100                 AS qty_sq,
      CAST(ceil(l_extendedprice / 1000) AS BIGINT)   AS price_kilo,
      CAST(floor(l_quantity) AS BIGINT)              AS qty_floor,
      floor((l_extendedprice * l_discount) * 100 + 0.5) / 100         AS discount_value,
      CAST(l_quantity AS INT) % 7                    AS qty_mod7
    FROM lineitem
    """,
    tags=("functions", "math"),
)
def fn_math_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math-function parity: round/abs/pow/ceil/floor/mod (F8)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").alias("order_id"),
        F.col("l_linenumber").alias("line_no"),
        rnd(F.abs(F.col("l_discount") - 0.05), 4).alias("disc_dev"),
        rnd(F.pow("l_quantity", 2), 2).alias("qty_sq"),
        F.ceil(F.col("l_extendedprice") / 1000).cast("long").alias("price_kilo"),
        F.floor("l_quantity").cast("long").alias("qty_floor"),
        rnd(F.col("l_extendedprice") * F.col("l_discount"), 2).alias("discount_value"),
        (F.col("l_quantity").cast("int") % 7).alias("qty_mod7"),
    )


@declare(
    "fn_array_suite",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_split_to_array(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS BIGINT)
             AS n_tokens,
           regexp_split_to_array(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')[1]
             AS first_token,
           CAST(len(list_filter(
             regexp_split_to_array(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' '),
             t -> length(t) > 5)) AS BIGINT) AS n_long_tokens
    FROM documents
    """,
    tags=("functions", "array"),
)
def fn_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array + higher-order-function parity: split/size/element_at/filter
    (F8). The lambda stays JVM-side (codegen) — no UDF."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.element_at(toks, 1).alias("first_token"),
        F.size(F.filter(toks, lambda t: F.length(t) > 5)).cast("long").alias("n_long_tokens"),
    )


@declare(
    "text_token_stats",
    oracle="""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(regexp_split_to_array(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' '))) AS BIGINT)
             AS total_tokens,
           floor((avg(len(regexp_split_to_array(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')))) * 100 + 0.5) / 100
             AS avg_tokens,
           floor((avg(n_chars)) * 100 + 0.5) / 100 AS avg_chars
    FROM documents
    GROUP BY source
    """,
    headline=True,
    tags=("text", "agg"),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting rolled up per source (SURVEY §2.12 text analysis)."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = token_count("text")
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(n_tok).cast("long").alias("total_tokens"),
        rnd(F.avg(n_tok), 2).alias("avg_tokens"),
        rnd(F.avg("n_chars"), 2).alias("avg_chars"),
    )


@declare(
    "text_quality_score",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             regexp_split_to_array(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks,
             trim(regexp_replace(text, '\\s+', ' ', 'g')) AS norm
      FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq_tokens,
           floor((len(list_distinct(toks)) / greatest(len(toks), 1)) * 10000 + 0.5) / 10000 AS uniq_ratio,
           floor((length(regexp_replace(norm, '[\\w\\s]', '', 'g')) / greatest(length(norm), 1)) * 10000 + 0.5) / 10000
             AS punct_ratio,
           floor((len(list_filter(toks,
             t -> t IN ('the','and','of','to','in','is','that','for','with','a')))
             / greatest(len(toks), 1)) * 10000 + 0.5) / 10000 AS stopword_ratio
    FROM t
    """,
    tags=("text", "quality"),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features (length/punct/stopword ratios —
    SURVEY §2.12). Map-only: no shuffle at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    feat = quality_features(docs, "text")
    return feat.select(
        "doc_id", "n_tokens", "n_uniq_tokens", "uniq_ratio", "punct_ratio", "stopword_ratio"
    )


@declare(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
    FROM documents
    """,
    tags=("text", "fingerprint"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-content md5 fingerprint (SURVEY §2.12)."""
    docs = load_table(spark, sf_dir, "documents")
    return fingerprint_md5(docs, "text").select("doc_id", "fingerprint")


@declare(
    "text_language_id",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang,
             CASE WHEN length(trim(text)) > 0
                  THEN string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')
                  ELSE CAST([] AS VARCHAR[]) END AS toks
      FROM documents
    )
    SELECT doc_id, lang, __LANGID__ AS pred_lang FROM t
    """.replace("__LANGID__", language_id_sql("toks")),
    tags=("text", "langid"),
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic stopword-profile language ID per document (§2.12);
    output (doc_id, lang, pred_lang). Upgraded from rows-only in round
    2: the oracle replicates the classifier exactly (stopword profiles
    single-sourced in textops.language_id_sql), so even the heuristic
    classifier hash-matches."""
    docs = load_table(spark, sf_dir, "documents")
    return language_id(docs, "text").select("doc_id", "lang", "pred_lang")


@declare(
    "text_bpe_token_count",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^\sA-Za-z0-9_]')) AS BIGINT)
             AS n_bpe_tokens
    FROM documents
    """,
    tags=("text", "tokens"),
)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish subword token counting (SURVEY §2.12): words, numbers, and
    punctuation marks each count — the cheap stand-in for a real
    tokenizer when budgeting LLM training data. Upgraded from rows-only
    in round 2: the lookaround split was replaced with an RE2-compatible
    extract-all (functions/text.BPE_ISH_PATTERN), so DuckDB runs the
    identical regex and the count hash-matches."""
    from spotify_data_pipeline_spark.operators.textops import token_count_bpe_ish

    docs = load_table(spark, sf_dir, "documents")
    return token_count_bpe_ish(docs).select("doc_id", "n_bpe_tokens")


@declare(
    "fn_unpivot_metrics",
    oracle="""
    SELECT part_id, metric, value FROM (
      UNPIVOT (SELECT p_partkey AS part_id,
                      CAST(p_size AS DOUBLE) AS size,
                      CAST(p_retailprice AS DOUBLE) AS retailprice
               FROM part)
      ON size, retailprice INTO NAME metric VALUE value
    ) WHERE value IS NOT NULL
    """,
    tags=("functions", "unpivot"),
)
def fn_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshaping via df.unpivot (melt) — the inverse of the
    pivot surface in aggregates. One row per (part, metric).

    NULL semantics pinned explicitly: DuckDB's UNPIVOT drops NULL
    values by default while Spark's unpivot keeps them, so BOTH sides
    filter NULL metrics — the parity is structural, not dependent on
    TPC-H part happening to have no NULLs."""
    p = load_table(spark, sf_dir, "part")
    wide = p.select(
        F.col("p_partkey").alias("part_id"),
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").cast("double").alias("retailprice"),
    )
    return wide.unpivot(["part_id"], ["size", "retailprice"], "metric", "value").where(
        F.col("value").isNotNull()
    )
