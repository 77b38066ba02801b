"""Web-text structure operators: paragraph splitting, boilerplate
paragraph removal, and URL extraction/domain parsing.

The LLM-training-pipeline axis SURVEY.md §2.12 lists as
testdata-blocked until round 7 (NOTES_r05 item 3: the driver's
documents carry no newlines and no URLs): paragraph-level dedup is the
C4 (Raffel et al. '20) / RefinedWeb (Penedo et al. '23) boilerplate
screen — a paragraph repeated across many pages of a site (nav bars,
cookie banners, footers) is template, not content, and is dropped from
EVERY page before training; URL/domain statistics are the source-mix
report every curation run publishes.

All Catalyst built-ins (§2.11 policy: no row-level Python UDFs).

Scale shape:
- ``split_paragraphs`` is map-only (split + posexplode).
- ``remove_boilerplate_paragraphs`` shuffles once on the
  (scope, paragraph) key to compute document frequencies, then joins
  the verdict back on the same key — both exchanges are paragraph-
  keyed, never page-keyed, so a hot template paragraph is ONE grouped
  row, not a skew cell; reassembly is one page-keyed agg.
- ``extract_urls`` is map-only; ``domain stats`` aggregate on the
  domain key (bounded by the web's domain count, not by corpus size).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "split_paragraphs",
    "remove_boilerplate_paragraphs",
    "extract_urls",
    "url_domain",
]

#: full-match URL pattern, identical source string on both engines
#: (group 0 extraction — Spark needs the explicit idx=0).
URL_PATTERN = r"https?://[^\s]+"

#: capture the authority (domain[:port]) component.
DOMAIN_PATTERN = r"^https?://([^/\s]+)"


def split_paragraphs(
    df: DataFrame, text_col: str = "text", sep: str = "\n"
) -> DataFrame:
    """Explode ``text_col`` into (para_idx, para) rows on ``sep``,
    keeping every other column. para_idx is the 0-based position of
    the paragraph within its page — reassembly order rides on it.

    ``sep`` is a LITERAL separator: F.split takes a Java regex, so it
    is quoted with \\Q...\\E here (ADVICE r07 — a regex-special sep
    like '.' or '|' otherwise splits wrongly and breaks the
    split/rejoin round-trip that array_join and the DuckDB oracles,
    both literal-string APIs, rely on)."""
    other = [c for c in df.columns if c != text_col]
    quoted = "\\Q" + sep.replace("\\E", "\\E\\\\E\\Q") + "\\E"
    return df.select(
        *other,
        F.posexplode(F.split(F.col(text_col), quoted)).alias("para_idx", "para"),
    )


def remove_boilerplate_paragraphs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    scope_cols: tuple[str, ...] = (),
    min_doc_freq: int = 3,
    sep: str = "\n",
) -> DataFrame:
    """Drop every occurrence of any paragraph that appears in at least
    ``min_doc_freq`` DISTINCT documents (within ``scope_cols``, e.g.
    per source/site — template text is site-local), and reassemble each
    document's remaining paragraphs in original order joined by
    ``sep``.

    Returns one row per input document: (id_col, *scope_cols,
    cleaned text_col). Documents that were ALL boilerplate come back
    with an empty string (they survive as rows — dropping them is the
    caller's policy decision).
    """
    scope = list(scope_cols)
    paras = split_paragraphs(df.select(id_col, *scope, text_col), text_col, sep)
    freq = (
        paras.groupBy(*scope, "para")
        .agg(F.count_distinct(F.col(id_col)).alias("_df"))
        .where(F.col("_df") >= min_doc_freq)
        .select(*scope, "para", F.lit(True).alias("_boiler"))
    )
    kept = (
        paras.join(freq, on=scope + ["para"], how="left")
        .where(F.col("_boiler").isNull())
        .select(id_col, *scope, "para_idx", "para")
    )
    # collect_list is order-nondeterministic: sort (para_idx, para)
    # structs — para_idx is unique per doc, so the order is total.
    reassembled = kept.groupBy(id_col, *scope).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("para_idx", "para"))),
                lambda x: x["para"],
            ),
            sep,
        ).alias(text_col)
    )
    # all-boilerplate documents drop out of `kept`; restore them empty
    return (
        df.select(id_col, *scope)
        .join(reassembled, on=[id_col] + scope, how="left")
        .withColumn(text_col, F.coalesce(F.col(text_col), F.lit("")))
    )


def extract_urls(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One row per URL occurrence in ``text_col``: every other column
    kept, plus ``url``. Documents without URLs yield no rows."""
    other = [c for c in df.columns if c != text_col]
    return df.select(
        *other,
        F.explode(F.regexp_extract_all(F.col(text_col), F.lit(URL_PATTERN), 0)).alias(
            "url"
        ),
    )


def url_domain(url: Column | str) -> Column:
    """Authority (domain[:port]) of a URL column — regex, not
    parse_url, so the DuckDB oracle states the identical expression."""
    return F.regexp_extract(url, DOMAIN_PATTERN, 1)
