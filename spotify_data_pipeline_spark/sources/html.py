"""HTML table scan (SURVEY.md §2.1 S1 — the kworb.net seed scrape).

The reference selects ``#artistsext tr:has(td)`` rows and projects
column index 1 (data/artist_names_kworb/crawl_artist_names.py:5-12) —
an HTML *table* is just another tabular source. Re-expressed
Spark-side: whole-file text scan → regexp table/row/cell extraction,
all Catalyst expressions (regexp_extract / regexp_extract_all /
explode), no Python parsing. Row filtering mirrors ``tr:has(td)``:
header rows (th-only) produce an empty cell array and are dropped.

This is a layout-targeted extractor for known table markup (the
reference's use case), not a general HTML parser — nested tables
inside cells are out of scope, as they are for the reference's CSS
selector too. Fetching the page is still out-of-engine (no network in
the engine); the scan consumes a saved .html file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def scan_html_table(
    spark: SparkSession,
    path: str,
    table_id: str,
    column_index: int = 1,
    column_name: str = "value",
) -> DataFrame:
    """One row per ``<tr>`` holding ``<td>`` cells of the table with
    ``id=table_id``; projects the ``column_index``-th (0-based) cell,
    tags stripped, whitespace normalized.
    """
    html = spark.read.text(path, wholetext=True)
    table = F.regexp_extract(
        "value", f'(?is)<table[^>]*id="{table_id}"[^>]*>(.*?)</table>', 1
    )
    rows = F.expr(
        "regexp_extract_all(_table, '(?is)<tr[^>]*>(.*?)</tr>', 1)"
    )
    cells = F.expr(
        "regexp_extract_all(_row, '(?is)<td[^>]*>(.*?)</td>', 1)"
    )
    strip_tags = lambda c: F.regexp_replace(  # noqa: E731
        F.regexp_replace(c, r"(?s)<[^>]*>", ""), r"\s+", " "
    )
    return (
        html.select(table.alias("_table"))
        .select(F.explode(rows).alias("_row"))
        .select(cells.alias("_cells"))
        .where(F.size("_cells") > column_index)  # tr:has(td) + arity guard
        .select(
            F.trim(strip_tags(F.element_at("_cells", column_index + 1))).alias(
                column_name
            )
        )
    )
