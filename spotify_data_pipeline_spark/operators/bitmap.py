"""Exact mergeable distinct counting over integer ids via word
bitmaps — the library form of the ClickHouse groupBitmap / Doris
BITMAP-column idea, and the EXACT member of the engine's mergeable-
summary family (HLL: approximate unions; KMV: approximate + overlap;
Misra-Gries/Count-Min: frequencies; HDR: quantiles; Bloom:
membership; bitmap: exact distinct).

Representation: id -> (word = id div 63, bit = id mod 63); a group's
state is its set of (word, OR-of-set-bits) rows. 63-bit words are
deliberate: bit 63 is never set because ``1::BIGINT << 63`` FAULTS in
DuckDB (measured — Out of Range) and sign-flips in Spark/Java, and an
always-non-negative word keeps every downstream popcount/compare
two's-complement-free in both engines.

Why this beats COUNT(DISTINCT) at scale: distinct counts are not
additive up a hierarchy (month != sum of days — the trap
events_uniques_rollup demonstrates), so exact rollups normally
recompute from raw data per level. Word bitmaps OR-merge
associatively, so each level derives from the previous level's
words — raw data is scanned ONCE for the finest level and never
again. Cost: |id-space|/63 words per group worst-case; the production
refinement is roaring-style containers + dictionary-encoded ids, of
which this word relation is the dense container.

Negative ids are rejected in-plan (raise_error): two's-complement
``div``/``%`` would scatter them into negative words with negative
bits. Dictionary-encode upstream instead.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bitmap_build", "bitmap_merge", "bitmap_cardinality"]

WORD_BITS = 63


def _guarded_id(id_col: str) -> Column:
    return F.when(
        F.col(id_col) < 0,
        F.expr(
            f"raise_error(concat('bitmap_build: negative id ', "
            f"CAST({id_col} AS STRING)))"
        ).cast("long"),
    ).otherwise(F.col(id_col).cast("long"))


def bitmap_build(
    df: DataFrame, id_col: str, group_cols: Sequence[str]
) -> DataFrame:
    """One hash agg raw rows -> (group_cols..., _word, _w) bitmap
    words. ``_w`` never has bit 63 set (the cross-engine guarantee
    documented above); negative ids raise in-plan."""
    gid = _guarded_id(id_col)
    return (
        df.select(
            *group_cols,
            (gid / WORD_BITS).cast("long").alias("_word"),
            (gid % WORD_BITS).cast("int").alias("_bit"),
        )
        .groupBy(*group_cols, "_word")
        .agg(
            # SQL form: the Python shiftleft() binding takes only a
            # literal shift amount, not a per-row column
            F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), _bit))").alias("_w")
        )
    )


def bitmap_merge(words: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    """OR-merge word bitmaps to a coarser grouping (drop/replace some
    group columns upstream, then merge). Associative and idempotent —
    any merge tree yields the same words, the property
    tests/test_bitmap.py pins against rebuild-from-raw."""
    return words.groupBy(*group_cols, "_word").agg(
        F.bit_or("_w").alias("_w")
    )


def bitmap_cardinality(
    words: DataFrame, group_cols: Sequence[str], out_col: str = "n_distinct"
) -> DataFrame:
    """Exact distinct count per group: popcount-sum of the words.
    Also emits ``n_words`` (nonzero word count — the bitmap's memory
    accounting)."""
    return words.groupBy(*group_cols).agg(
        F.sum(F.bit_count("_w")).cast("long").alias(out_col),
        F.count("*").cast("long").alias("n_words"),
    )
