"""Top-k operators (SURVEY.md §2.6 O4/O6, §2.3 J5).

The reference's top-k=20 search expansion keeps ≤20 candidates per input
name (search_artist_id_and_name.py:37-46); per-key top-k is the window
form. Global top-k lowers to TakeOrderedAndProject (per-partition heap +
driver merge — no global sort).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame, partition_by: Sequence[str], order_by: Sequence[Column], k: int
) -> DataFrame:
    """Keep the top-k rows per group; adds the rank column ``rn``.

    Caller must include a unique tiebreaker in order_by for deterministic
    output. Skew note: a single hot group serializes its own partition's
    sort only — acceptable; for pathological skew pre-aggregate with a
    per-partition partial top-k (groupBy + slice(sort_array(collect_list)))
    before the window.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)


def global_topk(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    return df.orderBy(*order_by).limit(k)
