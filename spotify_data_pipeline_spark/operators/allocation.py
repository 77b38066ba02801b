"""Largest-remainder (Hamilton) pro-rata allocation — the settlement /
billing / budget-split primitive: divide an integer ``budget`` across
groups proportionally to an integer weight so the parts SUM EXACTLY to
the budget. Naive per-group rounding drifts by up to ±n/2 units; the
largest-remainder method is the classical fix (Hamilton's
apportionment; satisfies the quota property: every allocation is
floor(ideal) or ceil(ideal)).

Exactness discipline: PURE 64-bit integer arithmetic end-to-end —
``base = (budget·w) DIV total``, remainder rank = ``(budget·w) MOD
total`` (desc, tiebreak on the group key asc), and the first
``budget − Σ base`` ranks get +1. No doubles anywhere: budget·w
exceeds 2⁵³ long before it exceeds 2⁶³, and the MOD-based ranking
is what makes the result independent of any float representation of
the shares. Overflow bound: budget·max(w) must stay under 2⁶³
(budget 10⁶ × weights up to ~9·10¹² — far past any realistic split).

Scale shape: one partial-agg shuffle builds the (group, weight) frame
upstream of this call; here two unpartitioned windows over the GROUP
frame (already reduced — 25 nations, 10³ accounts, never the fact
table) compute the total, the ranks, and the leftover. If the group
frame itself is huge, the unpartitioned windows serialize — split the
budget hierarchically (allocate to coarse buckets, then within) as
documented in the staged query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "largest_remainder_allocation",
    "largest_remainder_allocation_per_group",
]


def largest_remainder_allocation(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    budget: int,
    out_col: str = "alloc",
) -> DataFrame:
    """Add ``out_col`` (BIGINT) to ``df`` so that Σ out_col == budget
    and each row's value is proportional to ``weight_col`` up to the
    quota property. Weights must be non-negative integers with a
    positive total; keys must be distinct (the deterministic
    tiebreak)."""
    if budget < 0:
        raise ValueError("budget must be non-negative")
    w_all = Window.partitionBy()
    total = F.sum(weight_col).over(w_all)
    staged = (
        df.withColumn("_total", total)
        .withColumn("_base", F.expr(f"({budget} * {weight_col}) DIV _total"))
        .withColumn("_rem", F.expr(f"({budget} * {weight_col}) % _total"))
    )
    w_rank = Window.partitionBy().orderBy(F.col("_rem").desc(), F.col(key_col).asc())
    leftover = F.lit(budget) - F.sum("_base").over(w_all)
    return (
        staged.withColumn("_rk", F.row_number().over(w_rank))
        .withColumn(out_col, F.col("_base") + (F.col("_rk") <= leftover).cast("long"))
        .drop("_total", "_base", "_rem", "_rk")
    )


def largest_remainder_allocation_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    weight_col: str,
    budget_col: str,
    out_col: str = "alloc",
) -> DataFrame:
    """Per-group variant: every ``group_col`` partition gets its own
    ``budget_col`` (a BIGINT column, constant within the group) divided
    across that group's rows proportionally to ``weight_col``, summing
    exactly to the group's budget. This is the scale shape the global
    form's docstring points at: the windows partition on the group key,
    so a billion groups parallelize as an ordinary shuffle — nothing is
    unpartitioned. Same integer-exact arithmetic and quota property per
    group; (group, key) pairs must be distinct."""
    w_all = Window.partitionBy(group_col)
    staged = (
        df.withColumn("_total", F.sum(weight_col).over(w_all))
        .withColumn("_base", F.expr(f"({budget_col} * {weight_col}) DIV _total"))
        .withColumn("_rem", F.expr(f"({budget_col} * {weight_col}) % _total"))
    )
    w_rank = Window.partitionBy(group_col).orderBy(
        F.col("_rem").desc(), F.col(key_col).asc()
    )
    leftover = F.col(budget_col) - F.sum("_base").over(w_all)
    return (
        staged.withColumn("_rk", F.row_number().over(w_rank))
        .withColumn(out_col, F.col("_base") + (F.col("_rk") <= leftover).cast("long"))
        .drop("_total", "_base", "_rem", "_rk")
    )
