"""Mergeable quantile sketch over non-negative integers (HdrHistogram-
style log-bucketed histogram, pure integer arithmetic).

Exact percentiles are not algebraic — they need the full sorted
column. The warehouse-refresh answer (same pattern as the HLL distinct
and the Misra–Gries heavy hitters next door) is a bounded mergeable
state: bucket every value by zeroing all but its top ``sub_bits + 1``
significant bits, count per bucket, and answer quantiles from the
cumulative bucket histogram with relative error ≤ 2^-sub_bits
(values below 2^sub_bits are represented exactly).

Why this formulation and not a float log-bucket or t-digest:

- **Integer-only bucketing** (``bitlen`` via ``bin()``/``printf('%b')``
  + shifts) is bit-identical in every engine — no ``ln()``
  last-ulp boundary flips — so a DuckDB oracle can replicate the
  sketch EXACTLY and hash-match it end to end.
- **Merging is plain counter addition**: unlike the HLL estimate
  (bounded but fold-order-dependent), the merged state is
  **bit-equal** to the state built over the full input, for ANY batch
  split and fold order. Tested as exact frame equality.
- State is ≤ (64 − sub_bits) · 2^sub_bits buckets per group (~500 at
  sub_bits=3) regardless of data volume; each refresh shuffles only
  the new batch's (group, bucket) partials.

Use integer units (cents, micros, bytes) — the standard trick for
money/latency columns, and what keeps everything exact.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["hdr_bucket_lo", "hdr_build", "hdr_merge", "hdr_quantiles"]


def hdr_bucket_lo(col_name: str, sub_bits: int = 3) -> Column:
    """Bucket lower bound of a non-negative LONG column: the value with
    all but its top ``sub_bits + 1`` significant bits zeroed.
    Monotonic in the value; identity for values < 2^(sub_bits+1).

    Negative inputs are rejected IN-PLAN (``raise_error``): ``bin()``
    of a negative long is its 64-char two's-complement string, so the
    shift count saturates and every negative would silently collapse
    into one huge wrong bucket. Map negatives into non-negative space
    first (offset, abs, or split by sign) — e.g. inverted intervals fed
    through ``rangejoin.suggest_bin_width`` surface here as negative
    lengths and fail loudly instead of skewing the p99."""
    bitlen = f"length(bin({col_name}))"
    s = f"greatest({bitlen} - 1 - {sub_bits}, 0)"
    err = (
        f"raise_error(concat('hdr sketch: negative input (', "
        f"CAST({col_name} AS STRING), ') in {col_name}; log-bucketing "
        f"requires non-negative longs'))"
    )
    return F.expr(
        f"CASE WHEN {col_name} < 0 THEN CAST({err} AS BIGINT) "
        f"ELSE shiftleft(shiftright({col_name}, {s}), {s}) END"
    ).cast("long")


def hdr_build(
    df: DataFrame,
    groups: Sequence[str],
    value_col: str,
    sub_bits: int = 3,
) -> DataFrame:
    """One map-side-combinable hash agg → (groups..., bucket_lo, cnt).
    ``value_col`` must be a non-negative integer column."""
    return (
        df.select(*groups, hdr_bucket_lo(value_col, sub_bits).alias("bucket_lo"))
        .groupBy(*groups, "bucket_lo")
        .agg(F.count("*").alias("cnt"))
    )


def hdr_merge(groups: Sequence[str], *states: DataFrame) -> DataFrame:
    """Counter addition — the merged state is bit-equal to a build over
    the concatenated inputs, for any split/order (tested)."""
    if not states:
        raise ValueError("need at least one state")
    unioned = states[0]
    for s in states[1:]:
        unioned = unioned.unionByName(s)
    return unioned.groupBy(*groups, "bucket_lo").agg(F.sum("cnt").alias("cnt"))


def hdr_quantiles(
    state: DataFrame, groups: Sequence[str], qs: Sequence[float]
) -> DataFrame:
    """Answer quantiles from the bucket histogram: for each q, the
    lower bound of the bucket holding rank ceil(q·n) — a value v_est
    with v_est ≤ v_true < v_est · (1 + 2^-sub_bits) (v_true ≥ the
    exact-range cutoff). Output (groups..., q, est), one row per
    requested q.

    The cumulative window runs over per-group BUCKET rows (bounded by
    the sketch size, not the data), so the sort inside each group is
    over a few hundred rows no matter the input volume.
    """
    w = (
        Window.partitionBy(*groups)
        .orderBy("bucket_lo")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy(*groups)
    cum = state.select(
        *groups,
        "bucket_lo",
        F.sum("cnt").over(w).alias("_cum"),
        F.sum("cnt").over(wn).alias("_n"),
    )
    q_lit = F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    expanded = cum.select(*groups, "bucket_lo", "_cum", "_n", q_lit)
    hit = expanded.where(F.col("_cum") >= F.ceil(F.col("q") * F.col("_n")))
    return (
        hit.groupBy(*groups, "q")
        .agg(F.min("bucket_lo").alias("est"))
        .select(*groups, "q", F.col("est").cast("long").alias("est"))
    )
