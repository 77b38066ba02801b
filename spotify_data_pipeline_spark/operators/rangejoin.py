"""Binned range joins: point-in-interval and interval-overlap.

Spark has no native range-join optimization: a join whose condition is
only inequalities (``p BETWEEN lo AND hi``, interval overlap) falls back
to BroadcastNestedLoopJoin — every point row is checked against every
interval row, O(|points|·|intervals|) work that is the canonical
100 TB scale-killer when BOTH sides are large (Databricks ships a
closed-source "range join optimization" hint for exactly this gap;
this module is the open equivalent as a DataFrame composition).

The standard fix is binning: pick a bin width ``w``, map each point to
bin ``floor(p / w)``, explode each interval to the bins it covers, and
equi-join on the bin id before applying the exact range predicate.
The equi-join shuffles on the bin key (hash-partitioned, AQE-planned,
skew-splittable) and each point is compared only against intervals
whose span touches its bin — with ``w`` on the order of the typical
interval length the candidate fan-out is a small constant per row.

Scale notes:

- Bin arithmetic is **exact integer** math (``DIV`` on longs, with a
  non-negative ``%`` adjustment so truncation equals floor for
  negatives) — ``floor(col / w)`` in float64 mis-bins values within
  ~128 µs of a bin boundary once epoch-microsecond magnitudes
  (~1.7e18) exceed float64's 2^53 exact-integer range.
- Long intervals explode to many bins; ``max_bins_per_interval``
  fails fast (in-plan ``raise_error``, no driver round-trip) instead
  of silently materializing a runaway row explosion. Pick ``w`` near
  the p99 interval length; outliers beyond the cap should be handled
  by a dedicated slice (filter them out, run them through the
  broadcast path — they are few by definition).
- Interval-overlap pairs would surface once per shared bin; they are
  deduplicated **without a shuffle** by keeping only the first shared
  bin (``bin == max(floor(a_lo/w), floor(b_lo/w))``) — an O(1) filter,
  not a ``dropDuplicates`` over the pair blow-up.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["point_in_interval_join", "interval_overlap_join", "suggest_bin_width"]


def suggest_bin_width(
    intervals: DataFrame, start_col: str, end_col: str, q: float = 0.99, sub_bits: int = 3
) -> int:
    """Pick a bin width from the data: the q-quantile (default p99) of
    interval lengths, via the mergeable integer quantile sketch
    (operators/quantiles.py) — one map-side-combinable agg over the
    intervals, a few hundred bucket rows collected, never the data.

    With w ≈ the p99 length, ≥99% of intervals explode to ≤2 bins and
    each point meets only same-bin intervals; the <1% longer ones cost
    proportionally more bins (cap via ``max_bins_per_interval``).
    Returns at least 1.

    ``sub_bits`` is passed to the sketch AND used for the upper-edge
    bump — the two must agree or the suggested width stops covering
    the p99 interval (the bucket lower bound underestimates by up to
    2^-sub_bits of the value).

    Inverted intervals (end < start − 1) produce negative lengths and
    fail in-plan inside the sketch (``hdr_bucket_lo`` raises) — fix
    the interval source rather than this estimator.
    """
    from spotify_data_pipeline_spark.operators.quantiles import (
        hdr_build,
        hdr_quantiles,
    )

    lens = intervals.select(
        (F.col(end_col).cast("long") - F.col(start_col).cast("long") + 1).alias("_len"),
        F.lit(1).alias("_g"),
    )
    state = hdr_build(lens, ["_g"], "_len", sub_bits=sub_bits)
    row = hdr_quantiles(state, ["_g"], [q]).first()
    est = 0 if row is None else int(row.est)
    # bucket lower bound underestimates by <= 2^-sub_bits; bump to the
    # bucket's upper edge so the suggested width COVERS the p99 interval
    return max(1, est + max(1, est >> sub_bits))


def _floordiv_sql(col_name: str, w: int) -> str:
    """Exact floor({col} / w) as a SQL fragment over a LONG column —
    integer ops only. ``x DIV w`` truncates toward zero; subtracting
    the non-negative remainder first makes truncation equal floor for
    negative values too."""
    m = f"((({col_name} % {w}) + {w}) % {w})"
    return f"(({col_name} - {m}) DIV {w})"


def _floordiv(col_name: str, w: int) -> Column:
    return F.expr(_floordiv_sql(col_name, w))


def _range_pred(p: Column, lo: Column, hi: Column, closed: str) -> Column:
    if closed == "both":
        return (p >= lo) & (p <= hi)
    if closed == "left":
        return (p >= lo) & (p < hi)
    if closed == "right":
        return (p > lo) & (p <= hi)
    if closed == "neither":
        return (p > lo) & (p < hi)
    raise ValueError(f"closed must be both|left|right|neither, got {closed!r}")


def _with_interval_bins(
    df: DataFrame, lo_col: str, hi_col: str, w: int, max_bins: int
) -> DataFrame:
    """Explode ``df`` to one row per covered bin id
    [floor(lo/w) .. floor(hi/w)], failing fast on runaway intervals."""
    b_lo, b_hi = _floordiv("_rj_lo", w), _floordiv("_rj_hi", w)
    msg = (
        f"rangejoin: interval covers more than {max_bins} bins "
        f"(bin_width={w}); widen bin_width or pre-filter outlier "
        "intervals onto a broadcast path"
    )
    bins = F.when(
        b_hi - b_lo < F.lit(max_bins), F.sequence(b_lo, b_hi)
    ).otherwise(F.raise_error(F.lit(msg)).cast("array<long>"))
    return (
        df.withColumn("_rj_lo", F.col(lo_col).cast("long"))
        .withColumn("_rj_hi", F.col(hi_col).cast("long"))
        .withColumn("_rj_bin", F.explode(bins))
        .drop("_rj_lo", "_rj_hi")
    )


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    *,
    bin_width: int,
    equi_keys: tuple[str, ...] = (),
    closed: str = "both",
    max_bins_per_interval: int = 10_000,
) -> DataFrame:
    """Inner-join each point row to every interval row containing it.

    ``point_col`` / ``start_col`` / ``end_col`` must be integer-valued
    (cast timestamps with ``unix_micros`` first). ``equi_keys`` are
    additional join columns present on both sides (e.g. ``user_id``);
    they ride along in the bin equi-join so candidates are key-local.
    Output carries all columns of both inputs (shared ``equi_keys``
    once); every (point, interval) match appears exactly once — a point
    matches an interval only in the single bin the point itself maps
    to, so no dedup step exists in the plan.
    """
    p = (
        points.withColumn("_rj_p", F.col(point_col).cast("long"))
        .withColumn("_rj_bin", _floordiv("_rj_p", bin_width))
        .drop("_rj_p")
    )
    i = _with_interval_bins(intervals, start_col, end_col, bin_width, max_bins_per_interval)
    joined = p.join(i, on=["_rj_bin", *equi_keys]).where(
        _range_pred(F.col(point_col), F.col(start_col), F.col(end_col), closed)
    )
    return joined.drop("_rj_bin")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_cols: tuple[str, str],
    right_cols: tuple[str, str],
    *,
    bin_width: int,
    equi_keys: tuple[str, ...] = (),
    max_bins_per_interval: int = 10_000,
) -> DataFrame:
    """Inner-join interval rows that overlap: ``a_lo <= b_hi AND
    b_lo <= a_hi`` (closed-interval overlap).

    Both sides explode to covered bins and equi-join on the bin id; a
    pair sharing n bins would match n times, so the join keeps only the
    **first shared bin** (``bin == greatest(floor(a_lo/w),
    floor(b_lo/w))``) — exact single-emission without any
    deduplicating shuffle.
    """
    a_lo, a_hi = left_cols
    b_lo, b_hi = right_cols
    a = _with_interval_bins(left, a_lo, a_hi, bin_width, max_bins_per_interval)
    b = _with_interval_bins(right, b_lo, b_hi, bin_width, max_bins_per_interval)
    joined = (
        a.join(b, on=["_rj_bin", *equi_keys])
        .where((F.col(a_lo) <= F.col(b_hi)) & (F.col(b_lo) <= F.col(a_hi)))
        .withColumn("_rj_alo", F.col(a_lo).cast("long"))
        .withColumn("_rj_blo", F.col(b_lo).cast("long"))
        .where(
            F.col("_rj_bin")
            == F.greatest(_floordiv("_rj_alo", bin_width), _floordiv("_rj_blo", bin_width))
        )
        .drop("_rj_alo", "_rj_blo")
    )
    return joined.drop("_rj_bin")
