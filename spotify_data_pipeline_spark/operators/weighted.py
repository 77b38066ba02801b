"""Deterministic weight-proportional sampling (systematic PPS).

Training-mixture construction needs "sample documents proportionally
to weight" (token count, quality score, source temperature) — and at
warehouse scale it needs the pick to be DETERMINISTIC: re-runs,
retries, and downstream tasks must re-derive the same sample (the same
inter-task contract as ``operators/sampling.deterministic_sample``,
generalized to weights).

Method: systematic probability-proportional-to-size sampling (Madow
1949, the textbook PPS scheme): lay every row's integer weight on a
line in a seeded pseudo-random order, then take k evenly spaced picks
at positions (2i+1)·W/(2k), i = 0..k−1. A row whose cumulative-weight
interval contains a pick is selected; rows heavier than W/k can
contain several picks (``n_picks`` — the multiplicity a mixture
builder repeats them with). Expected inclusion is exactly k·w/W.

Everything is INTEGER arithmetic — pick-in-interval is evaluated by
cross-multiplied comparisons, never a float division — and the seeded
order is the md5-hex trick every engine reproduces byte-identically,
so the sample is EXACTLY reproducible cross-engine (DuckDB-oracle-able
with zero float-tie risk, unlike exponential-key A-ES weighted
reservoirs whose ln()/pow() keys depend on libm rounding).

Closed form per row (W = total weight, c = cumulative weight through
this row, p = cumulative weight before it):
    cnt(x) = 0                                  if 2k·x < W
           = min(k, (2k·x − W) div 2W + 1)      otherwise
    n_picks = cnt(c) − cnt(p);   Σ n_picks = cnt(W) = k.

Scale shape: the plain form uses one global-order window (single-task
at the cumsum — fine to millions of rows); ``scalable=True`` switches
to the two-phase split (range-partition by the seeded key, partition
weight totals → broadcast offsets, partition-local cumsum), the same
device as ``operators/batching.assign_batch_ids_scalable``. Output is
identical (equivalence-tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pps_systematic_sample"]


def _cnt(x_sql: str, k: int):
    """#picks at or below cumulative weight ``x_sql`` (module closed
    form); SQL ``div`` keeps the division in 64-bit integers — no float
    floor, no 2^53 precision cliff."""
    return F.expr(
        f"CASE WHEN {2 * k} * ({x_sql}) < _wtot THEN CAST(0 AS BIGINT) "
        f"ELSE least(CAST({k} AS BIGINT), "
        f"({2 * k} * ({x_sql}) - _wtot) div (2 * _wtot) + 1) END"
    )


def pps_systematic_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    seed: int,
    scalable: bool = False,
) -> DataFrame:
    """Rows selected by k-pick systematic PPS over integer weights, in
    the md5(seed, id) pseudo-random order. Output: the input row's id
    and weight plus ``n_picks`` (≥ 1; >1 when weight > W/k). Rows with
    weight ≤ 0 are excluded from the line (zero mass); negative weights
    fail in-plan (a negative weight is always a bug upstream)."""
    rows = df.select(
        F.col(id_col),
        F.col(weight_col).cast("long").alias("_w"),
        F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))).alias("_ord"),
    ).withColumn(
        "_w",
        F.when(
            F.col("_w") < 0,
            F.expr(f"raise_error(concat('pps_systematic_sample: negative weight for ', CAST({id_col} AS STRING)))"),
        ).otherwise(F.col("_w")),
    ).where(F.col("_w") > 0)

    if not scalable:
        w_cum = Window.orderBy("_ord", id_col).rowsBetween(Window.unboundedPreceding, 0)
        cum = rows.withColumn("_c", F.sum("_w").over(w_cum))
    else:
        parts = df.sparkSession.sparkContext.defaultParallelism
        ranged = rows.repartitionByRange(parts, "_ord", id_col).withColumn(
            "_pid", F.spark_partition_id()
        )
        w_local = Window.partitionBy("_pid").orderBy("_ord", id_col).rowsBetween(
            Window.unboundedPreceding, 0
        )
        offsets = (
            ranged.groupBy("_pid")
            .agg(F.sum("_w").alias("_pw"))
            .withColumn(
                "_off",
                F.coalesce(
                    F.sum("_pw").over(
                        Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
                    ),
                    F.lit(0),
                ),
            )
            .select("_pid", "_off")
        )
        cum = (
            ranged.withColumn("_lc", F.sum("_w").over(w_local))
            .join(F.broadcast(offsets), "_pid")
            .withColumn("_c", F.col("_lc") + F.col("_off"))
        )

    total = cum.select(F.sum("_w").alias("_wtot"))
    picked = (
        cum.crossJoin(F.broadcast(total))
        .withColumn("n_picks", (_cnt("_c", k) - _cnt("_c - _w", k)).cast("long"))
        .where(F.col("n_picks") >= 1)
    )
    return picked.select(id_col, F.col("_w").alias("weight"), "n_picks")
