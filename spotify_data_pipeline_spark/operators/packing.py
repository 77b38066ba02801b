"""Scalable sequence packing (the concat-and-chunk step of an LLM data
pipeline — assign each document the id of the ~budget-token training
sequence it starts in, per group, in a deterministic order).

The naive plan — ``sum(weight) over (partition by group order by ord)``
— shuffles every row of a group into ONE task; with a handful of
sources over 100 TB that's terabytes per partition. Here the running
sum is two-phase, exactly like batching.assign_batch_ids_scalable:
range-partition by (group, ord) → partition-local cumsum → per-
(group, partition) totals → per-partition offsets via a window over
the (tiny) totals table → broadcast the offsets back. The big table is
shuffled once by range, the only global window runs over
O(partitions) rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def packed_sequence_ids(
    df: DataFrame,
    group_col: str,
    order_col: str,
    weight_col: str,
    budget: int,
    partitions: int | None = None,
    out_col: str = "seq_id",
) -> DataFrame:
    """Adds ``out_col`` = floor(exclusive-running-sum(weight) / budget)
    per group under ``order_col`` order. Output-equivalent to the
    single-window formulation (equivalence pytest-checked).

    ``partitions`` defaults to the cluster's parallelism — on a real
    cluster size it to keep each range partition in executor memory.
    """
    if partitions is None:
        partitions = df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(partitions, group_col, order_col)
    with_pid = ranged.withColumn("_pid", F.spark_partition_id())

    w_local = (
        Window.partitionBy(group_col, "_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local_cum: Column = F.coalesce(F.sum(weight_col).over(w_local), F.lit(0))

    totals = with_pid.groupBy(group_col, "_pid").agg(F.sum(weight_col).alias("_psum"))
    w_off = (
        Window.partitionBy(group_col)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "_offset", F.coalesce(F.sum("_psum").over(w_off), F.lit(0))
    ).select(group_col, "_pid", "_offset")

    return (
        with_pid.withColumn("_local_cum", local_cum)
        .join(F.broadcast(offsets), [group_col, "_pid"])
        .withColumn(
            out_col,
            F.floor((F.col("_local_cum") + F.col("_offset")) / budget).cast("long"),
        )
        .drop("_pid", "_local_cum", "_offset")
    )
