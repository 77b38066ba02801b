"""Fixed-size batch-id assignment (SURVEY.md §2.5/§2.6 O5).

The reference chunks a 15k-line seed file into 500-name batches with a
running counter (create_artist_batches.py:12-23, and the misnamed
``limit()`` chunker spotify_etl_v2.py:58-66). The relational equivalent:
``batch_id = floor((row_number() over (order by k) - 1)/size) + 1``.

Scale note: a single unpartitioned row_number window serializes through
one task. Fine for seed-file-sized inputs (the reference's use case);
for billions of rows use ``zipWithIndex``-style two-phase numbering
(per-partition counts → offsets → partition-local ranks), provided here
as ``assign_batch_ids_scalable``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_batch_ids(df: DataFrame, order_by: Sequence[str], batch_size: int) -> DataFrame:
    w = Window.orderBy(*order_by)
    return df.withColumn(
        "batch_id",
        (F.floor((F.row_number().over(w) - 1) / batch_size) + 1).cast("long"),
    )


def assign_batch_ids_scalable(
    df: DataFrame, order_by: Sequence[str], batch_size: int, partitions: int | None = None
) -> DataFrame:
    """Two-phase global numbering that avoids the single-task window:
    range-partition by the order key, rank within partitions, then add
    per-partition offsets computed from partition counts (a tiny
    broadcast join). Equivalent output to ``assign_batch_ids``.

    ``partitions`` defaults to the cluster's parallelism — on a real
    cluster size it to keep each range partition in executor memory.
    """
    if partitions is None:
        partitions = df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(partitions, *order_by)
    with_pid = ranged.withColumn("_pid", F.spark_partition_id())
    w_local = Window.partitionBy("_pid").orderBy(*order_by)
    local = with_pid.withColumn("_local_rn", F.row_number().over(w_local))
    offsets = (
        local.groupBy("_pid")
        .agg(F.count("*").alias("_cnt"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_cnt").over(
                    Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("_pid", "_offset")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(
            "batch_id",
            (F.floor((F.col("_local_rn") + F.col("_offset") - 1) / batch_size) + 1).cast("long"),
        )
        .drop("_pid", "_local_rn", "_offset")
    )
