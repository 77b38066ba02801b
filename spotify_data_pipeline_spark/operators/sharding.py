"""Training-shard export — the last step of a curation pipeline.

Trainers consume fixed-size shards (so data loaders can stripe across
workers and resume mid-epoch), plus a manifest to verify against. This
writes a curated/packed corpus as ``shard=NNNN`` parquet partitions of
~``rows_per_shard`` rows each and returns the manifest DataFrame
(shard, n_rows, content hash) the training job checks before reading.

Scale shape: the shard id is derived from the same two-phase global
numbering as ``operators/batching.py`` (range partition → local rank →
broadcast per-partition offsets), so no single task ever sees more
than its slice — the naive ``row_number() OVER ()`` global window
would serialize the full corpus through one task. The write is one
pass, partitioned by shard; the manifest is one aggregate over the
written data (read back, so it attests what is actually on disk).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.operators.batching import assign_batch_ids_scalable


def export_training_shards(
    df: DataFrame,
    out_dir: str,
    order_by: Sequence[str],
    rows_per_shard: int = 100_000,
) -> DataFrame:
    """Write ``df`` as ``shard=K`` parquet partitions in deterministic
    ``order_by`` order and return the manifest read back from disk:
    (shard, n_rows, content_hash) — content_hash is an order-insensitive
    xor of per-row xxhash64 over all data columns, so a trainer (or a
    re-run) can verify a shard without assuming row order.
    """
    sharded = assign_batch_ids_scalable(
        df, order_by=list(order_by), batch_size=rows_per_shard
    ).withColumn("shard", (F.col("batch_id") - 1).cast("long")).drop("batch_id")
    sharded.write.mode("overwrite").partitionBy("shard").parquet(out_dir)

    spark = df.sparkSession
    written = spark.read.parquet(out_dir)
    data_cols = sorted(c for c in written.columns if c != "shard")
    return (
        written.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            # bit_xor is commutative → stable under any read order
            F.expr(
                "bit_xor(xxhash64({}))".format(", ".join(data_cols))
            ).alias("content_hash"),
        )
        .orderBy("shard")
    )


def verify_shards(spark: SparkSession, out_dir: str, manifest: DataFrame) -> bool:
    """Recompute the manifest from disk and compare — True iff every
    shard matches (the trainer-side integrity check)."""
    written = spark.read.parquet(out_dir)
    data_cols = sorted(c for c in written.columns if c != "shard")
    current = written.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.expr("bit_xor(xxhash64({}))".format(", ".join(data_cols))).alias(
            "content_hash"
        ),
    )
    # ONE job (the previous form ran two exceptAll().count() actions):
    # collapse the manifest to one row per shard id (_m_cnt flags a
    # duplicated/conflicting manifest entry, which exceptAll used to
    # catch via multiplicity), full outer join against the recomputed
    # per-shard facts, and count any discrepancy. current is unique per
    # shard by construction (groupBy). null-safe <=> covers NULL hashes.
    m = manifest.groupBy("shard").agg(
        F.count(F.lit(1)).alias("_m_cnt"),
        F.min("n_rows").alias("_m_rows"),
        F.min("content_hash").alias("_m_hash"),
    )
    mismatched = (
        current.join(m, "shard", "full_outer")
        .where(
            (F.coalesce(F.col("_m_cnt"), F.lit(0)) != 1)
            | ~F.col("n_rows").eqNullSafe(F.col("_m_rows"))
            | ~F.col("content_hash").eqNullSafe(F.col("_m_hash"))
        )
        .count()
    )
    return mismatched == 0
