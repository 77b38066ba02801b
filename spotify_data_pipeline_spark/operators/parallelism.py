"""Input-parallelism guard shared by CPU-heavy map-side operators.

The driver testdata ships each table as ONE parquet file with ONE row
group, so a scan yields a single task no matter the cluster size — and
any compute-dense map stage (per-shingle hashing, interpreted HOF
vector math) serializes on one core. At 100 TB inputs arrive
well-split and this is a no-op; on under-split inputs one cheap
repartition buys full-cluster parallelism for the expensive stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame) -> DataFrame:
    """Repartition up to the cluster's parallelism when the input is
    under-split; a no-op on well-partitioned (large-scale) inputs."""
    target = df.sparkSession.sparkContext.defaultParallelism
    # inputFiles() is a metadata call (~4ms); .rdd.getNumPartitions()
    # forces plan-to-RDD conversion (~250ms) — only fall back to it for
    # non-file-backed plans.
    files = df.inputFiles()
    if files:
        if len(files) >= target:
            return df
        return df.repartition(target)
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
