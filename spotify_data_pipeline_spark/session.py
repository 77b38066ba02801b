"""SparkSession factory.

Defaults follow the 100 TB design notes in SURVEY.md §4.3: AQE enabled
(runtime join-strategy switching + skew-join splitting + partition
coalescing), UTC session timezone (required for DuckDB-oracle timestamp
parity), Arrow enabled for the pandas-UDF edge, and shuffle partitions
sized to the local core count rather than the 200 default.

On a real cluster the same builder applies — only ``master`` and the
memory knobs change; the per-query plans in ``plans/`` are
partitioning-agnostic and rely on AQE + explicit ``broadcast()`` hints.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "spotify_data_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "0")) or (
            os.cpu_count() or 8
        )
    driver_memory = driver_memory or os.environ.get("SPARK_DRIVER_MEMORY", "48g")

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", driver_memory)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
