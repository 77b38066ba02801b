"""Parquet compaction (operators/compaction.py): small-file rewrite
with content preservation and the rename-aside swap."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from spotify_data_pipeline_spark.io import load_table
from spotify_data_pipeline_spark.operators.compaction import (
    compact_parquet,
    parquet_file_stats,
)

SF = "/root/testdata/sf0.001"


def _checksum(df):
    return df.groupBy().agg(
        F.count("*").alias("n"),
        F.sum(F.xxhash64(*sorted(df.columns)).cast("decimal(38,0)")).alias("h"),
    ).collect()[0]


def test_compaction_reduces_files_and_preserves_rows(spark, tmp_path):
    target = str(tmp_path / "li")
    li = load_table(spark, SF, "lineitem")
    li.repartition(64).write.parquet(target)
    before_stats = parquet_file_stats(spark, target)
    assert before_stats["n_files"] == 64
    want = _checksum(spark.read.parquet(target))

    stats = compact_parquet(spark, target, target_file_bytes=64 * 1024 * 1024)

    assert stats["files_before"] == 64
    assert stats["files_after"] < 64
    assert stats["files_after"] == stats["n_output"]
    got = _checksum(spark.read.parquet(target))
    assert (got["n"], got["h"]) == (want["n"], want["h"])
    # no leftover swap directories
    assert not os.path.exists(target + ".compact-tmp")
    assert not os.path.exists(target + ".compact-old")


def test_compaction_targets_file_count_from_bytes(spark, tmp_path):
    target = str(tmp_path / "ord")
    load_table(spark, SF, "orders").repartition(16).write.parquet(target)
    total = parquet_file_stats(spark, target)["total_bytes"]
    # pick a target size that forces >1 output file
    per_file = max(1, total // 3)
    stats = compact_parquet(spark, target, target_file_bytes=per_file)
    import math

    assert stats["n_output"] == max(1, math.ceil(total / per_file))
