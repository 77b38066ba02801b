"""ORC source/sink policies (sources/orc.py)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.io import load_table
from spotify_data_pipeline_spark.sources.orc import read_orc, write_orc

SF_DIR = os.environ.get("ORACLE_SF", "/root/testdata/sf0.001")


def test_parquet_orc_roundtrip_value_identical(spark, tmp_path):
    """parquet -> ORC -> read back: every value identical, including
    timestamps (UTC session TZ makes ORC's wall-clock storage
    lossless here)."""
    src = load_table(spark, SF_DIR, "events")
    path = str(tmp_path / "events_orc")
    write_orc(src, path)
    back = read_orc(spark, path, schema=src.schema)
    assert back.schema == src.schema
    assert back.count() == src.count()
    # order-insensitive full-value comparison
    diff = src.exceptAll(back).count() + back.exceptAll(src).count()
    assert diff == 0


def test_read_orc_schema_drift_fails_loudly(spark, tmp_path):
    src = load_table(spark, SF_DIR, "region")
    path = str(tmp_path / "region_orc")
    write_orc(src, path)
    wrong = src.withColumn("r_regionkey", F.col("r_regionkey").cast("long")).schema
    with pytest.raises(ValueError, match="schema drift"):
        read_orc(spark, path, schema=wrong)


def test_orc_scan_pushes_filters_and_prunes_columns(spark, tmp_path):
    """The reason ORC is a first-class source: stripe-level pushdown +
    column pruning show up in the plan exactly like parquet."""
    src = load_table(spark, SF_DIR, "orders")
    path = str(tmp_path / "orders_orc")
    write_orc(src, path)
    q = (
        read_orc(spark, path)
        .where(F.col("o_custkey") == 7)
        .select("o_orderkey", "o_totalprice")
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(o_custkey), EqualTo(o_custkey,7)" in plan
    # pruned read schema: only the referenced columns reach the scan
    assert "o_orderpriority" not in plan.split("ReadSchema")[1][:200]


def test_write_orc_respects_file_budget(spark, tmp_path):
    src = load_table(spark, SF_DIR, "nation")
    path = str(tmp_path / "nation_orc")
    write_orc(src, path, n_files=2)
    files = [f for f in os.listdir(path) if f.endswith(".orc")]
    assert len(files) == 2
