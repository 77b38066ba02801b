"""Training-shard export (operators/sharding.py): shard sizing,
deterministic assignment, manifest integrity round-trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from spotify_data_pipeline_spark.io import load_table
from spotify_data_pipeline_spark.operators.sharding import (
    export_training_shards,
    verify_shards,
)

SF = "/root/testdata/sf0.001"


def test_export_shards_and_manifest(spark, tmp_path):
    out = str(tmp_path / "shards")
    cust = load_table(spark, SF, "customer").select("c_custkey", "c_name")
    n = cust.count()
    manifest = export_training_shards(
        cust, out, order_by=["c_custkey"], rows_per_shard=40
    ).collect()

    assert sum(r.n_rows for r in manifest) == n
    full, last = [r.n_rows for r in manifest[:-1]], manifest[-1].n_rows
    assert all(x == 40 for x in full) and 0 < last <= 40
    assert [r.shard for r in manifest] == list(range(len(manifest)))
    # no rows lost or duplicated
    written = spark.read.parquet(out)
    assert written.count() == n
    assert written.select("c_custkey").distinct().count() == n


def test_shard_assignment_deterministic(spark, tmp_path):
    cust = load_table(spark, SF, "customer").select("c_custkey", "c_name")
    a = export_training_shards(
        cust, str(tmp_path / "a"), order_by=["c_custkey"], rows_per_shard=64
    )
    b = export_training_shards(
        cust.repartition(13), str(tmp_path / "b"), order_by=["c_custkey"], rows_per_shard=64
    )
    # same data, different input partitioning → identical manifests
    assert a.collect() == b.collect()


def test_verify_shards_detects_tamper(spark, tmp_path):
    out = str(tmp_path / "shards")
    cust = load_table(spark, SF, "customer").select("c_custkey", "c_name")
    manifest = export_training_shards(
        cust, out, order_by=["c_custkey"], rows_per_shard=50
    )
    manifest = manifest.cache()
    assert verify_shards(spark, out, manifest)
    # tamper: drop one shard's rows and rewrite it
    spark.read.parquet(out).where(F.col("shard") == 0).limit(10).drop("shard").write.mode(
        "overwrite"
    ).parquet(out + "/shard=0")
    assert not verify_shards(spark, out, manifest)
