"""versioned_parquet Python DataSource writer (sources/versioned.py):
the two-phase commit publishes exactly one manifest version per
successful write job, append/overwrite map to the snapshot modes,
aborted jobs are invisible, and reads interoperate with
operators/versioning.read_version (time travel included)."""

from __future__ import annotations

import os

import pytest

from spotify_data_pipeline_spark.operators.versioning import (
    history,
    latest_version,
    read_version,
)
from spotify_data_pipeline_spark.sources.versioned import register_versioned_sink


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_write_read_roundtrip_and_append(spark, tmp_path):
    register_versioned_sink(spark)
    root = str(tmp_path / "ds")
    a = spark.createDataFrame([(1, "x"), (2, "y")], "id BIGINT, s STRING")
    a.write.format("versioned_parquet").option("root", root).mode("append").save()
    assert latest_version(root) == 0
    assert _rows(read_version(spark, root)) == [(1, "x"), (2, "y")]

    b = spark.createDataFrame([(3, "z")], "id BIGINT, s STRING")
    b.write.format("versioned_parquet").option("root", root).mode("append").save()
    assert latest_version(root) == 1
    assert _rows(read_version(spark, root)) == [(1, "x"), (2, "y"), (3, "z")]
    # time travel: version 0 unchanged
    assert _rows(read_version(spark, root, version=0)) == [(1, "x"), (2, "y")]


def test_overwrite_replaces_but_history_persists(spark, tmp_path):
    register_versioned_sink(spark)
    root = str(tmp_path / "ds")
    spark.createDataFrame([(1,)], "id BIGINT").write.format(
        "versioned_parquet"
    ).option("root", root).mode("append").save()
    spark.createDataFrame([(9,)], "id BIGINT").write.format(
        "versioned_parquet"
    ).option("root", root).mode("overwrite").save()
    assert latest_version(root) == 1
    assert _rows(read_version(spark, root)) == [(9,)]
    assert _rows(read_version(spark, root, version=0)) == [(1,)]
    assert [h["mode"] for h in history(root)] == ["append", "overwrite"]


def test_aborted_job_is_invisible_and_next_commit_succeeds(spark, tmp_path):
    register_versioned_sink(spark)
    root = str(tmp_path / "ds")
    good = spark.createDataFrame([(1,)], "id BIGINT")
    bad_write = (
        good.write.format("versioned_parquet")
        .option("root", root)
        .option("fail", "true")
        .mode("append")
    )
    with pytest.raises(Exception):
        bad_write.save()
    # no version became visible, and no manifest exists
    assert latest_version(root) is None
    assert not os.path.exists(os.path.join(root, "_manifests"))
    # a subsequent good write commits normally as version 0
    good.write.format("versioned_parquet").option("root", root).mode(
        "append"
    ).save()
    assert latest_version(root) == 0
    assert _rows(read_version(spark, root)) == [(1,)]


def test_schema_is_pinned_not_inferred(spark, tmp_path):
    """An all-NULL column keeps its declared type (pyarrow writes with
    the schema mapped from the Spark StructType, never inferred)."""
    register_versioned_sink(spark)
    root = str(tmp_path / "ds")
    df = spark.createDataFrame(
        [(1, None), (2, None)], "id BIGINT, maybe DOUBLE"
    )
    df.write.format("versioned_parquet").option("root", root).mode(
        "append"
    ).save()
    back = read_version(spark, root)
    assert dict(back.dtypes) == {"id": "bigint", "maybe": "double"}
    assert _rows(back) == [(1, None), (2, None)]


def test_types_roundtrip_including_arrays_and_timestamps(spark, tmp_path):
    register_versioned_sink(spark)
    root = str(tmp_path / "ds")
    df = spark.sql(
        "SELECT CAST(1 AS BIGINT) AS id, CAST(1.5 AS DOUBLE) AS d,"
        " TIMESTAMP '2024-01-02 03:04:05.123456' AS ts,"
        " DATE '2024-01-02' AS dt, true AS b,"
        " array(1L, 2L, 3L) AS xs, CAST('ab' AS BINARY) AS raw"
    )
    df.write.format("versioned_parquet").option("root", root).mode(
        "append"
    ).save()
    back = read_version(spark, root)
    assert dict(back.dtypes) == dict(df.dtypes)
    assert _rows(back) == _rows(df)


def test_interop_with_write_version(spark, tmp_path):
    """Snapshots from the DataSource path and the write_version path
    chain into ONE history."""
    from spotify_data_pipeline_spark.operators.versioning import write_version

    register_versioned_sink(spark)
    root = str(tmp_path / "ds")
    spark.createDataFrame([(1,)], "id BIGINT").write.format(
        "versioned_parquet"
    ).option("root", root).mode("append").save()
    write_version(
        spark.createDataFrame([(2,)], "id BIGINT"), root, mode="append"
    )
    assert latest_version(root) == 1
    assert _rows(read_version(spark, root)) == [(1,), (2,)]
