"""Table profiling (operators/profiling.py): null accounting, exact
distincts, deterministic top-k ties, type handling."""

from __future__ import annotations

import pytest

from spotify_data_pipeline_spark.operators.profiling import profile_table


def test_profile_mixed_table(spark):
    df = spark.createDataFrame(
        [
            ("a", 1, 1.5),
            ("b", None, 2.5),
            ("a", 3, None),
            (None, 3, -1.0),
        ],
        "s string, i long, d double",
    )
    rows = {r.column: r for r in profile_table(df, top_k=2).collect()}
    assert set(rows) == {"s", "i", "d"}
    s = rows["s"]
    assert (s.n_rows, s.n_null, s.n_distinct) == (4, 1, 2)
    assert s.top_values == "a:2,b:1"
    assert s.min_num is None and s.max_num is None
    i = rows["i"]
    assert (i.n_null, i.n_distinct, i.min_num, i.max_num) == (1, 2, 1.0, 3.0)
    assert i.top_values is None
    d = rows["d"]
    assert (d.n_null, d.n_distinct, d.min_num, d.max_num) == (1, 3, -1.0, 2.5)


def test_top_k_ties_break_on_value(spark):
    df = spark.createDataFrame(
        [("z",), ("y",), ("x",), ("w",)], "s string"
    )
    row = profile_table(df, top_k=3).collect()[0]
    assert row.top_values == "w:1,x:1,y:1"  # all tied at 1: smallest values win


def test_all_null_string_column(spark):
    df = spark.createDataFrame([(None, 1), (None, 2)], "s string, i long")
    rows = {r.column: r for r in profile_table(df).collect()}
    assert rows["s"].n_null == 2
    assert rows["s"].n_distinct == 0  # left join finds no stacked values
    assert rows["s"].top_values is None


def test_numeric_only_and_unsupported_only(spark):
    df = spark.createDataFrame([(1,), (2,)], "i long")
    rows = profile_table(df).collect()
    assert len(rows) == 1 and rows[0].top_values is None
    from pyspark.sql import functions as F

    ts_only = spark.createDataFrame([("2024-01-01",)], "t string").select(
        F.col("t").cast("timestamp").alias("t")
    )
    with pytest.raises(ValueError, match="no string or numeric"):
        profile_table(ts_only)
