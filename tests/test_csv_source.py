"""sources/csv.py — schema-enforced CSV scans: corrupt-record triage
(PERMISSIVE quarantine / DROPMALFORMED / FAILFAST), quoting round-trip
incl. embedded separators and newlines, header/sep options, and
parquet-parity on real fixture data."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from spotify_data_pipeline_spark.sources.csv import (
    CORRUPT_COL,
    corrupt_rows,
    read_csv,
    write_csv,
)

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("score", DoubleType()),
    ]
)


@pytest.fixture()
def messy_csv(tmp_path):
    p = tmp_path / "in"
    p.mkdir()
    (p / "part.csv").write_text(
        "id,name,score\n"
        "1,alice,2.5\n"
        "2,bob,3.0\n"
        "oops,not_a_long,xyz\n"  # id and score unparseable
        "4,carol,4.25\n"
    )
    return str(p)


def test_permissive_quarantine(spark, messy_csv):
    df = read_csv(spark, messy_csv, SCHEMA)
    assert CORRUPT_COL in df.columns
    rows = {r.id: r for r in df.collect()}
    assert rows[1].name == "alice" and rows[1].score == 2.5
    bad = corrupt_rows(df).collect()
    assert len(bad) == 1
    assert bad[0][CORRUPT_COL].startswith("oops,")
    # clean rows carry NULL in the corrupt column
    assert rows[4][CORRUPT_COL] is None


def test_dropmalformed_and_failfast(spark, messy_csv):
    dropped = read_csv(spark, messy_csv, SCHEMA, mode="DROPMALFORMED")
    assert sorted(r.id for r in dropped.collect()) == [1, 2, 4]
    assert CORRUPT_COL not in dropped.columns
    with pytest.raises(Exception):
        read_csv(spark, messy_csv, SCHEMA, mode="FAILFAST").collect()
    with pytest.raises(ValueError):
        read_csv(spark, messy_csv, SCHEMA, mode="LENIENT")


def test_quoting_round_trip_embedded_everything(spark, tmp_path):
    """Values containing the separator, quotes, and a NEWLINE survive
    write->read (multiLine on the way back)."""
    df = spark.createDataFrame(
        [
            Row(id=1, name='has,comma and "quote"', score=1.0),
            Row(id=2, name="two\nlines", score=2.0),
            Row(id=3, name="plain", score=3.0),
        ]
    )
    out = str(tmp_path / "out")
    write_csv(df, out)
    back = read_csv(spark, out, SCHEMA, multi_line=True)
    got = {r.id: r.name for r in back.collect()}
    assert got == {
        1: 'has,comma and "quote"',
        2: "two\nlines",
        3: "plain",
    }
    assert corrupt_rows(back).count() == 0


def test_custom_separator_and_headerless(spark, tmp_path):
    p = tmp_path / "psv"
    p.mkdir()
    (p / "x.csv").write_text("7|z|1.5\n8|y|2.5\n")
    df = read_csv(spark, str(p), SCHEMA, header=False, sep="|")
    assert sorted((r.id, r.name) for r in df.collect()) == [
        (7, "z"), (8, "y"),
    ]


def test_fixture_parquet_parity(spark, tmp_path):
    """Real data through the CSV edge: orders written to CSV and read
    back equals the parquet original (timestamps excluded — CSV has
    no type fidelity for them without a format contract, which is the
    module's point about parquet as the storage zone)."""
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    out = str(tmp_path / "orders_csv")
    write_csv(orders, out)
    schema = StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_orderstatus", StringType()),
            StructField("o_totalprice", DoubleType()),
        ]
    )
    back = read_csv(spark, out, schema, mode="DROPMALFORMED")
    a = sorted(tuple(r) for r in orders.collect())
    b = sorted(tuple(r) for r in back.collect())
    assert a == b
