"""Data-quality validation (operators/constraints.py): check semantics,
the one-aggregate-pass plan for row-level checks, and the gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.io import load_table
from spotify_data_pipeline_spark.operators.constraints import (
    accepted_values,
    assert_valid,
    foreign_key,
    in_range,
    matches,
    not_null,
    unique,
    validate,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def dirty(spark):
    rows = [
        (1, "a", 5.0, "US"),
        (2, "b", -1.0, "US"),   # range violation
        (3, None, 2.0, "DE"),   # null name
        (3, "c", 3.0, "XX"),    # dup id + bad country
        (None, "d", 4.0, "FR"), # null id (dup check counts it; fk skips nulls)
    ]
    return spark.createDataFrame(rows, "id long, name string, v double, country string")


def test_check_semantics(spark, dirty):
    dim = spark.createDataFrame([("US",), ("DE",), ("FR",)], "code string")
    report = {
        (r.check, r.column): (r.violations, r.total, r.passed)
        for r in validate(
            dirty,
            [
                not_null("name"),
                in_range("v", 0.0, 10.0),
                accepted_values("country", ["US", "DE", "FR"]),
                matches("country", "[A-Z]{2}"),
                unique("id"),
                foreign_key("country", dim, "code"),
            ],
        ).collect()
    }
    assert report[("not_null", "name")] == (1, 5, False)
    assert report[("in_range", "v")] == (1, 5, False)
    assert report[("accepted_values", "country")] == (1, 5, False)
    assert report[("matches", "country")] == (0, 5, True)
    assert report[("unique", "id")] == (2, 5, False)  # both rows of id=3
    assert report[("foreign_key", "country")] == (1, 5, False)  # XX


def test_row_level_checks_share_one_scan(spark):
    """All row-level checks must collapse into ONE aggregate over one
    scan — no per-check passes."""
    li = load_table(spark, SF, "lineitem")
    rep = validate(
        li,
        [
            not_null("l_orderkey"),
            not_null("l_partkey"),
            in_range("l_quantity", 0, 100),
            in_range("l_discount", 0, 1),
            matches("l_returnflag", "[ANR]"),
        ],
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1


def test_clean_table_passes_gate(spark):
    orders = load_table(spark, SF, "orders")
    customer = load_table(spark, SF, "customer")
    assert_valid(
        orders,
        [
            not_null("o_orderkey"),
            unique("o_orderkey"),
            foreign_key("o_custkey", customer, "c_custkey"),
            accepted_values("o_orderstatus", ["O", "F", "P"]),
        ],
    )


def test_gate_raises_with_every_failure_listed(spark, dirty):
    with pytest.raises(ValueError, match="not_null.*unique") as ei:
        assert_valid(dirty, [not_null("name"), unique("id")])
    assert "1/5" in str(ei.value) and "2/5" in str(ei.value)


def test_empty_checks_and_empty_input(spark, dirty):
    assert validate(dirty, []).count() == 0
    empty = spark.createDataFrame([], "id long, name string")
    rep = validate(empty, [not_null("id"), unique("id")]).collect()
    assert all(r.passed and r.total == 0 for r in rep)
