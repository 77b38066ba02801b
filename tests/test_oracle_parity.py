"""Replicates the driver's t2 correctness gate locally: every declared
query with an oracle must match DuckDB at sf0.001 (fast); run with
ORACLE_SF=/root/testdata/sf0.01 for the driver-scale check.
"""

from __future__ import annotations

import os

import pytest

from spotify_data_pipeline_spark.plans import all_queries
from tests.oracle_check import compare, run_oracle

SF_DIR = os.environ.get("ORACLE_SF", "/root/testdata/sf0.001")

_QUERIES = all_queries()
_WITH_ORACLE = sorted(name for name, q in _QUERIES.items() if q.oracle)
_ROWS_ONLY = sorted(name for name, q in _QUERIES.items() if not q.oracle)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_match(spark, name):
    q = _QUERIES[name]
    result = q.fn(spark, SF_DIR)
    oracle = run_oracle(q.oracle, SF_DIR)
    errs = compare(result, oracle)
    assert not errs, f"{name}: " + "; ".join(errs)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_runs(spark, name):
    q = _QUERIES[name]
    result = q.fn(spark, SF_DIR)
    assert result.count() >= 0
    assert len(result.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()).issubset(set(e.queries()))
