"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``spotify_data_pipeline_spark.plans`` (one module
per operator family, each registered with its DuckDB oracle); this file
is a thin adapter over the registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spotify_data_pipeline_spark.plans import all_queries  # noqa: E402

# NOTE: no top-level imports of plans.* submodules here. declare() runs at
# module import, so an eager import would register that module's queries
# ahead of the registry's declared order — in round 2 a top-level
# `from ...aggregates import pricing_summary` silently front-loaded the 12
# aggregates queries and pushed five registry entries past the driver's
# 50-query evidence window (CORRECTNESS_r02.json). Registration order is
# evidence allocation; only `all_queries()` may trigger module loading.


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from spotify_data_pipeline_spark.plans.aggregates import pricing_summary

    return pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted for non-SQL-expressible
    ops (LSH/approx/seeded-sample) → driver records a rows-only check."""
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
