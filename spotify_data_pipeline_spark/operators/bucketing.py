"""Bucketed tables — pre-shuffled storage for co-located joins.

The 100 TB lever the ad-hoc parquet fixtures can't show: a fact table
that is joined on the same key by many downstream jobs should pay its
shuffle ONCE, at write time. ``bucketBy(n, key)`` hash-partitions rows
into n buckets per write task and records the bucket spec in the
catalog; every later equi-join (or aggregation) on that key between
tables with compatible bucket counts runs with NO Exchange — at 100 TB
that removes the dominant cost of the join entirely, and ``sortBy``
additionally pre-sorts within buckets so sort-merge join skips its sort.

This is write-side infrastructure, so it is exercised by tests and the
bench probe rather than a declared driver query (declared queries must
be side-effect-free reads of the fixture directory).

Usage shape (mirrors a production warehouse load)::

    write_bucketed(lineitem, "wh_lineitem", "l_orderkey", 16,
                   sort_cols=["l_orderkey"])
    write_bucketed(orders,   "wh_orders",   "o_orderkey", 16,
                   sort_cols=["o_orderkey"])
    joined = bucketed_join(spark, "wh_lineitem", "wh_orders",
                           "l_orderkey", "o_orderkey")
    # .explain(): SortMergeJoin with zero Exchange on either side
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a catalog table hash-bucketed on ``bucket_col``.

    ``n_buckets`` should be sized so one bucket of the LARGEST table
    sharing this key fits an executor's task comfortably (at 100 TB of
    lineitem and 512 MB task targets that's O(100k) buckets — bucket
    counts only need to be compatible, i.e. equal or integer multiples,
    across co-joined tables, not identical cluster-wide).
    """
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


@contextmanager
def _no_broadcast(spark: SparkSession) -> Iterator[None]:
    """Scoped: force non-broadcast joins so the bucket co-location (not
    a small test fixture fitting under the broadcast threshold) is what
    the plan exercises. Restores the prior threshold on exit."""
    key = "spark.sql.autoBroadcastJoinThreshold"
    prior = spark.conf.get(key, None)
    spark.conf.set(key, "-1")
    try:
        yield
    finally:
        if prior is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prior)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
    how: str = "inner",
) -> DataFrame:
    """Equi-join two bucketed catalog tables on their bucket keys.

    With compatible bucket specs the physical plan is a SortMergeJoin
    whose children are bare scans (+ in-bucket sorts unless the tables
    were ``sortBy``-written) — no Exchange on either side. The plan is
    asserted shuffle-free in tests/test_bucketing.py; at scale this is
    the difference between re-shuffling 100 TB per join and reading
    pre-placed buckets.
    """
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key], how)


def join_is_exchange_free(df: DataFrame) -> bool:
    """True if the executed-plan string for ``df`` contains no shuffle
    Exchange (bucket co-location held end-to-end)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" not in plan
