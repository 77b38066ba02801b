"""Declarative data-quality validation — the pre-training-run gate.

A corpus refresh at 100 TB is useless (or dangerous) if nulls crept
into the key column, ids stopped being unique, or a partition of the
fact table lost its dimension rows. This is the Deequ/dbt-tests-shaped
check runner, Spark-first:

- ALL row-level checks (not-null, accepted-values, range, regex) run in
  ONE stacked conditional aggregate — one scan, map-side combinable,
  no shuffle of data rows (the shuffle carries one partial row per
  partition).
- ``unique`` needs key cardinality → one groupBy on the key.
- ``foreign_key`` needs the dimension → one left-anti join (broadcast
  when the dimension is small, AQE decides otherwise).

Output: one row per check — (check, column, violations, total, passed)
— small enough to ``collect()`` and gate a DAG on.

Reference parity: the reference pipeline's implicit gates (set
membership before insert, crawl-count == 200 assertion) are the ad-hoc
form of these checks; here they are declarative, composable, and run
in O(1) passes over the data. See SURVEY.md §2.9/§4.2.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    kind: str
    column: str
    params: tuple = field(default_factory=tuple)

    @property
    def name(self) -> str:
        return f"{self.kind}:{self.column}"


def not_null(column: str) -> Check:
    return Check("not_null", column)


def accepted_values(column: str, values: Sequence) -> Check:
    return Check("accepted_values", column, tuple(values))


def in_range(column: str, lo, hi) -> Check:
    return Check("in_range", column, (lo, hi))


def matches(column: str, pattern: str) -> Check:
    """Full-match regex (Java regex, anchored like DuckDB regexp_full_match)."""
    return Check("matches", column, (pattern,))


def unique(*columns: str) -> Check:
    return Check("unique", ",".join(columns), tuple(columns))


def foreign_key(column: str, dim: DataFrame, dim_column: str) -> Check:
    return Check("foreign_key", column, (dim, dim_column))


def _violation(df: DataFrame, c: Check) -> Column:
    col = F.col(c.column)
    if c.kind == "not_null":
        return col.isNull()
    if c.kind == "accepted_values":
        return ~col.isin(list(c.params)) | col.isNull()
    if c.kind == "in_range":
        lo, hi = c.params
        return ~col.between(lo, hi) | col.isNull()
    if c.kind == "matches":
        return ~col.rlike(f"^(?:{c.params[0]})$") | col.isNull()
    raise ValueError(f"not a row-level check: {c.kind}")


_ROW_LEVEL = {"not_null", "accepted_values", "in_range", "matches"}

_REPORT_SCHEMA = (
    "check string, column string, violations long, total long, passed boolean"
)


def validate(df: DataFrame, checks: Sequence[Check]) -> DataFrame:
    """Run every check; return the (check, column, violations, total,
    passed) report. Row-level checks share ONE aggregate pass over
    ``df``; each ``unique`` adds one groupBy and each ``foreign_key``
    one anti-join — the minimum passes the semantics admit.
    """
    spark = df.sparkSession
    reports: list[DataFrame] = []

    row_checks = [c for c in checks if c.kind in _ROW_LEVEL]
    if row_checks:
        aggs = [F.count(F.lit(1)).alias("_total")]
        for i, c in enumerate(row_checks):
            aggs.append(
                F.coalesce(  # sum over zero rows is NULL, not 0
                    F.sum(F.when(_violation(df, c), 1).otherwise(0)), F.lit(0)
                )
                .cast("long")
                .alias(f"_v{i}")
            )
        stats = df.agg(*aggs)
        rows = F.array(
            *[
                F.struct(
                    F.lit(c.kind).alias("check"),
                    F.lit(c.column).alias("column"),
                    F.col(f"_v{i}").alias("violations"),
                    F.col("_total").cast("long").alias("total"),
                    (F.col(f"_v{i}") == 0).alias("passed"),
                )
                for i, c in enumerate(row_checks)
            ]
        )
        reports.append(
            stats.select(F.explode(rows).alias("r")).select("r.*")
        )

    for c in checks:
        if c.kind == "unique":
            dup = (
                df.groupBy(*c.params)
                .agg(F.count(F.lit(1)).alias("_n"))
                .agg(
                    F.coalesce(
                        F.sum(F.when(F.col("_n") > 1, F.col("_n")).otherwise(0)),
                        F.lit(0),
                    )
                    .cast("long")
                    .alias("violations"),
                    F.coalesce(F.sum("_n"), F.lit(0)).cast("long").alias("total"),
                )
            )
            reports.append(
                dup.select(
                    F.lit("unique").alias("check"),
                    F.lit(c.column).alias("column"),
                    "violations",
                    "total",
                    (F.col("violations") == 0).alias("passed"),
                )
            )
        elif c.kind == "foreign_key":
            dim, dim_col = c.params
            keys = dim.select(F.col(dim_col).alias(c.column)).dropDuplicates()
            orphans = df.select(c.column).where(F.col(c.column).isNotNull()).join(
                keys, c.column, "left_anti"
            )
            rep = orphans.agg(
                F.count(F.lit(1)).cast("long").alias("violations")
            ).crossJoin(
                df.agg(F.count(F.lit(1)).cast("long").alias("total"))
            )
            reports.append(
                rep.select(
                    F.lit("foreign_key").alias("check"),
                    F.lit(c.column).alias("column"),
                    "violations",
                    "total",
                    (F.col("violations") == 0).alias("passed"),
                )
            )

    if not reports:
        return spark.createDataFrame([], _REPORT_SCHEMA)
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def assert_valid(df: DataFrame, checks: Sequence[Check]) -> None:
    """Gate form: raise ValueError listing every failed check."""
    failed = [r for r in validate(df, checks).collect() if not r.passed]
    if failed:
        msg = "; ".join(
            f"{r.check}({r.column}): {r.violations}/{r.total} violations"
            for r in failed
        )
        raise ValueError(f"data-quality gate failed: {msg}")
