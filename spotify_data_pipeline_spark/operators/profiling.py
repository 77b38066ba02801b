"""Generic table profiling — the discovery report every warehouse
tool (Deequ-style analyzers, dbt docs, Glue crawlers) emits before
constraints are even written: per column, null counts, exact distinct
cardinality, numeric ranges, and the top values. The constraints
engine next door (``operators/constraints.py``) VALIDATES declared
expectations; this module DISCOVERS the facts you'd declare.

Output is long format — one row per profiled column:

    column       string   column name
    n_rows       long     table row count (same on every row)
    n_null       long     NULLs in this column
    n_distinct   long     exact distinct non-null values
    min_num      double   min (numeric columns; NULL otherwise)
    max_num      double   max (numeric columns; NULL otherwise)
    top_values   string   "v1:c1,v2:c2,..." top-k by (count desc,
                          value asc) — string columns only, NULL
                          otherwise (cross-engine float formatting is
                          not deterministic, so numerics are never
                          stringified)

Scale shape — exactly TWO passes regardless of column count:
1. ONE hash agg computes n_rows + per-column null counts and numeric
   min/max (all algebraic, map-side combined).
2. String columns STACK into (column, value) pairs — one row-expansion
   map, factor = #string columns — and ONE (column, value) hash agg
   feeds both the exact distinct count and the top-k window. No
   per-column jobs, no driver loops over data; numeric distinct counts
   ride pass 1 as count(distinct) (Catalyst's expand, factor =
   #numeric columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, StringType

__all__ = ["profile_table"]


def profile_table(df: DataFrame, top_k: int = 3) -> DataFrame:
    """Profile every string and numeric column of ``df`` (other types
    are skipped). Deterministic: top-value ties break on the value."""
    str_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, StringType)]
    num_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)]
    if not str_cols and not num_cols:
        raise ValueError("no string or numeric columns to profile")

    aggs = [F.count("*").alias("_n_rows")]
    for c in str_cols + num_cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"_null_{c}"))
    for c in num_cols:
        aggs.append(F.countDistinct(F.col(c)).alias(f"_nd_{c}"))
        aggs.append(F.min(F.col(c)).cast("double").alias(f"_min_{c}"))
        aggs.append(F.max(F.col(c)).cast("double").alias(f"_max_{c}"))
    base = df.agg(*aggs)

    # one row per profiled column, built from the single agg row
    rows = []
    for c in str_cols:
        rows.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n_rows").alias("n_rows"),
                F.col(f"_null_{c}").alias("n_null"),
                F.lit(None).cast("long").alias("_nd_pass1"),
                F.lit(None).cast("double").alias("min_num"),
                F.lit(None).cast("double").alias("max_num"),
            )
        )
    for c in num_cols:
        rows.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n_rows").alias("n_rows"),
                F.col(f"_null_{c}").alias("n_null"),
                F.col(f"_nd_{c}").alias("_nd_pass1"),
                F.col(f"_min_{c}").alias("min_num"),
                F.col(f"_max_{c}").alias("max_num"),
            )
        )
    long_base = base.select(F.explode(F.array(*rows)).alias("_r")).select("_r.*")

    if str_cols:
        stacked = df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(c).alias("column"), F.col(c).cast("string").alias("v"))
                        for c in str_cols
                    ]
                )
            ).alias("_s")
        ).select("_s.*").where(F.col("v").isNotNull())
        counts = stacked.groupBy("column", "v").agg(F.count("*").alias("_c"))
        w = Window.partitionBy("column").orderBy(F.col("_c").desc(), F.col("v").asc())
        topk = (
            counts.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") <= top_k)
            .groupBy("column")
            .agg(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("_rk", "v", "_c"))
                        ),
                        lambda s: F.concat_ws(":", s["v"], s["_c"].cast("string")),
                    ),
                ).alias("top_values")
            )
        )
        nd_str = counts.groupBy("column").agg(F.count("*").alias("_nd_pass2"))
        extras = topk.join(nd_str, "column")
        long_base = long_base.join(F.broadcast(extras), "column", "left")
    else:
        long_base = long_base.withColumn("top_values", F.lit(None).cast("string")).withColumn(
            "_nd_pass2", F.lit(None).cast("long")
        )

    return long_base.select(
        "column",
        "n_rows",
        "n_null",
        # all-NULL string columns miss the stacked-counts join: their
        # exact distinct count is 0, not NULL
        F.coalesce("_nd_pass1", "_nd_pass2", F.lit(0)).alias("n_distinct"),
        "min_num",
        "max_num",
        "top_values",
    ).orderBy("column")
