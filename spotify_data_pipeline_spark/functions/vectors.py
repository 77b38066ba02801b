"""Vector math over array<float>/array<double> columns.

Pure higher-order functions (`zip_with` + `aggregate`) — JVM-side, no
Python UDF, no MLlib Vector conversion. Elements are cast to double
before multiplying so results match a DuckDB oracle computing on
DOUBLE[] (float32 values are exactly representable in float64).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
