"""Cross-engine deterministic rounding.

Spark's ROUND is decimal HALF_UP; DuckDB's round() on DOUBLE goes through
C library rounding — the two disagree whenever the binary double lands
within one ulp of a .xx5 boundary (frequent here: testdata prices are
2-decimal values, so products like price*0.05 sit exactly on half-cent
boundaries). The fix is to round explicitly with pure IEEE arithmetic —
``floor(x * 10^n + 0.5) / 10^n`` — which both engines evaluate
identically bit-for-bit. Every declared query rounds through these two
helpers (Spark side / oracle side) so value hashes match.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def rnd(col: Column | str, n: int = 2) -> Column:
    """Deterministic half-up rounding to n decimals (Spark side)."""
    if isinstance(col, str):
        col = F.col(col)
    s = 10**n
    return F.floor(col * s + F.lit(0.5)) / s


def rnd_cents(col: Column | str) -> Column:
    """Deterministic money→integer-cents (exact, for running sums)."""
    if isinstance(col, str):
        col = F.col(col)
    return F.floor(col * 100 + F.lit(0.5)).cast("long")


def rnd_sql(expr: str, n: int = 2) -> str:
    """Oracle-side twin of ``rnd`` (DuckDB SQL fragment)."""
    s = 10**n
    return f"floor(({expr}) * {s} + 0.5) / {s}"


def rnd_cents_sql(expr: str) -> str:
    return f"CAST(floor(({expr}) * 100 + 0.5) AS BIGINT)"
