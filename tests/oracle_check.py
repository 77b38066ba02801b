"""Local replica of the driver's DuckDB-oracle comparison: run the Spark
query and the oracle SQL on the same parquet tables, compare row count,
column-name set, and order-insensitive values (float-tolerant).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from spotify_data_pipeline_spark.io import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.execute(sql).fetchdf()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonicalize dtypes for the driver-equivalent compare.

    Integers stay EXACT (nullable Int64), never coerced to float64 —
    the r10 incident (VERDICT item 2): ml_gbdt_stump_boost's off-by-1
    in a ~9e12 BIGINT sailed through the old float64+1e-6-relative
    path while the driver's exact value hash failed. Tolerance is for
    genuinely-float columns only (see compare())."""
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).dt.tz_localize(None).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif s.dtype == object and len(s) and s.map(
            lambda v: isinstance(v, int) or v is None or (isinstance(v, float) and math.isnan(v))
        ).all():
            try:
                df[c] = s.astype("Int64")
            except (ValueError, TypeError, OverflowError):
                pass
    sort_cols = list(df.columns)
    df = df.sort_values(sort_cols, na_position="first", kind="mergesort").reset_index(drop=True)
    return df


def compare(spark_df, oracle_df: pd.DataFrame, float_tol: float = 1e-6) -> list[str]:
    """Return a list of mismatch descriptions (empty = match).

    Driver-equivalent policy: integer/decimal columns compare exactly;
    the float tolerance applies only when at least one side is a true
    float dtype (then both are cast to float64)."""
    errs: list[str] = []
    sp = spark_df.toPandas()
    if len(sp) != len(oracle_df):
        errs.append(f"row count: spark={len(sp)} oracle={len(oracle_df)}")
    if sorted(sp.columns) != sorted(oracle_df.columns):
        errs.append(f"columns: spark={sorted(sp.columns)} oracle={sorted(oracle_df.columns)}")
    if errs:
        return errs
    a, b = _canon(sp), _canon(oracle_df)
    for c in a.columns:
        av, bv = a[c], b[c]
        a_float = pd.api.types.is_float_dtype(av)
        b_float = pd.api.types.is_float_dtype(bv)
        if a_float or b_float:
            # One side genuinely float (e.g. Spark DOUBLE vs DuckDB
            # DECIMAL-as-float): tolerance path on float64 both sides.
            av64, bv64 = av.astype("float64"), bv.astype("float64")
            both_nan = av64.isna() & bv64.isna()
            close = (av64 - bv64).abs() <= float_tol * (1 + bv64.abs())
            ok = both_nan | close
        else:
            ok = (av == bv) | (av.isna() & bv.isna())
        if not ok.all():
            bad = (~ok).idxmax()
            errs.append(
                f"column {c!r}: first mismatch at sorted-row {bad}: "
                f"spark={av[bad]!r} oracle={bv[bad]!r} ({int((~ok).sum())} rows differ)"
            )
    return errs
