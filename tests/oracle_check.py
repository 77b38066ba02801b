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
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).dt.tz_localize(None).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s) or s.dtype == object and s.map(
            lambda v: isinstance(v, int) or v is None or (isinstance(v, float) and math.isnan(v))
        ).all() and pd.api.types.is_numeric_dtype(pd.to_numeric(s, errors="coerce")):
            try:
                df[c] = pd.to_numeric(s).astype("float64")
            except (ValueError, TypeError):
                pass
    sort_cols = list(df.columns)
    df = df.sort_values(sort_cols, na_position="first", kind="mergesort").reset_index(drop=True)
    return df


def compare(spark_df, oracle_df: pd.DataFrame, float_tol: float = 1e-6) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
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
        if pd.api.types.is_float_dtype(av) and pd.api.types.is_float_dtype(bv):
            both_nan = av.isna() & bv.isna()
            close = (av - bv).abs() <= float_tol * (1 + bv.abs())
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
