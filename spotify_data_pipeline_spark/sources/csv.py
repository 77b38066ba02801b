"""CSV source/sink — the S-family's delimited-text member.

Policies (each one a measured Spark pitfall, pinned in
tests/test_csv_source.py):

- **Explicit schema, never inference.** ``inferSchema`` double-scans
  the data and lets an unlucky sample flip a column's type between
  runs (the versioned-sink writer applies the same rule for Arrow
  types). ``read_csv`` therefore REQUIRES a schema.
- **Corrupt-record triage, not job death.** Default mode PERMISSIVE
  captures unparseable lines in ``_corrupt_record`` (the column is
  appended to the user schema here — Spark only populates it when it
  exists in the schema). Spark refuses queries that reference ONLY
  the corrupt column straight off a CSV scan (SPARK-21610), so
  ``corrupt_rows`` materializes the full row set first — the
  documented workaround, kept inside this module so callers never
  trip on it.
- **DROPMALFORMED / FAILFAST** pass through for pipelines that prefer
  silence or loud death; both tested.
- **Quoting round-trip.** Embedded delimiters, quotes, and newlines
  survive write→read only with quoting + ``multiLine=true`` on the
  read side; ``write_csv`` always writes quoted-when-needed and the
  round-trip test includes an embedded-newline value (multiLine makes
  a file NON-SPLITTABLE — each file is one task — so the writer's
  file count, not byte size, sets read parallelism; documented for
  the 100 TB case: prefer escaping newlines upstream when you can).

Scale: CSV scans push column pruning but NOT filters (no row-group
stats — every byte is read); the parquet-vs-CSV probe case for why
the warehouse zone is parquet. CSV is the ingest edge, not the
storage format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

__all__ = ["read_csv", "corrupt_rows", "write_csv", "CORRUPT_COL"]

CORRUPT_COL = "_corrupt_record"


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    mode: str = "PERMISSIVE",
    header: bool = True,
    sep: str = ",",
    multi_line: bool = False,
) -> DataFrame:
    """Schema-enforced CSV scan. In PERMISSIVE mode the returned frame
    carries ``_corrupt_record`` (NULL for clean rows)."""
    if mode not in ("PERMISSIVE", "DROPMALFORMED", "FAILFAST"):
        raise ValueError(f"unknown CSV mode: {mode}")
    eff_schema = schema
    if mode == "PERMISSIVE" and CORRUPT_COL not in schema.fieldNames():
        eff_schema = StructType(
            list(schema.fields) + [StructField(CORRUPT_COL, StringType())]
        )
    return (
        spark.read.schema(eff_schema)
        .option("header", header)
        .option("sep", sep)
        .option("mode", mode)
        .option("multiLine", multi_line)
        .option("escape", '"')
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def corrupt_rows(df: DataFrame) -> DataFrame:
    """The quarantine view: rows whose raw line failed to parse.

    SPARK-21610: filtering a raw CSV scan on ``_corrupt_record`` alone
    is disallowed (the lazy parser never materializes it without other
    columns), so cache the full frame first — the standard workaround,
    applied here so the caller gets a plain DataFrame."""
    if CORRUPT_COL not in df.columns:
        raise ValueError("frame has no corrupt-record column (not PERMISSIVE?)")
    return df.cache().where(F.col(CORRUPT_COL).isNotNull())


def write_csv(
    df: DataFrame,
    path: str,
    header: bool = True,
    sep: str = ",",
    mode: str = "overwrite",
) -> None:
    """Quoted-when-needed CSV write (embedded sep/quote/newline values
    survive the round trip; read back with ``multi_line=True`` when
    newlines may be embedded)."""
    (
        df.write.mode(mode)
        .option("header", header)
        .option("sep", sep)
        .option("quoteAll", False)
        .option("escape", '"')
        .csv(path)
    )
