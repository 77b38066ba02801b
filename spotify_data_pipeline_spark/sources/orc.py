"""ORC source/sink — the S-family's second columnar format.

Parquet is the engine's warehouse format (io.load_table); ORC is the
interchange columnar format you meet when ingesting from Hive-era
warehouses. Spark's native ORC reader has the same scan-level
machinery as parquet — predicate pushdown into stripe/row-group
indexes, column pruning, vectorized decode — so a query over an ORC
zone keeps the engine's declarative-scan contract (PushedFilters /
ReadSchema visible in the plan, asserted in tests/test_orc_source.py).

Policies:

- **Explicit schema on read.** Same rule as the CSV source: a schema
  mismatch should fail loudly at analysis, not drift silently. ORC
  files carry their own types, so the schema acts as an expected-shape
  assertion (``read_orc`` verifies field-for-field equality after the
  footer is read) rather than a parse instruction.
- **Timestamp hygiene.** ORC timestamps are wall-clock (no UTC-adjust
  flag like parquet isAdjustedToUTC); with the engine's fixed UTC
  session timezone (session.py) a parquet→ORC→parquet round trip is
  value-identical — pinned by test.
- **Zlib default codec** (Spark's default) — snappy/zstd pass through
  ``options``.

Scale: like parquet, ORC splits on stripe boundaries, so read
parallelism follows data size, not file count; the writer repartitions
to a caller-set file budget the same way the parquet sink does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

__all__ = ["read_orc", "write_orc"]


def read_orc(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """Scan an ORC dataset; when ``schema`` is given, assert the file
    schema matches it on names + types, order-sensitive but
    NULLABILITY-INSENSITIVE (ADVICE r05: ORC readers infer
    nullable=true for columns a writer declared required, so a strict
    StructType equality rejected byte-identical data) — shape drift
    still fails loudly at read time instead of corrupting downstream
    joins."""
    df = spark.read.orc(path)
    if schema is not None:
        found = [(f.name, f.dataType) for f in df.schema.fields]
        want = [(f.name, f.dataType) for f in schema.fields]
        if found != want:
            raise ValueError(
                f"ORC schema drift at {path}: expected {schema.simpleString()}, "
                f"found {df.schema.simpleString()}"
            )
    return df


def write_orc(df: DataFrame, path: str, n_files: int = 1, **options: str) -> None:
    """Write ``df`` as ORC with a deterministic file budget (the same
    contract as the parquet sink: callers choose output granularity,
    the engine never leaves one-file-per-shuffle-partition dust)."""
    df.repartition(n_files).write.mode("overwrite").options(**options).orc(path)
