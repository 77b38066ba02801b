"""Schema-enforced file readers (SURVEY.md §2.1 S2-S4, §2.2 P5).

The reference's bronze zone is pretty-printed JSON arrays — one array
per file (json.dumps(indent=2), spotify_etl_v2.py:127) — so JSON reads
need ``multiLine=True``. Schema enforcement replicates
``pd.DataFrame(data, columns=[...])`` (spotify_etl_v2.py:327-331):
select, order, cast, and NULL-pad missing columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spotify_data_pipeline_spark.functions.text import is_nonblank


def enforce_schema(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Project to exactly the declared columns: existing columns are
    cast, missing ones NULL-padded, extras dropped, order fixed —
    the reference's declared-schema projection as a Catalyst select."""
    cols = []
    present = set(df.columns)
    for field in schema.fields:
        if field.name in present:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*cols)


def read_json_blobs(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    multiline: bool = True,
) -> DataFrame:
    """Multi-file JSON scan (SURVEY S3).

    ``multiline=True`` (default) reads the *reference's* bronze format —
    each file one pretty-printed JSON array (json.dumps(indent=2),
    spotify_etl_v2.py:127). ``multiline=False`` reads JSON Lines, the
    format Spark's own ``df.write.json`` produces (and the right choice
    at scale: JSONL splits by line, a multiline array must be parsed
    whole-file by a single task). The engine's own bronze zone is JSONL.

    Scan-order note (SURVEY O1): the reference sorts blobs by name
    before union; under a declared, order-insensitive relational model
    scan order is immaterial, so no sort is imposed here.
    """
    reader = spark.read.option("multiLine", "true" if multiline else "false")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_text_lines(spark: SparkSession, path: str, skip_blank: bool = True) -> DataFrame:
    """Text-line scan with blank-line filtering (SURVEY S2:
    create_artist_batches.py:12-17 streams lines and drops empties)."""
    df = spark.read.text(path)
    if skip_blank:
        df = df.filter(is_nonblank(F.col("value")))
    return df.select(F.col("value").alias("line"))


def write_json_partition(df: DataFrame, base: str, run_date: str, name: str) -> None:
    """Per-day JSON sink with same-path overwrite (SURVEY S9:
    same-name re-upload ⇒ idempotent re-runs)."""
    df.write.mode("overwrite").json(f"{base}/{run_date}/{name}")


def write_parquet_partition(df: DataFrame, base: str, run_date: str, name: str) -> None:
    """Silver parquet sink, Hive-style date partitioning (SURVEY S11,
    §1.3: every zone keyed by run date)."""
    df.write.mode("overwrite").parquet(f"{base}/{name}/run_date={run_date}")


def read_parquet_evolved(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """Schema-drift-tolerant parquet scan over date-partitioned zones
    whose layout evolved across days (columns added/retired as the
    upstream API changed — the silver-zone reality the reference's
    fixed 5-column projection papers over).

    ``mergeSchema=true`` unions the footer schemas of every file (older
    files NULL-pad columns they predate); the optional declared
    ``schema`` then applies ``enforce_schema`` so consumers see a fixed
    contract regardless of which partitions the scan touched — reads
    stay partition-prunable and column-pruned (parquet readers only
    materialize requested columns; absent ones are constant-NULL).

    Scale note: schema merging reads every file's FOOTER at planning
    time. On a 100 TB zone with millions of files prefer a declared
    ``schema`` (skips the merge entirely when passed alone — Spark
    then reads by name with missing columns NULL) or maintain the
    merged schema in a catalog; mergeSchema is the discovery tool, not
    the steady-state path.
    """
    if schema is not None:
        # declared contract: no footer sweep needed — project by name
        df = spark.read.schema(
            T.StructType([f for f in schema.fields])
        ).parquet(path)
        return enforce_schema(df, schema)
    return spark.read.option("mergeSchema", "true").parquet(path)
