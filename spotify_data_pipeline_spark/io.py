"""Readers for the driver testdata tables (TESTDATA.md).

Primary scan path of the engine (SURVEY.md §2.1 S14): columnar parquet
with Catalyst predicate pushdown / column pruning. ``load_table`` is
deliberately a thin `spark.read.parquet` so every declared query keeps
the scan declarative — filters and projections stated downstream reach
the parquet reader as PushedFilters/ReadSchema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize ``ts`` to a session-TZ TIMESTAMP regardless of how the
    generator wrote it.

    Two physical encodings have been observed across testdata
    generations: TIMESTAMP(NANOS) (which the Spark vectorized reader
    rejects — read nanos as long under the legacy conf and convert with
    *integer* division, since ts/1000 in double arithmetic loses
    precision at 1.7e18) and plain TIMESTAMP(MICROS) with
    isAdjustedToUTC=false (which Spark reads as TIMESTAMP_NTZ — cast to
    TIMESTAMP, a value-preserving reinterpretation under the UTC session
    timezone set in session.py). Either way every downstream plan and
    the DuckDB oracle see identical microsecond timestamps.

    The legacy conf is SCOPED: set for the read call and restored right
    after. The scan's hadoop conf is captured at analysis time, so the
    returned DataFrame executes correctly later while co-resident
    queries reading other nanos parquet see an unchanged session
    (verified by the execute-after-restore test in tests).
    """
    from pyspark.sql import functions as F

    key = "spark.sql.legacy.parquet.nanosAsLong"
    prior = spark.conf.get(key, None)
    spark.conf.set(key, "true")
    try:
        raw = spark.read.parquet(f"{sf_dir}/events.parquet")
        ts_type = dict(raw.dtypes).get("ts")
        if ts_type == "bigint":
            raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif ts_type == "timestamp_ntz":
            raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    finally:
        if prior is None:
            spark.conf.set(key, "false")
        else:
            spark.conf.set(key, prior)
    return raw


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> None:
    """Register all testdata tables as temp views (for SQL-form queries)."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(prefix + t)
