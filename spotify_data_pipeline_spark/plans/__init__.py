"""Declared queries — the engine's oracle-checked operator surface.

Every operator family from SURVEY.md §2 is exposed as a named query:
a ``(spark, sf_dir) -> DataFrame`` callable registered together with an
equivalent ANSI-SQL string that DuckDB runs on the same parquet tables.
The driver (and tests/test_oracle_parity.py) execute both sides and
compare row count + schema + order-insensitive value hash.
"""

from spotify_data_pipeline_spark.plans.registry import all_queries, declare  # noqa: F401
