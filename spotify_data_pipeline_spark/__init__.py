"""spotify_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query & data-processing
capabilities of the reference pipeline ``dieulinhng/Spotify-Data-Pipeline``
(surveyed in /root/repo/SURVEY.md), plus the LLM-data-pipeline operator set
(dedup, similarity search, multimodal columns, text analysis) designed for
100 TB scale.

Layout
------
- ``session``    SparkSession factory (AQE on, UTC, tuned shuffle partitions)
- ``io``         parquet readers for the driver testdata tables
- ``functions``  reusable Column-level helpers (text normalization, vector math)
- ``operators``  composed operators (dedup family, as-of join, top-k, sampling,
                 batching, similarity, text analysis, multimodal plumbing) and
                 storage/ops infrastructure (bucketed co-located joins, parquet
                 compaction, declarative data-quality validation, shard export)
- ``plans``      declared queries: each is a (spark, sf_dir) -> DataFrame
                 callable registered with a DuckDB oracle SQL string
- ``sources``    ingestion sources (schema-enforced file readers, paginated
                 REST-style batch source re-expressed as mapInPandas)
- ``streaming``  Structured Streaming pipelines over the events table
- ``pipeline``   the reference ETL (bronze JSON -> silver parquet -> gold)
                 re-implemented Spark-first
"""

__version__ = "0.1.0"
