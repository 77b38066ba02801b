"""The reference ETL re-implemented Spark-first (SURVEY.md §3, §7.1 M2):
bronze JSON → silver parquet → gold warehouse, partitioned by run_date.
"""
