"""Structured Streaming pipelines (SURVEY.md §2.10).

The reference's incrementality is daily macro-batch (Airflow @daily);
the engine exposes true streaming twins of the batch event queries:
windowed aggregation with watermarks, session windows, and stateful
dedup-within-watermark.
"""
