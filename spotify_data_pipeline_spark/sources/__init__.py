"""Ingestion sources: schema-enforced file readers and the REST-style
paginated batch source (SURVEY.md §2.1 S1-S10)."""
