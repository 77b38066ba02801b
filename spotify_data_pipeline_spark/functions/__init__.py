"""Reusable Column-level helpers (pure Catalyst expressions, no UDFs)."""

from spotify_data_pipeline_spark.functions.text import (  # noqa: F401
    normalize_whitespace,
    shingles,
    tokens,
)
from spotify_data_pipeline_spark.functions.vectors import (  # noqa: F401
    cosine_similarity,
    dot,
    l2_norm,
)
