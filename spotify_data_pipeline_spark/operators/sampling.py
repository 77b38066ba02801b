"""Deterministic seeded sampling (SURVEY.md §2.6 O3).

The reference samples 20 artist ids per day with
``random.Random(int(ds)).sample(ids, 20)`` (spotify_etl_v2.py:91-97) and
*relies on the determinism* as an inter-task contract: extract_albums
re-derives the same sample instead of receiving it via XCom.

Spark's ``df.sample(seed=)`` is NOT stable under repartitioning — the
sample depends on partition layout, so a re-run with different file
splits yields a different sample. The stable analog is hash ordering:
rank rows by ``xxhash64(seed, key)`` and take the first n. Same seed +
same key set ⇒ same sample, regardless of partitioning, cluster size,
or input order. Takes a global sort of the hash — but a top-n sort
(TakeOrderedAndProject) of only the key/hash columns, cheap at any scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deterministic_sample(
    df: DataFrame, key_cols: Sequence[str], n: int, seed: int, hash_fn: str = "xxhash64"
) -> DataFrame:
    """Deterministic pseudo-random sample of n rows keyed by key_cols.

    Cap-or-all semantics like the reference (≤n rows ⇒ all rows pass
    through; LIMIT handles that case naturally).

    ``hash_fn``: 'xxhash64' (default — fastest, JVM-side) or 'md5'
    (hex-string ordering every engine reproduces bit-identically — use
    when an external system must derive the SAME sample, the
    reference's no-XCom inter-task contract generalized across engines).
    """
    if hash_fn == "xxhash64":
        h = F.xxhash64(F.lit(seed), *[F.col(c) for c in key_cols])
    elif hash_fn == "md5":
        h = F.md5(F.concat_ws(":", F.lit(str(seed)), *[F.col(c).cast("string") for c in key_cols]))
    else:
        raise ValueError(f"hash_fn must be 'xxhash64' or 'md5', got {hash_fn!r}")
    return (
        df.withColumn("_sample_rank", h)
        .orderBy("_sample_rank", *key_cols)
        .limit(n)
        .drop("_sample_rank")
    )
