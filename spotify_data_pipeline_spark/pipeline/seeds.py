"""Bootstrap seeding chain re-implemented as ONE Spark job (SURVEY.md
§3.2).

The reference runs four hand-chained Python processes —
crawl_artist_names.py (scrape) → upload_artist_names.py →
create_artist_batches.py (500-name JSON batches, create-if-absent) →
search_artist_id_and_name.py (each name → ≤20 (id, name) candidates) —
with GCS objects as the only dataflow. Here the chain collapses to
DataFrame lineage: ``read.text → blank-filter → normalize → window-batch
→ top-k search expansion → id-pool union-distinct``.

Reference string semantics preserved exactly:
- whitespace normalization `' '.join(s.strip().split())`
  (search_artist_id_and_name.py:21, SURVEY F1)
- quote escaping for the search query `s.replace('"','\\"')` (:38, F2)
- batch ids 1,2,... over consecutive 500-line groups
  (create_artist_batches.py:12-23, O5)
- search keeps at most 20 candidates per name (:39, S8/J5)
- the id pool is a set-union over all search results (spotify_etl_v2.py
  :69-89, U2/S3)

The crawl itself (S1, kworb.net HTML scrape) stays out-of-engine, as in
the reference; its output contract is just a text file of names.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spotify_data_pipeline_spark.functions.text import normalize_whitespace
from spotify_data_pipeline_spark.operators.batching import assign_batch_ids
from spotify_data_pipeline_spark.sources.files import read_text_lines
from spotify_data_pipeline_spark.sources.rest import ApiClient, TokenBucket


def batch_names(spark: SparkSession, text_path: str, batch_size: int = 500) -> DataFrame:
    """Text file of names → (batch_id, artist_names array<string>).

    Blank lines are dropped (P6) and batch ids number consecutive
    ``batch_size`` groups (create_artist_batches.py:12-23).

    Documented deviation: the reference batches in *file-line order*;
    a distributed text scan has no stable line order, so batches here
    are formed over sorted normalized names — deterministic across
    partitionings and re-runs, same batch sizes and count. Batch
    *membership* differs from the reference; nothing downstream depends
    on it (batches exist only to chunk API search calls).
    """
    lines = read_text_lines(spark, text_path, skip_blank=True).select(
        normalize_whitespace(F.col("line")).alias("artist_name")
    )
    batched = assign_batch_ids(lines, order_by=["artist_name"], batch_size=batch_size)
    return (
        batched.groupBy("batch_id")
        .agg(F.sort_array(F.collect_list("artist_name")).alias("artist_names"))
        # zero-padded blob name (F3: f'batch_{id:06d}.json',
        # create_artist_batches.py:34)
        .withColumn("blob_name", F.format_string("batch_%06d.json", "batch_id"))
    )


def write_name_batches(batches: DataFrame, base: str) -> None:
    """Create-if-absent batch sink (SURVEY S10: `if_generation_match=0`
    + swallowed PreconditionFailed = idempotent seed writes). Spark's
    'ignore' save mode has exactly those semantics at directory level."""
    batches.write.mode("ignore").json(base)


def search_artist_candidates(
    names: DataFrame,
    client: ApiClient,
    name_col: str = "artist_name",
    limit: int = 20,
    min_interval_s: float = 0.0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Top-k search expansion (S8/J5): each name → ≤limit candidate
    (artist_id, artist_name) rows, rank-preserving.

    The query string gets the reference's exact escaping:
    `artist:"<name with \\" escaped>"` (search_artist_id_and_name.py:37-38).
    Runs as mapInPandas with a per-partition token bucket — 15k seed
    names at 1 call/name parallelize across partitions instead of the
    reference's ~15k sequential calls.
    """
    out_schema = T.StructType(
        [
            T.StructField("query_name", T.StringType()),
            T.StructField("rank", T.IntegerType()),
            T.StructField("artist_id", T.StringType()),
            T.StructField("artist_name", T.StringType()),
        ]
    )
    prepared = names.select(normalize_whitespace(F.col(name_col)).alias("_name")).where(
        F.length("_name") > 0
    )
    if num_partitions:
        prepared = prepared.repartition(num_partitions)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bucket = TokenBucket(min_interval_s)
        for pdf in batches:
            rows = []
            for name in pdf["_name"].tolist():
                escaped = name.replace('"', '\\"')  # F2, search:38
                bucket.acquire()
                for rank, rec in enumerate(
                    client.search_artists(f'artist:"{escaped}"', limit=limit), start=1
                ):
                    rows.append(
                        {
                            "query_name": name,
                            "rank": rank,
                            "artist_id": rec.get("id"),
                            "artist_name": rec.get("name"),
                        }
                    )
            yield pd.DataFrame(rows, columns=["query_name", "rank", "artist_id", "artist_name"])

    return prepared.mapInPandas(run, out_schema)


def build_id_pool(candidates: DataFrame) -> DataFrame:
    """Union + distinct over all search results → the artist id pool the
    daily pipeline samples from (SURVEY S3/U2: spotify_etl_v2.py:69-89
    re-reads every search blob, projects artist_id, null-filters, and
    set-unions)."""
    return (
        candidates.select("artist_id", "artist_name")
        .where(F.col("artist_id").isNotNull() & (F.col("artist_id") != ""))
        .dropDuplicates(["artist_id"])
    )


def run_seed_chain(
    spark: SparkSession,
    client: ApiClient,
    names_path: str,
    batches_out: str,
    batch_size: int = 500,
    search_limit: int = 20,
) -> DataFrame:
    """The whole §3.2 chain as one lineage; returns the id pool."""
    batches = batch_names(spark, names_path, batch_size)
    write_name_batches(batches, batches_out)
    names = batches.select(F.explode("artist_names").alias("artist_name"))
    candidates = search_artist_candidates(names, client, limit=search_limit)
    return build_id_pool(candidates)
