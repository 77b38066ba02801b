"""REST-style batch/paginated ingestion source (SURVEY.md §2.1 S5-S8).

The reference fetches from the Spotify Web API with urllib3 retries
(5 tries, backoff 1s, honoring Retry-After — spotify_etl_v2.py:36-43),
fixed page sizes (25 albums / 50 tracks), inter-call sleeps (0.5s), and
sequential single-threaded loops. Re-expressed Spark-first:

- keys are a DataFrame; fetching runs inside ``mapInPandas`` so each
  partition holds an independent client + token bucket. Global QPS =
  partitions × per-partition rate — sized via ``num_partitions``.
- pagination is a partition-local cursor loop (SURVEY S6/S7).
- the client is injected (``ApiClient`` protocol). Tests and local runs
  use ``FakeSpotifyClient`` over in-memory fixtures; a production
  client would wrap HTTP+retry. No network code is required for the
  engine itself.

Deviation (deliberate, SURVEY §5.1): the reference has a live bug —
in ``extract_albums`` the loop variable ``artist_id`` is clobbered by
the inner bridge loop (spotify_etl_v2.py:146,173), so every page after
the first queries the *wrong artist's* albums. This implementation
paginates the intended outer key; tests/test_pipeline.py carries the
multi-page regression fixture.
"""

from __future__ import annotations

import time
from collections.abc import Iterator
from dataclasses import dataclass, field
from typing import Any, Protocol

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


class ApiClient(Protocol):
    """Minimal surface of the reference's spotipy client (SURVEY S5-S8)."""

    def artists(self, ids: list[str]) -> list[dict[str, Any]]:
        """Batched attribute lookup, ≤50 ids per call (spotify_etl_v2.py:108)."""
        ...

    def artist_albums(self, artist_id: str, limit: int, offset: int) -> dict[str, Any]:
        """One page of albums: {'items': [...], 'next': url|None} (:147-188)."""
        ...

    def album_tracks(self, album_id: str, limit: int, offset: int) -> dict[str, Any]:
        """One page of tracks (:228-268)."""
        ...

    def search_artists(self, query: str, limit: int) -> list[dict[str, Any]]:
        """Top-k artist search: name → ≤limit (id, name) candidates
        (search_artist_id_and_name.py:37-46, SURVEY S8)."""
        ...


@dataclass
class FakeSpotifyClient:
    """Deterministic in-memory client for tests/local runs. Payload dicts
    mirror the raw API shapes (schemas.RAW_*); picklable so it ships into
    executor tasks."""

    artists_by_id: dict[str, dict[str, Any]] = field(default_factory=dict)
    albums_by_artist: dict[str, list[dict[str, Any]]] = field(default_factory=dict)
    tracks_by_album: dict[str, list[dict[str, Any]]] = field(default_factory=dict)
    search_index: dict[str, list[dict[str, Any]]] = field(default_factory=dict)

    def artists(self, ids: list[str]) -> list[dict[str, Any]]:
        return [self.artists_by_id[i] for i in ids if i in self.artists_by_id]

    def _page(self, items: list[dict[str, Any]], limit: int, offset: int) -> dict[str, Any]:
        page = items[offset : offset + limit]
        nxt = "next" if offset + limit < len(items) else None
        return {"items": page, "next": nxt}

    def artist_albums(self, artist_id: str, limit: int, offset: int) -> dict[str, Any]:
        return self._page(self.albums_by_artist.get(artist_id, []), limit, offset)

    def album_tracks(self, album_id: str, limit: int, offset: int) -> dict[str, Any]:
        return self._page(self.tracks_by_album.get(album_id, []), limit, offset)

    def search_artists(self, query: str, limit: int) -> list[dict[str, Any]]:
        return self.search_index.get(query, [])[:limit]


class TokenBucket:
    """Per-partition rate limiter — the distributed analog of the
    reference's inter-call time.sleep(0.5) (spotify_etl_v2.py:125,188)."""

    def __init__(self, min_interval_s: float) -> None:
        self.min_interval_s = min_interval_s
        self._last = 0.0

    def acquire(self) -> None:
        if self.min_interval_s <= 0:
            return
        now = time.monotonic()
        wait = self._last + self.min_interval_s - now
        if wait > 0:
            time.sleep(wait)
        self._last = time.monotonic()


_PAYLOAD_FIELD = T.StructField("payload", T.StringType())


def fetch_artists(
    keys: DataFrame,
    client: ApiClient,
    key_col: str = "artist_id",
    batch_size: int = 50,
    min_interval_s: float = 0.0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Batched attribute lookup (SURVEY S5): ids → raw artist payload
    JSON strings, batch_size ids per API call, rate-limited per
    partition. Output: (artist_id, payload json-string)."""
    import json

    out_schema = T.StructType([T.StructField(key_col, T.StringType()), _PAYLOAD_FIELD])
    if num_partitions:
        keys = keys.repartition(num_partitions, key_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bucket = TokenBucket(min_interval_s)
        for pdf in batches:
            ids = [i for i in pdf[key_col].tolist() if i]
            rows = []
            for start in range(0, len(ids), batch_size):
                chunk = ids[start : start + batch_size]
                bucket.acquire()
                for rec in client.artists(chunk):
                    rows.append({key_col: rec.get("id"), "payload": json.dumps(rec)})
            yield pd.DataFrame(rows, columns=[key_col, "payload"])

    return keys.select(key_col).mapInPandas(run, out_schema)


def fetch_paginated(
    keys: DataFrame,
    client: ApiClient,
    endpoint: str,  # 'artist_albums' | 'album_tracks'
    key_col: str,
    page_size: int,
    min_interval_s: float = 0.0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Paginated per-key fetch (SURVEY S6/S7): for each key, loop pages
    until ``next`` is null — cursor loop is partition-local, so 1000
    executors paginate 1000 keys concurrently.

    Pagination-bug fix (SURVEY §5.1): the page cursor closes over the
    *enumerated key of this loop*, never a reused outer variable.
    Output: (key, payload json-string) with one row per item.
    """
    import json

    out_schema = T.StructType([T.StructField(key_col, T.StringType()), _PAYLOAD_FIELD])
    if num_partitions:
        keys = keys.repartition(num_partitions, key_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bucket = TokenBucket(min_interval_s)
        fetch = getattr(client, endpoint)
        for pdf in batches:
            rows = []
            for key in pdf[key_col].tolist():
                if not key:
                    continue  # null-key filter (SURVEY P4)
                offset = 0
                while True:
                    bucket.acquire()
                    page = fetch(key, limit=page_size, offset=offset)
                    items = page.get("items") or []
                    for rec in items:
                        rows.append({key_col: key, "payload": json.dumps(rec)})
                    offset += len(items)
                    if not page.get("next") or not items:
                        break
            yield pd.DataFrame(rows, columns=[key_col, "payload"])

    return keys.select(key_col).mapInPandas(run, out_schema)
