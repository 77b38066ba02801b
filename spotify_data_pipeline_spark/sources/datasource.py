"""Spark 4 Python DataSource for REST-style ingestion (SURVEY.md §2.1
S5-S8 — the 'custom Python Data Source' mapping).

``spark.read.format("rest_api")`` twin of the ``mapInPandas`` ingestion
in sources/rest.py: keys are split into input partitions, each partition
fetches with its own client + token bucket (global QPS = partitions ×
per-partition rate), pagination is a partition-local cursor loop with
the SURVEY §5.1 bug fixed (the cursor closes over this partition's key,
never a reused outer variable).

The client is built from options (strings only, per the DataSource API):
``client_factory`` names a registered factory; the in-repo
``fixture`` factory loads a FakeSpotifyClient from a JSON file
(``fixture_path``) — a production deployment registers a factory that
wraps HTTP + retry (spotify_etl_v2.py:36-43 semantics) instead. No
network code ships with the engine.

Options:
    endpoint        artists | artist_albums | album_tracks | search_artists
    keys            comma-separated key list (or keys_path: newline file)
    client_factory  registered factory name (default 'fixture')
    fixture_path    JSON file for the fixture factory
    page_size       page/batch size (default 25; 50 for artists batch)
    num_partitions  input partitions (default 4)
    min_interval_s  per-partition rate floor (default 0)
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator, Sequence
from typing import Any

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_CLIENT_FACTORIES: dict[str, Callable[[dict[str, str]], Any]] = {}


def register_client_factory(name: str, factory: Callable[[dict[str, str]], Any]) -> None:
    _CLIENT_FACTORIES[name] = factory


def _fixture_client(options: dict[str, str]):
    from spotify_data_pipeline_spark.sources.rest import FakeSpotifyClient

    path = options.get("fixture_path")
    if not path:
        raise ValueError("fixture client_factory requires fixture_path option")
    with open(path) as f:
        data = json.load(f)
    return FakeSpotifyClient(
        artists_by_id=data.get("artists_by_id", {}),
        albums_by_artist=data.get("albums_by_artist", {}),
        tracks_by_album=data.get("tracks_by_album", {}),
        search_index=data.get("search_index", {}),
    )


register_client_factory("fixture", _fixture_client)


class _KeysPartition(InputPartition):
    def __init__(self, keys: Sequence[str]) -> None:
        self.keys = list(keys)


class RestApiDataSource(DataSource):
    """spark.read.format('rest_api') — register with
    ``spark.dataSource.register(RestApiDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "rest_api"

    def schema(self) -> str:
        return "key string, payload string"

    def reader(self, schema) -> "RestApiReader":
        return RestApiReader(self.options)


class RestApiReader(DataSourceReader):
    def __init__(self, options: dict[str, str]) -> None:
        self.options = dict(options)
        self.endpoint = self.options.get("endpoint", "artists")
        if self.endpoint not in ("artists", "artist_albums", "album_tracks", "search_artists"):
            raise ValueError(f"unknown endpoint {self.endpoint!r}")
        # Resolve the factory HERE, on the driver, and keep the callable
        # on the reader so it is pickled (cloudpickle) to executors with
        # it. Resolving the name inside read() would consult the
        # executor worker's re-imported module, where only the built-in
        # 'fixture' entry exists — a driver-side register_client_factory
        # would be invisible and read() would KeyError on real clusters.
        factory_name = self.options.get("client_factory", "fixture")
        try:
            self._client_factory = _CLIENT_FACTORIES[factory_name]
        except KeyError:
            raise ValueError(
                f"unknown client_factory {factory_name!r}; registered: "
                f"{sorted(_CLIENT_FACTORIES)}"
            ) from None
        if "keys" in self.options:
            self.keys = [k for k in self.options["keys"].split(",") if k]
        elif "keys_path" in self.options:
            with open(self.options["keys_path"]) as f:
                self.keys = [line.strip() for line in f if line.strip()]
        else:
            raise ValueError("rest_api source requires keys or keys_path option")

    def partitions(self) -> Sequence[InputPartition]:
        n = max(1, int(self.options.get("num_partitions", "4")))
        chunks: list[list[str]] = [[] for _ in range(min(n, max(len(self.keys), 1)))]
        for i, k in enumerate(self.keys):
            chunks[i % len(chunks)].append(k)
        return [_KeysPartition(c) for c in chunks if c]

    def read(self, partition: _KeysPartition) -> Iterator[tuple[str, str]]:
        from spotify_data_pipeline_spark.sources.rest import TokenBucket

        client = self._client_factory(self.options)
        bucket = TokenBucket(float(self.options.get("min_interval_s", "0")))
        page_size = int(self.options.get("page_size", "25"))

        if self.endpoint == "artists":
            for start in range(0, len(partition.keys), page_size):
                chunk = partition.keys[start : start + page_size]
                bucket.acquire()
                for rec in client.artists(chunk):
                    yield rec.get("id"), json.dumps(rec)
        elif self.endpoint == "search_artists":
            for key in partition.keys:
                bucket.acquire()
                for rec in client.search_artists(key, limit=page_size):
                    yield key, json.dumps(rec)
        else:
            fetch = getattr(client, self.endpoint)
            for key in partition.keys:
                offset = 0
                while True:
                    bucket.acquire()
                    page = fetch(key, limit=page_size, offset=offset)
                    items = page.get("items") or []
                    for rec in items:
                        yield key, json.dumps(rec)
                    offset += len(items)
                    if not page.get("next") or not items:
                        break
