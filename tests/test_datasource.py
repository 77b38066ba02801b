"""Spark 4 Python DataSource tests (sources/datasource.py): the
spark.read.format('rest_api') twin must agree with the mapInPandas
ingestion path, paginate correctly (§5.1 regression), and split keys
across input partitions."""

from __future__ import annotations

import json

import pytest

from spotify_data_pipeline_spark.sources.datasource import RestApiDataSource
from spotify_data_pipeline_spark.sources.rest import FakeSpotifyClient, fetch_paginated


@pytest.fixture(scope="module")
def fixture_path(tmp_path_factory):
    c = {
        "artists_by_id": {
            f"ar{i:03d}": {"id": f"ar{i:03d}", "name": f"Artist {i}", "popularity": i}
            for i in range(8)
        },
        "albums_by_artist": {
            # 5 albums -> 3 pages at page_size=2 (pagination regression)
            "ar000": [{"id": f"al{j:03d}", "name": f"Album {j}"} for j in range(5)],
            "ar001": [{"id": "al010", "name": "Album 10"}],
        },
        "tracks_by_album": {},
        "search_index": {},
    }
    p = tmp_path_factory.mktemp("ds") / "fixture.json"
    p.write_text(json.dumps(c))
    return str(p)


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(RestApiDataSource)
    return spark


def test_datasource_paginated_matches_mapinpandas(registered, fixture_path):
    spark = registered
    out = (
        spark.read.format("rest_api")
        .option("endpoint", "artist_albums")
        .option("keys", "ar000,ar001")
        .option("page_size", "2")
        .option("fixture_path", fixture_path)
        .load()
    )
    ds_rows = {(r.key, json.loads(r.payload)["id"]) for r in out.collect()}

    with open(fixture_path) as f:
        data = json.load(f)
    client = FakeSpotifyClient(albums_by_artist=data["albums_by_artist"])
    keys = spark.createDataFrame([("ar000",), ("ar001",)], "artist_id string")
    mp = fetch_paginated(keys, client, "artist_albums", "artist_id", page_size=2)
    mp_rows = {(r.artist_id, json.loads(r.payload)["id"]) for r in mp.collect()}

    assert ds_rows == mp_rows
    assert len({a for k, a in ds_rows if k == "ar000"}) == 5  # all 3 pages


def test_datasource_batch_lookup_and_partitioning(registered, fixture_path):
    spark = registered
    out = (
        spark.read.format("rest_api")
        .option("endpoint", "artists")
        .option("keys", ",".join(f"ar{i:03d}" for i in range(8)))
        .option("page_size", "3")
        .option("num_partitions", "4")
        .option("fixture_path", fixture_path)
        .load()
    )
    assert out.rdd.getNumPartitions() == 4  # keys split across partitions
    rows = {r.key: json.loads(r.payload)["popularity"] for r in out.collect()}
    assert rows == {f"ar{i:03d}": i for i in range(8)}
