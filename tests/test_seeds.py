"""Seed-chain tests (SURVEY.md §3.2): batching semantics, string
normalization/escaping, top-k search expansion, id-pool set-union,
create-if-absent writes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.pipeline.seeds import (
    batch_names,
    build_id_pool,
    run_seed_chain,
    search_artist_candidates,
    write_name_batches,
)
from spotify_data_pipeline_spark.sources.rest import FakeSpotifyClient


@pytest.fixture()
def names_file(tmp_path):
    """1100 names + blanks + irregular whitespace (FIXTURES.md A7)."""
    lines = []
    for i in range(1100):
        name = f"Artist   {i:04d}"  # internal double-space -> F1 normalization
        lines.append(name)
        if i % 50 == 0:
            lines.append("")  # blank lines interspersed
    lines.append('Quote "Heavy" Band')
    path = tmp_path / "artist_names.txt"
    path.write_text("\n".join(lines) + "\n")
    return str(path)


@pytest.fixture()
def search_client():
    c = FakeSpotifyClient()
    for i in range(1100):
        name = f"Artist {i:04d}"
        # 0..3 candidates per name; some names share a candidate id (dedup)
        cands = [{"id": f"id{i:04d}_{j}", "name": f"{name} v{j}"} for j in range(i % 4)]
        if i % 10 == 0 and cands:
            cands[0] = {"id": "shared000", "name": "Shared Artist"}
        c.search_index[f'artist:"{name}"'] = cands
    c.search_index['artist:"Quote \\"Heavy\\" Band"'] = [{"id": "qh001", "name": 'Quote "Heavy" Band'}]
    return c


def test_batches_dense_sized_and_normalized(spark, names_file):
    batches = batch_names(spark, names_file, batch_size=500).collect()
    sizes = {r.batch_id: len(r.artist_names) for r in batches}
    assert sizes == {1: 500, 2: 500, 3: 101}  # 1100 names + 1 quote band, blanks dropped
    all_names = [n for r in batches for n in r.artist_names]
    assert "Artist 0000" in all_names  # double space normalized (F1)
    assert not any("  " in n for n in all_names)


def test_write_batches_create_if_absent(spark, names_file, tmp_path):
    out = str(tmp_path / "batches")
    b = batch_names(spark, names_file, batch_size=500)
    write_name_batches(b, out)
    first = spark.read.json(out).count()
    # second write is a no-op (S10 idempotent seed semantics), not a failure
    write_name_batches(b.limit(1), out)
    assert spark.read.json(out).count() == first


def test_search_expansion_topk_and_escaping(spark, search_client):
    names = spark.createDataFrame(
        [("Artist   0003",), ('Quote "Heavy" Band',)], "artist_name string"
    )
    out = search_artist_candidates(names, search_client, limit=2).collect()
    by_query = {}
    for r in out:
        by_query.setdefault(r.query_name, []).append((r.rank, r.artist_id))
    # name normalized before querying; top-2 of the 3 candidates kept, rank order preserved
    assert sorted(by_query["Artist 0003"]) == [(1, "id0003_0"), (2, "id0003_1")]
    # quote-escaped query reached the index (F2)
    assert by_query['Quote "Heavy" Band'] == [(1, "qh001")]


def test_id_pool_set_union(spark, search_client, names_file):
    pool = run_seed_chain(
        spark, search_client, names_file, batches_out="/tmp/ignored_seed_batches"
    )
    rows = pool.collect()
    ids = [r.artist_id for r in rows]
    assert len(ids) == len(set(ids))  # U2 distinct
    assert "shared000" in ids and ids.count("shared000") == 1  # cross-name dedup
    assert "qh001" in ids


def test_read_parquet_evolved_handles_schema_drift(spark, tmp_path):
    """Silver-zone schema drift: day 1 lacks a column day 2 adds, and
    day 1 carries a column later retired. mergeSchema discovery unions
    them; the declared-schema path pins the consumer contract (missing
    -> NULL, retired -> dropped) without a footer sweep."""
    from pyspark.sql import types as T

    from spotify_data_pipeline_spark.sources.files import read_parquet_evolved

    base = str(tmp_path / "silver_drift")
    spark.createDataFrame(
        [(1, "a", 9.0)], "id long, name string, retired double"
    ).write.parquet(f"{base}/run_date=20240101")
    spark.createDataFrame(
        [(2, "b", 5)], "id long, name string, added int"
    ).write.parquet(f"{base}/run_date=20240102")

    merged = read_parquet_evolved(spark, base)
    assert {"id", "name", "retired", "added", "run_date"} <= set(merged.columns)
    rows = {r.id: (r.retired, r.added) for r in merged.collect()}
    assert rows[1] == (9.0, None) and rows[2] == (None, 5)

    contract = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("added", T.LongType()),  # cast int -> long
            T.StructField("never_existed", T.StringType()),  # NULL-pad
        ]
    )
    fixed = read_parquet_evolved(spark, base, schema=contract)
    assert [f.name for f in fixed.schema.fields] == ["id", "name", "added", "never_existed"]
    got = {r.id: (r.added, r.never_existed) for r in fixed.collect()}
    assert got[1] == (None, None) and got[2] == (5, None)
