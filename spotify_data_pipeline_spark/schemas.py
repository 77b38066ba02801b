"""Declared schemas (SURVEY.md §1).

The reference enforces schemas by projection — ``pd.DataFrame(data,
columns=[...])`` selects, orders, and NULL-pads columns
(spotify_etl_v2.py:327-331). Here every zone has an explicit
``StructType``; ``sources.files.enforce_schema`` applies the same
select/cast/pad semantics as a Catalyst projection.

Entity tables (spotify_etl_v2.py:390 entity list; column sets cited in
SURVEY §1.1). ``release_date`` stays a STRING on purpose — Spotify
returns mixed precision 'YYYY'/'YYYY-MM'/'YYYY-MM-DD' and the reference
never parses it (spotify_etl_v2.py:165).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Silver/gold entity tables (SURVEY §1.1)
# ---------------------------------------------------------------------------

ARTIST = T.StructType(
    [
        T.StructField("artist_id", T.StringType()),
        T.StructField("artist_name", T.StringType()),
        T.StructField("followers", T.LongType()),
        T.StructField("popularity", T.LongType()),
    ]
)

ALBUM = T.StructType(
    [
        T.StructField("album_id", T.StringType()),
        T.StructField("album_name", T.StringType()),
        T.StructField("release_date", T.StringType()),  # kept string (§1.2)
        T.StructField("type", T.StringType()),
        T.StructField("total_tracks", T.LongType()),
        T.StructField("album_group", T.StringType()),
    ]
)

ALBUM_ARTISTS = T.StructType(
    [
        T.StructField("artist_id", T.StringType()),
        T.StructField("artist_name", T.StringType()),
        T.StructField("album_id", T.StringType()),
        T.StructField("album_name", T.StringType()),
    ]
)

TRACK = T.StructType(
    [
        # note: no album_id — the reference's modeling gap is preserved
        # as observable behavior (SURVEY §1.1)
        T.StructField("track_id", T.StringType()),
        T.StructField("track_name", T.StringType()),
        T.StructField("track_number", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

TRACK_ARTISTS = T.StructType(
    [
        T.StructField("artist_id", T.StringType()),
        T.StructField("artist_name", T.StringType()),
        T.StructField("track_id", T.StringType()),
        T.StructField("track_name", T.StringType()),
    ]
)

ENTITY_SCHEMAS: dict[str, T.StructType] = {
    "artist": ARTIST,
    "album": ALBUM,
    "album_artists": ALBUM_ARTISTS,
    "track": TRACK,
    "track_artists": TRACK_ARTISTS,
}

# ---------------------------------------------------------------------------
# Raw (bronze) payload shapes (SURVEY §1.2 / FIXTURES.md A6)
# ---------------------------------------------------------------------------

_ID_NAME = T.StructType(
    [T.StructField("id", T.StringType()), T.StructField("name", T.StringType())]
)

RAW_ARTIST = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField(
            "followers", T.StructType([T.StructField("total", T.LongType())])
        ),
        T.StructField("popularity", T.LongType()),
    ]
)

RAW_ALBUM = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("release_date", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("total_tracks", T.LongType()),
        T.StructField("album_group", T.StringType()),
        T.StructField("artists", T.ArrayType(_ID_NAME)),
    ]
)

RAW_TRACK = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("track_number", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("artists", T.ArrayType(_ID_NAME)),
    ]
)

RAW_SCHEMAS: dict[str, T.StructType] = {
    "artist": RAW_ARTIST,
    "album": RAW_ALBUM,
    "track": RAW_TRACK,
}

# Seed-side records (SURVEY §1.1: create_artist_batches.py:32,
# search_artist_id_and_name.py:46)
NAME_BATCH = T.StructType(
    [
        T.StructField("batch_id", T.LongType()),
        T.StructField("artist_names", T.ArrayType(T.StringType())),
    ]
)

ID_NAME_RECORD = T.StructType(
    [
        T.StructField("artist_id", T.StringType()),
        T.StructField("artist_name", T.StringType()),
    ]
)
