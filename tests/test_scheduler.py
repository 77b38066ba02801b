"""pipeline/scheduler.py — the reference DAG's task-level retry/
ordering policy (spotify_etl_v2.py:396-435), deterministic under a
fake clock."""

from __future__ import annotations

import pytest

from spotify_data_pipeline_spark.pipeline.scheduler import (
    RetryPolicy,
    daily_dates,
    run_backfill,
    run_chain,
    run_task,
)


def test_backoff_schedule_matches_airflow_defaults():
    """retries=3, delay 2 min, exponential, cap 30 min: 120/240/480 —
    and the cap bites from try 5 were the budget larger."""
    p = RetryPolicy()
    assert [p.backoff_s(i) for i in (1, 2, 3, 4, 5, 6)] == [
        120.0,
        240.0,
        480.0,
        960.0,
        1800.0,
        1800.0,
    ]
    flat = RetryPolicy(exponential_backoff=False)
    assert [flat.backoff_s(i) for i in (1, 3)] == [120.0, 120.0]


def test_run_task_retries_then_succeeds():
    sleeps: list[float] = []
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("boom")

    res = run_task("t", flaky, sleep=sleeps.append)
    assert (res.state, res.tries) == ("success", 3)
    assert sleeps == [120.0, 240.0]


def test_run_task_exhausts_budget():
    sleeps: list[float] = []

    def always():
        raise ValueError("nope")

    res = run_task("t", always, sleep=sleeps.append)
    assert (res.state, res.tries) == ("failed", 4)  # 1 + 3 retries
    assert sleeps == [120.0, 240.0, 480.0]
    assert "ValueError: nope" == res.error


def test_chain_skips_downstream_on_failure():
    ran: list[str] = []

    def ok(name):
        return lambda: ran.append(name)

    def bad():
        raise RuntimeError("x")

    results = run_chain(
        [
            ("extract_artists", ok("a")),
            ("extract_albums", bad),
            ("extract_tracks", ok("c")),
            ("transform", ok("d")),
            ("load", ok("e")),
        ],
        policy=RetryPolicy(retries=1),
        sleep=lambda s: None,
    )
    assert [r.state for r in results] == [
        "success",
        "failed",
        "upstream_failed",
        "upstream_failed",
        "upstream_failed",
    ]
    assert ran == ["a"]  # downstream callables never invoked
    assert results[1].tries == 2


def test_daily_dates_catchup():
    assert daily_dates("2025-08-29", "2025-09-01") == [
        "20250829",
        "20250830",
        "20250831",
        "20250901",
    ]
    assert daily_dates("2025-08-29", "2025-08-29") == ["20250829"]
    with pytest.raises(ValueError):
        daily_dates("2025-08-29", "2025-08-28")


def test_backfill_serialized_in_date_order_and_idempotent_skip():
    order: list[tuple[str, str]] = []

    def tasks_for(ds):
        def mk(name):
            def run():
                # max_active_runs=1: every earlier-started run must have
                # fully finished (both its tasks) before this one runs
                started = {d for d, _ in order if d != ds}
                for prev in started:
                    assert [n for d, n in order if d == prev] == [
                        "extract",
                        "load",
                    ], f"run {prev} still mid-flight when {ds} started"
                order.append((ds, name))

            return run

        return [("extract", mk("extract")), ("load", mk("load"))]

    dates = daily_dates("2024-01-01", "2024-01-03")
    report = run_backfill(
        dates,
        tasks_for,
        sleep=lambda s: None,
        is_complete=lambda ds: ds == "20240102",
    )
    assert report.skipped == ["20240102"]
    assert list(report.runs) == ["20240101", "20240103"]
    assert report.states == {"20240101": "success", "20240103": "success"}
    # strict date order, one run fully before the next starts
    assert order == [
        ("20240101", "extract"),
        ("20240101", "load"),
        ("20240103", "extract"),
        ("20240103", "load"),
    ]


def test_backfill_failed_day_does_not_block_later_days():
    def tasks_for(ds):
        def maybe():
            if ds == "20240101":
                raise RuntimeError("api down")

        return [("extract", maybe)]

    report = run_backfill(
        daily_dates("2024-01-01", "2024-01-02"),
        tasks_for,
        policy=RetryPolicy(retries=0),
        sleep=lambda s: None,
    )
    assert report.states == {"20240101": "failed", "20240102": "success"}


def test_chain_drives_real_pipeline_tasks(spark, tmp_path):
    """The chain runs the REAL run_daily stages as its five tasks over
    the in-repo fake client — the reference DAG wiring end-to-end."""
    from spotify_data_pipeline_spark.pipeline.etl import (
        PipelineConfig,
        extract_albums,
        extract_artists,
        extract_tracks,
        load,
        transform,
    )
    from spotify_data_pipeline_spark.sources.rest import FakeSpotifyClient

    cfg = PipelineConfig(
        bronze=str(tmp_path / "bronze"),
        silver=str(tmp_path / "silver"),
        gold=str(tmp_path / "gold"),
        daily_sample=3,
    )
    client = FakeSpotifyClient()
    for i in range(3):
        aid = f"ar{i:03d}"
        client.artists_by_id[aid] = {
            "id": aid,
            "name": f"Artist {i}",
            "followers": {"total": 100 * i},
            "popularity": 50 + i,
        }
        client.albums_by_artist[aid] = [
            {
                "id": f"al{i:03d}",
                "name": f"Album {i}",
                "release_date": "2020-01-01",
                "album_type": "album",
                "total_tracks": 1,
                "album_group": "album",
                "artists": [{"id": aid, "name": f"Artist {i}"}],
            }
        ]
        client.tracks_by_album[f"al{i:03d}"] = [
            {
                "id": f"tr{i:03d}",
                "name": f"Track {i}",
                "track_number": 1,
                "duration_ms": 30000,
                "artists": [{"id": aid, "name": f"Artist {i}"}],
            }
        ]
    ids = spark.createDataFrame(
        [(f"ar{i:03d}",) for i in range(3)], "artist_id string"
    )
    ds = "20240115"
    results = run_chain(
        [
            ("extract_artists", lambda: extract_artists(spark, client, ids, ds, cfg)),
            ("extract_albums", lambda: extract_albums(spark, client, ids, ds, cfg)),
            ("extract_tracks", lambda: extract_tracks(spark, client, ds, cfg)),
            ("transform", lambda: transform(spark, ds, cfg)),
            ("load", lambda: load(spark, ds, cfg)),
        ],
        sleep=lambda s: None,
    )
    assert [r.state for r in results] == ["success"] * 5
    gold = spark.read.parquet(f"{cfg.gold}/artist/run_date={ds}")
    assert gold.count() > 0
