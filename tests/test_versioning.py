"""operators/versioning.py — manifest-versioned datasets: time travel,
append/overwrite semantics, crashed-writer invisibility, rollback
auditability."""

from __future__ import annotations

import os

import pytest

from spotify_data_pipeline_spark.operators.versioning import (
    history,
    latest_version,
    read_version,
    rollback,
    write_version,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "id * 10 AS val")


def test_append_and_overwrite_snapshots(spark, tmp_path):
    root = str(tmp_path / "tbl")
    v0 = write_version(_df(spark, 0, 5), root, mode="append")
    v1 = write_version(_df(spark, 5, 8), root, mode="append")
    v2 = write_version(_df(spark, 100, 102), root, mode="overwrite")
    assert (v0, v1, v2) == (0, 1, 2)
    assert read_version(spark, root, 0).count() == 5
    assert read_version(spark, root, 1).count() == 8  # append stacked
    assert read_version(spark, root, 2).count() == 2  # overwrite replaced
    assert read_version(spark, root).count() == 2  # latest
    # time travel still sees v1 content exactly
    ids = {r.id for r in read_version(spark, root, 1).collect()}
    assert ids == set(range(8))


def test_crashed_writer_is_invisible(spark, tmp_path):
    root = str(tmp_path / "tbl")
    write_version(_df(spark, 0, 5), root)
    # simulate a writer that died after writing data, before publishing:
    # data files exist in a version dir no manifest references
    _df(spark, 1000, 2000).write.parquet(os.path.join(root, "v=1"))
    assert latest_version(root) == 0
    assert read_version(spark, root).count() == 5  # torn write invisible
    # the next committed writer skips PAST the garbage dir: the orphan
    # neither blocks the commit nor leaks into any snapshot
    v = write_version(_df(spark, 5, 8), root, mode="append")
    assert v == 2  # v=1 burned by the crashed writer, never referenced
    assert read_version(spark, root).count() == 8
    ids = {r.id for r in read_version(spark, root).collect()}
    assert ids == set(range(8))  # none of the 1000..1999 garbage rows


def test_rollback_is_append_only(spark, tmp_path):
    root = str(tmp_path / "tbl")
    write_version(_df(spark, 0, 5), root)
    write_version(_df(spark, 0, 1), root, mode="overwrite")  # the "bad" write
    v = rollback(root, 0)
    assert v == 2
    assert read_version(spark, root).count() == 5  # content restored
    h = history(root)
    assert [e["version"] for e in h] == [0, 1, 2]
    assert h[2]["mode"] == "rollback:0"
    # the bad version is still auditable via time travel
    assert read_version(spark, root, 1).count() == 1


def test_read_uncommitted_version_raises(spark, tmp_path):
    root = str(tmp_path / "tbl")
    with pytest.raises(FileNotFoundError):
        read_version(spark, root)
    write_version(_df(spark, 0, 3), root)
    with pytest.raises(FileNotFoundError):
        read_version(spark, root, 7)


def test_optimistic_concurrency(spark, tmp_path):
    """expected_version fails fast when the table moved; the O_EXCL
    manifest publish means a simulated racer's manifest blocks this
    writer's commit of the same version (exactly-one-commits)."""
    import json
    import os

    from spotify_data_pipeline_spark.operators.versioning import VersionConflict

    root = str(tmp_path / "tbl")
    write_version(_df(spark, 0, 5), root)
    # fail-fast path: the caller read v0 but someone committed v1
    write_version(_df(spark, 5, 6), root)
    with pytest.raises(VersionConflict, match="expected 0"):
        write_version(_df(spark, 6, 7), root, expected_version=0)
    # CAS path: a racer pre-commits manifest 2; our publish must lose
    mdir = os.path.join(root, "_manifests")
    with open(os.path.join(mdir, "2.json"), "w") as f:
        json.dump({"version": 2, "mode": "append", "prev": 1,
                   "files": [], "committed_at": 0}, f)
    with pytest.raises(VersionConflict, match="another writer"):
        write_version(_df(spark, 6, 7), root)
    # the loser's orphan data dir does not corrupt anything: latest
    # pointer still resolves and a fresh read works
    assert read_version(spark, root, 1).count() == 6
