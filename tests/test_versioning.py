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
