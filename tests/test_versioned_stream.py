"""streaming/versioned_stream.py — exactly-once streaming appends into
a manifest-versioned dataset: epoch idempotence (re-delivered epochs
are no-ops, the at-least-once → exactly-once fix), atomicity of the
epoch marker with the data commit, end-to-end file-source run,
restart-after-checkpoint-rewind (the real crash-recovery shape), and
interop with batch write_version in one history."""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import functions as F

from spotify_data_pipeline_spark.operators.versioning import (
    history,
    latest_version,
    read_version,
    write_version,
)
from spotify_data_pipeline_spark.streaming.versioned_stream import (
    _commit_epoch,
    committed_epochs,
    versioned_stream_sink,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "id * 10 AS val")


def test_epoch_idempotence_direct(spark, tmp_path):
    """The core claim, unit-level: committing the same epoch twice
    writes once; a different epoch writes again; reader sees each
    epoch's rows exactly once."""
    root = str(tmp_path / "tbl")
    os.makedirs(root)
    assert _commit_epoch(_df(spark, 0, 5), 0, root, "q1") is True
    # re-delivery of epoch 0 (crash between sink commit and checkpoint)
    assert _commit_epoch(_df(spark, 0, 5), 0, root, "q1") is False
    assert _commit_epoch(_df(spark, 5, 8), 1, root, "q1") is True
    assert latest_version(root) == 1
    assert read_version(spark, root).count() == 8
    assert committed_epochs(root, "q1") == {0, 1}
    # a DIFFERENT stream's epoch 0 is independent
    assert _commit_epoch(_df(spark, 100, 101), 0, root, "q2") is True
    assert committed_epochs(root, "q1") == {0, 1}
    assert committed_epochs(root, "q2") == {0}


def test_epoch_marker_atomic_with_commit(spark, tmp_path):
    """The epoch id lives INSIDE the committed manifest (one atomic
    rename), not in a sidecar — the torn-window impossibility the
    module docstring claims."""
    root = str(tmp_path / "tbl")
    os.makedirs(root)
    _commit_epoch(_df(spark, 0, 3), 7, root, "q1")
    with open(os.path.join(root, "_manifests", "0.json")) as f:
        m = json.load(f)
    assert m["epoch"] == 7 and m["stream_id"] == "q1"
    assert m["version"] == 0 and m["files"]
    # reserved keys cannot be clobbered by extra metadata
    v = write_version(
        _df(spark, 3, 4), root, extra={"version": 999, "files": []}
    )
    with open(os.path.join(root, "_manifests", f"{v}.json")) as f:
        m2 = json.load(f)
    assert m2["version"] == v and m2["files"]


def test_end_to_end_file_source_and_restart(spark, tmp_path):
    """Real Structured Streaming run: a parquet file source drained
    with availableNow into the versioned sink; then the checkpoint is
    REWOUND (copy saved before the last run) and the query re-run —
    the re-delivered epochs must not duplicate rows."""
    src = str(tmp_path / "src")
    root = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    ckpt_save = str(tmp_path / "ckpt_save")
    _df(spark, 0, 10).write.parquet(src)

    stream = spark.readStream.schema("id BIGINT, val BIGINT").parquet(src)
    q = versioned_stream_sink(stream, root, ckpt, "events_q")
    q.awaitTermination(120)
    assert read_version(spark, root).count() == 10
    n_versions_first = len(history(root))

    # save the checkpoint, add more source data, drain again
    shutil.copytree(ckpt, ckpt_save)
    _df(spark, 10, 15).write.mode("append").parquet(src)
    q2 = versioned_stream_sink(
        spark.readStream.schema("id BIGINT, val BIGINT").parquet(src),
        root, ckpt, "events_q",
    )
    q2.awaitTermination(120)
    assert read_version(spark, root).count() == 15

    # crash simulation: rewind the checkpoint to before the second
    # drain and re-run — the source epoch replays, the sink must no-op
    shutil.rmtree(ckpt)
    shutil.copytree(ckpt_save, ckpt)
    q3 = versioned_stream_sink(
        spark.readStream.schema("id BIGINT, val BIGINT").parquet(src),
        root, ckpt, "events_q",
    )
    q3.awaitTermination(120)
    got = read_version(spark, root)
    assert got.count() == 15  # no duplicates from the replayed epoch
    assert got.select("id").distinct().count() == 15
    assert len(history(root)) >= n_versions_first + 1


def test_batch_and_stream_interop_one_history(spark, tmp_path):
    """Batch write_version snapshots and streaming epochs chain into
    ONE auditable history; time travel across the boundary works."""
    root = str(tmp_path / "tbl")
    v0 = write_version(_df(spark, 0, 4), root, mode="append")
    os.makedirs(root, exist_ok=True)
    _commit_epoch(_df(spark, 4, 6), 0, root, "q1")
    v2 = write_version(_df(spark, 6, 7), root, mode="append")
    assert (v0, v2) == (0, 2)
    assert read_version(spark, root, 0).count() == 4
    assert read_version(spark, root, 1).count() == 6
    assert read_version(spark, root, 2).count() == 7
    kinds = [
        ("epoch" in m, m["version"]) for m in history(root)
    ]
    assert (True, 1) in kinds  # the streaming commit is in the chain