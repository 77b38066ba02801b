"""Exactly-once streaming sink into a manifest-versioned dataset —
the streaming × versioning composition.

The problem it solves: Structured Streaming's foreachBatch gives
AT-LEAST-ONCE delivery — after a crash between the sink's side effect
and the checkpoint write, the SAME epoch is re-delivered and a naive
append doubles its rows (the reference's WRITE_APPEND double-load
hazard, reference spotify_etl_v2.py §gold, now in streaming form).
The standard fix is transactional sink state keyed by (streamId,
epochId) — Delta's txn table, Kafka's transactional producer ids.
Here the versioned dataset's manifest IS the transaction record:
``write_version(extra={"stream_id", "epoch"})`` publishes the epoch
marker in the SAME O_EXCL manifest rename that commits the data, so
"did this epoch commit?" and "is this data visible?" are one atomic
fact — there is no window where the data committed but the epoch
marker didn't (a sidecar epoch ledger would have exactly that torn
window, which is why it is wrong).

Re-delivery protocol in ``_commit_epoch``: scan the committed
manifest chain for this stream's epochs; if the incoming epoch is
already present, do NOTHING (the batch's rows are already visible —
the crash happened after manifest publish but before the streaming
checkpoint advanced). Otherwise write-and-publish. Readers see each
epoch's rows exactly once, verified end-to-end in
tests/test_versioned_stream.py with a real restart-after-rewind.

Scale: the manifest chain stays O(versions) kilobytes; epoch lookup
reads manifests, not data. At 100 TB the data files never rewrite —
per-epoch appends land as new immutable files, and compaction
(operators/compaction.py) owns the small-file follow-up.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

from spotify_data_pipeline_spark.operators.versioning import (
    _manifest_path,
    latest_version,
    write_version,
)

__all__ = ["committed_epochs", "versioned_stream_sink"]


def committed_epochs(root: str, stream_id: str) -> set[int]:
    """Epoch ids already committed for ``stream_id`` — read from the
    committed manifest chain only (orphan version dirs from crashed
    writers are invisible here, exactly like to readers)."""
    out: set[int] = set()
    v = latest_version(root)
    while v is not None:
        with open(_manifest_path(root, v)) as f:
            m = json.load(f)
        if m.get("stream_id") == stream_id and "epoch" in m:
            out.add(int(m["epoch"]))
        v = m.get("prev")
    return out


def _commit_epoch(
    batch_df: DataFrame, epoch_id: int, root: str, stream_id: str
) -> bool:
    """foreachBatch body: append ``batch_df`` as a new version unless
    this (stream_id, epoch) already committed. Returns whether a write
    happened (for tests/observability)."""
    if epoch_id in committed_epochs(root, stream_id):
        return False
    write_version(
        batch_df,
        root,
        mode="append",
        extra={"stream_id": stream_id, "epoch": int(epoch_id)},
    )
    return True


def versioned_stream_sink(
    stream_df: DataFrame,
    root: str,
    checkpoint_dir: str,
    stream_id: str,
    trigger_available_now: bool = True,
):
    """Start the exactly-once streaming write of ``stream_df`` into the
    versioned dataset at ``root``. One version per non-empty epoch;
    re-delivered epochs are no-ops. Returns the StreamingQuery."""
    os.makedirs(root, exist_ok=True)

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        # empty epochs publish no version — a crash-looping empty
        # trigger must not grow the manifest chain
        if batch_df.isEmpty():
            return
        _commit_epoch(batch_df, epoch_id, root, stream_id)

    writer = stream_df.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
