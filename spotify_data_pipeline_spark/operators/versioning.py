"""Manifest-versioned parquet datasets — linear snapshot history with
atomic publish, time travel, and rollback: the minimal transactional-
table core (the Delta/Iceberg idea) re-expressed with nothing but
parquet files and a JSON manifest chain, no table-format dependency.

Protocol (optimistic single-slot concurrency, many readers):

- every ``write_version`` writes its data files into an IMMUTABLE
  per-version directory, then publishes a manifest naming the complete
  file list of the new snapshot (prev files + new for append; new only
  for overwrite), then flips the ``_latest`` pointer. Both publish
  steps are atomic POSIX renames.
- readers resolve ``_latest`` (or an explicit version) FIRST and read
  exactly the files that manifest names — a writer that crashed after
  writing data but before publishing left garbage files that no
  manifest references, so readers never see a torn snapshot.
- ``rollback`` is not an erase: it publishes a NEW version whose file
  list equals the old one, so history stays append-only and auditable.
- concurrent writers are handled OPTIMISTICALLY: the manifest publish
  uses O_EXCL create (the POSIX compare-and-swap on a name), so of two
  writers racing for the same version number exactly one commits and
  the loser raises ``VersionConflict`` — retry-by-rebase is the
  caller's move, exactly as in production table formats. A caller can
  also pass ``expected_version`` to fail fast when the table moved
  since it read.
- data files are never rewritten or deleted by this module; vacuuming
  unreferenced files is a separate concern (operators/compaction.py
  shows the checksum-preserving swap pattern for that).

At 100 TB the manifest stays kilobytes per version (file paths only)
while the data layout keeps whatever partitioning the writer chose —
snapshot resolution cost is independent of data size, which is the
entire point of manifest-first reads.

Cites: reference has per-day object-name versioning only
(spotify_etl_v2.py:104,130 — run_date prefixes, latest-wins);
this operator adds the snapshot/time-travel axis the reference lacks.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "VersionConflict",
    "write_version",
    "read_version",
    "history",
    "rollback",
    "latest_version",
]


class VersionConflict(RuntimeError):
    """Another writer committed the version this writer raced for (or
    the table moved past ``expected_version``). Re-read and retry."""

_MANIFEST_DIR = "_manifests"
_LATEST = "_latest"


def _manifest_path(root: str, version: int) -> str:
    return os.path.join(root, _MANIFEST_DIR, f"{version}.json")


def _atomic_write_json(path: str, payload: dict, exclusive: bool = False) -> None:
    """Atomic JSON publish. With ``exclusive``, the final step is an
    O_EXCL hard-link — the POSIX compare-and-swap on a name: if the
    manifest already exists, another writer won the race and this one
    gets ``VersionConflict`` with the target untouched."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(payload, f, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    if exclusive:
        try:
            os.link(tmp, path)  # fails with EEXIST if a racer committed
        except FileExistsError:
            raise VersionConflict(f"{path} was committed by another writer")
        finally:
            os.unlink(tmp)
    else:
        os.rename(tmp, path)  # atomic on POSIX


def latest_version(root: str) -> Optional[int]:
    """The committed version number, or None for an empty dataset."""
    p = os.path.join(root, _LATEST)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)["version"]


def _data_files(version_dir: str) -> list:
    return sorted(
        os.path.join(version_dir, f)
        for f in os.listdir(version_dir)
        if f.endswith(".parquet")
    )


def write_version(
    df: DataFrame,
    root: str,
    mode: str = "append",
    expected_version: int | None = None,
    extra: dict | None = None,
) -> int:
    """Publish ``df`` as the next snapshot. ``mode='append'`` stacks it
    on the previous snapshot's rows; ``'overwrite'`` replaces the
    logical content (old files stay on disk, still referenced by old
    manifests — time travel keeps working). Returns the new version.
    ``expected_version`` (optimistic check): raise ``VersionConflict``
    if the committed latest is no longer this value. ``extra``:
    caller metadata recorded INSIDE the manifest — atomic with the
    commit itself, which is what lets a streaming sink make
    epoch-idempotence transactional (streaming/versioned_stream.py);
    reserved manifest keys cannot be overridden."""
    if mode not in ("append", "overwrite"):
        raise ValueError("mode must be 'append' or 'overwrite'")
    prev = latest_version(root)
    if expected_version is not None and prev != expected_version:
        raise VersionConflict(
            f"table at version {prev}, writer expected {expected_version}"
        )
    # next version = past both the committed chain AND any orphaned
    # version dir a crashed writer left behind (its garbage must not
    # block the next commit — it is merely never referenced)
    floor_v = 0 if prev is None else prev + 1
    if os.path.isdir(root):
        orphans = [
            int(d.split("=", 1)[1])
            for d in os.listdir(root)
            if d.startswith("v=") and d.split("=", 1)[1].isdigit()
        ]
        if orphans:
            floor_v = max(floor_v, max(orphans) + 1)
    version = floor_v
    vdir = os.path.join(root, f"v={version}")
    # 1. immutable data files for this version
    df.write.mode("errorifexists").parquet(vdir)
    files = _data_files(vdir)
    if mode == "append" and prev is not None:
        with open(_manifest_path(root, prev)) as f:
            files = json.load(f)["files"] + files
    # 2. publish the manifest with O_EXCL (the CAS: exactly one of two
    # racing writers commits this version number), then 3. flip the
    # pointer — the loser's data files stay as invisible orphans, the
    # torn-write case readers already ignore
    manifest = dict(extra or {})
    manifest.update(
        {
            "version": version,
            "mode": mode,
            "prev": prev,
            "files": files,
            "committed_at": time.time(),
        }
    )
    _atomic_write_json(_manifest_path(root, version), manifest, exclusive=True)
    _atomic_write_json(os.path.join(root, _LATEST), {"version": version})
    return version


def read_version(
    spark: SparkSession, root: str, version: Optional[int] = None
) -> DataFrame:
    """Read a snapshot: the latest by default, or any committed
    version (time travel). Resolves the manifest FIRST and reads
    exactly the files it names — unreferenced (crashed-writer) files
    are invisible by construction."""
    v = latest_version(root) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no committed version under {root}")
    mp = _manifest_path(root, v)
    if not os.path.exists(mp):
        raise FileNotFoundError(f"version {v} was never committed under {root}")
    with open(mp) as f:
        files = json.load(f)["files"]
    return spark.read.parquet(*files)


def history(root: str) -> list:
    """The committed manifest chain, oldest first (version, mode,
    prev, n_files) — the audit surface."""
    latest = latest_version(root)
    if latest is None:
        return []
    out = []
    for v in range(latest + 1):
        mp = _manifest_path(root, v)
        if not os.path.exists(mp):
            continue  # rollback targets can skip nothing today; guard anyway
        with open(mp) as f:
            m = json.load(f)
        row = {
            "version": m["version"],
            "mode": m["mode"],
            "prev": m["prev"],
            "n_files": len(m["files"]),
        }
        # surface caller metadata (write_version extra=...) so the
        # audit view shows WHO committed — e.g. a streaming epoch
        for k in ("stream_id", "epoch"):
            if k in m:
                row[k] = m[k]
        out.append(row)
    return out


def rollback(root: str, to_version: int) -> int:
    """Publish a NEW version whose content equals ``to_version`` —
    history is append-only, so the bad version stays visible in the
    audit chain (this is how production table formats do it too)."""
    mp = _manifest_path(root, to_version)
    if not os.path.exists(mp):
        raise FileNotFoundError(f"version {to_version} does not exist")
    with open(mp) as f:
        target = json.load(f)
    prev = latest_version(root)
    version = (prev or 0) + 1
    _atomic_write_json(
        _manifest_path(root, version),
        {
            "version": version,
            "mode": f"rollback:{to_version}",
            "prev": prev,
            "files": target["files"],
            "committed_at": time.time(),
        },
        exclusive=True,  # same CAS as write_version: racers lose loudly
    )
    _atomic_write_json(os.path.join(root, _LATEST), {"version": version})
    return version
