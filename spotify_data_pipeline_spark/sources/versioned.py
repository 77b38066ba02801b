"""``df.write.format("versioned_parquet")`` — a Spark 4 Python
DataSource WRITER publishing manifest-versioned snapshots
(operators/versioning.py) through Spark's native write path.

This is the table-format commit protocol expressed where it actually
lives in production engines — the two-phase DataSource write:

- each TASK writes its rows to a parquet part file in a private
  staging directory and returns the file name as its commit message
  (task-level work, executor-side, embarrassingly parallel);
- the DRIVER's ``commit(messages)`` — called only when every task
  succeeded — picks the next version number, renames the staged parts
  into the immutable ``v=N`` directory, and publishes the manifest
  with the same O_EXCL compare-and-swap ``write_version`` uses;
- ``abort(messages)`` (any task failed) deletes the staging directory:
  no manifest was ever published, so readers never saw anything — and
  even an abort that itself crashes leaves only unreferenced staging
  files, which the manifest-first read protocol ignores by
  construction.

So the atomicity story is end-to-end: a failed/killed WRITE JOB is
invisible, exactly like the crashed single-process writer the
versioning tests already pin.

Options: ``root`` (dataset directory, required). Spark's save mode
maps naturally: ``append`` stacks on the previous snapshot,
``overwrite`` replaces logical content (old manifests keep working —
time travel). Reads go through ``versioning.read_version`` (manifest
resolution is a metadata operation; the data files are plain parquet
that Spark's native reader scans with full pushdown).

Parts are written with pyarrow using a schema mapped from the Spark
StructType (primitive types + arrays of primitives — enough for every
table in this engine; nested structs would extend the mapping), so an
all-NULL or empty partition cannot silently change the column types.
"""

from __future__ import annotations

import os
import shutil
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceWriter, WriterCommitMessage

__all__ = ["VersionedParquetDataSource", "register_versioned_sink"]


@dataclass
class _PartFile(WriterCommitMessage):
    path: str
    rows: int


def _arrow_type(dt):
    import pyarrow as pa

    from pyspark.sql import types as T

    if isinstance(dt, T.LongType):
        return pa.int64()
    if isinstance(dt, T.IntegerType):
        return pa.int32()
    if isinstance(dt, T.DoubleType):
        return pa.float64()
    if isinstance(dt, T.FloatType):
        return pa.float32()
    if isinstance(dt, T.StringType):
        return pa.string()
    if isinstance(dt, T.BooleanType):
        return pa.bool_()
    if isinstance(dt, T.TimestampType):
        # isAdjustedToUTC=true so Spark reads the column back as an
        # instant TIMESTAMP, not TIMESTAMP_NTZ (the io.load_table
        # normalization story, applied at write time)
        return pa.timestamp("us", tz="UTC")
    if isinstance(dt, T.TimestampNTZType):
        return pa.timestamp("us")
    if isinstance(dt, T.DateType):
        return pa.date32()
    if isinstance(dt, T.BinaryType):
        return pa.binary()
    if isinstance(dt, T.ArrayType):
        return pa.list_(_arrow_type(dt.elementType))
    raise TypeError(f"versioned_parquet writer: unsupported type {dt}")


class _VersionedWriter(DataSourceWriter):
    def __init__(self, root: str, schema, overwrite: bool, fail: bool) -> None:
        self.root = root
        self.schema = schema
        self.mode = "overwrite" if overwrite else "append"
        self.staging = os.path.join(root, "_staging", uuid.uuid4().hex)
        self.fail = fail  # test hook: deterministic task failure

    # -- executor side ----------------------------------------------------
    def write(self, iterator):
        import pyarrow as pa
        import pyarrow.parquet as pq

        if self.fail:
            raise RuntimeError("versioned_parquet: injected task failure")
        names = [f.name for f in self.schema.fields]
        cols: dict = {n: [] for n in names}
        n = 0
        for row in iterator:
            for name in names:
                cols[name].append(row[name])
            n += 1
        if n == 0:
            return _PartFile(path="", rows=0)
        arrow_schema = pa.schema(
            [(f.name, _arrow_type(f.dataType)) for f in self.schema.fields]
        )
        table = pa.Table.from_pydict(
            {name: pa.array(cols[name], type=arrow_schema.field(name).type) for name in names},
            schema=arrow_schema,
        )
        os.makedirs(self.staging, exist_ok=True)
        path = os.path.join(self.staging, f"part-{uuid.uuid4().hex}.parquet")
        pq.write_table(table, path)
        return _PartFile(path=path, rows=n)

    # -- driver side -------------------------------------------------------
    def commit(self, messages):
        import json
        import time

        from spotify_data_pipeline_spark.operators.versioning import (
            _atomic_write_json,
            _data_files,
            _manifest_path,
            latest_version,
        )

        prev = latest_version(self.root)
        floor_v = 0 if prev is None else prev + 1
        if os.path.isdir(self.root):
            orphans = [
                int(d.split("=", 1)[1])
                for d in os.listdir(self.root)
                if d.startswith("v=") and d.split("=", 1)[1].isdigit()
            ]
            if orphans:
                floor_v = max(floor_v, max(orphans) + 1)
        version = floor_v
        vdir = os.path.join(self.root, f"v={version}")
        os.makedirs(vdir, exist_ok=False)
        staged = sorted(m.path for m in messages if m.rows > 0)
        for i, src in enumerate(staged):
            os.rename(src, os.path.join(vdir, f"part-{i:05d}.parquet"))
        shutil.rmtree(os.path.dirname(self.staging), ignore_errors=True)
        files = _data_files(vdir)
        if self.mode == "append" and prev is not None:
            with open(_manifest_path(self.root, prev)) as f:
                files = json.load(f)["files"] + files
        _atomic_write_json(
            _manifest_path(self.root, version),
            {
                "version": version,
                "mode": self.mode,
                "prev": prev,
                "files": files,
                "committed_at": time.time(),
            },
            exclusive=True,
        )
        _atomic_write_json(
            os.path.join(self.root, "_latest"), {"version": version}
        )

    def abort(self, messages):
        shutil.rmtree(os.path.dirname(self.staging), ignore_errors=True)


class VersionedParquetDataSource(DataSource):
    """``spark.dataSource.register(VersionedParquetDataSource)`` then
    ``df.write.format("versioned_parquet").option("root", p).save()``."""

    @classmethod
    def name(cls) -> str:
        return "versioned_parquet"

    def writer(self, schema, overwrite: bool):
        root = self.options.get("root")
        if not root:
            raise ValueError("versioned_parquet requires option 'root'")
        fail = str(self.options.get("fail", "")).lower() == "true"
        return _VersionedWriter(root, schema, overwrite, fail)


def register_versioned_sink(spark) -> None:
    spark.dataSource.register(VersionedParquetDataSource)
