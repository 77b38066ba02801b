"""Parquet compaction — the small-files countermeasure.

At 100 TB, streaming sinks, per-batch upserts, and fine-grained
partitioned writes all accrete files far smaller than the scan-optimal
size; a table of 10 M × 1 MB files makes every downstream scan pay
O(files) driver-side listing + footer parsing and schedules tasks too
small to amortize. Compaction rewrites a directory into
``ceil(bytes / target_file_bytes)`` evenly-sized files and swaps the
result in with a rename-aside (same crash-window discipline as
``streaming.events.merge_stream_into_parquet``).

Filesystem access goes through the Hadoop FileSystem API obtained from
the active session (``Path.getFileSystem``), so the same code runs
against local paths in tests and HDFS on a cluster. Hadoop's
``rename`` is atomic on HDFS and local FS; on object stores (S3A) it
is a copy — there, compact through a transactional table format
instead of this directory swap.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def parquet_file_stats(spark: SparkSession, path: str) -> dict:
    """(n_files, total_bytes, max/min file bytes) for the data files of
    a parquet directory — the before/after evidence for a compaction."""
    fs, jpath = _fs_and_path(spark, path)
    sizes = [
        st.getLen()
        for st in fs.listStatus(jpath)
        if st.isFile() and st.getPath().getName().endswith(".parquet")
    ]
    return {
        "n_files": len(sizes),
        "total_bytes": sum(sizes),
        "max_file_bytes": max(sizes, default=0),
        "min_file_bytes": min(sizes, default=0),
    }


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Rewrite ``path`` into ~``target_file_bytes`` parquet files.

    ``repartition`` (round-robin, one shuffle) rather than ``coalesce``:
    coalesce merges input partitions as-is, so a skewed small-file
    population yields skewed output files — the problem compaction
    exists to fix. The shuffle is the price of evenly-sized output and
    is paid on data that was going to be fully rewritten anyway.

    Returns {"files_before", "files_after", "total_bytes", "n_output"}.
    """
    before = parquet_file_stats(spark, path)
    n_out = max(1, math.ceil(before["total_bytes"] / target_file_bytes))

    fs, jpath = _fs_and_path(spark, path)
    tmp = path.rstrip("/") + ".compact-tmp"
    aside = path.rstrip("/") + ".compact-old"
    spark.read.parquet(path).repartition(n_out).write.mode("overwrite").parquet(tmp)

    jvm = spark._jvm
    jtmp, jaside = jvm.org.apache.hadoop.fs.Path(tmp), jvm.org.apache.hadoop.fs.Path(aside)
    # rename-aside: at every instant the data exists under a recoverable
    # name (crash after the first rename leaves `.compact-old` intact)
    if not fs.rename(jpath, jaside):
        raise IOError(f"compaction swap failed renaming {path} aside")
    if not fs.rename(jtmp, jpath):
        fs.rename(jaside, jpath)  # roll back
        raise IOError(f"compaction swap failed renaming {tmp} in")
    fs.delete(jaside, True)

    after = parquet_file_stats(spark, path)
    return {
        "files_before": before["n_files"],
        "files_after": after["n_files"],
        "total_bytes": after["total_bytes"],
        "n_output": n_out,
    }
