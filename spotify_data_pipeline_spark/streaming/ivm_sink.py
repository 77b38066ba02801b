"""Maintained-join sink: incremental denormalization across batches.

The streaming/warehouse composition of ``operators/ivm.py``: a
materialized A ⋈ B view kept current as INSERT batches arrive on
EITHER side (facts stream in; the dimension grows by occasional
append), without ever re-joining the accumulated history against
itself. Each batch applies the delta rule

    Δview = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB

then appends Δview to the view and the delta to its side's
accumulator. Fold ≡ rebuild (bag semantics) is pinned by the tests
over arbitrary interleavings of fact and dim batches — the same
equality contract as the agg fold (``incremental.py``) and the batch
operator (``ivm.py``).

Layout: three parquet directories (a/, b/, view/), all append-only —
the write pattern every object store likes; compaction of small files
is ``operators/compaction.py``'s job, deliberately not duplicated
here. Use from ``foreachBatch`` for a true Structured Streaming
source (``merge_stream_into_parquet`` next door shows the wiring); the
apply methods take plain DataFrames so batch backfills and streaming
micro-batches share one code path.

Deletes/updates are out of scope by the same insert-only contract as
``ivm.py`` — retractions belong to the SCD2/upsert layer.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from spotify_data_pipeline_spark.operators.ivm import join_delta

__all__ = ["MaintainedJoin"]


class MaintainedJoin:
    """Append-only maintained equi-join over two growing tables."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        on: list[str],
        a_schema: str,
        b_schema: str,
    ) -> None:
        self.spark = spark
        self.on = list(on)
        self._a = os.path.join(path, "a")
        self._b = os.path.join(path, "b")
        self._view = os.path.join(path, "view")
        self._a_schema = a_schema
        self._b_schema = b_schema

    def _read(self, path: str, schema: str) -> DataFrame:
        if os.path.isdir(path):
            return self.spark.read.schema(schema).parquet(path)
        return self.spark.createDataFrame([], schema)

    def _view_schema(self) -> str:
        a_cols = dict(f.split(" ", 1) for f in map(str.strip, self._a_schema.split(",")))
        b_cols = dict(f.split(" ", 1) for f in map(str.strip, self._b_schema.split(",")))
        merged = {**a_cols, **{k: v for k, v in b_cols.items() if k not in a_cols}}
        return ", ".join(f"{k} {v}" for k, v in merged.items())

    def apply_fact_batch(self, delta_a: DataFrame) -> None:
        """Fold an insert batch on the A side (ΔA ⋈ B_old)."""
        b_old = self._read(self._b, self._b_schema)
        delta = join_delta(
            self._read(self._a, self._a_schema), delta_a, b_old, None, self.on
        )
        delta.write.mode("append").parquet(self._view)
        delta_a.write.mode("append").parquet(self._a)

    def apply_dim_batch(self, delta_b: DataFrame) -> None:
        """Fold an insert batch on the B side (A_old ⋈ ΔB)."""
        a_old = self._read(self._a, self._a_schema)
        delta = join_delta(
            a_old, None, self._read(self._b, self._b_schema), delta_b, self.on
        )
        delta.write.mode("append").parquet(self._view)
        delta_b.write.mode("append").parquet(self._b)

    def view(self) -> DataFrame:
        """The maintained join as of all applied batches."""
        return self._read(self._view, self._view_schema())

    def rebuild(self) -> DataFrame:
        """Full A ⋈ B from the accumulators — the equality oracle the
        tests compare ``view()`` against; not used on the hot path."""
        return self._read(self._a, self._a_schema).join(
            self._read(self._b, self._b_schema), self.on
        )
