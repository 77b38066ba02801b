"""Maintained-join sink: incremental denormalization across batches.

The streaming/warehouse composition of ``operators/ivm.py``: a
materialized A ⋈ B view kept current as INSERT batches arrive on
EITHER side (facts stream in; the dimension grows by occasional
append), without ever re-joining the accumulated history against
itself. Each batch applies its delta term

    fact batch:  Δview = ΔA ⋈ B_old
    dim batch:   Δview = A_old ⋈ ΔB

so every (fact, dim) pair joins exactly once regardless of
interleaving — the pair lands in whichever batch arrived second.
Fold ≡ rebuild (bag semantics) is pinned by the tests over arbitrary
interleavings — the same equality contract as the agg fold
(``incremental.py``) and the batch operator (``ivm.py``).

Exactly-once under retries: every batch writes to its OWN
deterministic subdirectory (``<side>-<batch_id>``) with overwrite
mode, and a batch's delta depends only on the OTHER side's
accumulator, which the batch never touches — so re-running a
half-applied batch (Structured Streaming's at-least-once
``foreachBatch`` contract) recomputes the identical delta and
overwrites the same directories. No marker files, no two-phase
commit; idempotency comes from determinism + per-batch overwrite.
``batch_id`` must identify the batch CONTENT (the foreachBatch
contract provides exactly this).

Paths resolve through the Hadoop FileSystem of the session, so
``s3a://`` / ``hdfs://`` / ``file:`` all work — no ``os.path``
assumptions. Compaction of small per-batch files is
``operators/compaction.py``'s job, deliberately not duplicated here.
Deletes/updates are out of scope by the same insert-only contract as
``ivm.py`` — retractions belong to the SCD2/upsert layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

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
        self._root = path.rstrip("/")
        self._a = f"{self._root}/a"
        self._b = f"{self._root}/b"
        self._view = f"{self._root}/view"
        # parse DDL once through Spark's own parser — no string surgery,
        # so decimal(12, 2) / map<string, long> column types survive
        self._a_struct = StructType.fromDDL(a_schema)
        self._b_struct = StructType.fromDDL(b_schema)
        a_names = set(self._a_struct.fieldNames())
        self._view_struct = StructType(
            [self._a_struct[f] for f in self._a_struct.fieldNames()]
            + [
                self._b_struct[f]
                for f in self._b_struct.fieldNames()
                if f not in a_names
            ]
        )

    def _batch_dirs(self, root: str) -> list[str]:
        """Subdirectories of ``root`` via the Hadoop FileSystem (works
        for any scheme the session supports, not just local paths)."""
        jvm = self.spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(root)
        fs = p.getFileSystem(self.spark._jsc.hadoopConfiguration())
        if not fs.exists(p):
            return []
        return [
            str(s.getPath())
            for s in fs.listStatus(p)
            if s.isDirectory()
        ]

    def _read(self, root: str, schema: StructType) -> DataFrame:
        dirs = self._batch_dirs(root)
        if not dirs:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(*dirs)

    def apply_fact_batch(self, delta_a: DataFrame, batch_id: int) -> None:
        """Fold an insert batch on the A side (ΔA ⋈ B_old).
        Idempotent per ``batch_id`` (see module doc)."""
        b_old = self._read(self._b, self._b_struct)
        delta = join_delta(
            self._read(self._a, self._a_struct), delta_a, b_old, None, self.on
        )
        delta.write.mode("overwrite").parquet(f"{self._view}/fact-{batch_id}")
        delta_a.write.mode("overwrite").parquet(f"{self._a}/batch-{batch_id}")

    def apply_dim_batch(self, delta_b: DataFrame, batch_id: int) -> None:
        """Fold an insert batch on the B side (A_old ⋈ ΔB).
        Idempotent per ``batch_id``."""
        a_old = self._read(self._a, self._a_struct)
        delta = join_delta(
            a_old, None, self._read(self._b, self._b_struct), delta_b, self.on
        )
        delta.write.mode("overwrite").parquet(f"{self._view}/dim-{batch_id}")
        delta_b.write.mode("overwrite").parquet(f"{self._b}/batch-{batch_id}")

    def view(self) -> DataFrame:
        """The maintained join as of all applied batches."""
        return self._read(self._view, self._view_struct)

    def rebuild(self) -> DataFrame:
        """Full A ⋈ B from the accumulators — the equality oracle the
        tests compare ``view()`` against; not used on the hot path."""
        return self._read(self._a, self._a_struct).join(
            self._read(self._b, self._b_struct), self.on
        )
