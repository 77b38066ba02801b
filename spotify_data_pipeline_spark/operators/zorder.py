"""Z-order (Morton curve) data layout for multi-dimensional skipping.

Parquet data skipping works off per-file min/max ranges. A table
sorted by one key prunes scans filtered on THAT key only; a filter on
any other column still reads every file. The warehouse fix (Delta
``OPTIMIZE ZORDER BY``, closed-source; this is the open DataFrame
equivalent) is to sort by the Morton interleaving of several columns:
bit i of each dimension alternates in the sort key, so files cover
small HYPER-RECTANGLES and carry tight min/max on EVERY z-ordered
column at once — a 100 TB scan filtered on either dimension skips most
files.

Mechanics here:

- Each column is affinely mapped to [0, 2^bits) rank space using its
  global min/max (one tiny 2-value aggregate per column — bounded
  driver state, same pattern as the k-means centroid collect).
- Bits interleave via pure integer HOFs (``aggregate`` over
  ``sequence``, shifts and masks) — JVM-side, no UDF.
- ``write_zordered`` range-partitions by the z-value (so files tile
  the curve) and sorts within partitions, then writes parquet.

The payoff is measured, not asserted: tests/test_zorder.py computes
per-file min/max envelopes and shows box-query file pruning on the
SECOND dimension that a single-key sort cannot give.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["with_z_value", "write_zordered"]


def with_z_value(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 21,
    out_col: str = "_z",
) -> DataFrame:
    """Append the Morton z-value of ``cols`` (numeric, any range —
    normalized to rank space by global min/max). bits·len(cols) must
    fit a long (≤63); default 21 bits × up to 3 dims.
    """
    if bits * len(cols) > 63:
        raise ValueError(f"{bits} bits x {len(cols)} dims exceeds a long")
    # one tiny agg: global (min, max) per column; bounded driver state
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"_min_{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c).cast("double")).alias(f"_max_{i}") for i, c in enumerate(cols)],
    ).first()

    scaled: list[Column] = []
    top = (1 << bits) - 1
    for i, c in enumerate(cols):
        lo, hi = stats[f"_min_{i}"], stats[f"_max_{i}"]
        span = (hi - lo) or 1.0
        rank = F.floor((F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * top)
        scaled.append(F.least(F.greatest(rank, F.lit(0)), F.lit(top)).cast("long"))

    tmp = df
    names = []
    for i, s in enumerate(scaled):
        names.append(f"_zd{i}")
        tmp = tmp.withColumn(f"_zd{i}", s)
    ndims = len(cols)
    parts = " + ".join(
        f"shiftleft(shiftright({n}, i) & 1L, {ndims}*i + {i})"
        for i, n in enumerate(names)
    )
    z = F.expr(f"aggregate(sequence(0, {bits - 1}), 0L, (acc, i) -> acc + ({parts}))")
    return tmp.withColumn(out_col, z).drop(*names)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int,
    bits: int = 21,
) -> None:
    """Write ``df`` as ~``n_files`` parquet files tiling the Morton
    curve of ``cols``: range-partition on the z-value (contiguous curve
    segments per file), sort within partitions, drop the helper column.
    """
    zed = with_z_value(df, cols, bits)
    (
        zed.repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
