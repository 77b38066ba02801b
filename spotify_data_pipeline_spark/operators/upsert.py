"""Upsert / MERGE emulation without a table format (SURVEY.md §2.1 S12,
§4.2 'gold should be idempotent MERGE or partition-replace').

The reference's gold zone is BigQuery WRITE_APPEND — retried loads
double-append. With Delta/Iceberg absent (not in this environment), the
engine provides the two safe patterns:

- partition replace: pipeline/etl.py (dynamic per-date overwrite);
- key-level MERGE: ``merge_upsert`` below — the classic
  anti-join + union rewrite, plus ``scd2_apply`` for slowly-changing
  history. Each produces a NEW dataframe to write out atomically
  (write-temp-then-swap at the storage layer).

Scale: one shuffle on the merge key each for the anti-join and the
dedup of updates; both sides prunable if the target is partitioned and
the updates carry partition predicates.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column] | None = None,
) -> DataFrame:
    """MERGE: rows from ``updates`` win over ``target`` on key match;
    unmatched target rows pass through (upsert semantics).

    If ``updates`` itself carries duplicate keys, ``order_by`` picks the
    winner (first under that order); without it an arbitrary row wins.
    Like SQL MERGE, non-matched target rows are left untouched —
    including pre-existing duplicate-key rows in the target (dedup the
    target first if that matters; property-tested in
    tests/test_properties.py).
    """
    if order_by is not None:
        w = Window.partitionBy(*keys).orderBy(*order_by)
        updates = (
            updates.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
    else:
        updates = updates.dropDuplicates(list(keys))
    keep = target.join(updates.select(*keys), on=list(keys), how="left_anti")
    return keep.unionByName(updates)


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    effective_col: str,
    end_col: str = "valid_to",
    current_flag: str = "is_current",
) -> DataFrame:
    """Slowly-changing-dimension type 2: close out the current version of
    each updated key (set ``valid_to`` / drop the current flag) and
    append the update as the new current version.

    ``current`` must carry ``end_col`` (nullable timestamp) and
    ``current_flag`` (boolean); ``updates`` carries the business columns
    + ``effective_col``.

    Multiple updates per key in one batch CHAIN correctly: updates are
    ordered by ``effective_col`` per key, each version is closed by the
    next one's effective time (``lead``), only the last is current, and
    the previously-current target row closes at the EARLIEST update's
    effective time. Ties on ``effective_col`` within a key are broken
    arbitrarily — pre-dedup updates if ties are possible.
    """
    end_type = current.schema[end_col].dataType
    upd_keys = updates.select(*keys).distinct()
    # earliest effective time per key closes the previously-current row
    eff = updates.groupBy(*keys).agg(F.min(effective_col).alias("_new_eff"))

    # rows of unchanged keys pass through untouched
    untouched = current.join(upd_keys, on=list(keys), how="left_anti")

    # current versions of changed keys are closed out at the first
    # update's effective time
    closed = (
        current.join(eff, on=list(keys), how="inner")
        .withColumn(
            end_col,
            F.when(F.col(current_flag), F.col("_new_eff").cast(end_type)).otherwise(
                F.col(end_col)
            ),
        )
        .withColumn(current_flag, F.lit(False))
        .drop("_new_eff")
    )

    # chain the updates themselves: each closed by the next, last wins
    w = Window.partitionBy(*keys).orderBy(F.col(effective_col).asc())
    new_rows = (
        updates.withColumn(end_col, F.lead(effective_col).over(w).cast(end_type))
        .withColumn(current_flag, F.col(end_col).isNull())
    )
    return untouched.unionByName(closed).unionByName(new_rows.select(*untouched.columns))
