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


def scd2_from_observations(
    observations: DataFrame,
    keys: Sequence[str],
    effective_col: str,
    attr_cols: Sequence[str],
    end_col: str = "valid_to",
    current_flag: str = "is_current",
) -> DataFrame:
    """Build a full SCD2 history table from an observation stream
    (key, attrs, observed-at): consecutive observations with identical
    attributes COMPRESS into one version (change detection), each kept
    version is closed by the next one's effective time, the last per
    key stays open.

    Output columns: keys + attr_cols + (effective_col, end_col,
    current_flag) — effective_col doubles as ``valid_from``.

    Plan shape: one shuffle on the key. Both windows (lag for change
    detection, lead for close-out) and the final projection share the
    same partitioning+ordering, so Catalyst plans a single Exchange +
    Sort; the filter between them preserves the sort. Ties on
    ``effective_col`` within a key are broken arbitrarily — pre-dedup
    (e.g. groupBy(key, ts).agg(max_by(...))) if ties are possible.
    """
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    w = Window.partitionBy(*keys).orderBy(F.col(effective_col).asc())
    changed = (
        observations.withColumn("_prev", F.lag(attrs).over(w))
        .where(F.col("_prev").isNull() | ~attrs.eqNullSafe(F.col("_prev")))
        .drop("_prev")
    )
    return (
        changed.withColumn(end_col, F.lead(effective_col).over(w))
        .withColumn(current_flag, F.col(end_col).isNull())
        .select(*keys, *attr_cols, effective_col, end_col, current_flag)
    )


def scd2_merge_observations(
    current: DataFrame,
    observations: DataFrame,
    keys: Sequence[str],
    effective_col: str,
    attr_cols: Sequence[str],
    end_col: str = "valid_to",
    current_flag: str = "is_current",
) -> DataFrame:
    """Incremental SCD2 refresh from a NEW batch of observations, with
    the same change-compression ``scd2_from_observations`` applies:
    observations that repeat the previous value (within the batch, or
    vs the key's open version in ``current``) create no new version.

    Invariant (property-tested): for any chronological split of an
    observation stream into batches B1..Bn,
    ``merge(...merge(from_observations(B1), B2)..., Bn)`` equals
    ``from_observations(B1 ∪ ... ∪ Bn)`` — the incremental daily refresh
    and the full-history rebuild agree exactly. (Batches must split by
    time: every observation in Bi+1 is at or after Bi's latest.)

    Scale: compression is one windowed pass over the BATCH (small);
    the no-change probe joins batch heads against only the OPEN slice
    of ``current``; then ``scd2_apply`` does one anti-join + union on
    the key. The full history is never windowed — only appended to.
    """
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    w = Window.partitionBy(*keys).orderBy(F.col(effective_col).asc())
    compressed = (
        observations.withColumn("_prev", F.lag(attrs).over(w))
        .where(F.col("_prev").isNull() | ~attrs.eqNullSafe(F.col("_prev")))
        .drop("_prev")
        .withColumn("_rn", F.row_number().over(w))
    )
    open_now = current.where(F.col(current_flag)).select(
        *keys, attrs.alias("_cur_attrs")
    )
    # drop a batch's FIRST observation when it repeats the open version
    heads_kept = (
        compressed.where(F.col("_rn") == 1)
        .join(open_now, on=list(keys), how="left")
        .where(F.col("_cur_attrs").isNull() | ~attrs.eqNullSafe(F.col("_cur_attrs")))
        .drop("_cur_attrs")
    )
    updates = heads_kept.unionByName(compressed.where(F.col("_rn") > 1)).drop("_rn")
    merged = scd2_apply(
        current,
        updates.select(*keys, *attr_cols, effective_col),
        keys,
        effective_col=effective_col,
        end_col=end_col,
        current_flag=current_flag,
    )
    return merged


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Key-level reconciliation between two table versions: one row per
    key whose state changed, labeled ``added`` / ``removed`` /
    ``changed``. The regression gate for warehouse loads (did this
    backfill touch only what it should?) and the input to CDC-style
    downstream syncs.

    Non-key columns are compared via a single xxhash64 over (string
    form, is-null flag) pairs — the flag column, not an in-band
    sentinel, distinguishes NULL from any real value, so no string a
    user could store is conflated with NULL (the previous '\\0null'
    sentinel was such a string, and masked NULL→sentinel changes).
    One 8-byte digest per row crosses the shuffle, not the row
    payload. Caveat: equal digests are treated as equal rows, so a
    changed row is missed with probability ~2^-64 per key — the
    standard CDC-digest tradeoff; diff the raw columns directly where
    that is unacceptable. Plan: each side collapses to (keys, digest)
    map-side, then ONE full outer join on the keys -- no row data
    moves, and the join output is filtered to differences before
    anything widens it again. At 100 TB both sides shuffle only
    key+digest; co-partitioned (bucketed) versions join exchange-free.
    """
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(keys)]

    def digest(df: DataFrame) -> DataFrame:
        cols = []
        for c in compare_cols:
            cols.append(F.col(c).cast("string").alias(f"_v_{c}"))
            cols.append(F.col(c).isNull().cast("int").alias(f"_n_{c}"))
        return df.select(*keys, F.xxhash64(*cols).alias("_h"))

    o = digest(old).withColumnRenamed("_h", "_h_old")
    n = digest(new).withColumnRenamed("_h", "_h_new")
    joined = o.join(n, on=list(keys), how="full_outer")
    return joined.select(
        *keys,
        F.when(F.col("_h_old").isNull(), F.lit("added"))
        .when(F.col("_h_new").isNull(), F.lit("removed"))
        .otherwise(F.lit("changed"))
        .alias("change"),
        "_h_old",
        "_h_new",
    ).where(
        F.col("_h_old").isNull()
        | F.col("_h_new").isNull()
        | (F.col("_h_old") != F.col("_h_new"))
    )
