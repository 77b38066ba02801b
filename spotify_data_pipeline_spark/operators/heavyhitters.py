"""Mergeable heavy-hitters summaries (Misra–Gries / space-saving).

The top-k frequent values of a column — trending tracks, dominant
sources, hot keys — is not an algebraic aggregate: exact per-group
top-k needs the full (group, value) histogram, which at 100 TB means
re-scanning history on every refresh. The mergeable fix is the
Misra–Gries summary (Agarwal et al., "Mergeable Summaries", PODS'12):
keep ≤ ``capacity`` counters per group; summaries of any partition of
the data MERGE (sum counters value-wise, subtract the (capacity+1)-th
largest, drop non-positive) into a summary with the SAME guarantee as
one built over the whole input:

- every value with true count > n / (capacity+1) is present;
- each kept counter undercounts its true count by ≤ n / (capacity+1)
  (n = total rows in the group).

This slots next to the HLL sketch in the incremental-maintenance
pattern (operators/incremental.py): state is one bounded array per
group, each refresh folds only the new batch's summary, history is
never re-read. Like the HLL estimate, the summary CONTENTS are
fold-order-dependent below the guarantee threshold — the invariant
that survives merging is the (membership, error-bound) contract, which
is what the property tests pin.

Build/merge are pure DataFrame ops: exact per-batch (group, value)
counts (map-side combinable), a per-group rank window over the
DISTINCT-VALUE table (post-aggregation cardinality, not row
cardinality), truncate, pack to an array state. For ungrouped use pass
a constant group column.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["mg_build", "mg_build_salted", "mg_merge", "mg_topk"]

_STATE_COL = "mg_state"  # array<struct<v: string, cnt: long>>


def _truncate(counts: DataFrame, groups: Sequence[str], capacity: int) -> DataFrame:
    """(groups, v, cnt) → per-group MG state array: rank by (cnt desc,
    v), subtract the (capacity+1)-th count from the kept top-capacity,
    drop non-positive. The value tiebreak makes the kept SET
    deterministic under equal counts."""
    w = Window.partitionBy(*groups).orderBy(F.col("cnt").desc(), F.col("v").asc())
    ranked = counts.withColumn("_rk", F.row_number().over(w))
    # the subtrahend: (capacity+1)-th largest count, 0 if none
    sub = ranked.where(F.col("_rk") == capacity + 1).select(
        *groups, F.col("cnt").alias("_sub")
    )
    kept = (
        ranked.where(F.col("_rk") <= capacity)
        .join(sub, on=list(groups), how="left")
        .withColumn("_adj", F.col("cnt") - F.coalesce("_sub", F.lit(0)))
        .where(F.col("_adj") > 0)
    )
    return kept.groupBy(*groups).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("v"), F.col("_adj").alias("cnt"))),
            lambda a, b: F.when(a["cnt"] > b["cnt"], -1)
            .when(a["cnt"] < b["cnt"], 1)
            .when(a["v"] < b["v"], -1)
            .when(a["v"] > b["v"], 1)
            .otherwise(0),
        ).alias(_STATE_COL)
    )


def mg_build(
    df: DataFrame,
    groups: Sequence[str],
    value_col: str,
    capacity: int = 64,
) -> DataFrame:
    """Build a per-group Misra–Gries summary of ``value_col``.

    One exact (group, value) hash agg (map-side combined — the shuffle
    carries distinct values, not rows), then the rank/truncate over the
    distinct-value table. Output: (groups..., mg_state).
    """
    counts = df.groupBy(*groups, F.col(value_col).cast("string").alias("v")).agg(
        F.count("*").alias("cnt")
    )
    return _truncate(counts, groups, capacity)


def mg_build_salted(
    df: DataFrame,
    groups: Sequence[str],
    value_col: str,
    capacity: int = 64,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase MG build for high-cardinality value domains.

    ``mg_build``'s rank window sorts each group's FULL distinct-value
    table in one partition — fine for vocabularies, a straggler when a
    group has 10⁹ distinct values (user ids, urls). Salting by
    ``xxhash64(value) % n_salts`` partitions the VALUES (every
    occurrence of a value lands in exactly one shard, so shard counts
    are exact), truncates each (group, salt) shard independently —
    n_salts smaller windows instead of one giant one — then merges the
    shard summaries with the standard MG merge. Because the shards
    partition the data, the merge theorem gives the SAME
    (membership, ≤ n/(capacity+1) undercount) guarantee as a direct
    build; contents may differ below the threshold (tested both ways).
    """
    counts = df.groupBy(
        *groups,
        F.col(value_col).cast("string").alias("v"),
    ).agg(F.count("*").alias("cnt"))
    salted = counts.withColumn("_salt", F.pmod(F.xxhash64("v"), F.lit(n_salts)))
    shard_states = _truncate(salted, [*groups, "_salt"], capacity)
    merged_counts = (
        shard_states.select(*groups, F.explode(_STATE_COL).alias("_e"))
        .select(*groups, F.col("_e.v").alias("v"), F.col("_e.cnt").alias("cnt"))
        .groupBy(*groups, "v")
        .agg(F.sum("cnt").alias("cnt"))
    )
    return _truncate(merged_counts, groups, capacity)


def mg_merge(
    groups: Sequence[str], capacity: int, *states: DataFrame
) -> DataFrame:
    """Merge summaries: union, explode, value-wise counter sum, same
    truncation. Associative up to the guarantee (see module doc)."""
    if not states:
        raise ValueError("need at least one state")
    unioned = states[0]
    for s in states[1:]:
        unioned = unioned.unionByName(s)
    counts = (
        unioned.select(*groups, F.explode(_STATE_COL).alias("_e"))
        .select(*groups, F.col("_e.v").alias("v"), F.col("_e.cnt").alias("cnt"))
        .groupBy(*groups, "v")
        .agg(F.sum("cnt").alias("cnt"))
    )
    return _truncate(counts, groups, capacity)


def mg_topk(state: DataFrame, groups: Sequence[str], k: int) -> DataFrame:
    """Finalize: the top-k surviving counters as rows (groups..., v,
    cnt_lb, rank) — cnt_lb is a LOWER BOUND on the true count (exact
    when the value was never truncated)."""
    sliced = state.select(*groups, F.slice(_STATE_COL, 1, k).alias("_top"))
    return sliced.select(*groups, F.posexplode("_top").alias("_pos", "_e")).select(
        *groups,
        F.col("_e.v").alias("v"),
        F.col("_e.cnt").alias("cnt_lb"),
        (F.col("_pos") + 1).cast("long").alias("rank"),
    )
