"""Count-Min sketch: mergeable point-frequency estimates.

Completes the mergeable-summary trio next door (HLL distinct in
``incremental.py``, Misra–Gries top-k in ``heavyhitters.py``,
HdrHistogram quantiles in ``quantiles.py``): CMS answers "how often
did THIS value occur" for ANY value in bounded space — the per-group
state is a fixed ``depth × width`` counter grid, so a warehouse
refresh folds only the new batch's grid (counter addition, bit-equal
to a full rebuild for any split/order — same property as the quantile
sketch, unlike HLL whose estimate is fold-order-dependent).

Guarantees (Cormode & Muthukrishnan 2005): estimate ≥ true count
(over-count only, from collisions), and estimate ≤ true + ε·n with
probability ≥ 1−δ at width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉ (n = group
rows). The depth row-hashes are xxhash64 with the row index folded
into the input (Carter–Wegman-style independent family).

When to use which summary:
- known query values / arbitrary point lookups → CMS (this module);
- "which values are frequent" without knowing them → MG top-k;
- CMS + MG together: MG finds the candidates, CMS tightens counts.

Scale shape: build is ONE map-side-combinable hash agg over
(groups, cell) — the explode fan-out is ``depth`` (a small constant);
state is depth·width longs per group regardless of data volume;
estimation joins query values against the packed state (broadcast
whichever side is small). Like the other sketches, the estimate is
NOT exactly replicable in a SQL oracle without xxhash64 — the
guarantees are pytest-pinned (property tests), the same
rows-only/pytest split as HLL and the LSH banding.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["cms_build", "cms_merge", "cms_estimate"]

_STATE = "cms_state"  # array<long>, row-major depth*width
_N = "cms_n"  # total counted rows in the group


def _bucket_sql(value_expr: str, row: int, width: int) -> str:
    """Non-negative bucket of ``value_expr`` under row-hash ``row``."""
    h = f"xxhash64(concat('r{row}:', {value_expr}))"
    return f"CAST((({h} % {width}) + {width}) % {width} AS INT)"


def cms_build(
    df: DataFrame,
    groups: Sequence[str],
    value_col: str,
    depth: int = 5,
    width: int = 256,
) -> DataFrame:
    """(groups..., cms_state, cms_n): each input row increments one
    bucket per hash row; counts pivot into the dense row-major grid.
    NULL values are not counted (SQL aggregate convention)."""
    cells = F.explode(
        F.array(
            *[
                F.expr(f"{r} * {width} + {_bucket_sql('_v', r, width)}")
                for r in range(depth)
            ]
        )
    ).alias("_cell")
    per_cell = (
        df.select(*groups, F.col(value_col).cast("string").alias("_v"))
        .where(F.col("_v").isNotNull())
        .select(*groups, cells)
        .groupBy(*groups, "_cell")
        .agg(F.count("*").alias("_c"))
    )
    return (
        per_cell.groupBy(*groups)
        .agg(
            F.map_from_arrays(F.collect_list("_cell"), F.collect_list("_c")).alias("_m"),
            (F.sum("_c") / depth).cast("long").alias(_N),
        )
        .select(
            *groups,
            F.expr(
                f"transform(sequence(0, {depth * width - 1}),"
                " i -> coalesce(element_at(_m, i), CAST(0 AS LONG)))"
            ).alias(_STATE),
            _N,
        )
    )


def cms_merge(groups: Sequence[str], *states: DataFrame) -> DataFrame:
    """Counter addition: merged state is BIT-equal to a build over the
    concatenated inputs, for any split/order (tested). Groups absent
    from one side pass through unchanged (zip with the other side's
    zeros would be identity anyway).

    Merging states built with different depth×width would silently
    produce a garbage grid, so grid size is validated IN-PLAN: any two
    input rows (across all groups — parameter mismatch is a per-input
    property, not per-group) with different ``size(cms_state)`` fail
    the job via ``raise_error`` (ADVICE r04)."""
    if not states:
        raise ValueError("need at least one state")
    unioned = states[0]
    for s in states[1:]:
        unioned = unioned.unionByName(s)
    # Global size check: a 1-row aggregate of (min, max) grid size,
    # cross-joined (broadcast) into the merge so the error fires on any
    # mismatch even when the differing groups never meet in a join.
    size_check = unioned.select(F.size(_STATE).alias("_sz")).agg(
        F.min("_sz").alias("_szmin"), F.max("_sz").alias("_szmax")
    )
    summed = (
        unioned.select(*groups, F.posexplode(_STATE).alias("_cell", "_c"))
        .groupBy(*groups, "_cell")
        .agg(F.sum("_c").alias("_c"))
        .groupBy(*groups)
        .agg(
            F.map_from_arrays(F.collect_list("_cell"), F.collect_list("_c")).alias("_m"),
            (F.max("_cell") + 1).alias("_len"),
        )
        .crossJoin(F.broadcast(size_check))
        .select(
            *groups,
            F.expr(
                "CASE WHEN _szmin <> _szmax THEN"
                " raise_error(concat('cms_merge: incompatible sketch sizes ',"
                " _szmin, ' vs ', _szmax, ' — all states must share depth*width'))"
                " ELSE transform(sequence(0, CAST(_len AS INT) - 1),"
                " i -> coalesce(element_at(_m, i), CAST(0 AS LONG))) END"
            ).alias(_STATE),
        )
    )
    ns = unioned.groupBy(*groups).agg(F.sum(_N).alias(_N))
    return summed.join(ns, on=list(groups))


def cms_estimate(
    state: DataFrame,
    values: DataFrame,
    groups: Sequence[str],
    value_col: str,
    depth: int = 5,
    width: int = 256,
) -> DataFrame:
    """Point estimates: for each (group, value) in ``values``, the CMS
    estimate min over hash rows of that row's bucket counter. Output:
    ``values``' columns + ``est`` (≥ true count). ``depth``/``width``
    must match the build. Join is per-group; broadcast the small side
    at call site if known.

    NULL probe values estimate 0, mirroring ``cms_build``'s isNotNull
    guard (ADVICE r04: xxhash64(NULL) degenerates to the seed, which
    silently returned one arbitrary bucket's count; build-side never
    counts NULLs, so 0 is the exact answer, and 0 keeps est ≥ true)."""
    probes: list[Column] = [
        F.expr(
            f"element_at({_STATE}, {r} * {width} + "
            f"{_bucket_sql('_v', r, width)} + 1)"
        )
        for r in range(depth)
    ]
    v = values.withColumn("_v", F.col(value_col).cast("string"))
    return (
        v.join(state.select(*groups, _STATE), on=list(groups))
        .withColumn(
            "est",
            F.when(F.col("_v").isNull(), F.lit(0))
            .otherwise(F.least(*probes))
            .cast("long"),
        )
        .drop(_STATE, "_v")
    )
