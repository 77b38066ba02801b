"""Incremental aggregate maintenance (materialized-view refresh without
recompute).

The reference's gold tables are append-only accumulations
(create_bucket/load DAG, SURVEY §2.1 S12): every refresh re-reads
everything. At 100 TB the viable pattern is a PARTIAL-AGGREGATE table
maintained under appends: keep per-group mergeable state, fold each new
batch in with one small union + re-agg, and finalize to user-facing
metrics on read. Only metrics with an associative, commutative merge
qualify — which is exactly why the distinct count is carried as an HLL
sketch (mergeable by register-wise max), not as a number.

- ``build_partial(df, groups, metrics)``  → state table
- ``merge_partials(a, b, ...)``           → state table (same schema)
- ``incremental_update(state, batch)``    → state ∪ build(batch), merged
- ``finalize(state, metrics)``            → (groups, metric aliases)

Invariant (tested): finalize(fold of any batch split, any fold order)
≡ finalize(build of the full input) — bit-equal for every algebraic
metric (sum/count/min/max/avg; the float sums here are of
integer-valued doubles, so even summation order cannot bite). The HLL
ESTIMATE is the one deliberate exception: Datasketches scores a
directly-built sketch with the HIP estimator, which unions cannot
preserve, and the union-mode estimate itself shifts a hair with fold
order — so merged estimates are only guaranteed to sit inside the
sketch's error bounds (tested within 5% of the exact count for every
split and order). That is the documented contract of mergeable
sketches, not a defect: the alternative — an exact distinct count —
is not mergeable at all and forces a full rescan per refresh.

Scale: state is one row per group; each refresh shuffles ONLY the new
batch (map-side combined) plus the state rows — never the history.

Non-scalar mergeable state lives in the sibling sketch modules, each
with the same fold-equals-rebuild contract and its own build/merge
pair: ``quantiles.py`` (HDR histogram — bit-equal merge),
``heavyhitters.py`` (Misra–Gries top-k — guarantee-preserving merge),
``countmin.py`` (CMS frequency grid — bit-equal merge). Their state
tables key on the same group columns, so a refresh job folds them
side-by-side with this module's scalar state and joins the finalized
outputs on the groups.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Metric:
    kind: str  # sum | count | min | max | avg | approx_distinct
    column: str
    alias: str


def m_sum(column: str, alias: str | None = None) -> Metric:
    return Metric("sum", column, alias or f"sum_{column}")


def m_count(column: str, alias: str | None = None) -> Metric:
    return Metric("count", column, alias or f"count_{column}")


def m_min(column: str, alias: str | None = None) -> Metric:
    return Metric("min", column, alias or f"min_{column}")


def m_max(column: str, alias: str | None = None) -> Metric:
    return Metric("max", column, alias or f"max_{column}")


def m_avg(column: str, alias: str | None = None) -> Metric:
    return Metric("avg", column, alias or f"avg_{column}")


def m_approx_distinct(column: str, alias: str | None = None) -> Metric:
    return Metric("approx_distinct", column, alias or f"nd_{column}")


def _state_aggs(m: Metric) -> list[Column]:
    c = F.col(m.column)
    if m.kind == "sum":
        return [F.sum(c).alias(f"_{m.alias}_s")]
    if m.kind == "count":
        return [F.count(c).alias(f"_{m.alias}_n")]
    if m.kind == "min":
        return [F.min(c).alias(f"_{m.alias}_m")]
    if m.kind == "max":
        return [F.max(c).alias(f"_{m.alias}_m")]
    if m.kind == "avg":
        return [F.sum(c).alias(f"_{m.alias}_s"), F.count(c).alias(f"_{m.alias}_n")]
    if m.kind == "approx_distinct":
        return [F.hll_sketch_agg(c).alias(f"_{m.alias}_sk")]
    raise ValueError(f"unknown metric kind {m.kind!r}")


def _merge_aggs(m: Metric) -> list[Column]:
    if m.kind in ("sum", "avg"):
        out = [F.sum(f"_{m.alias}_s").alias(f"_{m.alias}_s")]
        if m.kind == "avg":
            out.append(F.sum(f"_{m.alias}_n").alias(f"_{m.alias}_n"))
        return out
    if m.kind == "count":
        return [F.sum(f"_{m.alias}_n").alias(f"_{m.alias}_n")]
    if m.kind == "min":
        return [F.min(f"_{m.alias}_m").alias(f"_{m.alias}_m")]
    if m.kind == "max":
        return [F.max(f"_{m.alias}_m").alias(f"_{m.alias}_m")]
    if m.kind == "approx_distinct":
        return [F.hll_union_agg(f"_{m.alias}_sk").alias(f"_{m.alias}_sk")]
    raise ValueError(f"unknown metric kind {m.kind!r}")


def _final_cols(m: Metric) -> Column:
    if m.kind == "sum":
        return F.col(f"_{m.alias}_s").alias(m.alias)
    if m.kind == "count":
        return F.col(f"_{m.alias}_n").alias(m.alias)
    if m.kind in ("min", "max"):
        return F.col(f"_{m.alias}_m").alias(m.alias)
    if m.kind == "avg":
        return (F.col(f"_{m.alias}_s") / F.col(f"_{m.alias}_n")).alias(m.alias)
    if m.kind == "approx_distinct":
        return F.hll_sketch_estimate(f"_{m.alias}_sk").alias(m.alias)
    raise ValueError(f"unknown metric kind {m.kind!r}")


def build_partial(
    df: DataFrame, groups: Sequence[str], metrics: Sequence[Metric]
) -> DataFrame:
    """One map-side-combinable aggregate over the input → per-group
    mergeable state."""
    aggs = [a for m in metrics for a in _state_aggs(m)]
    return df.groupBy(*groups).agg(*aggs)


def merge_partials(
    groups: Sequence[str], metrics: Sequence[Metric], *partials: DataFrame
) -> DataFrame:
    """Union state tables and re-aggregate each state column with its
    merge function. Associative and commutative, so any fold order and
    any batch split give the same state."""
    if not partials:
        raise ValueError("need at least one partial")
    unioned = partials[0]
    for p in partials[1:]:
        unioned = unioned.unionByName(p)
    aggs = [a for m in metrics for a in _merge_aggs(m)]
    return unioned.groupBy(*groups).agg(*aggs)


def incremental_update(
    state: DataFrame,
    batch: DataFrame,
    groups: Sequence[str],
    metrics: Sequence[Metric],
) -> DataFrame:
    """Fold one new batch of raw rows into the state table. The batch is
    aggregated first (map-side combine — the shuffle carries one partial
    row per batch partition per group), then merged with the state."""
    return merge_partials(groups, metrics, state, build_partial(batch, groups, metrics))


def finalize(
    state: DataFrame, groups: Sequence[str], metrics: Sequence[Metric]
) -> DataFrame:
    """State → user-facing metrics (avg from sum/count, distinct count
    from the HLL estimate)."""
    return state.select(*groups, *[_final_cols(m) for m in metrics])
