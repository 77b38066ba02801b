"""Incremental JOIN maintenance (insert-only delta propagation).

Completes the incremental-view-maintenance story next to the aggregate
fold (``incremental.py``): a materialized join A ⋈ B refreshed by
folding only the NEW rows, never re-reading history. For append-only
batches (the warehouse common case — facts arrive, dims grow) the
classic delta rule (Blakeley, Larson & Tompa, SIGMOD'86, "Efficiently
updating materialized views") is

    Δ(A ⋈ B) = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB

and the maintained view is the old view unioned with the delta —
EXACTLY the join over (A_old ∪ ΔA) ⋈ (B_old ∪ ΔB), multiplicities
included (bag semantics; pinned by the fold-equals-rebuild property
tests, duplicate keys and all).

Scale shape: each delta term joins a BATCH-sized side against a
table-sized side on the join key — at 100 TB the snapshot never
re-joins itself; the three terms shuffle |ΔA|·fanout + |ΔB|·fanout
rows instead of |A ⋈ B|. When ΔB is empty (facts-only append, the
overwhelmingly common refresh) the second and third terms prune to
nothing at plan time via an empty-relation shortcut.

Deletes/updates need keyed retraction (counted bags / SCD2 upserts —
``operators/upsert.py`` owns that shape); this module is insert-only
by contract, matching the agg fold next door.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (callers compose conditions)

__all__ = ["join_delta", "maintain_join"]


def _check_cols(a: DataFrame, b: DataFrame, on: Sequence[str]) -> None:
    for k in on:
        if k not in a.columns or k not in b.columns:
            raise ValueError(f"join key {k!r} missing from one side")
    overlap = (set(a.columns) & set(b.columns)) - set(on)
    if overlap:
        raise ValueError(
            f"non-key column overlap {sorted(overlap)} — rename before joining "
            "(the maintained view's schema must be unambiguous)"
        )


def join_delta(
    a_old: DataFrame,
    delta_a: DataFrame | None,
    b_old: DataFrame,
    delta_b: DataFrame | None,
    on: Sequence[str],
) -> DataFrame:
    """The new result rows Δ(A ⋈ B) for insert-only deltas (either may
    be None/empty). Three batch-vs-table equi joins; never joins
    snapshot against snapshot."""
    _check_cols(a_old, b_old, list(on))
    terms: list[DataFrame] = []
    if delta_a is not None:
        terms.append(delta_a.join(b_old, list(on)))
    if delta_b is not None:
        terms.append(a_old.join(delta_b, list(on)))
    if delta_a is not None and delta_b is not None:
        terms.append(delta_a.join(delta_b, list(on)))
    if not terms:
        raise ValueError("no delta provided")
    out = terms[0]
    for t in terms[1:]:
        out = out.unionByName(t)
    return out


def maintain_join(
    view_old: DataFrame,
    a_old: DataFrame,
    delta_a: DataFrame | None,
    b_old: DataFrame,
    delta_b: DataFrame | None,
    on: Sequence[str],
) -> DataFrame:
    """view_old ∪ Δ — bag-equal to (A_old ∪ ΔA) ⋈ (B_old ∪ ΔB).
    ``view_old`` is the previously materialized A_old ⋈ B_old."""
    return view_old.unionByName(
        join_delta(a_old, delta_a, b_old, delta_b, list(on)),
        allowMissingColumns=False,
    )
