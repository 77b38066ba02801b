"""Activation manifest: declares staged queries from ``*_pending``
modules WITHOUT editing them.

Why: a tail query's driver evidence is pinned by ``deps_sha256`` — a
hash of its DEFINING module plus the whole import closure
(tools/snapshot_evidence.py). Earlier rounds activated staged queries
by appending a declare loop to the staging module itself, which meant
NEXT round's partial activation edit invalidated every already-
evidenced sibling in that module (the round-6 roundsix.py trap: 3
staged queries held hostage by 32 evidence pins). declare() location
is irrelevant to the pins — both ``sha256`` (fn source) and
``deps_sha256`` hash the module where the fn is DEFINED — so this
manifest can grow round over round with ZERO drift to anything already
evidenced.

Ordering: registry order is (module index in _QUERY_MODULES, declare
sequence). All queries of one staging module share its module index,
and THIS file controls their declare sequence — so newly activated
queries from a partially-activated module can be declared ahead of
their already-evidenced siblings to land inside the driver's first-50
evidence window.

Round 7 window (50 slots, all free — zero NEW/DRIFT after the round-
start evidence snapshot pinned the 50 round-6 rows):
  positions 0-20  roundnine_pending: all 21
  positions 21-28 roundten_pending: first 8
  positions 29-49 roundeight_pending: the 21 NOT activated in round 6
                  (declared BEFORE their 7 evidenced siblings, whose
                  declare sequence pushes them to tail positions 50-56
                  where their r06 pins remain valid)
Headline promotions at declare time (bench coverage for new plan
shapes): sim_pq_adc_topk (PQ asymmetric-distance top-k — the
compressed-ANN scale path), agg_bitmap_distinct (bitmap-index exact
distinct — the mergeable-sketch agg shape).

Round 6 window (for the record): roundsix_tail 0-3, roundseven_pending
4-42, roundeight_pending first 7 at 43-49; headline promotions
agg_forecast_revenue (TPC-H Q6 pushdown canary) and text_bm25_topk.

Shared-staging-file constraint (ADVICE r06): once ANY query of a
staging module is activated and driver-evidenced, every still-pending
sibling in that module is frozen too — an edit to a pending entry
drifts the deps_sha256 pins of its evidenced siblings (the file is in
their import closure). roundeight_pending lived through exactly this
between rounds 6 and 7 (its remaining 21 could not be touched while 7
siblings carried r06 pins); round 7 closed the exposure by activating
the whole module. Rule going forward: one staging module per
activation WAVE (plans/roundfourteen_pending.py is the first cut to
that rule), so pending edits never share a file with evidenced
queries.
"""

from __future__ import annotations

from spotify_data_pipeline_spark.plans import (
    roundeight_pending,
    roundnine_pending,
    roundseven_pending,
    roundten_pending,
)
from spotify_data_pipeline_spark.plans.registry import declare

# Promote to bench headline at activation (PendingQuery entries carry
# headline=False; the flag is a bench-coverage decision made here).
_HEADLINE = {
    "agg_forecast_revenue",
    "text_bm25_topk",
    "sim_pq_adc_topk",
    "agg_bitmap_distinct",
}

_R8_ROUND6 = (
    "graph_hits_scores",
    "text_phrase_search",
    "events_marker_sessions",
    "events_disorder_audit",
    "agg_revenue_gini",
    "events_uniques_rollup",
    "text_collocation_lift",
)

_R10_ACTIVE = (
    "orders_changepoint_day",
    "text_kn_continuation",
    "events_chisq_independence",
    "agg_bitmap_distinct",
    "events_twap",
    "ops_join_size_estimate",
    "privacy_l_diversity",
    "ml_decision_stump",
)


def _activate(pending, names=None) -> None:
    by_name = {pq.name: pq for pq in pending}
    for name in names if names is not None else [pq.name for pq in pending]:
        pq = by_name[name]
        declare(
            pq.name,
            oracle=pq.oracle,
            headline=pq.headline or pq.name in _HEADLINE,
            tags=pq.tags,
        )(pq.fn)


_activate(roundnine_pending.PENDING)
_activate(roundten_pending.PENDING, _R10_ACTIVE)
# round-8: the 21 NEW activations first (window positions 29-49), then
# the 7 round-6-evidenced ones (tail 50-56 — sequence within the module
# index is exactly this declare order, see registry._module_rank).
_R8_NEW = tuple(
    pq.name for pq in roundeight_pending.PENDING if pq.name not in _R8_ROUND6
)
_activate(roundeight_pending.PENDING, _R8_NEW)
_activate(roundeight_pending.PENDING, _R8_ROUND6)
_activate(roundseven_pending.PENDING)

#: activation manifests (tests + future manifests read these)
R8_ACTIVATED: tuple[str, ...] = _R8_NEW + _R8_ROUND6  # all 28
R10_ACTIVATED: tuple[str, ...] = _R10_ACTIVE
