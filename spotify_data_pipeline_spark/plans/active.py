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

Round 6 window (50 slots, all free — zero NEW/DRIFT at round start):
  positions 0-3   plans/roundsix_tail.py (3 staged-tail wrappers + the
                  md5-CMS exact-oracle twin)
  positions 4-42  roundseven_pending: all 39
  positions 43-49 roundeight_pending: first 7
Headline promotions at declare time (bench coverage for new plan
shapes): agg_forecast_revenue (TPC-H Q6 — the pushdown canary),
text_bm25_topk (rational-idf BM25 — the retrieval family's scan+join
shape).
"""

from __future__ import annotations

from spotify_data_pipeline_spark.plans import roundeight_pending, roundseven_pending
from spotify_data_pipeline_spark.plans.registry import declare

# Promote to bench headline at activation (PendingQuery entries carry
# headline=False; the flag is a bench-coverage decision made here).
_HEADLINE = {"agg_forecast_revenue", "text_bm25_topk"}

_R8_ACTIVE = (
    "graph_hits_scores",
    "text_phrase_search",
    "events_marker_sessions",
    "events_disorder_audit",
    "agg_revenue_gini",
    "events_uniques_rollup",
    "text_collocation_lift",
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


_activate(roundseven_pending.PENDING)
_activate(roundeight_pending.PENDING, _R8_ACTIVE)

#: names activated from roundeight so far (tests + future manifests read this)
R8_ACTIVATED: tuple[str, ...] = _R8_ACTIVE
