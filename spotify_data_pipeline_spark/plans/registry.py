"""Query registry.

Conventions that keep the DuckDB oracle hash-stable (driver contract,
__spark_entry__.py):

- **Column names match exactly** between the Spark plan and the oracle
  SQL: every computed/aggregate column is aliased on both sides.
- **Integer-like outputs are BIGINT on both sides** (Spark ``long``;
  DuckDB ``CAST(... AS BIGINT)`` — DuckDB's SUM(int) is HUGEINT and
  ntile/datediff widths differ, so we cast explicitly).
- **Float outputs are rounded** (money → 2 dp, ratios/similarities →
  4 dp) on both sides; running/cumulative money sums are computed in
  integer *cents* so the result is exact regardless of summation order.
- **Ties are always broken** by a unique key before any LIMIT / window
  rank, so the selected row *set* is deterministic on both engines.
- **Timestamps** rely on the UTC session timezone set in session.py.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Modules that register queries on import.
#
# ORDER MATTERS for driver evidence: the driver records exactly the
# FIRST 50 keys of __spark_entry__.queries() in CORRECTNESS_r{N}.json
# (verified: r02's file is byte-for-byte the first 50 keys of the dict
# the driver saw — round 2's "skipped positions" were an import
# side effect in __spark_entry__.py, since removed). Queries that are
# new or changed this round register FIRST. Everything past position 50
# must (a) carry a green prior-round driver row by NAME and (b) have a
# current source hash equal to the one snapshotted when that evidence
# was earned (tests/evidence_hashes.json, written by
# tools/snapshot_evidence.py) — both enforced by tests/test_registry.py,
# so a silent edit to a tail query's body fails pytest.
#
# Round-10 front-loading (VERDICT r09 item 1 — execute the pre-planned
# NOTES_r09 §9 window, on-mission first): all 342 previously-declared
# queries entered the round with valid evidence pins (0 NEW / 0 DRIFT
# after the round-start snapshot), so the full 50-slot window goes to
# the final backlog wave: roundtwentyone's SemDeDup/DSIR/C4 trio-
# carrying 6 (0–5), roundtwentyfour's Bloom-decontam/dHash/betweenness
# 3 (6–8), roundeighteen's 7 (9–15, incl. the advisor-columns query and
# 8-gram decontam), roundnineteen's 6 (16–21), roundtwentytwo's 5
# (22–26), roundtwentythree's 5 (27–31), roundtwentyfive's 4 (32–35),
# roundtwentysix's 4 (36–39), roundtwentyseven's 3 (40–42),
# roundtwentyeight's 3 (43–45), roundtwentynine's 3 (46–48), and
# roundthirty's agg_kruskal_wallis (49). roundthirty's second query
# (agg_levene_variance) stays pending one more round — the only
# partial-module split; its module is LAST in the order so next round's
# activation edit sits at tail position 50 on an intact r10 pin.
# After this window the staged backlog is ONE query; after r11, zero.
#
# Round-9 front-loading (VERDICT r08 item 1 — whole window to staged
# backlog, on-mission first): all 292 previously-declared queries
# entered the round with valid evidence pins (0 NEW / 0 DRIFT after the
# round-start snapshot — tools/window_eligibility.py), so the full
# 50-slot window goes to activations: roundtwenty's BPE merge-training
# pair FIRST (0–1, the highest-signal unevidenced pair per the
# verdict), roundthirteen's 16 (2–17), roundfifteen's 11 (18–28),
# roundsixteen's 7 (29–35), roundseventeen's 4 (36–39), then
# roundtwelve_pending's 10 never-evidenced remainder (40–49) — the
# plans.active manifest declares those 10 BEFORE the module's 4
# round-8-evidenced siblings, which therefore sit at tail positions
# 50–53 on their intact r08 pins; this dissolves the roundtwelve
# shared-staging-file freeze (VERDICT r08 What's-wrong 2). Every prior
# block rotates further down the tail: roundfourteen(2) +
# roundeleven(21) + roundten(31) + roundnine(21) + roundeight(28) +
# roundsix_tail(4) + roundseven(39) + roundfive(12) + events(6) +
# roundsix(32) + llmops(11) + aggregates(12) + relational(19) +
# roundfour(17) + windows(9) + multimodal(3) + dedup(6) +
# similarity(4) + text(11) — every one r01..r08-green and hash-pinned
# by BOTH fn-source and import-closure hashes.
_QUERY_MODULES = (
    # ---- Round-12 window (first 50 positions) ----
    # VERDICT r11 items 2-4: the 10 staged round-37/38 queries first
    # (positions 0-9), the round-39 closing wave (10-13), then
    # roundsix (14-45) + roundsix_tail (46-49) — ALL 36 of those are
    # deps-DRIFT re-proofs forced by the orders_rfm_segments scale fix
    # (VERDICT r11 item 3): editing roundsix.py invalidates the
    # deps_sha256 pin of every query whose closure contains it, which
    # is the whole module plus roundsix_tail (it imports roundsix).
    # The window is therefore exactly 14 NEW + 36 DRIFT = 50.
    "spotify_data_pipeline_spark.plans.roundthirtyseven_pending",
    "spotify_data_pipeline_spark.plans.roundthirtyeight_pending",
    "spotify_data_pipeline_spark.plans.roundthirtynine_pending",
    "spotify_data_pipeline_spark.plans.roundsix",
    "spotify_data_pipeline_spark.plans.roundsix_tail",
    # ---- Round-11 window (now tail, all hash-pinned) ----
    "spotify_data_pipeline_spark.plans.roundtwentyfive_pending",
    "spotify_data_pipeline_spark.plans.roundthirtyone_pending",
    "spotify_data_pipeline_spark.plans.roundthirtytwo_pending",
    "spotify_data_pipeline_spark.plans.roundthirtythree_pending",
    "spotify_data_pipeline_spark.plans.roundthirtyfour_pending",
    "spotify_data_pipeline_spark.plans.roundthirtyfive_pending",
    "spotify_data_pipeline_spark.plans.roundthirtysix_pending",
    "spotify_data_pipeline_spark.plans.roundthirty_pending",
    # ---- Round-10 window and earlier (tail, all hash-pinned) ----
    "spotify_data_pipeline_spark.plans.roundtwentyone_pending",
    "spotify_data_pipeline_spark.plans.roundtwentyfour_pending",
    "spotify_data_pipeline_spark.plans.roundeighteen_pending",
    "spotify_data_pipeline_spark.plans.roundnineteen_pending",
    "spotify_data_pipeline_spark.plans.roundtwentytwo_pending",
    "spotify_data_pipeline_spark.plans.roundtwentythree_pending",
    "spotify_data_pipeline_spark.plans.roundtwentysix_pending",
    "spotify_data_pipeline_spark.plans.roundtwentyseven_pending",
    "spotify_data_pipeline_spark.plans.roundtwentyeight_pending",
    "spotify_data_pipeline_spark.plans.roundtwentynine_pending",
    "spotify_data_pipeline_spark.plans.roundtwenty_pending",
    "spotify_data_pipeline_spark.plans.roundthirteen_pending",
    "spotify_data_pipeline_spark.plans.roundfifteen_pending",
    "spotify_data_pipeline_spark.plans.roundsixteen_pending",
    "spotify_data_pipeline_spark.plans.roundseventeen_pending",
    "spotify_data_pipeline_spark.plans.roundtwelve_pending",
    "spotify_data_pipeline_spark.plans.roundfourteen_pending",
    "spotify_data_pipeline_spark.plans.roundeleven_pending",
    "spotify_data_pipeline_spark.plans.roundten_pending",
    "spotify_data_pipeline_spark.plans.roundnine_pending",
    "spotify_data_pipeline_spark.plans.roundeight_pending",
    "spotify_data_pipeline_spark.plans.active",
    "spotify_data_pipeline_spark.plans.roundseven_pending",
    "spotify_data_pipeline_spark.plans.roundfive",
    "spotify_data_pipeline_spark.plans.events_queries",
    "spotify_data_pipeline_spark.plans.llmops_queries",
    "spotify_data_pipeline_spark.plans.aggregates",
    "spotify_data_pipeline_spark.plans.relational",
    "spotify_data_pipeline_spark.plans.roundfour",
    "spotify_data_pipeline_spark.plans.windows",
    "spotify_data_pipeline_spark.plans.multimodal_queries",
    "spotify_data_pipeline_spark.plans.dedup_queries",
    "spotify_data_pipeline_spark.plans.similarity_queries",
    "spotify_data_pipeline_spark.plans.text_queries",
)


@dataclass(frozen=True)
class DeclaredQuery:
    name: str
    fn: QueryFn
    oracle: str | None = None  # DuckDB SQL; None => driver's rows-only check
    headline: bool = False  # included in bench.py
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, DeclaredQuery] = {}
_DECLARE_SEQ: dict[str, int] = {}  # name -> monotonic declaration counter
_LOADED = False


def declare(
    name: str,
    oracle: str | None = None,
    headline: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as a declared query under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = DeclaredQuery(name=name, fn=fn, oracle=oracle, headline=headline, tags=tags)
        _DECLARE_SEQ[name] = len(_DECLARE_SEQ)
        return fn

    return deco


def _load() -> None:
    global _LOADED
    if not _LOADED:
        for mod in _QUERY_MODULES:
            importlib.import_module(mod)
        _LOADED = True


def _module_rank(q: DeclaredQuery) -> tuple[int, int]:
    """Sort key pinning registry order to _QUERY_MODULES order, NOT
    import order. declare() runs at module import, so any stray eager
    import (e.g. the driver calling entry() — which touches
    plans.aggregates — before queries()) would otherwise register that
    module's queries first and shift everything else past the driver's
    50-row evidence window (this exact failure produced round 2's five
    unevidenced queries). Within a module, declaration sequence is
    preserved."""
    mod = getattr(q.fn, "__module__", "")
    try:
        idx = _QUERY_MODULES.index(mod)
    except ValueError:
        idx = len(_QUERY_MODULES)
    return (idx, _DECLARE_SEQ[q.name])


def all_queries() -> dict[str, DeclaredQuery]:
    _load()
    return {q.name: q for q in sorted(_REGISTRY.values(), key=_module_rank)}


def headline_queries() -> dict[str, DeclaredQuery]:
    return {k: q for k, q in all_queries().items() if q.headline}
