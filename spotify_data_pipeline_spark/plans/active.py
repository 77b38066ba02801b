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

Round 10 window (50 slots, all free — zero NEW/DRIFT after the round-
start snapshot pinned the 50 round-9 rows). Executes NOTES_r09 §9
verbatim (VERDICT r09 item 1), on-mission first:
  positions 0-5   roundtwentyone: SemDeDup, DSIR, bigram-ppl filter,
                  C4 screen, Matryoshka recall, NB quality filter —
                  the on-mission LLM-curation trio + companions
  positions 6-8   roundtwentyfour: Brandes betweenness, dHash
                  near-dup, Bloom decontamination
  positions 9-15  roundeighteen: unigram xent, JS divergence, n-gram
                  novelty, 8-gram decontam overlap, char-bigram
                  entropy, LTV deciles, similarity-path advisor
  positions 16-21 roundnineteen: shingle containment, shard manifest,
                  centroid drift, stopword profile, HHI, dispersion
  positions 22-26 roundtwentytwo: warehouse/ops self-diagnosis wave
  positions 27-31 roundtwentythree: PCA power iteration, nprobe
                  sweep, PSI drift, mix temperature, Theil index
  positions 32-35 roundtwentyfive: GBDT boosting, Haar energy,
                  curriculum order, NB calibration
  positions 36-39 roundtwentysix: TextRank, blocking quality, OOV,
                  session-gap sweep
  positions 40-42 roundtwentyseven: span corruption, randomized
                  response, funnel-window sweep
  positions 43-45 roundtwentyeight: Bradley-Terry, Mann-Kendall,
                  entropy rate
  positions 46-48 roundtwentynine: Burrows' Delta, Yannakakis,
                  Hodges-Lehmann
  position  49    roundthirty: agg_kruskal_wallis (sibling
                  agg_levene_variance rides to round 11 — the only
                  partial-module split; see the round-10 comment at
                  the activation block)
After this window the staged backlog is ONE query (agg_levene_variance);
the staging freeze holds until it is zero (r11).

Round 9 window (for the record — 50 slots, all free — zero NEW/DRIFT
after the round-start snapshot pinned the 50 round-8 rows). Per VERDICT r08 item 1,
the whole window burns staged backlog, on-mission first:
  positions 0-1   roundtwenty_pending: the BPE merge-training pair
                  (llm_bpe_phrase_merges, llm_bpe_compression_curve) —
                  the LLM-native iterative op, highest-signal
                  unevidenced pair, declared FIRST
  positions 2-17  roundthirteen_pending: all 16
  positions 18-28 roundfifteen_pending: all 11
  positions 29-35 roundsixteen_pending: all 7
  positions 36-39 roundseventeen_pending: all 4
  positions 40-49 roundtwelve_pending: the 10 remainder — declared
                  BEFORE their 4 round-8-evidenced siblings (tail
                  50-53 on intact r08 pins), dissolving the
                  shared-staging-file freeze (VERDICT r08 item 2)
New staging is FROZEN this round (VERDICT r08 item 2): zero new
round*_pending modules until the backlog fits one window. Backlog
after this window: 51 (roundeighteen through roundthirty minus the
roundtwenty pair) — the round-10 window takes it to ~zero.

Round 8 window (for the record — 50 slots, all free):
  positions 0-1   roundfourteen_pending: both (the webtext pair FIRST —
                  VERDICT r07 item 3: the C4/RefinedWeb boilerplate
                  screen is the most-used never-hash-checked operator)
  positions 2-22  roundeleven_pending: all 21
  positions 23-26 roundtwelve_pending: 4 of 14 (_R12_ACTIVE — includes
                  etl_merge_upsert [S12 twin], dedup_ppjoin_prefix and
                  ops_join_strategy_advice [the join-path advisor])
  positions 27-49 roundten_pending: the 23 NOT activated in round 7 —
                  declared BEFORE their 8 evidenced siblings via this
                  file's declare sequence, so those 8 sit at tail
                  positions 50-57 on intact r07 pins. Includes the md5
                  MinHash/SimHash twins (dedup_minhash_estimate,
                  dedup_simhash_md5), completing exact-oracle coverage
                  of D4 (VERDICT r07 item 8).
roundtwelve_pending is now partially evidenced (4 of 14): per the
shared-staging-file rule its remaining 10 are FROZEN (an edit drifts
the 4 new pins) until activated — acceptable, they are complete and
2-SF hash-matched already (the roundeight precedent, rounds 6→7).

Round 7 window (for the record): roundnine_pending 0-20,
roundten_pending first 8 at 21-28, roundeight_pending's 21
not-yet-evidenced at 29-49 (their 7 round-6 siblings at tail 50-56).
Headline promotions that round: sim_pq_adc_topk, agg_bitmap_distinct.

Round 6 window (for the record): roundsix_tail 0-3, roundseven_pending
4-42, roundeight_pending first 7 at 43-49; headline promotions
agg_forecast_revenue (TPC-H Q6 pushdown canary) and text_bm25_topk.

Shared-staging-file constraint (ADVICE r06): once ANY query of a
staging module is activated and driver-evidenced, every still-pending
sibling in that module is frozen too — an edit to a pending entry
drifts the deps_sha256 pins of its evidenced siblings (the file is in
their import closure). Rule going forward: one staging module per
activation WAVE where possible (roundfourteen/fifteen/sixteen/
seventeen are cut to that rule); when a partial activation is
unavoidable (roundtwelve this round, per the verdict's prescribed
window), the freeze is documented here and the remainder activates
next round.
"""

from __future__ import annotations

from spotify_data_pipeline_spark.plans import (
    roundeight_pending,
    roundeighteen_pending,
    roundeleven_pending,
    roundfifteen_pending,
    roundfourteen_pending,
    roundnine_pending,
    roundnineteen_pending,
    roundseven_pending,
    roundseventeen_pending,
    roundsixteen_pending,
    roundten_pending,
    roundthirteen_pending,
    roundthirty_pending,
    roundthirtyeight_pending,
    roundthirtyfive_pending,
    roundthirtyfour_pending,
    roundthirtynine_pending,
    roundthirtyone_pending,
    roundthirtyseven_pending,
    roundthirtysix_pending,
    roundthirtythree_pending,
    roundthirtytwo_pending,
    roundtwelve_pending,
    roundtwenty_pending,
    roundtwentyeight_pending,
    roundtwentyfive_pending,
    roundtwentyfour_pending,
    roundtwentynine_pending,
    roundtwentyone_pending,
    roundtwentyseven_pending,
    roundtwentysix_pending,
    roundtwentythree_pending,
    roundtwentytwo_pending,
)
from spotify_data_pipeline_spark.plans.registry import declare

# Promote to bench headline at activation (PendingQuery entries carry
# headline=False; the flag is a bench-coverage decision made here).
_HEADLINE = {
    "agg_forecast_revenue",
    "text_bm25_topk",
    "sim_pq_adc_topk",
    "agg_bitmap_distinct",
    # round 8: three NEW plan shapes at ~2 s combined (measured warm,
    # sf0.1): the webtext URL-extraction scan + domain agg, the MERGE
    # upsert (S12's warehouse shape), and the salted skew join. The
    # heavier round-8 window queries (text_paragraph_dedup 8.0 s,
    # dedup_simhash_md5 6.6 s — md5-dominated by design) stay
    # non-headline: their correctness evidence is the driver window,
    # their plan shape is PLAN_AUDIT's, and promoting them would have
    # ~2.5×'d the bench totals for no new signal.
    "text_url_domain_stats",
    "etl_merge_upsert",
    "join_salted_skew",
    # round 11 (NOTES_r10 §9 item 2): the on-mission Bloom
    # decontamination screen — cheap (1.85 s warm at sf0.1) and the
    # r10-green flagship whose plan shape (≤m-row bitmap broadcast +
    # 3 semi-joins) is the 100 TB decontamination story. Its heavier
    # r10 siblings sim_semdedup (3.88 s) and text_c4_screen (3.08 s)
    # carry production-path probes in bench.py (semdedup_probe,
    # webtext_prod_probe) instead of headline weight.
    "llm_decontam_bloom",
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

# Round-8 roundtwelve subset: S12's merge upsert, the ppjoin prefix
# query, bootstrap CI, and the join-strategy advisor (VERDICT r07
# item 6's query-level twin). The other 10 stay pending for round 9.
_R12_ACTIVE = (
    "agg_bootstrap_ci",
    "etl_merge_upsert",
    "dedup_ppjoin_prefix",
    "ops_join_strategy_advice",
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


# ---- Round-10 window (50 slots, all free — zero NEW/DRIFT after the
# round-start snapshot pinned the 50 round-9 rows). Executes the
# pre-planned NOTES_r09 §9 order verbatim (VERDICT r09 item 1),
# on-mission first: roundtwentyone's SemDeDup/DSIR/C4 wave (0-5), then
# Bloom-decontam/dHash/betweenness (6-8), the advisor-columns +
# 8-gram-decontam wave (9-15), and the statistics/ops catalog
# (16-49). roundthirty activates agg_kruskal_wallis ONLY — its sibling
# agg_levene_variance rides to round 11 (the only partial-module
# split; module is last in _QUERY_MODULES order, so the r11 edit puts
# kruskal at tail position 50 on an intact r10 pin). After this window
# the staged backlog is ONE query; the staging freeze (VERDICT r08
# item 2, reaffirmed r09 item 6) holds until it is zero.
# ---- Round-11 window (VERDICT r10 items 1-4; NOTES_r10 §9). Module
# order in registry._QUERY_MODULES puts roundtwentyfive FIRST
# (ml_gbdt_stump_boost's oracle fix: 1 NEW + 3 sibling deps-DRIFT at
# positions 0-3), then the round-31..36 staging waves (positions
# 4-48; ADVICE r11: the window spans rounds 31-36, not 31-34), then
# roundthirty: agg_levene_variance declared BEFORE its
# r10-green sibling agg_kruskal_wallis, which therefore sits at tail
# position 50 on an intact r10 pin. Staged backlog after this window:
# ZERO — the staging freeze (VERDICT r08 item 2) lifts, and the
# round-31..36 modules are the first post-backlog-era staging.
# ---- Round-12 window (VERDICT r11 items 2-4; NOTES_r11 §7). Module
# order in registry._QUERY_MODULES puts the two pre-staged waves first
# (roundthirtyseven 0-4, roundthirtyeight 5-9 — all oracle-green at 2
# SFs since round 11), then the round-39 closing wave (10-13: SimHash
# merge==rebuild, LSH band cost census, bin-fill packing balance, BPE
# lang divergence), then roundsix (14-45) + roundsix_tail (46-49):
# every roundsix-closure query deps-DRIFTed by the orders_rfm_segments
# global-ntile scale fix (VERDICT r11 item 3) and re-proving on the
# fixed tree. 14 NEW + 36 DRIFT = exactly 50; staged backlog after
# this window: ZERO.
_activate(roundthirtyseven_pending.PENDING)
_activate(roundthirtyeight_pending.PENDING)
_activate(roundthirtynine_pending.PENDING)

_activate(roundthirtyone_pending.PENDING)
_activate(roundthirtytwo_pending.PENDING)
_activate(roundthirtythree_pending.PENDING)
_activate(roundthirtyfour_pending.PENDING)
_activate(roundthirtyfive_pending.PENDING)
_activate(roundthirtysix_pending.PENDING)
_activate(roundthirty_pending.PENDING, ("agg_levene_variance",))

_activate(roundtwentyone_pending.PENDING)
_activate(roundtwentyfour_pending.PENDING)
_activate(roundeighteen_pending.PENDING)
_activate(roundnineteen_pending.PENDING)
_activate(roundtwentytwo_pending.PENDING)
_activate(roundtwentythree_pending.PENDING)
_activate(roundtwentyfive_pending.PENDING)
_activate(roundtwentysix_pending.PENDING)
_activate(roundtwentyseven_pending.PENDING)
_activate(roundtwentyeight_pending.PENDING)
_activate(roundtwentynine_pending.PENDING)
_activate(roundthirty_pending.PENDING, ("agg_kruskal_wallis",))

# ---- Round-9 window (50 slots, all free — zero NEW/DRIFT after the
# round-start snapshot pinned the 50 round-8 rows). Order per VERDICT
# r08 item 1: BPE merge-training pair first (highest-signal unevidenced
# pair), then the roundtwelve remainder (dissolves the pin freeze),
# then the r13/r15/r16/r17 waves. Global order comes from
# registry._QUERY_MODULES (roundtwenty < roundthirteen < roundfifteen
# < roundsixteen < roundseventeen < roundtwelve), so only the WITHIN-
# roundtwelve sequence matters here: the 10 never-evidenced remainder
# declare BEFORE the 4 round-8-evidenced siblings, which therefore sit
# at tail positions 50-53 on intact r08 pins.
_activate(roundtwenty_pending.PENDING)
_activate(roundthirteen_pending.PENDING)
_activate(roundfifteen_pending.PENDING)
_activate(roundsixteen_pending.PENDING)
_activate(roundseventeen_pending.PENDING)
_R12_REMAINDER = tuple(
    pq.name for pq in roundtwelve_pending.PENDING if pq.name not in _R12_ACTIVE
)
_activate(roundtwelve_pending.PENDING, _R12_REMAINDER)

_activate(roundfourteen_pending.PENDING)
_activate(roundeleven_pending.PENDING)
_activate(roundtwelve_pending.PENDING, _R12_ACTIVE)
# roundten: the 23 NEW activations first (window positions 27-49), then
# the 8 round-7-evidenced ones (tail 50-57 — sequence within the module
# index is exactly this declare order, see registry._module_rank).
_R10_NEW = tuple(
    pq.name for pq in roundten_pending.PENDING if pq.name not in _R10_ACTIVE
)
_activate(roundten_pending.PENDING, _R10_NEW)
_activate(roundten_pending.PENDING, _R10_ACTIVE)
_activate(roundnine_pending.PENDING)
# round-8 (historical layout preserved): the 21 then-new activations
# before the 7 round-6-evidenced ones.
_R8_NEW = tuple(
    pq.name for pq in roundeight_pending.PENDING if pq.name not in _R8_ROUND6
)
_activate(roundeight_pending.PENDING, _R8_NEW)
_activate(roundeight_pending.PENDING, _R8_ROUND6)
_activate(roundseven_pending.PENDING)

#: activation manifests (tests + future manifests read these)
R8_ACTIVATED: tuple[str, ...] = _R8_NEW + _R8_ROUND6  # all 28
R10_ACTIVATED: tuple[str, ...] = _R10_ACTIVE
R10_REMAINDER: tuple[str, ...] = _R10_NEW  # the 23 activated round 8
R11_ACTIVATED: tuple[str, ...] = tuple(pq.name for pq in roundeleven_pending.PENDING)
R12_ACTIVATED: tuple[str, ...] = _R12_ACTIVE
R14_ACTIVATED: tuple[str, ...] = tuple(pq.name for pq in roundfourteen_pending.PENDING)

R12_REMAINDER: tuple[str, ...] = _R12_REMAINDER
R13_ACTIVATED: tuple[str, ...] = tuple(pq.name for pq in roundthirteen_pending.PENDING)
R15_ACTIVATED: tuple[str, ...] = tuple(pq.name for pq in roundfifteen_pending.PENDING)
R16_ACTIVATED: tuple[str, ...] = tuple(pq.name for pq in roundsixteen_pending.PENDING)
R17_ACTIVATED: tuple[str, ...] = tuple(pq.name for pq in roundseventeen_pending.PENDING)
R20_ACTIVATED: tuple[str, ...] = tuple(pq.name for pq in roundtwenty_pending.PENDING)

# Round-10 window manifests (tests + tools read these).
R21_ACTIVATED: tuple[str, ...] = tuple(pq.name for pq in roundtwentyone_pending.PENDING)
R24_ACTIVATED: tuple[str, ...] = tuple(pq.name for pq in roundtwentyfour_pending.PENDING)
R18_ACTIVATED: tuple[str, ...] = tuple(pq.name for pq in roundeighteen_pending.PENDING)
R19_ACTIVATED: tuple[str, ...] = tuple(pq.name for pq in roundnineteen_pending.PENDING)
R22_ACTIVATED: tuple[str, ...] = tuple(pq.name for pq in roundtwentytwo_pending.PENDING)
R23_ACTIVATED: tuple[str, ...] = tuple(pq.name for pq in roundtwentythree_pending.PENDING)
R25_ACTIVATED: tuple[str, ...] = tuple(pq.name for pq in roundtwentyfive_pending.PENDING)
R26_ACTIVATED: tuple[str, ...] = tuple(pq.name for pq in roundtwentysix_pending.PENDING)
R27_ACTIVATED: tuple[str, ...] = tuple(pq.name for pq in roundtwentyseven_pending.PENDING)
R28_ACTIVATED: tuple[str, ...] = tuple(pq.name for pq in roundtwentyeight_pending.PENDING)
R29_ACTIVATED: tuple[str, ...] = tuple(pq.name for pq in roundtwentynine_pending.PENDING)
R30_ACTIVATED: tuple[str, ...] = ("agg_kruskal_wallis",)
R30_REMAINDER: tuple[str, ...] = ()  # agg_levene_variance activated r11

# Round-11 window manifests: backlog closure + the first
# post-backlog-era staging waves.
R30B_ACTIVATED: tuple[str, ...] = ("agg_levene_variance",)
R31_ACTIVATED: tuple[str, ...] = tuple(pq.name for pq in roundthirtyone_pending.PENDING)
R32_ACTIVATED: tuple[str, ...] = tuple(pq.name for pq in roundthirtytwo_pending.PENDING)
R33_ACTIVATED: tuple[str, ...] = tuple(pq.name for pq in roundthirtythree_pending.PENDING)
R34_ACTIVATED: tuple[str, ...] = tuple(pq.name for pq in roundthirtyfour_pending.PENDING)
R35_ACTIVATED: tuple[str, ...] = tuple(pq.name for pq in roundthirtyfive_pending.PENDING)
R36_ACTIVATED: tuple[str, ...] = tuple(pq.name for pq in roundthirtysix_pending.PENDING)

# Round-12 window manifests: the two r11-staged waves plus the round-39
# closing wave (tests + tools read these).
R37_ACTIVATED: tuple[str, ...] = tuple(pq.name for pq in roundthirtyseven_pending.PENDING)
R38_ACTIVATED: tuple[str, ...] = tuple(pq.name for pq in roundthirtyeight_pending.PENDING)
R39_ACTIVATED: tuple[str, ...] = tuple(pq.name for pq in roundthirtynine_pending.PENDING)

#: Round-9 window manifest: the 50 staged queries activated this round,
#: in their exact window positions 0-49.
R9_WINDOW: tuple[str, ...] = (
    tuple(pq.name for pq in roundtwenty_pending.PENDING)
    + tuple(pq.name for pq in roundthirteen_pending.PENDING)
    + tuple(pq.name for pq in roundfifteen_pending.PENDING)
    + tuple(pq.name for pq in roundsixteen_pending.PENDING)
    + tuple(pq.name for pq in roundseventeen_pending.PENDING)
    + _R12_REMAINDER
)
