"""Engine-wide physical-plan hygiene: no declared query may plan a
CartesianProduct or a BroadcastNestedLoopJoin, except the explicitly
whitelisted broadcast-1-row patterns (a scalar aggregate or a literal
constant table cross-joined into a big side — O(n) by construction,
the documented device in dedup caps / IVF probes / brute-force
oracle anchors). A new query that accidentally plans the both-sides-
large nested loop fails here before it ever reaches the driver."""

from __future__ import annotations

import pytest

from spotify_data_pipeline_spark.plans import all_queries

SF = "/root/testdata/sf0.001"

# Queries whose plan legitimately contains BroadcastNestedLoopJoin /
# CartesianProduct — each against a broadcast side that is a 1-row
# aggregate or a bounded literal table (reason noted).
_BNLJ_WHITELIST = {
    # shingle DF-cap filter: 1-row corpus-count aggregate broadcast
    "dedup_ngram_jaccard",
    "dedup_incremental_screen",
    "dedup_tfidf_cosine",
    "llm_neardup_source_matrix",
    "dedup_components",
    # brute-force exact-oracle anchors: documented O(n*k) broadcast of
    # a bounded query/centroid set (k fixed, never corpus-sized)
    "sim_cosine_topk",
    "sim_quantized_topk",
    "sim_ann_lsh",
    "sim_ann_ivf_fixed",
    "llm_ivf_assign",
    # 1-row bounds/total aggregates broadcast into the spine/line
    "events_cumulative_users",
    "events_pareto",
    "llm_weighted_sample",
    "llm_source_mix",
    "llm_train_val_split",
    "text_novelty",
    "llm_contamination_ngram",
    "agg_approx_distinct",
    "subquery_correlated_scalar",
    # corpus-count 1-row aggregate broadcast into the doc-frequency cap
    "llm_tfidf_top_terms",
    # broadcast centroid literal table (k rows, k fixed)
    "sim_ann_ivf",
    # 1-row capacity/total aggregate broadcast
    "text_heavy_hitters",
    # constraint scalars (1-row aggregates) broadcast into the report
    "data_quality_report",
    # the DECLARED cross/theta-join surface itself: bounded dims
    # (region x nation), the documented J6 suite entry
    "join_cross_theta",
    # banded theta join against a bounded literal band table
    "join_range_bands",
    # --- round-6 staged queries (pre-whitelisted for activation) ---
    # (llm_weighted_sample already above: 1-row total-weight broadcast)
    # 1-row broadcast bloom state joined on a constant group key
    "join_bloom_semireduction",
    # 1-row broadcast dangling-mass aggregate per iteration
    "graph_pagerank",
    # 1-row broadcast min/max date bounds under the calendar spine
    "events_gap_fill",
    # brute-force exact-oracle anchor: bounded 20-query broadcast
    "sim_ndcg_eval",
    # 1-row broadcast corpus-max-date aggregate under the RFM scoring
    "orders_rfm_segments",
    # two broadcast-1-row aggregates (n_edges, n_triangles) assembled
    # into the single stats row (operators/triangles.py)
    "graph_triangle_count",
    # sketch-vs-sketch pair join: |sources| rows of k-string states on
    # each side (src_a < src_b theta) — bounded by construction, the
    # corpus is never on either side
    "agg_kmv_overlap",
    # --- round-7 staged (pre-whitelisted for activation) ---
    # 1-row broadcast basket-count aggregate under the lift ratio
    "orders_basket_lift",
    # sources x length-histogram grid: cross join of two small
    # aggregates (20 x few-thousand), never the corpus
    "llm_ks_drift",
    # 1-row broadcast positive-balance aggregate under the
    # cross-multiplied threshold compare (Q22's scalar subquery)
    "join_sales_opportunity",
    # 1-row broadcast region-total aggregate under the cross-multiplied
    # HAVING threshold (Q11's global-aggregate subquery)
    "agg_important_parts",
    # 1-row broadcast corpus-totals (N docs, T tokens) aggregate under
    # the BM25 length normalization / rare-flag threshold
    "text_bm25_topk",
    "text_typicality",
    # --- round-8 staged (pre-whitelisted for activation) ---
    # two 1-row broadcast corpus-total aggregates under the lift ratio
    "text_collocation_lift",
    # 1-row broadcast max(day) censoring the churn right edge (<= theta)
    "events_growth_accounting",
    # --- round-9 staged (pre-whitelisted for activation) ---
    # 1-row broadcast totals (sum, n_keys) under the skew-ratio DIV
    "ops_skew_report",
    # 1-row broadcast max(day) anchor under the two window filters
    "events_trending",
    # bounded broadcasts: the 1-row vocab aggregate and the 5-row
    # class-prior table (|segments| is a domain constant)
    "ml_nb_segment",
    # inherits both proven anchors: BM25's 1-row corpus-totals
    # broadcast and the quantized brute-force 1-row probe broadcast
    "sim_rrf_fusion",
    # 1-row broadcast of the collected (cdf, value) lookup array
    # (distinct-value frame, domain-bounded)
    "llm_quantile_normalize",
    # --- round-10 staged (pre-whitelisted for activation) ---
    # 1-row broadcast of the collected KM (t, n, d) array under the
    # per-row prefix folds (timepoint domain horizon-bounded <= 73)
    "events_survival_km",
    # 1-row broadcast global-totals aggregate onto the top-10 rows
    "ops_join_size_estimate",
    # 1-row broadcast max-date anchor (the events_trending precedent)
    "orders_aging_report",
    # broadcast evaluation-batch crossJoin over the corpus scan (the
    # sim_cosine_topk / sim_quantized_topk documented pattern)
    "ml_knn_label",
    # 1-row aggregates assembled by broadcast cross join (triangle
    # count's documented pattern + the 1-row wedge total)
    "graph_clustering_coefficient",
    # 1-row broadcast revenue total onto the part frame
    "orders_abc_classification",
    # 1-row broadcast edge-count aggregate m under the q_num atoms
    # (operators/community.modularity_atoms)
    "graph_brand_modularity",
    # --- round-11 staged (pre-whitelisted for activation) ---
    # inherits ngram_jaccard's 1-row DF-cap broadcast + the 1-row
    # clustered-total broadcast under the singleton row
    "dedup_cluster_histogram",
    # broadcast 1-row query vector + LIMIT-10-bounded candidate theta
    # pairing (sim_mmr_diversified's bounded frames)
    "sim_mmr_diversified",
    # broadcast k-row centroid frame per Lloyd iteration (the
    # sim_ann_ivf bounded-centroid pattern)
    "ml_kmeans_exact",
    # 1-row calibration aggregate (m, max) broadcast onto the point
    # frame + 1-row cluster-stats assembly (dbscan_summary)
    "ml_dbscan_customers",
    # 1-row root-feature argmin broadcast (the tree structure is
    # data-dependent; the broadcast carries one row)
    "ml_decision_tree_d2",
    # inherits ngram_jaccard's 1-row DF-cap broadcast
    "dedup_lsh_calibration",
    # inherits ngram_jaccard's 1-row DF-cap broadcast (near-dedup stage)
    "llm_curation_funnel",
    # 1-row pooled theta-atoms aggregate broadcast onto the 2-arm frame
    "events_ab_cuped",
    # broadcast 5-row percentile-ladder frame crossed with the degree
    # and edge tables (bounded-literal pattern, join_range_bands kin)
    "graph_rich_club",
    # --- round-12 staged (pre-whitelisted for activation) ---
    # three 1-row aggregates (fact stats x dim stats x key-hist max)
    # cross-joined per candidate join
    "ops_join_strategy_advice",
    # bounded-literal broadcasts: 8-row centroid frame + 10-row query
    # set (sim_ann_ivf_fixed / sim_cosine_topk anchors) + 1-row
    # hit/total aggregates per recall row
    "sim_ivf_recall",
    # same anchors, LSH branch: 10-row query broadcast + 1-row
    # hit/total aggregates per recall row
    "sim_lsh_recall",
    # 1-row broadcast max-date anchor (trending/aging precedent)
    "events_decayed_topk",
    # --- round-13 optimization ---
    # 1-row bitmap-width aggregate (max suppkey DIV 64 + 1) broadcast
    # onto the per-node adjacency frame in each support round — the
    # r13 wedge-join → neighborhood-bitmap restructure
    "graph_ktruss_2round",
    # --- round-13 staged (pre-whitelisted for activation) ---
    # brute-force exact-oracle anchor: bounded query subset (every
    # 20th vector) broadcast over one corpus scan, the
    # cosine_topk_quantized pattern shared with sim_quantized_topk
    "ml_knn_confusion",
    # 1-row high-water-mark aggregate broadcast twice (trailing-day
    # theta filter + report assembly cross join)
    "dq_freshness_report",
    # 1-row max-order-date anchor cross-joined under the recency
    # feature (trending/aging precedent)
    "customer_360_snapshot",
    # same brute anchor as ml_knn_confusion (metric layer over it)
    "ml_knn_prf",
    # 1-row totals x 1-row chance-product aggregates assembled into
    # the single kappa row
    "agg_cohen_kappa",
    # --- round-15 staged (pre-whitelisted for activation) ---
    # |months|² pair self-join over the MONTHLY aggregate (~80² rows at
    # any SF; a century is ~720k pairs) — the kmv sketch-pair bounded
    # precedent; the corpus is scanned once, in the month agg
    "orders_theil_sen_trend",
    # |QI groups| × |balance bands| dense grid (~125×11,
    # schema-bounded) + 1-row corpus-totals broadcast
    "privacy_t_closeness_emd",
    # 1-row max-order-date anchor broadcast (trending/aging precedent)
    "orders_rfm_segmentation",
    # --- round-16 staged (pre-whitelisted for activation) ---
    # 1-row corpus-totals broadcast under the 6-row sweep frame
    "llm_quality_threshold_sweep",
    # 1-row supply-total window assembly (Hamilton allocation runs on
    # the |sources|-row frame)
    "llm_token_budget_allocation",
    # four (1-row child-count × 1-row orphan-count) assemblies
    "dq_referential_orphans",
    # --- round-17 staged (pre-whitelisted for activation) ---
    # 1-row min/max-day bounds broadcast (anchor precedent)
    "events_dau_wau_stickiness",
    # --- round-18 staged (pre-whitelisted for activation) ---
    # 1-row corpus-token-total broadcast under the LM log-probability
    # (the llm_tfidf_top_terms precedent)
    "llm_unigram_xent",
    # sources × vocab dense grid (the llm_ks_drift bounded-grid
    # precedent; sources is a domain constant, pair join is term-keyed)
    "text_js_divergence",
    # --- round-19 staged (pre-whitelisted for activation) ---
    # three 1-row aggregates assembled by broadcast cross join (the
    # graph_triangle_count pattern)
    "lineitem_supplier_hhi",
    # --- round-20 staged (pre-whitelisted for activation) ---
    # each unrolled BPE round applies the selected merge via a 1-row
    # broadcast of the top pair (the kmeans/pagerank iteration pattern)
    "llm_bpe_phrase_merges",
    "llm_bpe_compression_curve",
    # --- rounds 21-30 staged (pre-whitelisted for activation; each
    # docstring states the bounded pattern, verified by plan triage in
    # round 9 — zero CartesianProduct, every BNLJ builds a 1-row or
    # schema/length-bounded side) ---
    # two 1-row corpus-total broadcasts under the 64-bucket importance
    # weights (the llm_tfidf_top_terms precedent)
    "llm_dsir_weights",
    # 1-row vocabulary-size broadcast under the bigram LM
    "llm_bigram_doc_ppl",
    # 10-query brute-force anchor broadcast ×2 (prefix vs full dims)
    "sim_matryoshka_recall",
    # 1-row totals/priors broadcasts under the bounded-bucket NB
    "llm_nb_quality_filter",
    # 1-row row-count broadcast pricing the 2-row z-order summary
    "warehouse_zorder_audit",
    # per-step 1-row max broadcast; moment matrix bounded by dim²
    "sim_pca_power_iteration",
    # bounded quantizer + 10-query set broadcasts (IVF sweep anchors)
    "sim_ivf_nprobe_sweep",
    # 1-row weight-total broadcast over the |sources|-row frame
    "llm_mix_temperature",
    # bounded (≤ m rows) bitmap state broadcast against the probe
    # stream; the exact screen runs alongside
    "llm_decontam_bloom",
    # per-round 1-row stump broadcast (16 unrolled boosting rounds —
    # the kmeans/pagerank iteration pattern; residuals never shuffle)
    "ml_gbdt_stump_boost",
    # 1-row doc-count broadcast ranking doc METADATA only
    "llm_curriculum_order",
    # same bounded-bucket aggs as the classifier + 1-row assembly
    "ml_nb_calibration_bins",
    # per-strategy 1-row assembly of block-keyed counts
    "er_blocking_quality",
    # bounded 128-row daily series self-join (8k sign pairs) + 1-row agg
    "agg_mann_kendall_trend",
    # source×source grid over a 30-row-per-source z-score table,
    # vocabulary-keyed — never corpus×corpus
    "text_burrows_delta",
    # dimension-chain broadcasts in the semi-join reduction program
    "join_yannakakis_reduction",
    # bounded 101-row series self-join (5151 Walsh-average pairs)
    "agg_hodges_lehmann",
    # running-total over the bounded distinct-value table + 1-row
    # assembly
    "agg_kruskal_wallis",
    # group medians via rank windows; 1-row assembly broadcast
    "agg_levene_variance",
    # k-domain table x 1-row totals/level broadcasts (water-filling
    # assembly — corpus side is a single group agg)
    "llm_domain_mix_waterfill",
    # 8-row curve x 1-row total broadcast
    "llm_shard_ngram_saturation",
    # 1-row weight + accuracy broadcasts (Fisher-step assembly)
    "ml_logit_fisher_step",
    # 5-query x corpus brute-force scoring (the exact MIPS baseline —
    # the IVF rows carry the scale path) + 1-row max-norm broadcast
    "sim_mips_norm_transform",
    # 8-row frozen-centroid broadcast (the semdedup/IVF assign shape)
    "sim_hard_negative_mining",
    # 3-row lambda-path weight broadcast (ridge scoring pass)
    "ml_ridge_cramer",
    # round-33 nonparametric wave: 1-row assembly broadcasts onto the
    # tiny rank/cell tables (the kruskal/levene shape)
    "agg_friedman_test",
    "agg_page_trend",
    "agg_cochran_q",
    "agg_jonckheere_terpstra",
    # 1-row grand-median broadcast + 1-row chi2 assembly
    "agg_mood_median",
    # 1-row training-vocabulary broadcast (the bigram-ppl shape)
    "llm_bigram_heldout_gap",
    # 32-row shard table x 1-row global straggler broadcast
    "ops_shard_balance_audit",
    # 1-row moment broadcast + integer-deviation argmax
    "agg_grubbs_outlier",
    # 1-row Q assembly broadcast onto the 5-lag table
    "events_ljung_box",
    # <=4-row chosen-center broadcast per unrolled farthest-point round
    "sim_kmeanspp_farthest_init",
    # 1-row distilled-weight broadcast (the Fisher-step shape)
    "ml_logit_calibration_bins",
    # --- round-12 window activations (migrated from the staged test
    # files' _BNLJ_OK at activation, as documented there) ---
    # 5-row group self theta-join (g < h) + 1-row MSE broadcast
    "agg_tukey_pairwise",
    # <=4-row chosen-center broadcasts per unrolled seeding round
    "sim_ann_ivf_kpp_recall",
    # 1-row distilled-weight broadcast (the Fisher-step shape)
    "llm_contamination_by_quality",
    # 1-row totals/assembly broadcasts onto the 5-row group table
    "agg_welch_anova",
    # <=4-row chosen-center broadcasts per seeding round
    "sim_quantizer_balance_audit",
    # 1-row training-vocabulary broadcast (the bigram-ppl shape)
    "llm_bigram_xent_by_source",
    # round-39 wave: 1-row total-tokens broadcast (bin count) under the
    # round-robin deal; the distinct-value and top-100 joins are
    # broadcast EQUI-joins, not BNLJ
    "llm_pack_binfill_balance",
}


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_no_unwhitelisted_nested_loop(spark, name):
    q = all_queries()[name]
    plan = q.fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
    has_bnlj = "BroadcastNestedLoopJoin" in plan or "CartesianProduct" in plan
    if name in _BNLJ_WHITELIST:
        return  # documented broadcast-1-row / bounded-literal pattern
    assert not has_bnlj, (
        f"{name}: unwhitelisted BroadcastNestedLoopJoin/CartesianProduct — "
        "either fix the plan (bin/bucket/broadcast the equi key) or, if this "
        "is a genuine broadcast-1-row pattern, whitelist it WITH the reason"
    )


def _staged_backlog():
    """Every still-pending (name, fn) across the staged backlog modules
    — hygiene applies BEFORE activation, while a fix costs an edit
    instead of an evidence-window slot."""
    import importlib

    out = []
    for mod in (
        "roundeighteen_pending",
        "roundnineteen_pending",
        "roundtwentyone_pending",
        "roundtwentytwo_pending",
        "roundtwentythree_pending",
        "roundtwentyfour_pending",
        "roundtwentyfive_pending",
        "roundtwentysix_pending",
        "roundtwentyseven_pending",
        "roundtwentyeight_pending",
        "roundtwentynine_pending",
        "roundthirty_pending",
    ):
        m = importlib.import_module(f"spotify_data_pipeline_spark.plans.{mod}")
        out.extend((pq.name, pq.fn) for pq in m.PENDING)
    return out


_STAGED = _staged_backlog()


@pytest.mark.parametrize(
    "name,fn", _STAGED, ids=[n for n, _ in _STAGED]
)
def test_no_unwhitelisted_nested_loop_staged(spark, name, fn):
    plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
    has_bnlj = "BroadcastNestedLoopJoin" in plan or "CartesianProduct" in plan
    if name in _BNLJ_WHITELIST:
        return
    assert not has_bnlj, (
        f"staged {name}: unwhitelisted BroadcastNestedLoopJoin/"
        "CartesianProduct — fix before activation (free now, a window "
        "slot later), or whitelist the bounded pattern WITH the reason"
    )
