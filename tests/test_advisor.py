"""operators/advisor.py — the similarity-join path advisor pins the
measured BENCH_r07 crossovers as decisions (VERDICT r07 item 6)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from spotify_data_pipeline_spark.io import load_table
from spotify_data_pipeline_spark.operators.advisor import (
    LOCAL_CROSSOVER_RATIO,
    NETWORK_CROSSOVER_RATIO,
    similarity_join_stats,
    suggest_similarity_join_path,
)

SF_DIR = os.environ.get("ORACLE_SF", "/root/testdata/sf0.001")


def test_decisions_pinned_at_measured_densities():
    """The official BENCH_r07 measurements, as decision inputs:
    base corpus ratio ≈ 3 (naive won 2.0×), dense ×3 ratio ≈ 9 (naive
    still won 1.7×) — both must stay 'naive' on a single node; the
    documented ~10× crossover (ratio ≈ 30) flips to 'prefix'; and any
    of them on a network-bound cluster where candidates exceed the
    corpus-linear overhead recommends 'prefix'."""
    base = {"posting_rows": 377_000, "naive_candidate_pairs": 1_130_536}
    dense3 = {"posting_rows": 1_131_000, "naive_candidate_pairs": 10_189_824}
    crossover = {"posting_rows": 377_000, "naive_candidate_pairs": 11_310_000}
    assert suggest_similarity_join_path(base) == "naive"
    assert suggest_similarity_join_path(dense3) == "naive"
    assert suggest_similarity_join_path(crossover) == "prefix"
    assert suggest_similarity_join_path(base, network_bound=True) == "prefix"
    assert suggest_similarity_join_path(dense3, network_bound=True) == "prefix"


def test_thresholds_keep_measured_ordering():
    """The constants must keep the measured facts true: the dense ×3
    arm (ratio ≈ 9, naive won on wall-time) sits BELOW the local
    crossover and ABOVE the network one."""
    dense_ratio = 10_189_824 / 1_131_000
    assert NETWORK_CROSSOVER_RATIO < dense_ratio < LOCAL_CROSSOVER_RATIO


def test_stats_pass_on_documents(spark):
    """The stats pass is exact: naive_candidate_pairs equals the ROW
    count of the posting self-join (a pair sharing k shingles counts k
    times — the size of the exchange the naive path shuffles, which is
    the cost the advisor models), density_ratio is their quotient."""
    docs = load_table(spark, SF_DIR, "documents").limit(200)
    stats = similarity_join_stats(docs)
    assert stats["posting_rows"] > 0
    # independent check: explode + self-join pair count (tiny corpus)
    from spotify_data_pipeline_spark.operators.dedup import shingle_hash_sets

    sh = shingle_hash_sets(docs, "doc_id", "text", 3).select(
        "doc_id", F.explode("hset").alias("sh")
    )
    pairs = (
        sh.select(F.col("doc_id").alias("a"), "sh")
        .join(sh.select(F.col("doc_id").alias("b"), "sh"), "sh")
        .where(F.col("a") < F.col("b"))
        .count()
    )
    assert stats["naive_candidate_pairs"] == pairs
    want = round(pairs / stats["posting_rows"], 3)
    assert stats["density_ratio"] == want
    assert suggest_similarity_join_path(stats) in ("naive", "prefix")


def test_auto_pairs_both_paths_identical(spark):
    """The auto dispatcher's two candidate paths return the SAME exact
    pair set (the prefix filter is lossless), and the chosen path
    matches the advisor's decision on the corpus stats."""
    from spotify_data_pipeline_spark.operators.advisor import similarity_pairs_auto
    from spotify_data_pipeline_spark.operators.ppjoin import prefix_filter_pairs

    docs = load_table(spark, SF_DIR, "documents").limit(300)
    path, pairs = similarity_pairs_auto(docs)
    stats = similarity_join_stats(docs)
    assert path == suggest_similarity_join_path(stats)

    got = {
        (r.id_a, r.id_b): (r.n_common, r.n_a, r.n_b, r.jaccard_ppm)
        for r in pairs.collect()
    }
    prefix = {
        (r.id_a, r.id_b): (r.n_common, r.n_a, r.n_b, r.jaccard_ppm)
        for r in prefix_filter_pairs(docs).collect()
    }
    assert got == prefix and got  # non-vacuous: duplicates exist at 0.6


def test_dict_with_precomputed_ratio():
    assert suggest_similarity_join_path({"density_ratio": 29.9}) == "naive"
    assert suggest_similarity_join_path({"density_ratio": 30.0}) == "prefix"
    assert (
        suggest_similarity_join_path({"density_ratio": 2.0}, network_bound=True)
        == "prefix"
    )
    assert (
        suggest_similarity_join_path({"density_ratio": 1.9}, network_bound=True)
        == "naive"
    )
