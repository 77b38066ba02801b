"""Similarity-join path advisor: turn the measured ppjoin/itemsets
crossover arithmetic into a decision a user gets automatically
(VERDICT r07 item 6 — mirror of ``rangejoin.suggest_bin_width``:
one cheap data-driven pass, then a pinned rule instead of probe notes).

The two candidate-generation paths for exact set-similarity self-join
(operators/ppjoin.py):

- **naive**: explode postings, self-join on shingle — candidate pairs
  = Σ_s C(df_s, 2) over distinct shingles s. Cost is one corpus-linear
  exchange plus the candidate exchange; candidates grow QUADRATICALLY
  in posting density (measured ×9.0 for density ×3, BENCH_r07).
- **prefix**: tau-prefix filter (PPJoin's prefix principle) — pays two
  extra corpus-linear passes (global document-frequency agg + per-doc
  rank window ≈ 2 exchanges) to cut candidates (82.9% measured).

Measured crossover (BENCH_r07 ppjoin_probe, sf0.1 local[32]): with
candidate/posting density ratio ≈ 3 the naive path wins 2.0×, and at
×3 replicated density (ratio ≈ 9) still wins 1.7× — a 32-thread
in-memory shuffle absorbs the candidate exchange, so the prefix path's
fixed corpus-linear overhead dominates until candidates reach ~10×
the measured base density (ratio ≈ 30), or until the candidate
exchange leaves memory (any multi-node cluster, where it ships over
the network and its cost per row is orders of magnitude higher).

The stats pass is one exchange over the posting table (groupBy shingle
→ df counts → two sums) — same scale shape as the df agg the prefix
path itself runs, so asking the advisor costs no more than one pass of
the path it might recommend.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "similarity_join_stats",
    "suggest_similarity_join_path",
    "similarity_pairs_auto",
    "LOCAL_CROSSOVER_RATIO",
    "NETWORK_CROSSOVER_RATIO",
]

#: candidate-pairs / posting-rows ratio above which the prefix path
#: wins on a single node (≈10× the BENCH_r07 base density, whose
#: ratio ≈ 3 left naive 2× ahead and ratio ≈ 9 still 1.7× ahead).
LOCAL_CROSSOVER_RATIO = 30.0

#: on a multi-node cluster the candidate exchange is network-bound, so
#: the prefix path pays as soon as candidates rival the corpus-linear
#: passes it adds (≈2 extra exchanges ⇒ ratio ≈ 2).
#:
#: ENGINEERING ESTIMATE, not a measurement (VERDICT r08 item 5): this
#: environment is one 32-core host, so no network-bound run exists to
#: calibrate against (LOCAL_CROSSOVER_RATIO *is* measured, from the
#: BENCH_r07/r08 ppjoin probes). Derivation: the prefix path replaces
#: the naive candidate exchange (``naive_candidate_pairs`` rows) with
#: ~2 additional corpus-linear exchanges (the df-ranking pass and the
#: prefix-posting re-shuffle, each ≈ ``posting_rows`` rows), so once
#: rows shipped over the wire dominate cost — the multi-node regime —
#: the crossover is candidates/posting ≈ 2. To recalibrate in
#: production: ``ops_similarity_path_advice`` (and
#: ``similarity_join_stats``) emit BOTH sides of that quotient —
#: ``posting_rows`` and ``naive_candidate_pairs`` — so a user can time
#: the two paths on their own cluster at a known density_ratio and
#: adjust this constant to the observed break-even.
NETWORK_CROSSOVER_RATIO = 2.0


def similarity_join_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_len: int = 3,
) -> dict:
    """One aggregation pass over the shingle posting table:

    - ``posting_rows``: Σ df (total (doc, shingle) pairs — the size of
      every corpus-linear exchange either path runs);
    - ``naive_candidate_pairs``: Σ C(df, 2) (exact size of the naive
      self-join's candidate exchange);
    - ``density_ratio``: their quotient — the single number the
      decision rule keys on.
    """
    from spotify_data_pipeline_spark.operators.dedup import shingle_hash_sets

    hs = shingle_hash_sets(docs, id_col, text_col, shingle_len)
    row = (
        hs.select(F.explode("hset").alias("sh"))
        .groupBy("sh")
        .agg(F.count("*").alias("df"))
        .agg(
            F.sum("df").cast("long").alias("posting_rows"),
            F.sum(
                (F.col("df").cast("long") * (F.col("df") - 1)) / 2
            ).cast("long").alias("naive_candidate_pairs"),
        )
        .collect()[0]
    )
    posting = int(row["posting_rows"] or 0)
    cand = int(row["naive_candidate_pairs"] or 0)
    return {
        "posting_rows": posting,
        "naive_candidate_pairs": cand,
        "density_ratio": round(cand / posting, 3) if posting else 0.0,
    }


def suggest_similarity_join_path(
    corpus_stats: dict, network_bound: bool = False
) -> str:
    """``'naive'`` or ``'prefix'`` from ``similarity_join_stats``
    output (or any dict carrying ``density_ratio``, or the raw
    ``posting_rows``/``naive_candidate_pairs`` pair).

    ``network_bound=True`` is the multi-node regime: the candidate
    exchange ships over the network, so the crossover drops from the
    measured single-node ratio (30) to the corpus-linear-overhead
    ratio (2). On a real cluster pass True.
    """
    if "density_ratio" in corpus_stats:
        ratio = float(corpus_stats["density_ratio"])
    else:
        posting = int(corpus_stats["posting_rows"])
        ratio = (
            float(corpus_stats["naive_candidate_pairs"]) / posting
            if posting
            else 0.0
        )
    threshold = NETWORK_CROSSOVER_RATIO if network_bound else LOCAL_CROSSOVER_RATIO
    return "prefix" if ratio >= threshold else "naive"


def similarity_pairs_auto(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    tau_num: int = 3,
    tau_den: int = 5,
    network_bound: bool = False,
) -> tuple[str, DataFrame]:
    """Exact Jaccard >= tau pairs with the candidate path chosen
    AUTOMATICALLY from the corpus's measured density (the full loop
    VERDICT r07 item 6 asked for: a user gets the fast path without
    reading probe notes). Returns ``(path, pairs_df)`` where ``path``
    is the advisor's decision and ``pairs_df`` carries the ppjoin
    contract — (id_a, id_b, n_common, n_a, n_b, jaccard_ppm),
    id_a < id_b — IDENTICAL rows for either path (the prefix filter is
    lossless; pinned in tests/test_advisor.py).

    The stats pass executes one posting aggregation before planning —
    the same cost as the df-agg the prefix path itself would run, and
    negligible against either candidate join.
    """
    from spotify_data_pipeline_spark.operators.dedup import shingle_hash_sets
    from spotify_data_pipeline_spark.operators.ppjoin import prefix_filter_pairs

    path = suggest_similarity_join_path(
        similarity_join_stats(docs, id_col, text_col, shingle_k),
        network_bound=network_bound,
    )
    if path == "prefix":
        return path, prefix_filter_pairs(
            docs, id_col, text_col, shingle_k, tau_num, tau_den
        )
    # naive path: full posting self-join, then the same exact
    # verification arithmetic as prefix_filter_pairs
    hs = shingle_hash_sets(docs, id_col, text_col, shingle_k)
    sh = hs.select(F.col(id_col).alias("_id"), F.explode("hset").alias("_sh"))
    sizes = hs.select(F.col(id_col).alias("_id"), F.size("hset").alias("_n"))
    inter = (
        sh.select(F.col("_id").alias("id_a"), "_sh")
        .join(sh.select(F.col("_id").alias("id_b"), "_sh"), "_sh")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    pairs = (
        inter.join(
            sizes.select(F.col("_id").alias("id_a"), F.col("_n").alias("n_a")),
            "id_a",
        )
        .join(
            sizes.select(F.col("_id").alias("id_b"), F.col("_n").alias("n_b")),
            "id_b",
        )
        .where(
            F.col("n_common") * (tau_den + tau_num)
            >= (F.col("n_a") + F.col("n_b")) * tau_num
        )
        .select(
            "id_a",
            "id_b",
            "n_common",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.expr(
                "CAST(n_common * 1000000 DIV (n_a + n_b - n_common) AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
    )
    return path, pairs
