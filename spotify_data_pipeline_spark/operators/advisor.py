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
