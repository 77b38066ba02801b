"""Prefix-filtered set-similarity self-join (All-Pairs / PPJoin
candidate pruning) — exact Jaccard pairs WITHOUT the all-pairs or
full-posting-list candidate space.

Reference point: Bayardo et al. WWW'07 (All-Pairs) and Xiao et al.
WWW'08 (PPJoin). The engine already has the NAIVE exact sparse join
(``operators/dedup.ngram_jaccard_pairs``: every pair sharing ANY
shingle is a candidate, hot shingles held down by a document-frequency
cap that turns the result into a lower bound once it bites). The
prefix filter is the principled replacement for that cap: order every
document's shingles by one GLOBAL rarity order (document frequency,
then hash — a total order), keep only each document's first
``p = s - ceil(tau*s) + 1`` shingles as its "prefix", and generate
candidates only from prefix∩prefix. The prefix lemma guarantees zero
recall loss: if |x∩y| >= alpha then the first (sx-alpha+1) of x and
the first (sy-alpha+1) of y share an element under any common total
order; with the length filter tau*sx <= sy (and symmetrically) in the
candidate join, alpha = ceil(tau/(1+tau)*(sx+sy)) >= ceil(tau*sx) and
>= ceil(tau*sy), so the tau-prefix is always long enough. Every
surviving candidate is then verified against the FULL shingle sets
(per-row array intersection — no shuffle), so the result is EXACT (no
cap, no lower-bound caveat) while the candidate join only ever sees
the rarest ~(1-tau) fraction of each posting list — rare-first
ordering systematically keeps stopword-shingles out of prefixes,
which is what the df cap approximated by brute force.

Scale: candidate generation is the standard posting self-join but over
prefixes only; document frequencies come from one aggregation of the
same exploded shingles; the per-doc rank is a window over a ~100-element
partition (the doc's own shingles), never a global sort. tau enters as
an exact rational (tau_num/tau_den) — all thresholds are
cross-multiplied integer comparisons, so the operator is bit-exact and
oracle-replicable over raw shingle strings (hashed-shingle intersection
counts equal raw-shingle counts up to ~2^-32 collisions; the
dedup_ngram_jaccard precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.operators.dedup import shingle_hash_sets

__all__ = ["prefix_filter_pairs", "prefix_candidate_pairs"]


def prefix_candidate_pairs(
    hs: DataFrame,
    id_col: str = "doc_id",
    tau_num: int = 3,
    tau_den: int = 5,
) -> DataFrame:
    """The candidate stage alone (before verification): distinct
    (id_a, id_b) pairs whose tau-prefixes share a shingle and whose
    sizes pass the cross-multiplied length filter. Exposed separately
    so the bench probe can measure the candidate-space reduction
    against the full posting join."""
    sizes = hs.select(F.col(id_col).alias("_id"), F.size("hset").alias("n_sh"))
    sh = hs.select(F.col(id_col).alias("_id"), F.explode("hset").alias("sh"))
    dfc = sh.groupBy("sh").agg(F.count("*").alias("_df"))

    # global rarity order (df, sh) is total (sh unique per shingle);
    # per-doc prefix = first  s - ceil(tau*s) + 1  shingles under it.
    # ceil(tau*s) = (tau_num*s + tau_den - 1) DIV tau_den, s >= 0.
    w = Window.partitionBy("_id").orderBy("_df", "sh")
    ceil_tau_s = F.expr(
        f"CAST((n_sh * {tau_num} + {tau_den - 1}) DIV {tau_den} AS BIGINT)"
    )
    pre = (
        sh.join(dfc, "sh")
        .withColumn("_rk", F.row_number().over(w))
        .join(sizes, "_id")
        .where(F.col("_rk") <= F.col("n_sh") - ceil_tau_s + 1)
        .select("_id", "sh", "n_sh")
    )

    a = pre.select(
        F.col("_id").alias("id_a"), "sh", F.col("n_sh").alias("n_a")
    )
    b = pre.select(
        F.col("_id").alias("id_b"), "sh", F.col("n_sh").alias("n_b")
    )
    cand = (
        a.join(b, "sh")
        .where(
            (F.col("id_a") < F.col("id_b"))
            # length filter: tau <= |y|/|x| <= 1/tau, cross-multiplied
            & (F.col("n_a") * tau_num <= F.col("n_b") * tau_den)
            & (F.col("n_b") * tau_num <= F.col("n_a") * tau_den)
        )
        .select("id_a", "id_b")
        .distinct()
    )
    return cand


def prefix_filter_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    tau_num: int = 3,
    tau_den: int = 5,
) -> DataFrame:
    """All pairs with shingle-set Jaccard >= tau_num/tau_den, exact.

    Output: (id_a, id_b, n_common, n_a, n_b, jaccard_ppm) with
    id_a < id_b; jaccard_ppm = floor(|A∩B| * 1e6 / |A∪B|) — pure
    integer arithmetic end to end.
    """
    if not (0 < tau_num < tau_den):
        raise ValueError("tau must satisfy 0 < tau_num/tau_den < 1")
    hs = shingle_hash_sets(df, id_col, text_col, shingle_k)
    cand = prefix_candidate_pairs(hs, id_col, tau_num, tau_den)

    # verify against the FULL sets: per-row array intersection, exact
    hs_a = hs.select(
        F.col(id_col).alias("id_a"), F.col("hset").alias("_hs_a")
    )
    hs_b = hs.select(
        F.col(id_col).alias("id_b"), F.col("hset").alias("_hs_b")
    )
    verified = (
        cand.join(hs_a, "id_a")
        .join(hs_b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("_hs_a", "_hs_b"))
            .cast("long")
            .alias("n_common"),
            F.size("_hs_a").cast("long").alias("n_a"),
            F.size("_hs_b").cast("long").alias("n_b"),
        )
        # J >= n/d  <=>  d*I >= n*(sa+sb-I)  <=>  (d+n)*I >= n*(sa+sb)
        .where(
            F.col("n_common") * (tau_den + tau_num)
            >= (F.col("n_a") + F.col("n_b")) * tau_num
        )
        .withColumn(
            "jaccard_ppm",
            F.expr(
                "CAST(n_common * 1000000 DIV (n_a + n_b - n_common)"
                " AS BIGINT)"
            ),
        )
    )
    return verified
