"""Exact fuzzy (edit-distance) self-join via prefix filtering.

Entity-resolution / record-linkage primitive: all pairs of rows whose
strings are within Levenshtein distance ``max_dist`` — EXACTLY, at
corpus scale, without the all-pairs comparison. The composition is the
classic similarity-join stack from the literature (Gravano et al.
VLDB'01 q-gram count filtering; Chaudhuri, Ganti & Kaushik ICDE'06
prefix filtering; Bayardo, Ma & Srikant WWW'07 frequency-ordered
prefixes), re-expressed as DataFrame ops:

1. Each string's DISTINCT q-grams; one edit operation can destroy at
   most ``q`` grams, so strings with ed ≤ d share all but ≤ q·d grams.
2. Order every string's grams by GLOBAL frequency ascending (ties by
   gram text): its PREFIX is the first q·d + 1 grams. Two strings with
   ed ≤ d must share a gram within their prefixes — if the q·d + 1
   rarest grams of ``a`` all miss ``b``'s gram set, then ``b`` lacks
   > q·d of ``a``'s grams, contradiction. Rare-first ordering keeps
   hot grams (shared brand prefixes, stopword fragments) OUT of the
   candidate join — the skew mitigation is built into the algorithm,
   not bolted on.
3. Candidates (pairs sharing a prefix gram, id_a < id_b, distinct) are
   verified with the built-in ``levenshtein`` after an
   ``abs(len_a − len_b) ≤ d`` pre-filter. All JVM-side.

The prefix guarantee needs > q·d grams, i.e. strings of at least
``q·(d+1)`` chars. Shorter strings fall back to LENGTH-BAND blocking:
a short string (len ≤ T = q·(d+1) − 1) can only pair with strings of
len ≤ T + d, so that small slice self-joins on an advertised length
key (each string also advertises lengths len−d..len+d on one side) and
verifies exactly. The two blocks partition the pair space (a pair is
short iff its MIN length ≤ T), so their union is the exact answer.

Scale shape: shuffles on gram keys (≈ len·bytes per string) and id
keys; prefix join fan-out is bounded by the frequency of the q·d + 1
RAREST grams per string; the short block is |short slice|² in the
worst case — fine when shorts are rare (document corpora), documented
as the honest caveat for degenerate all-short inputs. No crossJoin,
no BNLJ (plan-asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["fuzzy_self_join"]


def _grams(df: DataFrame, id_col: str, s_col: str, q: int) -> DataFrame:
    """(id, _g): distinct q-grams per string."""
    return (
        df.select(
            id_col,
            F.explode(
                F.sequence(F.lit(1), F.length(s_col) - F.lit(q - 1))
            ).alias("_p"),
            F.col(s_col).alias("_s"),
        )
        .select(id_col, F.expr(f"substring(_s, _p, {q})").alias("_g"))
        .distinct()
    )


def fuzzy_self_join(
    df: DataFrame,
    id_col: str,
    s_col: str,
    max_dist: int = 1,
    q: int = 3,
) -> DataFrame:
    """(id_a, id_b, dist): every unordered pair (id_a < id_b) with
    ``levenshtein(s_a, s_b) <= max_dist``. Exact (both blocks verified
    with the true distance; candidate generation provably complete)."""
    d = max_dist
    t_short = q * (d + 1) - 1  # max len with <= q*d grams

    strings = df.select(
        F.col(id_col).alias("_id"),
        F.col(s_col).alias("_str"),
        F.length(s_col).alias("_len"),
    )

    # ---- long block: prefix filtering --------------------------------
    longs = strings.where(F.col("_len") > t_short)
    grams = _grams(
        longs.select(F.col("_id").alias(id_col), F.col("_str").alias(s_col)),
        id_col,
        s_col,
        q,
    )
    freq = grams.groupBy("_g").agg(F.count("*").alias("_f"))
    w = Window.partitionBy(id_col).orderBy("_f", "_g")
    prefix = (
        grams.join(freq, "_g")
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= q * d + 1)
        .select(F.col(id_col).alias("_pid"), "_g")
    )
    long_cands = (
        prefix.alias("a")
        .join(prefix.alias("b"), "_g")
        .where(F.col("a._pid") < F.col("b._pid"))
        .select(F.col("a._pid").alias("_ida"), F.col("b._pid").alias("_idb"))
        .distinct()
    )

    # ---- short block: length-band blocking ---------------------------
    # pairs whose MIN length <= t_short; the partner is <= t_short + d.
    near_shorts = strings.where(F.col("_len") <= t_short + d)
    advertise = near_shorts.select(
        F.col("_id").alias("_ida"),
        F.explode(
            F.sequence(F.col("_len") - F.lit(d), F.col("_len") + F.lit(d))
        ).alias("_lk"),
        F.col("_len").alias("_la"),
    )
    probe = near_shorts.select(
        F.col("_id").alias("_idb"),
        F.col("_len").alias("_lk"),
        F.col("_len").alias("_lb"),
    )
    short_cands = (
        advertise.join(probe, "_lk")
        .where(
            (F.col("_ida") < F.col("_idb"))
            # block membership: the pair's min length must be short
            & (F.least("_la", "_lb") <= t_short)
        )
        .select("_ida", "_idb")
        .distinct()
    )

    # ---- verify ------------------------------------------------------
    cands = long_cands.unionByName(short_cands)  # blocks are disjoint
    sa = strings.select(
        F.col("_id").alias("_ida"), F.col("_str").alias("_sa"), F.col("_len").alias("_la2")
    )
    sb = strings.select(
        F.col("_id").alias("_idb"), F.col("_str").alias("_sb"), F.col("_len").alias("_lb2")
    )
    return (
        cands.join(sa, "_ida")
        .join(sb, "_idb")
        .where(F.abs(F.col("_la2") - F.col("_lb2")) <= d)
        .withColumn("dist", F.levenshtein("_sa", "_sb").cast("long"))
        .where(F.col("dist") <= d)
        .select(
            F.col("_ida").alias("id_a"),
            F.col("_idb").alias("id_b"),
            "dist",
        )
    )
