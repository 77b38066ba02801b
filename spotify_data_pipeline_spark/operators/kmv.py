"""KMV (k-minimum-values) distinct sketch — the mergeable summary
whose estimate is CROSS-ENGINE EXACT.

Fifth mergeable summary (HLL ``incremental.py``, MG ``heavyhitters.py``,
HDR ``quantiles.py``, CMS ``countmin.py``) and the one that closes a
gap the others can't: HLL/CMS estimates ride xxhash64, so their
declared queries are rows-only; KMV keys on **md5** — which DuckDB
computes identically — so the ENTIRE sketch (selection, merge, and the
(k−1)/h_k estimator) is replicable in a SQL oracle. The same device as
the passage-dedup fingerprints: choose the hash both engines share and
the approximation itself becomes driver-provable.

Theory (Bar-Yossef et al. RANDOM'02; Beyer et al. SIGMOD'07 for the
unbiased (k−1)/h_k form): hash distinct values uniformly into [0, 1);
keep the k smallest hashes per group. If fewer than k distinct values
exist the sketch IS the exact distinct count; otherwise the k-th
smallest hash h_k estimates density ⇒ D̂ = (k−1)/h_k, with relative
error ~1/√(k−2). The k-min SET is mergeable exactly: the k smallest
of a union are contained in the union of per-part k-min sets, so
merge = union → dedup → re-take k smallest, BIT-equal to a direct
build over the concatenated input for any split/order (tested).

The hash: first 13 hex chars of md5 (52 bits — exact in a long AND in
a double, so the division is the same IEEE value in both engines),
mapped via an explicit positional polynomial both engines evaluate
identically. Collisions: 52-bit space; for the ~10⁵-vocabulary scales
the driver compares, collision probability is ~10⁻⁶ per pair-set and —
crucially — IDENTICAL on both sides, so parity cannot break even if
one occurs (both engines dedup on the same hex prefix).

Scale shape: build is distinct → per-group top-k-by-hash (rank window
over the DISTINCT-value table, the MG shape) → bounded array state;
merge explodes k-row arrays only. One shuffle each, state k strings
per group.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["kmv_build", "kmv_merge", "kmv_estimate", "hash_frac_expr"]

_STATE = "kmv_state"  # array<string>: the k smallest 13-hex-char prefixes, ascending
_K = "kmv_k"  # the build capacity, carried in the state so misuse fails loudly

_HEX = "0123456789abcdef"
_PREFIX_LEN = 13  # 52 bits: exact in long and double


def _hash13(value: Column) -> Column:
    """Lowercase 13-hex-char md5 prefix of the value's string form."""
    return F.substring(F.md5(value.cast("string")), 1, _PREFIX_LEN)


def hash_frac_expr(col: str) -> Column:
    """The hex prefix in ``col`` as an exact fraction in [0, 1):
    positional polynomial → 52-bit integer → divide by 16^13. Both
    steps are exact doubles, bit-identical to the SQL-oracle twin."""
    num: Column = F.lit(0).cast("long")
    for i in range(_PREFIX_LEN):
        digit = F.instr(F.lit(_HEX), F.substring(F.col(col), i + 1, 1)) - 1
        num = num * 16 + digit.cast("long")
    return num.cast("double") / float(16**_PREFIX_LEN)


def kmv_build(
    df: DataFrame, groups: Sequence[str], value_col: str, k: int = 64
) -> DataFrame:
    """(groups..., kmv_state): the k smallest distinct-value hashes per
    group, ascending. NULL values are not counted (SQL convention)."""
    distinct = (
        df.select(*groups, F.col(value_col).cast("string").alias("_v"))
        .where(F.col("_v").isNotNull())
        .select(*groups, _hash13(F.col("_v")).alias("_h"))
        .distinct()  # distinct VALUES collapse to distinct hashes
    )
    w = Window.partitionBy(*[F.col(g) for g in groups]).orderBy("_h")
    kept = distinct.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k)
    return kept.groupBy(*groups).agg(
        F.array_sort(F.collect_list("_h")).alias(_STATE),
        F.lit(k).cast("int").alias(_K),
    )


def _guard_k(df: DataFrame, k: int) -> DataFrame:
    """In-plan capacity check (the cms_merge device): any state row
    built with a different k than the caller claims fails the job —
    a mismatched k silently truncates minima (merge) or returns the
    capacity as an 'exact' count (estimate). Expressed as a FILTER so
    column pruning cannot optimize the raise_error away."""
    chk = F.when(
        F.col(_K) != k,
        F.raise_error(
            F.concat(
                F.lit("kmv: state built with k="),
                F.col(_K).cast("string"),
                F.lit(f" but called with k={k}"),
            )
        ).cast("int"),
    ).otherwise(F.lit(k))
    return df.where(chk == k)


def kmv_merge(groups: Sequence[str], k: int, *states: DataFrame) -> DataFrame:
    """Union → dedup → re-take the k smallest: BIT-equal to a build
    over the concatenated inputs for any split/order. States built
    with a different k fail in-plan."""
    if not states:
        raise ValueError("need at least one state")
    unioned = states[0]
    for s in states[1:]:
        unioned = unioned.unionByName(s)
    exploded = (
        _guard_k(unioned, k)
        .select(*groups, F.explode(_STATE).alias("_h"))
        .distinct()
    )
    w = Window.partitionBy(*[F.col(g) for g in groups]).orderBy("_h")
    kept = exploded.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k)
    return kept.groupBy(*groups).agg(
        F.array_sort(F.collect_list("_h")).alias(_STATE),
        F.lit(k).cast("int").alias(_K),
    )


def kmv_estimate(state: DataFrame, groups: Sequence[str], k: int = 64) -> DataFrame:
    """(groups..., n_sample, est_distinct): exact count when the group
    holds fewer than k distinct values (the sketch saw everything),
    else the unbiased (k−1)/h_k estimator. ``est_distinct`` is rounded
    half-up to 4dp with the engine-shared floor formula."""
    n = F.size(F.col(_STATE))
    kth = F.try_element_at(F.col(_STATE), F.lit(k))  # NULL below capacity
    frac = (
        _guard_k(state, k)
        .select(*groups, n.alias("n_sample"), kth.alias("_kth"))
        .withColumn("_f", hash_frac_expr("_kth"))
    )
    est = F.when(F.col("n_sample") < k, F.col("n_sample").cast("double")).otherwise(
        (k - 1) / F.col("_f")
    )
    return frac.select(
        *groups,
        F.col("n_sample").cast("long").alias("n_sample"),
        (F.floor(est * 10000 + F.lit(0.5)) / 10000.0).alias("est_distinct"),
    )
