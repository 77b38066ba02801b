"""Bloom filter: mergeable set-membership sketch.

Completes the mergeable-summary family (HLL distinct in
``incremental.py``, Misra–Gries top-k in ``heavyhitters.py``, HDR
quantiles in ``quantiles.py``, Count-Min frequencies in
``countmin.py``): the Bloom filter (Bloom, CACM 1970) answers "was
this value EVER present" in bounded space with NO false negatives and
a tunable false-positive rate — the join-pruning / needs-reprocessing
primitive. At 100 TB the canonical use is semi-join reduction: build a
filter over the small(er) side's keys once, broadcast it, and drop
non-matching fact rows BEFORE the shuffle (what Spark's runtime
``bloomFilter`` rewrite does internally; this operator is the explicit,
persistable, MERGEABLE form a warehouse can store next to each
partition and OR together across days).

State: one array<long> of ``m_bits/64`` words per group. Build is an
explode(k) → bit-position agg → word pivot — map-side combinable, one
shuffle. Merge is bitwise OR per word — bit-equal to a rebuild over
the concatenated inputs for any split/order (tested, same property as
CMS/HDR). Membership probes evaluate k xxhash64 bit tests per value,
all codegen'd.

Guarantees (standard): no false negatives ever; false-positive rate
≈ (1 − e^(−k·n/m))^k, minimized at k = (m/n)·ln 2. xxhash64 row
hashes with the probe index folded in (same Carter–Wegman device as
``countmin.py``); like the other xxhash64 sketches the bit pattern is
not SQL-oracle-replicable, so the guarantees are pytest-pinned
(property suite) — the established rows-only/pytest split.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_build", "bloom_merge", "bloom_might_contain"]

_STATE = "bloom_state"  # array<long>, little-endian words of the bit array
_N = "bloom_n"  # inserted (non-NULL) rows


def _bit_sql(value_expr: str, probe: int, m_bits: int) -> str:
    """Non-negative bit index of ``value_expr`` under probe ``probe``."""
    h = f"xxhash64(concat('b{probe}:', {value_expr}))"
    return f"((({h} % {m_bits}) + {m_bits}) % {m_bits})"


def bloom_build(
    df: DataFrame,
    groups: Sequence[str],
    value_col: str,
    m_bits: int = 8192,
    k: int = 6,
) -> DataFrame:
    """(groups..., bloom_state, bloom_n): per-group Bloom filter over
    ``value_col``. NULLs are not inserted (SQL aggregate convention —
    and the probe side mirrors it: NULL probes return false)."""
    if m_bits % 64 != 0:
        raise ValueError("m_bits must be a multiple of 64")
    n_words = m_bits // 64
    bits = F.explode(
        F.array(*[F.expr(_bit_sql("_v", p, m_bits)) for p in range(k)])
    ).alias("_bit")
    per_word = (
        df.select(*groups, F.col(value_col).cast("string").alias("_v"))
        .where(F.col("_v").isNotNull())
        .select(*groups, bits)
        .withColumn("_word", F.expr("CAST(_bit div 64 AS INT)"))
        .withColumn("_mask", F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_bit % 64 AS INT))"))
        .groupBy(*groups, "_word")
        # bit_or folds all masks of a word; map-side combinable
        .agg(F.expr("bit_or(_mask)").alias("_wv"))
    )
    n_rows = (
        df.select(*groups, F.col(value_col).cast("string").alias("_v"))
        .where(F.col("_v").isNotNull())
        .groupBy(*groups)
        .agg(F.count("*").alias(_N))
    )
    packed = (
        per_word.groupBy(*groups)
        .agg(F.map_from_arrays(F.collect_list("_word"), F.collect_list("_wv")).alias("_m"))
        .select(
            *groups,
            F.expr(
                f"transform(sequence(0, {n_words - 1}),"
                " i -> coalesce(element_at(_m, i), CAST(0 AS LONG)))"
            ).alias(_STATE),
        )
    )
    return packed.join(n_rows, on=list(groups))


def bloom_merge(groups: Sequence[str], *states: DataFrame) -> DataFrame:
    """Bitwise-OR merge: bit-equal to a build over the concatenated
    inputs for any split/order. Mismatched m_bits fails in-plan (same
    policy as cms_merge)."""
    if not states:
        raise ValueError("need at least one state")
    unioned = states[0]
    for s in states[1:]:
        unioned = unioned.unionByName(s)
    size_check = unioned.select(F.size(_STATE).alias("_sz")).agg(
        F.min("_sz").alias("_szmin"), F.max("_sz").alias("_szmax")
    )
    orred = (
        unioned.select(*groups, F.posexplode(_STATE).alias("_word", "_wv"))
        .groupBy(*groups, "_word")
        .agg(F.expr("bit_or(_wv)").alias("_wv"))
        .groupBy(*groups)
        .agg(
            F.map_from_arrays(F.collect_list("_word"), F.collect_list("_wv")).alias("_m"),
            (F.max("_word") + 1).alias("_len"),
        )
        .crossJoin(F.broadcast(size_check))
        .select(
            *groups,
            F.expr(
                "CASE WHEN _szmin <> _szmax THEN"
                " raise_error(concat('bloom_merge: incompatible filter sizes ',"
                " _szmin, ' vs ', _szmax, ' — all states must share m_bits'))"
                " ELSE transform(sequence(0, CAST(_len AS INT) - 1),"
                " i -> coalesce(element_at(_m, i), CAST(0 AS LONG))) END"
            ).alias(_STATE),
        )
    )
    ns = unioned.groupBy(*groups).agg(F.sum(_N).alias(_N))
    return orred.join(ns, on=list(groups))


def bloom_might_contain(
    state: DataFrame,
    values: DataFrame,
    groups: Sequence[str],
    value_col: str,
    m_bits: int = 8192,
    k: int = 6,
) -> DataFrame:
    """``values``' columns + ``might_contain`` (boolean): true iff all
    k probe bits are set — never false for an inserted value. NULL
    probes return false (build never inserts NULLs — the cms_estimate
    NULL policy applied to membership). ``m_bits``/``k`` must match the
    build. Broadcast the (tiny) state at the call site for the
    semi-join-reduction pattern."""
    tests = [
        F.expr(
            f"element_at({_STATE}, CAST({_bit_sql('_v', p, m_bits)} div 64 AS INT) + 1)"
            f" & shiftleft(CAST(1 AS BIGINT), CAST({_bit_sql('_v', p, m_bits)} % 64 AS INT))"
        )
        != 0
        for p in range(k)
    ]
    hit = tests[0]
    for t in tests[1:]:
        hit = hit & t
    v = values.withColumn("_v", F.col(value_col).cast("string"))
    return (
        v.join(state.select(*groups, _STATE), on=list(groups))
        .withColumn(
            "might_contain",
            F.when(F.col("_v").isNull(), F.lit(False)).otherwise(hit),
        )
        .drop(_STATE, "_v")
    )
