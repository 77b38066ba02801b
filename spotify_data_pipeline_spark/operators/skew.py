"""Skew mitigation (SURVEY.md §4.3).

The reference's bridge tables have power-law keys (hot artists appear on
thousands of albums/tracks). At 100 TB a single hot key overwhelms one
reducer. Two mitigations beyond AQE's automatic skew-join splitting:

- ``salted_aggregate``: two-phase aggregation — partial by (key, salt),
  final by key. Works for any algebraic aggregate (sum/count/min/max);
  avg is computed as sum+count.
- ``salted_join``: fact side salted by a deterministic hash, dimension
  side replicated ``salt_factor`` times, equi-join on (key, salt). For
  skewed fact keys against a dimension too large to broadcast.

Both use hash-derived (not random) salts so results are deterministic
and re-runs stable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_AGG_FNS = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
_MERGE_FNS = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],  # out_col -> (fn, in_col)
    salt_factor: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column → (fn, input column), fn ∈
    {sum, count, min, max}. The partial phase spreads each hot key over
    ``salt_factor`` reducers; the final phase merges ``salt_factor``
    rows per key — negligible.
    """
    for out, (fn, _) in aggs.items():
        if fn not in _AGG_FNS:
            raise ValueError(f"unsupported aggregate {fn!r} for {out!r}")

    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_factor))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*[_AGG_FNS[fn](c).alias(out) for out, (fn, c) in aggs.items()])
    )
    final = partial.groupBy(*keys).agg(
        *[_MERGE_FNS[fn](out).alias(out) for out, (fn, _) in aggs.items()]
    )
    return final


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    salt_factor: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the (skewed) fact side, replicate the
    dimension ``salt_factor``×, join on (key, salt).

    Cost model: dimension shuffle volume grows salt_factor×; the hot
    fact key's rows spread over salt_factor reducers. Worth it exactly
    when the dim is small relative to the hot key's row count but too
    big to broadcast.

    Only ``inner`` and ``left`` (outer) joins are supported: the dim
    side is replicated salt_factor×, so right/full joins would emit one
    row per salt replica for unmatched dim keys, and semi/anti
    membership would be evaluated against replicas.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner' or 'left' only, got {how!r} "
            "(dim replication breaks right/full/semi/anti semantics)"
        )
    fact_cols = [c for c in facts.columns]
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact_cols]), F.lit(salt_factor))
    f = facts.withColumn("_salt", salt)
    d = dim.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1))))
    joined = f.join(d, on=[key, "_salt"], how=how)
    return joined.drop("_salt")
