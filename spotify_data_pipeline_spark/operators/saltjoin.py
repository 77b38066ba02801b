"""Salted equi-join: hot-key skew mitigation with provably unchanged
results.

The scale problem: an equi-join shuffles both sides on the join key,
so a power-law key (one artist with 10⁸ plays, one user with 10⁷
events) lands an entire hot key's rows in ONE reduce task — the
classic straggler that turns a 1000-executor join into a single-task
wait. Spark's AQE skew-join (``spark.sql.adaptive.skewJoin``) splits
oversized SORT-MERGE partitions at runtime, but it only triggers on
the shapes it recognizes (post-shuffle SMJ partitions, thresholds
met); the manual device below is the portable form that also covers
shuffled-hash joins, pre-aggregation fan-ins, and engines/configs
where AQE is off — and it composes with ``operators/skew.py``'s
``ops_skew_report``, which computes exactly the salt factor this
operator takes (ceil(share/uniform)).

The device (standard practice, e.g. Spark docs' "salting" guidance and
the join-skew literature — Walton et al. SIGMOD'91 call it the
"scatter" half of partition tuning):

- the FACT side gains ``_salt = pmod(xxhash64(unique cols), S)`` — a
  deterministic, non-null spreader that splits every key's rows S ways
  (deterministic so re-runs and retries place rows identically; any
  non-null expression works because the salt cancels in the result);
- the DIM side is replicated S× in-plan (``explode(sequence(0,S-1))``
  — a literal-range explode, not a join), one copy per salt value;
- the join runs on (key, _salt): each formerly-hot reduce task becomes
  S tasks of 1/S the rows, at the cost of shipping the dim S times.

Result equality with the plain join is EXACT and unconditional — every
fact row meets exactly the one dim copy carrying its salt — which is
why the staged ``join_salted_skew`` query can hash-match a plain-join
DuckDB oracle (the optimized-vs-naive proof pattern:
``join_bloom_semireduction`` precedent). Cost model for choosing S at
100 TB: dim bytes × S must stay well under the fact side's shuffle
volume; hot-key share × fact rows / S should fit one task's memory —
both inputs come straight from ``ops_skew_report``.

Null keys: a NULL join key never matches in an equi join, so its salt
value is irrelevant; xxhash64 maps NULL inputs to the seed, keeping
``_salt`` itself non-null (a NULL salt would silently drop matched
rows — guarded by construction, and pinned in tests with NULL-key
rows on both sides).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_equi_join"]


def salted_equi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salts: int,
    spread_on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join ``fact`` to ``dim`` on ``fact_key = dim_key`` with the salt
    device: ``dim`` is replicated ``n_salts``×, ``fact`` rows spread by
    ``pmod(xxhash64(*spread_on), n_salts)``. Output columns = fact
    columns + dim columns (both key columns retained, salt dropped) —
    a bag-equal twin of ``fact.join(dim, fact[k]==dim[k], how)``.

    ``spread_on`` should be column(s) (near-)unique per fact row (an
    id, a line number) so the hot key's rows spread evenly; a
    low-cardinality spreader degrades back toward the unsalted layout
    but never changes the result. ``how`` supports 'inner' and 'left'
    (fact-preserving); right/full would need the mirrored device on
    the dim side.
    """
    if n_salts < 1:
        raise ValueError("n_salts must be >= 1")
    if how not in ("inner", "left"):
        raise ValueError("salted_equi_join supports how='inner'|'left'")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in spread_on]), F.lit(n_salts))
    f = fact.withColumn("_salt", salt.cast("int"))
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    cond = (f[fact_key] == d[dim_key]) & (f["_salt"] == d["_salt"])
    # hint("merge") pins a sort-merge join: broadcasting the replicated
    # dim would silently undo the demonstration (and is exactly what is
    # impossible in the regime this operator exists for).
    joined = f.join(d.hint("merge"), cond, how)
    return joined.drop(f["_salt"]).drop(d["_salt"])
