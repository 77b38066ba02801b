"""Zero-extra-scan pipeline metrics via ``DataFrame.observe``.

The data-quality operators in ``operators/constraints.py`` answer
"is this table valid?" with a dedicated aggregation job. This module
answers the OPERATIONAL version — "what flowed through this pipeline
run?" — without any extra job at all: ``DataFrame.observe`` attaches
named aggregate expressions that Spark evaluates as a side effect of
whatever action the caller was already running (the mechanism behind
Delta Live Tables expectations and Spark's own
``observedMetrics``).

Why this matters at 100 TB: the naive way to log "rows written, nulls
seen, max event time" after a job is a second pass over the output —
doubling the scan bill. ``observe`` rides the existing pass; its cost
is one accumulator per metric.

Contract notes (each pinned in tests/test_observability.py):

- Metrics materialize only AFTER an action; reading them before one
  raises (we surface Spark's own error rather than masking it).
- Only aggregate expressions are legal; non-aggregates fail at
  ``observe`` time (fail-loud, like the constraints module). DISTINCT
  aggregates are also rejected by Spark (CollectMetrics must be
  mergeable per-partition, and exact distinct is not) —
  ``approx_count_distinct`` is the supported spelling, the same
  exact-vs-mergeable tradeoff behind the engine's HLL/KMV sketches.
- The observation is tied to ONE DataFrame — re-observing a new plan
  needs a fresh ``Observation`` (enforced by Spark; test-pinned).
- Batch only: streaming queries use the listener-based API instead
  (``streaming/events.py`` owns that path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

__all__ = ["observed_quality", "QUALITY_METRICS"]

#: metric-name -> builder(col) used by observed_quality's default set
QUALITY_METRICS = {
    "n_rows": lambda c: F.count(F.lit(1)).alias("n_rows"),
    "n_null": lambda c: F.sum(F.col(c).isNull().cast("long")).alias("n_null"),
    "min": lambda c: F.min(c).alias("min"),
    "max": lambda c: F.max(c).alias("max"),
}


def observed_quality(
    df: DataFrame,
    watch_col: str,
    extra: dict[str, Column] | None = None,
) -> tuple[DataFrame, Observation]:
    """Attach the standard quality counters for ``watch_col`` (row
    count, null count, min/max) plus any ``extra`` named aggregates.

    Returns ``(df_observed, observation)``; run any action on
    ``df_observed`` (or a derivative), then read
    ``observation.get`` — a dict of metric name -> value — at zero
    additional scan cost.
    """
    metrics = [build(watch_col) for build in QUALITY_METRICS.values()]
    if extra:
        # an extra named like a default ("n_rows", "n_null", "min",
        # "max") would produce two aggregates under one alias and the
        # Observation dict would silently keep only one of them — fail
        # loudly instead (deferred from round 7, landed round 8 once
        # the module left every evidence-pin closure)
        collisions = sorted(set(extra) & set(QUALITY_METRICS))
        if collisions:
            raise ValueError(
                f"extra metric name(s) {collisions} collide with the "
                "default quality metrics; rename them"
            )
        metrics.extend(col.alias(name) for name, col in extra.items())
    obs = Observation()
    return df.observe(obs, *metrics), obs
