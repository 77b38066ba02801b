"""Round-8 staged queries (plans/roundeight_pending.py) get the SAME
driver-shaped oracle check as declared queries — activation later is
registration-only (after the evidence-hash refresh)."""

from __future__ import annotations

import os

import pytest

from spotify_data_pipeline_spark.plans.roundeight_pending import PENDING
from tests.oracle_check import compare, run_oracle

SF_DIR = os.environ.get("ORACLE_SF", "/root/testdata/sf0.001")


# staged queries allowed to be empty at the default sf0.001 (none currently)
_EMPTY_OK = set()


@pytest.mark.parametrize("pq", PENDING, ids=lambda pq: pq.name)
def test_pending_oracle_match(spark, pq):
    result = pq.fn(spark, SF_DIR)
    oracle = run_oracle(pq.oracle, SF_DIR)
    errs = compare(result, oracle)
    assert not errs, f"{pq.name}: " + "; ".join(errs)
    # vacuousness guard (the Q7 / duplicate-screen lesson): an
    # empty-vs-empty oracle match proves nothing, so a staged query
    # must produce rows at this SF unless explicitly allowlisted.
    if pq.name not in _EMPTY_OK:
        assert len(oracle) > 0, f"{pq.name}: vacuous (0 oracle rows) at {SF_DIR}"


def test_pending_all_registered(spark):
    """Round-7 activation completed this module: all 28 round-8 staged
    queries are declared — the 21 new ones ahead of the 7 round-6-
    evidenced siblings (active.py declare sequence), so the evidenced 7
    sit in the tail on their intact r06 pins while the new 21 occupy
    window slots 29-49."""
    from spotify_data_pipeline_spark.plans import all_queries
    from spotify_data_pipeline_spark.plans.active import R8_ACTIVATED

    qs = all_queries()
    assert set(R8_ACTIVATED) == {pq.name for pq in PENDING}
    for pq in PENDING:
        assert pq.name in qs and qs[pq.name].fn is pq.fn
        assert qs[pq.name].oracle == pq.oracle


def test_pending_names_unique_and_oracle_bearing():
    names = [pq.name for pq in PENDING]
    assert len(names) == len(set(names))
    assert all(pq.oracle for pq in PENDING)
    # and no collision with the earlier staging areas either
    from spotify_data_pipeline_spark.plans.roundseven_pending import PENDING as P7
    from spotify_data_pipeline_spark.plans.roundsix import PENDING as P6

    assert not set(names) & {pq.name for pq in P6}
    assert not set(names) & {pq.name for pq in P7}


def _plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# broadcast-1-row patterns, documented at the call site; these join the
# plan-hygiene whitelist (with the same reasons) at activation
_BNLJ_OK = {
    # two 1-row broadcast corpus-total aggregates under the lift ratio
    "text_collocation_lift",
    # 1-row broadcast max(day) censoring the churn right edge (<= theta)
    "events_growth_accounting",
}


def test_plans_no_nested_loop(spark):
    for pq in PENDING:
        if pq.name in _BNLJ_OK:
            continue
        plan = _plan_of(pq.fn(spark, SF_DIR))
        assert "BroadcastNestedLoopJoin" not in plan, pq.name
        assert "CartesianProduct" not in plan, pq.name


def test_phrase_search_map_only(spark):
    """The docstring's scale claim: no explode, no join — the phrase
    test runs inside a single projection over the scan."""
    from spotify_data_pipeline_spark.plans.roundeight_pending import (
        text_phrase_search_query,
    )

    plan = _plan_of(text_phrase_search_query(spark, SF_DIR))
    assert "Join" not in plan
    assert "Exchange hashpartitioning" not in plan


def test_gini_known_values(spark):
    """Pin the rank identity against hand-computed Gini on a 4-row
    frame: x = [1, 1, 1, 1] → 0; x = [0, 0, 0, 4] → 0.75
    ((2*16 - 5*4) / (4*4))."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    for xs, want in (([1, 1, 1, 1], 0.0), ([0, 0, 0, 4], 0.75)):
        df = spark.createDataFrame(
            [(i, x) for i, x in enumerate(xs)], "k long, x long"
        )
        w = W.partitionBy().orderBy(F.col("x").asc(), F.col("k").asc())
        ranked = df.withColumn("i", F.row_number().over(w))
        got = ranked.agg(
            (
                F.floor(
                    (2 * F.sum(F.col("i") * F.col("x")) - (F.count("*") + 1) * F.sum("x"))
                    / (F.count("*") * F.sum("x"))
                    * 10000
                    + F.lit(0.5)
                )
                / 10000.0
            ).alias("g")
        ).collect()[0].g
        assert got == want, (xs, got)


def test_rate_limit_fold_vs_python_model(spark):
    """Pin the token-bucket fold (BOTH engines) against an independent
    Python replay of the spec on real data. This regression exists
    because DuckDB 1.0.0's list_reduce mutates the accumulator struct
    FIELD-BY-FIELD (a field computed after 'tok' reads the NEW tok) —
    the oracle's (adm, rej, tok, pus) state order is what makes it
    correct, and this test fails if anyone reorders it."""
    import duckdb

    from spotify_data_pipeline_spark.plans.roundeight_pending import (
        events_rate_limit_query,
        _RATE_LIMIT_ORACLE,
    )
    from tests.oracle_check import run_oracle

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'")
    rows = con.execute(
        """
        SELECT user_id, epoch_us(ts),
               CASE event_type WHEN 'purchase' THEN 30 WHEN 'click' THEN 5
                    WHEN 'view' THEN 3 WHEN 'error' THEN 10 ELSE 0 END
        FROM events ORDER BY user_id, ts, event_id
        """
    ).fetchall()
    model = {}
    for uid, us, cost in rows:
        adm, rej, tok, pus = model.get(uid, (0, 0, 100, 0))
        refill = min(100, tok + (us - pus) // 60_000_000)
        if refill >= cost:
            model[uid] = (adm + 1, rej, refill - cost, us)
        else:
            model[uid] = (adm, rej + 1, refill, us)

    for df in (
        events_rate_limit_query(spark, SF_DIR).toPandas(),
        run_oracle(_RATE_LIMIT_ORACLE, SF_DIR),
    ):
        got = {
            int(r.user_id): (int(r.admitted), int(r.rejected), int(r.final_tokens))
            for r in df.itertuples()
        }
        want = {u: (a, r, t) for u, (a, r, t, _) in model.items()}
        assert got == want


def test_pattern_match_patterns_nonvacuous():
    """Every row-pattern must match at least one session at the test SF
    (the Q7 lesson: an all-zero pattern column proves nothing)."""
    from spotify_data_pipeline_spark.plans.roundeight_pending import (
        _PATTERN_MATCH_ORACLE,
    )
    from tests.oracle_check import run_oracle

    df = run_oracle(_PATTERN_MATCH_ORACLE, SF_DIR)
    assert (df["n_sessions"] > 0).all(), df.to_dict("records")
