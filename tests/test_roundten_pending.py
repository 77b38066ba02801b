"""Round-10 staged queries (plans/roundten_pending.py) get the SAME
driver-shaped oracle check as declared queries — activation later is
registration-only (after the evidence-hash refresh)."""

from __future__ import annotations

import os

import pytest

from spotify_data_pipeline_spark.plans.roundten_pending import PENDING
from tests.oracle_check import compare, run_oracle

SF_DIR = os.environ.get("ORACLE_SF", "/root/testdata/sf0.001")

_EMPTY_OK = set()


@pytest.mark.parametrize("pq", PENDING, ids=lambda pq: pq.name)
def test_pending_oracle_match(spark, pq):
    result = pq.fn(spark, SF_DIR)
    oracle = run_oracle(pq.oracle, SF_DIR)
    errs = compare(result, oracle)
    assert not errs, f"{pq.name}: " + "; ".join(errs)
    if pq.name not in _EMPTY_OK:
        assert len(oracle) > 0, f"{pq.name}: vacuous (0 oracle rows) at {SF_DIR}"


def test_pending_not_registered(spark):
    from spotify_data_pipeline_spark.plans import all_queries

    names = set(all_queries())
    assert not names & {pq.name for pq in PENDING}


def test_pending_names_unique_and_oracle_bearing():
    names = [pq.name for pq in PENDING]
    assert len(names) == len(set(names))
    assert all(pq.oracle for pq in PENDING)
    from spotify_data_pipeline_spark.plans.roundeight_pending import PENDING as P8
    from spotify_data_pipeline_spark.plans.roundnine_pending import PENDING as P9
    from spotify_data_pipeline_spark.plans.roundseven_pending import PENDING as P7
    from spotify_data_pipeline_spark.plans.roundsix_pending import PENDING as P6

    for earlier in (P6, P7, P8, P9):
        assert not set(names) & {pq.name for pq in earlier}


# broadcast-1-row patterns, documented at the call site
_BNLJ_OK = set()


def test_plans_no_nested_loop(spark):
    for pq in PENDING:
        if pq.name in _BNLJ_OK:
            continue
        plan = pq.fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan, pq.name
        assert "CartesianProduct" not in plan, pq.name


def test_alert_suppression_vs_python_replay(spark):
    """The fold equals an independent Python replay of the
    emit-then-cooldown rule over the raw parquet."""
    import pandas as pd

    from spotify_data_pipeline_spark.plans.roundten_pending import (
        _COOLDOWN_US,
        events_alert_suppression_query,
    )

    got = {
        r.user_id: (r.n_errors, r.pages_sent, r.suppressed, r.last_page_us)
        for r in events_alert_suppression_query(spark, SF_DIR).collect()
    }
    df = pd.read_parquet(f"{SF_DIR}/events.parquet")
    df = df[df.event_type == "error"]
    expect = {}
    for uid, grp in df.groupby("user_id"):
        evs = sorted(
            (int(pd.Timestamp(t).value // 1000), int(e))
            for t, e in zip(grp.ts, grp.event_id)
        )
        emt = sup = 0
        last = -(10**18)
        for us, _ in evs:
            if us - last >= _COOLDOWN_US:
                emt += 1
                last = us
            else:
                sup += 1
        expect[int(uid)] = (len(evs), emt, sup, last)
    assert got == expect
    # the rule actually bites at this SF: someone suppressed something
    assert any(s for _, _, s, _ in got.values())


def test_runs_test_identity(spark):
    """n_runs is between 1 and n_up+n_down, and equals 1 + number of
    sign alternations (the defining identity)."""
    from spotify_data_pipeline_spark.plans.roundten_pending import (
        agg_runs_test_query,
    )

    rows = agg_runs_test_query(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_runs <= r.n_up + r.n_down


def test_mixture_budget_sums_exactly(spark):
    """Allocated target tokens sum EXACTLY to the budget, zero-weight
    sources get explicit zero rows, and epochs_x1000 is the exact
    integer ratio."""
    from spotify_data_pipeline_spark.plans.roundten_pending import (
        _MIX_BUDGET,
        _MIX_WEIGHTS,
        llm_mixture_epochs_query,
    )

    rows = llm_mixture_epochs_query(spark, SF_DIR).collect()
    assert sum(r.target_tokens for r in rows) == _MIX_BUDGET
    weighted = {r.source for r in rows if r.weight > 0}
    assert weighted == set(_MIX_WEIGHTS)
    zero = [r for r in rows if r.weight == 0]
    assert zero and all(r.target_tokens == 0 for r in zero)
    for r in rows:
        assert r.epochs_x1000 == (r.target_tokens * 1000) // r.available


def test_duckdb_list_reduce_copy_self_hazard_pinned():
    """Documents the NEW DuckDB 1.0.0 list_reduce hazard the alert
    oracle engineers around: when a result field returns the
    accumulator field VERBATIM in a branch (ELSE acc.last), grouped
    folds can pair results with the WRONG rows. The wrapped
    (greatest) form must be correct on the same input; the unwrapped
    form's failure is asserted IF it still reproduces — if a DuckDB
    upgrade fixes it, the xfail-style branch tells us the workaround
    can be retired."""
    import duckdb

    con = duckdb.connect()
    # the misalignment needs enough rows/groups to manifest (it does
    # NOT reproduce at sf0.001) — pin the repro to the sf0.01 fixture
    con.execute(
        "CREATE VIEW events AS SELECT * FROM"
        " '/root/testdata/sf0.01/events.parquet'"
    )
    base = """
      WITH lists AS (
        SELECT user_id,
               list({'emt': CAST(0 AS BIGINT), 'last': epoch_us(ts)}
                    ORDER BY ts, event_id) AS lst
        FROM events WHERE event_type='error' GROUP BY user_id
      )
      SELECT user_id, lst,
             list_reduce(list_prepend(
               {'emt': CAST(0 AS BIGINT),
                'last': CAST(-1000000000000000000 AS BIGINT)}, lst),
               (acc, e) -> {
                 'emt': acc.emt + CASE WHEN e.last - acc.last >= 14400000000
                                       THEN 1 ELSE 0 END,
                 'last': %s}) AS s
      FROM lists
    """
    unwrapped = (
        "CASE WHEN e.last - acc.last >= 14400000000 THEN e.last ELSE acc.last END"
    )
    wrapped = f"greatest(acc.last, {unwrapped})"

    def misaligned(last_expr):
        nbad = 0
        for _, lst, s in con.execute(base % last_expr).fetchall():
            seq = [e["last"] for e in lst]
            emt, last = 0, -(10**18)
            for us in seq:
                if us - last >= 14_400_000_000:
                    emt += 1
                    last = us
            if (s["emt"], s["last"]) != (emt, last):
                nbad += 1
        return nbad

    assert misaligned(wrapped) == 0, "the workaround form must be correct"
    if misaligned(unwrapped) == 0:
        import warnings

        warnings.warn(
            "DuckDB no longer reproduces the list_reduce copy-self "
            "hazard — the greatest() workaround can be retired"
        )
