"""Round-5 activated queries (plans/roundfive.py) get the SAME
driver-shaped oracle check as declared queries — so activating them in
round 5 is registration-only (after the evidence-hash refresh).
"""

from __future__ import annotations

import os

import pytest

from spotify_data_pipeline_spark.plans.roundfive import PENDING
from tests.oracle_check import compare, run_oracle

SF_DIR = os.environ.get("ORACLE_SF", "/root/testdata/sf0.001")


@pytest.mark.parametrize("pq", PENDING, ids=lambda pq: pq.name)
def test_pending_oracle_match(spark, pq):
    result = pq.fn(spark, SF_DIR)
    oracle = run_oracle(pq.oracle, SF_DIR)
    errs = compare(result, oracle)
    assert not errs, f"{pq.name}: " + "; ".join(errs)


def test_pending_registered_and_evidenced(spark):
    """Round-5 activation: every staged query is registered, and is
    either inside the current driver window or carries a green prior-
    round driver row (the rotation-safe invariant — window *position*
    is a per-round activation concern; asserting it here broke when
    round 6 correctly rotated these to the tail, r06 verdict item 1)."""
    import glob
    import json
    import os

    from spotify_data_pipeline_spark.plans import all_queries

    names = list(all_queries())
    green: set[str] = set()
    for path in sorted(
        glob.glob(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r*.json"))
    ):
        with open(path) as f:
            for name, r in json.load(f).items():
                if r.get("err") in (None, "no_oracle"):
                    green.add(name)
    for pq in PENDING:
        assert pq.name in names, pq.name
        assert names.index(pq.name) < 50 or pq.name in green, (
            f"{pq.name} outside the evidence window with no green prior row"
        )


def test_pending_names_unique_and_oracle_bearing():
    names = [pq.name for pq in PENDING]
    assert len(names) == len(set(names))
    assert all(pq.oracle for pq in PENDING)


def test_exact_passage_alignment_independent_detection(spark):
    """The design point of content-defined selection: the SAME passage
    embedded at different offsets (different offsets mod any stride),
    different case, different surrounding whitespace, must still pair —
    a strided scheme misses this whenever prefixes differ mod stride.
    Unrelated docs must not pair."""
    from spotify_data_pipeline_spark.plans.roundfive import (
        exact_passage_pairs,
    )

    passage = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "astronauts watch from orbit with considerable amusement and "
        "meticulous attention to every single detail of the landing "
        "procedure that unfolds below them across the quiet continent "
        "during the long afternoon of an otherwise unremarkable tuesday"
    )  # ~300 normalized chars -> ~240 windows, miss prob (15/16)^240 ~ 2e-7
    rows = [
        (1, "intro text before. " + passage + " and some trailing words."),
        (2, "A lead-in of different length!   " + passage.upper() + "  done."),
        (3, "no shared content here at all, just independent filler text "
            "that goes on long enough to produce several windows of its own "
            "without ever quoting anything from the astronaut passage"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id_a, r.id_b): r.n_shared for r in exact_passage_pairs(df).collect()}
    assert (1, 2) in got and got[(1, 2)] >= 1
    assert not any(3 in p for p in got)


def _plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_point_in_time_plan_is_equi_key_join(spark):
    """The validity range predicate must ride on the custkey equi key —
    a BroadcastNestedLoopJoin/CartesianProduct here would be the
    both-sides-large scale-killer the docstring rules out."""
    from spotify_data_pipeline_spark.plans.roundfive import (
        join_point_in_time_query,
    )

    plan = _plan_of(join_point_in_time_query(spark, "/root/testdata/sf0.001"))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_exact_passage_plan_has_no_join(spark):
    """Candidate generation is the capped-bucket in-array device: two
    exchanges (fingerprint group, pair agg), NO join operator at all."""
    from spotify_data_pipeline_spark.io import load_table
    from spotify_data_pipeline_spark.plans.roundfive import (
        exact_passage_pairs,
    )

    plan = _plan_of(
        exact_passage_pairs(load_table(spark, "/root/testdata/sf0.001", "documents"))
    )
    for op in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin",
               "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert op not in plan, op


def test_interval_outer_plan_and_null_multiplicity(spark):
    """The batch twin of the streaming LEFT OUTER interval join: the
    bin-equality key must keep the join out of BNLJ territory, and a
    lonely purchase must yield EXACTLY one null row despite the event
    side's 2-bin explode (the side-flip design point)."""
    from pyspark.sql import functions as F

    from spotify_data_pipeline_spark.plans.roundfive import (
        events_interval_join_outer_query,
    )

    df = events_interval_join_outer_query(spark, "/root/testdata/sf0.001")
    plan = _plan_of(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    nulls = (
        df.where(F.col("event_id").isNull())
        .groupBy("purchase_id")
        .count()
        .where(F.col("count") != 1)
        .count()
    )
    assert nulls == 0  # never 2 null rows per lonely purchase
    assert df.where(F.col("event_id").isNull()).count() > 0  # exercised


def test_staged_queries_repartition_invariant(spark):
    """Determinism under physical layout: the staged pair/distinct
    queries must produce identical row sets whatever the input
    partitioning (the engine-wide seeded-sampling discipline applied
    to the new operators)."""
    from pyspark.sql import functions as F

    from spotify_data_pipeline_spark.io import load_table
    from spotify_data_pipeline_spark.plans.roundfive import (
        exact_passage_pairs,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    a = {tuple(r) for r in exact_passage_pairs(docs).collect()}
    b = {tuple(r) for r in exact_passage_pairs(docs.repartition(7, "source")).collect()}
    c = {tuple(r) for r in exact_passage_pairs(docs.repartition(3)).collect()}
    assert a == b == c
