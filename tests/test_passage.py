"""Duplicated-passage removal (operators/passage.py): the span-cutting
half of substring dedup (Lee et al. 2022), on top of the detection half
in plans/roundfive.py. Cross-engine exactness is driver-proven by the
``dedup_passage_removal`` query; these tests pin the operator-level
semantics a SQL oracle can't express as directly."""

from __future__ import annotations

from pyspark.sql import functions as F

from spotify_data_pipeline_spark.operators.passage import (
    remove_duplicate_passages,
)

_PASSAGE = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "astronauts watch from orbit with considerable amusement and "
    "meticulous attention to every single detail of the landing "
    "procedure that unfolds below them across the quiet continent "
    "during the long afternoon of an otherwise unremarkable tuesday"
)

_ROWS = [
    (1, "intro text before. " + _PASSAGE + " and some trailing words."),
    (2, "A lead-in of different length!   " + _PASSAGE.upper() + "  done."),
    (3, "no shared content here at all, just independent filler text "
        "that goes on long enough to produce several windows of its own "
        "without ever quoting anything from the astronaut passage"),
    (4, "tiny"),
]


def _run(spark, rows=_ROWS):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r.doc_id: r for r in remove_duplicate_passages(df).collect()}


def test_winner_keeps_text_loser_loses_passage(spark):
    got = _run(spark)
    # min-id winner: normalized but uncut
    assert got[1].n_cut == 0 and got[1].n_extents == 0
    assert _PASSAGE in got[1].text_clean
    # loser: the shared passage is cut (up to rare 1/16-sampling gaps —
    # each shorter than the 64-char window by construction)
    assert got[2].n_cut > 0
    assert _PASSAGE not in got[2].text_clean
    assert got[2].n_cut >= len(_PASSAGE) - 64 * got[2].n_extents
    # lead-in and tail survive
    assert got[2].text_clean.startswith("a lead-in of different length! ")
    assert got[2].text_clean.endswith(" done.")
    # bystanders and short docs pass through normalized, uncut
    assert got[3].n_cut == 0 and got[4].n_cut == 0
    assert got[4].text_clean == "tiny"


def test_removal_kills_detection_pairs(spark):
    """After removal, re-running DETECTION on the cleaned corpus finds
    no sharing pairs on this fixture — the closed loop of the Lee et
    al. pipeline (detect → cut → corpus is passage-unique)."""
    from spotify_data_pipeline_spark.plans.roundfive import exact_passage_pairs

    df = spark.createDataFrame(_ROWS, "doc_id long, text string")
    cleaned = remove_duplicate_passages(df).select(
        "doc_id", F.col("text_clean").alias("text")
    )
    assert exact_passage_pairs(cleaned).count() == 0


def test_internal_repeat_single_doc_not_cut(spark):
    """A passage repeated only WITHIN one doc is not corpus-duplicated:
    inter-doc scope leaves it alone."""
    rows = [(7, _PASSAGE + " ... " + _PASSAGE)]
    got = _run(spark, rows)
    assert got[7].n_cut == 0


def test_loser_with_two_separated_passages_gets_two_extents(spark):
    """Extent merging: two shared passages separated by enough unique
    text must come out as (at least) two disjoint extents, and both
    must be gone."""
    filler = " completely unique filler text sits between the two quoted blocks " * 3
    p2 = _PASSAGE.replace("fox", "owl").replace("tuesday", "thursday")
    rows = [
        (1, _PASSAGE),
        (2, p2),
        (3, "head. " + _PASSAGE + filler + p2 + " tail."),
    ]
    got = _run(spark, rows)
    assert got[3].n_extents >= 2
    assert _PASSAGE not in got[3].text_clean and p2 not in got[3].text_clean
    import re

    assert re.sub(r"\s+", " ", filler).strip() in got[3].text_clean


def test_repartition_invariant(spark):
    df = spark.createDataFrame(_ROWS, "doc_id long, text string")
    a = {tuple(r) for r in remove_duplicate_passages(df).collect()}
    b = {tuple(r) for r in remove_duplicate_passages(df.repartition(7)).collect()}
    assert a == b


def test_plan_shape_no_cartesian(spark):
    """All joins ride equi keys (fingerprint, doc id) — no BNLJ or
    cartesian anywhere in the removal plan."""
    df = spark.createDataFrame(_ROWS, "doc_id long, text string")
    plan = remove_duplicate_passages(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
