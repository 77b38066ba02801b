"""Registry invariants — including the driver-evidence window policy:
the external driver records only the FIRST 50 registered queries in
CORRECTNESS_r{N}.json, so every query that lacks a green prior-round
row (new or renamed) MUST register inside the first 50; queries pushed
past position 50 must be ones already evidenced by round 1."""

from __future__ import annotations

import json
import os

from spotify_data_pipeline_spark.plans import all_queries

_R01 = os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r01.json")


def test_unevidenced_queries_register_in_driver_window():
    with open(_R01) as f:
        r01 = json.load(f)
    names = list(all_queries())
    first50 = set(names[:50])
    missing = [n for n in names if n not in r01 and n not in first50]
    assert not missing, (
        f"queries with no driver evidence outside the first-50 window: {missing} "
        "(reorder plans.registry._QUERY_MODULES)"
    )
    # and the tail must be r01-evidenced
    tail_unproven = [n for n in names[50:] if n not in r01]
    assert not tail_unproven


def test_registry_metadata_sane():
    qs = all_queries()
    assert len(qs) == len(set(qs))  # unique names (also enforced at declare)
    for name, q in qs.items():
        assert callable(q.fn), name
        if q.oracle is not None:
            assert "SELECT" in q.oracle.upper(), name
    assert sum(1 for q in qs.values() if q.headline) >= 10
