"""Round-4 activation invariants for the queries staged in round 3
(plans/roundfour.py). Oracle parity itself is covered by
tests/test_oracle_parity.py — once registered, each query runs through
the same driver-shaped comparison as every other declared query.
"""

from __future__ import annotations

from spotify_data_pipeline_spark.plans.roundfour import PENDING


def test_roundfour_registered_inside_evidence_window():
    """All 17 activated queries must sit in the driver's first 50
    positions — registration past the window would strand them
    unevidenced for another round."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __spark_entry__ as e

    names = list(e.queries())
    for pq in PENDING:
        assert pq.name in names[:50], f"{pq.name} outside the evidence window"


def test_roundfour_registration_matches_staging():
    """The registered entry is the staged one: same fn, same oracle."""
    from spotify_data_pipeline_spark.plans import all_queries

    qs = all_queries()
    for pq in PENDING:
        assert qs[pq.name].fn is pq.fn
        assert qs[pq.name].oracle == pq.oracle


def test_pending_names_unique_and_oracle_bearing():
    names = [pq.name for pq in PENDING]
    assert len(names) == len(set(names))
    assert all(pq.oracle for pq in PENDING)
