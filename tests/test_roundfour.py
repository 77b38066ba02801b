"""Round-4 activation invariants for the queries staged in round 3
(plans/roundfour.py). Oracle parity itself is covered by
tests/test_oracle_parity.py — once registered, each query runs through
the same driver-shaped comparison as every other declared query.
"""

from __future__ import annotations

from spotify_data_pipeline_spark.plans.roundfour import PENDING


def test_roundfour_registered_and_evidence_covered():
    """Round-4 activation required these 17 inside the first-50 window;
    since round 5 they have their green r04 rows and rotate to the
    hash-pinned tail. The standing invariant: each is registered AND
    either inside the current window or carrying a green prior-round
    driver row (the general tail rule test_registry enforces for every
    query — restated here for the specific cohort)."""
    import glob
    import json
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __spark_entry__ as e

    names = list(e.queries())
    green: set[str] = set()
    for path in sorted(
        glob.glob(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r*.json"))
    ):
        with open(path) as f:
            for name, r in json.load(f).items():
                if r.get("err") in (None, "no_oracle"):
                    green.add(name)
    for pq in PENDING:
        assert pq.name in names, f"{pq.name} not registered"
        assert names.index(pq.name) < 50 or pq.name in green, (
            f"{pq.name} outside the evidence window with no green prior row"
        )


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
