"""Round-4 staged queries (plans/roundfour_pending.py) get the SAME
driver-shaped oracle check as declared queries, at both smoke and
driver scale — so activating them in round 4 is registration-only.
"""

from __future__ import annotations

import os

import pytest

from spotify_data_pipeline_spark.plans.roundfour_pending import PENDING
from tests.oracle_check import compare, run_oracle

SF_DIR = os.environ.get("ORACLE_SF", "/root/testdata/sf0.001")


@pytest.mark.parametrize("pq", PENDING, ids=lambda pq: pq.name)
def test_pending_oracle_match(spark, pq):
    result = pq.fn(spark, SF_DIR)
    oracle = run_oracle(pq.oracle, SF_DIR)
    errs = compare(result, oracle)
    assert not errs, f"{pq.name}: " + "; ".join(errs)


def test_pending_not_registered(spark):
    """Staged queries must NOT appear in the driver's view: the window
    is exactly full, and an unevidenced tail entry is what the registry
    invariants exist to prevent."""
    from spotify_data_pipeline_spark.plans import all_queries

    names = set(all_queries())
    assert not names & {pq.name for pq in PENDING}


def test_pending_names_unique_and_oracle_bearing():
    """Activation safety: no duplicate staged names (a dup would make
    round-4 declare() raise mid-activation) and every staged entry
    carries an oracle — rows-only operators stay pytest-gated instead
    of occupying staging slots."""
    names = [pq.name for pq in PENDING]
    assert len(names) == len(set(names))
    assert all(pq.oracle for pq in PENDING)
