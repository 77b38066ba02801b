"""Single source of truth for the driver's correctness-gate scale factor.

The driver runs the oracle compare at sf0.01; `tools/simulate_window.py`
hard-FAILs vacuous 0-row rows-only results only at that SF (warns at
other spot-check SFs). ADVICE r11: the gate-SF test was a brittle path
suffix match (`sf.rstrip('/').endswith('sf0.01')`) — a renamed or
differently-nested fixture dir would silently downgrade gate FAILs to
warnings. This module is the shared named constant; `tests/conftest.py`
(SF_ORACLE) and `tools/simulate_window.py` both read it.

Deliberately import-free of the rest of the package and imported by NO
plans/operators module: it must never join any query's evidence-hash
closure (tools/snapshot_evidence.py pins closures per query).
"""

from __future__ import annotations

import os

GATE_SF_DIR = "/root/testdata/sf0.01"


def is_gate_sf(path: str) -> bool:
    """True iff ``path`` names the driver's gate-SF fixture dir,
    compared by normalized absolute path — not by suffix."""
    return os.path.abspath(path.rstrip("/")) == os.path.abspath(GATE_SF_DIR)
