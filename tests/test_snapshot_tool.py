"""Unit tests for the evidence-hash refresh rule
(tools/snapshot_evidence.refresh) — the mechanism that makes prior-round
driver evidence valid only for the exact code the driver ran.
"""

from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "snapshot_evidence",
    os.path.join(os.path.dirname(__file__), "..", "tools", "snapshot_evidence.py"),
)
snapshot_evidence = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_spec and snapshot_evidence)
refresh = snapshot_evidence.refresh


def _prev(files, queries):
    return {"_meta": {"correctness_files": files}, "queries": queries}


def test_first_snapshot_records_current_hashes():
    out, refused = refresh(
        _prev([], {}),
        {"q1": ["r01"], "q2": ["r02"]},
        {"q1": "aaa", "q2": "bbb"},
        ["CORRECTNESS_r01.json", "CORRECTNESS_r02.json"],
    )
    assert refused == []
    assert out == {
        "q1": {"sha256": "aaa", "rounds": ["r01"]},
        "q2": {"sha256": "bbb", "rounds": ["r02"]},
    }


def test_unchanged_hash_updates_rounds_quietly():
    prev = _prev(["CORRECTNESS_r01.json"], {"q1": {"sha256": "aaa", "rounds": ["r01"]}})
    out, refused = refresh(
        prev,
        {"q1": ["r01", "r02"]},
        {"q1": "aaa"},
        ["CORRECTNESS_r01.json", "CORRECTNESS_r02.json"],
    )
    assert refused == []
    assert out["q1"] == {"sha256": "aaa", "rounds": ["r01", "r02"]}


def test_edited_query_without_fresh_evidence_is_refused():
    """The tamper case: hash differs but no NEW correctness file proves
    the current code — the stored (evidenced) hash must be kept."""
    prev = _prev(["CORRECTNESS_r01.json"], {"q1": {"sha256": "aaa", "rounds": ["r01"]}})
    out, refused = refresh(
        prev, {"q1": ["r01"]}, {"q1": "EDITED"}, ["CORRECTNESS_r01.json"]
    )
    assert refused == ["q1"]
    assert out["q1"]["sha256"] == "aaa"


def test_edited_query_with_fresh_green_row_rehashes():
    """Round-start flow: code changed last round AND the new round's
    correctness file carries a green row — the driver proved the
    current code, so the hash updates."""
    prev = _prev(["CORRECTNESS_r01.json"], {"q1": {"sha256": "aaa", "rounds": ["r01"]}})
    out, refused = refresh(
        prev,
        {"q1": ["r01", "r02"]},
        {"q1": "NEWHASH"},
        ["CORRECTNESS_r01.json", "CORRECTNESS_r02.json"],
    )
    assert refused == []
    assert out["q1"] == {"sha256": "NEWHASH", "rounds": ["r01", "r02"]}


def test_stale_green_row_in_old_file_does_not_authorize_rehash():
    """A green row in an ALREADY-SEEN file must not authorize a hash
    change — only evidence newer than the last snapshot counts."""
    prev = _prev(
        ["CORRECTNESS_r01.json", "CORRECTNESS_r02.json"],
        {"q1": {"sha256": "aaa", "rounds": ["r01", "r02"]}},
    )
    out, refused = refresh(
        prev,
        {"q1": ["r01", "r02"]},
        {"q1": "EDITED"},
        ["CORRECTNESS_r01.json", "CORRECTNESS_r02.json"],
    )
    assert refused == ["q1"]
    assert out["q1"]["sha256"] == "aaa"


def test_unregistered_evidenced_name_is_dropped():
    out, refused = refresh(
        _prev([], {}), {"gone": ["r01"]}, {}, ["CORRECTNESS_r01.json"]
    )
    assert out == {} and refused == []


def test_deps_change_without_fresh_evidence_is_refused():
    """Round-5 extension (ADVICE r04): the pin covers the query's import
    closure. A shared-helper edit changes deps_sha256 while the fn hash
    still matches — that must refuse exactly like an fn-body edit."""
    prev = _prev(
        ["CORRECTNESS_r01.json"],
        {"q1": {"sha256": "aaa", "deps_sha256": "ddd", "rounds": ["r01"]}},
    )
    out, refused = refresh(
        prev,
        {"q1": ["r01"]},
        {"q1": {"sha256": "aaa", "deps_sha256": "EDITED"}},
        ["CORRECTNESS_r01.json"],
    )
    assert refused == ["q1"]
    assert out["q1"]["deps_sha256"] == "ddd"


def test_missing_deps_field_upgrades_in_place():
    """Format migration: a legacy entry without deps_sha256 gains one
    from the current tree without needing fresh evidence (the field is
    populated at the round-start snapshot, when the tree IS the
    evidence-time code)."""
    prev = _prev(["CORRECTNESS_r01.json"], {"q1": {"sha256": "aaa", "rounds": ["r01"]}})
    out, refused = refresh(
        prev,
        {"q1": ["r01"]},
        {"q1": {"sha256": "aaa", "deps_sha256": "ddd"}},
        ["CORRECTNESS_r01.json"],
    )
    assert refused == []
    assert out["q1"] == {"sha256": "aaa", "deps_sha256": "ddd", "rounds": ["r01"]}


def test_deps_change_with_fresh_green_row_rehashes():
    prev = _prev(
        ["CORRECTNESS_r01.json"],
        {"q1": {"sha256": "aaa", "deps_sha256": "ddd", "rounds": ["r01"]}},
    )
    out, refused = refresh(
        prev,
        {"q1": ["r01", "r02"]},
        {"q1": {"sha256": "aaa", "deps_sha256": "NEW"}},
        ["CORRECTNESS_r01.json", "CORRECTNESS_r02.json"],
    )
    assert refused == []
    assert out["q1"]["deps_sha256"] == "NEW"


def test_reverify_pin_is_provisional():
    """r13 (ADVICE r12): a hash re-pinned on locally-generated REVERIFY
    evidence alone is tagged provisional — it must not read as
    driver-proven until a driver CORRECTNESS file confirms it."""
    prev = _prev(["CORRECTNESS_r01.json"], {"q1": {"sha256": "aaa", "rounds": ["r01"]}})
    out, refused = refresh(
        prev,
        {"q1": ["r01", "r02+reverify"]},
        {"q1": "NEWHASH"},
        ["CORRECTNESS_r01.json", "REVERIFY_r02.json"],
    )
    assert refused == []
    assert out["q1"]["sha256"] == "NEWHASH"
    assert out["q1"]["provisional"] is True


def test_driver_row_clears_provisional():
    """The next driver CORRECTNESS green row confirms a provisional
    entry: the flag is dropped."""
    prev = _prev(
        ["CORRECTNESS_r01.json", "REVERIFY_r02.json"],
        {"q1": {"sha256": "bbb", "rounds": ["r01", "r02+reverify"], "provisional": True}},
    )
    out, refused = refresh(
        prev,
        {"q1": ["r01", "r02+reverify", "r03"]},
        {"q1": "bbb"},
        ["CORRECTNESS_r01.json", "REVERIFY_r02.json", "CORRECTNESS_r03.json"],
    )
    assert refused == []
    assert "provisional" not in out["q1"]


def test_provisional_carries_without_driver_confirmation():
    """No new driver file: the provisional flag persists across
    snapshot runs (a second reverify must not clear it either)."""
    prev = _prev(
        ["CORRECTNESS_r01.json", "REVERIFY_r02.json"],
        {"q1": {"sha256": "bbb", "rounds": ["r01", "r02+reverify"], "provisional": True}},
    )
    out, refused = refresh(
        prev,
        {"q1": ["r01", "r02+reverify", "r03+reverify"]},
        {"q1": "bbb"},
        ["CORRECTNESS_r01.json", "REVERIFY_r02.json", "REVERIFY_r03.json"],
    )
    assert refused == []
    assert out["q1"]["provisional"] is True


def test_fresh_driver_and_reverify_pin_is_not_provisional():
    """When BOTH a new driver file and a new reverify file carry green
    rows, the driver evidence wins: no provisional tag."""
    prev = _prev(["CORRECTNESS_r01.json"], {"q1": {"sha256": "aaa", "rounds": ["r01"]}})
    out, refused = refresh(
        prev,
        {"q1": ["r01", "r02", "r02+reverify"]},
        {"q1": "NEWHASH"},
        ["CORRECTNESS_r01.json", "CORRECTNESS_r02.json", "REVERIFY_r02.json"],
    )
    assert refused == []
    assert "provisional" not in out["q1"]
