"""Evidence-window planning scan (run at round start, BEFORE editing).

For every registered query, report whether its prior driver evidence is
still valid for the current code — i.e. whether it may sit in the tail
(past position 50) or must occupy a window slot this round:

- NEW: no green row in any CORRECTNESS_r*.json → must be in the window.
- DRIFT: green row exists, but the query's source hash or transitive
  import-closure hash no longer matches tests/evidence_hashes.json →
  its tail evidence is invalid, so it must be re-proven in the window
  (or the edit reverted).
- OK: green + both hashes match → eligible for the pinned tail.

This is the same arithmetic tests/test_registry.py enforces after the
fact; running it first turns window planning from trial-and-error into
a lookup (round-5 second session used exactly this to find that only
the 6 events queries needed re-proof slots, freeing 32 slots for new
activations).

Usage: python tools/window_eligibility.py
"""

from __future__ import annotations

import glob
import hashlib
import importlib.util
import inspect
import json
import os
import sys

_REPO = os.path.join(os.path.dirname(__file__), "..")


def main() -> None:
    sys.path.insert(0, _REPO)
    from spotify_data_pipeline_spark.plans import all_queries

    spec = importlib.util.spec_from_file_location(
        "snapshot_evidence", os.path.join(_REPO, "tools", "snapshot_evidence.py")
    )
    tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tool)

    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        for name, r in json.load(open(path)).items():
            # Green = hash actually matched, or documented rows-only
            # (err == "no_oracle"). err None + hash_match false is a
            # driver FAIL row and must not count (VERDICT r10 item 3).
            if r.get("err") == "no_oracle" or (
                r.get("err") is None and r.get("hash_match") is True
            ):
                green.add(name)

    with open(os.path.join(_REPO, "tests", "evidence_hashes.json")) as f:
        snap = json.load(f)["queries"]

    qs = all_queries()
    new, drift, ok = [], [], []
    for name, q in qs.items():
        if name not in green or name not in snap:
            new.append(name)
            continue
        src_ok = (
            hashlib.sha256(inspect.getsource(q.fn).encode()).hexdigest()
            == snap[name]["sha256"]
        )
        deps_ok = tool.deps_hash(q.fn) == snap[name].get("deps_sha256")
        if src_ok and deps_ok:
            ok.append(name)
        else:
            what = "+".join(
                label for label, bad in (("src", not src_ok), ("deps", not deps_ok)) if bad
            )
            drift.append(f"{name} ({what})")

    must_window = len(new) + len(drift)
    print(f"registered: {len(qs)}  window slots: 50")
    print(f"NEW (never evidenced, must be in window): {len(new)}")
    for n in new:
        print(f"  {n}")
    print(f"DRIFT (evidence invalidated, must re-prove): {len(drift)}")
    for n in drift:
        print(f"  {n}")
    print(f"OK (tail-eligible): {len(ok)}")
    print(
        f"\n=> slots consumed by NEW+DRIFT: {must_window}; "
        f"free for staged activations: {max(0, 50 - must_window)}"
    )
    if must_window > 50:
        print("!! NEW+DRIFT exceeds the window — revert drifting edits or defer")


if __name__ == "__main__":
    main()
