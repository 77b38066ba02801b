#!/usr/bin/env python
"""Snapshot driver-evidence source hashes (the code-pinning half of the
tail-evidence invariant).

The driver proves at most the first 50 registered queries per round
(CORRECTNESS_r{N}.json); every query past position 50 rides on a PRIOR
round's green row. A green row by *name* is only valid while the query's
code is the code the driver actually ran — so this tool records, per
evidenced query, ``sha256(inspect.getsource(fn))`` into
``tests/evidence_hashes.json``, and ``tests/test_registry.py`` asserts
every tail query's current hash equals its snapshotted one. Editing a
tail query's body then fails pytest until the query is rotated back into
the evidence window.

RUN THIS AS THE FIRST ACTION OF EACH ROUND, before editing any query
code: at round start, the working tree is the exact code the previous
round's driver run proved, so current-source hashes ARE evidence-time
hashes.

Refresh rules (tamper-safe):
- a name gaining its first green row is added with its current hash;
- a name whose stored hash differs from current is ONLY updated if a
  CORRECTNESS file *new since the last snapshot* contains a green row
  for it (fresh evidence on the current code); otherwise the tool
  refuses and exits non-zero — that hash mismatch is exactly the silent
  re-edit this mechanism exists to catch.
"""

from __future__ import annotations

import glob
import hashlib
import inspect
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SNAPSHOT = os.path.join(_REPO, "tests", "evidence_hashes.json")


def source_hash(fn) -> str:
    return hashlib.sha256(inspect.getsource(fn).encode("utf-8")).hexdigest()


def green_rounds() -> dict[str, list[str]]:
    """name -> sorted rounds with a non-ERR driver row (hash-match or
    rows-only recorded without error)."""
    out: dict[str, set[str]] = {}
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        rnd = os.path.basename(path).removeprefix("CORRECTNESS_").removesuffix(".json")
        with open(path) as f:
            rows = json.load(f)
        for name, r in rows.items():
            err = r.get("err")
            if err is None or err == "no_oracle":
                out.setdefault(name, set()).add(rnd)
    return {k: sorted(v) for k, v in out.items()}


def refresh(
    prev: dict,
    greens: dict[str, list[str]],
    current_hashes: dict[str, str],
    correctness_files: list[str],
) -> tuple[dict[str, dict], list[str]]:
    """Pure refresh rule (unit-tested in tests/test_snapshot_tool.py):
    returns (new queries-section, refused names). A stored hash may only
    change when a correctness file NEW since the last snapshot carries a
    green row for that name — otherwise the stored (evidenced) hash is
    kept and the name reported as refused."""
    new_files = set(correctness_files) - set(prev["_meta"]["correctness_files"])
    out: dict[str, dict] = {}
    refused: list[str] = []
    for name, rounds in sorted(greens.items()):
        if name not in current_hashes:
            continue  # evidenced under an old name no longer registered
        cur = current_hashes[name]
        stored = prev["queries"].get(name)
        if stored is None or stored["sha256"] == cur:
            out[name] = {"sha256": cur, "rounds": rounds}
        else:
            fresh = any(r for r in rounds if f"CORRECTNESS_{r}.json" in new_files)
            if fresh:
                out[name] = {"sha256": cur, "rounds": rounds}
            else:
                refused.append(name)
                out[name] = stored  # keep the evidenced hash
    return out, refused


def main() -> int:
    sys.path.insert(0, _REPO)
    from spotify_data_pipeline_spark.plans import all_queries

    correctness_files = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))
    )
    prev: dict = {"_meta": {"correctness_files": []}, "queries": {}}
    if os.path.exists(SNAPSHOT):
        with open(SNAPSHOT) as f:
            prev = json.load(f)

    current_hashes = {name: source_hash(q.fn) for name, q in all_queries().items()}
    out, refused = refresh(prev, green_rounds(), current_hashes, correctness_files)

    if refused:
        print(
            "REFUSING to update hashes without fresh driver evidence for: "
            + ", ".join(refused)
            + "\nThese queries were edited after their evidence was earned. "
            "Either revert the edit or rotate them into the first-50 window.",
            file=sys.stderr,
        )

    with open(SNAPSHOT, "w") as f:
        json.dump(
            {"_meta": {"correctness_files": correctness_files}, "queries": out},
            f,
            indent=1,
            sort_keys=True,
        )
        f.write("\n")
    print(f"wrote {SNAPSHOT}: {len(out)} evidenced queries")
    return 1 if refused else 0


if __name__ == "__main__":
    raise SystemExit(main())
