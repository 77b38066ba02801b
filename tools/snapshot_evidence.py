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

import ast
import glob
import hashlib
import inspect
import json
import os
import sys
from functools import lru_cache

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SNAPSHOT = os.path.join(_REPO, "tests", "evidence_hashes.json")
_PKG = "spotify_data_pipeline_spark"

# Excluded from the dependency closure: pure registration plumbing with
# no query semantics (its ordering effects are separately pinned by
# tests/test_registry.py's order invariants). Everything else a query
# module transitively imports — operators/, functions/, sources/, io,
# session — IS part of what the driver proved, so a tail query's
# evidence is invalidated when any of it changes (ADVICE r04: hashing
# only the query fn let shared-helper edits slip past the pin).
_CLOSURE_EXCLUDE = {f"{_PKG}.plans.registry"}


def source_hash(fn) -> str:
    return hashlib.sha256(inspect.getsource(fn).encode("utf-8")).hexdigest()


def _module_path(mod: str) -> str | None:
    """Filesystem path of a package module, or None if not ours."""
    if not (mod == _PKG or mod.startswith(_PKG + ".")):
        return None
    base = os.path.join(_REPO, *mod.split("."))
    if os.path.isfile(base + ".py"):
        return base + ".py"
    init = os.path.join(base, "__init__.py")
    return init if os.path.isfile(init) else None


@lru_cache(maxsize=None)
def _direct_imports(mod: str) -> tuple[str, ...]:
    """Package-internal modules ``mod`` imports, by AST (the package
    uses absolute imports only — asserted by the closure tests)."""
    path = _module_path(mod)
    if path is None:
        return ()
    with open(path, encoding="utf-8") as f:
        tree = ast.parse(f.read())
    found: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                if _module_path(a.name):
                    found.add(a.name)
        elif isinstance(node, ast.ImportFrom) and node.module:
            if node.level:  # relative import — not used in this package
                raise ValueError(f"relative import in {mod}; closure assumes absolute")
            if _module_path(node.module):
                found.add(node.module)
                # `from pkg.mod import name` may also bind a submodule
                for a in node.names:
                    sub = f"{node.module}.{a.name}"
                    if _module_path(sub):
                        found.add(sub)
    return tuple(sorted(found - _CLOSURE_EXCLUDE))


@lru_cache(maxsize=None)
def _file_hash(path: str) -> str:
    with open(path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def module_closure(mod: str) -> tuple[str, ...]:
    """Transitive package-internal import closure of ``mod``, including
    ``mod`` itself, excluding _CLOSURE_EXCLUDE."""
    seen: set[str] = set()
    stack = [mod]
    while stack:
        m = stack.pop()
        if m in seen or m in _CLOSURE_EXCLUDE or _module_path(m) is None:
            continue
        seen.add(m)
        stack.extend(_direct_imports(m))
    return tuple(sorted(seen))


def deps_hash(fn) -> str:
    """Hash of every package source file in the query's module closure:
    pins tail evidence to shared operator/helper code, not just the
    query fn body."""
    mod = getattr(fn, "__module__", "")
    lines = [f"{m}:{_file_hash(_module_path(m))}" for m in module_closure(mod)]
    return hashlib.sha256("\n".join(lines).encode("utf-8")).hexdigest()


def _round_file(rnd: str) -> str:
    """Round id -> evidence file basename. Plain ids (``r05``) come from
    driver CORRECTNESS files; ``+reverify``-suffixed ids come from
    optimization-round REVERIFY files (tools/reverify_drift.py — the
    locally-generated, oracle-checked evidence that re-pins hashes when
    shared operator code is edited under the results-must-not-change
    contract)."""
    if rnd.endswith("+reverify"):
        return f"REVERIFY_{rnd.removesuffix('+reverify')}.json"
    return f"CORRECTNESS_{rnd}.json"


def green_rounds() -> dict[str, list[str]]:
    """name -> sorted rounds with a GREEN driver row: the value hash
    matched (``hash_match is True``), or the row is a documented
    rows-only check (``err == "no_oracle"``). A row with ``err: None``
    but ``hash_match: false`` is a driver FAIL and must NOT pin
    evidence (VERDICT r10 item 3: the r10 ml_gbdt_stump_boost row had
    exactly that shape and would otherwise become "driver-proven").
    REVERIFY files (optimization rounds) count with a ``+reverify``
    round tag under the same green predicate."""
    out: dict[str, set[str]] = {}
    paths = [
        (p, "") for p in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")))
    ] + [
        (p, "+reverify")
        for p in sorted(glob.glob(os.path.join(_REPO, "REVERIFY_r*.json")))
    ]
    for path, tag in paths:
        rnd = (
            os.path.basename(path)
            .removeprefix("CORRECTNESS_")
            .removeprefix("REVERIFY_")
            .removesuffix(".json")
            + tag
        )
        with open(path) as f:
            rows = json.load(f)
        for name, r in rows.items():
            if r.get("err") == "no_oracle" or (
                r.get("err") is None and r.get("hash_match") is True
            ):
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
        if isinstance(cur, str):  # legacy callers (unit tests) pass fn hash only
            cur = {"sha256": cur}
        stored = prev["queries"].get(name)
        # A hash may silently refresh only if every PINNED component is
        # unchanged; a missing component in the stored entry is a format
        # upgrade (deps_sha256 added round 5) and is populated in place.
        unchanged = stored is not None and all(
            k not in stored or stored[k] == v for k, v in cur.items()
        )
        if stored is None or unchanged:
            entry = {**cur, "rounds": rounds}
            # r13 (ADVICE r12): a provisional (reverify-pinned) entry
            # stays provisional until a NEW driver CORRECTNESS file
            # carries a green row for it — local reverify evidence can
            # re-pin a hash but never launders it into "driver-proven".
            if stored is not None and stored.get("provisional"):
                confirmed = any(
                    not r.endswith("+reverify") and _round_file(r) in new_files
                    for r in rounds
                )
                if not confirmed:
                    entry["provisional"] = True
            out[name] = entry
        else:
            fresh_rounds = [r for r in rounds if _round_file(r) in new_files]
            if fresh_rounds:
                entry = {**cur, "rounds": rounds}
                if all(r.endswith("+reverify") for r in fresh_rounds):
                    # re-pinned on local evidence only: tag it so the
                    # next driver CORRECTNESS green row must confirm it
                    entry["provisional"] = True
                out[name] = entry
            else:
                refused.append(name)
                out[name] = stored  # keep the evidenced hash
    return out, refused


def main() -> int:
    sys.path.insert(0, _REPO)
    from spotify_data_pipeline_spark.plans import all_queries

    correctness_files = sorted(
        os.path.basename(p)
        for pat in ("CORRECTNESS_r*.json", "REVERIFY_r*.json")
        for p in glob.glob(os.path.join(_REPO, pat))
    )
    prev: dict = {"_meta": {"correctness_files": []}, "queries": {}}
    if os.path.exists(SNAPSHOT):
        with open(SNAPSHOT) as f:
            prev = json.load(f)

    current_hashes = {
        name: {"sha256": source_hash(q.fn), "deps_sha256": deps_hash(q.fn)}
        for name, q in all_queries().items()
    }
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
