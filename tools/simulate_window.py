#!/usr/bin/env python
"""Simulate the driver's CORRECTNESS gate over the CURRENT evidence
window — the one-command pre-flight for an activation round.

The external driver records the first 50 keys of
``__spark_entry__.queries()``; this tool runs exactly those 50 (or
``--all-new``: every query without a prior green row, wherever it
sits) through the driver-shaped comparison (rows + schema + value
hash vs the DuckDB oracle) at one or more SFs. It is the registry-
ordered twin of tools/dev_check_pending.py, which checks one staging
module at a time BEFORE activation; this runs AFTER the manifest edit,
against the exact window the driver will see.

Usage: python tools/simulate_window.py [sf_dir ...] [--all-new]
       (default SF: /root/testdata/sf0.01 — the driver's gate SF)

Exit nonzero on any failure or on a vacuous (0-oracle-row) result.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

from spotify_data_pipeline_spark.gatesf import GATE_SF_DIR, is_gate_sf  # noqa: E402


def _prior_green() -> set[str]:
    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            rows = json.load(f)
        for name, r in rows.items():
            # Green = hash actually matched, or documented rows-only
            # (err == "no_oracle"). A row with err None but a failed
            # hash is a driver FAIL and must not count (VERDICT r10).
            if r.get("err") == "no_oracle" or (
                r.get("err") is None and r.get("hash_match") is True
            ):
                green.add(name)
    return green


def _covered(names, queries) -> set[str]:
    """Prior-green names whose CURRENT code still matches the snapshot
    (tests/evidence_hashes.json) — a green row by name only covers the
    code the driver actually ran, so --all-new must NOT skip a query
    whose body or import closure drifted since its last green round
    (ADVICE r09). Names missing from the snapshot (e.g. run before the
    snapshot tool existed) fall back to green-by-name."""
    import importlib.util

    green = _prior_green()
    snap_path = os.path.join(_REPO, "tests", "evidence_hashes.json")
    if not os.path.isfile(snap_path):
        return green
    with open(snap_path) as f:
        snap = json.load(f).get("queries", {})
    spec = importlib.util.spec_from_file_location(
        "snapshot_evidence", os.path.join(_REPO, "tools", "snapshot_evidence.py")
    )
    tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tool)
    covered: set[str] = set()
    for name in names:
        if name not in green:
            continue
        pin = snap.get(name)
        if pin is None:
            covered.add(name)  # pre-snapshot evidence: name-only
            continue
        fn = queries[name]
        # A pin lacking deps_sha256 must count as NOT covered — defaulting
        # to a self-match would silently skip import-closure drift
        # detection for a partially-written snapshot (ADVICE r10).
        pinned_deps = pin.get("deps_sha256")
        if pinned_deps is None:
            print(f"warning: pin for {name} lacks deps_sha256 — treating as not covered")
            continue
        if tool.source_hash(fn) == pin["sha256"] and tool.deps_hash(fn) == pinned_deps:
            covered.add(name)
    return covered


def main() -> int:
    args = [a for a in sys.argv[1:]]
    all_new = "--all-new" in args
    sf_dirs = [a for a in args if not a.startswith("--")] or [GATE_SF_DIR]

    import __spark_entry__ as e
    from pyspark.sql import SparkSession

    from oracle_check import compare, run_oracle

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "6g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs, osql = e.queries(), e.oracle_sql()
    names = list(qs)
    if all_new:
        covered = _covered(names, qs)
        targets = [n for n in names if n not in covered]
    else:
        targets = names[:50]

    failures = 0
    for sf in sf_dirs:
        for name in targets:
            t0 = time.time()
            try:
                if name not in osql:
                    n = qs[name](spark, sf).count()
                    # 0 rows is vacuous for a rows-only query too — the
                    # driver's weak check would "pass" it having proven
                    # nothing (ADVICE r09: `n >= 0` was always true).
                    # Hard-FAIL only at the driver's gate SF (sf0.01);
                    # at other spot-check SFs a legitimately-empty small
                    # result is a warning, not a failure (ADVICE r10).
                    # Gate detection is the shared named constant, not a
                    # path-suffix match (ADVICE r11).
                    if n == 0:
                        if is_gate_sf(sf):
                            failures += 1
                            print(f"FAIL {sf} {name}: vacuous (0 rows, rows-only)")
                        else:
                            print(f"warning {sf} {name}: 0 rows (rows-only, non-gate SF)")
                    else:
                        print(f"ok(rows-only) {sf} {name} ({time.time()-t0:.1f}s, {n} rows)")
                    continue
                result = qs[name](spark, sf)
                oracle = run_oracle(osql[name], sf)
                errs = compare(result, oracle)
                dt = time.time() - t0
                if errs:
                    failures += 1
                    print(f"FAIL {sf} {name} ({dt:.1f}s): " + "; ".join(errs)[:400])
                elif len(oracle) == 0:
                    failures += 1
                    print(f"FAIL {sf} {name}: vacuous (0 oracle rows)")
                else:
                    print(f"ok   {sf} {name} ({dt:.1f}s, {len(oracle)} rows)")
            except Exception as exc:  # noqa: BLE001 — report and continue
                failures += 1
                print(f"FAIL {sf} {name}: {type(exc).__name__}: {exc}"[:400])
    print(f"window queries checked: {len(targets)} x {len(sf_dirs)} SFs; failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
