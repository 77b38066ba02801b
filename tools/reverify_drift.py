#!/usr/bin/env python
"""Re-verify drifted queries against their DuckDB oracles and record
the result as REVERIFY_r{N}.json — the optimization-round counterpart
of a driver CORRECTNESS file.

Build rounds rotate edited queries into the driver's 50-slot evidence
window; an OPTIMIZATION round instead edits shared operator/plan code
under the constraint that NO query's result may change, and the driver
re-checks every declared query after the round. The evidence-hash pin
(tools/snapshot_evidence.py) still needs fresh machine-checked evidence
before it will re-pin a drifted hash — this tool produces it:

1. diff every query's current (sha256, deps_sha256) against
   tests/evidence_hashes.json;
2. for each drifted name, run the DRIVER-SHAPED comparison at the gate
   SF (tests/oracle_check.compare: row count + column set +
   order-insensitive values, integers exact) against the UNCHANGED
   oracle SQL; rows-only queries must produce a non-vacuous result;
3. write REVERIFY_r{N}.json with CORRECTNESS-shaped rows; a FAIL row
   (hash_match false / err set) never re-pins anything.

tools/snapshot_evidence.py treats REVERIFY files exactly like
CORRECTNESS files when deciding whether fresh evidence exists, so the
refusal rule is unchanged: a hash refresh still requires a new file
with a green row, it just may be this tool's locally-generated one.
The external driver independently re-proves every row after the round.

Usage: python tools/reverify_drift.py r12 [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def _snapshot_tool():
    spec = importlib.util.spec_from_file_location(
        "snapshot_evidence", os.path.join(_REPO, "tools", "snapshot_evidence.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> int:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "r12"
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]

    from spotify_data_pipeline_spark.plans import all_queries
    from spotify_data_pipeline_spark.session import get_spark
    from tests.oracle_check import compare, run_oracle

    tool = _snapshot_tool()
    with open(os.path.join(_REPO, "tests", "evidence_hashes.json")) as f:
        snapshot = json.load(f)["queries"]

    qs = all_queries()
    drifted = []
    for name, q in qs.items():
        stored = snapshot.get(name)
        if stored is None:
            drifted.append(name)
            continue
        if stored.get("sha256") != tool.source_hash(q.fn) or (
            "deps_sha256" in stored and stored["deps_sha256"] != tool.deps_hash(q.fn)
        ):
            drifted.append(name)
    print(f"{len(drifted)} drifted queries to re-verify at {sf_dir}")
    if not drifted:
        return 0

    spark = get_spark(app_name=f"reverify-{rnd}")
    rows: dict[str, dict] = {}
    n_fail = 0
    for name in drifted:
        q = qs[name]
        row: dict = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            df = q.fn(spark, sf_dir)
            if q.oracle is None:
                n = df.count()
                row["spark_rows"] = n
                if n > 0 and len(df.schema.fields) > 0:
                    row["err"] = "no_oracle"
                else:
                    row["err"] = "no_oracle_vacuous_result"
                    n_fail += 1
            else:
                oracle = run_oracle(q.oracle, sf_dir)
                errs = compare(df, oracle)
                row["oracle_rows"] = len(oracle)
                if errs:
                    row["rows_match"] = row["schema_match"] = row["hash_match"] = False
                    row["err"] = "; ".join(errs)[:500]
                    n_fail += 1
                else:
                    row["rows_match"] = row["schema_match"] = row["hash_match"] = True
        except Exception as e:  # noqa: BLE001 — record, keep verifying
            row["err"] = f"{type(e).__name__}: {e}"[:500]
            n_fail += 1
        rows[name] = row
        green = row["err"] == "no_oracle" or (
            row["err"] is None and row["hash_match"] is True
        )
        print(name, "GREEN" if green else f"FAIL: {row['err']}", flush=True)

    out_path = os.path.join(_REPO, f"REVERIFY_{rnd}.json")
    with open(out_path, "w") as f:
        json.dump(rows, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {out_path}: {len(rows)} rows, {n_fail} failures")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
