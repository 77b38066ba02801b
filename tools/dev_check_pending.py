"""Dev harness: run a staging module's PENDING queries against their
DuckDB oracles at one or more SFs (the driver-shaped comparison).

Usage: python tools/dev_check_pending.py <module> [sf_dir ...] [--only name,name]
"""

from __future__ import annotations

import importlib
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    mod_name = sys.argv[1]
    args = sys.argv[2:]
    only = None
    sf_dirs = []
    for a in args:
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))
        else:
            sf_dirs.append(a)
    if not sf_dirs:
        sf_dirs = ["/root/testdata/sf0.001"]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "6g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    mod = importlib.import_module(
        f"spotify_data_pipeline_spark.plans.{mod_name}"
    )
    from tests.oracle_check import compare, run_oracle

    failures = 0
    for sf in sf_dirs:
        for pq in mod.PENDING:
            if only and pq.name not in only:
                continue
            t0 = time.time()
            try:
                result = pq.fn(spark, sf)
                oracle = run_oracle(pq.oracle, sf)
                errs = compare(result, oracle)
                dt = time.time() - t0
                if errs:
                    failures += 1
                    print(f"FAIL {sf} {pq.name} ({dt:.1f}s): " + "; ".join(errs)[:500])
                elif len(oracle) == 0:
                    failures += 1
                    print(f"VACUOUS {sf} {pq.name} ({dt:.1f}s): 0 oracle rows")
                else:
                    print(f"ok   {sf} {pq.name} ({dt:.1f}s, {len(oracle)} rows)")
            except Exception as e:  # noqa: BLE001
                failures += 1
                dt = time.time() - t0
                print(f"ERR  {sf} {pq.name} ({dt:.1f}s): {type(e).__name__}: {str(e)[:400]}")
    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
