#!/usr/bin/env python
"""One-shot runtime census of EVERY declared query at a given SF
(default sf0.1): build + single noop execution per query, sorted
slowest-first. Used in the r12 optimization round to find
non-headline queries with pathological local runtimes; not part of
the bench contract."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spotify_data_pipeline_spark.plans import all_queries
from spotify_data_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="census")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(100_000).selectExpr("id % 7 AS k", "id AS v").groupBy(
        "k"
    ).sum("v").write.format("noop").mode("overwrite").save()
    out = {}
    for name, q in all_queries().items():
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        try:
            df = q.fn(spark, sf_dir)
            t_build = time.perf_counter() - t0
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            out[name] = {
                "build_s": round(t_build, 3),
                "exec_s": round(time.perf_counter() - t0, 3),
            }
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": f"{type(e).__name__}: {e}"}
        print(json.dumps({name: out[name]}), flush=True)
    ranked = sorted(
        ((v.get("build_s", 0) + v.get("exec_s", 0), k) for k, v in out.items()),
        reverse=True,
    )
    with open("/tmp/census.json", "w") as f:
        json.dump(out, f, indent=1)
    print("TOP 30 slowest (build+exec):")
    for sec, name in ranked[:30]:
        print(f"  {sec:7.2f}  {name}")


if __name__ == "__main__":
    main()
