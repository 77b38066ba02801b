#!/usr/bin/env python
"""Round-13 optimization profiler: like tools/profile_headliners.py but
for ANY declared query (the r12 tool resolved names against the
headline registry only, which the non-headline sweep had to work
around). For every name passed (or all headliners by default):

  - builds the DataFrame, captures .explain("formatted") to
    plans/r13/<name>_<tag>.txt (tag = --tag, default 'before'),
  - times construction (Python/py4j plan building) separately from
    first noop execution (analysis + codegen + run) and, unless
    --quick, a warm median-of-3,
  - records exchange count / BNLJ count / python-eval presence, and
    whether the EXECUTED plan contains ReusedExchange (the AQE
    runtime-dedup signal VERDICT r12 item 4 asks to verify).

Emits one JSON line per query to stdout and a summary to
/tmp/profile_<tag>.json. Run on an idle host.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spotify_data_pipeline_spark.plans import all_queries
from spotify_data_pipeline_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    tag = "before"
    quick = "--quick" in sys.argv
    for a in sys.argv[1:]:
        if a.startswith("--tag="):
            tag = a.split("=", 1)[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13"
    )
    os.makedirs(plans_dir, exist_ok=True)

    spark = get_spark(app_name=f"profile-{tag}")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    # same session warm-up as bench._cold_pass: compile noop/codegen/AQE
    # infra so the first profiled query isn't charged for it
    spark.range(100_000).selectExpr("id % 7 AS k", "id AS v").groupBy(
        "k"
    ).sum("v").write.format("noop").mode("overwrite").save()
    from spotify_data_pipeline_spark.io import TABLES, load_table

    for t in TABLES:
        load_table(spark, "/root/testdata/sf0.001", t).count()

    qs = all_queries()
    names = args or sorted(n for n, q in qs.items() if getattr(q, "headline", False))
    out = {}
    for name in names:
        q = qs[name]
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        df = q.fn(spark, sf_dir)
        t_build = time.perf_counter() - t0
        plan_txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan_txt)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t_first = time.perf_counter() - t0
        runs = []
        if not quick:
            for _ in range(3):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
        warm = sorted(runs)[1] if runs else None
        p = df._jdf.queryExecution().executedPlan().toString()
        rec = {
            "build_s": round(t_build, 3),
            "first_s": round(t_first, 3),
            "warm_s": round(warm, 3) if warm is not None else None,
            "warm_runs": [round(r, 3) for r in runs],
            "exchanges": plan_txt.count("Exchange"),
            "bnlj": p.count("BroadcastNestedLoopJoin"),
            "reused_exchange": "ReusedExchange" in p,
            "python_eval": ("BatchEvalPython" in plan_txt)
            or ("ArrowEvalPython" in plan_txt),
            "loadavg1": round(os.getloadavg()[0], 2),
        }
        out[name] = rec
        print(json.dumps({name: rec}), flush=True)
        spark.sparkContext.setJobDescription(None)
    with open(f"/tmp/profile_{tag}.json", "w") as f:
        json.dump(
            {"sf_dir": sf_dir, "loadavg": os.getloadavg(), "queries": out}, f, indent=1
        )
    tot = {
        "build": round(sum(r["build_s"] for r in out.values()), 2),
        "first": round(sum(r["first_s"] for r in out.values()), 2),
        "warm": round(sum(r["warm_s"] for r in out.values() if r["warm_s"]), 2),
    }
    print(json.dumps({"totals": tot}))


if __name__ == "__main__":
    main()
