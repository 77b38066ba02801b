#!/usr/bin/env python
"""Benchmark the headline queries.

Runs every ``headline=True`` declared query at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and
prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": ...}

Execution is forced with the noop sink (full pipeline runs, nothing
collected to the driver). Each query runs once after a warm-up of the
session (JVM + parquet footer caches are shared, as they would be on a
long-running cluster).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spotify_data_pipeline_spark.plans.registry import headline_queries
from spotify_data_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")

    spark = get_spark(app_name="bench")

    # Warm up the session the way a long-running cluster is warm: JVM
    # JIT + codegen infrastructure + the parquet read path (footer
    # parsing, vectorized reader classes) via a tiny-scale scan of every
    # table. Timed queries then measure the plans, not class loading.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from spotify_data_pipeline_spark.io import TABLES, load_table

    for t in TABLES:
        load_table(spark, "/root/testdata/sf0.001", t).count()

    timings: dict[str, float] = {}
    for name, q in sorted(headline_queries().items()):
        t0 = time.perf_counter()
        df = q.fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
