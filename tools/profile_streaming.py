"""One-shot micro-bench of the streaming operators (VERDICT r12 item 8).

Runs each streaming/events.py operator end-to-end over the sf0.1 events
parquet with an availableNow trigger and a noop sink — the whole input
is processed in bounded micro-batches and the query self-terminates, so
the wall time is the batch-equivalent cost of the streaming plan
(state store + watermark machinery included, sink excluded).

The TWS operators (transformWithStateInPandas: tws_counts,
tws_sessions, running_user_totals_tws) are gated on google.protobuf,
which this container does not ship — they are skipped with a note when
the import fails (same seam the tests importorskip on).

Usage: python tools/profile_streaming.py [sf_dir]
Writes one JSON line per operator to stdout.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> None:
    _load_protobuf_shim()
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from spotify_data_pipeline_spark.streaming import events as sev

    n_rows = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    print(json.dumps({"op": "_input", "rows": n_rows, "sf_dir": sf_dir, "cpus": cpus}))

    def run(name, build, timeout_s=600):
        ckpt = tempfile.mkdtemp(prefix=f"ck_{name}_")
        try:
            stream = sev.read_events_stream(spark, sf_dir)
            out = build(stream)
            spark.sparkContext.setJobDescription(f"stream_{name}")
            t0 = time.time()
            q = (
                out.writeStream.format("noop")
                .outputMode("append" if name not in _UPDATE_MODE else "update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(timeout_s)
            dt = time.time() - t0
            rows = sum(
                p.numInputRows for p in (q.recentProgress or [])
            )
            print(
                json.dumps(
                    {"op": name, "sec": round(dt, 2), "input_rows": rows},
                )
            )
        except Exception as exc:  # noqa: BLE001 — record and continue
            print(json.dumps({"op": name, "error": f"{type(exc).__name__}: {exc}"[:300]}))
        finally:
            shutil.rmtree(ckpt, ignore_errors=True)

    _UPDATE_MODE = {"running_user_totals", "running_user_totals_tws", "type_counts_tws"}

    run("tumbling_counts", sev.tumbling_counts)
    run("session_aggregate", sev.session_aggregate)
    run("dedup_within_watermark", sev.dedup_within_watermark)
    run("purchase_window_join", sev.purchase_window_join)
    run("purchase_window_join_outer", sev.purchase_window_join_outer)
    run("purchase_window_join_full", sev.purchase_window_join_full)
    run("running_user_totals", sev.running_user_totals)
    run("session_close_stats", sev.session_close_stats)

    try:
        import google.protobuf  # noqa: F401

        from spotify_data_pipeline_spark.streaming.tws_counts import type_counts_tws

        # transformWithStateInPandas requires the RocksDB state store
        # (multiple column families) — same per-run conf the tests set
        key = "spark.sql.streaming.stateStore.providerClass"
        prior = spark.conf.get(key, None)
        spark.conf.set(
            key,
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        try:
            from spotify_data_pipeline_spark.streaming.tws_sessions import (
                gap_sessions_tws,
            )

            run("type_counts_tws", type_counts_tws)
            run("running_user_totals_tws", sev.running_user_totals_tws)
            run("gap_sessions_tws", gap_sessions_tws)
        finally:
            if prior is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prior)
    except ImportError:
        print(json.dumps({"op": "tws_family", "skipped": "google.protobuf not installed"}))

    spark.stop()


def _load_protobuf_shim() -> None:
    """The TWS state protocol needs google.protobuf; this container
    ships it only via the test shim (vendor/sitecustomize.py — same
    aliasing tests/conftest.py does). Must run before any SparkSession
    exists so PYTHONPATH reaches the JVM-spawned Python workers."""
    import runpy

    vendor = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "vendor"
    )
    if not os.path.isdir(vendor):
        return
    if vendor not in sys.path:
        sys.path.insert(0, vendor)
    pp = os.environ.get("PYTHONPATH", "")
    if vendor not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = vendor + (os.pathsep + pp if pp else "")
    if "google.protobuf" not in sys.modules:
        runpy.run_path(os.path.join(vendor, "sitecustomize.py"))


if __name__ == "__main__":
    main()
