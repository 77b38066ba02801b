"""streaming/tws_counts.py — MapState running counters on
transformWithStateInPandas, equivalence-pinned against the batch
groupBy twin (latest Update-mode row per key == batch totals)."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.streaming.tws_counts import type_counts_tws

pytest.importorskip(
    "google.protobuf",
    reason="TWS state protocol needs protobuf (vendor shim absent?)",
)

_SCHEMA = "event_id long, user_id long, event_type string, value double"

_B1 = [
    (1, 10, "view", 1.0),
    (2, 10, "view", 2.0),
    (3, 10, "purchase", 10.0),
    (4, 11, "view", 3.0),
]
_B2 = [
    (5, 10, "view", 4.0),
    (6, 11, "purchase", 20.0),
    (7, 11, "view", 5.0),
    (8, 12, "click", 0.5),
]


@pytest.fixture(scope="module")
def counts_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tws_counts") / "ev")
    for i, rows in enumerate((_B1, _B2)):
        spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(d)
    return d


def test_tws_map_state_counts_match_batch_twin(spark, counts_dir):
    prior = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema(_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(counts_dir)
        )
        name = f"t_tws_counts_{uuid.uuid4().hex[:8]}"
        q = (
            type_counts_tws(stream)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", f"/tmp/ckpt_{name}")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        rows = spark.sql(f"SELECT * FROM {name}").collect()
    finally:
        if prior is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prior)

    # Update mode appends one row per touched key per batch into the
    # memory sink; running totals are monotone in n_events, so the
    # LATEST row per key is the one with max n_events.
    latest: dict[tuple, tuple] = {}
    for r in rows:
        k = (r.user_id, r.event_type)
        if k not in latest or r.n_events > latest[k][0]:
            latest[k] = (r.n_events, r.total_value)

    twin = {
        (r.user_id, r.event_type): (r.n, r.v)
        for r in spark.createDataFrame(_B1 + _B2, _SCHEMA)
        .groupBy("user_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("v"),
        )
        .collect()
    }
    assert latest == twin
    # the running-total contract is live: user 10's 'view' count was
    # emitted at 2 after batch 1, then 3 after batch 2
    user10_views = sorted(
        r.n_events for r in rows if (r.user_id, r.event_type) == (10, "view")
    )
    assert user10_views == [2, 3]
    # batches that don't touch a key emit nothing for it
    assert (
        len([r for r in rows if (r.user_id, r.event_type) == (10, "purchase")]) == 1
    )
