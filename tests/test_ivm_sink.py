"""Maintained-join sink (streaming/ivm_sink.py): the view after any
interleaving of fact/dim insert batches equals a full rebuild (bag
semantics), batch retries are idempotent, and schemas with
parameterized types survive the DDL round-trip."""

from __future__ import annotations

from collections import Counter

import pytest

from spotify_data_pipeline_spark.streaming.ivm_sink import MaintainedJoin

A_SCHEMA = "k long, av long"
B_SCHEMA = "k long, bv long"


def _bag(df):
    return Counter(tuple(r) for r in df.select("k", "av", "bv").collect())


def _mj(spark, tmp_path):
    return MaintainedJoin(spark, str(tmp_path), ["k"], A_SCHEMA, B_SCHEMA)


def test_fact_then_dim_then_fact(spark, tmp_path):
    mj = _mj(spark, tmp_path)
    mj.apply_fact_batch(spark.createDataFrame([(1, 10), (2, 20)], A_SCHEMA), 0)
    assert mj.view().count() == 0  # dim still empty
    mj.apply_dim_batch(spark.createDataFrame([(1, 100), (3, 300)], B_SCHEMA), 1)
    mj.apply_fact_batch(spark.createDataFrame([(1, 11), (3, 30)], A_SCHEMA), 2)
    assert _bag(mj.view()) == _bag(mj.rebuild())
    assert _bag(mj.view()) == Counter(
        {(1, 10, 100): 1, (1, 11, 100): 1, (3, 30, 300): 1}
    )


def test_duplicate_keys_multiply(spark, tmp_path):
    mj = _mj(spark, tmp_path)
    mj.apply_dim_batch(spark.createDataFrame([(1, 100), (1, 101)], B_SCHEMA), 0)
    mj.apply_fact_batch(spark.createDataFrame([(1, 10), (1, 10)], A_SCHEMA), 1)
    assert _bag(mj.view()) == _bag(mj.rebuild())
    assert sum(_bag(mj.view()).values()) == 4
    assert _bag(mj.view())[(1, 10, 100)] == 2


@pytest.mark.parametrize(
    "order", [("f", "f", "d", "d"), ("d", "f", "d", "f"), ("f", "d", "f", "d")]
)
def test_interleavings_fold_to_rebuild(spark, tmp_path, order):
    facts = iter([[(1, 10), (2, 20)], [(2, 21), (4, 40)]])
    dims = iter([[(1, 100), (2, 200)], [(2, 201), (4, 400)]])
    mj = _mj(spark, tmp_path)
    for i, kind in enumerate(order):
        if kind == "f":
            mj.apply_fact_batch(spark.createDataFrame(next(facts), A_SCHEMA), i)
        else:
            mj.apply_dim_batch(spark.createDataFrame(next(dims), B_SCHEMA), i)
    assert _bag(mj.view()) == _bag(mj.rebuild())
    # k=1 pairs 1x1, k=2 pairs 2x2, k=4 pairs 1x1 => 6 total
    assert sum(_bag(mj.view()).values()) == 6


def test_batch_retry_is_idempotent(spark, tmp_path):
    """The at-least-once foreachBatch contract: re-applying the same
    batch (same id, same content) must not duplicate view rows —
    per-batch overwrite directories make the retry a no-op."""
    mj = _mj(spark, tmp_path)
    mj.apply_dim_batch(spark.createDataFrame([(1, 100)], B_SCHEMA), 0)
    fact = spark.createDataFrame([(1, 10)], A_SCHEMA)
    mj.apply_fact_batch(fact, 1)
    before = _bag(mj.view())
    mj.apply_fact_batch(fact, 1)  # retry
    assert _bag(mj.view()) == before
    mj.apply_dim_batch(spark.createDataFrame([(1, 101)], B_SCHEMA), 2)
    mid = _bag(mj.view())
    mj.apply_dim_batch(spark.createDataFrame([(1, 101)], B_SCHEMA), 2)  # retry
    assert _bag(mj.view()) == mid
    assert _bag(mj.view()) == _bag(mj.rebuild())


def test_parameterized_types_survive_schema_roundtrip(spark, tmp_path):
    """decimal(12,2) and map<string,int> columns — the DDL is parsed by
    Spark's own parser, so the empty-view read keeps exact types."""
    from decimal import Decimal

    mj = MaintainedJoin(
        spark,
        str(tmp_path),
        ["k"],
        "k long, price decimal(12, 2)",
        "k long, tags map<string, int>",
    )
    assert mj.view().count() == 0  # empty view parses the merged schema
    mj.apply_dim_batch(
        spark.createDataFrame([(1, {"x": 1})], "k long, tags map<string, int>"), 0
    )
    mj.apply_fact_batch(
        spark.createDataFrame(
            [(1, Decimal("12.34"))], "k long, price decimal(12, 2)"
        ),
        1,
    )
    row = mj.view().collect()[0]
    assert row.price == Decimal("12.34") and row.tags == {"x": 1}
    assert [f.name for f in mj.view().schema.fields] == ["k", "price", "tags"]


def test_foreachbatch_stream_wiring(spark, tmp_path):
    """End-to-end through a REAL Structured Streaming query: a file
    source of fact micro-batches (maxFilesPerTrigger=1) drives
    apply_fact_batch from foreachBatch with the engine-provided
    batch_id; the final view equals the batch rebuild."""
    import uuid

    src = tmp_path / "facts"
    spark.createDataFrame([(1, 10), (2, 20)], A_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src))
    spark.createDataFrame([(1, 11), (3, 30)], A_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))

    mj = MaintainedJoin(spark, str(tmp_path / "mj"), ["k"], A_SCHEMA, B_SCHEMA)
    mj.apply_dim_batch(
        spark.createDataFrame([(1, 100), (2, 200), (3, 300)], B_SCHEMA), 10_000
    )

    q = (
        spark.readStream.schema(A_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .writeStream.foreachBatch(
            lambda batch_df, batch_id: mj.apply_fact_batch(batch_df, batch_id)
        )
        .option("checkpointLocation", str(tmp_path / f"ckpt_{uuid.uuid4().hex}"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert _bag(mj.view()) == _bag(mj.rebuild())
    assert sum(_bag(mj.view()).values()) == 4  # all four facts joined
