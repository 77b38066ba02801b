"""Maintained-join sink (streaming/ivm_sink.py): the view after any
interleaving of fact/dim insert batches equals a full rebuild, bag
semantics included."""

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
    mj.apply_fact_batch(spark.createDataFrame([(1, 10), (2, 20)], A_SCHEMA))
    assert mj.view().count() == 0  # dim still empty
    mj.apply_dim_batch(spark.createDataFrame([(1, 100), (3, 300)], B_SCHEMA))
    mj.apply_fact_batch(spark.createDataFrame([(1, 11), (3, 30)], A_SCHEMA))
    assert _bag(mj.view()) == _bag(mj.rebuild())
    assert _bag(mj.view()) == Counter(
        {(1, 10, 100): 1, (1, 11, 100): 1, (3, 30, 300): 1}
    )


def test_duplicate_keys_multiply(spark, tmp_path):
    mj = _mj(spark, tmp_path)
    mj.apply_dim_batch(spark.createDataFrame([(1, 100), (1, 101)], B_SCHEMA))
    mj.apply_fact_batch(spark.createDataFrame([(1, 10), (1, 10)], A_SCHEMA))
    assert _bag(mj.view()) == _bag(mj.rebuild())
    assert sum(_bag(mj.view()).values()) == 4
    assert _bag(mj.view())[(1, 10, 100)] == 2


@pytest.mark.parametrize(
    "order", [("f", "f", "d", "d"), ("d", "f", "d", "f"), ("f", "d", "f", "d")]
)
def test_interleavings_fold_to_rebuild(spark, tmp_path, order):
    facts = iter(
        [[(1, 10), (2, 20)], [(2, 21), (4, 40)]]
    )
    dims = iter([[(1, 100), (2, 200)], [(2, 201), (4, 400)]])
    mj = _mj(spark, tmp_path)
    for kind in order:
        if kind == "f":
            mj.apply_fact_batch(spark.createDataFrame(next(facts), A_SCHEMA))
        else:
            mj.apply_dim_batch(spark.createDataFrame(next(dims), B_SCHEMA))
    assert _bag(mj.view()) == _bag(mj.rebuild())
    # and the rebuild really is the full cross of all batches
    assert sum(_bag(mj.view()).values()) == 1 + 2 * 2 + 1  # k=1:1, k=2:2x2? see below


def test_view_matches_rebuild_exactly_for_param_cases(spark, tmp_path):
    # sanity on the arithmetic in the interleaving test: k=1 pairs 1x1,
    # k=2 pairs 2x2, k=4 pairs 1x1 => 1 + 4 + 1 = 6
    mj = _mj(spark, tmp_path)
    mj.apply_fact_batch(spark.createDataFrame([(1, 10), (2, 20)], A_SCHEMA))
    mj.apply_fact_batch(spark.createDataFrame([(2, 21), (4, 40)], A_SCHEMA))
    mj.apply_dim_batch(spark.createDataFrame([(1, 100), (2, 200)], B_SCHEMA))
    mj.apply_dim_batch(spark.createDataFrame([(2, 201), (4, 400)], B_SCHEMA))
    assert sum(_bag(mj.view()).values()) == 6
    assert _bag(mj.view()) == _bag(mj.rebuild())
