"""Incremental join maintenance (operators/ivm.py): the fold must be
BAG-equal to a full rebuild for any insert-only split — duplicate join
keys (multiplicities multiply), keys only in one side, empty deltas."""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spotify_data_pipeline_spark.operators.ivm import join_delta, maintain_join


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def _bag(df):
    return Counter(tuple(r) for r in df.collect())


def _full_join_bag(a_rows, b_rows):
    out = Counter()
    for k, av in a_rows:
        for k2, bv in b_rows:
            if k == k2:
                out[(k, av, bv)] += 1
    return out


A_SCHEMA = "k long, av long"
B_SCHEMA = "k long, bv long"


def test_fold_equals_rebuild_with_duplicates(spark):
    a_old = [(1, 10), (1, 11), (2, 20)]
    da = [(1, 12), (3, 30)]
    b_old = [(1, 100), (3, 300)]
    db = [(1, 101), (2, 200)]
    view_old = _df(spark, a_old, A_SCHEMA).join(_df(spark, b_old, B_SCHEMA), "k")
    maintained = maintain_join(
        view_old,
        _df(spark, a_old, A_SCHEMA),
        _df(spark, da, A_SCHEMA),
        _df(spark, b_old, B_SCHEMA),
        _df(spark, db, B_SCHEMA),
        ["k"],
    )
    assert _bag(maintained) == _full_join_bag(a_old + da, b_old + db)


def test_single_sided_delta(spark):
    a_old = [(1, 10)]
    da = [(2, 20), (2, 21)]
    b_old = [(2, 200), (2, 201)]
    view_old = _df(spark, a_old, A_SCHEMA).join(_df(spark, b_old, B_SCHEMA), "k")
    maintained = maintain_join(
        view_old,
        _df(spark, a_old, A_SCHEMA),
        _df(spark, da, A_SCHEMA),
        _df(spark, b_old, B_SCHEMA),
        None,
        ["k"],
    )
    assert _bag(maintained) == _full_join_bag(a_old + da, b_old)


def test_no_delta_raises(spark):
    a = _df(spark, [(1, 1)], A_SCHEMA)
    b = _df(spark, [(1, 1)], B_SCHEMA)
    with pytest.raises(ValueError, match="no delta"):
        join_delta(a, None, b, None, ["k"])


def test_column_overlap_rejected(spark):
    a = _df(spark, [(1, 1)], "k long, x long")
    b = _df(spark, [(1, 1)], "k long, x long")
    with pytest.raises(ValueError, match="overlap"):
        join_delta(a, a, b, None, ["k"])


def test_missing_key_rejected(spark):
    a = _df(spark, [(1, 1)], A_SCHEMA)
    b = _df(spark, [(1, 1)], "j long, bv long")
    with pytest.raises(ValueError, match="missing"):
        join_delta(a, a, b, None, ["k"])


_rows = st.lists(
    st.tuples(st.integers(0, 4), st.integers(0, 99)), min_size=0, max_size=12
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(a=_rows, b=_rows, cut_a=st.integers(0, 12), cut_b=st.integers(0, 12))
def test_property_any_split_folds_to_rebuild(spark, a, b, cut_a, cut_b):
    ca, cb = min(cut_a, len(a)), min(cut_b, len(b))
    a_old, da = a[:ca], a[ca:]
    b_old, db = b[:cb], b[cb:]
    sa = spark.createDataFrame(a_old, A_SCHEMA) if a_old else spark.createDataFrame([], A_SCHEMA)
    sda = spark.createDataFrame(da, A_SCHEMA) if da else spark.createDataFrame([], A_SCHEMA)
    sb = spark.createDataFrame(b_old, B_SCHEMA) if b_old else spark.createDataFrame([], B_SCHEMA)
    sdb = spark.createDataFrame(db, B_SCHEMA) if db else spark.createDataFrame([], B_SCHEMA)
    view_old = sa.join(sb, "k")
    maintained = maintain_join(view_old, sa, sda, sb, sdb, ["k"])
    assert _bag(maintained) == _full_join_bag(a, b)


def test_null_join_keys_fold_like_rebuild(spark):
    """NULL keys never match in an equi join — the fold must drop them
    exactly like the rebuild does (on BOTH sides and in deltas)."""
    a_old = [(None, 1), (1, 10)]
    da = [(None, 2), (1, 11)]
    b_old = [(1, 100), (None, 900)]
    db = [(None, 901)]
    sa = spark.createDataFrame(a_old, A_SCHEMA)
    sda = spark.createDataFrame(da, A_SCHEMA)
    sb = spark.createDataFrame(b_old, B_SCHEMA)
    sdb = spark.createDataFrame(db, B_SCHEMA)
    maintained = maintain_join(sa.join(sb, "k"), sa, sda, sb, sdb, ["k"])
    want = _full_join_bag(
        [(k, v) for k, v in a_old + da if k is not None],
        [(k, v) for k, v in b_old + db if k is not None],
    )
    assert _bag(maintained) == want
