"""Salted equi-join (operators/saltjoin.py): result-equality with the
plain join (the entire point — salting is partition engineering, not
semantics), salt-count invariance, NULL-key safety on both sides, left
join null rows, and the plan facts (sort-merge on (key, _salt), no
broadcast of the replicated dim)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.operators.saltjoin import salted_equi_join

SF = "/root/testdata/sf0.001"


def _bag(df):
    # repr-keyed sort: total order even with NULLs / mixed columns
    return sorted((repr(tuple(r)) for r in df.collect()))


@pytest.fixture(scope="module")
def frames(spark):
    # skewed fact: key 1 is hot (60 rows), keys 2..5 have 5 each,
    # key 99 matches nothing, one NULL key
    rows = [Row(k=1, uid=i, v=i * 10) for i in range(60)]
    rows += [Row(k=kk, uid=100 * kk + i, v=i) for kk in (2, 3, 4, 5) for i in range(5)]
    rows += [Row(k=99, uid=9900, v=-1), Row(k=None, uid=9999, v=-2)]
    fact = spark.createDataFrame(rows)
    dim = spark.createDataFrame(
        [Row(dk=1, name="hot"), Row(dk=2, name="b"), Row(dk=3, name="c"),
         Row(dk=4, name="d"), Row(dk=5, name="e"), Row(dk=7, name="lonely"),
         Row(dk=None, name="nullkey")]
    )
    return fact, dim


def test_inner_equals_plain(spark, frames):
    fact, dim = frames
    salted = salted_equi_join(fact, dim, "k", "dk", 8, ("uid",))
    plain = fact.join(dim, fact["k"] == dim["dk"], "inner")
    assert _bag(salted.select("k", "uid", "v", "dk", "name")) == _bag(
        plain.select("k", "uid", "v", "dk", "name")
    )


def test_left_equals_plain(spark, frames):
    """Fact-preserving mode: unmatched fact rows (key 99, NULL key)
    keep exactly one null-extended row each — the salt must not
    multiply or drop them."""
    fact, dim = frames
    salted = salted_equi_join(fact, dim, "k", "dk", 8, ("uid",), how="left")
    plain = fact.join(dim, fact["k"] == dim["dk"], "left")
    assert _bag(salted.select("k", "uid", "v", "dk", "name")) == _bag(
        plain.select("k", "uid", "v", "dk", "name")
    )
    # the two unmatched fact rows survive exactly once
    nulls = salted.where(F.col("dk").isNull()).select("uid").collect()
    assert sorted(r.uid for r in nulls) == [9900, 9999]


def test_salt_count_invariance(spark, frames):
    fact, dim = frames
    one = salted_equi_join(fact, dim, "k", "dk", 1, ("uid",))
    many = salted_equi_join(fact, dim, "k", "dk", 13, ("uid",))
    assert _bag(one.select("k", "uid", "name")) == _bag(many.select("k", "uid", "name"))


def test_repartition_invariance(spark, frames):
    fact, dim = frames
    a = salted_equi_join(fact, dim, "k", "dk", 8, ("uid",))
    b = salted_equi_join(fact.repartition(7), dim.repartition(3), "k", "dk", 8, ("uid",))
    assert _bag(a.select("k", "uid", "name")) == _bag(b.select("k", "uid", "name"))


def test_plan_sort_merge_on_salt_no_broadcast(spark, frames):
    """The executed plan must show the salt riding the join key in a
    sort-merge join, and the replicated dim must NOT be broadcast
    (broadcasting it would undo the demonstration — the regime this
    operator exists for is dim-too-big-to-broadcast)."""
    fact, dim = frames
    plan = (
        salted_equi_join(fact, dim, "k", "dk", 8, ("uid",))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" in plan
    assert "_salt" in plan
    assert "BroadcastHashJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_spreader_actually_spreads(spark, frames):
    """The hot key's 60 rows land in >1 salt bucket (the whole point);
    a degenerate constant spreader would keep them in one."""
    fact, _ = frames
    n = (
        fact.where(F.col("k") == 1)
        .select(F.pmod(F.xxhash64("uid"), F.lit(8)).alias("s"))
        .distinct()
        .count()
    )
    assert n > 4


def test_bad_args_rejected(spark, frames):
    fact, dim = frames
    with pytest.raises(ValueError):
        salted_equi_join(fact, dim, "k", "dk", 0, ("uid",))
    with pytest.raises(ValueError):
        salted_equi_join(fact, dim, "k", "dk", 4, ("uid",), how="full")


def test_fixture_scale_equality(spark):
    """On the real tables: salted lineitem⋈supplier agg equals the
    plain-join agg (the staged query's claim, checked Spark-vs-Spark
    here; Spark-vs-DuckDB is the staged oracle test)."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    su = spark.read.parquet(f"{SF}/supplier.parquet")
    salted = (
        salted_equi_join(li, su, "l_suppkey", "s_suppkey", 8,
                         ("l_orderkey", "l_linenumber"))
        .groupBy("s_nationkey")
        .agg(F.count("*").alias("n"))
    )
    plain = (
        li.join(su, li["l_suppkey"] == su["s_suppkey"])
        .groupBy("s_nationkey")
        .agg(F.count("*").alias("n"))
    )
    assert _bag(salted) == _bag(plain)
