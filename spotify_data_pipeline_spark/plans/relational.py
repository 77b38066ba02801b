"""Relational surface: scans, projections, filters, joins, set ops, sorts.

Covers SURVEY.md §2.1 (S14), §2.2 (P1-P6), §2.3 (J1-J6), §2.6 (O1-O6),
§2.7 (U1-U3). Each query is declared with a DuckDB oracle; naming and
typing conventions are documented in plans/registry.py.

Scale notes (100 TB): every filter/projection here is expressed
declaratively so Catalyst pushes it into the parquet scan; dimension
joins (region/nation/customer at TPC-H proportions) are explicitly
``broadcast()``; the large-large joins (orders ⋈ lineitem) rely on
sort-merge + AQE skew splitting rather than a hand-rolled strategy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.io import load_table
from spotify_data_pipeline_spark.plans.parity import rnd
from spotify_data_pipeline_spark.plans.registry import declare

# ---------------------------------------------------------------------------
# Scans / projections / filters (S14, P1-P6)
# ---------------------------------------------------------------------------


@declare(
    "scan_pruned_projection",
    oracle="""
    SELECT l_orderkey, l_linenumber, floor((l_extendedprice) * 100 + 0.5) / 100 AS price
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2000-06-01'
    """,
    tags=("scan", "filter", "projection"),
)
def scan_pruned_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-pruned, predicate-pushed scan (SURVEY §2.1 S14, §2.2 P4).

    The point of this query is the *plan*: ReadSchema must contain only
    4 of lineitem's 11 columns and PushedFilters must carry the shipdate
    predicate — verified in tests/test_plans_physical.py.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(F.col("l_shipdate") >= F.lit("2000-06-01").cast("timestamp")).select(
        "l_orderkey",
        "l_linenumber",
        rnd("l_extendedprice", 2).alias("price"),
    )


@declare(
    "project_rename_schema_enforce",
    oracle="""
    SELECT
      c_custkey                        AS customer_id,
      upper(c_mktsegment)              AS segment,
      floor((c_acctbal) * 100 + 0.5) / 100              AS acctbal,
      CAST(c_nationkey AS BIGINT)      AS nation_id,
      CAST(NULL AS VARCHAR)            AS phone
    FROM customer
    """,
    tags=("projection",),
)
def project_rename_schema_enforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project + rename + schema-enforcing cast with null padding.

    Re-expresses the reference's `pd.DataFrame(data, columns=[...])`
    declared-schema projection (spotify_etl_v2.py:327-331 — selects,
    orders, casts, and pads missing columns with NULL) as a Spark
    select-with-cast (SURVEY §2.2 P1/P5).
    """
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("customer_id"),
        F.upper("c_mktsegment").alias("segment"),
        rnd("c_acctbal", 2).alias("acctbal"),
        F.col("c_nationkey").cast("long").alias("nation_id"),
        F.lit(None).cast("string").alias("phone"),
    )


@declare(
    "filter_null_and_predicates",
    oracle="""
    SELECT event_id, user_id, event_type, floor((value) * 100 + 0.5) / 100 AS value
    FROM events
    WHERE props IS NOT NULL AND value > 50.0 AND event_type <> 'error'
    """,
    tags=("filter",),
)
def filter_null_and_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-key + compound predicate filter (SURVEY §2.2 P4:
    spotify_etl_v2.py:85-87,218-220 keep rows with non-null/truthy keys)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.where(
        F.col("props").isNotNull() & (F.col("value") > 50.0) & (F.col("event_type") != "error")
    ).select("event_id", "user_id", "event_type", rnd("value", 2).alias("value"))


@declare(
    "filter_nonblank_text",
    oracle="""
    SELECT doc_id, source
    FROM documents
    WHERE length(trim(text)) > 0
    """,
    tags=("filter", "text"),
)
def filter_nonblank_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blank-line filter (SURVEY §2.2 P6: create_artist_batches.py:15-16)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.where(F.length(F.trim("text")) > 0).select("doc_id", "source")


# ---------------------------------------------------------------------------
# Joins (J1-J6)
# ---------------------------------------------------------------------------


@declare(
    "join_inner_denormalize",
    oracle="""
    SELECT c.c_custkey AS customer_id, c.c_name AS customer_name,
           n.n_name AS nation_name, r.r_name AS region_name
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
    headline=True,
    tags=("join", "broadcast"),
)
def join_inner_denormalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Denormalizing inner join — the reference materializes exactly this
    shape when it builds bridge tables carrying both sides' names
    (SURVEY §2.3 J1: spotify_etl_v2.py:172-183, 252-263).

    Scale: nation/region are tiny dims → explicit broadcast; the fact
    side never shuffles.
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            F.col("c_custkey").alias("customer_id"),
            F.col("c_name").alias("customer_name"),
            F.col("n_name").alias("nation_name"),
            F.col("r_name").alias("region_name"),
        )
    )


@declare(
    "join_left_with_agg",
    oracle="""
    SELECT c.c_custkey AS customer_id,
           CAST(coalesce(o.n_orders, 0) AS BIGINT) AS n_orders,
           floor((coalesce(o.total_spent, 0.0)) * 100 + 0.5) / 100 AS total_spent
    FROM customer c
    LEFT JOIN (
      SELECT o_custkey, count(*) AS n_orders, sum(o_totalprice) AS total_spent
      FROM orders GROUP BY o_custkey
    ) o ON c.c_custkey = o.o_custkey
    """,
    tags=("join", "agg"),
)
def join_left_with_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join against a pre-aggregated side (J4 lookup-join shape).

    Scale: aggregating orders *before* the join cuts the shuffled volume
    from |orders| to |customers-with-orders| (partial aggregation is
    map-side automatically).
    """
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"), F.sum("o_totalprice").alias("total_spent"))
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        F.col("c_custkey").alias("customer_id"),
        F.coalesce("n_orders", F.lit(0)).cast("long").alias("n_orders"),
        rnd(F.coalesce("total_spent", F.lit(0.0)), 2).alias("total_spent"),
    )


@declare(
    "join_full_outer",
    oracle="""
    SELECT
      coalesce(b.seg, s.seg) AS seg,
      CAST(b.n_build AS BIGINT) AS n_build,
      CAST(s.n_small AS BIGINT) AS n_small
    FROM (
      SELECT c_mktsegment AS seg, count(*) AS n_build FROM customer
      WHERE c_acctbal > 5000 GROUP BY c_mktsegment
    ) b
    FULL OUTER JOIN (
      SELECT c_mktsegment AS seg, count(*) AS n_small FROM customer
      WHERE c_acctbal < -500 GROUP BY c_mktsegment
    ) s ON b.seg = s.seg
    """,
    tags=("join",),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two aggregates with disjoint coverage."""
    c = load_table(spark, sf_dir, "customer")
    b = (
        c.where(F.col("c_acctbal") > 5000)
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(F.count("*").alias("n_build"))
    )
    s = (
        c.where(F.col("c_acctbal") < -500)
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(F.count("*").alias("n_small"))
    )
    return b.join(s, "seg", "full_outer").select(
        "seg",
        F.col("n_build").cast("long").alias("n_build"),
        F.col("n_small").cast("long").alias("n_small"),
    )


@declare(
    "join_semi_exists",
    oracle="""
    SELECT c_custkey AS customer_id, c_mktsegment AS segment
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
    )
    """,
    tags=("join", "semi"),
)
def join_semi_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS). The reference's set-membership gate
    `if album_id not in picked` is this op's dual (SURVEY §2.3 J3)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        F.col("c_custkey").alias("customer_id"), F.col("c_mktsegment").alias("segment")
    )


@declare(
    "join_anti_not_exists",
    oracle="""
    SELECT c_custkey AS customer_id, c_name AS customer_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("join", "anti"),
)
def join_anti_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no orders (SURVEY J3/J6)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        F.col("c_custkey").alias("customer_id"), F.col("c_name").alias("customer_name")
    )


@declare(
    "join_cross_theta",
    oracle="""
    SELECT r.r_name AS region_name, n.n_name AS nation_name
    FROM region r, nation n
    WHERE r.r_regionkey <> n.n_regionkey
    """,
    tags=("join", "cross"),
)
def join_cross_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join + non-equi (theta) predicate → broadcast nested loop."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return (
        r.crossJoin(F.broadcast(n))
        .where(F.col("r_regionkey") != F.col("n_regionkey"))
        .select(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
    )


_PRICE_BANDS = [
    ("low", 0.0, 100_000.0),
    ("mid", 100_000.0, 250_000.0),
    ("high", 250_000.0, 10_000_000.0),
]


@declare(
    "join_range_bands",
    oracle="""
    SELECT v.band AS band, CAST(count(*) AS BIGINT) AS n_orders,
           floor((sum(o.o_totalprice)) * 100 + 0.5) / 100 AS total
    FROM orders o
    JOIN (VALUES ('low', 0.0, 100000.0),
                 ('mid', 100000.0, 250000.0),
                 ('high', 250000.0, 10000000.0)) v(band, lo, hi)
      ON o.o_totalprice >= v.lo AND o.o_totalprice < v.hi
    GROUP BY v.band
    """,
    tags=("join", "range"),
)
def join_range_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: fact rows into value bands (SURVEY J6).

    Scale: the band table is tiny → broadcast nested-loop with the range
    predicate; never a shuffle on the fact side.
    """
    o = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(_PRICE_BANDS, "band string, lo double, hi double")
    return (
        o.join(
            F.broadcast(bands),
            (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_orders"),
            rnd(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


# ---------------------------------------------------------------------------
# Set operations (U1-U3)
# ---------------------------------------------------------------------------


@declare(
    "setop_union_distinct",
    oracle="""
    SELECT CAST(c_nationkey AS BIGINT) AS nation_id FROM customer
    UNION
    SELECT CAST(s_nationkey AS BIGINT) AS nation_id FROM supplier
    """,
    tags=("setop",),
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union + distinct (SURVEY §2.7 U2 — the reference's id set-union,
    spotify_etl_v2.py:74-87)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("long").alias("nation_id")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("long").alias("nation_id")
    )
    return c.unionByName(s).distinct()


@declare(
    "setop_intersect",
    oracle="""
    SELECT o_custkey AS customer_id FROM orders WHERE year(o_orderdate) = 1995
    INTERSECT
    SELECT o_custkey AS customer_id FROM orders WHERE year(o_orderdate) = 1996
    """,
    tags=("setop",),
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers active in both 1995 and 1996 (SURVEY U3)."""
    o = load_table(spark, sf_dir, "orders")
    y95 = o.where(F.year("o_orderdate") == 1995).select(F.col("o_custkey").alias("customer_id"))
    y96 = o.where(F.year("o_orderdate") == 1996).select(F.col("o_custkey").alias("customer_id"))
    return y95.intersect(y96)


@declare(
    "setop_except",
    oracle="""
    SELECT o_custkey AS customer_id FROM orders WHERE year(o_orderdate) = 1995
    EXCEPT
    SELECT o_custkey AS customer_id FROM orders WHERE year(o_orderdate) = 1996
    """,
    tags=("setop",),
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: customers active in 1995 but not 1996 (SURVEY U3)."""
    o = load_table(spark, sf_dir, "orders")
    y95 = o.where(F.year("o_orderdate") == 1995).select(F.col("o_custkey").alias("customer_id"))
    y96 = o.where(F.year("o_orderdate") == 1996).select(F.col("o_custkey").alias("customer_id"))
    # subtract = EXCEPT DISTINCT (set semantics, matching the SQL oracle);
    # exceptAll would be bag-difference and keep multiplicity leftovers
    return y95.subtract(y96)


# ---------------------------------------------------------------------------
# Sorts / limits / top-k (O1-O6)
# ---------------------------------------------------------------------------


@declare(
    "distinct_sorted",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
    tags=("sort", "distinct"),
)
def distinct_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct + total sort (SURVEY §2.6 O2: spotify_etl_v2.py:221).
    Sort order is irrelevant under the order-insensitive oracle but kept
    for the reference's deterministic-scan-order semantics (O1)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct().orderBy(
        "l_returnflag", "l_linestatus"
    )


@declare(
    "topk_global",
    oracle="""
    SELECT o_orderkey AS order_id, o_custkey AS customer_id,
           floor((o_totalprice) * 100 + 0.5) / 100 AS total_price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
    tags=("topk", "sort"),
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k (SURVEY O6) — Spark plans TakeOrderedAndProject, which
    takes k per partition then merges: no full sort, no single-node
    bottleneck at 100 TB. Tie broken by orderkey so the set is stable."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select(
            F.col("o_orderkey").alias("order_id"),
            F.col("o_custkey").alias("customer_id"),
            rnd("o_totalprice", 2).alias("total_price"),
        )
    )


@declare(
    "setop_union_all",
    oracle="""
    SELECT nation_id, CAST(count(*) AS BIGINT) AS n_rows FROM (
      SELECT CAST(c_nationkey AS BIGINT) AS nation_id FROM customer
      UNION ALL
      SELECT CAST(s_nationkey AS BIGINT) AS nation_id FROM supplier
    ) GROUP BY nation_id
    """,
    tags=("setop",),
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-all preserving multiplicity (SURVEY §2.7 U1 — the
    reference's accumulating union over per-batch blobs,
    spotify_etl_v2.py:76-87), aggregated so the oracle hash is stable."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("long").alias("nation_id")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("long").alias("nation_id")
    )
    return c.unionByName(s).groupBy("nation_id").agg(F.count("*").alias("n_rows"))


@declare(
    "join_large_sort_merge",
    oracle="""
    SELECT o.o_orderpriority AS priority,
           CAST(count(*) AS BIGINT) AS n_lines,
           floor((sum(l.l_extendedprice * (1 - l.l_discount))) * 100 + 0.5) / 100 AS revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY o.o_orderpriority
    """,
    headline=True,
    tags=("join", "sort_merge"),
)
def join_large_sort_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-large equi-join (orders ⋈ lineitem) — the shuffle join the
    engine must get right at 100 TB: sort-merge by default, both sides
    hash-partitioned on the key, AQE free to switch strategy or split
    skewed partitions at runtime. The orderdate filter is pushed to the
    orders scan so the join's build of shuffled rows is pre-reduced."""
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count("*").alias("n_lines"), rnd(F.sum(rev), 2).alias("revenue"))
    )


@declare(
    "join_shuffle_hash_hint",
    oracle="""
    SELECT o.o_orderstatus AS status,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderstatus
    """,
    tags=("join", "shuffle_hash"),
)
def join_shuffle_hash_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same join planned as a shuffled hash join via hint (SURVEY J6:
    the engine exposes all three equi-join strategies; SHUFFLE_HASH
    avoids the sort when one side fits a per-partition hash map)."""
    o = load_table(spark, sf_dir, "orders").hint("SHUFFLE_HASH")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(F.count("*").alias("n_lines"))
    )
