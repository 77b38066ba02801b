"""Round-11 declared-query staging area (same contract as rounds
6..10: built and oracle-verified NOW, deliberately NOT declared — the
round-10 activation window is full at 31 staged + 19 re-proofs).

Each entry: exact-oracle query + DuckDB SQL, exercised by
``tests/test_roundeleven_pending.py`` with the driver-shaped
comparison. Families: item-item collaborative filtering (the
co-occurrence recommender shape, scored by cross-multiplied integer
cosine²), index-backed phrase retrieval (posting-list equi joins,
driver-proven equal to the scan-backed oracle — the optimized-vs-naive
pattern applied to the search-engine index), and the exact
deterministic mode statistic (argmax with a total tiebreak — built-in
mode() breaks ties engine-dependently, so neither engine's native
mode is used).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.io import load_table


@dataclass(frozen=True)
class PendingQuery:
    name: str
    fn: object
    oracle: str | None
    headline: bool = False
    tags: tuple[str, ...] = ()


def sim_item_item_cf_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering over order baskets — the
    "customers who bought X also bought Y" recommender primitive:
    pair score = cosine²(i,j) = n_ij²/(n_i·n_j) over basket
    co-occurrence counts, reported in exact integer ppm
    (n_ij²·10⁶ DIV (n_i·n_j) — cross-multiplied, never a float sqrt;
    squaring the cosine preserves its ranking and keeps every atom an
    integer). Candidate pairs generate in-array per capped basket
    (operators/triangles.cooccurrence_counts — the near-dup bucket
    discipline: no item-item matrix ever materializes; a 10⁶-line
    boilerplate basket is dropped in-plan), supports ride an equi
    join, and the global top-20 under the total (score, n_ij, i, j)
    order goes through TakeOrdered — no unpartitioned window ever
    sees the pair set."""
    from spotify_data_pipeline_spark.operators.itemsets import frequent_items
    from spotify_data_pipeline_spark.operators.triangles import (
        cooccurrence_counts,
    )

    li = load_table(spark, sf_dir, "lineitem")
    pairs = cooccurrence_counts(li, "l_orderkey", "l_partkey", 200)
    support = frequent_items(
        li, "l_orderkey", "l_partkey", min_support=1, max_items_per_group=200
    )
    scored = (
        pairs.join(
            support.select(F.col("item").alias("src"), F.col("support").alias("_ni")),
            "src",
        )
        .join(
            support.select(F.col("item").alias("dst"), F.col("support").alias("_nj")),
            "dst",
        )
        .select(
            "src",
            "dst",
            F.col("n_ab").cast("long").alias("n_both"),
            F.col("_ni").cast("long").alias("n_src"),
            F.col("_nj").cast("long").alias("n_dst"),
            F.expr("n_ab * n_ab * 1000000 DIV (_ni * _nj)")
            .cast("long")
            .alias("cos2_ppm"),
        )
    )
    return scored.orderBy(
        F.col("cos2_ppm").desc(),
        F.col("n_both").desc(),
        F.col("src").asc(),
        F.col("dst").asc(),
    ).limit(20)


_ITEM_CF_ORACLE = """
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), sized AS (
      SELECT l_orderkey FROM li GROUP BY 1 HAVING count(*) <= 200
    ), k AS (
      SELECT li.l_orderkey, li.l_partkey
      FROM li JOIN sized USING (l_orderkey)
    ), sup AS (
      SELECT l_partkey, CAST(count(*) AS BIGINT) AS n FROM k GROUP BY 1
    ), pairs AS (
      SELECT a.l_partkey AS src, b.l_partkey AS dst,
             CAST(count(*) AS BIGINT) AS n_both
      FROM k a JOIN k b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    )
    SELECT src, dst, n_both,
           sa.n AS n_src, sb.n AS n_dst,
           CAST(n_both * n_both * 1000000 // (sa.n * sb.n) AS BIGINT) AS cos2_ppm
    FROM pairs
    JOIN sup sa ON pairs.src = sa.l_partkey
    JOIN sup sb ON pairs.dst = sb.l_partkey
    ORDER BY cos2_ppm DESC, n_both DESC, src ASC, dst ASC
    LIMIT 20
"""


_PHRASE = ("window", "join")  # a bigram present at every SF (measured
# 46 occurrences at sf0.001; the synthetic vocab is ~31 tokens so any
# common bigram persists across SFs)


def text_inverted_phrase_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INDEX-backed phrase search — the search-engine execution of the
    phrase query text_phrase_search answers by scanning: build the
    positional postings relation (term, doc, pos) once, then answer
    the phrase by a posting-list EQUI JOIN (same doc, adjacent
    positions). At 100 TB the index is built once and amortized over
    every query, and each phrase touches only its terms' postings —
    not the corpus. The DuckDB oracle answers the SAME phrase by the
    scan-backed list-comprehension route (the text_proximity device),
    so the driver hash-check proves index-backed ≡ scan-backed — the
    optimized-vs-naive pattern applied to retrieval. Positions are
    reported 1-based (Spark's posexplode is 0-based, shifted in-plan;
    the proximity query's documented off-by-one, aligned instead of
    dodged because first_pos is an output column here)."""
    from spotify_data_pipeline_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents").where(
        F.length(F.trim(F.col("text"))) > 0
    )
    postings = docs.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("_pos0", "term")
    ).select("doc_id", (F.col("_pos0") + 1).alias("pos"), "term")
    pa = postings.where(F.col("term") == _PHRASE[0]).select(
        "doc_id", F.col("pos").alias("_pa")
    )
    pb = postings.where(F.col("term") == _PHRASE[1]).select(
        "doc_id", F.col("pos").alias("_pb")
    )
    hits = pa.join(pb, "doc_id").where(F.col("_pb") == F.col("_pa") + 1)
    return (
        hits.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_matches"),
            F.min("_pa").cast("long").alias("first_pos"),
        )
        .orderBy("doc_id")
    )


_INVERTED_PHRASE_ORACLE = rf"""
    WITH t AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
      FROM documents WHERE length(trim(text)) > 0
    ), hits AS (
      SELECT doc_id,
             [i for i in range(1, len(toks))
                IF toks[i] = '{_PHRASE[0]}' AND toks[i + 1] = '{_PHRASE[1]}'] AS ps
      FROM t
    )
    SELECT doc_id,
           CAST(len(ps) AS BIGINT) AS n_matches,
           CAST(list_min(ps) AS BIGINT) AS first_pos
    FROM hits
    WHERE len(ps) > 0
    ORDER BY doc_id
"""


def agg_mode_stat_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact deterministic MODE — the basic statistic the suites have
    skipped because both engines' native mode() breaks ties
    arbitrarily (Spark documents a nondeterministic pick, DuckDB takes
    the first seen): per order-year, the most frequent order priority,
    tie-broken by the value itself (count DESC, value ASC — a total
    order, so the answer is a pure function of the data). One
    (year, priority) count agg, one per-year top-1 window — the same
    shape at any scale; neither engine's builtin appears in either
    plan."""
    orders = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window

    counts = orders.groupBy(
        F.year("o_orderdate").alias("order_year"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("order_year").orderBy(
        F.col("n").desc(), F.col("priority").asc()
    )
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            F.col("order_year").cast("long").alias("order_year"),
            F.col("priority").alias("mode_priority"),
            F.col("n").cast("long").alias("n_orders"),
        )
        .orderBy("order_year")
    )


_MODE_ORACLE = """
    WITH counts AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
             o_orderpriority AS priority,
             CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY 1, 2
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY order_year
                                   ORDER BY n DESC, priority ASC) AS rn
      FROM counts
    )
    SELECT order_year, priority AS mode_priority, n AS n_orders
    FROM ranked WHERE rn = 1
    ORDER BY order_year
"""


PENDING: tuple[PendingQuery, ...] = (
    PendingQuery(
        "sim_item_item_cf",
        sim_item_item_cf_query,
        _ITEM_CF_ORACLE,
        tags=("similarity", "recommender", "cooccurrence", "integer-exact"),
    ),
    PendingQuery(
        "text_inverted_phrase",
        text_inverted_phrase_query,
        _INVERTED_PHRASE_ORACLE,
        tags=("text", "retrieval", "inverted-index", "phrase"),
    ),
    PendingQuery(
        "agg_mode_stat",
        agg_mode_stat_query,
        _MODE_ORACLE,
        tags=("agg", "mode", "deterministic-ties", "integer-exact"),
    ),
)
