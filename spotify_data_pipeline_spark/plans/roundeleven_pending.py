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
from spotify_data_pipeline_spark.operators.parallelism import ensure_min_parallelism


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


# ---------------------------------------------------------------------------
# Wave 2: FP&A bridge, DP prep, error-handling parity.


def orders_revenue_bridge_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue BRIDGE (the FP&A waterfall): ΔR from
    1996-05 to 1996-06 decomposed by part-cohort transition — parts
    sold only in June (new), only in May (discontinued), and in both
    (continuing) — in EXACT cents. Month windows, not years: this
    testdata ships every part in every year (measured — a yearly
    bridge degenerates to continuing+total), while adjacent months
    populate all three segments at every SF (41/34/22 at sf0.001). This is the decomposition that
    stays integer: the textbook price/volume split needs per-part
    average prices (rationals with per-part denominators that cannot
    sum exactly), so the bridge is cut on the cohort axis instead and
    the conservation identity ΔR_total = R_new − R_disc + ΔR_cont
    holds to the cent (pytest-pinned). One part-keyed agg per year,
    one full-outer join on the part key, a 4-row rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    from spotify_data_pipeline_spark.plans.parity import rnd_cents

    def month_rev(y: int, m: int):
        return (
            li.where((F.year("l_shipdate") == y) & (F.month("l_shipdate") == m))
            .groupBy("l_partkey")
            .agg(
                F.sum(
                    rnd_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                ).alias("rev")
            )
        )

    y1 = month_rev(1996, 5).select(
        F.col("l_partkey"), F.col("rev").alias("_r1")
    )
    y2 = month_rev(1996, 6).select(
        F.col("l_partkey"), F.col("rev").alias("_r2")
    )
    both = y1.join(y2, "l_partkey", "full_outer").select(
        F.when(F.col("_r1").isNull(), F.lit("new"))
        .when(F.col("_r2").isNull(), F.lit("discontinued"))
        .otherwise(F.lit("continuing"))
        .alias("segment"),
        F.coalesce(F.col("_r1"), F.lit(0)).alias("_r1"),
        F.coalesce(F.col("_r2"), F.lit(0)).alias("_r2"),
    )
    seg = both.groupBy("segment").agg(
        F.count("*").cast("long").alias("n_parts"),
        F.sum("_r1").cast("long").alias("rev_may_cents"),
        F.sum("_r2").cast("long").alias("rev_jun_cents"),
        (F.sum("_r2") - F.sum("_r1")).cast("long").alias("delta_cents"),
    )
    total = both.agg(
        F.lit("total").alias("segment"),
        F.count("*").cast("long").alias("n_parts"),
        F.sum("_r1").cast("long").alias("rev_may_cents"),
        F.sum("_r2").cast("long").alias("rev_jun_cents"),
        (F.sum("_r2") - F.sum("_r1")).cast("long").alias("delta_cents"),
    )
    return seg.unionAll(total).orderBy("segment")


_REVENUE_BRIDGE_ORACLE = """
    WITH rev AS (
      SELECT l_partkey, CAST(month(l_shipdate) AS BIGINT) AS m,
             CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                           AS BIGINT)) AS BIGINT) AS r
      FROM lineitem
      WHERE year(l_shipdate) = 1996 AND month(l_shipdate) IN (5, 6)
      GROUP BY 1, 2
    ), y1 AS (SELECT l_partkey, r FROM rev WHERE m = 5),
    y2 AS (SELECT l_partkey, r FROM rev WHERE m = 6),
    both_ AS (
      SELECT CASE WHEN y1.r IS NULL THEN 'new'
                  WHEN y2.r IS NULL THEN 'discontinued'
                  ELSE 'continuing' END AS segment,
             coalesce(y1.r, 0) AS r1, coalesce(y2.r, 0) AS r2
      FROM y1 FULL OUTER JOIN y2 USING (l_partkey)
    )
    SELECT segment, CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(r1) AS BIGINT) AS rev_may_cents,
           CAST(sum(r2) AS BIGINT) AS rev_jun_cents,
           CAST(sum(r2) - sum(r1) AS BIGINT) AS delta_cents
    FROM both_ GROUP BY 1
    UNION ALL
    SELECT 'total', CAST(count(*) AS BIGINT),
           CAST(sum(r1) AS BIGINT), CAST(sum(r2) AS BIGINT),
           CAST(sum(r2) - sum(r1) AS BIGINT)
    FROM both_
    ORDER BY segment
"""


def privacy_dp_sensitivity_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-level sensitivity bounds — what differential privacy (and
    any per-user clipping scheme) needs BEFORE noise is even
    discussed: the max and discrete-p99 per-customer contribution to
    the two aggregates a release would publish (order count, revenue
    cents). Completes the privacy family's third axis (k-anonymity =
    group sizes, l-diversity = sensitive-value spread, this =
    per-individual contribution). p99 is the DISCRETE order statistic
    at rank (99·(m+1)) DIV 100 (the Tukey device) — interpolating
    percentiles float. One customer agg, two rank windows over the
    customer frame (the dimension), a single always-present output
    row."""
    orders = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window

    from spotify_data_pipeline_spark.plans.parity import rnd_cents

    per = orders.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        F.sum(rnd_cents(F.col("o_totalprice"))).alias("cents"),
    )
    wn = Window.orderBy(F.col("n_orders").asc(), F.col("o_custkey").asc())
    wc = Window.orderBy(F.col("cents").asc(), F.col("o_custkey").asc())
    full = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = (
        per.withColumn("_rn", F.row_number().over(wn))
        .withColumn("_rc", F.row_number().over(wc))
        .withColumn("_m", F.count("*").over(full))
    )
    return ranked.agg(
        F.max("_m").cast("long").alias("n_users"),
        F.max("n_orders").cast("long").alias("max_orders_per_user"),
        F.max(
            F.when(
                F.col("_rn") == F.expr("least(_m, (99 * (_m + 1)) DIV 100)"),
                F.col("n_orders"),
            )
        ).cast("long").alias("p99_orders"),
        F.max("cents").cast("long").alias("max_cents_per_user"),
        F.max(
            F.when(
                F.col("_rc") == F.expr("least(_m, (99 * (_m + 1)) DIV 100)"),
                F.col("cents"),
            )
        ).cast("long").alias("p99_cents"),
    )


_DP_SENSITIVITY_ORACLE = """
    WITH per AS (
      SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ), ranked AS (
      SELECT *,
             row_number() OVER (ORDER BY n_orders ASC, o_custkey ASC) AS rn,
             row_number() OVER (ORDER BY cents ASC, o_custkey ASC) AS rc,
             count(*) OVER () AS m
      FROM per
    )
    SELECT CAST(max(m) AS BIGINT) AS n_users,
           CAST(max(n_orders) AS BIGINT) AS max_orders_per_user,
           CAST(max(CASE WHEN rn = least(m, (99 * (m + 1)) // 100)
                         THEN n_orders END) AS BIGINT) AS p99_orders,
           CAST(max(cents) AS BIGINT) AS max_cents_per_user,
           CAST(max(CASE WHEN rc = least(m, (99 * (m + 1)) // 100)
                         THEN cents END) AS BIGINT) AS p99_cents
    FROM ranked
"""


def fn_try_error_suite_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-handling parity — the TRY-function family that makes bad
    records DATA instead of job failures (the difference between a
    100 TB run surviving one malformed row or dying at hour 9):
    try_cast on deliberately corrupted integers, invalid calendar
    dates (Feb 30), try_divide with zero denominators (Spark 4 is
    ANSI — plain / raises; DuckDB's / is already NULL-on-zero, the
    engines' different spellings of the same semantics, pinned equal),
    and format-mismatched timestamp parses (try_to_timestamp ≡
    try_strptime). Corruption is keyed off o_orderkey residues so
    every branch bites at every SF; output is the one-row NULL
    census + the sum of surviving values."""
    orders = load_table(spark, sf_dir, "orders")
    probed = orders.select(
        F.expr(
            "try_cast(CASE WHEN o_orderkey % 3 = 0"
            " THEN concat('x', CAST(o_orderkey AS STRING))"
            " ELSE CAST(o_orderkey AS STRING) END AS BIGINT)"
        ).alias("_i"),
        F.expr(
            "try_cast(CASE WHEN o_orderkey % 4 = 0 THEN '2024-02-30'"
            " ELSE '2024-02-29' END AS DATE)"
        ).alias("_d"),
        F.expr(
            "try_divide(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT),"
            " o_orderkey % 5)"
        ).alias("_q"),
        F.expr(
            "try_to_timestamp(CASE WHEN o_orderkey % 7 = 0"
            " THEN '2024/01/02' ELSE '2024-01-02 03:04:05' END,"
            " 'yyyy-MM-dd HH:mm:ss')"
        ).alias("_t"),
        F.expr(
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) * 10000"
            " DIV nullif(o_orderkey % 5, 0)"
        ).alias("_qi"),
    )
    return probed.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.col("_i").isNull().cast("long")).cast("long").alias("n_bad_int"),
        F.sum("_i").cast("long").alias("sum_good_ints"),
        F.sum(F.col("_d").isNull().cast("long")).cast("long").alias("n_bad_date"),
        F.sum(F.col("_q").isNull().cast("long")).cast("long").alias("n_div_zero"),
        # the SUMMABLE quotient is the exact integer DIV twin (a float
        # quotient sum is accumulation-order-dependent — not hashable)
        F.sum("_qi").cast("long").alias("sum_quot_x1e4"),
        F.sum(F.col("_t").isNull().cast("long")).cast("long").alias("n_bad_ts"),
    )


_TRY_SUITE_ORACLE = """
    WITH probed AS (
      SELECT
        try_cast(CASE WHEN o_orderkey % 3 = 0
                      THEN 'x' || CAST(o_orderkey AS VARCHAR)
                      ELSE CAST(o_orderkey AS VARCHAR) END AS BIGINT) AS i,
        try_cast(CASE WHEN o_orderkey % 4 = 0 THEN '2024-02-30'
                      ELSE '2024-02-29' END AS DATE) AS d,
        CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
          / nullif(o_orderkey % 5, 0) AS q,
        try_strptime(CASE WHEN o_orderkey % 7 = 0
                          THEN '2024/01/02' ELSE '2024-01-02 03:04:05' END,
                     '%Y-%m-%d %H:%M:%S') AS t,
        CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) * 10000
          // nullif(o_orderkey % 5, 0) AS qi
      FROM orders
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN i IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_int,
           CAST(sum(i) AS BIGINT) AS sum_good_ints,
           CAST(sum(CASE WHEN d IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_date,
           CAST(sum(CASE WHEN q IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_div_zero,
           CAST(sum(qi) AS BIGINT) AS sum_quot_x1e4,
           CAST(sum(CASE WHEN t IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_ts
    FROM probed
"""


# ---------------------------------------------------------------------------
# Wave 3: self-tuning partition planning + tokenizer economics.

# in-memory row-width model: fixed widths by type + exact string bytes.
# (numbers are the uncompressed columnar widths Spark budgets against —
# what spark.sql.files.maxPartitionBytes / shuffle sizing reason about,
# not parquet's encoded size.)
_WIDTHS = {
    "bigint": 8,
    "double": 8,
    "timestamp": 8,
    "int": 4,
    "date": 4,
}
_TARGET_PARTITION_BYTES = 128 * 1024 * 1024

# static column model per audited table (from the fixture schemas —
# regenerating testdata with new columns shows up as a hash mismatch
# here, which is exactly what we want a planning query to notice)
_TABLE_COLS = {
    "lineitem": (
        ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],  # bigint
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],  # double
        ["l_shipdate"],  # timestamp
        ["l_returnflag", "l_linestatus"],  # string
    ),
    "orders": (
        ["o_orderkey", "o_custkey"],
        ["o_totalprice"],
        ["o_orderdate"],
        ["o_orderstatus", "o_orderpriority"],
    ),
    "events": (
        ["event_id", "user_id"],
        ["value"],
        ["ts"],
        ["event_type", "props"],
    ),
}


def ops_partition_plan_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine sizing its own reads — the third self-diagnosis
    query (skew shares, self-join cardinality, now partition
    planning): per table, the EXACT in-memory byte estimate (fixed
    type widths + actual string bytes, all integer sums) and the
    partition count a 128 MiB budget implies (ceil via
    (b + t − 1) DIV t). This is the arithmetic behind
    spark.sql.files.maxPartitionBytes / shuffle.partitions tuning,
    done as data instead of folklore; at 100 TB the same one-pass sums
    produce the plan the job config needs BEFORE the big job runs.
    One scan per table, no joins, no windows."""
    frames = []
    for table, (bigints, doubles, tss, strings) in sorted(_TABLE_COLS.items()):
        df = load_table(spark, sf_dir, table)
        fixed = (
            len(bigints) * _WIDTHS["bigint"]
            + len(doubles) * _WIDTHS["double"]
            + len(tss) * _WIDTHS["timestamp"]
        )
        str_bytes = sum(
            (F.sum(F.length(F.col(c)).cast("long")) for c in strings),
            F.lit(0).cast("long"),
        )
        frames.append(
            df.agg(
                F.lit(table).alias("table_name"),
                F.count("*").cast("long").alias("n_rows"),
                (F.count("*") * fixed + str_bytes).cast("long").alias("est_bytes"),
            ).select(
                "table_name",
                "n_rows",
                "est_bytes",
                F.expr(
                    f"CAST((est_bytes + {_TARGET_PARTITION_BYTES - 1})"
                    f" DIV {_TARGET_PARTITION_BYTES} AS BIGINT)"
                ).alias("n_partitions_128mb"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionAll(f)
    return out.orderBy("table_name")


def _partition_plan_oracle() -> str:
    parts = []
    for table, (bigints, doubles, tss, strings) in sorted(_TABLE_COLS.items()):
        fixed = (
            len(bigints) * _WIDTHS["bigint"]
            + len(doubles) * _WIDTHS["double"]
            + len(tss) * _WIDTHS["timestamp"]
        )
        slen = " + ".join(f"coalesce(sum(length({c})), 0)" for c in strings) or "0"
        parts.append(
            f"""SELECT '{table}' AS table_name,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(*) * {fixed} + {slen} AS BIGINT) AS est_bytes,
             CAST((count(*) * {fixed} + {slen} + {_TARGET_PARTITION_BYTES - 1})
                  // {_TARGET_PARTITION_BYTES} AS BIGINT) AS n_partitions_128mb
      FROM {table}"""
        )
    body = "\n      UNION ALL\n      ".join(parts)
    return f"""
    SELECT * FROM (
      {body}
    ) ORDER BY table_name
"""


def llm_tokenizer_ratio_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer economics per source — the chars-per-token
    compression ratio every pretraining-cost model starts from (and
    the metric that catches a tokenizer mismatched to a corpus): per
    source, documents, total chars, total BPE-ish tokens
    (functions/text.BPE_ISH_PATTERN — word runs count one, every
    other symbol alone; RE2-compatible so DuckDB runs the IDENTICAL
    pattern), and the exact ratio in milli-chars-per-token
    (chars·1000 DIV tokens). Map-only scan + one small agg."""
    from spotify_data_pipeline_spark.functions.text import BPE_ISH_PATTERN

    docs = load_table(spark, sf_dir, "documents")
    per = docs.select(
        "source",
        F.length("text").cast("long").alias("_chars"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_ISH_PATTERN), 0))
        .cast("long")
        .alias("_toks"),
    )
    return (
        per.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("_chars").cast("long").alias("total_chars"),
            F.sum("_toks").cast("long").alias("total_tokens"),
            F.expr("CAST(sum(_chars) * 1000 DIV sum(_toks) AS BIGINT)").alias(
                "milli_chars_per_token"
            ),
        )
        .orderBy("source")
    )


_TOKENIZER_RATIO_ORACLE = r"""
    WITH per AS (
      SELECT source,
             CAST(length(text) AS BIGINT) AS chars,
             CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^\sA-Za-z0-9_]', 0))
                  AS BIGINT) AS toks
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(chars) AS BIGINT) AS total_chars,
           CAST(sum(toks) AS BIGINT) AS total_tokens,
           CAST(sum(chars) * 1000 // sum(toks) AS BIGINT) AS milli_chars_per_token
    FROM per
    GROUP BY 1
    ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Wave 4: window algebra + dedup observability.


def window_leave_one_out_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out statistics per row — the influence question
    ("how does the group look WITHOUT me?") that naive frames can't
    ask because SQL windows have no EXCLUDE CURRENT ROW in either
    engine: LOO mean from the group sum ((S − x)·1000 DIV (n−1),
    exact milli-cents, NULL for singleton groups via nullif), LOO max
    as greatest(prefix-max, suffix-max) over two ROWS frames that
    together cover exactly the partition minus the current row — the
    union is order-insensitive even under acctbal ties, so the result
    is deterministic although the frame contents aren't. One window
    partition pass per nation over the customer dimension."""
    cust = load_table(spark, sf_dir, "customer")
    from pyspark.sql import Window

    from spotify_data_pipeline_spark.plans.parity import rnd_cents

    base = cust.select(
        "c_nationkey",
        "c_custkey",
        rnd_cents(F.col("c_acctbal")).alias("bal_cents"),
    )
    order = [F.col("bal_cents").asc(), F.col("c_custkey").asc()]
    w = Window.partitionBy("c_nationkey").orderBy(*order)
    full = Window.partitionBy("c_nationkey")
    pre = w.rowsBetween(Window.unboundedPreceding, -1)
    post = w.rowsBetween(1, Window.unboundedFollowing)
    return (
        base.withColumn("_s", F.sum("bal_cents").over(full))
        .withColumn("_n", F.count("*").over(full))
        .withColumn(
            "loo_mean_millicents",
            F.expr("(_s - bal_cents) * 1000 DIV nullif(_n - 1, 0)"),
        )
        .withColumn(
            "loo_max_cents",
            F.greatest(
                F.max("bal_cents").over(pre), F.max("bal_cents").over(post)
            ),
        )
        .select(
            F.col("c_nationkey").cast("long").alias("nationkey"),
            F.col("c_custkey").cast("long").alias("custkey"),
            F.col("bal_cents").cast("long").alias("bal_cents"),
            F.col("loo_mean_millicents").cast("long").alias("loo_mean_millicents"),
            F.col("loo_max_cents").cast("long").alias("loo_max_cents"),
        )
        .orderBy("nationkey", "custkey")
    )


_LOO_ORACLE = """
    WITH base AS (
      SELECT c_nationkey AS nationkey, c_custkey AS custkey,
             CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
      FROM customer
    ), win AS (
      SELECT *,
             sum(bal_cents) OVER (PARTITION BY nationkey) AS s,
             count(*) OVER (PARTITION BY nationkey) AS n,
             max(bal_cents) OVER (PARTITION BY nationkey
                                  ORDER BY bal_cents ASC, custkey ASC
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS premax,
             max(bal_cents) OVER (PARTITION BY nationkey
                                  ORDER BY bal_cents ASC, custkey ASC
                                  ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS postmax
      FROM base
    )
    SELECT CAST(nationkey AS BIGINT) AS nationkey,
           CAST(custkey AS BIGINT) AS custkey,
           bal_cents,
           CAST((s - bal_cents) * 1000 // nullif(n - 1, 0) AS BIGINT)
             AS loo_mean_millicents,
           CAST(greatest(premax, postmax) AS BIGINT) AS loo_max_cents
    FROM win
    ORDER BY nationkey, custkey
"""


def dedup_cluster_histogram_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup observability — "how much boilerplate does this corpus
    carry?": the cluster-SIZE distribution of the near-dup component
    labeling (the hash-matched ``dedup_components`` composition:
    exact 3-gram-Jaccard pairs ≥ 0.5 → large-star/small-star
    components), on log2 buckets (length(bin(size)) — the pure
    integer log2), PLUS the singleton row (docs in no near-dup pair:
    total − clustered — the healthy majority a dedup report must show,
    or the histogram silently describes only the pathological tail).
    The oracle replicates components by recursive-CTE reachability,
    so the TRANSITIVE cluster sizes are what the hash pins."""
    from spotify_data_pipeline_spark.operators.components import (
        connected_components,
    )
    from spotify_data_pipeline_spark.operators.dedup import ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs, id_col="doc_id", text_col="text", threshold=0.5
    ).select("id_a", "id_b")
    sizes = (
        connected_components(pairs)
        .groupBy("component")
        .agg(F.count("*").alias("_sz"))
    )
    hist = (
        sizes.select(
            F.expr("CAST(length(bin(_sz)) AS BIGINT)").alias("log2_bucket"), "_sz"
        )
        .groupBy("log2_bucket")
        .agg(
            F.count("*").cast("long").alias("n_clusters"),
            F.sum("_sz").cast("long").alias("n_docs"),
        )
    )
    clustered = sizes.agg(F.coalesce(F.sum("_sz"), F.lit(0)).alias("_c"))
    singles = (
        docs.agg(F.count("*").alias("_t"))
        .crossJoin(F.broadcast(clustered))
        .select(
            F.lit(0).cast("long").alias("log2_bucket"),
            (F.col("_t") - F.col("_c")).cast("long").alias("n_clusters"),
            (F.col("_t") - F.col("_c")).cast("long").alias("n_docs"),
        )
    )
    return hist.unionAll(singles).orderBy("log2_bucket")


def _cluster_hist_oracle() -> str:
    # the proven pair-graph + reachability SQL (roundfour's components
    # oracle), extended with the size histogram + singleton row
    from spotify_data_pipeline_spark.plans.roundfour import _PAIRS_SQL

    return (
        _PAIRS_SQL
        + """
    , e AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b AS u, id_a AS v FROM pairs
    ), reach(u, v) AS (
      SELECT DISTINCT u, u FROM e
      UNION
      SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u
    ), labels AS (
      SELECT u AS doc_id, min(v) AS component FROM reach GROUP BY u
    ), sizes AS (
      SELECT component, CAST(count(*) AS BIGINT) AS sz FROM labels GROUP BY 1
    ), hist AS (
      SELECT CAST(length(bin(sz)) AS BIGINT) AS log2_bucket,
             CAST(count(*) AS BIGINT) AS n_clusters,
             CAST(sum(sz) AS BIGINT) AS n_docs
      FROM sizes GROUP BY 1
    ), singles AS (
      SELECT CAST(0 AS BIGINT) AS log2_bucket,
             CAST((SELECT count(*) FROM documents)
                  - coalesce((SELECT sum(sz) FROM sizes), 0) AS BIGINT)
               AS n_clusters,
             CAST((SELECT count(*) FROM documents)
                  - coalesce((SELECT sum(sz) FROM sizes), 0) AS BIGINT)
               AS n_docs
    )
    SELECT * FROM hist
    UNION ALL
    SELECT * FROM singles
    ORDER BY log2_bucket
    """
    ).replace("WITH t AS", "WITH RECURSIVE t AS")


# ---------------------------------------------------------------------------
# Wave 5: diversified retrieval (MMR).

_MMR_QUERY_ID = 0  # the query vector
_MMR_CANDIDATES = 10  # relevance-ranked candidate pool
_MMR_K = 5  # diversified selections


def _qcos_x1e4(qa, qb):
    """Quantized cosine scaled to an EXACT integer (×10⁴ half-up) —
    the sim_quantized_topk arithmetic kept in integers end-to-end so
    greedy score comparisons never touch a float."""
    from spotify_data_pipeline_spark.operators.quantization import quantized_cosine

    return F.floor(quantized_cosine(qa, qb) * 10000 + F.lit(0.5)).cast("long")


def sim_mmr_diversified_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance (Carbonell & Goldstein SIGIR'98) —
    the diversified top-k every production retrieval stack bolts onto
    plain similarity ranking so five near-duplicate hits don't fill
    the page: greedily pick argmax(rel(c) − max_{s∈S} sim(c, s)),
    λ=½ scaled out. Everything is EXACT integers: relevance and
    pairwise similarity are int8-quantized cosines ×10⁴ half-up (the
    sim_quantized_topk arithmetic), so each greedy comparison is an
    integer compare with a (score DESC, id ASC) total tiebreak and
    the whole selection is a pure function of the data. The candidate
    pool (top-10 by relevance) and its 45 pairwise sims are bounded
    frames, so the K−1 unrolled selection steps stay cheap no matter
    the corpus size — the scan cost lives in the ONE relevance pass
    (broadcast query, corpus never shuffles). The DuckDB oracle
    replicates the greedy unrolled (the PageRank unrolled-CTE
    precedent), making diversified retrieval itself hash-checked."""
    emb = load_table(spark, sf_dir, "embeddings")
    from spotify_data_pipeline_spark.operators.quantization import quantize_vectors

    q = quantize_vectors(
        emb.where(F.col("vec_id") == _MMR_QUERY_ID).select(
            F.col("embedding").alias("_v")
        ),
        "_v",
        "_qq",
    ).select("_qq")
    corpus = quantize_vectors(
        emb.where(F.col("vec_id") != _MMR_QUERY_ID).select(
            "vec_id", F.col("embedding").alias("_v")
        ),
        "_v",
        "_qc",
    ).select("vec_id", "_qc")
    scored = (
        F.broadcast(q)
        .crossJoin(corpus)
        .select("vec_id", "_qc", _qcos_x1e4(F.col("_qq"), F.col("_qc")).alias("rel"))
    )
    cand = scored.orderBy(F.col("rel").desc(), F.col("vec_id").asc()).limit(
        _MMR_CANDIDATES
    )
    # r12 optimization (guide §3.3 truncate huge iterative plans — the
    # ktruss/pq_train lineage-cut device): the K−1 greedy steps each
    # reference cand/sym, and WITHOUT a cut step k replays the whole
    # corpus relevance pass of steps 1..k−1 — measured ~38 s at sf0.1
    # (O(K²) corpus scans + quadratic plan analysis). The candidate
    # pool is a BOUNDED 10-row frame: materialize it once, eagerly;
    # the unrolled selection then runs on 10-row inputs (~2 s total).
    # Result unchanged — localCheckpoint materializes the exact rows.
    cand = cand.localCheckpoint(eager=True)
    sims = (
        cand.alias("a")
        .join(cand.alias("b"), F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("ia"),
            F.col("b.vec_id").alias("ib"),
            _qcos_x1e4(F.col("a._qc"), F.col("b._qc")).alias("sim"),
        )
    )
    sym = sims.unionAll(
        sims.select(
            F.col("ib").alias("ia"), F.col("ia").alias("ib"), "sim"
        )
    )
    cand = cand.select("vec_id", "rel")
    # greedy unroll: step 1 = pure relevance argmax; steps 2..K score
    # remaining candidates by rel − max sim to the selected set
    sel = cand.orderBy(F.col("rel").desc(), F.col("vec_id").asc()).limit(1).select(
        F.lit(1).cast("long").alias("rank"),
        "vec_id",
        "rel",
        F.lit(None).cast("long").alias("maxsim"),
        F.col("rel").cast("long").alias("score"),
    )
    for step in range(2, _MMR_K + 1):
        chosen = sel.select("vec_id")
        remaining = cand.join(chosen, "vec_id", "left_anti")
        ms = (
            sym.join(chosen.select(F.col("vec_id").alias("ib")), "ib")
            .groupBy("ia")
            .agg(F.max("sim").alias("maxsim"))
        )
        pick = (
            remaining.join(ms, remaining.vec_id == ms.ia)
            .select(
                F.lit(step).cast("long").alias("rank"),
                "vec_id",
                "rel",
                F.col("maxsim").cast("long").alias("maxsim"),
                (F.col("rel") - F.col("maxsim")).cast("long").alias("score"),
            )
            .orderBy(F.col("score").desc(), F.col("vec_id").asc())
            .limit(1)
        )
        sel = sel.unionAll(pick)
    return sel.orderBy("rank")


def _mmr_oracle() -> str:
    qcos = (
        "(list_dot_product({a}.q, {b}.q)"
        " / (sqrt(list_dot_product({a}.q, {a}.q))"
        " * sqrt(list_dot_product({b}.q, {b}.q))))"
    )
    steps = []
    for step in range(2, _MMR_K + 1):
        prev = ", ".join(f"s{i}" for i in range(1, step))
        prev_union = " UNION ALL ".join(
            f"SELECT * FROM s{i}" for i in range(1, step)
        )
        steps.append(
            f"""s{step} AS (
      SELECT CAST({step} AS BIGINT) AS rank, c.vec_id, c.rel,
             ms.maxsim, c.rel - ms.maxsim AS score
      FROM cand c
      JOIN (
        SELECT y.ia, max(y.sim) AS maxsim
        FROM sym y
        WHERE y.ib IN (SELECT vec_id FROM ({prev_union}))
        GROUP BY 1
      ) ms ON c.vec_id = ms.ia
      WHERE c.vec_id NOT IN (SELECT vec_id FROM ({prev_union}))
      ORDER BY score DESC, c.vec_id ASC LIMIT 1
    )"""
        )
        _ = prev
    steps_sql = ",\n    ".join(steps)
    finals = "\n    UNION ALL\n    ".join(
        f"SELECT * FROM s{i}" for i in range(1, _MMR_K + 1)
    )
    return f"""
    WITH z AS (
      SELECT vec_id, embedding,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS m
      FROM embeddings
    ), qz AS (
      SELECT vec_id,
             CASE WHEN m = 0
                  THEN list_transform(embedding, x -> CAST(0 AS DOUBLE))
                  ELSE list_transform(embedding, x -> CAST(least(greatest(
                         floor(CAST(x AS DOUBLE) * 127 / m + 0.5),
                         -127.0), 127.0) AS DOUBLE))
             END AS q
      FROM z
    ), scored AS (
      SELECT b.vec_id,
             CAST(floor({qcos.format(a="a", b="b")} * 10000 + 0.5) AS BIGINT) AS rel
      FROM qz a JOIN qz b ON b.vec_id <> {_MMR_QUERY_ID}
      WHERE a.vec_id = {_MMR_QUERY_ID}
    ), cand AS (
      SELECT vec_id, rel FROM scored
      ORDER BY rel DESC, vec_id ASC LIMIT {_MMR_CANDIDATES}
    ), pair AS (
      SELECT a.vec_id AS ia, b.vec_id AS ib,
             CAST(floor({qcos.format(a="za", b="zb")} * 10000 + 0.5) AS BIGINT) AS sim
      FROM cand a JOIN cand b ON a.vec_id < b.vec_id
      JOIN qz za ON za.vec_id = a.vec_id
      JOIN qz zb ON zb.vec_id = b.vec_id
    ), sym AS (
      SELECT ia, ib, sim FROM pair
      UNION ALL
      SELECT ib, ia, sim FROM pair
    ), s1 AS (
      SELECT CAST(1 AS BIGINT) AS rank, vec_id, rel,
             CAST(NULL AS BIGINT) AS maxsim, rel AS score
      FROM cand ORDER BY rel DESC, vec_id ASC LIMIT 1
    ),
    {steps_sql}
    SELECT * FROM (
    {finals}
    ) ORDER BY rank
"""


# ---------------------------------------------------------------------------
# Wave 12: the curation funnel (capstone LLM-ops observability).


def llm_curation_funnel_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation FUNNEL — stage-by-stage survivor counts through
    the pretraining-data pipeline, the one observability table every
    data-curation run publishes (what did each gate cost?): raw →
    non-blank → quality+language → exact-dedup (first per canonical
    fingerprint) → near-dedup (minus connected-component losers of
    the exact 3-gram-Jaccard ≥ 0.5 graph — the ORACLE-able twin of
    the MinHash path, same transitive-survivor semantics). Every
    stage reuses an already-hash-matched piece
    (llm_curation_pipeline's gates, dedup_components' labeling), so
    the funnel's oracle is the composition of the proofs; counts are
    monotonically non-increasing by construction (pytest-pinned).
    Stage counts are 1-row aggregates unioned — the funnel frame is
    O(stages), never the corpus."""
    from pyspark.sql import Window

    from spotify_data_pipeline_spark.functions.text import is_nonblank
    from spotify_data_pipeline_spark.operators.components import (
        connected_components,
    )
    from spotify_data_pipeline_spark.operators.dedup import ngram_jaccard_pairs
    from spotify_data_pipeline_spark.operators.textops import (
        fingerprint_md5,
        language_id,
        quality_features,
    )

    docs = load_table(spark, sf_dir, "documents")
    nonblank = docs.where(is_nonblank(F.col("text")))
    feat = fingerprint_md5(language_id(quality_features(nonblank)))
    w = Window.partitionBy("fingerprint")
    feat = feat.withColumn("_first", F.min("doc_id").over(w))
    quality = feat.where(
        F.col("n_tokens").between(5, 5000)
        & (F.col("uniq_ratio") >= 0.3)
        & (F.col("punct_ratio") <= 0.3)
        & (F.col("pred_lang") != "und")
    )
    exact = quality.where(F.col("doc_id") == F.col("_first"))
    pairs = ngram_jaccard_pairs(
        docs, id_col="doc_id", text_col="text", threshold=0.5
    ).select("id_a", "id_b")
    losers = (
        connected_components(pairs)
        .where(F.col("id") != F.col("component"))
        .select(F.col("id").alias("doc_id"))
    )
    neardup = exact.join(losers, "doc_id", "left_anti")

    def stage(ord_: int, name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(ord_).cast("long").alias("stage_ord"),
            F.lit(name).alias("stage"),
            F.count("*").cast("long").alias("n_docs"),
        )

    out = (
        stage(1, "raw", docs)
        .unionAll(stage(2, "nonblank", nonblank))
        .unionAll(stage(3, "quality_lang", quality))
        .unionAll(stage(4, "exact_dedup", exact))
        .unionAll(stage(5, "near_dedup", neardup))
    )
    return out.orderBy("stage_ord")


def _curation_funnel_oracle() -> str:
    from spotify_data_pipeline_spark.operators.textops import language_id_sql
    from spotify_data_pipeline_spark.plans.roundfour import _PAIRS_SQL

    pairs_sql = _PAIRS_SQL.replace("WITH t AS", ", pt AS").replace(
        ", s AS", ", ps AS"
    )
    # rename the pair CTEs to avoid colliding with the funnel's own
    pairs_sql = (
        pairs_sql.replace("FROM t\n", "FROM pt\n")
        .replace("unnest(", "unnest(")
        .replace(" s a ", " ps a ")
        .replace(" s b ", " ps b ")
        .replace("FROM s GROUP BY 1", "FROM ps GROUP BY 1")
    )
    return (
        rf"""
    WITH RECURSIVE tt AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks,
             trim(regexp_replace(text, '\s+', ' ', 'g')) AS norm
      FROM documents WHERE length(trim(text)) > 0
    ), f AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             floor((len(list_distinct(toks)) / greatest(len(toks), 1)) * 10000 + 0.5) / 10000 AS uniq_ratio,
             floor((length(regexp_replace(norm, '[\w\s]', '', 'g')) / greatest(length(norm), 1)) * 10000 + 0.5) / 10000 AS punct_ratio,
             {language_id_sql("toks")} AS pred_lang,
             md5(lower(norm)) AS fingerprint
      FROM tt
    ), g AS (
      SELECT *, min(doc_id) OVER (PARTITION BY fingerprint) AS first_doc FROM f
    ), quality AS (
      SELECT doc_id, first_doc FROM g
      WHERE n_tokens BETWEEN 5 AND 5000
        AND uniq_ratio >= 0.3
        AND punct_ratio <= 0.3
        AND pred_lang <> 'und'
    ), exact_d AS (
      SELECT doc_id FROM quality WHERE doc_id = first_doc
    )"""
        + pairs_sql
        + """
    , e AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b AS u, id_a AS v FROM pairs
    ), reach(u, v) AS (
      SELECT DISTINCT u, u FROM e
      UNION
      SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u
    ), losers AS (
      SELECT u AS doc_id FROM reach GROUP BY u HAVING u <> min(v)
    ), neardup AS (
      SELECT doc_id FROM exact_d WHERE doc_id NOT IN (SELECT doc_id FROM losers)
    )
    SELECT * FROM (
      SELECT CAST(1 AS BIGINT) AS stage_ord, 'raw' AS stage,
             CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_docs
      UNION ALL
      SELECT 2, 'nonblank', CAST((SELECT count(*) FROM tt) AS BIGINT)
      UNION ALL
      SELECT 3, 'quality_lang', CAST((SELECT count(*) FROM quality) AS BIGINT)
      UNION ALL
      SELECT 4, 'exact_dedup', CAST((SELECT count(*) FROM exact_d) AS BIGINT)
      UNION ALL
      SELECT 5, 'near_dedup', CAST((SELECT count(*) FROM neardup) AS BIGINT)
    ) ORDER BY stage_ord
"""
    )


# ---------------------------------------------------------------------------
# Wave 11: corpus-linguistics + graph-topology breadth.


def text_burstiness_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term burstiness (Church & Gale 1995) — the adaptation
    statistic frequency hides: P(term recurs IN a document | it
    appeared at all) = docs_with_2plus / docs_with_1plus, in exact
    ppm. A term can be frequent because many documents mention it
    once (function-word behavior) or because few documents repeat it
    heavily (content/topic behavior); df alone cannot tell them
    apart, burstiness can. One tokenize scan → (doc, term) counts →
    per-term document tallies; full vocabulary emitted (it is ~31
    terms on this corpus — stated, not hidden)."""
    from spotify_data_pipeline_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents").where(
        F.length(F.trim(F.col("text"))) > 0
    )
    per_doc = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    return (
        per_doc.groupBy("term")
        .agg(
            F.count("*").cast("long").alias("df"),
            F.sum((F.col("tf") >= 2).cast("long")).cast("long").alias("df_2plus"),
            F.sum("tf").cast("long").alias("cf"),
        )
        .select(
            "term",
            "df",
            "df_2plus",
            "cf",
            F.expr("df_2plus * 1000000 DIV df").alias("burstiness_ppm"),
        )
        .orderBy("term")
    )


_BURSTINESS_ORACLE = r"""
    WITH t AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
      FROM documents WHERE length(trim(text)) > 0
    ), per_doc AS (
      SELECT doc_id, term, count(*) AS tf
      FROM (SELECT doc_id, unnest(toks) AS term FROM t)
      GROUP BY 1, 2
    )
    SELECT term,
           CAST(count(*) AS BIGINT) AS df,
           CAST(sum(CASE WHEN tf >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS df_2plus,
           CAST(sum(tf) AS BIGINT) AS cf,
           CAST(sum(CASE WHEN tf >= 2 THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT) AS burstiness_ppm
    FROM per_doc
    GROUP BY 1
    ORDER BY 1
"""


_RICH_CLUB_PCTS = (50, 75, 90, 95, 99)


def graph_rich_club_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient φ(k) of the part co-order graph (Zhou &
    Mondragón 2004): among nodes of degree > k, the realized fraction
    of possible edges — do the hubs preferentially interconnect? The
    threshold ladder is DATA-ADAPTIVE: k at the p50/p75/p90/p95/p99
    DISCRETE degree order statistics (the Tukey rank device), because
    any fixed ladder is degenerate on some SF (measured: every node
    of the sf0.001 graph has degree > 32 — a constant ladder produced
    five identical rows). Per rung: the percentile, its k, n_rich,
    realized rich-rich edges, and φ in exact ppm (NULL via nullif
    when fewer than two rich nodes). Degrees once, thresholds as a
    5-row frame joined back — no per-rung scans."""
    from pyspark.sql import Window

    from spotify_data_pipeline_spark.operators.triangles import cooccurrence_edges

    li = load_table(spark, sf_dir, "lineitem")
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey")
    deg = (
        edges.select(F.col("src").alias("u"))
        .unionAll(edges.select(F.col("dst").alias("u")))
        .groupBy("u")
        .agg(F.count("*").alias("d"))
    )
    w = Window.orderBy(F.col("d").asc(), F.col("u").asc())
    full = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ranked = deg.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_m", F.count("*").over(full)
    )
    ks = ranked.groupBy().agg(
        *[
            F.max(
                F.when(
                    F.col("_rn")
                    == F.expr(f"least(_m, ({p} * (_m + 1)) DIV 100)"),
                    F.col("d"),
                )
            ).alias(f"_k{p}")
            for p in _RICH_CLUB_PCTS
        ]
    ).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(p).cast("long").alias("pct"),
                        F.col(f"_k{p}").cast("long").alias("k"),
                    )
                    for p in _RICH_CLUB_PCTS
                ]
            )
        ).alias("_s")
    ).select("_s.pct", "_s.k")
    rich = F.broadcast(ks).crossJoin(deg).where(F.col("d") > F.col("k"))
    nrich = rich.groupBy("pct", "k").agg(F.count("*").alias("n_rich"))
    e_with_deg = edges.join(
        deg.select(F.col("u").alias("src"), F.col("d").alias("_ds")), "src"
    ).join(deg.select(F.col("u").alias("dst"), F.col("d").alias("_dd")), "dst")
    realized = (
        F.broadcast(ks)
        .crossJoin(e_with_deg)
        .where((F.col("_ds") > F.col("k")) & (F.col("_dd") > F.col("k")))
        .groupBy("pct", "k")
        .agg(F.count("*").alias("n_realized"))
    )
    return (
        ks.join(nrich, ["pct", "k"], "left")
        .join(realized, ["pct", "k"], "left")
        .select(
            "pct",
            "k",
            F.coalesce(F.col("n_rich"), F.lit(0)).cast("long").alias("n_rich"),
            F.coalesce(F.col("n_realized"), F.lit(0)).cast("long").alias("n_realized"),
            F.expr(
                "CAST(coalesce(n_realized, 0) * 1000000"
                " DIV nullif(coalesce(n_rich, 0) * (coalesce(n_rich, 0) - 1)"
                " DIV 2, 0) AS BIGINT)"
            ).alias("phi_ppm"),
        )
        .orderBy("pct")
    )


def _rich_club_oracle() -> str:
    kcols = ",\n        ".join(
        f"max(CASE WHEN rn = least(m, ({p} * (m + 1)) // 100) THEN d END) AS k{p}"
        for p in _RICH_CLUB_PCTS
    )
    lits = "\n      UNION ALL ".join(
        f"SELECT CAST({p} AS BIGINT) AS pct, k{p} AS k FROM kq"
        for p in _RICH_CLUB_PCTS
    )
    return f"""
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), sized AS (
      SELECT l_orderkey FROM li GROUP BY 1
      HAVING count(*) BETWEEN 2 AND 200
    ), e AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM li a
      JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      JOIN sized s ON a.l_orderkey = s.l_orderkey
    ), deg AS (
      SELECT u, CAST(count(*) AS BIGINT) AS d
      FROM (SELECT src AS u FROM e UNION ALL SELECT dst FROM e)
      GROUP BY 1
    ), ranked AS (
      SELECT *, row_number() OVER (ORDER BY d ASC, u ASC) AS rn,
             count(*) OVER () AS m
      FROM deg
    ), kq AS (
      SELECT
        {kcols}
      FROM ranked
    ), ks AS (
      {lits}
    ), nrich AS (
      SELECT pct, ks.k, CAST(count(*) AS BIGINT) AS n_rich
      FROM ks JOIN deg ON d > ks.k GROUP BY 1, 2
    ), realized AS (
      SELECT pct, ks.k, CAST(count(*) AS BIGINT) AS n_realized
      FROM ks, e
      JOIN deg ds ON e.src = ds.u
      JOIN deg dd ON e.dst = dd.u
      WHERE ds.d > ks.k AND dd.d > ks.k
      GROUP BY 1, 2
    )
    SELECT ks.pct, CAST(ks.k AS BIGINT) AS k,
           coalesce(n.n_rich, 0) AS n_rich,
           coalesce(r.n_realized, 0) AS n_realized,
           CAST(coalesce(r.n_realized, 0) * 1000000
                // nullif(coalesce(n.n_rich, 0) * (coalesce(n.n_rich, 0) - 1) // 2, 0)
                AS BIGINT) AS phi_ppm
    FROM ks LEFT JOIN nrich n ON ks.pct = n.pct
            LEFT JOIN realized r ON ks.pct = r.pct
    ORDER BY ks.pct
"""


# ---------------------------------------------------------------------------
# Wave 10: SimHash null-model baseline (theory-vs-data, the LSH
# calibration's sibling for the Hamming family).


def _binom60_ppm() -> list:
    """(h, ppm) literals for Binomial(60, 1/2): C(60,h)·10⁶ DIV 2⁶⁰,
    computed ONCE in Python ints and shared by both engines (the
    Benford shared-literals device — C(60,30)·10⁶ ≈ 1.2e23 overflows
    BIGINT, so neither engine computes it in-plan)."""
    import math

    return [(h, math.comb(60, h) * 1_000_000 // (1 << 60)) for h in range(61)]


def text_simhash_baseline_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SimHash null model, measured: pair each document with its
    md5-rank neighbor (a deterministic RANDOM pairing — the seeded-
    order device) and histogram the 60-bit fingerprint Hamming
    distances against the Binomial(60, ½) expectation that
    INDEPENDENT fingerprints would follow. On this corpus the
    observed mass sits well below 30 bits — the ~31-token vocabulary
    correlates every fingerprint, and THAT measured deviation is the
    whole reason simhash works as a near-dup signal here. All 61
    distance rows are emitted (zeros included) with the expected ppm
    as shared literals, so both the theory column and the observation
    column are exact."""
    # r12 optimization (guide §2.5/§2.6): the 60 per-token sign
    # expressions + 60-buffer partial aggregate ran in the single scan
    # task of the one-row-group input (measured 22 s at sf0.1); spread
    # the map stage over the cluster. Result unchanged.
    docs = ensure_min_parallelism(
        load_table(spark, sf_dir, "documents").where(
            F.length(F.trim(F.col("text"))) > 0
        )
    )
    from pyspark.sql import Window

    from spotify_data_pipeline_spark.functions.text import tokens

    tok = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens(F.col("text")))).alias("tok")
    ).withColumn("_h", F.md5(F.col("tok")))
    sign_cols = [
        F.expr(
            f"2 * (((instr('0123456789abcdef', substr(_h, {j // 4 + 1}, 1)) - 1)"
            f" DIV {1 << (j % 4)}) % 2) - 1"
        ).alias(f"s{j}")
        for j in range(60)
    ]
    sums = tok.select("doc_id", *sign_cols).groupBy("doc_id").agg(
        *[F.sum(f"s{j}").alias(f"s{j}") for j in range(60)]
    )
    fp_expr = " + ".join(f"IF(s{j} > 0, {1 << j}L, 0L)" for j in range(60))
    fps = sums.select("doc_id", F.expr(fp_expr).alias("fp"))
    w = Window.orderBy(
        F.md5(F.col("doc_id").cast("string")).asc(), F.col("doc_id").asc()
    )
    ranked = fps.withColumn("_rn", F.row_number().over(w))
    a = ranked.where(F.col("_rn") % 2 == 1).select(
        ((F.col("_rn") + 1) / 2).cast("long").alias("_p"), F.col("fp").alias("fp_a")
    )
    b = ranked.where(F.col("_rn") % 2 == 0).select(
        (F.col("_rn") / 2).cast("long").alias("_p"), F.col("fp").alias("fp_b")
    )
    dists = a.join(b, "_p").select(
        F.expr("CAST(bit_count(fp_a ^ fp_b) AS BIGINT)").alias("hamming")
    )
    obs = dists.groupBy("hamming").agg(F.count("*").cast("long").alias("n_observed"))
    expected = spark.createDataFrame(
        _binom60_ppm(), "hamming BIGINT, expected_ppm BIGINT"
    )
    return (
        expected.join(obs, "hamming", "left")
        .select(
            "hamming",
            "expected_ppm",
            F.coalesce(F.col("n_observed"), F.lit(0)).cast("long").alias("n_observed"),
        )
        .orderBy("hamming")
    )


def _simhash_baseline_oracle() -> str:
    sign_cols = ",\n             ".join(
        f"2 * (((instr('0123456789abcdef', substr(h, {j // 4 + 1}, 1)) - 1)"
        f" // {1 << (j % 4)}) % 2) - 1 AS s{j}"
        for j in range(60)
    )
    sum_cols = ",\n             ".join(f"sum(s{j}) AS s{j}" for j in range(60))
    fp_expr = " + ".join(
        f"CASE WHEN s{j} > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END"
        for j in range(60)
    )
    lits = ", ".join(f"({h}, {ppm})" for h, ppm in _binom60_ppm())
    return rf"""
    WITH t AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
      FROM documents WHERE length(trim(text)) > 0
    ), tk AS (
      SELECT doc_id, md5(tok) AS h
      FROM (SELECT doc_id, unnest(list_distinct(toks)) AS tok FROM t)
    ), bits AS (
      SELECT doc_id,
             {sign_cols}
      FROM tk
    ), sums AS (
      SELECT doc_id,
             {sum_cols}
      FROM bits GROUP BY 1
    ), fps AS (
      SELECT doc_id, {fp_expr} AS fp FROM sums
    ), ranked AS (
      SELECT fp, row_number() OVER (
        ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rn
      FROM fps
    ), dists AS (
      SELECT CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
      FROM (SELECT (rn + 1) // 2 AS p, fp FROM ranked WHERE rn % 2 = 1) a
      JOIN (SELECT rn // 2 AS p, fp FROM ranked WHERE rn % 2 = 0) b USING (p)
    ), obs AS (
      SELECT hamming, CAST(count(*) AS BIGINT) AS n_observed
      FROM dists GROUP BY 1
    ), expected(hamming, expected_ppm) AS (VALUES {lits})
    SELECT CAST(e.hamming AS BIGINT) AS hamming,
           CAST(e.expected_ppm AS BIGINT) AS expected_ppm,
           coalesce(o.n_observed, 0) AS n_observed
    FROM expected e LEFT JOIN obs o ON e.hamming = o.hamming
    ORDER BY e.hamming
"""


# ---------------------------------------------------------------------------
# Wave 9: CUPED variance reduction (experimentation family closure).


def events_ab_cuped_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (Deng et al. WSDM'13) — the pre-experiment-covariate
    variance reduction every mature experimentation platform applies
    before reading a test: Y' = Y − θ(X − E[X]), θ = cov(X,Y)/var(X),
    with X = the user's PRE-period activity (Jan 1–15) and Y the
    experiment-period activity (Jan 16–31; the events table spans
    exactly January, measured at every SF). Everything the analyst
    divides is emitted as EXACT integer atoms (the ACF/assortativity
    discipline): per md5-bucketed arm (the SRM device) the user count
    and ΣX/ΣY, and globally the pooled θ numerator n·ΣXY − ΣX·ΣY and
    denominator n·ΣX² − (ΣX)², so θ, the adjusted means, and the
    variance-reduction ratio are each ONE downstream division of
    pinned integers. One per-user conditional agg (both windows in a
    single scan), one arm agg, one 1-row pooled agg, assembled
    broadcast."""
    ev = load_table(spark, sf_dir, "events")
    arm = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("ab1:"), F.col("user_id").cast("string"))),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.sum(
                (F.col("ts") < F.lit("2024-01-16 00:00:00").cast("timestamp"))
                .cast("long")
            ).alias("x"),
            F.sum(
                (F.col("ts") >= F.lit("2024-01-16 00:00:00").cast("timestamp"))
                .cast("long")
            ).alias("y"),
        )
        .select(arm.alias("arm"), "x", "y")
    )
    arms = per_user.groupBy("arm").agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("x").cast("long").alias("sum_x"),
        F.sum("y").cast("long").alias("sum_y"),
    )
    pooled = per_user.agg(
        (
            F.count("*") * F.sum(F.col("x") * F.col("y"))
            - F.sum("x") * F.sum("y")
        )
        .cast("long")
        .alias("theta_num"),
        (
            F.count("*") * F.sum(F.col("x") * F.col("x"))
            - F.sum("x") * F.sum("x")
        )
        .cast("long")
        .alias("theta_den"),
    )
    return (
        arms.crossJoin(F.broadcast(pooled))
        .select("arm", "n_users", "sum_x", "sum_y", "theta_num", "theta_den")
        .orderBy("arm")
    )


_CUPED_ORACLE = """
    WITH per_user AS (
      SELECT user_id,
             CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                           THEN 1 ELSE 0 END) AS BIGINT) AS x,
             CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
                           THEN 1 ELSE 0 END) AS BIGINT) AS y
      FROM events GROUP BY 1
    ), armed AS (
      SELECT ((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 4096
            + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 256
            + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1)) % 2 AS arm,
             x, y
      FROM (SELECT substr(md5('ab1:' || CAST(user_id AS VARCHAR)), 1, 4) AS h,
                   x, y
            FROM per_user)
    ), arms AS (
      SELECT CAST(arm AS BIGINT) AS arm,
             CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(x) AS BIGINT) AS sum_x,
             CAST(sum(y) AS BIGINT) AS sum_y
      FROM armed GROUP BY 1
    ), pooled AS (
      SELECT CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS BIGINT) AS theta_num,
             CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT) AS theta_den
      FROM armed
    )
    SELECT arm, n_users, sum_x, sum_y, theta_num, theta_den
    FROM arms, pooled
    ORDER BY arm
"""


# ---------------------------------------------------------------------------
# Wave 8: depth-2 decision tree + LSH theory-vs-data calibration.

_TREE_THRESHOLD = 200_000  # the stump's high-value label, shared


def ml_decision_tree_d2_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact depth-2 decision tree — the 1R stump grown one level:
    the root is the stump winner (min summed majority error, name
    tiebreak, selected IN-PLAN from a broadcast 1-row argmin — the
    tree structure is data-dependent, and the query still states it
    declaratively); each root-value branch then picks its own best
    second feature among the remaining two by within-branch majority
    error. Everything is counts and integer compares — the ID3 family
    with training error in place of entropy (log is not
    bit-reproducible; the argmin structure is what a depth-2 tree IS,
    the impurity choice is orthogonal and documented). One melted
    scan, one orderkey equi self-join pairing root and second
    features, two grouped argmins."""
    orders = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window

    melted = orders.select(
        "o_orderkey",
        (F.col("o_totalprice") >= _TREE_THRESHOLD).cast("long").alias("_hi"),
        F.explode(
            F.array(
                F.struct(
                    F.lit("priority").alias("feature"),
                    F.col("o_orderpriority").alias("value"),
                ),
                F.struct(
                    F.lit("status").alias("feature"),
                    F.col("o_orderstatus").alias("value"),
                ),
                F.struct(
                    F.lit("dow").alias("feature"),
                    (F.dayofweek("o_orderdate") - 1).cast("string").alias("value"),
                ),
            )
        ).alias("_f"),
    ).select("o_orderkey", "_f.feature", "_f.value", "_hi")
    per_feature = (
        melted.groupBy("feature", "value")
        .agg(F.count("*").alias("n"), F.sum("_hi").alias("nh"))
        .groupBy("feature")
        .agg(
            F.sum(F.least(F.col("nh"), F.col("n") - F.col("nh"))).alias("err")
        )
    )
    root = per_feature.orderBy("err", "feature").limit(1).select(
        F.col("feature").alias("_root")
    )
    m1 = melted.join(
        F.broadcast(root), melted.feature == F.col("_root")
    ).select("o_orderkey", F.col("feature").alias("root_feature"), F.col("value").alias("root_value"))
    m2 = melted.select(
        "o_orderkey",
        F.col("feature").alias("second_feature"),
        F.col("value").alias("_v2"),
        "_hi",
    )
    paired = m1.join(m2, "o_orderkey").where(
        F.col("second_feature") != F.col("root_feature")
    )
    leaf = paired.groupBy(
        "root_feature", "root_value", "second_feature", "_v2"
    ).agg(F.count("*").alias("n"), F.sum("_hi").alias("nh"))
    branch = leaf.groupBy("root_feature", "root_value", "second_feature").agg(
        F.sum("n").cast("long").alias("n_branch"),
        F.sum(F.least(F.col("nh"), F.col("n") - F.col("nh")))
        .cast("long")
        .alias("branch_errors"),
    )
    w = Window.partitionBy("root_value").orderBy(
        "branch_errors", "second_feature"
    )
    return (
        branch.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select(
            "root_feature",
            "root_value",
            "second_feature",
            "n_branch",
            "branch_errors",
            F.expr("branch_errors * 1000000 DIV n_branch").alias("error_ppm"),
        )
        .orderBy("root_value")
    )


_TREE_D2_ORACLE = f"""
    WITH melted AS (
      SELECT o_orderkey, CAST(o_totalprice >= {_TREE_THRESHOLD} AS BIGINT) AS hi,
             'priority' AS feature, o_orderpriority AS value FROM orders
      UNION ALL
      SELECT o_orderkey, CAST(o_totalprice >= {_TREE_THRESHOLD} AS BIGINT),
             'status', o_orderstatus FROM orders
      UNION ALL
      SELECT o_orderkey, CAST(o_totalprice >= {_TREE_THRESHOLD} AS BIGINT),
             'dow', CAST(dayofweek(o_orderdate) AS VARCHAR) FROM orders
    ), per_feature AS (
      SELECT feature, sum(least(nh, n - nh)) AS err FROM (
        SELECT feature, value, count(*) AS n, sum(hi) AS nh
        FROM melted GROUP BY 1, 2
      ) GROUP BY 1
    ), root AS (
      SELECT feature AS root_feature FROM per_feature
      ORDER BY err, feature LIMIT 1
    ), paired AS (
      SELECT m1.value AS root_value, m2.feature AS second_feature,
             m2.value AS v2, m2.hi
      FROM melted m1
      JOIN root r ON m1.feature = r.root_feature
      JOIN melted m2 ON m1.o_orderkey = m2.o_orderkey
                    AND m2.feature <> m1.feature
    ), leaf AS (
      SELECT root_value, second_feature, v2,
             count(*) AS n, sum(hi) AS nh
      FROM paired GROUP BY 1, 2, 3
    ), branch AS (
      SELECT root_value, second_feature,
             CAST(sum(n) AS BIGINT) AS n_branch,
             CAST(sum(least(nh, n - nh)) AS BIGINT) AS branch_errors
      FROM leaf GROUP BY 1, 2
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY root_value
                                   ORDER BY branch_errors, second_feature) AS rk
      FROM branch
    )
    SELECT r.root_feature, b.root_value, b.second_feature,
           b.n_branch, b.branch_errors,
           CAST(b.branch_errors * 1000000 // b.n_branch AS BIGINT) AS error_ppm
    FROM ranked b, root r
    WHERE b.rk = 1
    ORDER BY b.root_value
"""


def dedup_lsh_calibration_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH theory validated ON the corpus — for every exact-Jaccard
    pair (3-gram, J ≥ 0.01 — the proven pair machinery opened wide:
    this corpus's pair graph is BIMODAL, ~12k background pairs at
    J < 0.1 and ~27 planted near-dups at J ≥ 0.9, measured — so the
    calibration exercises both ends of the S-curve and the absence of
    the middle is a stated data fact, not a hidden one), the banding S-curve's predicted
    collision probability for an (r=2, b=8) md5-MinHash banding —
    S(J) = 1 − (1 − J²)⁸, evaluated by a SQUARING CHAIN (t², t⁴, t⁸:
    multiplications are IEEE-exact per step, unlike pow(), whose libm
    differs across engines) — next to the OBSERVED 0/1 collision of
    the pair under the actual md5 signatures (the
    dedup_minhash_estimate arithmetic, banded 2-by-2). The driver
    hash pins theory and observation side by side; pytest checks the
    curve actually calibrates (high-J pairs collide)."""
    from spotify_data_pipeline_spark.functions.text import shingles, tokens
    from spotify_data_pipeline_spark.operators.dedup import ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents").where(
        F.length(F.trim(F.col("text"))) > 0
    )
    pairs = ngram_jaccard_pairs(
        docs, id_col="doc_id", text_col="text", threshold=0.01
    ).select("id_a", "id_b", "jaccard")
    sh = docs.select(
        "doc_id",
        F.explode(F.array_distinct(shingles(tokens(F.col("text")), 3))).alias("sh"),
    )
    mins = [
        F.min(F.md5(F.concat(F.lit(f"m{k}:"), F.col("sh")))).alias(f"h{k}")
        for k in range(_MH_K_CAL)
    ]
    sig = (
        sh.groupBy("doc_id")
        .agg(*mins)
        .select("doc_id", F.array(*[f"h{k}" for k in range(_MH_K_CAL)]).alias("sig"))
    )
    collide = F.greatest(
        *[
            (
                (F.col("sa")[2 * b] == F.col("sb")[2 * b])
                & (F.col("sa")[2 * b + 1] == F.col("sb")[2 * b + 1])
            ).cast("long")
            for b in range(_MH_K_CAL // 2)
        ]
    )
    t = 1 - F.col("jaccard") * F.col("jaccard")
    out = (
        pairs.join(sig.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("sa")), "id_a")
        .join(sig.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("sb")), "id_b")
        .withColumn("_t2", t * t)
        .withColumn("_t4", F.col("_t2") * F.col("_t2"))
        .withColumn("_t8", F.col("_t4") * F.col("_t4"))
        .select(
            "id_a",
            "id_b",
            "jaccard",
            F.floor((1 - F.col("_t8")) * 10000 + F.lit(0.5))
            .cast("long")
            .alias("predicted_x1e4"),
            collide.alias("collided"),
        )
    )
    return out.orderBy("id_a", "id_b")


_MH_K_CAL = 16  # same 16-permutation signature; banded 2x8 here


def _lsh_calibration_oracle() -> str:
    min_cols = ",\n             ".join(
        f"min(md5('m{k}:' || sh)) AS h{k}" for k in range(_MH_K_CAL)
    )
    sig_list = ", ".join(f"h{k}" for k in range(_MH_K_CAL))
    band_hits = " OR ".join(
        f"(za.sg[{2 * b + 1}] = zb.sg[{2 * b + 1}]"
        f" AND za.sg[{2 * b + 2}] = zb.sg[{2 * b + 2}])"
        for b in range(_MH_K_CAL // 2)
    )
    return rf"""
    WITH t AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
      FROM documents WHERE length(trim(text)) > 0
    ), s AS (
      SELECT doc_id, unnest(
        CASE WHEN len(toks) >= 3
             THEN list_distinct(list_transform(range(1, len(toks) - 1),
                                               i -> array_to_string(toks[i:i+2], ' ')))
             ELSE [array_to_string(toks, ' ')] END) AS sh
      FROM t
    ), keep AS (
      SELECT sh FROM (SELECT sh, count(*) AS df FROM s GROUP BY 1)
      WHERE df <= greatest(100, CAST(floor(0.10 * (SELECT count(*) FROM documents)) AS BIGINT))
    ), sz AS (
      SELECT doc_id, count(*) AS n_sh FROM s GROUP BY 1
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
      FROM s a JOIN keep k ON a.sh = k.sh
               JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), pairs AS (
      SELECT id_a, id_b,
             floor(n_common / (za.n_sh + zb.n_sh - n_common) * 10000 + 0.5) / 10000
               AS jaccard
      FROM inter JOIN sz za ON inter.id_a = za.doc_id
                 JOIN sz zb ON inter.id_b = zb.doc_id
      WHERE floor(n_common / (za.n_sh + zb.n_sh - n_common) * 10000 + 0.5) / 10000 >= 0.01
    ), m AS (
      SELECT doc_id,
             {min_cols}
      FROM s GROUP BY 1
    ), sig AS (
      SELECT doc_id, [{sig_list}] AS sg FROM m
    )
    SELECT p.id_a, p.id_b, p.jaccard,
           CAST(floor((1 - (((1 - p.jaccard * p.jaccard) * (1 - p.jaccard * p.jaccard))
                            * ((1 - p.jaccard * p.jaccard) * (1 - p.jaccard * p.jaccard)))
                          * (((1 - p.jaccard * p.jaccard) * (1 - p.jaccard * p.jaccard))
                            * ((1 - p.jaccard * p.jaccard) * (1 - p.jaccard * p.jaccard))))
                      * 10000 + 0.5) AS BIGINT) AS predicted_x1e4,
           CAST(({band_hits}) AS BIGINT) AS collided
    FROM pairs p
    JOIN sig za ON p.id_a = za.doc_id
    JOIN sig zb ON p.id_b = zb.doc_id
    ORDER BY p.id_a, p.id_b
"""


# ---------------------------------------------------------------------------
# Wave 7: DBSCAN composition.

_DB_EPS_BUDGET = 10_000_000  # eps2 = budget DIV m — constant expected
# neighbor count as the customer frame grows (density in the fixed
# [0,1e4)² feature square is ∝ m, so an ε² ∝ 1/m ball sees O(1)
# points at every SF — measured: core/border/noise = 23/16/111 at
# sf0.001, 429/211/860 at sf0.01, ~5.6k/?/~9.4k at sf0.1)
_DB_MINPTS = 5


def ml_dbscan_customers_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Density-based clustering (DBSCAN, Ester et al. KDD'96) of
    customers in the (total spend, largest order) feature plane — the
    composition proof: grid-cell ε-neighbor join (geo radius-join
    device) → core classification → connected components (the proven
    operator) → deterministic border assignment, all exact integers
    (coords scaled to a fixed 10⁴ square, ε-ball by squared compare,
    ε² calibrated ∝ 1/m IN-PLAN so the expected neighborhood is
    scale-free — the alert-cooldown lesson: parameters chosen so
    every branch bites at every SF, and here they are FORMULAS, not
    constants). Output is the one-row census (core/border/noise,
    cluster count, largest cluster). The oracle replicates everything
    with a naive range join + recursive-CTE reachability; at sf0.1
    that closure is infeasible in DuckDB, so the third-SF proof is
    the independent Python union-find in pytest instead (slow-marked),
    the strongest check each scale affords."""
    from spotify_data_pipeline_spark.operators.dbscan import dbscan_summary
    from spotify_data_pipeline_spark.plans.parity import rnd_cents

    orders = load_table(spark, sf_dir, "orders")
    per = orders.groupBy("o_custkey").agg(
        F.sum(rnd_cents(F.col("o_totalprice"))).alias("_c"),
        F.max(rnd_cents(F.col("o_totalprice"))).alias("_cm"),
    )
    meta = per.agg(
        F.count("*").alias("_m"),
        F.max("_c").alias("_maxc"),
        F.max("_cm").alias("_maxcm"),
    )
    pts = per.crossJoin(F.broadcast(meta)).select(
        F.col("o_custkey").alias("id"),
        F.expr("_c * 10000 DIV (_maxc + 1)").alias("x"),
        F.expr("_cm * 10000 DIV (_maxcm + 1)").alias("y"),
        F.expr(f"{_DB_EPS_BUDGET} DIV _m").alias("eps2"),
        F.expr(
            f"CAST(floor(sqrt(CAST({_DB_EPS_BUDGET} DIV _m AS DOUBLE)))"
            " AS BIGINT) + 1"
        ).alias("w"),
    )
    return dbscan_summary(pts, minpts=_DB_MINPTS)


_DBSCAN_ORACLE = f"""
    WITH RECURSIVE per AS (
      SELECT o_custkey AS id,
             CAST(sum(CAST(floor(o_totalprice*100+0.5) AS BIGINT)) AS BIGINT) AS c,
             CAST(max(CAST(floor(o_totalprice*100+0.5) AS BIGINT)) AS BIGINT) AS cmax
      FROM orders GROUP BY 1
    ), meta AS (
      SELECT CAST(count(*) AS BIGINT) AS m, max(c) AS maxc, max(cmax) AS maxcm
      FROM per
    ), pts AS (
      SELECT id, c * 10000 // (maxc + 1) AS x, cmax * 10000 // (maxcm + 1) AS y,
             {_DB_EPS_BUDGET} // m AS eps2,
             CAST(floor(sqrt(CAST({_DB_EPS_BUDGET} // m AS DOUBLE))) AS BIGINT) + 1 AS w
      FROM per, meta
    ), nbr AS (
      SELECT a.id AS ia, b.id AS ib
      FROM pts a JOIN pts b
        ON b.y BETWEEN a.y - a.w AND a.y + a.w
       AND b.x BETWEEN a.x - a.w AND a.x + a.w
       AND a.id <> b.id
      WHERE (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= a.eps2
    ), deg AS (
      SELECT ia AS id, count(*) AS d FROM nbr GROUP BY 1
    ), core AS (
      SELECT id FROM deg WHERE d >= {_DB_MINPTS}
    ), ce AS (
      SELECT n.ia AS u, n.ib AS v FROM nbr n
      JOIN core c1 ON n.ia = c1.id JOIN core c2 ON n.ib = c2.id
    ), reach(u, v) AS (
      SELECT u, u FROM ce
      UNION
      SELECT r.u, e.v FROM reach r JOIN ce e ON r.v = e.u
    ), core_lab AS (
      SELECT c.id, coalesce(l.comp, c.id) AS cluster
      FROM core c LEFT JOIN (
        SELECT u AS id, min(v) AS comp FROM reach GROUP BY 1
      ) l ON c.id = l.id
    ), border AS (
      SELECT n.ia AS id, min(cl.cluster) AS cluster
      FROM nbr n JOIN core_lab cl ON n.ib = cl.id
      WHERE n.ia NOT IN (SELECT id FROM core)
      GROUP BY 1
    ), sizes AS (
      SELECT cluster, count(*) AS sz FROM (
        SELECT cluster FROM core_lab
        UNION ALL
        SELECT cluster FROM border
      ) GROUP BY 1
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM pts) AS n_points,
           (SELECT CAST(count(*) AS BIGINT) FROM core) AS n_core,
           (SELECT CAST(count(*) AS BIGINT) FROM border) AS n_border,
           (SELECT CAST(count(*) AS BIGINT) FROM pts)
             - (SELECT count(*) FROM core)
             - (SELECT count(*) FROM border) AS n_noise,
           (SELECT CAST(count(*) AS BIGINT) FROM sizes) AS n_clusters,
           (SELECT CAST(max(sz) AS BIGINT) FROM sizes) AS largest_cluster
"""


# ---------------------------------------------------------------------------
# Wave 6: driver-provable k-means.

_KM_K = 4
_KM_ITER = 2
_KM_DIMS = 64


def ml_kmeans_exact_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-means made driver-provable (operators/kmeans_exact.py) — the
    rows-only trained-clustering family (NS-9) gets its exact-oracle
    twin, the md5-MinHash move applied to Lloyd: seeded-order init,
    integer squared distances over int8-quantized vectors, floor-mean
    centroid updates, a FIXED unrolled iteration count, and total
    tiebreaks everywhere — so the DuckDB oracle replicates the ENTIRE
    algorithm (init, 2 assignment rounds, 2 updates, final labeling)
    and the k-row cluster report hash-matches. Per iteration: one
    broadcast of the k-row centroid frame over the corpus scan + one
    (cluster, dim) aggregate — k·dims state rows, never the corpus."""
    from spotify_data_pipeline_spark.operators.kmeans_exact import (
        kmeans_cluster_report,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_cluster_report(emb, k=_KM_K, iterations=_KM_ITER)


def _kmeans_oracle() -> str:
    d = _KM_DIMS
    dist = (
        f"CAST(list_sum(list_transform(range(1, {d + 1}),"
        " i -> (v.q[i] - c.c[i]) * (v.q[i] - c.c[i]))) AS BIGINT)"
    )
    parts = [
        f"""WITH z AS (
      SELECT vec_id, embedding,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS m
      FROM embeddings
    ), qz AS (
      SELECT vec_id,
             CASE WHEN m = 0
                  THEN list_transform(embedding, x -> CAST(0 AS DOUBLE))
                  ELSE list_transform(embedding, x -> CAST(least(greatest(
                         floor(CAST(x AS DOUBLE) * 127 / m + 0.5),
                         -127.0), 127.0) AS DOUBLE))
             END AS q
      FROM z
    ), seeds AS (
      SELECT q, row_number() OVER (
        ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC) AS rn
      FROM qz
    ), c0 AS (
      SELECT CAST(rn - 1 AS BIGINT) AS cluster, q AS c
      FROM seeds WHERE rn <= {_KM_K}
    )"""
    ]
    prev = "c0"
    for it in range(1, _KM_ITER + 1):
        parts.append(
            f""", a{it} AS (
      SELECT vec_id, q, cluster, dist FROM (
        SELECT v.vec_id, v.q, c.cluster, {dist} AS dist,
               row_number() OVER (PARTITION BY v.vec_id
                                  ORDER BY {dist} ASC, c.cluster ASC) AS rn
        FROM qz v CROSS JOIN {prev} c
      ) WHERE rn = 1
    ), u{it} AS (
      SELECT cluster, dim,
             floor(sum(val) / count(*)) AS cval
      FROM (
        SELECT cluster, unnest(q) AS val, generate_subscripts(q, 1) AS dim
        FROM a{it}
      ) GROUP BY 1, 2
    ), c{it} AS (
      SELECT p.cluster, coalesce(nu.c, p.c) AS c
      FROM {prev} p LEFT JOIN (
        SELECT cluster, list(cval ORDER BY dim) AS c FROM u{it} GROUP BY 1
      ) nu USING (cluster)
    )"""
        )
        prev = f"c{it}"
    parts.append(
        f""", fin AS (
      SELECT vec_id, cluster, dist FROM (
        SELECT v.vec_id, c.cluster, {dist} AS dist,
               row_number() OVER (PARTITION BY v.vec_id
                                  ORDER BY {dist} ASC, c.cluster ASC) AS rn
        FROM qz v CROSS JOIN {prev} c
      ) WHERE rn = 1
    )
    SELECT cluster,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(sum(dist) AS BIGINT) AS inertia,
           CAST(min(dist) AS BIGINT) AS min_dist,
           CAST(max(dist) AS BIGINT) AS max_dist
    FROM fin GROUP BY 1 ORDER BY 1"""
    )
    return "\n    ".join(parts)


def join_salted_skew_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key skew mitigation, driver-proven harmless: lineitem joins
    supplier through ``operators/saltjoin.salted_equi_join`` (fact rows
    spread 8 ways by xxhash64(l_orderkey, l_linenumber); supplier
    replicated 8x in-plan; sort-merge join on (suppkey, _salt)), then
    per-nation line counts and exact revenue cents. The oracle is the
    PLAIN join+agg — the hash match is the proof that salting is pure
    partition engineering with zero result surface, the same
    optimized-vs-naive pattern as ``join_bloom_semireduction`` (bloom
    prefilter) and ``text_inverted_phrase`` (index vs scan). At 100 TB
    this is the join you run when ``ops_skew_report`` flags a power-law
    key and the dim side is too big to broadcast: S comes from the
    report's ceil-salt column, the dim ships S times (bounded, known),
    and the hot key's single straggler task becomes S even tasks. The
    salt is deterministic (re-runs/retries place rows identically) and
    non-null by construction (xxhash64 maps NULLs to its seed — a NULL
    salt would drop matched rows)."""
    from spotify_data_pipeline_spark.operators.saltjoin import salted_equi_join

    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    joined = salted_equi_join(
        li, su, "l_suppkey", "s_suppkey", 8, ("l_orderkey", "l_linenumber")
    )
    return (
        joined.groupBy(F.col("s_nationkey").cast("long").alias("nationkey"))
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.sum(
                F.expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")
            )
            .cast("long")
            .alias("revenue_cents"),
        )
        .orderBy("nationkey")
    )


_SALTED_SKEW_ORACLE = """
    SELECT CAST(s.s_nationkey AS BIGINT) AS nationkey,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY 1
    ORDER BY 1
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
    PendingQuery(
        "orders_revenue_bridge",
        orders_revenue_bridge_query,
        _REVENUE_BRIDGE_ORACLE,
        tags=("orders", "bridge", "fpa", "cohort", "integer-exact"),
    ),
    PendingQuery(
        "privacy_dp_sensitivity",
        privacy_dp_sensitivity_query,
        _DP_SENSITIVITY_ORACLE,
        tags=("privacy", "dp", "sensitivity", "clipping", "integer-exact"),
    ),
    PendingQuery(
        "fn_try_error_suite",
        fn_try_error_suite_query,
        _TRY_SUITE_ORACLE,
        tags=("functions", "try", "error-handling", "parity"),
    ),
    PendingQuery(
        "ops_partition_plan",
        ops_partition_plan_query,
        _partition_plan_oracle(),
        tags=("ops", "planning", "partitioning", "self-tuning", "integer-exact"),
    ),
    PendingQuery(
        "llm_tokenizer_ratio",
        llm_tokenizer_ratio_query,
        _TOKENIZER_RATIO_ORACLE,
        tags=("llmops", "tokenizer", "compression", "integer-exact"),
    ),
    PendingQuery(
        "window_leave_one_out",
        window_leave_one_out_query,
        _LOO_ORACLE,
        tags=("window", "leave-one-out", "exclude-current-row", "integer-exact"),
    ),
    PendingQuery(
        "dedup_cluster_histogram",
        dedup_cluster_histogram_query,
        _cluster_hist_oracle(),
        tags=("dedup", "observability", "components", "histogram", "integer-exact"),
    ),
    PendingQuery(
        "sim_mmr_diversified",
        sim_mmr_diversified_query,
        _mmr_oracle(),
        tags=("similarity", "mmr", "diversified-retrieval", "integer-exact"),
    ),
    PendingQuery(
        "ml_kmeans_exact",
        ml_kmeans_exact_query,
        _kmeans_oracle(),
        tags=("ml", "kmeans", "clustering", "driver-provable", "integer-exact"),
    ),
    PendingQuery(
        "ml_dbscan_customers",
        ml_dbscan_customers_query,
        _DBSCAN_ORACLE,
        tags=("ml", "dbscan", "density", "composition", "integer-exact"),
    ),
    PendingQuery(
        "ml_decision_tree_d2",
        ml_decision_tree_d2_query,
        _TREE_D2_ORACLE,
        tags=("ml", "decision-tree", "depth-2", "integer-exact"),
    ),
    PendingQuery(
        "dedup_lsh_calibration",
        dedup_lsh_calibration_query,
        _lsh_calibration_oracle(),
        tags=("dedup", "lsh", "calibration", "s-curve", "theory-vs-data"),
    ),
    PendingQuery(
        "llm_curation_funnel",
        llm_curation_funnel_query,
        _curation_funnel_oracle(),
        tags=("llmops", "curation", "funnel", "observability", "integer-exact"),
    ),
    PendingQuery(
        "text_burstiness",
        text_burstiness_query,
        _BURSTINESS_ORACLE,
        tags=("text", "burstiness", "linguistics", "integer-exact"),
    ),
    PendingQuery(
        "graph_rich_club",
        graph_rich_club_query,
        _rich_club_oracle(),
        tags=("graph", "rich-club", "topology", "integer-exact"),
    ),
    PendingQuery(
        "text_simhash_baseline",
        text_simhash_baseline_query,
        _simhash_baseline_oracle(),
        tags=("text", "simhash", "null-model", "theory-vs-data", "integer-exact"),
    ),
    PendingQuery(
        "events_ab_cuped",
        events_ab_cuped_query,
        _CUPED_ORACLE,
        tags=("events", "experimentation", "cuped", "variance-reduction",
              "integer-exact"),
    ),
    PendingQuery(
        "join_salted_skew",
        join_salted_skew_query,
        _SALTED_SKEW_ORACLE,
        tags=("join", "skew", "salting", "optimized-vs-naive",
              "integer-exact"),
    ),
)
