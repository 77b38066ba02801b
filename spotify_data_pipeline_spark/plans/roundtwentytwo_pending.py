"""Round-22 declared-query staging area — the PHYSICAL-DESIGN wave:
the planning/audit queries a warehouse owner runs to pick layouts
BEFORE burning cluster time, each one a deterministic simulation over
the data (in production these run over file/row-group METADATA — the
per-row simulation here stands in for that metadata table, which the
sf tables are small enough to materialize directly).

- **Z-order audit**: bounding-box quality of 16 file ranges under a
  z-interleaved (Morton) layout vs a linear compound sort — the
  number that decides whether OPTIMIZE ZORDER BY is worth the
  rewrite (Delta/Iceberg clustering; operators/zorder.py is the
  write-side twin).
- **Compaction plan**: cumulative-offset binning of small files into
  target-size output files (the sorted bin-pack a compactor runs);
  reports per-bin fill so the operator can see straggler bins.
- **Shuffle-partition advice**: byte-estimates per table from column
  widths and the partition counts they imply at three target sizes —
  the spark.sql.shuffle.partitions / maxPartitionBytes sizing table.
- **Row-group skipping**: zone-map (min/max) skip rates for a date
  predicate under two physical sort orders — the data-skipping win
  that justifies sorting on write.
- **Partition-layout cost**: day vs month vs unpartitioned bytes
  scanned for a 30-day predicate — the partition-granularity
  decision, stated as scan ppm.

Per-wave staging module (nothing evidenced imports this file).
Exactness: everything is integer arithmetic — byte estimates from
fixed type widths + string lengths, integer cents for the acctbal
quantization, ppm via DIV. Global row_number windows here order the
simulated file/row-group METADATA, not a data path (the layout is
the thing under test); at 100 TB these queries run over the catalog's
file-stats table, which has the same shape and fits one node.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.io import load_table


@dataclass(frozen=True)
class PendingQuery:
    name: str
    fn: object
    oracle: str | None
    headline: bool = False
    tags: tuple[str, ...] = ()


# ---------------------------------------------------------------------------
# 1. Z-order audit — Morton layout vs linear compound sort
# ---------------------------------------------------------------------------

_Z_RANGES = 16
_Z_BITS = 8


def _z_expr(intdiv: str) -> str:
    """Shared Morton-interleave arithmetic (x on odd bits, y on even);
    ``intdiv`` is 'DIV' (Spark) or '//' (DuckDB)."""
    terms = []
    for b in range(_Z_BITS):
        terms.append(f"((x {intdiv} {1 << b}) % 2) * {1 << (2 * b + 1)}")
        terms.append(f"((y {intdiv} {1 << b}) % 2) * {1 << (2 * b)}")
    return " + ".join(terms)


def warehouse_zorder_audit_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Would OPTIMIZE ZORDER BY (acctbal, nationkey) beat the linear
    compound sort for 2-D predicates on customer? Quantize both dims
    to 8 bits (acctbal via integer cents — exact), lay the table out
    (a) by the Morton z-value and (b) by the compound (x, y) sort,
    cut each layout into 16 equal file ranges, and report the summed
    and worst bounding-box areas per layout — the min/max-pruning
    surface a 2-D predicate sees. Smaller boxes = fewer false-positive
    file reads.

    Scale shape: map-only quantization; the ordering windows rank the
    simulated file metadata (see module docstring); per-range agg then
    2-row summary. The 1-row row-count is the whitelisted broadcast.
    """
    cust = load_table(spark, sf_dir, "customer")
    cents = F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long")
    x = F.least(
        F.lit(255),
        F.greatest(F.lit(0), F.expr("((cents + 100000) * 256) DIV 1101000")),
    )
    y = F.least(F.lit(255), F.col("c_nationkey").cast("long") * 10)
    base = (
        cust.select("c_custkey", cents.alias("cents"), F.col("c_nationkey"))
        .withColumn("x", x)
        .withColumn("y", y)
        .withColumn("z", F.expr(_z_expr("DIV")))
    )
    n1 = base.agg(F.count(F.lit(1)).cast("long").alias("n"))

    def summarize(layout: str, order_cols) -> DataFrame:
        w = Window.orderBy(*order_cols)
        per_range = (
            base.withColumn("rn", F.row_number().over(w))
            .crossJoin(F.broadcast(n1))
            .withColumn(
                "range_id", F.expr(f"((rn - 1) * {_Z_RANGES}) DIV n")
            )
            .groupBy("range_id")
            .agg(
                (F.max("x") - F.min("x") + 1).alias("span_x"),
                (F.max("y") - F.min("y") + 1).alias("span_y"),
            )
        )
        return per_range.agg(
            F.lit(layout).alias("layout"),
            F.count(F.lit(1)).cast("long").alias("n_ranges"),
            F.sum(F.col("span_x") * F.col("span_y"))
            .cast("long")
            .alias("sum_bbox_area"),
            F.max(F.col("span_x") * F.col("span_y"))
            .cast("long")
            .alias("max_bbox_area"),
            F.expr(f"sum(span_x * span_y) DIV {_Z_RANGES}")
            .cast("long")
            .alias("avg_bbox_area"),
        )

    zorder = summarize(
        "zorder", [F.col("z").asc(), F.col("c_custkey").asc()]
    )
    linear = summarize(
        "linear",
        [F.col("x").asc(), F.col("y").asc(), F.col("c_custkey").asc()],
    )
    return zorder.unionAll(linear).orderBy("layout")


_ZORDER_ORACLE = f"""
  WITH base AS (
    SELECT c_custkey, x, y, {_z_expr("//")} AS z
    FROM (
      SELECT c_custkey,
             least(255, greatest(0, ((cents + 100000) * 256) // 1101000)) AS x,
             least(255, CAST(c_nationkey AS BIGINT) * 10) AS y
      FROM (
        SELECT c_custkey, c_nationkey,
               CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
        FROM customer
      )
    )
  ), n1 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
  ranked AS (
    SELECT 'zorder' AS layout, x, y,
           row_number() OVER (ORDER BY z, c_custkey) AS rn
    FROM base
    UNION ALL
    SELECT 'linear' AS layout, x, y,
           row_number() OVER (ORDER BY x, y, c_custkey) AS rn
    FROM base
  ), ranges AS (
    SELECT layout, ((rn - 1) * {_Z_RANGES}) // n AS range_id,
           max(x) - min(x) + 1 AS span_x,
           max(y) - min(y) + 1 AS span_y
    FROM ranked CROSS JOIN n1
    GROUP BY layout, ((rn - 1) * {_Z_RANGES}) // n
  )
  SELECT layout,
         CAST(count(*) AS BIGINT) AS n_ranges,
         CAST(sum(span_x * span_y) AS BIGINT) AS sum_bbox_area,
         CAST(max(span_x * span_y) AS BIGINT) AS max_bbox_area,
         CAST(sum(span_x * span_y) // {_Z_RANGES} AS BIGINT) AS avg_bbox_area
  FROM ranges GROUP BY layout ORDER BY layout
"""


# ---------------------------------------------------------------------------
# 2. Compaction plan — cumulative-offset binning into target files
# ---------------------------------------------------------------------------

_CPT_TARGET = 262144  # 256 KiB output files
_CPT_FILE_KEY = 64  # orderkeys per simulated small file
_CPT_TOP_BINS = 25


def ops_compaction_plan_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction plan: simulated input files (lineitem
    grouped by l_orderkey DIV 64, bytes = fixed column widths + string
    lengths) are concatenated in file-id order and cut at 256 KiB
    offsets — the sorted bin-pack an OPTIMIZE/rewrite job executes.
    Per output bin: input-file count, bytes, and fill ppm (straddling
    input files make the cut bin run past 1e6 ppm — the over-fill a
    splitting compactor would trim). First 25 bins.

    Scale shape: one shuffle to file grain, then a cumsum over the
    FILE metadata (bounded: files, not rows) and a bin agg.
    """
    li = load_table(spark, sf_dir, "lineitem")
    row_bytes = (
        F.lit(68)
        + F.length("l_returnflag")
        + F.length("l_linestatus")
    ).cast("long")
    files = (
        li.withColumn("file_id", F.expr(f"l_orderkey DIV {_CPT_FILE_KEY}"))
        .groupBy("file_id")
        .agg(F.sum(row_bytes).cast("long").alias("file_bytes"))
    )
    w = (
        Window.orderBy("file_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    binned = files.withColumn(
        "cum_before", F.coalesce(F.sum("file_bytes").over(w), F.lit(0))
    ).withColumn("bin_id", F.expr(f"cum_before DIV {_CPT_TARGET}"))
    return (
        binned.groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum("file_bytes").cast("long").alias("bin_bytes"),
            F.expr(f"(sum(file_bytes) * 1000000) DIV {_CPT_TARGET}")
            .cast("long")
            .alias("fill_ppm"),
        )
        .orderBy("bin_id")
        .limit(_CPT_TOP_BINS)
        .select(
            F.col("bin_id").cast("long").alias("bin_id"),
            "n_files",
            "bin_bytes",
            "fill_ppm",
        )
    )


_CPT_ORACLE = f"""
  WITH files AS (
    SELECT l_orderkey // {_CPT_FILE_KEY} AS file_id,
           CAST(sum(68 + length(l_returnflag) + length(l_linestatus))
                AS BIGINT) AS file_bytes
    FROM lineitem GROUP BY 1
  ), binned AS (
    SELECT file_id, file_bytes,
           CAST(coalesce(sum(file_bytes) OVER (
             ORDER BY file_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) // {_CPT_TARGET} AS bin_id
    FROM files
  )
  SELECT CAST(bin_id AS BIGINT) AS bin_id,
         CAST(count(*) AS BIGINT) AS n_files,
         CAST(sum(file_bytes) AS BIGINT) AS bin_bytes,
         CAST((sum(file_bytes) * 1000000) // {_CPT_TARGET} AS BIGINT)
           AS fill_ppm
  FROM binned GROUP BY 1 ORDER BY 1 LIMIT {_CPT_TOP_BINS}
"""


# ---------------------------------------------------------------------------
# 3. Shuffle-partition advice — byte estimates -> partition counts
# ---------------------------------------------------------------------------

_SPA_TARGETS = (65536, 1048576, 67108864)  # 64 KiB / 1 MiB / 64 MiB


def ops_shuffle_partition_advice_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The spark.sql.shuffle.partitions sizing table: estimated bytes
    per table (8 B per numeric/timestamp, 4 B per int, string
    lengths) and the partition count each target partition size
    implies — ceil(bytes/target), floor 1. The engine's advisor twins
    (suggest_bin_width, suggest_similarity_join_path) decide from
    measured crossovers; this one is the capacity arithmetic every
    job submission needs first.

    Scale shape: one map-side-combinable agg per table (no joins),
    a 4-row union, a 3-element explode. Nothing shuffles more than
    4 rows.
    """

    def est(tbl: str, fixed: int, strcols: tuple[str, ...]) -> DataFrame:
        t = load_table(spark, sf_dir, tbl)
        rb = F.lit(fixed)
        for c in strcols:
            rb = rb + F.length(c)
        return t.agg(
            F.lit(tbl).alias("tbl"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(rb.cast("long")).cast("long").alias("est_bytes"),
        )

    tables = (
        est("lineitem", 68, ("l_returnflag", "l_linestatus"))
        .unionAll(est("orders", 32, ("o_orderstatus", "o_orderpriority")))
        .unionAll(est("customer", 20, ("c_name", "c_mktsegment")))
        .unionAll(est("events", 32, ("event_type", "props")))
    )
    targets = F.explode(
        F.array(*[F.lit(t).cast("long") for t in _SPA_TARGETS])
    ).alias("target_bytes")
    return (
        tables.select("tbl", "n_rows", "est_bytes", targets)
        .withColumn(
            "advised_partitions",
            F.greatest(
                F.lit(1).cast("long"),
                F.expr("(est_bytes + target_bytes - 1) DIV target_bytes"),
            ).cast("long"),
        )
        .orderBy("tbl", "target_bytes")
    )


_SPA_TARGETS_SQL = ", ".join(f"({t})" for t in _SPA_TARGETS)

_SPA_ORACLE = f"""
  WITH tables AS (
    SELECT 'lineitem' AS tbl, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(68 + length(l_returnflag) + length(l_linestatus))
                AS BIGINT) AS est_bytes
    FROM lineitem
    UNION ALL
    SELECT 'orders', CAST(count(*) AS BIGINT),
           CAST(sum(32 + length(o_orderstatus) + length(o_orderpriority))
                AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'customer', CAST(count(*) AS BIGINT),
           CAST(sum(20 + length(c_name) + length(c_mktsegment)) AS BIGINT)
    FROM customer
    UNION ALL
    SELECT 'events', CAST(count(*) AS BIGINT),
           CAST(sum(32 + length(event_type) + length(props)) AS BIGINT)
    FROM events
  ), targets(target_bytes) AS (VALUES {_SPA_TARGETS_SQL})
  SELECT tbl, n_rows, est_bytes,
         CAST(target_bytes AS BIGINT) AS target_bytes,
         greatest(CAST(1 AS BIGINT),
                  (est_bytes + target_bytes - 1) // target_bytes)
           AS advised_partitions
  FROM tables CROSS JOIN targets
  ORDER BY tbl, target_bytes
"""


# ---------------------------------------------------------------------------
# 4. Row-group skipping — zone maps under two sort orders
# ---------------------------------------------------------------------------

_RG_ROWS = 512
_RG_LO = "1997-03-01 00:00:00"
_RG_HI = "1997-04-01 00:00:00"


def warehouse_rowgroup_skipping_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Zone-map effectiveness: cut lineitem into 512-row row groups
    under (a) a ship-date sort and (b) the natural orderkey sort,
    record per-group min/max l_shipdate, and count the groups a
    March-1997 predicate can skip — plus the rows actually scanned.
    The sorted layout should skip nearly everything; the unsorted one
    nearly nothing. This is the number that justifies sorting on
    write at 100 TB.

    Scale shape: the ordering windows rank the simulated row-group
    metadata (module docstring); per-group min/max agg; 2-row summary.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    )
    lo = F.lit(_RG_LO).cast("timestamp")
    hi = F.lit(_RG_HI).cast("timestamp")

    def summarize(layout: str, order_cols) -> DataFrame:
        w = Window.orderBy(*order_cols)
        groups = (
            li.withColumn("rn", F.row_number().over(w))
            .withColumn("rg", F.expr(f"(rn - 1) DIV {_RG_ROWS}"))
            .groupBy("rg")
            .agg(
                F.min("l_shipdate").alias("mn"),
                F.max("l_shipdate").alias("mx"),
                F.count(F.lit(1)).cast("long").alias("rows_in_group"),
            )
            .withColumn("skipped", (F.col("mx") < lo) | (F.col("mn") >= hi))
        )
        return groups.agg(
            F.lit(layout).alias("layout"),
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum(F.col("skipped").cast("long")).cast("long").alias("n_skipped"),
            F.expr("(sum(CAST(skipped AS LONG)) * 1000000) DIV count(1)")
            .cast("long")
            .alias("skipped_ppm"),
            F.sum(
                F.when(~F.col("skipped"), F.col("rows_in_group")).otherwise(0)
            )
            .cast("long")
            .alias("rows_scanned"),
        )

    by_date = summarize(
        "shipdate_sorted",
        [
            F.col("l_shipdate").asc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        ],
    )
    natural = summarize(
        "orderkey_natural",
        [F.col("l_orderkey").asc(), F.col("l_linenumber").asc()],
    )
    return by_date.unionAll(natural).orderBy("layout")


_RG_ORACLE = f"""
  WITH ranked AS (
    SELECT 'shipdate_sorted' AS layout, l_shipdate,
           row_number() OVER (ORDER BY l_shipdate, l_orderkey, l_linenumber)
             AS rn
    FROM lineitem
    UNION ALL
    SELECT 'orderkey_natural', l_shipdate,
           row_number() OVER (ORDER BY l_orderkey, l_linenumber)
    FROM lineitem
  ), groups AS (
    SELECT layout, (rn - 1) // {_RG_ROWS} AS rg,
           min(l_shipdate) AS mn, max(l_shipdate) AS mx,
           CAST(count(*) AS BIGINT) AS rows_in_group
    FROM ranked GROUP BY 1, 2
  ), flagged AS (
    SELECT *,
           (mx < TIMESTAMP '{_RG_LO}' OR mn >= TIMESTAMP '{_RG_HI}')
             AS skipped
    FROM groups
  )
  SELECT layout,
         CAST(count(*) AS BIGINT) AS n_groups,
         CAST(sum(CASE WHEN skipped THEN 1 ELSE 0 END) AS BIGINT)
           AS n_skipped,
         CAST((sum(CASE WHEN skipped THEN 1 ELSE 0 END) * 1000000)
              // count(*) AS BIGINT) AS skipped_ppm,
         CAST(sum(CASE WHEN skipped THEN 0 ELSE rows_in_group END)
              AS BIGINT) AS rows_scanned
  FROM flagged GROUP BY layout ORDER BY layout
"""


# ---------------------------------------------------------------------------
# 5. Partition-layout cost — day vs month vs none
# ---------------------------------------------------------------------------


def warehouse_partition_layout_cost_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Partition-granularity decision for orders under a 30-day
    predicate: bytes scanned when the table is partitioned by day, by
    month, or not at all (whole partitions containing any matching
    row are read in full — partition pruning's unit of work). Scan
    ppm against total table bytes is the comparable number.

    Scale shape: one shuffle to day grain (the partition metadata),
    then three 1-row aggs over that bounded metadata, unioned.
    """
    orders = load_table(spark, sf_dir, "orders")
    lo = F.lit(_RG_LO).cast("timestamp")
    hi = F.lit(_RG_HI).cast("timestamp")
    row_bytes = (
        F.lit(32)
        + F.length("o_orderstatus")
        + F.length("o_orderpriority")
    ).cast("long")
    days = (
        orders.withColumn("day", F.date_trunc("day", F.col("o_orderdate")))
        .withColumn("_rb", row_bytes)
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("rows"),
            F.sum("_rb").cast("long").alias("bytes"),
            F.max(
                ((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
                .cast("long")
            ).alias("touched"),
        )
        .withColumn("month", F.date_trunc("month", F.col("day")))
    )

    def layer(layout: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(layout).alias("layout"),
            F.count(F.lit(1)).cast("long").alias("partitions_total"),
            F.sum(F.col("touched").cast("long"))
            .cast("long")
            .alias("partitions_touched"),
            F.sum(F.when(F.col("touched") == 1, F.col("rows")).otherwise(0))
            .cast("long")
            .alias("rows_scanned"),
            F.sum(F.when(F.col("touched") == 1, F.col("bytes")).otherwise(0))
            .cast("long")
            .alias("bytes_scanned"),
            F.expr(
                "(sum(CASE WHEN touched = 1 THEN bytes ELSE 0 END) * 1000000)"
                " DIV sum(bytes)"
            )
            .cast("long")
            .alias("scan_ppm"),
        )

    months = days.groupBy("month").agg(
        F.sum("rows").cast("long").alias("rows"),
        F.sum("bytes").cast("long").alias("bytes"),
        F.max("touched").alias("touched"),
    )
    whole = days.agg(
        F.lit(1).cast("long").alias("one"),
        F.sum("rows").cast("long").alias("rows"),
        F.sum("bytes").cast("long").alias("bytes"),
        F.max("touched").alias("touched"),
    ).select("rows", "bytes", "touched")
    return (
        layer("day", days)
        .unionAll(layer("month", months))
        .unionAll(layer("none", whole))
        .orderBy("layout")
    )


_PLC_ORACLE = f"""
  WITH days AS (
    SELECT date_trunc('day', o_orderdate) AS day,
           date_trunc('month', o_orderdate) AS month,
           CAST(count(*) AS BIGINT) AS rows,
           CAST(sum(32 + length(o_orderstatus) + length(o_orderpriority))
                AS BIGINT) AS bytes,
           CAST(max(CASE WHEN o_orderdate >= TIMESTAMP '{_RG_LO}'
                          AND o_orderdate < TIMESTAMP '{_RG_HI}'
                         THEN 1 ELSE 0 END) AS BIGINT) AS touched
    FROM orders GROUP BY 1, 2
  ), months AS (
    SELECT month, CAST(sum(rows) AS BIGINT) AS rows,
           CAST(sum(bytes) AS BIGINT) AS bytes,
           CAST(max(touched) AS BIGINT) AS touched
    FROM days GROUP BY 1
  ), whole AS (
    SELECT CAST(sum(rows) AS BIGINT) AS rows,
           CAST(sum(bytes) AS BIGINT) AS bytes,
           CAST(max(touched) AS BIGINT) AS touched
    FROM days
  ), layers AS (
    SELECT 'day' AS layout, count(*) AS partitions_total,
           sum(touched) AS partitions_touched,
           sum(CASE WHEN touched = 1 THEN rows ELSE 0 END) AS rows_scanned,
           sum(CASE WHEN touched = 1 THEN bytes ELSE 0 END) AS bytes_scanned,
           (sum(CASE WHEN touched = 1 THEN bytes ELSE 0 END) * 1000000)
             // sum(bytes) AS scan_ppm
    FROM days
    UNION ALL
    SELECT 'month', count(*), sum(touched),
           sum(CASE WHEN touched = 1 THEN rows ELSE 0 END),
           sum(CASE WHEN touched = 1 THEN bytes ELSE 0 END),
           (sum(CASE WHEN touched = 1 THEN bytes ELSE 0 END) * 1000000)
             // sum(bytes)
    FROM months
    UNION ALL
    SELECT 'none', count(*), sum(touched),
           sum(CASE WHEN touched = 1 THEN rows ELSE 0 END),
           sum(CASE WHEN touched = 1 THEN bytes ELSE 0 END),
           (sum(CASE WHEN touched = 1 THEN bytes ELSE 0 END) * 1000000)
             // sum(bytes)
    FROM whole
  )
  SELECT layout,
         CAST(partitions_total AS BIGINT) AS partitions_total,
         CAST(partitions_touched AS BIGINT) AS partitions_touched,
         CAST(rows_scanned AS BIGINT) AS rows_scanned,
         CAST(bytes_scanned AS BIGINT) AS bytes_scanned,
         CAST(scan_ppm AS BIGINT) AS scan_ppm
  FROM layers ORDER BY layout
"""


PENDING: tuple[PendingQuery, ...] = (
    PendingQuery(
        "warehouse_zorder_audit",
        warehouse_zorder_audit_query,
        _ZORDER_ORACLE,
        tags=("warehouse", "zorder", "morton", "layout", "integer-exact"),
    ),
    PendingQuery(
        "ops_compaction_plan",
        ops_compaction_plan_query,
        _CPT_ORACLE,
        tags=("ops", "compaction", "bin-packing", "integer-exact"),
    ),
    PendingQuery(
        "ops_shuffle_partition_advice",
        ops_shuffle_partition_advice_query,
        _SPA_ORACLE,
        tags=("ops", "sizing", "advice", "integer-exact"),
    ),
    PendingQuery(
        "warehouse_rowgroup_skipping",
        warehouse_rowgroup_skipping_query,
        _RG_ORACLE,
        tags=("warehouse", "zone-maps", "data-skipping", "integer-exact"),
    ),
    PendingQuery(
        "warehouse_partition_layout_cost",
        warehouse_partition_layout_cost_query,
        _PLC_ORACLE,
        tags=("warehouse", "partitioning", "pruning", "integer-exact"),
    ),
)
