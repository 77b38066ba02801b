"""Round-41 declared-query staging area — STAGED FOR ROUND 13 (second
staged-ahead wave beside roundforty; the round-12 window is full at
exactly 50, so these carry the full kit but are NOT activated).

Incremental-maintenance, web-curation, and warehouse-ops depth:

- **Bloom shard-union law**: the decontamination screen's incremental
  story (llm_decontam_bloom): Bloom bitmaps merge by bitwise OR, so
  shard bitmaps union in a reduce without rescanning history. Split
  the eval set in half, build per-half bit sets, pin
  union == rebuilt as an executable 1-row law — the Bloom sibling of
  dedup_minhash_merge_rebuild / dedup_simhash_merge_rebuild.
- **URL canonicalization census**: embed deterministic URL variants
  (mixed-case host, utm_* tracking params, trailing slash), then
  canonicalize and report per domain how many "distinct" URLs
  collapse — the crawl-frontier dedup step every web pipeline runs
  before content dedup ever sees a page.
- **Retention policy audit**: per age tier (hot <= 7 days, warm <= 21,
  expired beyond) relative to the corpus high-water-mark day: day
  count, event count, exact value mass in cents — the partition-level
  delete/compact manifest a warehouse retention job executes.
- **Exact-vs-PQ top-k overlap**: per probe vector, overlap@5 between
  exact integer-L2 top-5 and 1-bit-PQ Hamming top-5 (sign codes, 4
  nibbles packed; XOR + bit_count on both engines) — the recall
  readout that says what the binary index costs on THIS corpus.
- **Partition size plan**: per event day, estimated bytes (exact
  per-row accounting), the file count at a 64 KiB target, and the
  small-file flag — the `maxPartitionBytes` / compaction tuning
  table, priced from data instead of guessed.

Per-wave staging module (nothing evidenced imports this file).
Exactness rules as earlier waves.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.functions.text import is_nonblank, shingles, tokens
from spotify_data_pipeline_spark.io import load_table


@dataclass(frozen=True)
class PendingQuery:
    name: str
    fn: object
    oracle: str | None
    headline: bool = False
    tags: tuple[str, ...] = ()


_TOKENS_SQL = "string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')"

_MD5_HEAD15 = (
    "(strpos('0123456789abcdef', substr(md5({arg}), 1, 1)) - 1)"
    " * 72057594037927936"
    " + CAST(('0x' || substr(md5({arg}), 2, 14)) AS BIGINT)"
)


def _md5_mod_sql(arg_sql: str, m: int) -> str:
    return f"CAST(({_MD5_HEAD15.format(arg=arg_sql)}) % {m} AS BIGINT)"


def _md5_mod(col: F.Column, m: int) -> F.Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long") % m


# ---------------------------------------------------------------------------
# 1. Bloom shard-union law
# ---------------------------------------------------------------------------

_BU_M = 16384
_BU_K = 3
_BU_EVAL_MOD = 29  # the llm_decontam_bloom eval population


def dedup_bloom_union_law_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeability pin for the Bloom decontamination screen: the
    screen's state is a bit SET (positions 0..m-1), and set union is
    bitwise OR, so shard bitmaps built independently OR together into
    exactly the bitmap a full rebuild produces. Split the eval docs
    (doc_id % 29 == 0, the llm_decontam_bloom population) into halves
    by doc_id parity, derive each half's bit positions (same m=16384,
    k=3 'b{k}:' channels), and emit the 1-row law: per-half bit
    counts, the union count, the rebuilt count, and
    union_eq_rebuilt — algebra forces 1, and that algebra is why a
    100 TB decontamination index ingests new eval suites as shard
    deltas with no history rescan.

    Scale shape: one shingle scan over eval docs only, three bounded
    (<= m rows) bit-set aggregates, one 1-row assembly. The corpus
    side of the screen is not touched — this is an index-maintenance
    law, not a probe.
    """
    docs = load_table(spark, sf_dir, "documents").where(is_nonblank(F.col("text")))
    ev = docs.where(F.col("doc_id") % _BU_EVAL_MOD == 0)
    grams = ev.select(
        "doc_id",
        (F.col("doc_id") % 2 == 0).alias("half_a"),
        F.explode(shingles(tokens(F.col("text")), 8)).alias("g"),
    ).distinct()
    pos = grams.select(
        "half_a",
        F.explode(
            F.array(
                *[
                    _md5_mod(F.concat(F.lit(f"b{k}:"), F.col("g")), _BU_M)
                    for k in range(_BU_K)
                ]
            )
        ).alias("pos"),
    )
    bits_a = pos.where(F.col("half_a")).select("pos").distinct()
    bits_b = pos.where(~F.col("half_a")).select("pos").distinct()
    bits_all = pos.select("pos").distinct()
    union = bits_a.unionByName(bits_b).distinct()
    stats = (
        bits_a.agg(F.count(F.lit(1)).cast("long").alias("bits_a"))
        .crossJoin(
            F.broadcast(bits_b.agg(F.count(F.lit(1)).cast("long").alias("bits_b")))
        )
        .crossJoin(
            F.broadcast(
                union.agg(F.count(F.lit(1)).cast("long").alias("bits_union"))
            )
        )
        .crossJoin(
            F.broadcast(
                bits_all.agg(F.count(F.lit(1)).cast("long").alias("bits_rebuilt"))
            )
        )
        .crossJoin(
            F.broadcast(
                union.join(bits_all, "pos", "left_anti")
                .agg(F.count(F.lit(1)).cast("long").alias("_extra"))
            )
        )
    )
    return stats.select(
        "bits_a",
        "bits_b",
        "bits_union",
        "bits_rebuilt",
        F.when(
            (F.col("bits_union") == F.col("bits_rebuilt")) & (F.col("_extra") == 0),
            1,
        )
        .otherwise(0)
        .cast("long")
        .alias("union_eq_rebuilt"),
    )


def _bu_oracle() -> str:
    poss = ", ".join(
        "(" + _md5_mod_sql(f"'b{k}:' || g", _BU_M) + ")" for k in range(_BU_K)
    )
    return rf"""
    WITH ev AS (
      SELECT doc_id, doc_id % 2 = 0 AS half_a, {_TOKENS_SQL} AS toks
      FROM documents
      WHERE length(trim(text)) > 0 AND doc_id % {_BU_EVAL_MOD} = 0
    ), grams AS (
      SELECT DISTINCT doc_id, half_a, unnest(
        CASE WHEN len(toks) >= 8
             THEN list_transform(range(1, len(toks) - 6),
                                 i -> array_to_string(toks[i:i+7], ' '))
             ELSE [array_to_string(toks, ' ')] END) AS g
      FROM ev
    ), pos AS (
      SELECT half_a, unnest([{poss}]) AS pos FROM grams
    ), a AS (SELECT DISTINCT pos FROM pos WHERE half_a),
    b AS (SELECT DISTINCT pos FROM pos WHERE NOT half_a),
    allb AS (SELECT DISTINCT pos FROM pos),
    un AS (SELECT pos FROM a UNION SELECT pos FROM b)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM a) AS bits_a,
           (SELECT CAST(count(*) AS BIGINT) FROM b) AS bits_b,
           (SELECT CAST(count(*) AS BIGINT) FROM un) AS bits_union,
           (SELECT CAST(count(*) AS BIGINT) FROM allb) AS bits_rebuilt,
           CAST(CASE WHEN (SELECT count(*) FROM un) = (SELECT count(*) FROM allb)
                      AND (SELECT count(*) FROM un u
                           WHERE u.pos NOT IN (SELECT pos FROM allb)) = 0
                THEN 1 ELSE 0 END AS BIGINT) AS union_eq_rebuilt
    """


# ---------------------------------------------------------------------------
# 2. URL canonicalization census
# ---------------------------------------------------------------------------


def dedup_url_canonical_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-frontier URL dedup: embed three deterministic variants of
    each document's canonical URL (mixed-case host; a utm_source
    tracking param; a trailing slash), extract all URLs, canonicalize
    — lowercase the authority, drop utm_* query params (and the '?'
    if nothing survives), strip one trailing slash — and report per
    canonical domain: raw distinct URLs, canonical distinct URLs, and
    the collapse ppm. Every variant group collapses 3 -> 1 by
    construction, so collapse_ppm is pinned at 666666 — the point is
    the canonicalizer itself, exercised end-to-end with an exact
    cross-engine oracle (RE2-safe patterns only).

    Scale shape: map-only extraction + two domain-keyed distinct
    aggs; domain cardinality is web-bounded. No joins.
    """
    docs = load_table(spark, sf_dir, "documents")
    host = F.concat(F.lower("source"), F.lit(".example.org"))
    # first-letter capitalization spelled identically on both engines
    # (initcap's word-delimiter rules differ from a plain substr
    # recapitalization — avoid the trap)
    host_mixed = F.concat(
        F.upper(F.expr("substr(source, 1, 1)")),
        F.lower(F.expr("substr(source, 2)")),
        F.lit(".EXAMPLE.org"),
    )
    path = F.concat(F.lit("/page/"), F.col("doc_id").cast("string"))
    page = F.concat(
        F.lit("see http://"), host, path,
        F.lit(" track http://"), host, path,
        F.lit("?utm_source=feed"),
        F.lit(" alt http://"), host_mixed, path, F.lit("/"),
    )
    urls = docs.select(page.alias("_page")).select(
        F.explode(
            F.expr("regexp_extract_all(_page, 'https?://[^\\\\s]+', 0)")
        ).alias("url")
    )
    # canonicalize: lowercase scheme+authority, keep path/query as-is
    scheme = F.regexp_extract("url", r"^(https?)://", 1)
    auth = F.lower(F.regexp_extract("url", r"^https?://([^/\s?#]+)", 1))
    rest = F.regexp_extract("url", r"^https?://[^/\s?#]+([^\s]*)$", 1)
    # drop utm_* params, then a dangling '?', then one trailing slash
    rest_c = F.regexp_replace(rest, r"[?&]utm_[A-Za-z0-9_]+=[^&\s]*", "")
    rest_c = F.regexp_replace(rest_c, r"\?$", "")
    rest_c = F.regexp_replace(rest_c, r"/$", "")
    canon = F.concat(scheme, F.lit("://"), auth, rest_c)
    c = urls.select(
        "url",
        canon.alias("canon"),
        F.regexp_extract(canon, r"^https?://([^/\s?#]+)", 1).alias("domain"),
    )
    return (
        c.groupBy("domain")
        .agg(
            F.count_distinct("url").cast("long").alias("raw_urls"),
            F.count_distinct("canon").cast("long").alias("canon_urls"),
        )
        .select(
            "domain",
            "raw_urls",
            "canon_urls",
            F.expr("((raw_urls - canon_urls) * 1000000) DIV raw_urls")
            .cast("long")
            .alias("collapse_ppm"),
        )
        .orderBy("domain")
    )


_UC_ORACLE = r"""
  WITH pages AS (
    SELECT 'see http://' || lower(source) || '.example.org/page/' || doc_id
        || ' track http://' || lower(source) || '.example.org/page/' || doc_id
        || '?utm_source=feed'
        || ' alt http://'
        || upper(substr(source, 1, 1)) || lower(substr(source, 2))
        || '.EXAMPLE.org/page/' || doc_id || '/'
      AS page
    FROM documents
  ), urls AS (
    SELECT unnest(regexp_extract_all(page, 'https?://[^\s]+')) AS url
    FROM pages
  ), canon AS (
    SELECT url,
           regexp_extract(url, '^(https?)://', 1) || '://'
           || lower(regexp_extract(url, '^https?://([^/\s?#]+)', 1))
           || regexp_replace(regexp_replace(regexp_replace(
                regexp_extract(url, '^https?://[^/\s?#]+([^\s]*)$', 1),
                '[?&]utm_[A-Za-z0-9_]+=[^&\s]*', ''),
                '\?$', ''),
                '/$', '')
             AS c
    FROM urls
  )
  SELECT regexp_extract(c, '^https?://([^/\s?#]+)', 1) AS domain,
         CAST(count(DISTINCT url) AS BIGINT) AS raw_urls,
         CAST(count(DISTINCT c) AS BIGINT) AS canon_urls,
         CAST(((count(DISTINCT url) - count(DISTINCT c)) * 1000000)
              // count(DISTINCT url) AS BIGINT) AS collapse_ppm
  FROM canon GROUP BY 1
  ORDER BY domain
"""


# ---------------------------------------------------------------------------
# 3. Retention policy audit
# ---------------------------------------------------------------------------

_RP_HOT_DAYS = 7
_RP_WARM_DAYS = 21


def ops_retention_policy_audit_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warehouse retention manifest: per age tier relative to the
    corpus high-water-mark DAY (hot: age <= 7 days, warm: 8..21,
    expired: > 21 — the partitions a retention job would delete), the
    day-partition count, event count, and exact value mass in cents.
    The high-water anchor is data-derived (events_trending /
    orders_aging precedent), so the audit is reproducible at any
    snapshot.

    Scale shape: one scan, day truncation, a 1-row max-day broadcast,
    and a 3-row tier aggregate. At 100 TB the day key IS the physical
    partition key, so the tier census reads partition metadata scale.
    """
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        F.to_date("ts").alias("day"),
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    hwm = days.agg(F.max("day").alias("_hwm"))
    tiered = days.crossJoin(F.broadcast(hwm)).select(
        F.when(F.datediff("_hwm", "day") <= _RP_HOT_DAYS, "1-hot")
        .when(F.datediff("_hwm", "day") <= _RP_WARM_DAYS, "2-warm")
        .otherwise("3-expired")
        .alias("tier"),
        "day",
        "cents",
    )
    return (
        tiered.groupBy("tier")
        .agg(
            F.count_distinct("day").cast("long").alias("n_days"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("cents").cast("long").alias("value_cents"),
        )
        .orderBy("tier")
    )


_RP_ORACLE = rf"""
  WITH days AS (
    SELECT CAST(ts AS DATE) AS day,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
    FROM events
  ), hwm AS (SELECT max(day) AS h FROM days)
  SELECT CASE
           WHEN date_diff('day', day, (SELECT h FROM hwm)) <= {_RP_HOT_DAYS}
             THEN '1-hot'
           WHEN date_diff('day', day, (SELECT h FROM hwm)) <= {_RP_WARM_DAYS}
             THEN '2-warm'
           ELSE '3-expired' END AS tier,
         CAST(count(DISTINCT day) AS BIGINT) AS n_days,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(cents) AS BIGINT) AS value_cents
  FROM days GROUP BY 1
  ORDER BY tier
"""


# ---------------------------------------------------------------------------
# 4. Exact-vs-PQ top-k overlap
# ---------------------------------------------------------------------------

_PO_DIMS = 16
_PO_SUBSPACES = 4
_PO_SUBDIM = _PO_DIMS // _PO_SUBSPACES
_PO_K = 5
_PO_QUERY_MOD = 50  # probe vectors: vec_id % 50 == 0


def sim_pq_exact_topk_overlap_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serving recall readout for the 1-bit product quantizer: per
    probe vector (vec_id % 50 == 0), the overlap between the exact
    integer-L2 top-5 and the PQ Hamming top-5 (sign codes per 4-dim
    subspace packed into one 16-bit word; distance = bit_count(XOR);
    both rankings tie-break on candidate vec_id, self excluded).
    overlap@5 out of 5 is what the binary index actually recalls on
    THIS corpus — the measured counterpart of sim_pq_code_balance's
    structural audit.

    Scale shape: the bounded probe set broadcasts over one corpus
    scan (the sim_cosine_topk documented anchor pattern); per-probe
    top-5 are WindowGroupLimit-pruned windows partitioned BY probe;
    the overlap join is top-5 x top-5 per probe.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    qcols = [
        F.floor(
            F.element_at("embedding", i + 1).cast("double") * 1000000 + F.lit(0.5)
        )
        .cast("long")
        .alias(f"q{i}")
        for i in range(_PO_DIMS)
    ]
    base = emb.select("vec_id", *qcols)
    code = F.lit(0).cast("long")
    for s in range(_PO_SUBSPACES):
        for j in range(_PO_SUBDIM):
            comp = F.col(f"q{s * _PO_SUBDIM + j}")
            code = code + F.when(
                comp >= 0, F.lit(1 << (s * _PO_SUBDIM + j)).cast("long")
            ).otherwise(F.lit(0).cast("long"))
    coded = base.withColumn("pq", code)
    probes = coded.where(F.col("vec_id") % _PO_QUERY_MOD == 0).select(
        F.col("vec_id").alias("p_id"),
        *[F.col(f"q{i}").alias(f"pq{i}") for i in range(_PO_DIMS)],
        F.col("pq").alias("p_code"),
    )
    d2 = None
    for i in range(_PO_DIMS):
        diff = F.col(f"q{i}") - F.col(f"pq{i}")
        term = diff * diff
        d2 = term if d2 is None else d2 + term
    scored = (
        coded.crossJoin(F.broadcast(probes))
        .where(F.col("vec_id") != F.col("p_id"))
        .select(
            "p_id",
            "vec_id",
            d2.cast("long").alias("d2"),
            F.bit_count(F.col("pq").bitwiseXOR(F.col("p_code")))
            .cast("long")
            .alias("ham"),
        )
    )
    w_e = Window.partitionBy("p_id").orderBy(F.asc("d2"), F.asc("vec_id"))
    w_h = Window.partitionBy("p_id").orderBy(F.asc("ham"), F.asc("vec_id"))
    top_e = (
        scored.withColumn("rn", F.row_number().over(w_e))
        .where(F.col("rn") <= _PO_K)
        .select("p_id", "vec_id")
    )
    top_h = (
        scored.withColumn("rn", F.row_number().over(w_h))
        .where(F.col("rn") <= _PO_K)
        .select("p_id", "vec_id")
    )
    overlap = (
        top_e.join(top_h, ["p_id", "vec_id"])
        .groupBy("p_id")
        .agg(F.count(F.lit(1)).cast("long").alias("overlap"))
    )
    return (
        probes.select("p_id")
        .join(overlap, "p_id", "left")
        .select(
            F.col("p_id").alias("probe_id"),
            F.coalesce(F.col("overlap"), F.lit(0)).cast("long").alias("overlap_at_5"),
            F.lit(_PO_K).cast("long").alias("k"),
        )
        .orderBy("probe_id")
    )


def _po_oracle() -> str:
    q_cols = ", ".join(
        f"CAST(floor(CAST(embedding[{i + 1}] AS DOUBLE) * 1000000 + 0.5)"
        f" AS BIGINT) AS q{i}"
        for i in range(_PO_DIMS)
    )
    bits = " + ".join(
        f"CASE WHEN q{i} >= 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END"
        for i in range(_PO_DIMS)
    )
    d2_ep = " + ".join(
        f"(e.q{i} - p.q{i}) * (e.q{i} - p.q{i})" for i in range(_PO_DIMS)
    )
    return rf"""
    WITH qv AS (SELECT vec_id, {q_cols} FROM embeddings),
    coded AS (SELECT vec_id, {", ".join(f"q{i}" for i in range(_PO_DIMS))},
                     CAST({bits} AS BIGINT) AS pq
              FROM qv),
    probes AS (SELECT * FROM coded WHERE vec_id % {_PO_QUERY_MOD} = 0),
    scored AS (
      SELECT p.vec_id AS p_id, e.vec_id,
             CAST({d2_ep} AS BIGINT) AS d2,
             CAST(bit_count(xor(e.pq, p.pq)) AS BIGINT) AS ham
      FROM coded e CROSS JOIN probes p
      WHERE e.vec_id <> p.vec_id
    ), top_e AS (
      SELECT p_id, vec_id FROM (
        SELECT p_id, vec_id,
               row_number() OVER (PARTITION BY p_id ORDER BY d2, vec_id) AS rn
        FROM scored) WHERE rn <= {_PO_K}
    ), top_h AS (
      SELECT p_id, vec_id FROM (
        SELECT p_id, vec_id,
               row_number() OVER (PARTITION BY p_id ORDER BY ham, vec_id) AS rn
        FROM scored) WHERE rn <= {_PO_K}
    ), ov AS (
      SELECT e.p_id, CAST(count(*) AS BIGINT) AS overlap
      FROM top_e e JOIN top_h h USING (p_id, vec_id)
      GROUP BY 1
    )
    SELECT p.vec_id AS probe_id,
           coalesce(o.overlap, 0) AS overlap_at_5,
           CAST({_PO_K} AS BIGINT) AS k
    FROM probes p LEFT JOIN ov o ON o.p_id = p.vec_id
    ORDER BY probe_id
    """


# ---------------------------------------------------------------------------
# 5. Partition size plan
# ---------------------------------------------------------------------------

_PS_TARGET_BYTES = 65536  # 64 KiB target per file at the test SFs
_PS_FIXED_ROW_BYTES = 48  # event_id + ts + user_id + value + overhead


def ops_partition_size_plan_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction / `maxPartitionBytes` tuning table: per event day,
    the exact row count, estimated bytes (fixed per-row accounting +
    actual payload lengths: event_type, props), the file count at a
    64 KiB target (ceil division), bytes per file, and a small-files
    flag (more than one file AND under half-target average). At
    100 TB with daily partitions this is the table a compaction job
    consumes; the byte model is deliberately explicit integer
    arithmetic so both engines agree bit-for-bit.

    Scale shape: one scan, one day-keyed agg (map-side combinable),
    bounded output (one row per day). No joins, no windows.
    """
    ev = load_table(spark, sf_dir, "events")
    per_day = (
        ev.select(
            F.to_date("ts").alias("day"),
            (
                F.lit(_PS_FIXED_ROW_BYTES)
                + F.length(F.coalesce(F.col("event_type"), F.lit("")))
                + F.length(F.coalesce(F.col("props"), F.lit("")))
            )
            .cast("long")
            .alias("row_bytes"),
        )
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("row_bytes").cast("long").alias("est_bytes"),
        )
    )
    return per_day.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_rows",
        "est_bytes",
        F.expr(f"(est_bytes + {_PS_TARGET_BYTES} - 1) DIV {_PS_TARGET_BYTES}")
        .cast("long")
        .alias("n_files"),
        F.expr(
            f"est_bytes DIV ((est_bytes + {_PS_TARGET_BYTES} - 1)"
            f" DIV {_PS_TARGET_BYTES})"
        )
        .cast("long")
        .alias("bytes_per_file"),
        F.when(
            (
                F.expr(
                    f"(est_bytes + {_PS_TARGET_BYTES} - 1) DIV {_PS_TARGET_BYTES}"
                )
                > 1
            )
            & (
                F.expr(
                    f"est_bytes DIV ((est_bytes + {_PS_TARGET_BYTES} - 1)"
                    f" DIV {_PS_TARGET_BYTES})"
                )
                < _PS_TARGET_BYTES // 2
            ),
            1,
        )
        .otherwise(0)
        .cast("long")
        .alias("small_files_flag"),
    ).orderBy("day")


_PS_ORACLE = rf"""
  WITH per_day AS (
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum({_PS_FIXED_ROW_BYTES}
                    + length(coalesce(event_type, ''))
                    + length(coalesce(props, ''))) AS BIGINT) AS est_bytes
    FROM events GROUP BY 1
  )
  SELECT day, n_rows, est_bytes,
         CAST((est_bytes + {_PS_TARGET_BYTES} - 1) // {_PS_TARGET_BYTES}
              AS BIGINT) AS n_files,
         CAST(est_bytes // ((est_bytes + {_PS_TARGET_BYTES} - 1)
                            // {_PS_TARGET_BYTES}) AS BIGINT) AS bytes_per_file,
         CAST(CASE WHEN (est_bytes + {_PS_TARGET_BYTES} - 1)
                        // {_PS_TARGET_BYTES} > 1
                    AND est_bytes // ((est_bytes + {_PS_TARGET_BYTES} - 1)
                                      // {_PS_TARGET_BYTES})
                        < {_PS_TARGET_BYTES // 2}
                   THEN 1 ELSE 0 END AS BIGINT) AS small_files_flag
  FROM per_day
  ORDER BY day
"""


PENDING: tuple[PendingQuery, ...] = (
    PendingQuery(
        "dedup_bloom_union_law",
        dedup_bloom_union_law_query,
        _bu_oracle(),
        tags=("dedup", "bloom", "incremental", "mergeable", "integer-exact"),
    ),
    PendingQuery(
        "dedup_url_canonical",
        dedup_url_canonical_query,
        _UC_ORACLE,
        tags=("dedup", "url", "canonicalization", "integer-exact"),
    ),
    PendingQuery(
        "ops_retention_policy_audit",
        ops_retention_policy_audit_query,
        _RP_ORACLE,
        tags=("ops", "retention", "warehouse", "integer-exact"),
    ),
    PendingQuery(
        "sim_pq_exact_topk_overlap",
        sim_pq_exact_topk_overlap_query,
        _po_oracle(),
        tags=("sim", "pq", "recall", "serving", "integer-exact"),
    ),
    PendingQuery(
        "ops_partition_size_plan",
        ops_partition_size_plan_query,
        _PS_ORACLE,
        tags=("ops", "compaction", "tuning", "integer-exact"),
    ),
)

#: documented 1-row / bounded broadcast assemblies (read by
#: tools/plan_audit.py; migrate into test_plan_hygiene's whitelist at
#: activation): bloom_union_law = five 1-row count aggregates
#: assembled by broadcast crossJoin; retention_policy_audit = 1-row
#: high-water-mark broadcast (trending/aging precedent);
#: pq_exact_topk_overlap = bounded probe-set broadcast crossJoin (the
#: sim_cosine_topk anchor pattern).
_BNLJ_OK = (
    "dedup_bloom_union_law",
    "ops_retention_policy_audit",
    "sim_pq_exact_topk_overlap",
)
