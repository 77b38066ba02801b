"""Round-24 declared-query staging area — the ALGORITHMIC-BREADTH
wave: three operator families the engine claims (graph centrality,
multimodal near-dup, probabilistic membership) pushed one level
deeper, each with an exact cross-engine oracle.

- **Truncated Brandes betweenness** (Brandes '01, the k-source
  depth-capped approximation every scalable graph engine ships):
  per-source BFS path counts (sigma, exact integers) on the bipartite
  supplier<->customer purchase graph, then the backward dependency
  accumulation delta with per-edge micro-nat terms — the two-phase
  algorithm itself, not a proxy. Vectorized over sources: every
  frontier is keyed (source, node), so one dataflow runs all BFS
  trees at once.
- **dHash near-dup on synthesized images** (the multimodal axis'
  driver-checkable upgrade): deterministic 8x8 'grayscale' grids
  synthesized from md5 bytes per doc (shared base image per
  doc_id DIV 8 + per-doc sparse noise — re-encode twins), 56-bit
  difference hash in pure integer arithmetic, LSH banding on 4x14-bit
  bands, Hamming via bit_count(xor) — never all-pairs.
- **Bloom-filter decontamination** (the scale path of the exact
  8-gram screen llm_decontam_overlap): k=3 md5 bit positions over an
  m=16384 bitmap built from the eval set, corpus probes via three
  bit-position semi-joins, and the FALSE-POSITIVE accounting against
  the exact join — the measured price of the sketch.

Per-wave staging module (nothing evidenced imports this file).
Exactness rules as earlier waves: integer ppm, BIGINT casts,
deterministic tiebreaks, micro-nat per-term floors (BIGINT/BIGINT
double division), the 15-hex md5 device for every hash.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
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

# First hex digit weighted by 16^14 (72057594037927936) + the
# remaining 14 hex digits — the TRUE integer value of the 15-digit md5
# head, equal to Spark's conv(substr(md5, 1, 15), 16, 10) for EVERY
# modulus. (The earlier llm_shard_manifest oracle wrote 16^13 here —
# invisible under power-of-2 moduli because the low 52 bits still
# agree, but wrong for anything else; this wave needs mod 17.)
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
# 1. Truncated Brandes betweenness
# ---------------------------------------------------------------------------

_BC_SOURCES = 4
_BC_TOP = 20


def graph_betweenness_brandes_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """k-source depth-3 Brandes betweenness on the bipartite
    supplier<->customer purchase graph. Forward: per-source BFS
    levels L0 (the 4 lowest suppkeys), L1 (their customers,
    sigma=1), L2 (other suppliers, sigma = common-neighbor count),
    L3 (customers unseen at L1) — exact integer path counts.
    Backward: delta(v) = sum over tree children w of
    sigma_v * (1e6 + delta_w) / sigma_w, each term floored to
    micro-nats (BIGINT/BIGINT double — the per-term device), so the
    accumulation is an integer sum. Emits the top-20 intermediate
    nodes by total dependency — the brokers whose removal disconnects
    the most shortest paths.

    Scale shape: every phase is a frontier equi-join + agg keyed
    (source, node) — the synchronized-round dataflow of the SSSP and
    PageRank rows, with sources vectorized into the key (k sources
    cost one plan, not k plans). No node ever holds more state than
    (sigma, delta); the depth cap bounds the rounds.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    # r13 (guide §5, same device as the BPE/MMR fixes): the frontier
    # frames are referenced by multiple later phases (edges 5×, l1 3×,
    # l2 3×, d2 2×) — uncut, every reference replayed the whole
    # upstream plan (the orders⋈lineitem projection alone 5×). Eager
    # per-phase lineage cuts make each reference an in-memory scan;
    # all values are exact integers, unchanged by materialization.
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("l_suppkey").alias("s"), F.col("o_custkey").alias("c")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey")
    seeds = (
        supp.orderBy("s_suppkey")
        .limit(_BC_SOURCES)
        .select(F.col("s_suppkey").alias("src"))
    )
    # forward
    l1 = (
        edges.join(seeds, edges.s == seeds.src)
        .select("src", "c")
        .withColumn("sig1", F.lit(1).cast("long"))
        .localCheckpoint(eager=True)
    )
    l2 = (
        l1.join(edges, "c")
        .where(F.col("s") != F.col("src"))
        .groupBy("src", "s")
        .agg(F.sum("sig1").cast("long").alias("sig2"))
        .localCheckpoint(eager=True)
    )
    l3 = (
        l2.join(edges, "s")
        .join(
            l1.select("src", F.col("c").alias("c")).withColumn(
                "_seen", F.lit(1)
            ),
            ["src", "c"],
            "left",
        )
        .where(F.col("_seen").isNull())
        .groupBy("src", "c")
        .agg(F.sum("sig2").cast("long").alias("sig3"))
    )
    # backward: delta3 = 0
    d2_terms = (
        l2.join(edges, "s")
        .join(l3.select("src", "c", "sig3"), ["src", "c"])
        .select(
            "src",
            "s",
            F.floor(
                F.col("sig2") * F.lit(1000000) / F.col("sig3") + F.lit(0.5)
            )
            .cast("long")
            .alias("term"),
        )
        .groupBy("src", "s")
        .agg(F.sum("term").cast("long").alias("d2"))
    )
    d2 = (
        l2.join(d2_terms, ["src", "s"], "left")
        .select(
            "src",
            "s",
            "sig2",
            F.coalesce(F.col("d2"), F.lit(0)).cast("long").alias("d2"),
        )
        .localCheckpoint(eager=True)  # referenced by d1 and bc
    )
    d1 = (
        l1.join(edges, "c")
        .join(d2.select("src", "s", "sig2", "d2"), ["src", "s"])
        .select(
            "src",
            "c",
            F.floor(
                F.col("sig1")
                * (F.lit(1000000) + F.col("d2"))
                / F.col("sig2")
                + F.lit(0.5)
            )
            .cast("long")
            .alias("term"),
        )
        .groupBy("src", "c")
        .agg(F.sum("term").cast("long").alias("d1"))
    )
    bc = (
        d1.select(
            F.lit("customer").alias("node_type"),
            F.col("c").alias("node_id"),
            F.col("d1").alias("delta_e6"),
        )
        .unionByName(
            d2.where(F.col("d2") > 0).select(
                F.lit("supplier").alias("node_type"),
                F.col("s").alias("node_id"),
                F.col("d2").alias("delta_e6"),
            )
        )
        .groupBy("node_type", "node_id")
        .agg(F.sum("delta_e6").cast("long").alias("bc_e6"))
    )
    return (
        bc.orderBy(
            F.col("bc_e6").desc(),
            F.col("node_type").asc(),
            F.col("node_id").asc(),
        )
        .limit(_BC_TOP)
        .select("node_type", F.col("node_id").cast("long").alias("node_id"), "bc_e6")
    )


_BC_ORACLE = f"""
  WITH edges AS (
    SELECT DISTINCT l_suppkey AS s, o_custkey AS c
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  ), seeds AS (
    SELECT s_suppkey AS src FROM supplier
    ORDER BY s_suppkey LIMIT {_BC_SOURCES}
  ), l1 AS (
    SELECT src, c, CAST(1 AS BIGINT) AS sig1
    FROM edges JOIN seeds ON edges.s = seeds.src
  ), l2 AS (
    SELECT l1.src, e.s, CAST(sum(sig1) AS BIGINT) AS sig2
    FROM l1 JOIN edges e USING (c)
    WHERE e.s != l1.src
    GROUP BY 1, 2
  ), l3 AS (
    SELECT l2.src, e.c, CAST(sum(sig2) AS BIGINT) AS sig3
    FROM l2 JOIN edges e USING (s)
    LEFT JOIN l1 seen ON seen.src = l2.src AND seen.c = e.c
    WHERE seen.c IS NULL
    GROUP BY 1, 2
  ), d2_terms AS (
    SELECT l2.src, l2.s,
           CAST(sum(CAST(floor(sig2 * 1000000 / sig3 + 0.5) AS BIGINT))
                AS BIGINT) AS d2
    FROM l2 JOIN edges e USING (s)
    JOIN l3 ON l3.src = l2.src AND l3.c = e.c
    GROUP BY 1, 2
  ), d2 AS (
    SELECT l2.src, l2.s, l2.sig2,
           CAST(coalesce(d2_terms.d2, 0) AS BIGINT) AS d2
    FROM l2 LEFT JOIN d2_terms ON d2_terms.src = l2.src
                              AND d2_terms.s = l2.s
  ), d1 AS (
    SELECT l1.src, l1.c,
           CAST(sum(CAST(floor(sig1 * (1000000 + d2.d2) / d2.sig2 + 0.5)
                         AS BIGINT)) AS BIGINT) AS d1
    FROM l1 JOIN edges e USING (c)
    JOIN d2 ON d2.src = l1.src AND d2.s = e.s
    GROUP BY 1, 2
  ), bc AS (
    SELECT node_type, node_id, CAST(sum(delta_e6) AS BIGINT) AS bc_e6
    FROM (
      SELECT 'customer' AS node_type, c AS node_id, d1 AS delta_e6 FROM d1
      UNION ALL
      SELECT 'supplier', s, d2 FROM d2 WHERE d2 > 0
    ) GROUP BY 1, 2
  )
  SELECT node_type, CAST(node_id AS BIGINT) AS node_id, bc_e6
  FROM bc ORDER BY bc_e6 DESC, node_type ASC, node_id ASC
  LIMIT {_BC_TOP}
"""


# ---------------------------------------------------------------------------
# 2. dHash near-dup on synthesized images
# ---------------------------------------------------------------------------

_DH_ROWS = 8
_DH_COLS = 8  # 8x8 grid -> 8x7 = 56 dHash bits
_DH_BITS = _DH_ROWS * (_DH_COLS - 1)
_DH_BANDS = 4
_DH_BAND_BITS = _DH_BITS // _DH_BANDS  # 14
_DH_MAX_HAMMING = 6
_DH_BASE_DIV = 8
_DH_NOISE_MOD = 17
_DH_NOISE_DELTA = 40


def multimodal_dhash_neardup_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Perceptual near-dup detection on SYNTHESIZED images — the
    driver-checkable twin of operators/multimodal.py's dHash (whose
    real decode seam is fixture-gated): every doc renders a
    deterministic 8x8 grayscale grid from md5 bytes of a BASE image
    id (doc_id DIV 8 — re-encode families) plus per-doc sparse noise
    (one pixel in ~17 shifted by +40), the 56-bit difference hash is
    computed in pure integer arithmetic, candidates come from 4
    x 14-bit LSH bands (the banded-Hamming device), and pairs within
    Hamming 6 are emitted with an exact bit_count(xor) distance.

    Scale shape: map-only synthesis + hashing; the pair join is a
    band-bucket equi-join (union of 4 bands, distinct pairs), never
    all-pairs; Hamming is a single xor+popcount per candidate.
    """
    from spotify_data_pipeline_spark.operators.parallelism import (
        ensure_min_parallelism,
    )

    # r13 (guide §2.5): same compute-dense single-task synthesis shape
    # as multimodal_phash_dct — the interleaved A/B there (see
    # OPTIMIZATION_r13.md §9) settled that the fan-out belongs on
    # these md5-grid stages; one-file scans otherwise serialize the
    # whole grid+hash computation on one core.
    docs = ensure_min_parallelism(
        load_table(spark, sf_dir, "documents").select("doc_id")
    )
    base = F.expr(f"doc_id DIV {_DH_BASE_DIV}")
    px = []
    for r in range(_DH_ROWS):
        for c in range(_DH_COLS):
            base_val = _md5_mod(
                F.concat(F.lit(f"px:{r}:{c}:"), base), 256
            )
            noise = F.when(
                _md5_mod(F.concat(F.lit(f"nz:{r}:{c}:"), F.col("doc_id")),
                         _DH_NOISE_MOD)
                == 0,
                F.lit(_DH_NOISE_DELTA),
            ).otherwise(F.lit(0))
            px.append((base_val + noise).alias(f"g_{r}_{c}"))
    grid = docs.select("doc_id", *px)
    h = F.lit(0).cast("long")
    bit = 0
    for r in range(_DH_ROWS):
        for c in range(_DH_COLS - 1):
            h = h + F.when(
                F.col(f"g_{r}_{c}") > F.col(f"g_{r}_{c + 1}"),
                F.lit(1 << bit).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
            bit += 1
    hashed = grid.select("doc_id", h.alias("h"))
    bands = hashed.select(
        "doc_id",
        "h",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bnd).alias("band"),
                        F.expr(
                            f"(h DIV {1 << (bnd * _DH_BAND_BITS)})"
                            f" % {1 << _DH_BAND_BITS}"
                        ).alias("key"),
                    )
                    for bnd in range(_DH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "h", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = bands.select(
        F.col("doc_id").alias("id_a"), F.col("h").alias("ha"), "band", "key"
    )
    b = bands.select(
        F.col("doc_id").alias("id_b"), F.col("h").alias("hb"), "band", "key"
    )
    pairs = (
        a.join(b, ["band", "key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ha", "hb")
        .distinct()
        .withColumn(
            "hamming", F.bit_count(F.expr("ha ^ hb")).cast("long")
        )
        .where(F.col("hamming") <= _DH_MAX_HAMMING)
    )
    return pairs.select(
        "id_a",
        "id_b",
        "hamming",
        (
            F.expr(f"id_a DIV {_DH_BASE_DIV}")
            == F.expr(f"id_b DIV {_DH_BASE_DIV}")
        ).alias("same_base"),
    ).orderBy("id_a", "id_b")


def _dh_oracle() -> str:
    px_cols = []
    for r in range(_DH_ROWS):
        for c in range(_DH_COLS):
            base_val = _md5_mod_sql(
                f"'px:{r}:{c}:' || (doc_id // {_DH_BASE_DIV})", 256
            )
            noise_hash = _md5_mod_sql(
                f"'nz:{r}:{c}:' || doc_id", _DH_NOISE_MOD
            )
            px_cols.append(
                f"{base_val} + CASE WHEN {noise_hash} = 0"
                f" THEN {_DH_NOISE_DELTA} ELSE 0 END AS g_{r}_{c}"
            )
    grid_select = ",\n           ".join(px_cols)
    hash_terms = []
    bit = 0
    for r in range(_DH_ROWS):
        for c in range(_DH_COLS - 1):
            hash_terms.append(
                f"CASE WHEN g_{r}_{c} > g_{r}_{c + 1}"
                f" THEN CAST({1 << bit} AS BIGINT) ELSE 0 END"
            )
            bit += 1
    hash_expr = "\n         + ".join(hash_terms)
    band_rows = ", ".join(
        f"(CAST({bnd} AS BIGINT))" for bnd in range(_DH_BANDS)
    )
    return f"""
  WITH grid AS (
    SELECT doc_id,
           {grid_select}
    FROM documents
  ), hashed AS (
    SELECT doc_id,
           CAST({hash_expr} AS BIGINT) AS h
    FROM grid
  ), bands AS (
    SELECT doc_id, h, band,
           (h // (CAST(1 AS BIGINT) << CAST(band * {_DH_BAND_BITS} AS INT)))
             % {1 << _DH_BAND_BITS} AS key
    FROM hashed, (VALUES {band_rows}) AS t(band)
  ), pairs AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           a.h AS ha, b.h AS hb
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
  )
  SELECT id_a, id_b,
         CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming,
         (id_a // {_DH_BASE_DIV}) = (id_b // {_DH_BASE_DIV}) AS same_base
  FROM pairs
  WHERE bit_count(xor(ha, hb)) <= {_DH_MAX_HAMMING}
  ORDER BY id_a, id_b
"""


# ---------------------------------------------------------------------------
# 3. Bloom-filter decontamination with FP accounting
# ---------------------------------------------------------------------------

_BLOOM_M = 16384
_BLOOM_K = 3
_BLOOM_EVAL_MOD = 29


def llm_decontam_bloom_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale path of the exact 8-gram decontamination screen:
    eval docs (doc_id % 29 == 0) publish a Bloom bitmap (m=16384,
    k=3 md5 bit positions per distinct 8-gram); the training corpus
    probes it with three bit-position semi-joins (a gram is flagged
    iff ALL its positions are set). The exact shingle join runs
    alongside and the one-row report prices the sketch: flagged vs
    truly-contaminated gram counts, false positives, fp ppm, and the
    doc-level blast radius (docs flagged vs docs truly contaminated).

    Scale shape: the bitmap is a bounded table (<= m rows) that
    broadcast-joins against the corpus probe stream three times; the
    exact twin is a shingle-keyed equi-join. At 100 TB the bitmap
    ships to every executor in KB while the exact join shuffles the
    full corpus — the trade this query quantifies.

    r12 optimization (guide §2.4 remove shuffles / §1.2 algorithm
    first): the original formulation computed flagged / exact / corpus
    stats as THREE separate aggregate subtrees crossJoined into the
    report, each re-deriving the doc→8-gram→global-distinct pipeline
    from the scan (21 Exchanges, 10 Generates, 7 scans in the
    before-plan — plans/r12/llm_decontam_bloom_before.txt). Three
    rewrites, result pinned byte-identical to the unchanged oracle at
    sf0.001/sf0.01:

    - the global ``distinct()`` on (doc_id, g) is semantically a
      PER-DOCUMENT distinct (grams are doc-local), so the corpus gram
      stream is now ``explode(array_distinct(shingles(...)))`` — a
      map-only pass, the full-corpus dedup Exchange is gone outright;
    - eval grams derive from the 1/29 eval-doc subset directly (the
      filter reaches the scan) instead of filtering the corpus-wide
      relation — the bits table and the exact-membership side never
      touch non-eval documents;
    - the three bit-position probes are nullable-marker broadcast LEFT
      joins (bits is distinct, so no fan-out) and exact membership is a
      fourth marker join, so ALL seven report columns come from one
      doc-keyed pre-aggregate + one 1-row aggregate — one corpus pass,
      and the two corpus-wide count-distinct Expands are gone (a 100 TB
      win on its own).
    """
    from spotify_data_pipeline_spark.operators.parallelism import (
        ensure_min_parallelism,
    )

    docs = ensure_min_parallelism(
        load_table(spark, sf_dir, "documents").where(is_nonblank(F.col("text")))
    )
    is_eval = F.col("doc_id") % _BLOOM_EVAL_MOD == 0
    doc_grams = F.explode(
        F.array_distinct(shingles(tokens(F.col("text")), 8))
    ).alias("g")
    eval_grams = (
        docs.where(is_eval).select(doc_grams).distinct()
    )
    bits = (
        eval_grams.select(
            F.explode(
                F.array(
                    *[
                        _md5_mod(
                            F.concat(F.lit(f"b{k}:"), F.col("g")), _BLOOM_M
                        )
                        for k in range(_BLOOM_K)
                    ]
                )
            ).alias("pos")
        )
        .distinct()
    )
    corpus = docs.where(~is_eval).select("doc_id", doc_grams)
    probed = corpus
    for k in range(_BLOOM_K):
        pk = _md5_mod(F.concat(F.lit(f"b{k}:"), F.col("g")), _BLOOM_M)
        # bits is distinct on pos, so the LEFT join matches at most one
        # row: no fan-out, and a non-null marker == the old semi-join
        # hit. The broadcast side is aliased, not re-projected, so all
        # three broadcast subtrees stay canonically identical and AQE
        # builds the bitmap ONCE (ReusedExchange) instead of three times.
        b = bits.alias(f"_b{k}")
        probed = (
            probed.join(F.broadcast(b), pk == F.col(f"_b{k}.pos"), "left")
            .withColumn(f"_p{k}", F.col(f"_b{k}.pos"))
            .drop(F.col(f"_b{k}.pos"))
        )
    flagged = F.lit(True)
    for k in range(_BLOOM_K):
        flagged = flagged & F.col(f"_p{k}").isNotNull()
    marked = probed.join(
        eval_grams.select("g", F.lit(True).alias("_ex")), "g", "left"
    )
    per_doc = marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("_n"),
        F.count(F.when(flagged, 1)).alias("_nf"),
        F.count("_ex").alias("_ne"),
    )
    stats = per_doc.agg(
        F.sum("_n").cast("long").alias("corpus_grams"),
        F.sum("_nf").cast("long").alias("flagged_grams"),
        F.sum("_ne").cast("long").alias("exact_grams"),
        F.count(F.when(F.col("_nf") > 0, 1)).cast("long").alias("flagged_docs"),
        F.count(F.when(F.col("_ne") > 0, 1)).cast("long").alias("exact_docs"),
    )
    return stats.select(
        "corpus_grams",
        "flagged_grams",
        "exact_grams",
        (F.col("flagged_grams") - F.col("exact_grams"))
        .cast("long")
        .alias("false_positive_grams"),
        F.expr(
            "((flagged_grams - exact_grams) * 1000000)"
            " DIV corpus_grams"
        )
        .cast("long")
        .alias("fp_ppm"),
        "flagged_docs",
        "exact_docs",
    )


def _bloom_oracle() -> str:
    pos_exprs = [
        _md5_mod_sql(f"'b{k}:' || g", _BLOOM_M) for k in range(_BLOOM_K)
    ]
    bit_union = " UNION ".join(
        f"SELECT {p} AS pos FROM eval_grams" for p in pos_exprs
    )
    probe_conds = " AND ".join(
        f"{p} IN (SELECT pos FROM bits)" for p in pos_exprs
    )
    return f"""
  WITH sh AS (
    SELECT DISTINCT doc_id, doc_id % {_BLOOM_EVAL_MOD} = 0 AS is_eval,
           unnest(CASE WHEN len(toks) >= 8
             THEN list_transform(range(1, len(toks) - 6),
                                 i -> array_to_string(toks[i:i+7], ' '))
             ELSE [array_to_string(toks, ' ')] END) AS g
    FROM (
      SELECT doc_id, {_TOKENS_SQL} AS toks
      FROM documents WHERE length(trim(text)) > 0
    )
  ), eval_grams AS (
    SELECT DISTINCT g FROM sh WHERE is_eval
  ), bits AS (
    {bit_union}
  ), corpus AS (
    SELECT doc_id, g FROM sh WHERE NOT is_eval
  ), flagged AS (
    SELECT doc_id, g FROM corpus WHERE {probe_conds}
  ), exact AS (
    SELECT doc_id, g FROM corpus WHERE g IN (SELECT g FROM eval_grams)
  )
  SELECT
    (SELECT CAST(count(*) AS BIGINT) FROM corpus) AS corpus_grams,
    (SELECT CAST(count(*) AS BIGINT) FROM flagged) AS flagged_grams,
    (SELECT CAST(count(*) AS BIGINT) FROM exact) AS exact_grams,
    (SELECT CAST(count(*) AS BIGINT) FROM flagged)
      - (SELECT CAST(count(*) AS BIGINT) FROM exact)
      AS false_positive_grams,
    CAST(((SELECT count(*) FROM flagged) - (SELECT count(*) FROM exact))
         * 1000000 // (SELECT count(*) FROM corpus) AS BIGINT) AS fp_ppm,
    (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) FROM flagged)
      AS flagged_docs,
    (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) FROM exact)
      AS exact_docs
"""


PENDING: tuple[PendingQuery, ...] = (
    PendingQuery(
        "graph_betweenness_brandes",
        graph_betweenness_brandes_query,
        _BC_ORACLE,
        tags=("graph", "betweenness", "brandes", "micro-nats",
              "integer-exact"),
    ),
    PendingQuery(
        "multimodal_dhash_neardup",
        multimodal_dhash_neardup_query,
        _dh_oracle(),
        tags=("multimodal", "dhash", "banded-hamming", "md5",
              "integer-exact"),
    ),
    PendingQuery(
        "llm_decontam_bloom",
        llm_decontam_bloom_query,
        _bloom_oracle(),
        tags=("llmops", "bloom", "decontamination", "fp-accounting",
              "md5", "integer-exact"),
    ),
)
