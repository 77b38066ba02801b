"""Round-6 window block 1: the roundsix staging tail + the exact-oracle
Count-Min twin (VERDICT r05 items 1 and 3).

Why this module exists (the deps-pin blast radius): activating the 3
queries still staged in ``plans/roundsix.py`` by editing that module's
activation block would change ``roundsix.py`` itself — and every
evidenced query's ``deps_sha256`` pin hashes its DEFINING module plus
the full import closure (tools/snapshot_evidence.py), so that one edit
would invalidate the driver evidence of all 32 roundsix queries proved
in round 5 and burn 32 of the 50 evidence-window slots on re-proofs.
Instead, this module declares the 3 staged queries through thin
delegating wrappers: the wrapper fn is DEFINED here, so its pin hashes
this module (+ roundsix + its closure) and ``roundsix.py`` stays
byte-identical. The oracles are reused verbatim from the staged
``PendingQuery`` entries — semantics are exactly what was hash-matched
at 3 SFs in round 5.

Block 2 of the round-6 window is ``plans/active.py`` (the activation
manifest for roundseven/roundeight staging).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.io import load_table
from spotify_data_pipeline_spark.plans import roundsix as _r6
from spotify_data_pipeline_spark.plans.registry import declare

_STAGED = {pq.name: pq for pq in _r6.STAGED}


def agg_kmv_distinct_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV k-minimum-values distinct estimate (operators/kmv.py) —
    delegates to the staged implementation in plans/roundsix.py (see
    module docstring for why activation happens here). md5-prefix
    selection makes the APPROXIMATION itself driver-provable: the
    (k-1)/h_k estimator arithmetic is what the oracle hash-checks."""
    return _r6.agg_kmv_distinct_query(spark, sf_dir)


def llm_winsorize_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source [P1, P99] winsorization report — delegates to the
    staged implementation in plans/roundsix.py (module docstring).
    DISCRETE percentiles keep clip bounds integer so the winsorized
    mean is order-independent."""
    return _r6.llm_winsorize_stats_query(spark, sf_dir)


def agg_kmv_overlap_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source Jaccard straight from merged KMV sketches —
    delegates to the staged implementation in plans/roundsix.py
    (module docstring). The corpus is scanned once; the sketch-vs-
    sketch pair join is bounded at |sources|² rows of k-int states."""
    return _r6.agg_kmv_overlap_query(spark, sf_dir)


declare(
    "agg_kmv_distinct",
    oracle=_STAGED["agg_kmv_distinct"].oracle,
    tags=_STAGED["agg_kmv_distinct"].tags,
)(agg_kmv_distinct_query)
declare(
    "llm_winsorize_stats",
    oracle=_STAGED["llm_winsorize_stats"].oracle,
    tags=_STAGED["llm_winsorize_stats"].tags,
)(llm_winsorize_stats_query)
declare(
    "agg_kmv_overlap",
    oracle=_STAGED["agg_kmv_overlap"].oracle,
    tags=_STAGED["agg_kmv_overlap"].tags,
)(agg_kmv_overlap_query)


# --- The exact-oracle Count-Min twin (VERDICT r05 item 3) -----------------
#
# ``text_heavy_hitters_cms`` (plans/roundfive.py, rows-only) proves the
# MG→CMS composition runs, but its xxhash64 buckets have no DuckDB
# form, so the ESTIMATOR arithmetic was only pytest-pinned. This twin
# applies the agg_kmv_distinct / dedup_minhash_estimate precedent: md5
# bucketing (engine-identical lowercase hex on both sides) makes the
# whole estimate replicable in SQL, so the driver hash-checks the CMS
# point-estimate rule itself — bucket per hash row, min over rows.
#
# Width is deliberately SMALL (16 buckets = 1 hex digit) against the
# 31-token corpus vocabulary (measured at every SF), so collisions are
# guaranteed by pigeonhole and the two load-bearing behaviors both
# bite in the checked result: per-row OVER-counting (est_row > true)
# and the depth-wise min TIGHTENING (est = min over 3 rows < max row).
# A production-sized width would make est == cnt everywhere and prove
# nothing (the vacuousness lesson). xxhash64 + wide grids stay the
# production path in operators/countmin.py; this is the auditable twin.


def text_heavy_hitters_cms_md5_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source top-10 tokens bracketed by an md5-bucketed Count-Min
    estimate: exact count (cnt) next to the CMS estimate (est ≥ cnt,
    over-count only from collisions — Cormode & Muthukrishnan 2005).

    The sketch is held in SPARSE grid form — per (source, hash row,
    bucket) counter rows instead of the dense array
    ``operators/countmin.py`` pivots into; the dense pivot is pure
    densification, the counters are identical. The probe is the same
    rule: candidate token → its bucket under each of the 3 row hashes
    → min of the 3 counters.

    Scale shape: ONE corpus-scale shuffle (the (source, token) count —
    map-side combinable); everything after operates on the
    vocabulary-sized frame (31 tokens here; bounded by design at any
    scale because the grid is |sources| × depth × width counters and
    candidates are |sources| × k). Bucket arithmetic: first hex digit
    of md5('r{row}:' || token) — DuckDB parses it positionally
    (strpos) since it lacks conv(); Spark uses conv(); both engines
    see identical lowercase-hex md5.
    """
    from spotify_data_pipeline_spark.functions.text import tokens

    depth, width = 3, 16
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select("source", F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count("*").alias("cnt"))
    )
    # Sparse CMS grid: per (source, row, bucket) summed counters.
    grid = (
        counts.select(
            "source",
            "cnt",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).alias("r"),
                            F.expr(
                                f"CAST(conv(substring(md5(concat('r{r}:', tok)), 1, 1),"
                                f" 16, 10) AS INT) % {width}"
                            ).alias("b"),
                        )
                        for r in range(depth)
                    ]
                )
            ).alias("rb"),
        )
        .groupBy("source", F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
        .agg(F.sum("cnt").alias("c"))
    )
    # Candidates: exact top-10 per source (deterministic tiebreak on token).
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(F.col("cnt").desc(), F.col("tok"))
    cand = (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .select("source", "tok", "cnt", "rank")
    )
    # Probe: candidate's bucket per row, joined to the grid, min over rows.
    probes = cand.select(
        "source",
        "tok",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        F.expr(
                            f"CAST(conv(substring(md5(concat('r{r}:', tok)), 1, 1),"
                            f" 16, 10) AS INT) % {width}"
                        ).alias("b"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rb"),
    ).select("source", "tok", F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
    est = (
        probes.join(F.broadcast(grid), on=["source", "r", "b"])
        .groupBy("source", "tok")
        .agg(F.min("c").alias("est"))
    )
    return (
        cand.join(est, on=["source", "tok"])
        .select(
            "source",
            "tok",
            F.col("cnt").cast("long").alias("cnt"),
            F.col("est").cast("long").alias("est"),
            F.col("rank").cast("long").alias("rank"),
        )
        .orderBy("source", "rank")
    )


_CMS_MD5_ORACLE = r"""
    WITH tok AS (
      SELECT source, unnest(
        string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')
      ) AS tok
      FROM documents WHERE length(trim(text)) > 0
    ), counts AS (
      SELECT source, tok, count(*) AS cnt FROM tok GROUP BY 1, 2
    ), rb AS (
      SELECT r FROM (SELECT unnest([0, 1, 2]) AS r)
    ), grid AS (
      SELECT source, r,
             (strpos('0123456789abcdef',
                     substr(md5('r' || r || ':' || tok), 1, 1)) - 1) % 16 AS b,
             sum(cnt) AS c
      FROM counts CROSS JOIN rb
      GROUP BY 1, 2, 3
    ), cand AS (
      SELECT source, tok, cnt,
             row_number() OVER (PARTITION BY source
                                ORDER BY cnt DESC, tok ASC) AS rank
      FROM counts
      QUALIFY rank <= 10
    ), est AS (
      SELECT c2.source, c2.tok, min(g.c) AS est
      FROM (SELECT source, tok, r,
                   (strpos('0123456789abcdef',
                           substr(md5('r' || r || ':' || tok), 1, 1)) - 1) % 16 AS b
            FROM cand CROSS JOIN rb) c2
      JOIN grid g ON g.source = c2.source AND g.r = c2.r AND g.b = c2.b
      GROUP BY 1, 2
    )
    SELECT cand.source, cand.tok,
           CAST(cand.cnt AS BIGINT) AS cnt,
           CAST(est.est AS BIGINT) AS est,
           CAST(cand.rank AS BIGINT) AS rank
    FROM cand JOIN est ON est.source = cand.source AND est.tok = cand.tok
    ORDER BY cand.source, cand.rank
"""

declare(
    "text_heavy_hitters_cms_md5",
    oracle=_CMS_MD5_ORACLE,
    tags=("text", "sketch", "heavyhitters", "countmin", "exact-oracle-twin"),
)(text_heavy_hitters_cms_md5_query)
