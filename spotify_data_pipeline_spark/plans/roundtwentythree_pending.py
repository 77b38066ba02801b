"""Round-23 declared-query staging area — the NUMERIC-DEPTH wave:
iterative linear algebra and calibration/drift measures, each exact
cross-engine.

- **PCA power iteration**: the dominant principal direction of the
  embedding second-moment matrix via 3 UNROLLED power-iteration
  steps — the kmeans/pagerank/BPE unrolling precedent applied to
  linear algebra. Everything stays integer: embeddings quantized to
  e4, the 64x64 moment matrix is exact integer sums, each step's
  re-normalization is max-norm integer division (truncation toward
  zero — verified identical: Spark ``DIV`` and DuckDB ``//`` both
  truncate).
- **IVF nprobe sweep**: recall@5 vs nprobe (1/2/4/8) against the
  brute-force ranking — the tuning curve an ANN operator publishes
  before a corpus-wide rollout.
- **PSI value drift**: population-stability index of the event value
  distribution between the two halves of the month, per event type —
  the standard production drift alarm, with per-bucket micro-nat
  terms on a dense 10-bucket grid (the JSD dense-grid device).
- **Temperature-scaled mixing**: n_s^0.7 source sampling weights
  (the multilingual/GPT-3 mixing rule), stated as exp(0.7 ln n) on
  both engines and e6-floored per source.
- **Theil index**: the entropy-based inequality measure (the Gini
  row's information-theoretic twin) per order priority, per-order
  micro-nat terms.

Per-wave staging module (nothing evidenced imports this file).
Exactness rules as earlier waves: integer ppm via DIV/`//`, BIGINT
casts, cents, deterministic tiebreaks, micro-nat per-term floors,
4dp sequential-sum cosines. New device here: **signed integer
renormalization** — max-norm division with BOTH engines' truncating
integer division (negative loadings included), so an iterative
vector stays bit-identical without any float state crossing steps.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.functions.text import is_nonblank, tokens
from spotify_data_pipeline_spark.functions.vectors import cosine_similarity
from spotify_data_pipeline_spark.io import load_table
from spotify_data_pipeline_spark.plans.parity import rnd, rnd_cents


@dataclass(frozen=True)
class PendingQuery:
    name: str
    fn: object
    oracle: str | None
    headline: bool = False
    tags: tuple[str, ...] = ()


_TOKENS_SQL = "string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')"

# ---------------------------------------------------------------------------
# 1. PCA power iteration — unrolled, integer-exact
# ---------------------------------------------------------------------------

_PCA_DIM = 64
_PCA_Q = 10000  # e4 embedding quantization
_PCA_VSCALE = 100000  # e5 max-norm vector scale
_PCA_STEPS = 3


def sim_pca_power_iteration_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Three unrolled power-iteration steps toward the dominant
    principal direction (uncentered — the top singular direction of
    the raw embedding matrix) on the EXACT integer second-moment
    matrix. The step count is the CONTRACT, not a convergence claim:
    on this synthetic corpus the spectrum is nearly flat (top
    eigengap ~1.07, measured), so full convergence would take ~80
    steps — what the operator guarantees, and the tests pin, is the
    power-iteration invariant itself (the Rayleigh quotient rises
    monotonically and alignment with the true top eigenvector
    strictly improves every step).
    S[i][j] = sum_v q_v[i]*q_v[j] of e4-quantized embeddings.
    Each step: u = S v (integer matvec, |u| <= 64 * 7e10 * 1.2e5 —
    int64-safe), then max-norm renormalize v' = u DIV max(|u|)/1e5
    (truncating division, identical on both engines for signed
    values). Emits the final 64-component integer loading vector.

    Scale shape: one vec_id equi-join builds the moment matrix
    (dim^2 = 4096 grouped rows — bounded by dimensionality, not
    corpus size); each unrolled step is a 4096x64 equi-join + 64-row
    agg. The per-step 1-row max is the whitelisted broadcast. The
    moment matrix is lineage-cut with localCheckpoint (bounded dim^2
    rows), so the corpus is scanned once, not once per step.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    qarr = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * _PCA_Q + F.lit(0.5)).cast(
            "long"
        ),
    )
    flat = emb.select(
        "vec_id", F.posexplode(qarr).alias("i", "qi")
    )
    a = flat.select("vec_id", F.col("i"), F.col("qi"))
    b = flat.select(
        "vec_id", F.col("i").alias("j"), F.col("qi").alias("qj")
    )
    cov = (
        a.join(b, "vec_id")
        .groupBy("i", "j")
        .agg(F.sum(F.col("qi") * F.col("qj")).cast("long").alias("s"))
        # lineage cut (the PageRank/k-means device): the moment matrix
        # is bounded at dim^2 = 4096 rows and every unrolled step
        # references it — materialize once instead of recomputing the
        # corpus scan per step
        .localCheckpoint(eager=True)
    )
    v = spark.range(0, _PCA_DIM).select(
        F.col("id").alias("j"), F.lit(_PCA_VSCALE).cast("long").alias("v")
    )
    for _ in range(_PCA_STEPS):
        u = (
            cov.join(v, "j")
            .groupBy("i")
            .agg(F.sum(F.col("s") * F.col("v")).cast("long").alias("u"))
        )
        m = u.agg(
            F.greatest(
                F.lit(1).cast("long"),
                F.expr(f"max(abs(u)) DIV {_PCA_VSCALE}"),
            ).alias("d")
        )
        v = u.crossJoin(F.broadcast(m)).select(
            F.col("i").alias("j"),
            F.expr("u DIV d").cast("long").alias("v"),
        )
    return v.select(
        F.col("j").cast("long").alias("dim"),
        F.col("v").cast("long").alias("loading_e5"),
    ).orderBy("dim")


def _pca_oracle() -> str:
    steps = []
    prev = "v0"
    for k in range(1, _PCA_STEPS + 1):
        steps.append(
            f"""u{k} AS (
    SELECT cov.i, CAST(sum(s * v) AS BIGINT) AS u
    FROM cov JOIN {prev} ON cov.j = {prev}.j GROUP BY 1
  ), m{k} AS (
    SELECT greatest(CAST(1 AS BIGINT),
                    CAST(max(abs(u)) AS BIGINT) // {_PCA_VSCALE}) AS d
    FROM u{k}
  ), v{k} AS (
    SELECT i AS j, CAST(u // d AS BIGINT) AS v FROM u{k} CROSS JOIN m{k}
  )"""
        )
        prev = f"v{k}"
    chain = ", ".join(steps)
    return f"""
  WITH q AS (
    SELECT vec_id,
           list_transform(CAST(embedding AS DOUBLE[]),
                          x -> CAST(floor(x * {_PCA_Q} + 0.5) AS BIGINT)) AS q
    FROM embeddings
  ), flat AS (
    SELECT vec_id, r.i AS i, q[r.i + 1] AS qi
    FROM q, range(0, {_PCA_DIM}) r(i)
  ), cov AS (
    SELECT a.i AS i, b.i AS j, CAST(sum(a.qi * b.qi) AS BIGINT) AS s
    FROM flat a JOIN flat b USING (vec_id) GROUP BY 1, 2
  ), v0 AS (
    SELECT r.i AS j, CAST({_PCA_VSCALE} AS BIGINT) AS v
    FROM range(0, {_PCA_DIM}) r(i)
  ), {chain}
  SELECT CAST(j AS BIGINT) AS dim, v AS loading_e5
  FROM {prev} ORDER BY dim
"""


# ---------------------------------------------------------------------------
# 2. IVF nprobe sweep — recall@5 vs probe budget
# ---------------------------------------------------------------------------

_NPS_CENTROIDS = 8
_NPS_QUERIES = 10
_NPS_K = 5
_NPS_PROBES = (1, 2, 4, 8)


def sim_ivf_nprobe_sweep_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANN tuning curve: recall@5 of the fixed-quantizer IVF
    (centroids = vec_id < 8, the sim_ann_ivf_fixed device) against
    brute force, for nprobe in {{1, 2, 4, 8}}. At nprobe = 8 every
    cell is probed, so recall must be 1e6 ppm — the built-in sanity
    anchor. Probe order per query: centroid cosine DESC, cid ASC;
    candidate ranking: 4dp cosine DESC, neighbor ASC (both the
    established determinism devices).

    Scale shape: the quantizer and the 10-query set are the bounded
    broadcasts; candidate generation is a CELL equi-join (never
    all-pairs except the brute-force anchor itself, which is the
    point of the comparison); one 4-row summary agg.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", F.col("embedding").alias("e"))
    cents = v.where(F.col("vec_id") < _NPS_CENTROIDS).select(
        F.col("vec_id").alias("cid"), F.col("e").alias("ce")
    )
    # corpus cell assignment
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.col("cos_c").desc(), F.col("cid").asc()
    )
    cellmap = (
        v.crossJoin(F.broadcast(cents))
        .withColumn("cos_c", cosine_similarity(F.col("e"), F.col("ce")))
        .withColumn("rn", F.row_number().over(w_assign))
        .where(F.col("rn") == 1)
        .select("vec_id", F.col("cid").alias("cell"), "e")
    )
    q = v.where(F.col("vec_id") < _NPS_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    # probe ranking per query
    w_probe = Window.partitionBy("query_id").orderBy(
        F.col("cos_q").desc(), F.col("cid").asc()
    )
    probes = (
        F.broadcast(q)
        .crossJoin(cents)
        .withColumn("cos_q", cosine_similarity(F.col("qe"), F.col("ce")))
        .withColumn("prank", F.row_number().over(w_probe))
        .select("query_id", F.col("cid").alias("cell"), "prank", "qe")
    )
    # brute-force top-5 anchor
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("cos4").desc(), F.col("neighbor_id").asc()
    )
    brute = (
        F.broadcast(q)
        .crossJoin(v.select(F.col("vec_id").alias("neighbor_id"), "e"))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos4", rnd(cosine_similarity(F.col("qe"), F.col("e")), 4))
        .withColumn("rn", F.row_number().over(w_rank))
        .where(F.col("rn") <= _NPS_K)
        .select("query_id", "neighbor_id")
    )
    # IVF candidates via the cell equi-join, swept over nprobe
    cand = (
        cellmap.join(probes, "cell")
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos4", rnd(cosine_similarity(F.col("qe"), F.col("e")), 4))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "prank",
            "cos4",
        )
    )
    swept = cand.select(
        "*",
        F.explode(
            F.array(*[F.lit(p).cast("long") for p in _NPS_PROBES])
        ).alias("nprobe"),
    ).where(F.col("prank") <= F.col("nprobe"))
    w_ivf = Window.partitionBy("query_id", "nprobe").orderBy(
        F.col("cos4").desc(), F.col("neighbor_id").asc()
    )
    ivf_top = (
        swept.withColumn("rn", F.row_number().over(w_ivf))
        .where(F.col("rn") <= _NPS_K)
        .select("nprobe", "query_id", "neighbor_id")
    )
    hits = ivf_top.join(brute, ["query_id", "neighbor_id"]).groupBy(
        "nprobe"
    ).agg(F.count(F.lit(1)).cast("long").alias("overlap_total"))
    denom = _NPS_QUERIES * _NPS_K
    return (
        hits.select(
            "nprobe",
            F.lit(_NPS_QUERIES).cast("long").alias("n_queries"),
            "overlap_total",
            F.expr(f"(overlap_total * 1000000) DIV {denom}")
            .cast("long")
            .alias("recall_ppm"),
        )
        .orderBy("nprobe")
    )


_NPS_PROBES_SQL = ", ".join(f"({p})" for p in _NPS_PROBES)

_NPS_ORACLE = f"""
  WITH v AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
  ), c AS (
    SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < {_NPS_CENTROIDS}
  ), cellmap AS (
    SELECT vec_id, cid AS cell, e FROM (
      SELECT v.vec_id, c.cid, v.e,
             row_number() OVER (PARTITION BY v.vec_id ORDER BY
               list_dot_product(v.e, c.ce)
                 / (sqrt(list_dot_product(v.e, v.e))
                    * sqrt(list_dot_product(c.ce, c.ce))) DESC, c.cid) AS rn
      FROM v CROSS JOIN c) WHERE rn = 1
  ), q AS (
    SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < {_NPS_QUERIES}
  ), probes AS (
    SELECT query_id, cid AS cell, qe,
           row_number() OVER (PARTITION BY query_id ORDER BY
             list_dot_product(qe, ce)
               / (sqrt(list_dot_product(qe, qe))
                  * sqrt(list_dot_product(ce, ce))) DESC, cid) AS prank
    FROM q CROSS JOIN c
  ), brute AS (
    SELECT query_id, neighbor_id FROM (
      SELECT q.query_id, v.vec_id AS neighbor_id,
             row_number() OVER (PARTITION BY q.query_id ORDER BY
               floor(list_dot_product(q.qe, v.e)
                 / (sqrt(list_dot_product(q.qe, q.qe))
                    * sqrt(list_dot_product(v.e, v.e)))
                 * 10000 + 0.5) / 10000 DESC, v.vec_id) AS rn
      FROM q CROSS JOIN v WHERE q.query_id != v.vec_id
    ) WHERE rn <= {_NPS_K}
  ), cand AS (
    SELECT p.query_id, m.vec_id AS neighbor_id, p.prank,
           floor(list_dot_product(p.qe, m.e)
             / (sqrt(list_dot_product(p.qe, p.qe))
                * sqrt(list_dot_product(m.e, m.e)))
             * 10000 + 0.5) / 10000 AS cos4
    FROM cellmap m JOIN probes p USING (cell)
    WHERE m.vec_id != p.query_id
  ), np(nprobe) AS (VALUES {_NPS_PROBES_SQL}),
  ivf_top AS (
    SELECT nprobe, query_id, neighbor_id FROM (
      SELECT np.nprobe, cand.query_id, cand.neighbor_id,
             row_number() OVER (PARTITION BY np.nprobe, cand.query_id
               ORDER BY cand.cos4 DESC, cand.neighbor_id) AS rn
      FROM cand JOIN np ON cand.prank <= np.nprobe
    ) WHERE rn <= {_NPS_K}
  )
  SELECT CAST(nprobe AS BIGINT) AS nprobe,
         CAST({_NPS_QUERIES} AS BIGINT) AS n_queries,
         CAST(count(*) AS BIGINT) AS overlap_total,
         CAST((count(*) * 1000000) // {_NPS_QUERIES * _NPS_K} AS BIGINT)
           AS recall_ppm
  FROM ivf_top JOIN brute USING (query_id, neighbor_id)
  GROUP BY nprobe ORDER BY nprobe
"""


# ---------------------------------------------------------------------------
# 3. PSI value drift — dense-grid population stability index
# ---------------------------------------------------------------------------

_PSI_SPLIT = "2024-01-16 00:00:00"
_PSI_BUCKETS = 10
_PSI_WIDTH_CENTS = 5000  # 50.00 per bucket


def dq_psi_value_drift_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the event `value` distribution
    between the first and second half of the month, per event type —
    the standard model-ops drift alarm (PSI > 0.2 = act). Values are
    bucketed on a fixed 50.00-wide 10-bucket grid via integer cents;
    per-bucket terms (pa-pb)*ln(pa/pb) with add-one smoothing are
    computed over the DENSE type x bucket grid (the JSD device — an
    empty bucket still contributes its smoothed term) and floored to
    micro-nats before the integer sum.

    Scale shape: map-only bucketing, one (type, bucket, period) agg
    over bounded state (types x 10 x 2), dense-grid expansion by
    explode (no nested loop), one type-keyed sum.
    """
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    bucketed = ev.select(
        "event_type",
        (F.col("ts") < F.lit(_PSI_SPLIT).cast("timestamp")).alias("in_a"),
        F.least(
            F.lit(_PSI_BUCKETS - 1).cast("long"),
            F.expr(
                f"CAST(floor(value * 100 + 0.5) AS BIGINT)"
                f" DIV {_PSI_WIDTH_CENTS}"
            ),
        ).alias("bucket"),
    ).drop("_c")
    counts = bucketed.groupBy("event_type", "bucket").agg(
        F.sum(F.when(F.col("in_a"), 1).otherwise(0)).cast("long").alias("c_a"),
        F.sum(F.when(~F.col("in_a"), 1).otherwise(0)).cast("long").alias("c_b"),
    )
    grid = (
        bucketed.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.lit(_PSI_BUCKETS - 1).cast("long"),
                )
            ).alias("bucket"),
        )
    )
    dense = grid.join(counts, ["event_type", "bucket"], "left").select(
        "event_type",
        "bucket",
        F.coalesce(F.col("c_a"), F.lit(0)).cast("long").alias("c_a"),
        F.coalesce(F.col("c_b"), F.lit(0)).cast("long").alias("c_b"),
    )
    totals = bucketed.groupBy("event_type").agg(
        F.sum(F.when(F.col("in_a"), 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(~F.col("in_a"), 1).otherwise(0)).cast("long").alias("n_b"),
    )
    terms = dense.join(totals, "event_type").select(
        "event_type",
        "n_a",
        "n_b",
        F.floor(
            (
                (F.col("c_a") + 1) / (F.col("n_a") + _PSI_BUCKETS)
                - (F.col("c_b") + 1) / (F.col("n_b") + _PSI_BUCKETS)
            )
            * F.log(
                ((F.col("c_a") + 1) / (F.col("n_a") + _PSI_BUCKETS))
                / ((F.col("c_b") + 1) / (F.col("n_b") + _PSI_BUCKETS))
            )
            * 1000000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("term_e6"),
    )
    return (
        terms.groupBy("event_type", "n_a", "n_b")
        .agg(F.sum("term_e6").cast("long").alias("psi_e6"))
        .select("event_type", "n_a", "n_b", "psi_e6")
        .orderBy("event_type")
    )


_PSI_ORACLE = f"""
  WITH bucketed AS (
    SELECT event_type,
           ts < TIMESTAMP '{_PSI_SPLIT}' AS in_a,
           least({_PSI_BUCKETS - 1},
                 CAST(floor(value * 100 + 0.5) AS BIGINT)
                   // {_PSI_WIDTH_CENTS}) AS bucket
    FROM events
  ), counts AS (
    SELECT event_type, bucket,
           CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
           CAST(sum(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS c_b
    FROM bucketed GROUP BY 1, 2
  ), grid AS (
    SELECT event_type, CAST(r.b AS BIGINT) AS bucket
    FROM (SELECT DISTINCT event_type FROM bucketed),
         range(0, {_PSI_BUCKETS}) r(b)
  ), dense AS (
    SELECT g.event_type, g.bucket,
           coalesce(c.c_a, 0) AS c_a, coalesce(c.c_b, 0) AS c_b
    FROM grid g LEFT JOIN counts c
      ON c.event_type = g.event_type AND c.bucket = g.bucket
  ), totals AS (
    SELECT event_type,
           CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           CAST(sum(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b
    FROM bucketed GROUP BY 1
  ), terms AS (
    SELECT d.event_type, t.n_a, t.n_b,
           CAST(floor(
             ((c_a + 1) / (n_a + {_PSI_BUCKETS})
              - (c_b + 1) / (n_b + {_PSI_BUCKETS}))
             * ln(((c_a + 1) / (n_a + {_PSI_BUCKETS}))
                  / ((c_b + 1) / (n_b + {_PSI_BUCKETS})))
             * 1000000 + 0.5) AS BIGINT) AS term_e6
    FROM dense d JOIN totals t USING (event_type)
  )
  SELECT event_type, n_a, n_b,
         CAST(sum(term_e6) AS BIGINT) AS psi_e6
  FROM terms GROUP BY 1, 2, 3 ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# 4. Temperature-scaled source mixing
# ---------------------------------------------------------------------------

_MIX_ALPHA = 0.7


def llm_mix_temperature_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled sampling weights w_s ∝ n_s^0.7 over source
    token counts — the multilingual up-sampling rule (XLM-R / GPT-3
    mixing): small sources gain share, big sources lose it. The power
    is stated as exp(0.7 * ln(n)) IDENTICALLY on both engines and
    e6-floored per source before the integer share division, so the
    shares are exact integers. Emits raw vs temperature share and the
    signed shift in ppm.

    Scale shape: token explode -> source agg (bounded by source
    count) -> 1-row weight-total broadcast -> map-only shares.
    """
    docs = load_table(spark, sf_dir, "documents").where(
        is_nonblank(F.col("text"))
    )
    per_source = (
        docs.select("source", F.size(tokens(F.col("text"))).alias("n"))
        .groupBy("source")
        .agg(F.sum("n").cast("long").alias("n_tok"))
        .withColumn(
            "w_e6",
            F.floor(
                F.exp(F.log(F.col("n_tok")) * _MIX_ALPHA) * 1000000
                + F.lit(0.5)
            ).cast("long"),
        )
    )
    totals = per_source.agg(
        F.sum("n_tok").cast("long").alias("tot_tok"),
        F.sum("w_e6").cast("long").alias("tot_w"),
    )
    return (
        per_source.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "n_tok",
            F.expr("(n_tok * 1000000) DIV tot_tok")
            .cast("long")
            .alias("raw_ppm"),
            F.expr("(w_e6 * 1000000) DIV tot_w")
            .cast("long")
            .alias("temp_ppm"),
            F.expr(
                "(w_e6 * 1000000) DIV tot_w - (n_tok * 1000000) DIV tot_tok"
            )
            .cast("long")
            .alias("shift_ppm"),
        )
        .orderBy("source")
    )


_MIX_ORACLE = f"""
  WITH per_source AS (
    SELECT source, CAST(sum(len({_TOKENS_SQL})) AS BIGINT) AS n_tok
    FROM documents WHERE length(trim(text)) > 0 GROUP BY 1
  ), weighted AS (
    SELECT source, n_tok,
           CAST(floor(exp(ln(n_tok) * {_MIX_ALPHA}) * 1000000 + 0.5)
                AS BIGINT) AS w_e6
    FROM per_source
  ), totals AS (
    SELECT CAST(sum(n_tok) AS BIGINT) AS tot_tok,
           CAST(sum(w_e6) AS BIGINT) AS tot_w
    FROM weighted
  )
  SELECT source, n_tok,
         CAST((n_tok * 1000000) // tot_tok AS BIGINT) AS raw_ppm,
         CAST((w_e6 * 1000000) // tot_w AS BIGINT) AS temp_ppm,
         CAST((w_e6 * 1000000) // tot_w
              - (n_tok * 1000000) // tot_tok AS BIGINT) AS shift_ppm
  FROM weighted CROSS JOIN totals ORDER BY source
"""


# ---------------------------------------------------------------------------
# 5. Theil index — entropy-based inequality per order priority
# ---------------------------------------------------------------------------


def agg_theil_index_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T index of order revenue inequality within each order
    priority — the information-theoretic twin of the Gini row
    (agg_revenue_gini): T = (1/n) sum (x/mu) ln(x/mu), zero when all
    orders are equal, ln(n) at maximal concentration. Per-order terms
    use the exact x/mu = cents*n/sum_cents BIGINT-ratio double and
    are floored to micro-nats before the integer sum; the group mean
    never leaves integer space.

    Scale shape: one group agg for (n, sum), one equi-join back on
    the group key (broadcastable — priorities are a bounded dim),
    one per-group integer sum.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", rnd_cents(F.col("o_totalprice")).alias("cents")
    )
    stats = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("sum_cents"),
    )
    terms = orders.join(stats, "o_orderpriority").select(
        "o_orderpriority",
        "n",
        F.floor(
            (F.col("cents") * F.col("n") / F.col("sum_cents"))
            * F.log(F.col("cents") * F.col("n") / F.col("sum_cents"))
            * 1000000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("t_e6"),
    )
    return (
        terms.groupBy("o_orderpriority", "n")
        .agg(F.expr("sum(t_e6) DIV n").cast("long").alias("theil_e6"))
        .select(
            "o_orderpriority",
            F.col("n").alias("n_orders"),
            "theil_e6",
        )
        .orderBy("o_orderpriority")
    )


_THEIL_ORACLE = """
  WITH orders_c AS (
    SELECT o_orderpriority,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
    FROM orders
  ), stats AS (
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(cents) AS BIGINT) AS sum_cents
    FROM orders_c GROUP BY 1
  ), terms AS (
    SELECT o.o_orderpriority, s.n,
           CAST(floor(
             (cents * n / sum_cents) * ln(cents * n / sum_cents)
             * 1000000 + 0.5) AS BIGINT) AS t_e6
    FROM orders_c o JOIN stats s USING (o_orderpriority)
  )
  SELECT o_orderpriority,
         CAST(n AS BIGINT) AS n_orders,
         CAST(sum(t_e6) // n AS BIGINT) AS theil_e6
  FROM terms GROUP BY o_orderpriority, n ORDER BY o_orderpriority
"""


PENDING: tuple[PendingQuery, ...] = (
    PendingQuery(
        "sim_pca_power_iteration",
        sim_pca_power_iteration_query,
        _pca_oracle(),
        tags=("similarity", "pca", "power-iteration", "unrolled",
              "integer-exact"),
    ),
    PendingQuery(
        "sim_ivf_nprobe_sweep",
        sim_ivf_nprobe_sweep_query,
        _NPS_ORACLE,
        tags=("similarity", "ivf", "nprobe", "recall-curve",
              "integer-exact"),
    ),
    PendingQuery(
        "dq_psi_value_drift",
        dq_psi_value_drift_query,
        _PSI_ORACLE,
        tags=("dq", "psi", "drift", "dense-grid", "micro-nats",
              "integer-exact"),
    ),
    PendingQuery(
        "llm_mix_temperature",
        llm_mix_temperature_query,
        _MIX_ORACLE,
        tags=("llmops", "mixing", "temperature", "integer-exact"),
    ),
    PendingQuery(
        "agg_theil_index",
        agg_theil_index_query,
        _THEIL_ORACLE,
        tags=("agg", "theil", "inequality", "micro-nats",
              "integer-exact"),
    ),
)
