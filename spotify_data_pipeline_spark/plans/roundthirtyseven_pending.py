"""Round-37 declared-query staging area — STAGED FOR ROUND 12 (the
round-11 window is full at exactly 50, so this wave carries complete
implementations + oracles + pytest + 2-SF dev-checks but is NOT
activated; `plans/active.py` declares it next round).

- **Brunner-Munzel**: the rank-based two-sample test without the
  equal-variance assumption Mann-Whitney leans on — DOUBLED
  placements P2(x) = 2 #{y < x} + #{y = x} via the value-table
  device, group means and DECIMAL second moments exact, the
  statistic assembled in exact-double with one e6 floor. The
  Mr + Mn = 2 n_r n_n placement identity is the pytest pin.
- **Tukey-style pairwise contrasts**: the ANOVA post-hoc table — all
  10 priority-pair mean differences with the pooled within-group
  MSE, t statistics in e6 (signed quotients through the double
  floor, never integer DIV).
- **IVF-with-kmeans++ recall**: the r35 farthest-point seeds feeding
  a 4-cell IVF (nprobe = 1), recall@5 against the integer-L2 brute
  force — the init-quality-to-recall linkage measured end to end.
- **Contamination by quality decile**: are contaminated documents
  concentrated among high-quality ones? The distilled Fisher-step
  score deciles crossed with the exact 8-gram eval-overlap screen —
  the audit that decides whether decontamination fights the quality
  filter.
- **k-suppression cost curve**: rows requiring suppression to reach
  k-anonymity at k in {2, 5, 10} under two balance-band
  generalizations (1000, 5000) — the privacy-utility frontier as a
  6-row table.

Per-wave staging module (nothing evidenced imports this file).
Exactness rules as earlier waves.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.functions.text import is_nonblank, shingles, tokens
from spotify_data_pipeline_spark.io import load_table
from spotify_data_pipeline_spark.plans.parity import rnd_cents


@dataclass(frozen=True)
class PendingQuery:
    name: str
    fn: object
    oracle: str | None
    headline: bool = False
    tags: tuple[str, ...] = ()


_TOKENS_SQL = "string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')"


# ---------------------------------------------------------------------------
# 1. Brunner-Munzel
# ---------------------------------------------------------------------------


def agg_brunner_munzel_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brunner-Munzel test between returned ('R') and non-returned
    ('N') item prices: doubled placements P2_r(x) = 2 #{y in N: y<x}
    + #{y in N: y=x} per R value (and symmetrically P2_n), all from
    ONE value-keyed aggregate with running totals. Convention as
    implemented (stated): bm_e6 = floor((Mr/n_r - Mn/n_n) /
    (2 sqrt(Sr^2/n_r + Sn^2/n_n)) * 1e6) with S^2 the sample variance
    of the doubled placements (DECIMAL second moments). The placement
    identity Mr + Mn = 2 n_r n_n is pinned in pytest.

    Scale shape: one value-keyed corpus agg, running totals on the
    distinct-value table, a 1-row assembly.
    """
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag").isin("R", "N")
    ).select(
        (F.col("l_returnflag") == "R").alias("is_r"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("v"),
    )
    counts = li.groupBy("v").agg(
        F.sum(F.when(F.col("is_r"), 1).otherwise(0)).cast("long").alias("cr"),
        F.sum(F.when(F.col("is_r"), 0).otherwise(1)).cast("long").alias("cn"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cum = counts.withColumn(
        "br", F.coalesce(F.sum("cr").over(w), F.lit(0)).cast("long")
    ).withColumn(
        "bn", F.coalesce(F.sum("cn").over(w), F.lit(0)).cast("long")
    ).select(
        "cr",
        "cn",
        (F.lit(2) * F.col("bn") + F.col("cn")).cast("long").alias("p2r"),
        (F.lit(2) * F.col("br") + F.col("cr")).cast("long").alias("p2n"),
    )
    sums = cum.agg(
        F.sum("cr").cast("long").alias("n_r"),
        F.sum("cn").cast("long").alias("n_n"),
        F.sum(F.col("cr") * F.col("p2r")).cast("long").alias("m_r"),
        F.sum(F.col("cn") * F.col("p2n")).cast("long").alias("m_n"),
        F.sum(
            F.col("cr").cast("decimal(38,0)")
            * F.col("p2r").cast("decimal(38,0)")
            * F.col("p2r").cast("decimal(38,0)")
        ).alias("q_r"),
        F.sum(
            F.col("cn").cast("decimal(38,0)")
            * F.col("p2n").cast("decimal(38,0)")
            * F.col("p2n").cast("decimal(38,0)")
        ).alias("q_n"),
    )
    s2 = (
        lambda q, m, n: (
            q.cast("double") - m.cast("double") * m.cast("double") / n.cast("double")
        )
        / (n.cast("double") - 1)
    )
    return sums.select(
        "n_r",
        "n_n",
        F.col("m_r").alias("p2_sum_r"),
        F.col("m_n").alias("p2_sum_n"),
        F.floor(
            (
                F.col("m_r").cast("double") / F.col("n_r").cast("double")
                - F.col("m_n").cast("double") / F.col("n_n").cast("double")
            )
            / (
                F.lit(2.0)
                * F.sqrt(
                    s2(F.col("q_r"), F.col("m_r"), F.col("n_r"))
                    / F.col("n_r").cast("double")
                    + s2(F.col("q_n"), F.col("m_n"), F.col("n_n"))
                    / F.col("n_n").cast("double")
                )
            )
            * 1000000
        )
        .cast("long")
        .alias("bm_e6"),
    )


_BM_ORACLE = """
  WITH li AS (
    SELECT (l_returnflag = 'R') AS is_r,
           CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v
    FROM lineitem WHERE l_returnflag IN ('R', 'N')
  ), counts AS (
    SELECT v,
           CAST(sum(CASE WHEN is_r THEN 1 ELSE 0 END) AS BIGINT) AS cr,
           CAST(sum(CASE WHEN is_r THEN 0 ELSE 1 END) AS BIGINT) AS cn
    FROM li GROUP BY 1
  ), cum AS (
    SELECT cr, cn,
           CAST(2 * coalesce(sum(cn) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                + cn AS BIGINT) AS p2r,
           CAST(2 * coalesce(sum(cr) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                + cr AS BIGINT) AS p2n
    FROM counts
  ), sums AS (
    SELECT CAST(sum(cr) AS BIGINT) AS n_r,
           CAST(sum(cn) AS BIGINT) AS n_n,
           CAST(sum(cr * p2r) AS BIGINT) AS m_r,
           CAST(sum(cn * p2n) AS BIGINT) AS m_n,
           sum(CAST(cr AS DECIMAL(38,0)) * CAST(p2r AS DECIMAL(38,0))
               * CAST(p2r AS DECIMAL(38,0))) AS q_r,
           sum(CAST(cn AS DECIMAL(38,0)) * CAST(p2n AS DECIMAL(38,0))
               * CAST(p2n AS DECIMAL(38,0))) AS q_n
    FROM cum
  )
  SELECT n_r, n_n, m_r AS p2_sum_r, m_n AS p2_sum_n,
         CAST(floor(
           (CAST(m_r AS DOUBLE) / CAST(n_r AS DOUBLE)
            - CAST(m_n AS DOUBLE) / CAST(n_n AS DOUBLE))
           / (2.0 * sqrt(
               ((CAST(q_r AS DOUBLE) - CAST(m_r AS DOUBLE)
                 * CAST(m_r AS DOUBLE) / CAST(n_r AS DOUBLE))
                / (CAST(n_r AS DOUBLE) - 1)) / CAST(n_r AS DOUBLE)
               + ((CAST(q_n AS DOUBLE) - CAST(m_n AS DOUBLE)
                   * CAST(m_n AS DOUBLE) / CAST(n_n AS DOUBLE))
                  / (CAST(n_n AS DOUBLE) - 1)) / CAST(n_n AS DOUBLE)))
           * 1000000) AS BIGINT) AS bm_e6
  FROM sums
"""


# ---------------------------------------------------------------------------
# 2. Tukey-style pairwise contrasts
# ---------------------------------------------------------------------------


def agg_tukey_pairwise_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANOVA post-hoc pairwise contrasts across the 5 order
    priorities: per group exact moments (n, cents sum, DECIMAL sum of
    squares), pooled within-group MSE = sum(ssq_g - sum_g^2/n_g) /
    (N - k) in exact-double, and for every ordered pair (g < h) the
    mean difference (cents e2, double floor — signed) and
    t_e6 = floor((mean_g - mean_h) / sqrt(MSE (1/n_g + 1/n_h)) * 1e6).

    Scale shape: one group agg (the only corpus shuffle); the 10-pair
    table assembles from the 5-row group table joined to itself on
    g < h (bounded k^2) plus a 1-row MSE broadcast.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        F.substring("o_orderpriority", 1, 1).cast("long").alias("g"),
        rnd_cents(F.col("o_totalprice")).alias("cents"),
    )
    groups = orders.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("cents").cast("long").alias("s_g"),
        F.sum(
            F.col("cents").cast("decimal(38,0)")
            * F.col("cents").cast("decimal(38,0)")
        ).alias("ssq_g"),
    )
    mse = groups.agg(
        F.sum("n_g").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(
            F.col("ssq_g").cast("double")
            - F.col("s_g").cast("double")
            * F.col("s_g").cast("double")
            / F.col("n_g").cast("double")
        ).alias("ss_within"),
    ).select(
        "n",
        "k",
        (F.col("ss_within") / (F.col("n") - F.col("k")).cast("double")).alias(
            "mse"
        ),
    )
    a = groups.select(
        F.col("g").alias("ga"),
        F.col("n_g").alias("na"),
        F.col("s_g").alias("sa"),
    )
    b = groups.select(
        F.col("g").alias("gb"),
        F.col("n_g").alias("nb"),
        F.col("s_g").alias("sb"),
    )
    pairs = a.join(b, F.col("ga") < F.col("gb")).crossJoin(F.broadcast(mse))
    mean_diff = (
        F.col("sa").cast("double") / F.col("na").cast("double")
        - F.col("sb").cast("double") / F.col("nb").cast("double")
    )
    return pairs.select(
        F.col("ga").alias("g"),
        F.col("gb").alias("h"),
        F.col("na").alias("n_g"),
        F.col("nb").alias("n_h"),
        F.floor(mean_diff * 100).cast("long").alias("mean_diff_e2_cents"),
        F.floor(
            mean_diff
            / F.sqrt(
                F.col("mse")
                * (
                    F.lit(1.0) / F.col("na").cast("double")
                    + F.lit(1.0) / F.col("nb").cast("double")
                )
            )
            * 1000000
        )
        .cast("long")
        .alias("t_e6"),
    ).orderBy("g", "h")


_TUKEY_ORACLE = """
  WITH o AS (
    SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS g,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
    FROM orders
  ), groups AS (
    SELECT g, CAST(count(*) AS BIGINT) AS n_g,
           CAST(sum(cents) AS BIGINT) AS s_g,
           sum(CAST(cents AS DECIMAL(38,0)) * CAST(cents AS DECIMAL(38,0)))
             AS ssq_g
    FROM o GROUP BY 1
  ), mse AS (
    SELECT n, k, ss_within / CAST(n - k AS DOUBLE) AS mse
    FROM (
      SELECT CAST(sum(n_g) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS k,
             sum(CAST(ssq_g AS DOUBLE)
                 - CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE)
                   / CAST(n_g AS DOUBLE)) AS ss_within
      FROM groups)
  )
  SELECT a.g AS g, b.g AS h, a.n_g, b.n_g AS n_h,
         CAST(floor((CAST(a.s_g AS DOUBLE) / CAST(a.n_g AS DOUBLE)
                     - CAST(b.s_g AS DOUBLE) / CAST(b.n_g AS DOUBLE)) * 100)
              AS BIGINT) AS mean_diff_e2_cents,
         CAST(floor((CAST(a.s_g AS DOUBLE) / CAST(a.n_g AS DOUBLE)
                     - CAST(b.s_g AS DOUBLE) / CAST(b.n_g AS DOUBLE))
                    / sqrt(m.mse * (1.0 / CAST(a.n_g AS DOUBLE)
                                    + 1.0 / CAST(b.n_g AS DOUBLE)))
                    * 1000000) AS BIGINT) AS t_e6
  FROM groups a JOIN groups b ON a.g < b.g
  CROSS JOIN mse m
  ORDER BY g, h
"""


# ---------------------------------------------------------------------------
# 3. IVF-with-kmeans++ recall
# ---------------------------------------------------------------------------

_IK_DIMS = 16
_IK_ROUNDS = 3
_IK_QUERIES = 5
_IK_TOPK = 5


def _quant(df: DataFrame) -> DataFrame:
    cols = [
        F.floor(
            F.element_at("embedding", i + 1).cast("double") * 1000000 + F.lit(0.5)
        )
        .cast("long")
        .alias(f"q{i}")
        for i in range(_IK_DIMS)
    ]
    return df.select("vec_id", *cols)


def sim_ann_ivf_kpp_recall_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end init-to-recall linkage: the r35 farthest-point seeds
    (vec 0 + 3 unrolled max-min rounds on e6-quantized 16-dim
    embeddings) become a 4-cell IVF coarse quantizer; each of the
    first 5 query vectors searches ONLY its own cell (nprobe = 1) by
    exact integer squared L2, and recall@5 is measured against the
    integer-L2 brute force over the whole corpus (self excluded,
    (d2, vec_id) tiebreak both sides). Emits per query its cell, the
    cell candidate count, and recall ppm — the table that says what
    the cheap quantizer costs in recall.

    Scale shape: seeding = k corpus passes (k = 4); assignment and
    per-cell search are cell equi-joins; brute force is the exact
    baseline twin (the production path probes more cells).
    """
    emb = _quant(load_table(spark, sf_dir, "embeddings"))

    def d2_expr(prefix_a: str, prefix_b: str):
        t = None
        for i in range(_IK_DIMS):
            diff = F.col(f"{prefix_a}q{i}") - F.col(f"{prefix_b}q{i}")
            term = diff * diff
            t = term if t is None else t + term
        return t

    chosen = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("c_id"),
        *[F.col(f"q{i}").alias(f"cq{i}") for i in range(_IK_DIMS)],
    )
    for _ in range(_IK_ROUNDS):
        scored = (
            emb.join(F.broadcast(chosen), emb.vec_id != chosen.c_id)
            .select("vec_id", *[F.col(f"q{i}") for i in range(_IK_DIMS)],
                    d2_expr("", "c").alias("d2"))
            .groupBy("vec_id", *[f"q{i}" for i in range(_IK_DIMS)])
            .agg(F.min("d2").cast("long").alias("mind2"))
            .join(chosen.select(F.col("c_id").alias("vec_id")), "vec_id", "left_anti")
        )
        pick = scored.orderBy(F.col("mind2").desc(), F.col("vec_id").asc()).limit(1)
        chosen = chosen.unionByName(
            pick.select(
                F.col("vec_id").alias("c_id"),
                *[F.col(f"q{i}").alias(f"cq{i}") for i in range(_IK_DIMS)],
            )
        ).localCheckpoint(eager=True)
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.col("d2c").asc(), F.col("c_id").asc()
    )
    assigned = (
        emb.crossJoin(F.broadcast(chosen))
        .withColumn("d2c", d2_expr("", "c"))
        .withColumn("rn", F.row_number().over(w_assign))
        .where(F.col("rn") == 1)
        .select("vec_id", *[f"q{i}" for i in range(_IK_DIMS)],
                F.col("c_id").alias("cell"))
    )
    queries = assigned.where(F.col("vec_id") < _IK_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        *[F.col(f"q{i}").alias(f"aq{i}") for i in range(_IK_DIMS)],
        "cell",
    )

    def d2_qc():
        t = None
        for i in range(_IK_DIMS):
            diff = F.col(f"aq{i}") - F.col(f"q{i}")
            term = diff * diff
            t = term if t is None else t + term
        return t

    # in-cell candidates (nprobe = 1)
    cell_cands = (
        queries.join(assigned, "cell")
        .where(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "cell", "vec_id", d2_qc().cast("long").alias("d2"))
    )
    w_rank = Window.partitionBy("q_id").orderBy(
        F.col("d2").asc(), F.col("vec_id").asc()
    )
    ivf_top = cell_cands.withColumn("rk", F.row_number().over(w_rank)).where(
        F.col("rk") <= _IK_TOPK
    )
    cand_counts = cell_cands.groupBy("q_id").agg(
        F.count(F.lit(1)).cast("long").alias("cand_count")
    )
    # brute force over everything
    bf = (
        queries.select("q_id", *[f"aq{i}" for i in range(_IK_DIMS)])
        .join(emb.withColumnRenamed("vec_id", "vec_id"), F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", d2_qc().cast("long").alias("d2"))
    )
    bf_top = bf.withColumn("rk", F.row_number().over(w_rank)).where(
        F.col("rk") <= _IK_TOPK
    )
    hits = (
        ivf_top.select("q_id", "vec_id")
        .join(bf_top.select("q_id", "vec_id"), ["q_id", "vec_id"], "left_semi")
        .groupBy("q_id")
        .agg(F.count(F.lit(1)).cast("long").alias("hits"))
    )
    return (
        queries.select("q_id", "cell")
        .join(cand_counts, "q_id", "left")
        .join(hits, "q_id", "left")
        .select(
            "q_id",
            "cell",
            F.coalesce("cand_count", F.lit(0)).cast("long").alias("cand_count"),
            (
                F.coalesce("hits", F.lit(0)) * F.lit(1_000_000 // _IK_TOPK)
            )
            .cast("long")
            .alias("recall_ppm"),
        )
        .orderBy("q_id")
    )


def _ivf_kpp_oracle() -> str:
    q_cols = ", ".join(
        f"CAST(floor(CAST(embedding[{i + 1}] AS DOUBLE) * 1000000 + 0.5)"
        f" AS BIGINT) AS q{i}"
        for i in range(_IK_DIMS)
    )
    d2_ec = " + ".join(
        f"(e.q{i} - c.q{i}) * (e.q{i} - c.q{i})" for i in range(_IK_DIMS)
    )
    d2_qa = " + ".join(
        f"(q.q{i} - a.q{i}) * (q.q{i} - a.q{i})" for i in range(_IK_DIMS)
    )
    ctes = [f"qv AS (SELECT vec_id, {q_cols} FROM embeddings)"]
    ctes.append("chosen0 AS (SELECT vec_id FROM qv WHERE vec_id = 0)")
    for r in range(1, _IK_ROUNDS + 1):
        ctes.append(
            f"""scored{r} AS (
      SELECT e.vec_id, CAST(min({d2_ec}) AS BIGINT) AS mind2
      FROM qv e JOIN qv c ON c.vec_id IN (SELECT vec_id FROM chosen{r - 1})
      WHERE e.vec_id NOT IN (SELECT vec_id FROM chosen{r - 1})
      GROUP BY e.vec_id
    ), pick{r} AS (
      SELECT vec_id FROM scored{r} ORDER BY mind2 DESC, vec_id LIMIT 1
    ), chosen{r} AS (
      SELECT vec_id FROM chosen{r - 1} UNION ALL SELECT vec_id FROM pick{r}
    )"""
        )
    last = f"chosen{_IK_ROUNDS}"
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f""",
    cents AS (
      SELECT qv.* FROM qv WHERE vec_id IN (SELECT vec_id FROM {last})
    ), assigned AS (
      SELECT vec_id, cell, {", ".join(f"q{i}" for i in range(_IK_DIMS))}
      FROM (
        SELECT e.*, c.vec_id AS cell,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY ({d2_ec.replace("c.", "c.")}), c.vec_id) AS rn
        FROM qv e CROSS JOIN cents c)
      WHERE rn = 1
    ), queries AS (
      SELECT vec_id AS q_id, cell,
             {", ".join(f"q{i} AS aq{i}" for i in range(_IK_DIMS))}
      FROM assigned WHERE vec_id < {_IK_QUERIES}
    ), cell_cands AS (
      SELECT q.q_id, q.cell, a.vec_id,
             CAST({" + ".join(f"(q.aq{i} - a.q{i}) * (q.aq{i} - a.q{i})" for i in range(_IK_DIMS))} AS BIGINT) AS d2
      FROM queries q JOIN assigned a ON q.cell = a.cell
      WHERE a.vec_id <> q.q_id
    ), ivf_top AS (
      SELECT q_id, vec_id FROM (
        SELECT *, row_number() OVER (PARTITION BY q_id
                                     ORDER BY d2, vec_id) AS rk
        FROM cell_cands) WHERE rk <= {_IK_TOPK}
    ), cand_counts AS (
      SELECT q_id, CAST(count(*) AS BIGINT) AS cand_count
      FROM cell_cands GROUP BY 1
    ), bf AS (
      SELECT q.q_id, a.vec_id,
             CAST({" + ".join(f"(q.aq{i} - a.q{i}) * (q.aq{i} - a.q{i})" for i in range(_IK_DIMS))} AS BIGINT) AS d2
      FROM queries q CROSS JOIN qv a
      WHERE a.vec_id <> q.q_id
    ), bf_top AS (
      SELECT q_id, vec_id FROM (
        SELECT *, row_number() OVER (PARTITION BY q_id
                                     ORDER BY d2, vec_id) AS rk
        FROM bf) WHERE rk <= {_IK_TOPK}
    ), hits AS (
      SELECT i.q_id, CAST(count(*) AS BIGINT) AS hits
      FROM ivf_top i JOIN bf_top b
        ON i.q_id = b.q_id AND i.vec_id = b.vec_id
      GROUP BY 1
    )
    SELECT q.q_id, q.cell,
           CAST(coalesce(cc.cand_count, 0) AS BIGINT) AS cand_count,
           CAST(coalesce(h.hits, 0) * {1_000_000 // _IK_TOPK} AS BIGINT)
             AS recall_ppm
    FROM queries q
    LEFT JOIN cand_counts cc ON q.q_id = cc.q_id
    LEFT JOIN hits h ON q.q_id = h.q_id
    ORDER BY q.q_id
    """
    )


# ---------------------------------------------------------------------------
# 4. Contamination by quality decile
# ---------------------------------------------------------------------------

_CQ_GRAM = 8
_CQ_EVAL_MOD = 16


def llm_contamination_by_quality_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Are contaminated documents concentrated among the
    high-quality ones? Corpus docs (doc_id % 16 != 0) are scored with
    the distilled Fisher-step classifier (re-derived inline on the
    corpus split), cut into score deciles, and crossed with the exact
    8-gram eval-overlap screen (eval set = doc_id % 16 == 0). Emits
    per decile the doc count, contaminated count, and rate ppm — if
    contamination rises with quality, decontamination and the quality
    filter are pulling the same documents and the pipeline must
    decide an order.

    Scale shape: the decontam side is the distinct-eval-gram
    broadcast + one corpus semi-join (the llm_decontam_overlap
    shape); the quality side is one scan + a 1-row weight broadcast;
    the cross is a doc-keyed left join + decile window.
    """
    docs = load_table(spark, sf_dir, "documents").where(is_nonblank(F.col("text")))
    corpus = docs.where(F.col("doc_id") % _CQ_EVAL_MOD != 0)
    eval_docs = docs.where(F.col("doc_id") % _CQ_EVAL_MOD == 0)
    eval_grams = eval_docs.select(
        F.explode(
            F.array_distinct(shingles(tokens(F.col("text")), _CQ_GRAM))
        ).alias("g")
    ).distinct()
    corpus_grams = corpus.select(
        "doc_id",
        F.explode(
            F.array_distinct(shingles(tokens(F.col("text")), _CQ_GRAM))
        ).alias("g"),
    )
    contaminated = (
        corpus_grams.join(F.broadcast(eval_grams), "g", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("contaminated", F.lit(1))
    )
    feats = corpus.select(
        "doc_id",
        F.when(F.col("lang") == "en", 1).otherwise(0).cast("long").alias("y"),
        F.size(tokens(F.col("text"))).cast("long").alias("x"),
    ).withColumn("t", (F.col("y") * 2 - 1).cast("long"))
    sums = feats.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum("t").cast("long").alias("st"),
        F.sum(F.col("x") * F.col("t")).cast("long").alias("sxt"),
    )
    den = (
        F.col("n").cast("double") * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    weights = sums.select(
        F.floor(
            F.lit(2.0)
            * (
                F.col("sxx").cast("double") * F.col("st").cast("double")
                - F.col("sx").cast("double") * F.col("sxt").cast("double")
            )
            / den
            * 1000000
        )
        .cast("long")
        .alias("w0_e6"),
        F.floor(
            F.lit(2.0)
            * (
                F.col("n").cast("double") * F.col("sxt").cast("double")
                - F.col("sx").cast("double") * F.col("st").cast("double")
            )
            / den
            * 1000000
        )
        .cast("long")
        .alias("w1_e6"),
    )
    scored = feats.crossJoin(F.broadcast(weights)).select(
        "doc_id",
        (F.col("w0_e6") + F.col("w1_e6") * F.col("x")).cast("long").alias(
            "score_e6"
        ),
    )
    w = Window.orderBy(F.col("score_e6").asc(), F.col("doc_id").asc())
    binned = (
        scored.withColumn("decile", F.ntile(10).over(w).cast("long"))
        .join(contaminated, "doc_id", "left")
        .select(
            "decile",
            F.coalesce("contaminated", F.lit(0)).cast("long").alias("c"),
        )
    )
    return (
        binned.groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("c").cast("long").alias("contaminated"),
        )
        .select(
            "decile",
            "n_docs",
            "contaminated",
            F.expr("(contaminated * 1000000) DIV n_docs")
            .cast("long")
            .alias("rate_ppm"),
        )
        .orderBy("decile")
    )


_CONTAM_Q_ORACLE = rf"""
  WITH docs AS (
    SELECT doc_id, lang, {_TOKENS_SQL} AS toks
    FROM documents WHERE length(trim(text)) > 0
  ), grams AS (
    SELECT doc_id, unnest(
      CASE WHEN len(toks) >= {_CQ_GRAM}
           THEN list_distinct(list_transform(range(1, len(toks) - {_CQ_GRAM - 2}),
                                             i -> array_to_string(toks[i:i+{_CQ_GRAM - 1}], ' ')))
           ELSE [array_to_string(toks, ' ')] END) AS g
    FROM docs
  ), eval_grams AS (
    SELECT DISTINCT g FROM grams WHERE doc_id % {_CQ_EVAL_MOD} = 0
  ), contaminated AS (
    SELECT DISTINCT cg.doc_id
    FROM grams cg JOIN eval_grams e ON cg.g = e.g
    WHERE cg.doc_id % {_CQ_EVAL_MOD} <> 0
  ), feats AS (
    SELECT doc_id,
           CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS y,
           CAST(len(toks) AS BIGINT) AS x,
           CAST(CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS BIGINT) AS t
    FROM docs WHERE doc_id % {_CQ_EVAL_MOD} <> 0
  ), sums AS (
    SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
           CAST(sum(x * x) AS BIGINT) AS sxx,
           CAST(sum(t) AS BIGINT) AS st,
           CAST(sum(x * t) AS BIGINT) AS sxt
    FROM feats
  ), weights AS (
    SELECT CAST(floor(
             (2.0 * (CAST(sxx AS DOUBLE) * CAST(st AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sxt AS DOUBLE))
              / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * 1000000)
             AS BIGINT) AS w0_e6,
           CAST(floor(
             (2.0 * (CAST(n AS DOUBLE) * CAST(sxt AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(st AS DOUBLE))
              / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * 1000000)
             AS BIGINT) AS w1_e6
    FROM sums
  ), scored AS (
    SELECT f.doc_id,
           CAST(w.w0_e6 + w.w1_e6 * f.x AS BIGINT) AS score_e6
    FROM feats f CROSS JOIN weights w
  ), binned AS (
    SELECT s.doc_id,
           CAST(ntile(10) OVER (ORDER BY s.score_e6, s.doc_id) AS BIGINT)
             AS decile,
           CASE WHEN c.doc_id IS NULL THEN 0 ELSE 1 END AS c
    FROM scored s LEFT JOIN contaminated c ON s.doc_id = c.doc_id
  )
  SELECT decile, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(c) AS BIGINT) AS contaminated,
         CAST((sum(c) * 1000000) // count(*) AS BIGINT) AS rate_ppm
  FROM binned GROUP BY 1
  ORDER BY decile
"""


# ---------------------------------------------------------------------------
# 5. k-suppression cost curve
# ---------------------------------------------------------------------------

_KS_KS = (2, 5, 10)
_KS_BANDS = (1000, 5000)


def privacy_k_suppression_curve_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The privacy-utility frontier as a table: for every (k, balance
    band width) policy — k in {2, 5, 10}, band in {1000, 5000} — the
    number of quasi-identifier groups smaller than k and the rows
    that must be suppressed to reach k-anonymity (QI = nation x
    segment x banded balance, the privacy_k_anonymity row's QI with
    the band width as a generalization knob). Coarser bands suppress
    fewer rows — the monotonicity pinned in pytest.

    Scale shape: one group agg per band width (2 corpus passes over
    the small customer table), a 6-literal policy cross on the group
    tables, one sum.
    """
    cust = load_table(spark, sf_dir, "customer")
    outs = []
    for band in _KS_BANDS:
        groups = (
            cust.select(
                "c_nationkey",
                "c_mktsegment",
                F.floor(F.col("c_acctbal") / band).cast("long").alias("bal_band"),
            )
            .groupBy("c_nationkey", "c_mktsegment", "bal_band")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        )
        expl = groups.select(
            "cnt",
            F.explode(
                F.array(*[F.lit(k).cast("long") for k in _KS_KS])
            ).alias("k"),
        )
        outs.append(
            expl.groupBy("k")
            .agg(
                F.sum(F.when(F.col("cnt") < F.col("k"), 1).otherwise(0))
                .cast("long")
                .alias("small_groups"),
                F.sum(
                    F.when(F.col("cnt") < F.col("k"), F.col("cnt")).otherwise(0)
                )
                .cast("long")
                .alias("rows_suppressed"),
                F.sum("cnt").cast("long").alias("rows_total"),
            )
            .select(
                F.lit(band).cast("long").alias("band_width"),
                "k",
                "small_groups",
                "rows_suppressed",
                F.expr("(rows_suppressed * 1000000) DIV rows_total")
                .cast("long")
                .alias("suppressed_ppm"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res.orderBy("band_width", "k")


def _ks_curve_oracle() -> str:
    parts = []
    for band in _KS_BANDS:
        parts.append(
            f"""
    SELECT CAST({band} AS BIGINT) AS band_width, k,
           CAST(sum(CASE WHEN cnt < k THEN 1 ELSE 0 END) AS BIGINT)
             AS small_groups,
           CAST(sum(CASE WHEN cnt < k THEN cnt ELSE 0 END) AS BIGINT)
             AS rows_suppressed,
           CAST((sum(CASE WHEN cnt < k THEN cnt ELSE 0 END) * 1000000)
                // sum(cnt) AS BIGINT) AS suppressed_ppm
    FROM (
      SELECT cnt, unnest([{", ".join(f"CAST({k} AS BIGINT)" for k in _KS_KS)}]) AS k
      FROM (
        SELECT CAST(count(*) AS BIGINT) AS cnt
        FROM customer
        GROUP BY c_nationkey, c_mktsegment,
                 CAST(floor(c_acctbal / {band}) AS BIGINT)))
    GROUP BY k"""
        )
    return "SELECT * FROM (" + "\n    UNION ALL".join(parts) + ") ORDER BY band_width, k"


PENDING: tuple[PendingQuery, ...] = (
    PendingQuery(
        "agg_brunner_munzel",
        agg_brunner_munzel_query,
        _BM_ORACLE,
        tags=("agg", "brunner-munzel", "placements", "value-table-device",
              "exact-double"),
    ),
    PendingQuery(
        "agg_tukey_pairwise",
        agg_tukey_pairwise_query,
        _TUKEY_ORACLE,
        tags=("agg", "tukey", "post-hoc", "pairwise-contrasts",
              "exact-double"),
    ),
    PendingQuery(
        "sim_ann_ivf_kpp_recall",
        sim_ann_ivf_kpp_recall_query,
        _ivf_kpp_oracle(),
        tags=("sim", "ivf", "kmeanspp", "recall-audit",
              "integer-exact"),
    ),
    PendingQuery(
        "llm_contamination_by_quality",
        llm_contamination_by_quality_query,
        _CONTAM_Q_ORACLE,
        tags=("llm", "contamination", "quality-cross", "audit"),
    ),
    PendingQuery(
        "privacy_k_suppression_curve",
        privacy_k_suppression_curve_query,
        _ks_curve_oracle(),
        tags=("privacy", "k-anonymity", "suppression-curve",
              "integer-exact"),
    ),
)
