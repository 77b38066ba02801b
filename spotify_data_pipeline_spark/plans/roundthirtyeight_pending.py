"""Round-38 declared-query staging area — STAGED FOR ROUND 12 (second
staged-ahead wave beside roundthirtyseven; the round-11 window is
full, so these carry the full kit but are NOT activated).

- **Bigram cross-entropy by source**: the corpus bigram LM's pooled
  xent per SOURCE domain — which domains the LM models worst (the
  stratified twin of llm_bigram_doc_ppl's per-doc worst list).
- **k-truss, 2 unrolled rounds**: edges surviving triangle-support
  >= k-2 after two peeling rounds on the co-purchase projection —
  the community-core sibling of k-core (support recomputed after the
  first peel; convergence flag emitted, fixed rounds stated).
- **Welch's ANOVA**: the k-group heteroscedastic mean test (the
  events_ab_welch row's k-group generalization) from exact group
  moments — weights w_g = n_g/s_g^2, the F* statistic assembled in
  exact-double with one e6 floor.
- **Repeat-purchase decay**: per first-purchase-month cohort, the
  fraction of customers ordering again k months later (k = 1, 3, 6)
  — the orders-side retention curve beside the events-side cohort
  rows.
- **Quantizer balance audit**: the farthest-point quantizer's cell
  populations with the max/mean straggler ppm — an imbalanced coarse
  quantizer is how IVF probes go quadratic on one cell (pairs with
  ops_shard_balance_audit on the embedding side).

Per-wave staging module (nothing evidenced imports this file).
Exactness rules as earlier waves.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.functions.text import is_nonblank, tokens
from spotify_data_pipeline_spark.io import load_table
from spotify_data_pipeline_spark.operators.parallelism import ensure_min_parallelism
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
# 1. Bigram cross-entropy by source
# ---------------------------------------------------------------------------


def llm_bigram_xent_by_source_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pooled bigram cross-entropy per SOURCE under the corpus LM with
    add-V smoothing (the llm_bigram_doc_ppl device, aggregated on the
    domain axis): every log-probability is an integer micro-nat
    (per-term floor), per source xent_e6 = (-sum lp_e6) DIV
    n_bigrams. The domains with the highest xent are the ones the
    corpus LM models worst — the stratified readout a mixture
    re-weighting consults.

    Scale shape: one bigram-keyed LM agg, one unigram agg, two
    equi-joins back, one source agg; 1-row vocabulary broadcast.
    """
    # r12 optimization (guide §2.5 + the shingles binding lesson): the
    # bigram column used to reference the tokenization expression five
    # times (size twice, two slices, implicit guard), re-running the
    # regex split ~5x per row — and the whole map stage sat in the
    # single scan task. Tokens are now materialized once as a column
    # (multi-referenced non-cheap aliases block CollapseProject, so
    # the split runs once per row) and the scan is parallelized.
    docs = ensure_min_parallelism(
        load_table(spark, sf_dir, "documents").where(is_nonblank(F.col("text")))
    )
    toked = docs.select("doc_id", "source", tokens(F.col("text")).alias("toks"))
    tc = F.col("toks")
    nc = F.size(tc)
    with_bigrams = toked.select(
        "doc_id",
        "source",
        "toks",
        F.when(
            nc >= 2,
            F.zip_with(
                F.slice(tc, 1, nc - 1),
                F.slice(tc, 2, nc - 1),
                lambda x, y: F.concat_ws(" ", x, y),
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("bigrams"),
    )
    uni = with_bigrams.select(F.explode("toks").alias("w1")).groupBy("w1").agg(
        F.count(F.lit(1)).cast("long").alias("c1")
    )
    vocab = uni.agg(F.count(F.lit(1)).cast("long").alias("v"))
    bg = with_bigrams.select(
        "source", F.explode("bigrams").alias("bigram")
    ).withColumn("w1", F.split(F.col("bigram"), " ").getItem(0))
    c2 = bg.groupBy("bigram").agg(F.count(F.lit(1)).cast("long").alias("c2"))
    lp = (
        bg.join(c2, "bigram")
        .join(uni, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "source",
            F.floor(
                F.log((F.col("c2") + 1) / (F.col("c1") + F.col("v")))
                * 1000000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("lp_e6"),
        )
    )
    return (
        lp.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.expr("(-sum(lp_e6)) DIV count(1)").cast("long").alias("xent_e6"),
        )
        .orderBy("source")
    )


_XENT_SRC_ORACLE = rf"""
  WITH docs AS (
    SELECT doc_id, source, {_TOKENS_SQL} AS toks
    FROM documents WHERE length(trim(text)) > 0
  ), wb AS (
    SELECT doc_id, source, toks,
           CASE WHEN len(toks) >= 2
                THEN list_transform(range(1, len(toks)),
                                    i -> toks[i] || ' ' || toks[i+1])
                ELSE [] END AS bigrams
    FROM docs
  ), uni AS (
    SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM (
      SELECT unnest(toks) AS w1 FROM wb) GROUP BY 1
  ), vocab AS (
    SELECT CAST(count(*) AS BIGINT) AS v FROM uni
  ), bg AS (
    SELECT source, bigram, string_split(bigram, ' ')[1] AS w1 FROM (
      SELECT source, unnest(bigrams) AS bigram FROM wb)
  ), c2 AS (
    SELECT bigram, CAST(count(*) AS BIGINT) AS c2 FROM bg GROUP BY 1
  ), lp AS (
    SELECT b.source,
           CAST(floor(ln((c2.c2 + 1) / CAST(u.c1 + v.v AS DOUBLE))
                      * 1000000 + 0.5) AS BIGINT) AS lp_e6
    FROM bg b
    JOIN c2 ON b.bigram = c2.bigram
    JOIN uni u ON b.w1 = u.w1
    CROSS JOIN vocab v
  )
  SELECT source, CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST((-sum(lp_e6)) // count(*) AS BIGINT) AS xent_e6
  FROM lp GROUP BY 1
  ORDER BY source
"""


# ---------------------------------------------------------------------------
# 2. k-truss, 2 unrolled rounds
# ---------------------------------------------------------------------------

_KT_K = 4  # edges need triangle support >= k - 2 = 2


def graph_ktruss_2round_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-round 4-truss peeling on the supplier co-purchase projection
    (suppliers adjacent iff they supplied the same ORDER; degree-
    bounded by order width): round 1 computes each edge's triangle
    support via the oriented wedge join and keeps support >= 2;
    round 2 recomputes support WITHIN the survivors and peels again
    (fixed 2 rounds, stated — full truss decomposition iterates to a
    fixpoint; the convergence flag says whether round 2 changed
    anything). Emits surviving edges with both support values.

    Scale shape: the wedge join is oriented (u < v < w adjacency)
    exactly like the triangle-count row; each round is one self-join
    + one group agg on the edge key.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    # lineage cuts between peeling rounds (the iterative-operator
    # device: without them the round-2 support join replays the whole
    # round-1 plan — 231 shuffles at the audit, vs 14 with the cuts)
    # r13: explicit fan-out before each checkpoint — the support stage
    # below is CPU-dense but bytes-tiny (~16 B/edge), so AQE coalesces
    # it to 1-4 tasks without the repartition (the r12
    # dedup_lsh_levenshtein lesson, guide §2.5).
    par = spark.sparkContext.defaultParallelism
    pairs = (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .where(F.col("a.l_suppkey") < F.col("b.l_suppkey"))
        .select(
            F.col("a.l_suppkey").alias("u"), F.col("b.l_suppkey").alias("v")
        )
        .distinct()
        .repartition(par)
        .localCheckpoint(eager=True)
    )

    def support(edges: DataFrame) -> DataFrame:
        # r13 restructure (guide §1.1 first-principles + §2.3/§2.4):
        # edge support = |N(u) ∩ N(v)| over the round's edge set — the
        # same number the previous a<b<c wedge enumeration credited to
        # each edge (every triangle {u,v,w} contributes its third
        # vertex to exactly this intersection; verified 0 mismatching
        # (u,v,sup) rows at sf0.1 and the unchanged DuckDB oracle). The
        # wedge join materialized Ω(#wedges) rows (~10⁸ on this
        # near-complete projection — 126-190 s at sf0.1); here each
        # node's neighborhood is a fixed-width BIGINT bitmap (suppkeys
        # are a dense bounded id space; width = max_id/64 words rides a
        # 1-row broadcast), support is Σ bit_count(a&b) per edge —
        # map-side, no per-row hash-set allocation (an array_intersect
        # variant measured 20-60 s/round on allocation churn; the
        # bitmap round is ~3-6 s). Scale trade stated: bitmap bytes
        # grow with max node id, the right shape for dense projections
        # like this one; for sparse billion-node graphs the wedge join
        # remains the general formulation.
        ext = edges.select(F.col("u").alias("node"), F.col("v").alias("nbr")).unionAll(
            edges.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
        )
        nw = ext.agg((F.floor(F.max("nbr") / 64) + 1).cast("int").alias("_nw"))
        wordmaps = (
            ext.select(
                "node",
                F.expr("CAST(nbr DIV 64 AS INT)").alias("_w"),
                F.expr("shiftleft(1L, CAST(nbr % 64 AS INT))").alias("_b"),
            )
            .groupBy("node", "_w")
            .agg(F.expr("bit_or(_b)").alias("_bits"))
            .groupBy("node")
            .agg(F.map_from_entries(F.collect_list(F.struct("_w", "_bits"))).alias("_m"))
        )
        adj = wordmaps.crossJoin(F.broadcast(nw)).select(
            "node",
            F.expr("transform(sequence(0, _nw - 1), i -> coalesce(_m[i], 0L))").alias(
                "nbm"
            ),
        )
        inter = F.aggregate(
            F.zip_with(
                F.col("_nu"), F.col("_nv"), lambda x, y: F.bit_count(x.bitwiseAND(y))
            ),
            F.lit(0).cast("long"),
            lambda acc, c: acc + c,
        )
        return (
            edges.join(
                adj.select(F.col("node").alias("u"), F.col("nbm").alias("_nu")), "u"
            )
            .join(adj.select(F.col("node").alias("v"), F.col("nbm").alias("_nv")), "v")
            .select("u", "v", inter.cast("long").alias("sup"))
        )

    s1 = support(pairs).localCheckpoint(eager=True)
    kept1 = (
        s1.where(F.col("sup") >= _KT_K - 2)
        .select("u", "v")
        .repartition(par)  # fan the round-2 support stage out too
        .localCheckpoint(eager=True)
    )
    s2 = support(kept1)
    kept2 = s2.where(F.col("sup") >= _KT_K - 2)
    return (
        kept2.join(
            s1.select("u", "v", F.col("sup").alias("support_r1")), ["u", "v"]
        )
        .select(
            "u",
            "v",
            "support_r1",
            F.col("sup").alias("support_r2"),
            F.when(F.col("sup") == F.col("support_r1"), 1)
            .otherwise(0)
            .cast("long")
            .alias("stable"),
        )
        .orderBy("u", "v")
    )


_KTRUSS_ORACLE = f"""
  WITH pairs AS (
    SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
    FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
    WHERE a.l_suppkey < b.l_suppkey
  ), tri1 AS (
    SELECT e1.u AS a, e1.v AS b, e2.v AS c
    FROM pairs e1
    JOIN pairs e2 ON e1.v = e2.u
    JOIN pairs e3 ON e3.u = e1.u AND e3.v = e2.v
  ), sup1 AS (
    SELECT u, v, CAST(count(*) AS BIGINT) AS sup FROM (
      SELECT a AS u, b AS v FROM tri1
      UNION ALL SELECT a AS u, c AS v FROM tri1
      UNION ALL SELECT b AS u, c AS v FROM tri1)
    GROUP BY 1, 2
  ), s1 AS (
    SELECT p.u, p.v, CAST(coalesce(sup1.sup, 0) AS BIGINT) AS sup
    FROM pairs p LEFT JOIN sup1 ON p.u = sup1.u AND p.v = sup1.v
  ), kept1 AS (
    SELECT u, v FROM s1 WHERE sup >= {_KT_K - 2}
  ), tri2 AS (
    SELECT e1.u AS a, e1.v AS b, e2.v AS c
    FROM kept1 e1
    JOIN kept1 e2 ON e1.v = e2.u
    JOIN kept1 e3 ON e3.u = e1.u AND e3.v = e2.v
  ), sup2 AS (
    SELECT u, v, CAST(count(*) AS BIGINT) AS sup FROM (
      SELECT a AS u, b AS v FROM tri2
      UNION ALL SELECT a AS u, c AS v FROM tri2
      UNION ALL SELECT b AS u, c AS v FROM tri2)
    GROUP BY 1, 2
  ), s2 AS (
    SELECT k.u, k.v, CAST(coalesce(sup2.sup, 0) AS BIGINT) AS sup
    FROM kept1 k LEFT JOIN sup2 ON k.u = sup2.u AND k.v = sup2.v
  )
  SELECT s2.u AS u, s2.v AS v, s1.sup AS support_r1, s2.sup AS support_r2,
         CAST(CASE WHEN s2.sup = s1.sup THEN 1 ELSE 0 END AS BIGINT)
           AS stable
  FROM s2 JOIN s1 ON s2.u = s1.u AND s2.v = s1.v
  WHERE s2.sup >= {_KT_K - 2}
  ORDER BY s2.u, s2.v
"""


# ---------------------------------------------------------------------------
# 3. Welch's ANOVA
# ---------------------------------------------------------------------------


def agg_welch_anova_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's heteroscedastic k-group ANOVA of order revenue across
    the 5 priorities (the events_ab_welch row's k-group
    generalization, Welch 1951): from exact group moments (n_g, cents
    sum, DECIMAL sum of squares), w_g = n_g / s_g^2, the weighted
    grand mean, F* = [sum w_g (m_g - m_w)^2 / (k-1)] / [1 +
    2(k-2)/(k^2-1) sum h_g] with h_g = (1 - w_g/W)^2 / (n_g - 1), and
    the denominator dof nu = (k^2-1) / (3 sum h_g) — all assembled in
    exact-double with one e6 floor each. Emits per group its moments
    plus the shared F* and nu.

    Scale shape: one group agg (the only corpus shuffle), a 1-row
    assembly broadcast back onto the 5-row group table.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", rnd_cents(F.col("o_totalprice")).alias("cents")
    )
    groups = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("cents").cast("long").alias("s_g"),
        F.sum(
            F.col("cents").cast("decimal(38,0)")
            * F.col("cents").cast("decimal(38,0)")
        ).alias("ssq_g"),
    )
    m = F.col("s_g").cast("double") / F.col("n_g").cast("double")
    s2 = (
        F.col("ssq_g").cast("double")
        - F.col("s_g").cast("double") * F.col("s_g").cast("double")
        / F.col("n_g").cast("double")
    ) / (F.col("n_g").cast("double") - 1)
    wg = F.col("n_g").cast("double") / s2
    staged = groups.select(
        "o_orderpriority", "n_g", "s_g", m.alias("m_g"), wg.alias("w_g")
    )
    tot = staged.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("w_g").alias("w_tot"),
        F.sum(F.col("w_g") * F.col("m_g")).alias("wm_tot"),
    )
    with_tot = staged.crossJoin(F.broadcast(tot)).withColumn(
        "m_w", F.col("wm_tot") / F.col("w_tot")
    )
    assembly = with_tot.agg(
        F.max("k").cast("long").alias("k2"),
        F.sum(
            F.col("w_g")
            * (F.col("m_g") - F.col("m_w"))
            * (F.col("m_g") - F.col("m_w"))
        ).alias("num_ss"),
        F.sum(
            (F.lit(1.0) - F.col("w_g") / F.col("w_tot"))
            * (F.lit(1.0) - F.col("w_g") / F.col("w_tot"))
            / (F.col("n_g").cast("double") - 1)
        ).alias("h_sum"),
    ).select(
        F.col("k2").alias("k"),
        F.floor(
            (
                F.col("num_ss") / (F.col("k2").cast("double") - 1)
            )
            / (
                F.lit(1.0)
                + F.lit(2.0)
                * (F.col("k2").cast("double") - 2)
                / (
                    F.col("k2").cast("double") * F.col("k2").cast("double")
                    - 1
                )
                * F.col("h_sum")
            )
            * 1000000
        )
        .cast("long")
        .alias("f_star_e6"),
        F.floor(
            (
                F.col("k2").cast("double") * F.col("k2").cast("double") - 1
            )
            / (F.lit(3.0) * F.col("h_sum"))
            * 1000000
        )
        .cast("long")
        .alias("nu_e6"),
    )
    return (
        groups.crossJoin(F.broadcast(assembly))
        .select(
            "o_orderpriority",
            "n_g",
            "s_g",
            "k",
            "f_star_e6",
            "nu_e6",
        )
        .orderBy("o_orderpriority")
    )


_WELCH_ORACLE = """
  WITH o AS (
    SELECT o_orderpriority,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
    FROM orders
  ), groups AS (
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_g,
           CAST(sum(cents) AS BIGINT) AS s_g,
           sum(CAST(cents AS DECIMAL(38,0)) * CAST(cents AS DECIMAL(38,0)))
             AS ssq_g
    FROM o GROUP BY 1
  ), staged AS (
    SELECT o_orderpriority, n_g, s_g,
           CAST(s_g AS DOUBLE) / CAST(n_g AS DOUBLE) AS m_g,
           CAST(n_g AS DOUBLE)
           / ((CAST(ssq_g AS DOUBLE)
               - CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE)
                 / CAST(n_g AS DOUBLE))
              / (CAST(n_g AS DOUBLE) - 1)) AS w_g
    FROM groups
  ), tot AS (
    SELECT CAST(count(*) AS BIGINT) AS k, sum(w_g) AS w_tot,
           sum(w_g * m_g) AS wm_tot
    FROM staged
  ), assembly AS (
    SELECT k,
           CAST(floor((num_ss / (CAST(k AS DOUBLE) - 1))
                      / (1.0 + 2.0 * (CAST(k AS DOUBLE) - 2)
                         / (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1)
                         * h_sum)
                      * 1000000) AS BIGINT) AS f_star_e6,
           CAST(floor((CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1)
                      / (3.0 * h_sum) * 1000000) AS BIGINT) AS nu_e6
    FROM (
      SELECT max(t.k) AS k,
             sum(s.w_g * (s.m_g - t.wm_tot / t.w_tot)
                 * (s.m_g - t.wm_tot / t.w_tot)) AS num_ss,
             sum((1.0 - s.w_g / t.w_tot) * (1.0 - s.w_g / t.w_tot)
                 / (CAST(s.n_g AS DOUBLE) - 1)) AS h_sum
      FROM staged s CROSS JOIN tot t)
  )
  SELECT g.o_orderpriority, g.n_g, g.s_g, a.k, a.f_star_e6, a.nu_e6
  FROM groups g CROSS JOIN assembly a
  ORDER BY g.o_orderpriority
"""


# ---------------------------------------------------------------------------
# 4. Repeat-purchase decay
# ---------------------------------------------------------------------------

_RPD_LAGS = (1, 3, 6)


def orders_repeat_purchase_decay_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Orders-side retention: cohort = a customer's first purchase
    month; for k in {1, 3, 6} the fraction of the cohort ordering
    again in cohort month + k EXACTLY (month arithmetic on
    year*12+month integers — no date intervals cross engines). Emits
    per (cohort month, k): cohort size, active, retained ppm.

    Scale shape: one customer-keyed min agg, one distinct
    (customer, month) activity table, an equi-join on (customer,
    month + k) per lag via a 3-literal explode.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        (
            F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
        )
        .cast("long")
        .alias("mo"),
    )
    first = orders.groupBy("o_custkey").agg(F.min("mo").cast("long").alias("c_mo"))
    activity = orders.select("o_custkey", "mo").distinct()
    expl = first.select(
        "o_custkey",
        "c_mo",
        F.explode(F.array(*[F.lit(k).cast("long") for k in _RPD_LAGS])).alias("k"),
    )
    joined = expl.join(
        activity.select(
            F.col("o_custkey").alias("a_cust"), F.col("mo").alias("a_mo")
        ),
        (F.col("o_custkey") == F.col("a_cust"))
        & (F.col("a_mo") == F.col("c_mo") + F.col("k")),
        "left",
    ).select(
        "c_mo",
        "k",
        F.when(F.col("a_cust").isNotNull(), 1).otherwise(0).alias("active"),
    )
    return (
        joined.groupBy("c_mo", "k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cohort_size"),
            F.sum("active").cast("long").alias("active"),
        )
        .select(
            F.col("c_mo").alias("cohort_month_idx"),
            "k",
            "cohort_size",
            "active",
            F.expr("(active * 1000000) DIV cohort_size")
            .cast("long")
            .alias("retained_ppm"),
        )
        .orderBy("cohort_month_idx", "k")
    )


def _rpd_oracle() -> str:
    lags = ", ".join(f"CAST({k} AS BIGINT)" for k in _RPD_LAGS)
    return f"""
  WITH o AS (
    SELECT o_custkey,
           CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)
             AS mo
    FROM orders
  ), first AS (
    SELECT o_custkey, CAST(min(mo) AS BIGINT) AS c_mo FROM o GROUP BY 1
  ), activity AS (
    SELECT DISTINCT o_custkey, mo FROM o
  ), expl AS (
    SELECT f.o_custkey, f.c_mo, k.k
    FROM first f CROSS JOIN (SELECT unnest([{lags}]) AS k) k
  )
  SELECT e.c_mo AS cohort_month_idx, e.k,
         CAST(count(*) AS BIGINT) AS cohort_size,
         CAST(sum(CASE WHEN a.o_custkey IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS active,
         CAST((sum(CASE WHEN a.o_custkey IS NOT NULL THEN 1 ELSE 0 END)
               * 1000000) // count(*) AS BIGINT) AS retained_ppm
  FROM expl e
  LEFT JOIN activity a
    ON e.o_custkey = a.o_custkey AND a.mo = e.c_mo + e.k
  GROUP BY 1, 2
  ORDER BY cohort_month_idx, k
"""


# ---------------------------------------------------------------------------
# 5. Quantizer balance audit
# ---------------------------------------------------------------------------

_QB_DIMS = 16
_QB_ROUNDS = 3


def sim_quantizer_balance_audit_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cell-population balance of the farthest-point quantizer (the
    r35 seeds: vec 0 + 3 exact max-min rounds on e6-quantized 16-dim
    embeddings): every vector assigned to its nearest center (integer
    squared L2, center-id ties), per-cell populations, and on every
    row the max population and the max/mean straggler ppm — the
    number that says whether one IVF cell will eat a whole probe
    budget (the embedding-side sibling of ops_shard_balance_audit).

    Scale shape: k corpus passes for the seeds, one broadcast-assign
    pass, one 4-row agg.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    qcols = [
        F.floor(
            F.element_at("embedding", i + 1).cast("double") * 1000000 + F.lit(0.5)
        )
        .cast("long")
        .alias(f"q{i}")
        for i in range(_QB_DIMS)
    ]
    q = emb.select("vec_id", *qcols)

    def d2(pa: str, pb: str):
        t = None
        for i in range(_QB_DIMS):
            diff = F.col(f"{pa}q{i}") - F.col(f"{pb}q{i}")
            term = diff * diff
            t = term if t is None else t + term
        return t

    chosen = q.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("c_id"),
        *[F.col(f"q{i}").alias(f"cq{i}") for i in range(_QB_DIMS)],
    )
    for _ in range(_QB_ROUNDS):
        scored = (
            q.join(F.broadcast(chosen), q.vec_id != chosen.c_id)
            .select("vec_id", *[F.col(f"q{i}") for i in range(_QB_DIMS)],
                    d2("", "c").alias("d2"))
            .groupBy("vec_id", *[f"q{i}" for i in range(_QB_DIMS)])
            .agg(F.min("d2").cast("long").alias("mind2"))
            .join(chosen.select(F.col("c_id").alias("vec_id")), "vec_id", "left_anti")
        )
        pick = scored.orderBy(F.col("mind2").desc(), F.col("vec_id").asc()).limit(1)
        chosen = chosen.unionByName(
            pick.select(
                F.col("vec_id").alias("c_id"),
                *[F.col(f"q{i}").alias(f"cq{i}") for i in range(_QB_DIMS)],
            )
        ).localCheckpoint(eager=True)
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.col("d2c").asc(), F.col("c_id").asc()
    )
    assigned = (
        q.crossJoin(F.broadcast(chosen))
        .withColumn("d2c", d2("", "c"))
        .withColumn("rn", F.row_number().over(w_assign))
        .where(F.col("rn") == 1)
        .select("vec_id", F.col("c_id").alias("cell"))
    )
    cells = assigned.groupBy("cell").agg(
        F.count(F.lit(1)).cast("long").alias("population")
    )
    glob = cells.agg(
        F.max("population").cast("long").alias("max_pop"),
        F.expr("sum(population) DIV count(1)").cast("long").alias("mean_pop"),
    ).select(
        "max_pop",
        "mean_pop",
        F.expr("(max_pop * 1000000) DIV mean_pop")
        .cast("long")
        .alias("straggler_ppm"),
    )
    return (
        cells.crossJoin(F.broadcast(glob))
        .select("cell", "population", "max_pop", "mean_pop", "straggler_ppm")
        .orderBy("cell")
    )


def _qb_oracle() -> str:
    q_cols = ", ".join(
        f"CAST(floor(CAST(embedding[{i + 1}] AS DOUBLE) * 1000000 + 0.5)"
        f" AS BIGINT) AS q{i}"
        for i in range(_QB_DIMS)
    )
    d2_ec = " + ".join(
        f"(e.q{i} - c.q{i}) * (e.q{i} - c.q{i})" for i in range(_QB_DIMS)
    )
    ctes = [f"qv AS (SELECT vec_id, {q_cols} FROM embeddings)"]
    ctes.append("chosen0 AS (SELECT vec_id FROM qv WHERE vec_id = 0)")
    for r in range(1, _QB_ROUNDS + 1):
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
    last = f"chosen{_QB_ROUNDS}"
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f""",
    cents AS (
      SELECT qv.* FROM qv WHERE vec_id IN (SELECT vec_id FROM {last})
    ), assigned AS (
      SELECT vec_id, cell FROM (
        SELECT e.vec_id, c.vec_id AS cell,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY ({d2_ec}), c.vec_id) AS rn
        FROM qv e CROSS JOIN cents c)
      WHERE rn = 1
    ), cells AS (
      SELECT cell, CAST(count(*) AS BIGINT) AS population
      FROM assigned GROUP BY 1
    ), gl AS (
      SELECT CAST(max(population) AS BIGINT) AS max_pop,
             CAST(sum(population) // count(*) AS BIGINT) AS mean_pop,
             CAST((max(population) * 1000000)
                  // (sum(population) // count(*)) AS BIGINT)
               AS straggler_ppm
      FROM cells
    )
    SELECT c.cell, c.population, g.max_pop, g.mean_pop, g.straggler_ppm
    FROM cells c CROSS JOIN gl g
    ORDER BY c.cell
    """
    )


PENDING: tuple[PendingQuery, ...] = (
    PendingQuery(
        "llm_bigram_xent_by_source",
        llm_bigram_xent_by_source_query,
        _XENT_SRC_ORACLE,
        tags=("llm", "lm-eval", "stratified", "micro-nat",
              "integer-exact"),
    ),
    PendingQuery(
        "graph_ktruss_2round",
        graph_ktruss_2round_query,
        _KTRUSS_ORACLE,
        tags=("graph", "ktruss", "peeling", "integer-exact"),
    ),
    PendingQuery(
        "agg_welch_anova",
        agg_welch_anova_query,
        _WELCH_ORACLE,
        tags=("agg", "welch-anova", "heteroscedastic", "exact-double"),
    ),
    PendingQuery(
        "orders_repeat_purchase_decay",
        orders_repeat_purchase_decay_query,
        _rpd_oracle(),
        tags=("orders", "retention", "cohort", "integer-exact"),
    ),
    PendingQuery(
        "sim_quantizer_balance_audit",
        sim_quantizer_balance_audit_query,
        _qb_oracle(),
        tags=("sim", "quantizer", "balance", "ivf", "integer-exact"),
    ),
)

#: documented 1-row / k-row broadcast assemblies (read by
#: tools/plan_audit.py; move to test_plan_hygiene's whitelist at
#: activation): welch = 1-row totals/assembly onto the 5-row group
#: table; quantizer = <=4-row chosen-center broadcasts.
