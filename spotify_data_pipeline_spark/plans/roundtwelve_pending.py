"""Round-12 declared-query staging area (same contract as the
round-6..11 areas: built and oracle-verified NOW, deliberately NOT
declared — the earlier activation windows are fully planned).

Each entry: exact-oracle query + DuckDB SQL, exercised by
``tests/test_roundtwelve_pending.py`` with the driver-shaped
comparison. Families this area opens: resampling-based uncertainty
(the Poisson bootstrap — the scalable bootstrap, made deterministic
and therefore driver-provable), a driver surface for the MERGE
upsert operator (the ``cdc_orders_diff``/``table_diff`` precedent:
an operator long covered by pytest gains an exact-oracle query so the
driver pins its semantics cross-engine), prefix-filtered set-similarity
join (PPJoin — the principled replacement for the df-cap in the naive
sparse join, proven against the naive oracle), and GNN-style message
passing as relational algebra (two sum-aggregation rounds over the
purchase graph, exact integers).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.io import load_table
from spotify_data_pipeline_spark.plans.parity import rnd_cents, rnd_cents_sql


@dataclass(frozen=True)
class PendingQuery:
    name: str
    fn: object
    oracle: str | None
    headline: bool = False
    tags: tuple[str, ...] = ()


def _hex15_fold_sql(h: str) -> str:
    """DuckDB-side positional fold of a 15-hex-digit string to an
    integer (DuckDB has no conv(); the etl_rowset_digest precedent)."""
    return " + ".join(
        f"(strpos('0123456789abcdef', substr({h}, {j + 1}, 1)) - 1)"
        f" * {16 ** (14 - j)}"
        for j in range(15)
    )


# Poisson(1) inverse-CDF thresholds on the md5-15-hex-digit scale
# [0, 16^15): u < _POIS_T[k] -> multiplicity <= k. Computed ONCE
# (floor(CDF_Poisson1(k) * 16^15)) and shared as literals by BOTH
# engine trees, so the resampling distribution is identical by
# construction — no cross-engine libm risk. Multiplicities are capped
# at 6: P(m >= 6) ~ 5.9e-4 folds into the m=6 branch (documented bias
# ~1e-4 of a count unit per row, identical in both engines, zero
# effect on the exactness claim).
_POIS_T = (
    424136118829305344,  # P(0) = e^-1
    848272237658610688,  # P(<=1)
    1060340297073263360,  # P(<=2)
    1131029650211480960,  # P(<=3)
    1148701988496035328,  # P(<=4)
    1152236456152946176,  # P(<=5)
)
_BOOT_B = 32  # replicates


def _pois_case(u: str) -> str:
    """Shared CASE chain u -> Poisson(1) multiplicity (both engines)."""
    whens = " ".join(
        f"WHEN ({u}) < {t} THEN {k}" for k, t in enumerate(_POIS_T)
    )
    return f"CASE {whens} ELSE 6 END"


def agg_bootstrap_ci_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap replicate atoms for mean order revenue — the
    SCALABLE bootstrap (Chamandy et al. 2012, "Estimating uncertainty
    for massive data streams"): classic resampling needs n draws WITH
    replacement per replicate (a global shuffle per replicate, dead at
    100 TB); the Poisson trick gives each row an independent
    Poisson(1) multiplicity per replicate, so all B replicates fall
    out of ONE scan — explode x B, weight, aggregate — with map-side
    partial aggregation collapsing the shuffle to B rows per mapper.
    Made DETERMINISTIC (and therefore exactly oracle-replicable):
    u = int(md5(orderkey ':' b)[:15 hex]) is uniform on [0, 16^15),
    and the multiplicity is the shared literal inverse-CDF CASE chain
    (thresholds floor(CDF_Poisson1(k)*16^15), cap 6 — both engines
    carry the same integers, so the resample is THE SAME resample).
    Output: per-replicate (n_eff, sum_cents) atoms — the exact-integer
    sufficient statistics of each replicate mean; the CI is a discrete
    order statistic over the B means downstream (sqrt/t-tables stay
    out, the ACF discipline). Spark parses hex with conv(); DuckDB
    lacks conv, so the oracle unrolls the 15-digit positional fold.
    At 100 TB: sum(m*cents) over 1e12 rows x 6 x 2^31 cents would
    exceed int64 — the long cast here is sf-appropriate; the operator
    note says lift to DECIMAL(38,0) at that scale (rowset-digest
    precedent)."""
    ords = load_table(spark, sf_dir, "orders")
    u = (
        "CAST(conv(substring(md5(concat(CAST(o_orderkey AS STRING), ':', "
        "CAST(b AS STRING))), 1, 15), 16, 10) AS BIGINT)"
    )
    return (
        ords.select(
            rnd_cents("o_totalprice").alias("cents"),
            "o_orderkey",
            F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
        )
        .withColumn("m", F.expr(_pois_case(u)))
        .groupBy(F.col("b").cast("long").alias("replicate"))
        .agg(
            F.sum("m").cast("long").alias("n_eff"),
            F.sum(F.col("m") * F.col("cents")).cast("long").alias("sum_cents"),
        )
        .orderBy("replicate")
    )


def _bootstrap_oracle() -> str:
    fold = _hex15_fold_sql("h")
    cents = rnd_cents_sql("o_totalprice")
    return f"""
    WITH fan AS (
      SELECT o_orderkey, {cents} AS cents, t.b AS b
      FROM orders CROSS JOIN (SELECT unnest(range(0, {_BOOT_B})) AS b) t
    ), hashed AS (
      SELECT cents, b, md5(concat(o_orderkey, ':', b))[1:15] AS h FROM fan
    ), mult AS (
      SELECT cents, b, {_pois_case(fold)} AS m FROM hashed
    )
    SELECT CAST(b AS BIGINT) AS replicate,
           CAST(sum(m) AS BIGINT) AS n_eff,
           CAST(sum(m * cents) AS BIGINT) AS sum_cents
    FROM mult GROUP BY 1 ORDER BY 1
    """


def etl_merge_upsert_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver surface for ``operators/upsert.merge_upsert`` (the
    anti-join + union MERGE rewrite, pytest-covered since round 1 —
    the ``cdc_orders_diff`` precedent applied: give the operator an
    exact-oracle query so the driver pins its semantics). A
    deterministic changeset is derived from orders itself: keys
    % 3 == 0 get an UPDATE (status 'U', price + 10.00 — the float add
    happens identically in both engines before the shared cents
    rounding), keys % 5 == 0 spawn an INSERT at the guaranteed-absent
    key -(o_orderkey + 1) (status 'N'; strictly negative — orderkey 0
    EXISTS in this testdata, so a plain -o_orderkey insert would
    collide with the real key 0 and with its own 'U' row, found by
    the category-accounting test); MERGE = unmatched target rows pass
    through, matched rows are replaced, inserts append. The output
    pins the ENTIRE merged bag, not a sample: per-status row counts,
    exact cent sums, and the order-insensitive rowset digest (sum of
    60-bit md5 prefixes over orderkey|cents|status, DECIMAL(38,0) /
    HUGEINT, compared as digit strings — the etl_rowset_digest
    machinery reused). The oracle restates MERGE as NOT EXISTS + UNION
    ALL. Scale: ONE shuffle on the merge key for the anti-join (both
    sides prunable when the target is date-partitioned and the
    changeset carries partition predicates), map-side partial agg for
    the digest — the 100 TB upsert shape."""
    from spotify_data_pipeline_spark.operators.upsert import merge_upsert

    ords = load_table(spark, sf_dir, "orders")
    upd_mod = ords.where(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") + F.lit(10.0)).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )
    upd_ins = ords.where(F.col("o_orderkey") % 5 == 0).select(
        (-(F.col("o_orderkey") + 1)).alias("o_orderkey"),
        "o_custkey",
        F.lit("N").alias("o_orderstatus"),
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    )
    merged = merge_upsert(
        ords.select(*upd_mod.columns),
        upd_mod.unionByName(upd_ins),
        ["o_orderkey"],
    )
    return (
        merged.select(
            F.col("o_orderstatus").alias("status"),
            rnd_cents("o_totalprice").alias("cents"),
            "o_orderkey",
        )
        .withColumn(
            "rh",
            F.expr(
                "CAST(conv(substring(md5(concat_ws('|', o_orderkey, cents,"
                " status)), 1, 15), 16, 10) AS DECIMAL(38,0))"
            ),
        )
        .groupBy("status")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("cents").cast("long").alias("sum_cents"),
            F.sum("rh").cast("decimal(38,0)").cast("string").alias("digest"),
        )
        .orderBy("status")
    )


def _merge_upsert_oracle() -> str:
    fold = _hex15_fold_sql("h")
    cents = rnd_cents_sql("o_totalprice")
    upd_cents = rnd_cents_sql("o_totalprice + 10.0")
    return f"""
    WITH upd AS (
      SELECT o_orderkey, 'U' AS status, {upd_cents} AS cents
      FROM orders WHERE o_orderkey % 3 = 0
      UNION ALL
      SELECT -(o_orderkey + 1), 'N', {cents}
      FROM orders WHERE o_orderkey % 5 = 0
    ), keep AS (
      SELECT o.o_orderkey, o.o_orderstatus AS status, {cents} AS cents
      FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.o_orderkey = o.o_orderkey)
    ), merged AS (
      SELECT * FROM keep UNION ALL SELECT * FROM upd
    ), hashed AS (
      SELECT status, cents,
             md5(concat_ws('|', o_orderkey, cents, status)) AS h
      FROM merged
    )
    SELECT status,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(cents) AS BIGINT) AS sum_cents,
           CAST(sum(CAST({fold} AS HUGEINT)) AS VARCHAR) AS digest
    FROM hashed GROUP BY 1 ORDER BY 1
    """


def dedup_ppjoin_prefix_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard >= 3/5 self-join via PREFIX FILTERING
    (``operators/ppjoin.py`` — All-Pairs/PPJoin, Bayardo WWW'07 / Xiao
    WWW'08): candidates only from each doc's rarest
    ``s - ceil(tau*s) + 1`` shingles under one global (df, hash) order,
    then exact full-set verification per candidate. The oracle is the
    NAIVE join — every pair sharing ANY shingle, no prefix, no
    document-frequency cap — so the hash match proves the prefix
    filter's zero-recall-loss claim on real data (the
    optimized-vs-naive pattern: bloom / inverted-index / salted-join
    precedents). This is the principled replacement for
    ``dedup_ngram_jaccard``'s df cap: rare-first prefixes keep
    stopword shingles out of the candidate join BY CONSTRUCTION, and
    the verified result is exact with no lower-bound caveat. All
    thresholds cross-multiplied integers (tau as the rational 3/5);
    jaccard in exact ppm. At 100 TB the candidate join sees only the
    rarest ~40% of each posting list and the verification payload is
    one bounded array per doc — the pair list never materializes
    un-verified."""
    from spotify_data_pipeline_spark.operators.ppjoin import (
        prefix_filter_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    return prefix_filter_pairs(
        docs, id_col="doc_id", text_col="text", shingle_k=3,
        tau_num=3, tau_den=5,
    ).orderBy("id_a", "id_b")


_PPJOIN_ORACLE = """
    WITH t AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
      FROM documents WHERE length(trim(text)) > 0
    ), s AS (
      SELECT doc_id, unnest(
        CASE WHEN len(toks) >= 3
             THEN list_distinct(list_transform(range(1, len(toks) - 1),
                                               i -> array_to_string(toks[i:i+2], ' ')))
             ELSE [array_to_string(toks, ' ')] END) AS sh
      FROM t
    ), sz AS (
      SELECT doc_id, count(*) AS n_sh FROM s GROUP BY 1
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
      FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           CAST(n_common AS BIGINT) AS n_common,
           CAST(za.n_sh AS BIGINT) AS n_a,
           CAST(zb.n_sh AS BIGINT) AS n_b,
           CAST(n_common * 1000000 // (za.n_sh + zb.n_sh - n_common)
                AS BIGINT) AS jaccard_ppm
    FROM inter JOIN sz za ON inter.id_a = za.doc_id
               JOIN sz zb ON inter.id_b = zb.doc_id
    WHERE n_common * 8 >= 3 * (za.n_sh + zb.n_sh)
    ORDER BY 1, 2
"""


def graph_feature_propagation_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GNN-style message passing as relational algebra — two rounds of
    SUM aggregation over the bipartite customer→supplier purchase
    graph (sum, not mean: the GIN insight — Xu et al. ICLR'19 — that
    sum aggregation is the most expressive multiset aggregator, and
    here also the EXACT one: pure BIGINT, no floor-division tiebreaks
    at all). Round 1: each supplier aggregates its customers' account
    balances (exact cents, negatives included — the shared
    floor(x*100+0.5) rounds identically in both engines); round 2:
    each customer aggregates its suppliers' round-1 features. Each
    round is one equi join + one hash agg — the message-passing
    primitive every GraphSAGE/GIN featurization pipeline runs before
    training, expressed so Catalyst plans it (no vertex-program
    framework needed). Output: per-market-segment count / sum / min /
    max of the round-2 feature — bounded (5 rows), pins every
    customer's propagated value through the sum and the extremes.
    Scale: the distinct edge list is built once and feeds BOTH rounds
    — at 100 TB persist/checkpoint it so the orders⋈lineitem distinct
    doesn't run twice; magnitudes reach ~1e17 at sf0.1-like densities
    (documented: lift sums to DECIMAL(38,0) at cluster scale)."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", rnd_cents("c_acctbal").alias("f0")
    )
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    r1 = (
        edges.join(cust, edges.o_custkey == cust.c_custkey)
        .groupBy("l_suppkey")
        .agg(F.sum("f0").alias("s_sum"))
    )
    r2 = (
        edges.join(r1, "l_suppkey")
        .groupBy("o_custkey")
        .agg(F.sum("s_sum").alias("f2"))
    )
    return (
        r2.join(cust, r2.o_custkey == cust.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.sum("f2").cast("long").alias("sum_f2"),
            F.min("f2").cast("long").alias("min_f2"),
            F.max("f2").cast("long").alias("max_f2"),
        )
        .orderBy("segment")
    )


def _feature_prop_oracle() -> str:
    cents = rnd_cents_sql("c_acctbal")
    return f"""
    WITH edges AS (
      SELECT DISTINCT o_custkey AS c, l_suppkey AS s
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ), f0 AS (
      SELECT c_custkey, c_mktsegment, {cents} AS f FROM customer
    ), r1 AS (
      SELECT e.s, sum(f0.f) AS s_sum
      FROM edges e JOIN f0 ON e.c = f0.c_custkey GROUP BY 1
    ), r2 AS (
      SELECT e.c, sum(r1.s_sum) AS f2
      FROM edges e JOIN r1 ON e.s = r1.s GROUP BY 1
    )
    SELECT f0.c_mktsegment AS segment,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(f2) AS BIGINT) AS sum_f2,
           CAST(min(f2) AS BIGINT) AS min_f2,
           CAST(max(f2) AS BIGINT) AS max_f2
    FROM r2 JOIN f0 ON r2.c = f0.c_custkey
    GROUP BY 1 ORDER BY 1
    """


# static column model per table (fixture schemas; int32 columns are 4,
# int64/double/timestamp 8 — regenerated testdata with new columns
# surfaces as a hash mismatch here, exactly what a planning query
# should notice). Format: (fixed_row_bytes, [string cols]).
_ADVICE_COLS = {
    "lineitem": (8 * 4 + 8 * 4 + 8, ["l_returnflag", "l_linestatus"]),
    "orders": (8 * 2 + 8 + 8, ["o_orderstatus", "o_orderpriority"]),
    "supplier": (8 + 4 + 8, ["s_name"]),
    "part": (8 + 4 + 8, ["p_name", "p_brand", "p_type"]),
    "customer": (8 + 4 + 8, ["c_name", "c_mktsegment"]),
    "nation": (4 + 4, ["n_name"]),
    "region": (4, ["r_name"]),
}

# candidate joins the advisor rules on: (fact, fact_key, dim)
_ADVICE_JOINS = (
    ("lineitem", "l_suppkey", "supplier"),
    ("lineitem", "l_partkey", "part"),
    ("lineitem", "l_orderkey", "orders"),
    ("orders", "o_custkey", "customer"),
    ("nation", "n_regionkey", "region"),
)
_ADVICE_BCAST_RATIO = 64  # broadcast when dim_bytes * 64 <= fact_bytes
_ADVICE_SHUFFLE_K = 200  # assumed reduce-task count for the salt rule

_ADVICE_CASE = (
    f"CASE WHEN dim_bytes * {_ADVICE_BCAST_RATIO} <= fact_bytes"
    " THEN 'broadcast'"
    " WHEN salt_factor > 1 THEN 'smj_salted'"
    " ELSE 'smj' END"
)


def ops_join_strategy_advice_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine choosing its own join strategies — the fourth
    self-diagnosis query (skew shares, self-join cardinality,
    partition planning, now join planning): for each candidate
    fact⋈dim join, the exact in-memory byte estimates (the
    ops_partition_plan width model), the fact side's hottest-key row
    count, the ceil salt factor the skew report prescribes
    (ceil(max_cnt·K/total), K=200 reduce tasks), and the decision the
    three proven devices imply — broadcast when the dim is
    relatively tiny (dim_bytes·64 ≤ fact_bytes: a RELATIVE rule so the
    advisor is scale-free and every branch is data-exercised at every
    SF — a fixed 10 MiB threshold is what production uses but it
    degenerates to all-broadcast on test fixtures), salted sort-merge
    (operators/saltjoin.py) when the hot key would straggle, plain
    sort-merge otherwise. All integer arithmetic over three 1-row
    aggregates per candidate (dim stats × fact stats × key histogram
    max — 1-row broadcast cross joins, the documented whitelisted
    pattern). At 100 TB these are the numbers you compute BEFORE the
    join job: the advisor's output literally parameterizes
    broadcast()/salted_equi_join calls. On this synthetic data the
    salt rule fires on nation⋈region (5 rows per region key of 25 —
    a 20% share IS a straggler in share terms), which is the honest
    behavior of a share-based trigger on fixed-size dims; lineitem
    and orders keys are near-uniform so their joins stay unsalted."""
    frames = []
    for fact, key, dim in _ADVICE_JOINS:
        f_fixed, f_strs = _ADVICE_COLS[fact]
        d_fixed, d_strs = _ADVICE_COLS[dim]
        fdf = load_table(spark, sf_dir, fact)
        ddf = load_table(spark, sf_dir, dim)
        f_bytes = sum(
            (F.sum(F.length(F.col(c)).cast("long")) for c in f_strs),
            F.count("*") * f_fixed,
        )
        d_bytes = sum(
            (F.sum(F.length(F.col(c)).cast("long")) for c in d_strs),
            F.count("*") * d_fixed,
        )
        f_stats = fdf.agg(
            F.count("*").cast("long").alias("fact_rows"),
            f_bytes.cast("long").alias("fact_bytes"),
        )
        d_stats = ddf.agg(
            F.count("*").cast("long").alias("dim_rows"),
            d_bytes.cast("long").alias("dim_bytes"),
        )
        hist = (
            fdf.groupBy(key)
            .agg(F.count("*").alias("_c"))
            .agg(F.max("_c").cast("long").alias("max_key_rows"))
        )
        frames.append(
            f_stats.crossJoin(F.broadcast(d_stats))
            .crossJoin(F.broadcast(hist))
            .select(
                F.lit(fact).alias("fact_table"),
                F.lit(dim).alias("dim_table"),
                "fact_rows",
                "fact_bytes",
                "dim_rows",
                "dim_bytes",
                "max_key_rows",
                F.expr(
                    f"CAST((max_key_rows * {_ADVICE_SHUFFLE_K} + fact_rows"
                    " - 1) DIV fact_rows AS BIGINT)"
                ).alias("salt_factor"),
            )
            .withColumn("strategy", F.expr(_ADVICE_CASE))
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionAll(f)
    return out.orderBy("fact_table", "dim_table")


def _join_advice_oracle() -> str:
    parts = []
    for fact, key, dim in _ADVICE_JOINS:
        f_fixed, f_strs = _ADVICE_COLS[fact]
        d_fixed, d_strs = _ADVICE_COLS[dim]
        f_b = " + ".join(
            [f"count(*) * {f_fixed}"] + [f"sum(length({c}))" for c in f_strs]
        )
        d_b = " + ".join(
            [f"count(*) * {d_fixed}"] + [f"sum(length({c}))" for c in d_strs]
        )
        parts.append(f"""
    SELECT '{fact}' AS fact_table, '{dim}' AS dim_table,
           fact_rows, fact_bytes, dim_rows, dim_bytes, max_key_rows,
           CAST((max_key_rows * {_ADVICE_SHUFFLE_K} + fact_rows - 1)
                // fact_rows AS BIGINT) AS salt_factor,
           {_ADVICE_CASE} AS strategy
    FROM (SELECT CAST(count(*) AS BIGINT) AS fact_rows,
                 CAST({f_b} AS BIGINT) AS fact_bytes FROM {fact}) f
    CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS dim_rows,
                       CAST({d_b} AS BIGINT) AS dim_bytes FROM {dim}) d
    CROSS JOIN (SELECT CAST(max(_c) AS BIGINT) AS max_key_rows FROM
                (SELECT count(*) AS _c FROM {fact} GROUP BY {key})) h
""")
    return " UNION ALL ".join(parts) + " ORDER BY fact_table, dim_table"


_RECALL_NPROBES = (1, 2, 3)


def sim_ivf_recall_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine measuring its own ANN quality, driver-proven: exact
    recall@5 of the FIXED-quantizer IVF serving path
    (sim_ann_ivf_fixed's machinery — deterministic literal centroids,
    argmax cell assignment, nprobe probing, 4dp re-rank) against the
    brute-force exact top-k (sim_cosine_topk's machinery), at
    nprobe = 1, 2, 3. Both branches reuse ALREADY-DRIVER-PROVEN
    arithmetic, so the recall table's oracle is the composition of
    the proofs (the sim_rrf_fusion precedent) — the first
    APPROXIMATION-QUALITY metric the driver hash-checks end to end
    (the KMV estimator precedent, applied to ANN). Output: one row
    per nprobe with hit/total counts and exact-ppm recall — the
    recall-vs-cost curve every IVF deployment reads before choosing
    nprobe. At 100 TB the brute branch restricts to the bounded probe
    set (10 queries — an evaluation sample, not the corpus), so the
    whole evaluation is corpus-scan-bounded: this is how you audit a
    deployed ANN index without trusting it."""
    from spotify_data_pipeline_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_ivf,
    )
    from spotify_data_pipeline_spark.plans.similarity_queries import (
        _fixed_ivf_centroids,
        _IVF_CELLS,
        _N_QUERY_VECS,
        _TOP_K,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < _N_QUERY_VECS)
    cent = spark.createDataFrame(
        [(cid, c) for cid, c in enumerate(_fixed_ivf_centroids())],
        schema="_cid INT, _centroid ARRAY<DOUBLE>",
    )
    brute = cosine_topk_bruteforce(queries, emb, k=_TOP_K).select(
        "query_id", "neighbor_id"
    )
    total = brute.agg(F.count("*").cast("long").alias("n_brute"))
    frames = []
    for np_ in _RECALL_NPROBES:
        ivf = cosine_topk_ivf(
            queries, emb, k=_TOP_K, n_cells=_IVF_CELLS, nprobe=np_,
            centroids=cent,
        ).select("query_id", "neighbor_id")
        hits = ivf.join(brute, ["query_id", "neighbor_id"]).agg(
            F.count("*").cast("long").alias("n_hits")
        )
        frames.append(
            hits.crossJoin(F.broadcast(total)).select(
                F.lit(np_).cast("long").alias("nprobe"),
                "n_hits",
                "n_brute",
                F.expr(
                    "CAST(n_hits * 1000000 DIV n_brute AS BIGINT)"
                ).alias("recall_ppm"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionAll(f)
    return out.orderBy("nprobe")


def _ivf_recall_oracle() -> str:
    from spotify_data_pipeline_spark.plans.similarity_queries import (
        _fixed_ivf_centroids,
        _N_QUERY_VECS,
        _TOP_K,
    )

    values = ",\n      ".join(
        f"({cid}, CAST([{', '.join(repr(x) for x in c)}] AS DOUBLE[]))"
        for cid, c in enumerate(_fixed_ivf_centroids())
    )
    ivf_ctes, rows = [], []
    for np_ in _RECALL_NPROBES:
        ivf_ctes.append(f"""
    ivf{np_} AS (
      SELECT query_id, neighbor_id FROM (
        SELECT p.query_id, a.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY p.query_id
                 ORDER BY floor(list_dot_product(p.qe, a.e)
                   / (sqrt(list_dot_product(p.qe, p.qe))
                    * sqrt(list_dot_product(a.e, a.e))) * 10000 + 0.5)
                   / 10000 DESC, a.vec_id ASC) AS rn
        FROM probes p JOIN assign a
          ON p.cid = a.cid AND p.query_id <> a.vec_id
        WHERE p.prn <= {np_}
      ) WHERE rn <= {_TOP_K}
    )""")
        rows.append(f"""
    SELECT CAST({np_} AS BIGINT) AS nprobe,
           (SELECT count(*) FROM ivf{np_} i JOIN brute b
              ON i.query_id = b.query_id
             AND i.neighbor_id = b.neighbor_id) AS n_hits,
           (SELECT count(*) FROM brute) AS n_brute,
           CAST((SELECT count(*) FROM ivf{np_} i JOIN brute b
                   ON i.query_id = b.query_id
                  AND i.neighbor_id = b.neighbor_id) * 1000000
                // (SELECT count(*) FROM brute) AS BIGINT) AS recall_ppm
""")
    return f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    cent AS (SELECT * FROM (VALUES
      {values}
    ) AS t(cid, c)),
    scored AS (
      SELECT v.vec_id, v.e, cent.cid,
             list_dot_product(v.e, cent.c)
               / (sqrt(list_dot_product(v.e, v.e))
                * sqrt(list_dot_product(cent.c, cent.c))) AS ccos
      FROM v CROSS JOIN cent
    ),
    assign AS (
      SELECT vec_id, e, cid FROM (
        SELECT vec_id, e, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY ccos DESC, cid ASC) AS rn
        FROM scored) WHERE rn = 1
    ),
    probes AS (
      SELECT vec_id AS query_id, e AS qe, cid, prn FROM (
        SELECT vec_id, e, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY ccos DESC, cid ASC) AS prn
        FROM scored WHERE vec_id < {_N_QUERY_VECS})
      WHERE prn <= {max(_RECALL_NPROBES)}
    ),
    brute AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY floor(list_dot_product(q.e, c.e)
                   / (sqrt(list_dot_product(q.e, q.e))
                    * sqrt(list_dot_product(c.e, c.e))) * 10000 + 0.5)
                   / 10000 DESC, c.vec_id ASC) AS rn
        FROM v q JOIN v c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < {_N_QUERY_VECS}
      ) WHERE rn <= {_TOP_K}
    ),
    {",".join(ivf_ctes)}
    {" UNION ALL ".join(rows)}
    ORDER BY nprobe
    """


PENDING: tuple[PendingQuery, ...] = (
    PendingQuery(
        "agg_bootstrap_ci",
        agg_bootstrap_ci_query,
        _bootstrap_oracle(),
        tags=("aggregate", "bootstrap", "uncertainty", "resampling",
              "integer-exact"),
    ),
    PendingQuery(
        "etl_merge_upsert",
        etl_merge_upsert_query,
        _merge_upsert_oracle(),
        tags=("etl", "merge", "upsert", "digest", "integer-exact"),
    ),
    PendingQuery(
        "dedup_ppjoin_prefix",
        dedup_ppjoin_prefix_query,
        _PPJOIN_ORACLE,
        tags=("dedup", "jaccard", "prefix-filter", "optimized-vs-naive",
              "integer-exact"),
    ),
    PendingQuery(
        "graph_feature_propagation",
        graph_feature_propagation_query,
        _feature_prop_oracle(),
        tags=("graph", "message-passing", "gnn", "integer-exact"),
    ),
    PendingQuery(
        "ops_join_strategy_advice",
        ops_join_strategy_advice_query,
        _join_advice_oracle(),
        tags=("ops", "self-tuning", "join-planning", "integer-exact"),
    ),
    PendingQuery(
        "sim_ivf_recall",
        sim_ivf_recall_query,
        _ivf_recall_oracle(),
        tags=("similarity", "ivf", "recall", "evaluation"),
    ),
)
