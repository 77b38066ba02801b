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


def ml_ols_cramer_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT multiple linear regression — OLS with two features plus
    intercept, solved by Cramer's rule over the normal equations, all
    in integer arithmetic: the exact-relational-ML family (naive
    Bayes, 1R stump, depth-2 tree, kNN, exact k-means) gains its
    REGRESSION member. Features are integral by data construction
    (quantity 1..50; discount·100 ∈ 0..10 — integrality measured, and
    the shared floor(x·100+0.5) makes the cast exact); the target is
    revenue cents. The six normal-equation sums are one hash agg
    (BIGINT — max ~3e14 at sf0.1); the four 3×3 determinants (system +
    one numerator per coefficient) expand by cofactors in
    DECIMAL(38,0)/HUGEINT (triple products reach ~5e28 here; at
    1e12-row scale they exceed DECIMAL38 — center/rescale features
    first, documented) and compare as digit STRINGS (agg_decimal_exact
    precedent). β_j = num_j / det as an exact rational; sqrt/variance
    stay out (the ACF discipline) and any engine can divide
    downstream. One scan, one 1-row aggregate, zero joins — the
    100 TB shape of closed-form linear models: sufficient statistics
    shrink to O(features²) no matter the row count."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_quantity").cast("long").alias("x1"),
        rnd_cents("l_discount").alias("x2"),  # 0..10, exact
        rnd_cents("l_extendedprice").alias("y"),
    )
    sums = base.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x1").cast("long").alias("s1"),
        F.sum("x2").cast("long").alias("s2"),
        F.sum(F.col("x1") * F.col("x1")).cast("long").alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).cast("long").alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).cast("long").alias("s22"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x1") * F.col("y")).cast("long").alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).cast("long").alias("s2y"),
    )

    # cofactor expansion; every term a product of three DECIMAL38
    # casts so both engines carry the same exact-integer tree
    def det3_sql(m):
        (a, b, c), (d, e, f_), (g, h, i) = m
        D = lambda x: f"CAST({x} AS DECIMAL(38,0))"
        return (
            f"{D(a)}*{D(e)}*{D(i)} - {D(a)}*{D(f_)}*{D(h)}"
            f" - {D(b)}*{D(d)}*{D(i)} + {D(b)}*{D(f_)}*{D(g)}"
            f" + {D(c)}*{D(d)}*{D(h)} - {D(c)}*{D(e)}*{D(g)}"
        )

    S = [["n", "s1", "s2"], ["s1", "s11", "s12"], ["s2", "s12", "s22"]]
    b = ["sy", "s1y", "s2y"]
    exprs = {"det_s": det3_sql(S)}
    for j, name in enumerate(["num_b0", "num_b1", "num_b2"]):
        M = [row.copy() for row in S]
        for r in range(3):
            M[r][j] = b[r]
        exprs[name] = det3_sql(M)
    return sums.select(
        "n",
        *[
            F.expr(e).cast("decimal(38,0)").cast("string").alias(k)
            for k, e in exprs.items()
        ],
    )


def _ols_cramer_oracle() -> str:
    cents_d = rnd_cents_sql("l_discount")
    cents_y = rnd_cents_sql("l_extendedprice")

    def det3_sql(m):
        (a, b, c), (d, e, f_), (g, h, i) = m
        D = lambda x: f"CAST({x} AS HUGEINT)"
        return (
            f"{D(a)}*{D(e)}*{D(i)} - {D(a)}*{D(f_)}*{D(h)}"
            f" - {D(b)}*{D(d)}*{D(i)} + {D(b)}*{D(f_)}*{D(g)}"
            f" + {D(c)}*{D(d)}*{D(h)} - {D(c)}*{D(e)}*{D(g)}"
        )

    S = [["n", "s1", "s2"], ["s1", "s11", "s12"], ["s2", "s12", "s22"]]
    b = ["sy", "s1y", "s2y"]
    cols = [f"CAST({det3_sql(S)} AS VARCHAR) AS det_s"]
    for j, name in enumerate(["num_b0", "num_b1", "num_b2"]):
        M = [row.copy() for row in S]
        for r in range(3):
            M[r][j] = b[r]
        cols.append(f"CAST({det3_sql(M)} AS VARCHAR) AS {name}")
    col_sql = ",\n           ".join(cols)
    return f"""
    WITH base AS (
      SELECT CAST(l_quantity AS BIGINT) AS x1,
             {cents_d} AS x2,
             {cents_y} AS y
      FROM lineitem
    ), sums AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x1) AS BIGINT) AS s1,
             CAST(sum(x2) AS BIGINT) AS s2,
             CAST(sum(x1 * x1) AS BIGINT) AS s11,
             CAST(sum(x1 * x2) AS BIGINT) AS s12,
             CAST(sum(x2 * x2) AS BIGINT) AS s22,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x1 * y) AS BIGINT) AS s1y,
             CAST(sum(x2 * y) AS BIGINT) AS s2y
      FROM base
    )
    SELECT n,
           {col_sql}
    FROM sums
    """


def events_simpson_diversity_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day event-mix diversity WITHOUT logarithms: Shannon entropy
    is the textbook diversity metric but ln() is not bit-reproducible
    across engines — the Gini–Simpson family is, because it is pure
    rational arithmetic. Per day: the unbiased Simpson concentration
    λ = Σ n_t(n_t−1) / (N(N−1)) in exact ppm (probability two random
    events drawn without replacement share a type — 1−λ is the
    diversity), and Berger–Parker dominance max(n_t)/N in exact ppm.
    The observability shape for event-mix drift: a day whose λ jumps
    is a day one event type flooded the stream. One scan, two hash
    aggs, a calendar-bounded output (≤31 rows at every SF — events
    span January, measured). Cross-multiplied integer DIV only; the
    one-event-day edge (N=1, λ undefined) emits NULL via the explicit
    N>1 guard in both engines rather than a division fault."""
    ev = load_table(spark, sf_dir, "events")
    per_type = (
        ev.select(F.to_date("ts").alias("day"), "event_type")
        .groupBy("day", "event_type")
        .agg(F.count("*").alias("c"))
    )
    return (
        per_type.groupBy("day")
        .agg(
            F.sum("c").cast("long").alias("n_events"),
            F.count("*").cast("long").alias("n_types"),
            F.sum(F.col("c") * (F.col("c") - 1)).cast("long").alias("_pairs"),
            F.max("c").cast("long").alias("_maxc"),
        )
        .select(
            F.col("day").cast("string").alias("day"),
            "n_events",
            "n_types",
            F.expr(
                "CAST(CASE WHEN n_events > 1 THEN _pairs * 1000000"
                " DIV (n_events * (n_events - 1)) END AS BIGINT)"
            ).alias("simpson_ppm"),
            F.expr(
                "CAST(_maxc * 1000000 DIV n_events AS BIGINT)"
            ).alias("dominance_ppm"),
        )
        .orderBy("day")
    )


_SIMPSON_ORACLE = """
    WITH per_type AS (
      SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS c
      FROM events GROUP BY 1, 2
    ), agg AS (
      SELECT day,
             CAST(sum(c) AS BIGINT) AS n_events,
             CAST(count(*) AS BIGINT) AS n_types,
             CAST(sum(c * (c - 1)) AS BIGINT) AS pairs,
             CAST(max(c) AS BIGINT) AS maxc
      FROM per_type GROUP BY 1
    )
    SELECT CAST(day AS VARCHAR) AS day, n_events, n_types,
           CAST(CASE WHEN n_events > 1
                THEN pairs * 1000000 // (n_events * (n_events - 1))
                END AS BIGINT) AS simpson_ppm,
           CAST(maxc * 1000000 // n_events AS BIGINT) AS dominance_ppm
    FROM agg ORDER BY day
"""


def events_bootstrap_user_mean_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLUSTER bootstrap — the methodological completion of
    ``agg_bootstrap_ci``: events within a user are correlated, so
    resampling EVENTS underestimates the variance of any per-user
    metric (the classic block/cluster correction — resample USERS,
    and every event inherits its user's multiplicity). Deterministic
    Poisson multiplicities keyed by md5(user_id ':' b) with the same
    shared literal inverse-CDF chain; per replicate the exact-integer
    sufficient statistics of mean purchase value under user
    resampling: Σ m_u (effective users), Σ m_u·k_u (effective
    purchases) and Σ m_u·cents_u — the ratio estimator's numerator
    and denominator, division left downstream (ACF discipline). The
    per-user rollup happens BEFORE the ×B fan-out, so the explode
    multiplies a |users|-sized frame, not the event log — the shape
    that matters at 100 TB where events ≫ users."""
    ev = load_table(spark, sf_dir, "events")
    per_user = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("k"),
            F.sum(rnd_cents("value")).cast("long").alias("cents"),
        )
    )
    u = (
        "CAST(conv(substring(md5(concat(CAST(user_id AS STRING), ':', "
        "CAST(b AS STRING))), 1, 15), 16, 10) AS BIGINT)"
    )
    return (
        per_user.select(
            "user_id", "k", "cents",
            F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
        )
        .withColumn("m", F.expr(_pois_case(u)))
        .groupBy(F.col("b").cast("long").alias("replicate"))
        .agg(
            F.sum("m").cast("long").alias("n_users_eff"),
            F.sum(F.col("m") * F.col("k")).cast("long").alias("n_purchases_eff"),
            F.sum(F.col("m") * F.col("cents")).cast("long").alias("sum_cents"),
        )
        .orderBy("replicate")
    )


def _bootstrap_user_oracle() -> str:
    fold = _hex15_fold_sql("h")
    cents = rnd_cents_sql("value")
    return f"""
    WITH per_user AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS k,
             CAST(sum({cents}) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ), fan AS (
      SELECT user_id, k, cents, t.b AS b
      FROM per_user CROSS JOIN (SELECT unnest(range(0, {_BOOT_B})) AS b) t
    ), hashed AS (
      SELECT k, cents, b, md5(concat(user_id, ':', b))[1:15] AS h FROM fan
    ), mult AS (
      SELECT k, cents, b, {_pois_case(fold)} AS m FROM hashed
    )
    SELECT CAST(b AS BIGINT) AS replicate,
           CAST(sum(m) AS BIGINT) AS n_users_eff,
           CAST(sum(m * k) AS BIGINT) AS n_purchases_eff,
           CAST(sum(m * cents) AS BIGINT) AS sum_cents
    FROM mult GROUP BY 1 ORDER BY 1
    """


# z_{alpha/2} + z_beta for alpha=5%, power=80%, in exact ppm — a shared
# literal (1.959964 + 0.841621), so both engines square the same integer
_POWER_Z_PPM = 2801585
_POWER_MDE_DIV = 20  # minimum detectable effect = mean / 20 (5%)


def events_ab_power_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B test POWER PLANNING — the experimentation family's missing
    front end (SRM admission → Welch t → CUPED → now: how many users
    does the next test need?): required per-arm sample size
    n_req = ceil(2·(z_α/2+z_β)²·σ² / δ²) for the per-user purchase
    value metric, δ = 5% of the observed mean. Every quantity is an
    exact integer: z enters as the shared ppm literal 2801585 (both
    engines square the same integer — no normal-quantile libm), σ²
    and δ² stay UNDIVIDED rationals, and the whole formula
    cross-multiplies into one DECIMAL(38,0)/HUGEINT ceil-division:
    n_req = ceil(800·Z²·n·(n·Σx² − S²) / ((n−1)·S²·10¹²)) — numerator
    ~1e35 at sf0.1, inside both engines' 38-digit range (the
    magnitude audit is in the staging notes). Output: the sufficient
    statistics, n_req, and the decision bit n ≥ n_req. One scan, one
    1-row aggregate, zero joins — power analysis over 100 TB of
    events is O(1) state."""
    ev = load_table(spark, sf_dir, "events")
    per_user = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum(rnd_cents("value")).cast("long").alias("x"))
    )
    sums = per_user.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("ss"),
    )
    z2 = _POWER_Z_PPM * _POWER_Z_PPM
    mde2 = _POWER_MDE_DIV * _POWER_MDE_DIV
    num = (
        f"CAST(2 * {mde2} AS DECIMAL(38,0)) * CAST({z2} AS DECIMAL(38,0))"
        " * CAST(n AS DECIMAL(38,0))"
        " * (CAST(n AS DECIMAL(38,0)) * CAST(ss AS DECIMAL(38,0))"
        "    - CAST(s AS DECIMAL(38,0)) * CAST(s AS DECIMAL(38,0)))"
    )
    den = (
        "(CAST(n AS DECIMAL(38,0)) - 1)"
        " * CAST(s AS DECIMAL(38,0)) * CAST(s AS DECIMAL(38,0))"
        " * CAST(1000000000000 AS DECIMAL(38,0))"
    )
    return sums.select(
        "n",
        "s",
        "ss",
        F.expr(f"CAST((({num}) + ({den}) - 1) DIV ({den}) AS BIGINT)").alias(
            "n_req"
        ),
    ).select(
        "n", "s", "ss", "n_req",
        F.expr("CAST(CASE WHEN n >= n_req THEN 1 ELSE 0 END AS BIGINT)").alias(
            "sufficient"
        ),
    )


def _ab_power_oracle() -> str:
    cents = rnd_cents_sql("value")
    z2 = _POWER_Z_PPM * _POWER_Z_PPM
    mde2 = _POWER_MDE_DIV * _POWER_MDE_DIV
    num = (
        f"CAST(2 * {mde2} AS HUGEINT) * CAST({z2} AS HUGEINT)"
        " * CAST(n AS HUGEINT)"
        " * (CAST(n AS HUGEINT) * CAST(ss AS HUGEINT)"
        "    - CAST(s AS HUGEINT) * CAST(s AS HUGEINT))"
    )
    den = (
        "(CAST(n AS HUGEINT) - 1)"
        " * CAST(s AS HUGEINT) * CAST(s AS HUGEINT)"
        " * CAST(1000000000000 AS HUGEINT)"
    )
    return f"""
    WITH per_user AS (
      SELECT user_id, CAST(sum({cents}) AS BIGINT) AS x
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ), sums AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS s,
             CAST(sum(x * x) AS BIGINT) AS ss
      FROM per_user
    )
    SELECT n, s, ss,
           CAST((({num}) + ({den}) - 1) // ({den}) AS BIGINT) AS n_req,
           CAST(CASE WHEN CAST(n AS HUGEINT)
                  >= (({num}) + ({den}) - 1) // ({den})
                THEN 1 ELSE 0 END AS BIGINT) AS sufficient
    FROM sums
    """


def text_lexical_richness_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-linguistics profile per source, all integer-exact: token
    count, type (distinct-term) count, type-token ratio in ppm, hapax
    legomena (terms occurring ONCE in the source) and their share of
    the vocabulary — the classic lexical-richness axes (TTR, hapax
    share) that complement the staged Heaps-law and burstiness
    queries: TTR says how repetitive a source is, hapax share says how
    heavy its one-off tail is (the signal that drives vocabulary
    truncation choices in tokenizer training). One tokenize scan →
    (source, term) counts → per-source rollup; the vocabulary never
    broadcasts and the output is |sources|-bounded. Tokenization is
    the engine's established normalize-lower-split; conditional SUM
    over term counts (no second scan for hapaxes)."""
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.where(F.length(F.trim("text")) > 0).select(
        "source",
        F.explode(
            F.split(
                F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))), " "
            )
        ).alias("term"),
    )
    per_term = terms.groupBy("source", "term").agg(F.count("*").alias("c"))
    return (
        per_term.groupBy("source")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("n_types"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_hapax"),
        )
        .select(
            "source",
            "n_tokens",
            "n_types",
            "n_hapax",
            F.expr("CAST(n_types * 1000000 DIV n_tokens AS BIGINT)").alias(
                "ttr_ppm"
            ),
            F.expr("CAST(n_hapax * 1000000 DIV n_types AS BIGINT)").alias(
                "hapax_share_ppm"
            ),
        )
        .orderBy("source")
    )


_LEXICAL_ORACLE = """
    WITH toks AS (
      SELECT source,
             unnest(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS term
      FROM documents WHERE length(trim(text)) > 0
    ), per_term AS (
      SELECT source, term, count(*) AS c FROM toks GROUP BY 1, 2
    )
    SELECT source,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_types,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           CAST(count(*) * 1000000 // sum(c) AS BIGINT) AS ttr_ppm,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT) AS hapax_share_ppm
    FROM per_term GROUP BY 1 ORDER BY 1
"""


_LSH_RECALL_TABLES = (2, 4, 8)


def sim_lsh_recall_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH sibling of ``sim_ivf_recall`` — recall@5 of the
    sign-random-projection LSH path vs brute force as the TABLE COUNT
    grows (2 → 4 → 8 tables at 3 planes): the other ANN family's
    recall-vs-cost curve, driver-proven. Table subsets nest (seeds
    1000..1000+t−1), so recall is monotone in t BY CONSTRUCTION —
    more tables only ever add candidates — and the t=8 row equals the
    declared sim_ann_lsh's candidates (pinned in pytest). Everything
    reuses already-driver-proven arithmetic (the seeded hyperplanes +
    any-table candidate rule of `_ann_lsh_oracle`, the brute anchor of
    sim_cosine_topk); exact-ppm recall."""
    from spotify_data_pipeline_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_lsh,
    )
    from spotify_data_pipeline_spark.plans.similarity_queries import (
        _N_QUERY_VECS,
        _TOP_K,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < _N_QUERY_VECS)
    brute = cosine_topk_bruteforce(queries, emb, k=_TOP_K).select(
        "query_id", "neighbor_id"
    )
    total = brute.agg(F.count("*").cast("long").alias("n_brute"))
    frames = []
    for t in _LSH_RECALL_TABLES:
        lsh = cosine_topk_lsh(
            queries, emb, k=_TOP_K, dim=64, n_planes=3, n_tables=t
        ).select("query_id", "neighbor_id")
        hits = lsh.join(brute, ["query_id", "neighbor_id"]).agg(
            F.count("*").cast("long").alias("n_hits")
        )
        frames.append(
            hits.crossJoin(F.broadcast(total)).select(
                F.lit(t).cast("long").alias("n_tables"),
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
    return out.orderBy("n_tables")


def _lsh_recall_oracle() -> str:
    from spotify_data_pipeline_spark.operators.similarity import (
        _projection_planes,
    )
    from spotify_data_pipeline_spark.plans.similarity_queries import (
        _N_QUERY_VECS,
        _TOP_K,
    )

    max_t = max(_LSH_RECALL_TABLES)
    buckets = []
    for t in range(max_t):
        planes = _projection_planes(64, 3, seed=1000 + t)
        bits = " + ".join(
            f"(CASE WHEN list_dot_product(e, CAST([{', '.join(repr(x) for x in plane)}] AS DOUBLE[])) > 0 THEN {1 << i} ELSE 0 END)"
            for i, plane in enumerate(planes)
        )
        buckets.append(f"({bits}) AS b{t}")
    bucket_cols = ",\n           ".join(buckets)
    ctes, rows = [], []
    for nt in _LSH_RECALL_TABLES:
        same = " OR ".join(f"q.b{t} = c.b{t}" for t in range(nt))
        ctes.append(f"""
    lsh{nt} AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY floor(list_dot_product(q.e, c.e)
                   / (sqrt(list_dot_product(q.e, q.e))
                    * sqrt(list_dot_product(c.e, c.e))) * 10000 + 0.5)
                   / 10000 DESC, c.vec_id ASC) AS rn
        FROM b q JOIN b c
          ON q.vec_id < {_N_QUERY_VECS} AND q.vec_id <> c.vec_id
         AND ({same})
      ) WHERE rn <= {_TOP_K}
    )""")
        rows.append(f"""
    SELECT CAST({nt} AS BIGINT) AS n_tables,
           (SELECT count(*) FROM lsh{nt} i JOIN brute x
              ON i.query_id = x.query_id
             AND i.neighbor_id = x.neighbor_id) AS n_hits,
           (SELECT count(*) FROM brute) AS n_brute,
           CAST((SELECT count(*) FROM lsh{nt} i JOIN brute x
                   ON i.query_id = x.query_id
                  AND i.neighbor_id = x.neighbor_id) * 1000000
                // (SELECT count(*) FROM brute) AS BIGINT) AS recall_ppm
""")
    return f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    b AS (SELECT vec_id, e,
           {bucket_cols}
          FROM v),
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
    {",".join(ctes)}
    {" UNION ALL ".join(rows)}
    ORDER BY n_tables
    """


def er_customer_entities_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end-to-end as a composition of two proven
    operators — the record-linkage pipeline every MDM/dedup stack
    runs: (1) BLOCKING + matching via the exact edit-distance self-join
    (operators/fuzzyjoin.py — frequency-ordered prefix filtering, the
    join_fuzzy_levenshtein machinery verbatim, distance ≤ 1 on
    customer names), then (2) TRANSITIVE closure of the match graph
    via connected components (operators/components.py, min-label), so
    A~B~C lands in ONE entity even when (A, C) itself is not a match
    — the semantics a pair list alone cannot give. Output: one row per
    multi-member entity (canonical id = min member, member count, max
    member for audit). The oracle recomputes matches naively
    (levenshtein ≤ 1 all-pairs under the same %8 bound both engines
    apply) and reachability with a recursive CTE — the
    dedup_components precedent on a different match relation. At
    100 TB the prefix filter keeps candidate generation off the hot
    constant name prefix and components needs O(log² n) rounds; the
    composition inherits both operators' documented scale paths."""
    from spotify_data_pipeline_spark.operators.components import (
        connected_components,
    )
    from spotify_data_pipeline_spark.operators.fuzzyjoin import fuzzy_self_join

    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 8 == 1)
        .select("c_custkey", "c_name")
    )
    pairs = fuzzy_self_join(cust, "c_custkey", "c_name", max_dist=1, q=3)
    labels = connected_components(pairs.select("id_a", "id_b"))
    return (
        labels.groupBy(F.col("component").cast("long").alias("entity_id"))
        .agg(
            F.count("*").cast("long").alias("n_members"),
            F.max("id").cast("long").alias("max_member"),
        )
        .orderBy("entity_id")
    )


_ER_ENTITIES_ORACLE = """
    WITH RECURSIVE pairs AS (
      SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
      FROM customer a JOIN customer b
        ON a.c_custkey < b.c_custkey
       AND abs(length(a.c_name) - length(b.c_name)) <= 1
       AND levenshtein(a.c_name, b.c_name) <= 1
      WHERE a.c_custkey % 8 = 1 AND b.c_custkey % 8 = 1
    ), e AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b AS u, id_a AS v FROM pairs
    ), reach(u, v) AS (
      SELECT DISTINCT u, u FROM e
      UNION
      SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u
    ), labels AS (
      SELECT u AS id, min(v) AS component FROM reach GROUP BY u
    )
    SELECT CAST(component AS BIGINT) AS entity_id,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(max(id) AS BIGINT) AS max_member
    FROM labels GROUP BY 1 ORDER BY 1
"""


_DECAY_HORIZON_DAYS = 14  # events span exactly January (30 days,
# measured), so a 14-day half-window guarantees BOTH branches bite at
# every SF: roughly half the events are inside the horizon, half are
# dropped by it — the vacuousness discipline applied to the filter


def events_decayed_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed frequency ranking — the 'trending
    now' shape (recent events count more, half-life = 1 day) made
    EXACT: the weight 2^(H−age_days) is dyadic, so the decayed mass is
    a plain BIGINT sum (the EWMA precedent: dyadic rationals instead
    of pow()'s libm), with ages beyond the H=14-day horizon truncated
    to zero weight — the explicit sliding-relevance cutoff that also
    bounds the weight at 2^14 (no overflow at any corpus size whose
    row count fits the sum; at 10^12 rows lift to DECIMAL(38,0),
    documented). The anchor is the corpus max date (a 1-row broadcast
    aggregate, the trending/aging precedent, whitelisted). Output per
    event_type: events inside the horizon, total decayed units, and
    the rank under (decayed DESC, type) — the deterministic total
    order. One scan, one 1-row broadcast, one hash agg."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    anchor = ev.agg(F.max(F.to_date("ts")).alias("_anchor"))
    aged = (
        ev.select(F.to_date("ts").alias("day"), "event_type")
        .crossJoin(F.broadcast(anchor))
        .withColumn("age", F.datediff("_anchor", "day"))
        .where(
            (F.col("age") >= 0) & (F.col("age") <= _DECAY_HORIZON_DAYS)
        )
    )
    w = Window.orderBy(F.col("decayed_units").desc(), "event_type")
    return (
        aged.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_recent"),
            F.sum(
                F.expr(f"shiftleft(1L, {_DECAY_HORIZON_DAYS} - age)")
            )
            .cast("long")
            .alias("decayed_units"),
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .orderBy("rank")
    )


_DECAYED_TOPK_ORACLE = f"""
    WITH anchor AS (
      SELECT max(CAST(ts AS DATE)) AS a FROM events
    ), aged AS (
      SELECT event_type,
             date_diff('day', CAST(ts AS DATE), anchor.a) AS age
      FROM events, anchor
      WHERE date_diff('day', CAST(ts AS DATE), anchor.a)
            BETWEEN 0 AND {_DECAY_HORIZON_DAYS}
    ), agg AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_recent,
             CAST(sum(1::BIGINT << ({_DECAY_HORIZON_DAYS} - age))
                  AS BIGINT) AS decayed_units
      FROM aged GROUP BY 1
    )
    SELECT event_type, n_recent, decayed_units,
           CAST(row_number() OVER (
             ORDER BY decayed_units DESC, event_type ASC) AS BIGINT) AS rank
    FROM agg ORDER BY rank
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
    PendingQuery(
        "ml_ols_cramer",
        ml_ols_cramer_query,
        _ols_cramer_oracle(),
        tags=("ml", "regression", "cramer", "integer-exact"),
    ),
    PendingQuery(
        "events_simpson_diversity",
        events_simpson_diversity_query,
        _SIMPSON_ORACLE,
        tags=("events", "diversity", "simpson", "integer-exact"),
    ),
    PendingQuery(
        "events_bootstrap_user_mean",
        events_bootstrap_user_mean_query,
        _bootstrap_user_oracle(),
        tags=("events", "bootstrap", "cluster-resampling",
              "integer-exact"),
    ),
    PendingQuery(
        "events_ab_power",
        events_ab_power_query,
        _ab_power_oracle(),
        tags=("events", "experimentation", "power-analysis",
              "integer-exact"),
    ),
    PendingQuery(
        "text_lexical_richness",
        text_lexical_richness_query,
        _LEXICAL_ORACLE,
        tags=("text", "lexical", "ttr", "hapax", "integer-exact"),
    ),
    PendingQuery(
        "sim_lsh_recall",
        sim_lsh_recall_query,
        _lsh_recall_oracle(),
        tags=("similarity", "lsh", "recall", "evaluation"),
    ),
    PendingQuery(
        "er_customer_entities",
        er_customer_entities_query,
        _ER_ENTITIES_ORACLE,
        tags=("entity-resolution", "fuzzy", "components",
              "composition"),
    ),
    PendingQuery(
        "events_decayed_topk",
        events_decayed_topk_query,
        _DECAYED_TOPK_ORACLE,
        tags=("events", "decay", "trending", "dyadic",
              "integer-exact"),
    ),
)
