"""Fixture tests: deterministic sampling, batching, as-of join, LSH
recall, language ID, approx-distinct accuracy (SURVEY.md §5.2)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.operators.asof import asof_join, asof_join_pandas
from spotify_data_pipeline_spark.operators.batching import (
    assign_batch_ids,
    assign_batch_ids_scalable,
)
from spotify_data_pipeline_spark.operators.sampling import deterministic_sample
from spotify_data_pipeline_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
)
from spotify_data_pipeline_spark.operators.textops import language_id


def test_deterministic_sample_stable_across_runs_and_partitionings(spark):
    """SURVEY §2.6 O3: same seed ⇒ same sample — the reference relies on
    this as an inter-task contract (no XCom; extract_albums re-derives)."""
    df = spark.range(1000).withColumnRenamed("id", "k")
    s1 = sorted(r.k for r in deterministic_sample(df, ["k"], 20, seed=20250901).collect())
    s2 = sorted(r.k for r in deterministic_sample(df, ["k"], 20, seed=20250901).collect())
    assert s1 == s2 and len(s1) == 20
    # stable under a different partitioning (df.sample(seed=) is NOT)
    s3 = sorted(
        r.k
        for r in deterministic_sample(df.repartition(17), ["k"], 20, seed=20250901).collect()
    )
    assert s1 == s3
    # different seed (different day) ⇒ different sample
    s4 = sorted(r.k for r in deterministic_sample(df, ["k"], 20, seed=20250902).collect())
    assert s1 != s4
    # cap-or-all semantics
    small = spark.range(5).withColumnRenamed("id", "k")
    assert deterministic_sample(small, ["k"], 20, seed=1).count() == 5


def test_batch_ids_dense_and_bounded(spark):
    """SURVEY §2.5: replicate create_artist_batches semantics — 1100 rows,
    batch_size 500 ⇒ batches 1,2,3 of sizes 500/500/100."""
    df = spark.range(1100).withColumnRenamed("id", "k")
    out = assign_batch_ids(df, ["k"], 500).groupBy("batch_id").count().collect()
    got = {r.batch_id: r["count"] for r in out}
    assert got == {1: 500, 2: 500, 3: 100}


def test_batch_ids_scalable_matches_window_variant(spark):
    df = spark.range(1100).withColumnRenamed("id", "k")
    a = {(r.k, r.batch_id) for r in assign_batch_ids(df, ["k"], 500).collect()}
    b = {(r.k, r.batch_id) for r in assign_batch_ids_scalable(df, ["k"], 500, partitions=7).collect()}
    assert a == b


_TS = dt.datetime


def _events_fixture(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _TS(2024, 1, 1, 10, 0)),
            (2, 10, _TS(2024, 1, 1, 11, 0)),
            (3, 20, _TS(2024, 1, 1, 9, 0)),  # no prior right row
            (4, 30, _TS(2024, 1, 1, 12, 0)),  # user with no right rows at all
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _TS(2024, 1, 1, 9, 30), 1.0),
            (10, _TS(2024, 1, 1, 10, 0), 2.0),  # ties with left event 1 (<= matches)
            (10, _TS(2024, 1, 1, 10, 45), 3.0),
            (20, _TS(2024, 1, 1, 9, 30), 4.0),  # after left event 3
        ],
        "user_id long, ts timestamp, px double",
    )
    return left, right


def test_asof_join_backward_semantics(spark):
    left, right = _events_fixture(spark)
    out = {r.event_id: (r.ts_right, r.px_right) for r in
           asof_join(left, right, on="ts", by="user_id", value_cols=["px"]).collect()}
    assert out[1] == (_TS(2024, 1, 1, 10, 0), 2.0)  # <= tie matches
    assert out[2] == (_TS(2024, 1, 1, 10, 45), 3.0)
    assert out[3] == (None, None)
    assert out[4] == (None, None)


def test_asof_join_null_value_stays_with_its_row(spark):
    """Regression (review find): a matched right row whose VALUE is
    NULL must yield a NULL value — not the most recent non-NULL value
    from an OLDER right row paired with the newer row's timestamp.
    Pinned for backward AND nearest."""
    left = spark.createDataFrame(
        [(1, 10, _TS(2024, 1, 1, 10, 0))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(10, _TS(2024, 1, 1, 9, 0), 1.0), (10, _TS(2024, 1, 1, 10, 0), None)],
        "user_id long, ts timestamp, px double",
    )
    for direction in ("backward", "nearest"):
        out = asof_join(left, right, on="ts", by="user_id", value_cols=["px"],
                        direction=direction).collect()[0]
        assert out.ts_right == _TS(2024, 1, 1, 10, 0), direction
        assert out.px_right is None, direction


def test_asof_join_nearest_semantics(spark):
    left, right = _events_fixture(spark)
    out = {r.event_id: (r.ts_right, r.px_right) for r in
           asof_join(left, right, on="ts", by="user_id", value_cols=["px"],
                     direction="nearest").collect()}
    assert out[1] == (_TS(2024, 1, 1, 10, 0), 2.0)  # exact-ts match, dist 0
    assert out[2] == (_TS(2024, 1, 1, 10, 45), 3.0)  # backward-only side
    # the row the pure-backward join returned as None: forward match found
    assert out[3] == (_TS(2024, 1, 1, 9, 30), 4.0)
    assert out[4] == (None, None)  # still no right rows at all


def test_asof_join_nearest_tie_prefers_backward(spark):
    left = spark.createDataFrame(
        [(1, 10, _TS(2024, 1, 1, 10, 0))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(10, _TS(2024, 1, 1, 9, 50), 1.0), (10, _TS(2024, 1, 1, 10, 10), 2.0)],
        "user_id long, ts timestamp, px double",
    )
    out = asof_join(left, right, on="ts", by="user_id", value_cols=["px"],
                    direction="nearest").collect()
    assert (out[0].ts_right, out[0].px_right) == (_TS(2024, 1, 1, 9, 50), 1.0)


def test_asof_join_nearest_tolerance(spark):
    left, right = _events_fixture(spark)
    out = {r.event_id: (r.ts_right, r.px_right) for r in
           asof_join(left, right, on="ts", by="user_id", value_cols=["px"],
                     direction="nearest",
                     tolerance=F.expr("INTERVAL 20 MINUTES")).collect()}
    assert out[2] == (_TS(2024, 1, 1, 10, 45), 3.0)  # 15 min — inside
    assert out[3] == (None, None)  # 30 min forward match — nulled out


def test_asof_join_pandas_agrees(spark):
    left, right = _events_fixture(spark)
    a = {(r.event_id, r.ts_right, r.px_right) for r in
         asof_join(left, right, on="ts", by="user_id", value_cols=["px"]).collect()}
    b = {(r.event_id, r.ts_right, r.px_right) for r in
         asof_join_pandas(left, right, on="ts", by="user_id", value_cols=["px"]).collect()}
    assert a == b


def test_asof_twins_agree_on_events_table(spark):
    """Cross-check the window-based asof_join against the pandas
    merge_asof twin at driver scale (sf0.01 events), not just the
    5-row fixture — purchases matched to the latest same-user click."""
    from spotify_data_pipeline_spark.io import load_table

    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    purchases = ev.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts")
    a = {(r.event_id, r.ts_right) for r in
         asof_join(purchases, clicks, on="ts", by="user_id", value_cols=[]).collect()}
    b = {(r.event_id, r.ts_right) for r in
         asof_join_pandas(purchases, clicks, on="ts", by="user_id", value_cols=[]).collect()}
    assert len(a) > 100  # non-trivial input
    assert a == b


def test_sim_ann_lsh_recall_floor_at_driver_scale(spark):
    """Quantitative gate for the declared ANN query's parameters at the
    driver's sf0.01 (VERDICT r1 item 9): recall vs exact brute force
    must hold ≥ 0.8 on the 500-vector corpus."""
    from spotify_data_pipeline_spark.plans.registry import all_queries

    sf = "/root/testdata/sf0.01"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10)
    exact = {(r.query_id, r.neighbor_id) for r in
             cosine_topk_bruteforce(queries, emb, k=5).collect()}
    approx = {(r.query_id, r.neighbor_id) for r in
              all_queries()["sim_ann_lsh"].fn(spark, sf).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"ANN recall {recall:.2f} below the 0.8 floor"


def test_lsh_topk_recall_vs_bruteforce(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10)
    exact = {(r.query_id, r.neighbor_id) for r in
             cosine_topk_bruteforce(queries, emb, k=5).collect()}
    # testdata embeddings are near-uniform (top-5 angle ~71 deg) — use
    # shallow buckets + more tables; expected recall ~0.86
    approx = {(r.query_id, r.neighbor_id) for r in
              cosine_topk_lsh(queries, emb, k=5, dim=64, n_planes=3, n_tables=8).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"LSH recall {recall:.2f} too low"


def test_language_id_deterministic_and_sane(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is in the house and the dog is with a friend"),
            (2, "der hund ist nicht mit der katze und das haus ist zu"),
            (3, "le chat est dans la maison et les chiens pour une personne"),
            (4, "el gato es no para los perros y una casa en madrid"),
            (5, "zzz qqq xxx"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.pred_lang for r in language_id(df).collect()}
    assert out == {1: "en", 2: "de", 3: "fr", 4: "es", 5: "und"}
    out2 = {r.doc_id: r.pred_lang for r in language_id(df).collect()}
    assert out == out2


def test_approx_distinct_within_rsd(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    exact = li.select(F.countDistinct("l_orderkey").alias("n")).collect()[0].n
    approx = li.select(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("n")
    ).collect()[0].n
    assert abs(approx - exact) / exact < 0.1


def test_load_events_scopes_nanos_conf(spark):
    """Round-1 verdict item 7: loading events must not leave the global
    nanosAsLong conf mutated for co-resident queries — and the returned
    plan must still execute after the conf is restored."""
    from spotify_data_pipeline_spark.io import load_table

    key = "spark.sql.legacy.parquet.nanosAsLong"
    spark.conf.set(key, "false")
    df = load_table(spark, "/root/testdata/sf0.001", "events")
    assert spark.conf.get(key) == "false"  # conf restored, not leaked
    assert df.count() > 0  # and the read still executes correctly
    assert dict(df.dtypes)["ts"] == "timestamp"


def test_kmeans_deterministic_and_ivf_recall(spark):
    """k-means: same input => same centroids (hash-deterministic init,
    no RNG); IVF top-k with nprobe=3 of 8 cells must hold recall >= 0.6
    vs brute force on the near-uniform sf0.01 embeddings (clustered
    real-world data does far better; uniform data is the hard case)."""
    from spotify_data_pipeline_spark.operators.clustering import kmeans_centroids
    from spotify_data_pipeline_spark.operators.similarity import cosine_topk_ivf

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    c1 = {r._cid: list(r._centroid) for r in kmeans_centroids(emb, k=4, iters=2).collect()}
    c2 = {r._cid: list(r._centroid) for r in kmeans_centroids(emb, k=4, iters=2).collect()}
    assert c1 == c2
    assert len(c1) == 4 and all(len(v) == 64 for v in c1.values())

    queries = emb.where(F.col("vec_id") < 10)
    exact = {(r.query_id, r.neighbor_id) for r in
             cosine_topk_bruteforce(queries, emb, k=5).collect()}
    approx = {(r.query_id, r.neighbor_id) for r in
              cosine_topk_ivf(queries, emb, k=5, n_cells=8, nprobe=3).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"IVF recall {recall:.2f} too low"


def test_packed_sequence_ids_matches_single_window(spark):
    """Two-phase packing must equal the naive per-group window cumsum."""
    from spotify_data_pipeline_spark.operators.packing import packed_sequence_ids
    from pyspark.sql import Window

    df = (
        spark.range(500)
        .select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 7).alias("source"),
            (F.pmod(F.xxhash64("id"), F.lit(200)) + 1).alias("w"),
        )
    )
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    naive = {
        (r.doc_id): r.seq_id
        for r in df.withColumn(
            "seq_id", F.floor(F.coalesce(F.sum("w").over(w), F.lit(0)) / 300).cast("long")
        ).collect()
    }
    scalable = {
        r.doc_id: r.seq_id
        for r in packed_sequence_ids(df, "source", "doc_id", "w", 300, partitions=11).collect()
    }
    assert naive == scalable


def test_asof_join_forward_and_tolerance(spark):
    """Round-2 extension: forward direction (earliest right >= left.on)
    and tolerance bound, checked against a Python model on the fixture."""
    left, right = _events_fixture(spark)
    fwd = {r.event_id: (r.ts_right, r.px_right) for r in
           asof_join(left, right, on="ts", by="user_id", value_cols=["px"],
                     direction="forward").collect()}
    assert fwd[1] == (_TS(2024, 1, 1, 10, 0), 2.0)   # >= tie matches
    assert fwd[2] == (None, None)                     # nothing at/after 11:00
    assert fwd[3] == (_TS(2024, 1, 1, 9, 30), 4.0)    # first right after 9:00
    assert fwd[4] == (None, None)

    tol = {r.event_id: (r.ts_right, r.px_right) for r in
           asof_join(left, right, on="ts", by="user_id", value_cols=["px"],
                     tolerance=F.expr("INTERVAL 20 MINUTES")).collect()}
    assert tol[1] == (_TS(2024, 1, 1, 10, 0), 2.0)    # distance 0 <= 20m
    assert tol[2] == (_TS(2024, 1, 1, 10, 45), 3.0)   # 15m <= 20m
    assert tol[3] == (None, None)
    # shrink tolerance: event 2's 15m match must null out
    tight = {r.event_id: r.px_right for r in
             asof_join(left, right, on="ts", by="user_id", value_cols=["px"],
                       tolerance=F.expr("INTERVAL 10 MINUTES")).collect()}
    assert tight[2] is None and tight[1] == 2.0

    import pytest as _p
    with _p.raises(ValueError, match="direction"):
        asof_join(left, right, on="ts", by="user_id", direction="sideways")


def test_gopher_quality_verdicts(spark):
    """Each rule triggers independently on crafted docs."""
    from spotify_data_pipeline_spark.operators.textops import gopher_quality

    good = "the quick brown fox jumps over a lazy dog and that dog have with " + " ".join(
        f"word{i}" for i in range(40)
    )
    df = spark.createDataFrame(
        [
            (1, good),                                # passes all rules
            (2, "too short to keep"),                 # < 50 words
            (3, " ".join(["ab"] * 60)),               # mean word len < 3
            (4, " ".join(["the of and to be"] * 12) + " " + " ".join(["#"] * 10)),  # symbols
            (5, " ".join(["12345"] * 60)),            # alpha ratio 0
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.keep for r in gopher_quality(df).collect()}
    assert out[1] is True
    assert out[2] is False and out[3] is False and out[5] is False
    assert out[4] is False  # symbol_ratio 10/70 > 0.1
