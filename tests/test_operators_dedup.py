"""Hand-computed fixture tests for the dedup operator family — the
rows-only queries' correctness anchor (SURVEY.md §5.2 item 2/3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.operators.dedup import (
    embedding_neardup,
    exact_dedup,
    first_wins_dedup,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    simhash_dedup,
)

DOCS = [
    # two exact duplicates (0, 1), one near-dup with a single word changed (2),
    # one unrelated (3), one short doc (4)
    (0, "the quick brown fox jumps over the lazy dog and runs far away home"),
    (1, "the quick brown fox jumps over the lazy dog and runs far away home"),
    (2, "the quick brown fox jumps over the lazy cat and runs far away home"),
    (3, "completely different content about spark query engines and shuffles"),
    (4, "tiny doc"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup_keeps_one_per_key(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b"), (2, "b"), (3, "c")], "k long, v string"
    )
    out = exact_dedup(df, ["k"]).collect()
    assert sorted(r.k for r in out) == [1, 2, 3]


def test_first_wins_dedup_explicit_order(spark):
    df = spark.createDataFrame(
        [(1, 3, "third"), (1, 1, "first"), (1, 2, "second"), (2, 9, "only")],
        "k long, seq long, v string",
    )
    out = first_wins_dedup(df, ["k"], [F.col("seq").asc()]).collect()
    got = {r.k: r.v for r in out}
    assert got == {1: "first", 2: "only"}


def test_ngram_jaccard_exact_values(spark, docs_df):
    # doc0 vs doc1 identical -> jaccard 1.0; doc0 vs doc2: 14 tokens,
    # 12 shingles each (k=3), one word changed at position 8 -> 3 shingles
    # differ per side: common = 9, union = 12 + 12 - 9 = 15 -> 0.6
    pairs = {(r.id_a, r.id_b): r.jaccard for r in
             ngram_jaccard_pairs(docs_df, threshold=0.1).collect()}
    assert pairs[(0, 1)] == 1.0
    assert pairs[(0, 2)] == pytest.approx(0.6, abs=1e-4)
    assert (0, 3) not in pairs  # unrelated
    assert (1, 2) in pairs


def test_minhash_lsh_finds_exact_and_near_dups(spark, docs_df):
    out = {(r.id_a, r.id_b): r.jaccard for r in
           minhash_lsh_dedup(docs_df, jaccard_threshold=0.5).collect()}
    assert out[(0, 1)] == 1.0  # exact dup always collides in every band
    assert (0, 2) in out  # near-dup at jaccard 0.6 should be caught
    assert all(j >= 0.5 for j in out.values())
    assert not any({a, b} & {3} for a, b in out)  # unrelated doc never pairs


def test_simhash_exact_dups_hamming_zero(spark, docs_df):
    out = {(r.id_a, r.id_b): r.hamming for r in simhash_dedup(docs_df).collect()}
    assert out.get((0, 1)) == 0
    # near-dup doc2 shares almost all tokens -> low hamming, usually <= 3
    assert all(h <= 3 for h in out.values())


def test_embedding_neardup_pairs(spark):
    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.001, 0.0, 0.0]),  # nearly identical to 0
        (2, [0.0, 1.0, 0.0, 0.0]),  # orthogonal
        (3, [-1.0, 0.0, 0.0, 0.0]),  # opposite
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = {(r.id_a, r.id_b): r.cos for r in embedding_neardup(df, threshold=0.95).collect()}
    assert set(out) == {(0, 1)}
    assert out[(0, 1)] >= 0.999


def test_minhash_hot_bucket_cap(spark):
    """max_bucket_width drops pathological buckets: a cluster of
    identical boilerplate docs lands in one bucket per band; capping
    below the cluster size suppresses its quadratic candidate fan-out,
    while distinct near-dup pairs elsewhere are unaffected."""
    boiler = [(i, "identical boilerplate text repeated across the corpus many times over") for i in range(20)]
    other = [(100, "the quick brown fox jumps over the lazy dog and runs far away home"),
             (101, "the quick brown fox jumps over the lazy dog and runs far away home")]
    df = spark.createDataFrame(boiler + other, "doc_id long, text string")
    uncapped = minhash_lsh_dedup(df, jaccard_threshold=0.5)
    capped = minhash_lsh_dedup(df, jaccard_threshold=0.5, max_bucket_width=10)
    un = {(r.id_a, r.id_b) for r in uncapped.collect()}
    cp = {(r.id_a, r.id_b) for r in capped.collect()}
    assert (100, 101) in un and (100, 101) in cp  # small cluster survives the cap
    assert sum(1 for a, b in un if a < 100) == 20 * 19 // 2  # quadratic blow-up uncapped
    assert not any(a < 100 for a, b in cp)  # hot cluster suppressed


def test_minhash_lsh_join_fixture_pairs(spark, docs_df):
    """Two-table screen on the fixture: batch {0, 2} vs corpus {1, 3, 4}.
    doc0≡doc1 (jaccard 1.0) and doc2~doc1 (0.6) must surface; nothing
    pairs with the unrelated doc3 or the tiny doc4."""
    from spotify_data_pipeline_spark.operators.dedup import minhash_lsh_join

    new = docs_df.where(F.col("doc_id").isin(0, 2))
    corpus = docs_df.where(F.col("doc_id").isin(1, 3, 4))
    out = {(r.new_id, r.corpus_id): r.jaccard
           for r in minhash_lsh_join(new, corpus, jaccard_threshold=0.5).collect()}
    assert set(out) == {(0, 1), (2, 1)}
    assert out[(0, 1)] == 1.0
    assert out[(2, 1)] == pytest.approx(0.6, abs=1e-4)


def test_minhash_lsh_join_matches_self_dedup_cross_pairs(spark):
    """On real testdata, the incremental join must reproduce EXACTLY the
    cross-split subset of the self-dedup's pairs (same hash family, same
    banding ⟹ same candidates ⟹ same verified pairs)."""
    from spotify_data_pipeline_spark.io import load_table
    from spotify_data_pipeline_spark.operators.dedup import minhash_lsh_join

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    new = docs.where(F.col("doc_id") % 7 == 0)
    corpus = docs.where(F.col("doc_id") % 7 != 0)
    got = {(r.new_id, r.corpus_id, r.jaccard)
           for r in minhash_lsh_join(new, corpus, jaccard_threshold=0.5).collect()}

    new_ids = {r.doc_id for r in new.select("doc_id").collect()}
    want = set()
    for r in minhash_lsh_dedup(docs, jaccard_threshold=0.5).collect():
        if (r.id_a in new_ids) != (r.id_b in new_ids):
            want.add((r.id_a, r.id_b, r.jaccard) if r.id_a in new_ids
                     else (r.id_b, r.id_a, r.jaccard))
    assert got == want and len(got) > 0


def test_ngram_jaccard_join_matches_self_join_cross_pairs(spark, docs_df):
    """The exact two-table join agrees with the self-join's cross-split
    pairs on the fixture (DF cap never bites at 5 docs)."""
    from spotify_data_pipeline_spark.operators.dedup import ngram_jaccard_join

    new = docs_df.where(F.col("doc_id").isin(0, 2))
    corpus = docs_df.where(F.col("doc_id").isin(1, 3, 4))
    got = {(r.new_id, r.corpus_id): r.jaccard
           for r in ngram_jaccard_join(new, corpus, threshold=0.1).collect()}
    assert set(got) == {(0, 1), (2, 1)}
    assert got[(0, 1)] == 1.0
    assert got[(2, 1)] == pytest.approx(0.6, abs=1e-4)


def test_tfidf_cosine_weights_rare_overlap_above_boilerplate(spark):
    """Two pairs with the SAME shingle-overlap count: one shares rare
    content, one shares corpus-wide boilerplate. Set-Jaccard scores
    them identically; idf weighting must rank the rare-content pair
    strictly higher."""
    from spotify_data_pipeline_spark.operators.dedup import (
        tfidf_shingle_cosine_pairs,
    )

    boiler = "terms of service apply to all users"
    rows = [(i, f"{boiler} filler{i} pad{i} extra{i}") for i in range(20)]
    # pair (100, 101): share rare content + each has unique tail
    rows += [
        (100, "zebra quantum flux capacitor resonance alpha one two"),
        (101, "zebra quantum flux capacitor resonance beta three four"),
        # pair (102, 103): share ONLY the boilerplate + unique tails
        (102, f"{boiler} unique102a unique102b unique102c"),
        (103, f"{boiler} unique103a unique103b unique103c"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): r.cos
        for r in tfidf_shingle_cosine_pairs(df, threshold=0.0).collect()
    }
    assert got[(100, 101)] > got[(102, 103)]


def test_first_wins_agg_equals_window_form(spark):
    """The skew-proof aggregate form must pick exactly the same winners
    as the window form, including duplicate-order tiebreaks resolved by
    the extended key."""
    from pyspark.sql import functions as F

    from spotify_data_pipeline_spark.operators.dedup import (
        first_wins_dedup,
        first_wins_dedup_agg,
    )

    rows = [
        (1, 2, "b"), (1, 1, "a"), (1, 3, "c"),     # key 1: order 1 wins
        (2, 5, "x"), (2, 5, "y"),                   # key 2: tie on order -> payload breaks
        (3, 7, "z"),                                # singleton
    ]
    df = spark.createDataFrame(rows, "k long, o long, payload string")
    w = first_wins_dedup(df, ["k"], [F.col("o").asc(), F.col("payload").asc()])
    a = first_wins_dedup_agg(df, ["k"], ["o", "payload"])
    assert sorted(map(tuple, w.collect())) == sorted(map(tuple, a.collect()))
    got = {r.k: r.payload for r in a.collect()}
    assert got == {1: "a", 2: "x", 3: "z"}
