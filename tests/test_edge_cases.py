"""Degenerate-input robustness: empty tables, null/blank text, unicode.
Operators must produce empty/sane results, never crash — at 100 TB a
partition of garbage rows WILL occur."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.operators.dedup import (
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    simhash_dedup,
)
from spotify_data_pipeline_spark.operators.packing import packed_sequence_ids
from spotify_data_pipeline_spark.operators.textops import (
    fingerprint_md5,
    language_id,
    quality_features,
)

_SCHEMA = "doc_id long, text string"


@pytest.fixture(scope="module")
def degenerate_docs(spark):
    rows = [
        (1, None),  # null text
        (2, ""),  # empty
        (3, "   \t  \n "),  # whitespace only
        (4, "one"),  # single token (shorter than shingle k)
        (5, "naïve café — 模型训练 données"),  # unicode, mixed scripts
        (6, "a " * 2000),  # pathological repetition, long
    ]
    return spark.createDataFrame(rows, _SCHEMA)


def test_near_dup_operators_survive_degenerate_docs(spark, degenerate_docs):
    # no crashes; null/blank docs contribute no pairs
    mh = minhash_lsh_dedup(degenerate_docs).collect()
    sh = simhash_dedup(degenerate_docs).collect()
    ng = ngram_jaccard_pairs(degenerate_docs).collect()
    for pairs in (mh, sh, ng):
        ids = {i for r in pairs for i in (r.id_a, r.id_b)}
        assert ids <= {4, 5, 6}  # degenerate docs never pair


def test_text_operators_survive_degenerate_docs(spark, degenerate_docs):
    q = quality_features(degenerate_docs).collect()
    assert len(q) == 6  # every row survives with sane (non-crash) features
    lang = {r.doc_id: r.pred_lang for r in language_id(degenerate_docs).collect()}
    assert lang[2] == "und" and lang[3] == "und"
    fp = {r.doc_id: r.fingerprint for r in fingerprint_md5(degenerate_docs).collect()}
    assert fp[2] == fp[3]  # blank variants canonicalize identically
    assert fp[1] is None  # null text stays null, not a crash


def test_operators_on_empty_input(spark):
    empty = spark.createDataFrame([], _SCHEMA)
    assert minhash_lsh_dedup(empty).count() == 0
    assert ngram_jaccard_pairs(empty).count() == 0
    assert quality_features(empty).count() == 0
    assert language_id(empty).count() == 0
    ew = spark.createDataFrame([], "doc_id long, source string, w long")
    assert packed_sequence_ids(ew, "source", "doc_id", "w", 512, partitions=4).count() == 0


def test_curation_pipeline_on_degenerate_docs(spark, degenerate_docs, tmp_path):
    """The declared curation query end-to-end over a parquet dir holding
    only degenerate docs (plus lang col the query schema expects)."""
    from spotify_data_pipeline_spark.plans.registry import all_queries

    d = tmp_path / "sfdeg"
    (d).mkdir()
    degenerate_docs.withColumn("lang", F.lit("en")).withColumn(
        "source", F.lit("s")
    ).withColumn("n_chars", F.length("text")).write.parquet(str(d / "documents.parquet"))
    out = all_queries()["llm_curation_pipeline"].fn(spark, str(d)).collect()
    ids = {r.doc_id for r in out}
    assert 1 not in ids and 2 not in ids and 3 not in ids  # null/blank filtered
    assert 6 not in ids  # repetition fails the uniqueness floor


@pytest.fixture(scope="module")
def boundary_docs_dir(spark, tmp_path_factory):
    """A documents.parquet of chunk-stride boundary lengths, unicode,
    single-source skew — adversarial for the round-3 llmops queries."""
    rows = [
        (1, "x", "s0"),                  # 1 char → 1 chunk
        (2, "a" * 149, "s0"),            # just under stride
        (3, "b" * 150, "s0"),            # == stride → still 1 chunk
        (4, "c" * 151, "s0"),            # stride+1 → 2 chunks (2nd is 1 char)
        (5, "d" * 200, "s0"),            # == chunk size
        (6, "e" * 201, "s1"),            # chunk+1
        (7, "née 模型 " * 60, "s1"),      # unicode, multi-chunk (char semantics)
        (8, "tok " * 120, "s1"),         # repeated single token (tf-idf edge)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    d = tmp_path_factory.mktemp("boundary") / "sfb"
    d.mkdir()
    df.withColumn("lang", F.lit("en")).withColumn(
        "n_chars", F.length("text")
    ).write.parquet(str(d / "documents.parquet"))
    return str(d)


def _docs_oracle(sql: str, sf_dir: str):
    import duckdb

    con = duckdb.connect()
    # Spark writes a directory of part files (the fixture tables are
    # single files, so oracle_check's plain path works there)
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet/*.parquet'"
    )
    return con.execute(sql).fetchdf()


@pytest.mark.parametrize(
    "name",
    ["llm_doc_chunking", "llm_tfidf_top_terms", "llm_train_val_split", "llm_source_mix"],
)
def test_round3_llmops_oracle_parity_on_boundary_docs(spark, boundary_docs_dir, name):
    """Cross-engine parity must hold on boundary inputs, not just the
    well-behaved fixtures — stride-edge lengths, unicode char-vs-byte
    semantics, one-source quota saturation."""
    from tests.oracle_check import compare

    from spotify_data_pipeline_spark.plans.registry import all_queries

    q = all_queries()[name]
    errs = compare(q.fn(spark, boundary_docs_dir), _docs_oracle(q.oracle, boundary_docs_dir))
    assert not errs, errs


def test_chunk_count_formula(spark, boundary_docs_dir):
    """floor((L−1)/stride)+1 chunks; final chunk length L − stride·(n−1)."""
    from spotify_data_pipeline_spark.plans.registry import all_queries

    out = all_queries()["llm_doc_chunking"].fn(spark, boundary_docs_dir).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r.doc_id, []).append(r)
    n_chunks = {d: len(v) for d, v in per_doc.items()}
    assert n_chunks[1] == 1 and n_chunks[2] == 1 and n_chunks[3] == 1
    assert n_chunks[4] == 2 and n_chunks[5] == 2 and n_chunks[6] == 2
    last4 = [r for r in per_doc[4] if r.chunk_id == 1][0]
    assert last4.chunk_len == 1  # 151 − 150
    # doc 5: 200 chars → chunks [0,200) and [150,200) (overlap tail)
    last5 = [r for r in per_doc[5] if r.chunk_id == 1][0]
    assert last5.chunk_len == 50


def test_split_partitions_every_doc(spark, boundary_docs_dir):
    from spotify_data_pipeline_spark.plans.registry import all_queries

    out = all_queries()["llm_train_val_split"].fn(spark, boundary_docs_dir).collect()
    assert sum(r.n_docs for r in out) == 8
    assert {r.split for r in out} <= {"train", "val", "test"}
