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
