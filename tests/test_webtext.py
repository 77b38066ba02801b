"""operators/webtext.py — paragraph structure + URL extraction on
REAL newline/URL-bearing fixtures (the self-built fixture VERDICT r05
item 5 / r06 'What's missing' 4 prescribed: driver documents carry no
newlines or URLs, so these semantics are proven here and at corpus
scale by the synthesized-page queries in plans/roundfourteen_pending).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.operators.webtext import (
    extract_urls,
    remove_boilerplate_paragraphs,
    split_paragraphs,
    url_domain,
)

HEADER = "Cookie notice: we use cookies"
FOOTER = "(c) example site 2026 all rights reserved"


@pytest.fixture(scope="module")
def webdocs(spark):
    """Multiline 'web pages' of two sites: site a's 3 pages share a
    header+footer template (boilerplate at min_doc_freq=3); site b's 2
    pages share text that must NOT be removed at that threshold."""
    rows = [
        (1, "a", f"{HEADER}\nunique alpha content one\n{FOOTER}"),
        (2, "a", f"{HEADER}\nunique beta content two\nsecond beta paragraph\n{FOOTER}"),
        (3, "a", f"{HEADER}\n{FOOTER}"),  # all-boilerplate page
        (4, "b", f"{HEADER}\ngamma content\nshared b paragraph"),
        (5, "b", f"shared b paragraph\ndelta content"),
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_split_paragraphs_preserves_order_and_count(webdocs):
    out = split_paragraphs(webdocs).collect()
    assert len(out) == 3 + 4 + 2 + 3 + 2
    doc2 = sorted(
        [(r.para_idx, r.para) for r in out if r.doc_id == 2]
    )
    assert doc2 == [
        (0, HEADER),
        (1, "unique beta content two"),
        (2, "second beta paragraph"),
        (3, FOOTER),
    ]


def test_split_paragraphs_literal_regex_special_sep(spark):
    """sep is a LITERAL (ADVICE r07): regex metacharacters like '|',
    '.', '+' must split only on themselves, and split/rejoin must
    round-trip. Pre-fix, F.split treated '|' as alternation and
    split between every character."""
    df = spark.createDataFrame(
        [(1, "alpha|beta.gamma|delta")], "doc_id long, text string"
    )
    for sep, expect in [
        ("|", ["alpha", "beta.gamma", "delta"]),
        (".", ["alpha|beta", "gamma|delta"]),
        ("+", ["alpha|beta.gamma|delta"]),
    ]:
        got = [
            r.para
            for r in split_paragraphs(df, sep=sep).orderBy("para_idx").collect()
        ]
        assert got == expect, sep
        rejoined = (
            split_paragraphs(df, sep=sep)
            .groupBy("doc_id")
            .agg(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("para_idx", "para"))),
                        lambda x: x["para"],
                    ),
                    sep,
                ).alias("text")
            )
            .collect()[0]
            .text
        )
        assert rejoined == "alpha|beta.gamma|delta", sep


def test_boilerplate_removed_per_scope(webdocs):
    cleaned = {
        r.doc_id: r.text
        for r in remove_boilerplate_paragraphs(
            webdocs, "doc_id", "text", ("source",), min_doc_freq=3
        ).collect()
    }
    # site a: header+footer hit df=3 -> removed everywhere
    assert cleaned[1] == "unique alpha content one"
    assert cleaned[2] == "unique beta content two\nsecond beta paragraph"
    # all-boilerplate page survives as an EMPTY row, not a missing one
    assert cleaned[3] == ""
    # site b: header df=1 within b (scope is per-source!), shared
    # paragraph df=2 < 3 -> everything kept verbatim
    assert cleaned[4] == f"{HEADER}\ngamma content\nshared b paragraph"
    assert cleaned[5] == "shared b paragraph\ndelta content"


def test_boilerplate_threshold_boundary(webdocs):
    """At min_doc_freq=2 site b's shared paragraph (df=2) IS template;
    order of the remaining paragraphs must be preserved."""
    cleaned = {
        r.doc_id: r.text
        for r in remove_boilerplate_paragraphs(
            webdocs, "doc_id", "text", ("source",), min_doc_freq=2
        ).collect()
    }
    assert cleaned[4] == f"{HEADER}\ngamma content"
    assert cleaned[5] == "delta content"


def test_boilerplate_scope_isolation(spark):
    """The same paragraph under DIFFERENT scopes never pools doc
    frequency across them."""
    rows = [(i, f"s{i % 3}", "common line\nbody " + str(i)) for i in range(9)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    cleaned = remove_boilerplate_paragraphs(
        df, "doc_id", "text", ("source",), min_doc_freq=4
    )
    # per scope df=3 < 4 -> kept; pooled df would be 9 and removed
    assert all("common line" in r.text for r in cleaned.collect())


def test_repartition_invariance(webdocs):
    a = {
        (r.doc_id, r.text)
        for r in remove_boilerplate_paragraphs(
            webdocs, "doc_id", "text", ("source",), 3
        ).collect()
    }
    b = {
        (r.doc_id, r.text)
        for r in remove_boilerplate_paragraphs(
            webdocs.repartition(7, "source"), "doc_id", "text", ("source",), 3
        ).collect()
    }
    assert a == b


def test_extract_urls_multiple_and_none(spark):
    rows = [
        (1, "see https://a.example.com/x and http://b.example.net/y?z=1 now"),
        (2, "no links here"),
        (3, "tail url https://c.example.org"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [(r.doc_id, r.url) for r in extract_urls(df).collect()]
    assert sorted(got) == [
        (1, "http://b.example.net/y?z=1"),
        (1, "https://a.example.com/x"),
        (3, "https://c.example.org"),
    ]


def test_url_domain_parses_authority(spark):
    df = spark.createDataFrame(
        [
            ("https://a.example.com/x/y",),
            ("http://b.example.net:8080/q?z=1",),
            ("https://bare.host",),
        ],
        "url string",
    )
    got = [r.d for r in df.select(url_domain(F.col("url")).alias("d")).collect()]
    assert got == ["a.example.com", "b.example.net:8080", "bare.host"]


def test_fixture_roundtrips_through_parquet(spark, webdocs, tmp_path):
    """Newlines and URLs survive a parquet write/read cycle — the
    warehouse-fixture form of the same corpus (VERDICT r05 wording) is
    equivalent to the in-memory one, so both prove the same ops."""
    path = os.path.join(str(tmp_path), "webdocs.parquet")
    webdocs.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in webdocs.collect()}
    cleaned = remove_boilerplate_paragraphs(back, "doc_id", "text", ("source",), 3)
    assert {r.doc_id: r.text for r in cleaned.collect()}[1] == (
        "unique alpha content one"
    )
