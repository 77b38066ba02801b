"""Exact fuzzy self-join (operators/fuzzyjoin.py): prefix filtering +
length-band short block must equal the brute-force answer on every
regime — long strings, short strings, and the mixed boundary the block
split has to cover exactly."""

from __future__ import annotations

import itertools

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spotify_data_pipeline_spark.operators.fuzzyjoin import fuzzy_self_join


def _lev(a: str, b: str) -> int:
    m = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
    for i in range(len(a) + 1):
        m[i][0] = i
    for j in range(len(b) + 1):
        m[0][j] = j
    for i in range(1, len(a) + 1):
        for j in range(1, len(b) + 1):
            m[i][j] = min(
                m[i - 1][j] + 1,
                m[i][j - 1] + 1,
                m[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
            )
    return m[len(a)][len(b)]


def _brute(rows, d):
    return {
        (a, b, _lev(sa, sb))
        for (a, sa), (b, sb) in itertools.combinations(rows, 2)
        if _lev(sa, sb) <= d
    }


def _run(spark, rows, d, q=3):
    df = spark.createDataFrame(rows, "id long, s string")
    return {tuple(r) for r in fuzzy_self_join(df, "id", "s", d, q).collect()}


def test_mixed_length_regimes_exact(spark):
    rows = [
        (1, "ab"), (2, "ac"), (3, "abcd"), (4, "xbcd"),
        (5, "zzzzzzzzzzzz"), (6, "zzzzzzzzzzzy"), (7, "q"),
        (8, "abcdefgh"), (9, "abcdefghi"),  # boundary: len 8/9 at d=1,q=3
    ]
    assert _run(spark, rows, 1) == _brute(rows, 1)


def test_distance_two_exact(spark):
    rows = [
        (1, "conference proceedings 2024"),
        (2, "conference proceedings 2025"),
        (3, "conferense proceedings 2024x"),
        (4, "entirely different string here"),
        (5, "short"), (6, "shirt"), (7, "sharp"),
    ]
    assert _run(spark, rows, 2) == _brute(rows, 2)


def test_hot_gram_skew_still_exact(spark):
    """All strings share a long constant prefix (the hot-gram regime
    prefix filtering exists for): candidates must still be complete."""
    rows = [(i, f"Customer#{i:09d}") for i in range(1, 60)]
    assert _run(spark, rows, 1) == _brute(rows, 1)


@given(
    strs=st.lists(
        st.text(alphabet=st.sampled_from("abc"), min_size=0, max_size=10),
        min_size=0,
        max_size=12,
        unique=True,
    ),
    d=st.sampled_from([1, 2]),
)
@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_matches_brute_force_random(spark, strs, d):
    """Small-alphabet random strings maximize near-collisions — the
    hardest completeness regime for the candidate generation."""
    rows = [(i, s) for i, s in enumerate(strs)]
    assert _run(spark, rows, d) == _brute(rows, d)


def test_empty_and_identical_strings(spark):
    rows = [(1, ""), (2, "a"), (3, "a"), (4, "")]
    got = _run(spark, rows, 1)
    assert (1, 4, 0) in got  # identical empties
    assert (2, 3, 0) in got  # identical non-empties
    assert (1, 2, 1) in got and (3, 4, 1) in got
