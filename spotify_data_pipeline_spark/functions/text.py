"""Text Column helpers — Catalyst built-ins only (SURVEY.md §2.11 policy:
no row-level Python UDFs anywhere on the hot path; everything here is
JVM-side and whole-stage-codegen friendly).

Re-expresses the reference's string semantics:
- whitespace normalization ``' '.join(s.strip().split())``
  (scripts/search_artist_id_and_name.py:21)
- blank-line filtering (scripts/create_artist_batches.py:15-16)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_whitespace(col: Column | str) -> Column:
    """Collapse runs of whitespace to single spaces and trim the ends —
    the reference's ``' '.join(s.strip().split())``.

    Order matters: collapse FIRST, then trim. ``F.trim`` strips only
    0x20 spaces, so trim-then-collapse leaves a tab/newline-edged
    string as a single ' ' instead of '' (found by the degenerate-input
    tests); collapsing first turns every edge run into a plain space
    that trim removes. Oracle SQL uses the same
    trim(regexp_replace(...)) order — DuckDB's trim is space-only too.
    """
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def is_nonblank(col: Column | str) -> Column:
    return F.length(F.trim(col)) > 0


def tokens(col: Column | str, lowercase: bool = True) -> Column:
    """Whitespace tokenization -> array<string> (empty array for blank text)."""
    base = normalize_whitespace(col)
    if lowercase:
        base = F.lower(base)
    return F.when(F.length(base) > 0, F.split(base, " ")).otherwise(
        F.array().cast("array<string>")
    )


def shingles(tokens_col: Column, k: int = 3) -> Column:
    """k-token shingles (space-joined) from a token array.

    Perf-critical detail: the token expression must be BOUND to a lambda
    variable before the per-shingle transform. Referencing ``tokens_col``
    directly inside the lambda would inline it — Catalyst re-evaluates
    the whole tokenization (regex split) once per shingle, measured as a
    ~50× slowdown on real documents. ``transform(array(tokens_col), t ->
    ...)`` evaluates the tokenization exactly once per row and makes
    every inner reference a variable lookup.
    """

    def _shingles_of(t: Column) -> Column:
        n = F.size(t)
        return F.when(
            n >= k,
            F.transform(
                F.sequence(F.lit(1), n - F.lit(k - 1)),
                lambda i: F.concat_ws(" ", F.slice(t, i, k)),
            ),
        ).otherwise(
            # shorter than k tokens: the whole text is the single shingle
            F.when(n > 0, F.array(F.concat_ws(" ", t))).otherwise(
                F.array().cast("array<string>")
            )
        )

    return F.element_at(F.transform(F.array(tokens_col), _shingles_of), 1)


# word runs / digit runs count one each; every other non-space char
# counts alone. RE2-compatible (no lookarounds) so a DuckDB oracle can
# run the IDENTICAL pattern — see plans/text_queries.text_bpe_token_count.
BPE_ISH_PATTERN = r"[A-Za-z0-9_]+|[^\sA-Za-z0-9_]"


def bpe_ish_token_count(col: Column | str) -> Column:
    """Approximate subword token count with a BPE-ish regex:
    words, numbers, and single non-space punctuation each count as one.
    """
    return F.size(
        F.regexp_extract_all(
            F.col(col) if isinstance(col, str) else col, F.lit(BPE_ISH_PATTERN), 0
        )
    ).cast("long")
