"""Text-analysis operators for LLM-data pipelines (SURVEY.md §2.12):
language ID, quality scoring, token counting, document fingerprinting.

Everything is Catalyst built-ins (split/filter/transform/aggregate/
xxhash64/md5) — JVM-side, codegen'd, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.functions.text import (
    bpe_ish_token_count,
    normalize_whitespace,
    tokens,
)
from spotify_data_pipeline_spark.plans.parity import rnd

# Tiny per-language stopword profiles for the n-gram/stopword heuristic
# language identifier. Public-knowledge word lists.
_LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "with", "a"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "für"),
    "fr": ("le", "la", "les", "et", "est", "pas", "pour", "avec", "une", "dans"),
    "es": ("el", "la", "los", "y", "es", "no", "para", "con", "una", "en"),
    "zh": ("的", "是", "不", "了", "在", "有", "我", "他", "这", "中"),
}


def token_count(text_col: Column | str) -> Column:
    """Whitespace token count (long)."""
    return F.size(tokens(text_col)).cast("long")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append quality-scoring features:

    - n_chars_norm: chars after whitespace normalization
    - n_tokens / n_uniq_tokens and uniq_ratio (repetition signal)
    - avg_token_len
    - punct_ratio: non-alphanumeric-non-space chars / chars
    - stopword_ratio: english stopword fraction (fluency-ish signal)
    All ratios rounded 4dp.
    """
    toks = tokens(F.col(text_col))
    norm = normalize_whitespace(F.col(text_col))
    n_tokens = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    n_chars = F.length(norm)
    punct = F.length(F.regexp_replace(norm, r"[\w\s]", ""))
    sw = F.array(*[F.lit(s) for s in _LANG_STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    safe_tokens = F.greatest(n_tokens, F.lit(1))
    safe_chars = F.greatest(n_chars, F.lit(1))
    return (
        df.withColumn("n_chars_norm", n_chars.cast("long"))
        .withColumn("n_tokens", n_tokens.cast("long"))
        .withColumn("n_uniq_tokens", n_uniq.cast("long"))
        .withColumn("uniq_ratio", rnd(n_uniq / safe_tokens, 4))
        .withColumn("avg_token_len", rnd((n_chars - (n_tokens - 1)) / safe_tokens, 4))
        .withColumn("punct_ratio", rnd(punct / safe_chars, 4))
        .withColumn("stopword_ratio", rnd(n_stop / safe_tokens, 4))
    )


def language_id(df: DataFrame, text_col: str = "text", out_col: str = "pred_lang") -> DataFrame:
    """Heuristic language ID: score each language by stopword hits per
    token, pick the argmax (ties → lexicographically first language,
    deterministic). 'und' (undetermined) when no profile matches.

    Pure expression tree: one pass, no shuffle, no UDF — at 100 TB this
    is a map-only operator.

    r12 optimization (guide §1.2 per-task work; the functions/text.py
    shingles binding lesson): the tokenization and the sorted
    best-language struct are now BOUND to lambda variables. The
    previous tree referenced ``toks`` from every per-language filter
    and ``best`` twice (hits + lang), so Catalyst inlined ~2·|langs|
    regex tokenizations per row; bound, the row pays ONE tokenization,
    |langs| stopword filters, one sort. Identical argmax/tie-break
    semantics (same comparator), measured 6.5 s → 0.8 s at sf0.1 for
    the bare classifier."""
    langs = sorted(_LANG_STOPWORDS)

    def _best_of(tk: Column) -> Column:
        def _hits(stopwords: tuple[str, ...]) -> Column:
            sw = F.array(*[F.lit(s) for s in stopwords])
            return F.size(F.filter(tk, lambda t: F.array_contains(sw, t)))

        arr = F.array(
            *[
                F.struct(
                    _hits(_LANG_STOPWORDS[lang]).alias("hits"),
                    F.lit(lang).alias("lang"),
                )
                for lang in langs
            ]
        )
        # argmax by (hits desc, lang asc) via array_sort comparator
        return F.array_sort(
            arr,
            lambda a, b: F.when(a["hits"] > b["hits"], -1)
            .when(a["hits"] < b["hits"], 1)
            .when(a["lang"] < b["lang"], -1)
            .when(a["lang"] > b["lang"], 1)
            .otherwise(0),
        )[0]

    pred = F.element_at(
        F.transform(
            F.array(tokens(F.col(text_col))),
            lambda tk: F.element_at(
                F.transform(
                    F.array(_best_of(tk)),
                    lambda b: F.when(b["hits"] > 0, b["lang"]).otherwise(
                        F.lit("und")
                    ),
                ),
                1,
            ),
        ),
        1,
    )
    return df.withColumn(out_col, pred)


def language_id_sql(tokens_expr: str = "toks") -> str:
    """DuckDB SQL fragment computing the EXACT ``language_id`` semantics
    over a token-list expression: per-language stopword hits, argmax
    with (hits desc, lang asc) tie-break, 'und' when nothing hits.
    Keeping the stopword profiles single-sourced here means the Spark
    classifier and its oracle can never drift.
    """
    langs = sorted(_LANG_STOPWORDS)
    hits = {
        lang: (
            f"len(list_filter({tokens_expr}, t -> list_contains("
            f"[{', '.join(repr(s) for s in _LANG_STOPWORDS[lang])}], t)))"
        )
        for lang in langs
    }
    all_hits = ", ".join(hits.values())
    branches = []
    for i, lang in enumerate(langs):
        rest = [f"{hits[lang]} >= {hits[o]}" for o in langs[i + 1 :]]
        cond = " AND ".join(rest) if rest else "TRUE"
        branches.append(f"WHEN {cond} THEN '{lang}'")
    return (
        f"CASE WHEN greatest({all_hits}) = 0 THEN 'und' "
        + " ".join(branches)
        + " END"
    )


def fingerprint_md5(df: DataFrame, text_col: str = "text", out_col: str = "fingerprint") -> DataFrame:
    """Canonical-content fingerprint: md5 of lowercased, whitespace-
    normalized text. Exact-dup detection key; md5 matches across engines
    (DuckDB md5() on the same normalization)."""
    return df.withColumn(out_col, F.md5(F.lower(normalize_whitespace(F.col(text_col)))))


def fingerprint_rolling(
    df: DataFrame, text_col: str = "text", window: int = 8, out_col: str = "winnow_fp"
) -> DataFrame:
    """Winnowing-style fingerprint: min xxhash64 over each sliding window
    of token shingles, collected as a sorted distinct array. Robust to
    small edits (used for near-dup candidate keys).
    """
    from spotify_data_pipeline_spark.functions.text import shingles

    sh = shingles(tokens(F.col(text_col)), 3)
    hashes = F.transform(sh, lambda s: F.xxhash64(s))

    # bind the hash array to a lambda variable so the shingle/hash tree
    # is evaluated once per row, not once per window position (see
    # functions/text.shingles for the same pattern + measurement)
    def _winnow(h: Column) -> Column:
        n = F.size(h)
        return F.when(
            n >= window,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), n - F.lit(window - 1)),
                    lambda i: F.array_min(F.slice(h, i, window)),
                )
            ),
        ).otherwise(
            F.when(n > 0, F.array(F.array_min(h))).otherwise(F.array().cast("array<bigint>"))
        )

    win_mins = F.element_at(F.transform(F.array(hashes), _winnow), 1)
    return df.withColumn(out_col, F.array_sort(win_mins))


def token_count_bpe_ish(df: DataFrame, text_col: str = "text", out_col: str = "n_bpe_tokens") -> DataFrame:
    return df.withColumn(out_col, bpe_ish_token_count(F.col(text_col)))


# --- PII scanning / redaction (training-data hygiene pass) ------------------

# Patterns restricted to the Java-regex ∩ RE2 common subset (no
# lookaround, ASCII \b) so a SQL oracle can run the identical regexes.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+?\d[\d \-]{7,}\d"


def pii_scan(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document PII counts + redacted-text checksum. Map-only
    Catalyst regexes — the pre-training hygiene pass that must touch
    every byte of a 100 TB corpus exactly once, so nothing here
    shuffles or leaves the JVM.

    Counting is staged on progressively redacted text (emails on raw,
    IPs after email redaction, phones after both) so one span is never
    double-counted (an email's numeric domain would otherwise also
    match the phone run). Returns (id, n_emails, n_ipv4, n_phones,
    clean_hash) where clean_hash = md5 of the fully redacted text.
    """
    raw = F.col(text_col)
    no_email = F.regexp_replace(raw, PII_EMAIL, "[EMAIL]")
    no_ip = F.regexp_replace(no_email, PII_IPV4, "[IP]")
    clean = F.regexp_replace(no_ip, PII_PHONE, "[PHONE]")
    return df.select(
        id_col,
        F.size(F.regexp_extract_all(raw, F.lit(PII_EMAIL), 0)).cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all(no_email, F.lit(PII_IPV4), 0)).cast("long").alias("n_ipv4"),
        F.size(F.regexp_extract_all(no_ip, F.lit(PII_PHONE), 0)).cast("long").alias("n_phones"),
        F.md5(clean).alias("clean_hash"),
    )


def contamination_ngram(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 5,
) -> DataFrame:
    """Benchmark-contamination screen: fraction of each document's
    k-token shingles that appear anywhere in the benchmark corpus (the
    'is my pretraining data leaking the eval set' check).

    Plan at scale: benchmark shingle hashes (eval suites — tiny next to
    the corpus) collapse to a DISTINCT set and BROADCAST; the corpus's
    exploded shingles hit them map-side; one groupBy(doc) shuffle of
    (id, partial counts) finishes it. The corpus is read once and never
    joins itself. Output: (id, n_shingles, n_contaminated,
    contamination 4dp) — every input doc appears, zeros included.
    """
    from spotify_data_pipeline_spark.operators.dedup import shingle_hash_sets

    doc_sh = shingle_hash_sets(df, id_col, text_col, shingle_k)
    bench_sh = (
        shingle_hash_sets(benchmark, id_col, text_col, shingle_k)
        .select(F.explode("hset").alias("_h"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    # one pass: explode -> broadcast-left-join the hit marker -> a single
    # per-doc aggregation counts BOTH totals (count(*) = n_shingles since
    # hset is distinct) and hits (count of non-null markers). No second
    # join of per-doc totals against hit counts.
    marked = doc_sh.select(id_col, F.explode("hset").alias("_h")).join(
        F.broadcast(bench_sh), "_h", "left"
    )
    agg = marked.groupBy(id_col).agg(
        F.count("*").alias("n_shingles"),
        F.count("_hit").alias("n_contaminated"),
    )
    return agg.select(
        id_col,
        F.col("n_shingles").cast("long").alias("n_shingles"),
        F.col("n_contaminated").cast("long").alias("n_contaminated"),
        rnd(F.col("n_contaminated") / F.greatest("n_shingles", F.lit(1)), 4).alias(
            "contamination"
        ),
    )


# Gopher quality rules (Rae et al. 2021, "Scaling Language Models:
# ... Gopher", §A1.1 — public paper). Word-level subset only: the
# line-level rules (bullet/ellipsis line fractions) need newline
# structure this corpus lacks.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_WORD_RATIO = 0.8
GOPHER_MIN_STOPWORDS = 2
# the paper's stopword set
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-rules document quality filter: per-doc features + the
    keep/drop verdict. Map-only Catalyst (one tokenization, HOF
    counts) — like ``pii_scan``, this touches every byte of the corpus
    exactly once with zero shuffles; the filter composes in front of
    dedup/packing in a curation pipeline.

    Features (ratios 4 dp, half-up — cross-engine exact):
    n_words, mean_word_len, symbol_ratio (#/ellipsis tokens per word),
    alpha_word_ratio (words containing a letter), n_stopwords; keep is
    the AND of the five Gopher word-level rules.
    """
    toks = tokens(F.col(text_col))

    def _feats(t: Column) -> Column:
        n = F.size(t)
        safe_n = F.greatest(n, F.lit(1))
        char_sum = F.aggregate(
            t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        )
        n_symbol = F.size(F.filter(t, lambda x: x.rlike(r"#|\.\.\.|…")))
        n_alpha = F.size(F.filter(t, lambda x: x.rlike("[a-z]")))
        sw = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
        n_stop = F.size(F.filter(t, lambda x: F.array_contains(sw, x)))
        return F.struct(
            n.cast("long").alias("n_words"),
            rnd(char_sum / safe_n, 4).alias("mean_word_len"),
            rnd(n_symbol / safe_n, 4).alias("symbol_ratio"),
            rnd(n_alpha / safe_n, 4).alias("alpha_word_ratio"),
            n_stop.cast("long").alias("n_stopwords"),
        )

    # bind the token array once (see functions/text.shingles for why)
    s = F.element_at(F.transform(F.array(toks), _feats), 1)
    out = df.select(id_col, s.alias("_s")).select(id_col, "_s.*")
    keep = (
        F.col("n_words").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
        & F.col("mean_word_len").between(GOPHER_MIN_MEAN_WORD_LEN, GOPHER_MAX_MEAN_WORD_LEN)
        & (F.col("symbol_ratio") <= GOPHER_MAX_SYMBOL_RATIO)
        & (F.col("alpha_word_ratio") >= GOPHER_MIN_ALPHA_WORD_RATIO)
        & (F.col("n_stopwords") >= GOPHER_MIN_STOPWORDS)
    )
    return out.withColumn("keep", keep)
