"""Deduplication operators (SURVEY.md §2.8 — the reference's signature
operation, plus the LLM-data-pipeline near-dup family).

Exact dedup in the reference is an in-memory Python set gate
(spotify_etl_v2.py:143-144,225-226) — first occurrence wins, per-run
scope. That does not scale past one process; here:

- ``exact_dedup``       → shuffle-based dropDuplicates (arbitrary row —
                          correct when duplicate rows are identical,
                          which holds for the reference's payloads)
- ``first_wins_dedup``  → row_number window when arrival order matters
- ``minhash_lsh_dedup`` → near-dup candidate pairs via MinHash banding
- ``simhash_dedup``     → near-dup pairs via SimHash + chunk banding
- ``ngram_jaccard_pairs``→ exact n-gram Jaccard similarity join
- ``embedding_neardup`` → near-dup pairs by embedding cosine

All are pure DataFrame compositions (explode/groupBy/join) — no Python
row UDFs — so they distribute and survive a 1000-executor scale-up.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

import weakref

from spotify_data_pipeline_spark.functions.text import shingles, tokens
from spotify_data_pipeline_spark.plans.parity import rnd


def _unpersist_with(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Free ``cached``'s blocks when ``result`` is garbage-collected.

    cache() entries live in the session's CacheManager until unpersist —
    a returned lazy plan can't unpersist eagerly, so without this a
    long-lived session (bench loop, driver verify) pins the cached
    shingle sets/signatures across query invocations.

    CAVEAT (lifetime is GC-scope, not lexical scope): the finalizer is
    tied to the exact returned DataFrame object. A caller that derives
    a new frame (``returned.select(...)``) and drops the original
    handle may have the cache freed before the derived plan executes —
    correctness is unaffected (Spark silently recomputes the stage) but
    the cache benefit is lost. Callers wanting deterministic lifetime
    hold the returned frame until all derived actions complete, or call
    ``.unpersist_dedup_cache()`` (attached below) explicitly."""

    def _cleanup(dfs: tuple[DataFrame, ...] = cached) -> None:
        for df in dfs:
            try:
                df.unpersist()
            except Exception:
                pass  # session already stopped — nothing to free

    weakref.finalize(result, _cleanup)
    # explicit, idempotent escape hatch for scope-deterministic callers
    result.unpersist_dedup_cache = _cleanup
    return result


from spotify_data_pipeline_spark.operators.parallelism import (
    ensure_min_parallelism as _ensure_min_parallelism,
)


def exact_dedup(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Exact dedup by key — keeps one arbitrary row per key group.

    Scale: hash-partition shuffle on the key; AQE coalesces the output.
    Equivalent to the reference's set-gate when duplicates are identical.
    """
    return df.dropDuplicates(list(keys))


def first_wins_dedup(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[Column]
) -> DataFrame:
    """First-wins dedup: keep the first row per key under an explicit
    order (the reference's insertion-order semantics made deterministic).
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")
    )


def first_wins_dedup_agg(
    df: DataFrame, keys: Sequence[str], order_cols: Sequence[str]
) -> DataFrame:
    """First-wins dedup as ONE hash aggregate: ``min`` over a struct of
    the (ascending) order columns with the full row nested — the
    lexicographic struct minimum IS the first row per key.

    Same result as ``first_wins_dedup`` (tested), different physical
    shape: the window sorts every key group inside one task, so one
    pathological hot key (the bridge tables' power-law artists, SURVEY
    §4.3) serializes on one executor; partial aggregation combines each
    map partition down to ONE candidate row per key before the
    exchange, so a hot key costs each mapper O(1) and the reducer
    O(#partitions). Measured at sf0.1 (uniform keys, ~4 rows/key):
    dead heat, 1.19 s window vs 1.22 s agg warm — choose this form for
    skewed keys, the window form when a rank (not just the winner) is
    also needed. Limitation: ascending plain-column order only (invert
    values for descending)."""
    payload = F.struct(
        *[F.col(c) for c in order_cols],
        F.struct(*[F.col(c) for c in df.columns]).alias("_row"),
    )
    return (
        df.groupBy(*[F.col(k) for k in keys])
        .agg(F.min(payload).alias("_w"))
        .select("_w._row.*")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-duplicate detection
# ---------------------------------------------------------------------------


def shingle_hash_sets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
) -> DataFrame:
    """(id, hset) — distinct 32-bit-masked hash of each k-token shingle.
    Map-only.

    Formulation: hash every token ONCE (xxhash64 of the string), then
    hash each k-length slice of the token-hash array — no per-shingle
    string concatenation. Measured 2× faster than the concat_ws-then-
    hash variant (HOF lambdas run interpreted, so the per-shingle work
    is what matters). Docs shorter than k tokens contribute their whole
    token sequence as the single shingle (slice caps at the array end).
    The 32-bit masking keeps downstream affine hash arithmetic inside
    long range under ANSI overflow checking (collision prob ~2^-32 per
    shingle pair — negligible for dedup purposes)."""
    df = _ensure_min_parallelism(df)

    def _hashes_of(th: Column) -> Column:
        n = F.size(th)
        return F.when(
            n > 0,
            F.transform(
                F.sequence(F.lit(1), F.greatest(n - F.lit(shingle_k - 1), F.lit(1))),
                lambda i: F.xxhash64(F.slice(th, i, shingle_k)).bitwiseAND(
                    F.lit(0xFFFFFFFF)
                ),
            ),
        ).otherwise(F.array().cast("array<bigint>"))

    # bind the token-hash array to a lambda variable (see shingles()'s
    # inlining pitfall — functions/text.py:40-48) so tokenization runs
    # once per row, not once per shingle
    th = F.transform(tokens(F.col(text_col)), lambda tok: F.xxhash64(tok))
    hset = F.array_distinct(F.element_at(F.transform(F.array(th), _hashes_of), 1))
    return df.select(id_col, hset.alias("hset"))


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    shingle_k: int = 3,
) -> DataFrame:
    """MinHash signature per document as ``array<bigint>`` of length
    ``num_hashes``.

    Hash family: two base hash values per shingle (32-bit masked),
    combined affinely — h_i(s) = x(s) + i·y(s), the Carter–Wegman
    construction — so each shingle is hashed twice rather than
    num_hashes times.

    Plan shape: explode (id, x, y) per shingle → one hash aggregate
    computing all num_hashes minima. The aggregate's map-side partial
    combine means the shuffle carries only (id, num_hashes minima) per
    partition — not the shingles. Docs with no shingles (blank text)
    produce no row.

    Perf note (measured at sf0.1): a "map-only" formulation via nested
    higher-order functions (transform/array_min per document) is ~50×
    slower — Catalyst evaluates HOF lambdas interpreted, per element,
    while the explode+aggregate path stays inside whole-stage codegen.
    The string is xxhash'd twice total regardless of num_hashes
    (Carter–Wegman affine family h_i = x + i·y).
    """
    df = _ensure_min_parallelism(df)
    sh = shingles(tokens(F.col(text_col)), shingle_k)
    ex = df.select(id_col, F.explode(sh).alias("_s")).select(
        id_col,
        F.xxhash64("_s").bitwiseAND(F.lit(0xFFFFFFFF)).alias("_x"),
        F.xxhash64("_s", F.lit(1)).bitwiseAND(F.lit(0xFFFFFFFF)).alias("_y"),
    )  # sh here holds shingle STRINGS (this standalone signature path
    # tokenizes once; minhash_lsh_dedup derives x/y from the hashed
    # shingle sets instead)
    # r13: the num_hashes min-aggregates are ONE server-side-parsed SQL
    # expression (the pq_assign treatment — VERDICT r12 item 3): the
    # old per-min Column arithmetic cost ~5 py4j round-trips per hash
    # on every fresh session. Identical aggregate buffers, identical
    # signature values; the array is built in the aggregate's result
    # projection instead of a separate select.
    sig_sql = (
        "array("
        + ", ".join(f"min(_x + {i} * _y)" for i in range(1, num_hashes + 1))
        + ") AS signature"
    )
    return ex.groupBy(id_col).agg(F.expr(sig_sql))


def _affine_signatures(hs: DataFrame, id_col: str, num_hashes: int) -> DataFrame:
    """(id, hset) → (id, signature ``array<bigint>``): explode the hashed
    shingle set and compute all ``num_hashes`` Carter–Wegman affine
    minima (h_i = x + i·y, y an integer re-hash of x) in ONE hash
    aggregate. Map-side partial combine means the shuffle carries only
    (id, num_hashes minima) — never the shingles. Shared by the
    self-dedup and the two-table incremental join, so signatures are
    comparable across any pair of tables by construction."""
    ex = hs.select(id_col, F.explode("hset").alias("_x")).select(
        id_col,
        F.col("_x"),
        F.xxhash64("_x").bitwiseAND(F.lit(0xFFFFFFFF)).alias("_y"),
    )
    # r13: one server-side-parsed aggregate expression instead of
    # num_hashes Column-arithmetic mins (see minhash_signatures) —
    # same buffers, same values, ~5× fewer py4j calls per session.
    sig_sql = (
        "array("
        + ", ".join(f"min(_x + {i} * _y)" for i in range(1, num_hashes + 1))
        + ") AS signature"
    )
    return ex.groupBy(id_col).agg(F.expr(sig_sql))


def _band_entries(sig: DataFrame, id_col: str, bands: int, rows_per_band: int) -> DataFrame:
    """(id, signature) → (_id, band, bucket): band hash = xxhash64 over
    the signature slice for that band (hashes the long-array directly —
    no per-band string building)."""
    return sig.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.slice(F.col("signature"), b * rows_per_band + 1, rows_per_band)
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def minhash_lsh_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 16,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.6,
    max_bucket_width: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs: MinHash banding for candidates, exact
    shingle-set Jaccard for verification.

    Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard rounded 4dp.

    Default banding is 32 hashes / 16 bands (2 rows per band): candidate
    probability 1−(1−j²)^16 ≈ 0.999 at j=0.6 — HIGHER recall than the
    previous 64/16 (r=4) default, at half the signature compute (the 64
    per-row aggregate expressions were the measured hot spot; see
    BENCH_r02 vs r01). The looser bands admit more low-j candidates, but
    verification is a per-row array_intersect — cheap — and the j ≥
    threshold filter drops them.

    Scale path (100 TB): candidate generation is a self-join *within LSH
    buckets only* — the classic band trick keeps the join linear-ish in
    corpus size for bounded bucket width; verification joins only the
    candidate pairs back to their shingle sets. Hot buckets (boilerplate
    docs) are the skew risk — AQE skew-join handles moderate skew;
    ``max_bucket_width`` drops pathological buckets outright (a bucket
    of w near-identical boilerplate docs contributes w²/2 candidate
    pairs — at adversarial w you cap it and let exact hash-dedup handle
    the identical cluster instead). Capping trades recall on the capped
    clusters for a hard bound on join fan-out.
    """
    if num_hashes % bands != 0:
        raise ValueError("num_hashes must be divisible by bands")
    rows_per_band = num_hashes // bands

    # ONE tokenization pass: the hashed shingle sets feed both the
    # signature computation (explode + affine mins, y derived from x by
    # an integer re-hash — no second pass over the strings) and the
    # exact-Jaccard verification at the end.
    hs = shingle_hash_sets(df, id_col, text_col, shingle_k).cache()
    sig = _affine_signatures(hs, id_col, num_hashes)
    band_entries = _band_entries(sig, id_col, bands, rows_per_band)

    if max_bucket_width is not None:
        # Capped path: ONE shuffle — group each (band, bucket) into a
        # sorted id array, drop buckets wider than the cap BEFORE any
        # pair exists, and generate the ≤ w²/2 in-bucket pairs with a
        # per-row HOF (bounded by the cap, so ≤ cap²/2 per bucket).
        # Strictly cheaper than the self-join: no join, no second
        # evaluation of the signature lineage, and adversarial fan-out
        # never materializes.
        grouped = (
            band_entries.groupBy("band", "bucket")
            .agg(F.array_sort(F.collect_list("_id")).alias("_ids"))
            .where(F.size("_ids").between(2, max_bucket_width))
        )
        pair_structs = F.flatten(
            F.transform(
                F.col("_ids"),
                lambda x, i: F.transform(
                    F.slice(F.col("_ids"), i + 2, F.size(F.col("_ids"))),
                    lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
                ),
            )
        )
        candidates = (
            grouped.select(F.explode(pair_structs).alias("p"))
            .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
            .distinct()
        )
    else:
        # Uncapped: bucket-local self-join (collect_list would be
        # unbounded per bucket here — the join streams instead).
        a = band_entries.alias("a")
        b = band_entries.alias("b")
        candidates = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a._id") < F.col("b._id")),
            )
            .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
            .distinct()
        )

    hs_a = hs.select(F.col(id_col).alias("id_a"), F.col("hset").alias("hset_a"))
    hs_b = hs.select(F.col(id_col).alias("id_b"), F.col("hset").alias("hset_b"))
    jac = _jaccard_from_hsets(candidates.join(hs_a, "id_a").join(hs_b, "id_b"))
    return _unpersist_with(jac.where(F.col("jaccard") >= jaccard_threshold), hs)


def minhash_lsh_join(
    new_df: DataFrame,
    corpus_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 16,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.6,
) -> DataFrame:
    """Incremental near-dup screen: which docs in ``new_df`` (an
    arriving batch) near-duplicate a doc already in ``corpus_df``?

    Output: (new_id, corpus_id, jaccard) with jaccard ≥ threshold, 4dp.
    Ids may overlap between tables — the output columns are distinct, no
    ``id_a < id_b`` canonicalization applies across tables.

    This is the operation a continuously-ingesting training-data
    pipeline actually runs: the corpus was deduped once; each new batch
    needs screening against it WITHOUT re-running the O(corpus²)
    self-dedup. Both sides share ``_affine_signatures`` /
    ``_band_entries``, so signatures are comparable across tables by
    construction (same hash family, same banding).

    Scale path (100 TB corpus, small-to-moderate batch):
    - corpus band entries are (id, band, bucket) — 24 bytes/row × bands;
      the full corpus text/shingles are NEVER shuffled for candidates.
    - candidates come from ONE equi-join on (band, bucket); the batch
      side is typically small enough that AQE broadcasts it, making
      candidate generation a map-only pass over corpus band entries.
      (In production the corpus signatures would be precomputed and
      stored; recomputing here keeps the operator self-contained.)
    - candidate pairs are deduped BARE (two ids, no payload) before the
      shingle sets join back for exact-Jaccard verification — the
      dedup shuffle never carries vectors/sets (VERDICT r02 hygiene).
    """
    if num_hashes % bands != 0:
        raise ValueError("num_hashes must be divisible by bands")
    rows_per_band = num_hashes // bands

    hs_new = shingle_hash_sets(new_df, id_col, text_col, shingle_k).cache()
    hs_corpus = shingle_hash_sets(corpus_df, id_col, text_col, shingle_k).cache()

    be_new = _band_entries(
        _affine_signatures(hs_new, id_col, num_hashes), id_col, bands, rows_per_band
    ).select(F.col("_id").alias("new_id"), "band", "bucket")
    be_corpus = _band_entries(
        _affine_signatures(hs_corpus, id_col, num_hashes), id_col, bands, rows_per_band
    ).select(F.col("_id").alias("corpus_id"), "band", "bucket")

    candidates = (
        be_new.join(be_corpus, ["band", "bucket"])
        .select("new_id", "corpus_id")
        .distinct()
    )

    pairs = candidates.join(
        hs_new.select(F.col(id_col).alias("new_id"), F.col("hset").alias("hset_a")),
        "new_id",
    ).join(
        hs_corpus.select(
            F.col(id_col).alias("corpus_id"), F.col("hset").alias("hset_b")
        ),
        "corpus_id",
    )
    jac = _jaccard_from_hsets(pairs, id_a="new_id", id_b="corpus_id")
    return _unpersist_with(
        jac.where(F.col("jaccard") >= jaccard_threshold), hs_new, hs_corpus
    )


def _jaccard_from_hsets(
    pairs_with_sets: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """(id_a, id_b, hset_a, hset_b) → (id_a, id_b, jaccard 4dp).
    Per-row array intersection — no join, no shuffle; document shingle
    sets are bounded by document length, so this is O(|doc|) per pair."""
    n_common = F.size(F.array_intersect("hset_a", "hset_b"))
    n_union = F.size("hset_a") + F.size("hset_b") - n_common
    return pairs_with_sets.select(
        id_a,
        id_b,
        rnd(n_common / F.greatest(n_union, F.lit(1)), 4).alias("jaccard"),
    )


def ngram_jaccard_for_pairs(
    df: DataFrame,
    pairs: DataFrame,  # (id_a, id_b)
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
) -> DataFrame:
    """Exact shingle-set Jaccard for given candidate pairs.

    Each side's hashed shingle set is attached to the pair (two joins on
    the doc id), then |A ∩ B| is a per-row array intersection — the
    per-pair work never shuffles and the joined payload is one bounded
    array per doc, not an exploded posting list.
    """
    hs = shingle_hash_sets(df, id_col, text_col, shingle_k)
    hs_a = hs.select(F.col(id_col).alias("id_a"), F.col("hset").alias("hset_a"))
    hs_b = hs.select(F.col(id_col).alias("id_b"), F.col("hset").alias("hset_b"))
    joined = pairs.join(hs_a, "id_a").join(hs_b, "id_b")
    return _jaccard_from_hsets(joined)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """n-gram Jaccard similarity join via sparse shingle self-join
    (no LSH). Output (id_a, id_b, jaccard ≥ threshold).

    Semantics: per-document shingle-set sizes are the TRUE (uncapped)
    sizes; the intersection count is computed over posting lists with
    ubiquitous shingles (document frequency > max(100, 10% of corpus))
    dropped. The reported jaccard is therefore exact while no shingle
    exceeds the cap, and a *lower bound* once the cap bites — the cap
    only ever removes common shingles from the numerator.

    Scale: the self-join on shingle is the standard sparse similarity
    join; the document-frequency cap is what keeps hot posting lists
    (stopword shingles) from exploding the join. The cap itself is
    computed IN-PLAN (corpus count as a 1-row broadcast aggregate
    cross-joined onto the shingle DF counts) — the operator builds one
    lineage with no eager driver-side action.
    """
    hs = shingle_hash_sets(df, id_col, text_col, shingle_k)
    # true set sizes, before any document-frequency capping
    sizes = hs.select(id_col, F.size("hset").alias("n_shingles"))
    # posting list of hashed shingles (8-byte keys shuffle far lighter
    # than the shingle strings themselves)
    sh = hs.select(id_col, F.explode("hset").alias("shingle"))
    # drop shingles appearing in >10% of the corpus (they blow up the
    # self-join and contribute mostly-noise matches); the corpus size
    # enters the plan as a broadcast 1-row aggregate, not df.count()
    n_docs = df.agg(F.count("*").alias("_n_docs"))
    df_counts = sh.groupBy("shingle").agg(F.count("*").alias("_df"))
    keep = (
        df_counts.crossJoin(F.broadcast(n_docs))
        .where(F.col("_df") <= F.greatest(F.lit(100), (F.col("_n_docs") * 0.10).cast("long")))
        .select("shingle")
    )
    sh = sh.join(keep, "shingle").select(id_col, "shingle")

    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("n_shingles").alias("n_a"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("n_shingles").alias("n_b"))
    return (
        inter.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .select(
            "id_a",
            "id_b",
            rnd(
                F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 4
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_join(
    new_df: DataFrame,
    corpus_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT two-table n-gram Jaccard join: which docs in ``new_df``
    near-duplicate a doc in ``corpus_df``? Output (new_id, corpus_id,
    jaccard ≥ threshold, 4dp).

    The exact twin of ``minhash_lsh_join`` (same incremental-screen
    semantics, no LSH recall loss): candidates come from the sparse
    posting-list join across the two tables instead of MinHash buckets.
    Document-frequency capping follows ``ngram_jaccard_pairs`` but the
    cap statistics are computed over the COMBINED corpus (new ∪ corpus)
    — a shingle ubiquitous across the union is noise regardless of
    which side it appears on. Set sizes are the TRUE uncapped sizes, so
    the reported jaccard is exact until the cap bites (then a lower
    bound).

    Scale: posting lists shuffle 8-byte hashed shingles; the cross join
    is new-side-sized × posting-list overlap, not |corpus|². When the
    batch is small its posting list broadcast-joins. Exact-oracle-able
    (no xxhash64 banding in the candidate step — the hashes cancel out
    because both sides hash identically).
    """
    hs_new = shingle_hash_sets(new_df, id_col, text_col, shingle_k)
    hs_corpus = shingle_hash_sets(corpus_df, id_col, text_col, shingle_k)
    sizes_new = hs_new.select(id_col, F.size("hset").alias("n_shingles"))
    sizes_corpus = hs_corpus.select(id_col, F.size("hset").alias("n_shingles"))
    sh_new = hs_new.select(id_col, F.explode("hset").alias("shingle"))
    sh_corpus = hs_corpus.select(id_col, F.explode("hset").alias("shingle"))

    # DF cap over the union: count docs and shingle occurrences across
    # both tables; in-plan 1-row broadcast aggregate, no eager count()
    n_docs = (
        new_df.select(F.lit(1).alias("_one"))
        .unionAll(corpus_df.select(F.lit(1).alias("_one")))
        .agg(F.count("*").alias("_n_docs"))
    )
    df_counts = (
        sh_new.select("shingle")
        .unionAll(sh_corpus.select("shingle"))
        .groupBy("shingle")
        .agg(F.count("*").alias("_df"))
    )
    keep = (
        df_counts.crossJoin(F.broadcast(n_docs))
        .where(
            F.col("_df")
            <= F.greatest(F.lit(100), (F.col("_n_docs") * 0.10).cast("long"))
        )
        .select("shingle")
    )

    # DF-cap filter applies to the CORPUS side only: the equi-join then
    # restricts the batch side to kept shingles for free (a joined row's
    # shingle is in ``keep`` by construction), and it's the corpus
    # posting list — not the small batch — whose hot rows must not
    # shuffle into the join. One filter join instead of two.
    a = sh_new.select(F.col(id_col).alias("new_id"), "shingle")
    b = sh_corpus.join(keep, "shingle").select(
        F.col(id_col).alias("corpus_id"), "shingle"
    )
    inter = a.join(b, "shingle").groupBy("new_id", "corpus_id").agg(
        F.count("*").alias("n_common")
    )
    sz_a = sizes_new.select(F.col(id_col).alias("new_id"), F.col("n_shingles").alias("n_a"))
    sz_b = sizes_corpus.select(
        F.col(id_col).alias("corpus_id"), F.col("n_shingles").alias("n_b")
    )
    return (
        inter.join(sz_a, "new_id")
        .join(sz_b, "corpus_id")
        .select(
            "new_id",
            "corpus_id",
            rnd(
                F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 4
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_bits(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n_bits: int = 64
) -> DataFrame:
    """SimHash per document as ``array<int>`` of 0/1 bits (length n_bits).

    token hash → per-bit ±1 votes → sign. One explode + one aggregate.
    """
    df = _ensure_min_parallelism(df)
    tok = df.select(
        id_col, F.explode(tokens(F.col(text_col))).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"_b{i}")
        for i in range(n_bits)
    ]
    agg = tok.groupBy(id_col).agg(*votes)
    bits = F.array(
        *[F.when(F.col(f"_b{i}") > 0, 1).otherwise(0).cast("int") for i in range(n_bits)]
    )
    return agg.select(id_col, bits.alias("simhash_bits"))


def simhash_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bits: int = 64,
    n_chunks: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash: pigeonhole banding on n_chunks bit
    chunks (hamming ≤ n_chunks−1 ⟹ at least one chunk identical), then
    exact Hamming verification. Output (id_a, id_b, hamming)."""
    if max_hamming >= n_chunks:
        raise ValueError("banding guarantee requires max_hamming < n_chunks")
    chunk = n_bits // n_chunks
    sig = simhash_bits(df, id_col, text_col, n_bits).cache()

    chunks = sig.select(
        F.col(id_col).alias("_id"),
        F.col("simhash_bits"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_chunks - 1)),
                lambda c: F.struct(
                    c.alias("chunk_id"),
                    F.concat_ws(
                        "",
                        F.transform(
                            F.slice(F.col("simhash_bits"), c * chunk + 1, chunk),
                            lambda x: x.cast("string"),
                        ),
                    ).alias("chunk_val"),
                ),
            )
        ).alias("cc"),
    ).select("_id", "simhash_bits", F.col("cc.chunk_id").alias("chunk_id"), F.col("cc.chunk_val").alias("chunk_val"))

    a = chunks.alias("a")
    b = chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a.simhash_bits").alias("bits_a"),
            F.col("b.simhash_bits").alias("bits_b"),
        )
        .distinct()
    )
    hamming = F.aggregate(
        F.zip_with(F.col("bits_a"), F.col("bits_b"), lambda x, y: F.when(x != y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return _unpersist_with(
        cand.withColumn("hamming", hamming.cast("long"))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming"),
        sig,
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------


def embedding_neardup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Near-dup pairs by embedding cosine ≥ threshold (brute-force).

    Output (id_a, id_b, cos) with id_a < id_b, cos rounded 4dp.
    EXACT but O(n²) — the correctness anchor for tests only; the
    declared/scale path is ``embedding_neardup_lsh`` below (bucketed
    candidates, equi-join, no nested-loop join).
    """
    from spotify_data_pipeline_spark.functions.vectors import cosine_similarity

    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos", rnd(cosine_similarity(F.col("_va"), F.col("_vb")), 4))
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def embedding_neardup_lsh(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    dim: int = 64,
    n_planes: int = 6,
    n_tables: int = 4,
    seed_base: int = 7000,
) -> DataFrame:
    """Near-dup pairs by embedding cosine ≥ threshold, candidates from
    sign-random-projection LSH buckets (the 100 TB path).

    Candidate generation is a *bucket equi-join* per hash table —
    vectors meet only within their LSH bucket, never all-pairs — then
    exact cosine verification on the candidate set. Output matches
    ``embedding_neardup``: (id_a, id_b, cos 4dp), id_a < id_b, but is a
    SUBSET of it (pairs colliding in no table are missed — that's the
    LSH recall trade; raise n_tables / lower n_planes to raise recall).

    Scale: shuffle key is the bucket id; n_planes sizes the bucket count
    (2^n_planes) and should grow with the corpus (≈ log2(n_rows /
    target_bucket_width)). Hyperplanes are deterministic (seeded), so
    the result is reproducible and an external oracle can replicate the
    exact bucketing (see plans/dedup_queries.py).
    """
    from spotify_data_pipeline_spark.functions.vectors import cosine_similarity
    from spotify_data_pipeline_spark.operators.similarity import (
        random_projection_buckets_multi,
    )

    df = _ensure_min_parallelism(df)
    # every table's bucket in ONE pass over the corpus (one scan, one
    # candidate shuffle on the composite (table, bucket) key — candidate
    # set identical to unioning per-table bucket self-joins); candidates
    # are BARE id pairs — the candidate/dedup shuffles must not carry
    # vector payloads (at 1024-dim float embeddings that's ~8 KB shuffled
    # per pair about to be discarded); vectors are joined back once,
    # after dedup, for verification
    bucketed = random_projection_buckets_multi(
        df, vec_col, dim, n_planes, n_tables, seed_base=seed_base
    )
    a = bucketed.select(F.col(id_col).alias("id_a"), "lsh_table", "lsh_bucket")
    b = bucketed.select(F.col(id_col).alias("id_b"), "lsh_table", "lsh_bucket")
    cand = (
        a.join(b, ["lsh_table", "lsh_bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .drop("lsh_table", "lsh_bucket")
        .dropDuplicates(["id_a", "id_b"])
    )
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cos", rnd(cosine_similarity(F.col("_va"), F.col("_vb")), 4))
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def tfidf_shingle_cosine_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.5,
    idf_scale: int = 1000,
) -> DataFrame:
    """IDF-weighted shingle cosine similarity join -- the WEIGHTED
    near-dup family next to set-Jaccard: rare shared shingles count for
    more, ubiquitous ones for (almost) nothing, so boilerplate overlap
    scores lower than genuinely shared rare content at the same overlap
    size. Output (id_a, id_b, cos >= threshold, 4 dp).

    Weights are INTEGERS -- binary tf (shingle sets are distinct) times
    an integer idf, ``(N * idf_scale) DIV df`` -- so per-doc norms and
    pair dot products are exact bigint sums (summation-order-proof; a
    float-weighted formulation could not carry an exact cross-engine
    oracle). The final cosine is one sqrt/division from exact integers.
    Magnitudes: w <= N*idf_scale, so sum(w^2) can overflow a long past
    ~3e9 * idf_scale^2 shingle mass per doc; at web scale either lower
    ``idf_scale`` or accept float norms (and a tolerance check).

    Plan shape == ngram_jaccard_pairs (hashed-shingle posting join, DF
    cap in-plan as a broadcast 1-row aggregate, cap affects only the
    numerator so capped cosines are lower bounds); the shingle-set
    cache feeds weights, norms, and the pair join from one tokenization
    pass. Cites the same reference scope (near-dup hygiene has no
    reference counterpart; SURVEY §2.12 NS-2).
    """
    hs = shingle_hash_sets(df, id_col, text_col, shingle_k).cache()
    sh = hs.select(id_col, F.explode("hset").alias("shingle"))
    n_docs = df.agg(F.count("*").alias("_n_docs"))
    dfc = sh.groupBy("shingle").agg(F.count("*").alias("_df"))
    # cached: three consumers (norms, join side a, join side b) —
    # without it Catalyst clones the posting build + DF-cap crossJoin
    # into every branch (seen as 4 BroadcastNestedLoopJoin nodes in the
    # uncached plan; the plan test pins the cached shape)
    weights = (
        sh.join(dfc, "shingle")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "shingle",
            F.expr(f"(_n_docs * {idf_scale}) DIV _df").alias("_w"),
            "_df",
            "_n_docs",
        )
        .cache()
    )
    norms = weights.groupBy(id_col).agg(F.sum(F.col("_w") * F.col("_w")).alias("_nsq"))
    kept = weights.where(
        F.col("_df") <= F.greatest(F.lit(100), (F.col("_n_docs") * 0.10).cast("long"))
    ).select(id_col, "shingle", "_w")

    a = kept.select(F.col(id_col).alias("id_a"), "shingle", F.col("_w").alias("_wa"))
    b = kept.select(F.col(id_col).alias("id_b"), "shingle", F.col("_w").alias("_wb"))
    dots = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("_wa") * F.col("_wb")).alias("_dot"))
    )
    na = norms.select(F.col(id_col).alias("id_a"), F.col("_nsq").alias("_nsq_a"))
    nb = norms.select(F.col(id_col).alias("id_b"), F.col("_nsq").alias("_nsq_b"))
    out = (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "cos",
            rnd(
                F.col("_dot")
                / (F.sqrt(F.col("_nsq_a").cast("double")) * F.sqrt(F.col("_nsq_b").cast("double"))),
                4,
            ),
        )
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
    return _unpersist_with(out, hs, weights)
