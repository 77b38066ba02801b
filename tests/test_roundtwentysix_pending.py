"""Round-26 staging area (plans/roundtwentysix_pending.py): the
tuning-curve wave — driver-shaped oracle checks, plan hygiene, and
pure-Python recounts (full TextRank replay, blocking-quality laws,
OOV recount, session-sweep monotonicity)."""

from __future__ import annotations

import math
import os

import pytest

from spotify_data_pipeline_spark.plans.roundtwentysix_pending import (
    _ER_DUP_MOD,
    _GAP_MINUTES,
    _OOV_VOCAB,
    _TR_STEPS,
    _TR_TOP,
    PENDING,
)
from tests.oracle_check import compare, run_oracle

SF_DIR = os.environ.get("ORACLE_SF", "/root/testdata/sf0.001")


@pytest.mark.parametrize("pq", PENDING, ids=lambda pq: pq.name)
def test_pending_oracle_match(spark, pq):
    result = pq.fn(spark, SF_DIR)
    oracle = run_oracle(pq.oracle, SF_DIR)
    errs = compare(result, oracle)
    assert not errs, f"{pq.name}: " + "; ".join(errs)
    assert len(oracle) > 0, f"{pq.name}: vacuous (0 oracle rows) at {SF_DIR}"


def test_pending_registered(spark):
    """Round-10 activated the whole module (plans/active.py,
    NOTES_r09 §9 order)."""
    from spotify_data_pipeline_spark.plans import all_queries
    from spotify_data_pipeline_spark.plans.active import R26_ACTIVATED

    qs = all_queries()
    assert set(R26_ACTIVATED) == {pq.name for pq in PENDING}
    for pq in PENDING:
        assert pq.name in qs and qs[pq.name].fn is pq.fn
        assert qs[pq.name].oracle == pq.oracle


def test_pending_names_unique_and_oracle_bearing():
    names = [pq.name for pq in PENDING]
    assert len(names) == len(set(names))
    assert all(pq.oracle for pq in PENDING)
    import importlib

    for mod in (
        "roundtwentyone_pending",
        "roundtwentytwo_pending",
        "roundtwentythree_pending",
        "roundtwentyfour_pending",
        "roundtwentyfive_pending",
    ):
        earlier = importlib.import_module(
            f"spotify_data_pipeline_spark.plans.{mod}"
        ).PENDING
        assert not set(names) & {pq.name for pq in earlier}


def _plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# whitelisted bounded nested-loop sides (all 1-row stat broadcasts):
#   er_blocking_quality — the per-strategy 1-row cand/truth/n assembly
_BNLJ_OK = {"er_blocking_quality"}


@pytest.mark.parametrize("pq", PENDING, ids=lambda pq: pq.name)
def test_plans_no_unexpected_nested_loop(spark, pq):
    plan = _plan_of(pq.fn(spark, SF_DIR))
    if pq.name in _BNLJ_OK:
        return
    assert "BroadcastNestedLoopJoin" not in plan, pq.name
    assert "CartesianProduct" not in plan, pq.name


# ---------------------------------------------------------------------------
# recounts
# ---------------------------------------------------------------------------


def _q(name):
    return next(p for p in PENDING if p.name == name)


def _rows(spark, tbl):
    from spotify_data_pipeline_spark.io import load_table

    return load_table(spark, SF_DIR, tbl).collect()


def _py_tokens(text: str) -> list[str]:
    t = " ".join(text.split()).strip().lower()
    return t.split(" ") if t else []


def _doc_rows(spark):
    return [
        r
        for r in _rows(spark, "documents")
        if r.text is not None and r.text.strip()
    ]


def _trunc_div(a: int, d: int) -> int:
    q = abs(a) // d
    return q if a >= 0 else -q


def test_textrank_python_replay(spark):
    rows = _q("graph_textrank_keywords").fn(spark, SF_DIR).collect()
    assert len(rows) == _TR_TOP
    edges = set()
    for d in _doc_rows(spark):
        toks = _py_tokens(d.text)
        for a, b in zip(toks, toks[1:]):
            if a != b:
                edges.add((min(a, b), max(a, b)))
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {u: len(vs) for u, vs in adj.items()}
    r = {u: 1_000_000 for u in adj}
    for _ in range(_TR_STEPS):
        r = {
            v: 150_000 + (85 * sum(r[u] // deg[u] for u in adj[v])) // 100
            for v in adj
        }
    order = sorted(r, key=lambda u: (-r[u], u))[:_TR_TOP]
    expect = [(u, r[u], deg[u]) for u in order]
    got = [(x.token, x.rank_e6, x.degree) for x in rows]
    assert got == expect
    # higher-degree hubs rank above leaves on average (centrality is
    # doing something frequency alone would not): the top token's
    # degree is at least the median degree
    degs = sorted(deg.values())
    assert got[0][2] >= degs[len(degs) // 2]


def test_blocking_quality_recount_and_tradeoff(spark):
    rows = _q("er_blocking_quality").fn(spark, SF_DIR).collect()
    cust = _rows(spark, "customer")
    ents = []
    for c in cust:
        ents.append((c.c_custkey, 0, c.c_name, c.c_nationkey, c.c_mktsegment))
        if c.c_custkey % _ER_DUP_MOD == 0:
            pos = c.c_custkey % 9 + 10
            nm = c.c_name[: pos - 1] + "X" + c.c_name[pos:]
            ents.append((c.c_custkey, 1, nm, c.c_nationkey, c.c_mktsegment))
    n = len(ents)
    all_pairs = n * (n - 1) // 2

    def measure(keyfn):
        blocks: dict = {}
        for e in ents:
            blocks[keyfn(e)] = blocks.get(keyfn(e), 0) + 1
        cand = sum(c * (c - 1) // 2 for c in blocks.values())
        origs = {e[0]: keyfn(e) for e in ents if e[1] == 0}
        dups = {e[0]: keyfn(e) for e in ents if e[1] == 1}
        true_pairs = len(dups)
        found = sum(1 for k, v in dups.items() if origs[k] == v)
        return (
            cand,
            true_pairs,
            found,
            (found * 1_000_000) // true_pairs,
            1_000_000 - (cand * 1_000_000) // all_pairs,
        )

    expect = {
        "name_prefix": measure(lambda e: e[2][13:17]),
        "nation_segment": measure(lambda e: f"{e[3]}|{e[4]}"),
    }
    got = {
        r.strategy: (
            r.candidate_pairs,
            r.true_pairs,
            r.found_pairs,
            r.completeness_ppm,
            r.reduction_ppm,
        )
        for r in rows
    }
    assert got == expect
    # invariants the synthesis guarantees: the dim blocking never
    # misses (the mutation never touches nation/segment); the digit
    # window loses exactly the in-window mutations; both block
    # meaningfully; and the scorecard discriminates (the two
    # strategies differ on both axes — the query's reason to exist)
    assert got["nation_segment"][3] == 1_000_000
    assert got["name_prefix"][3] < 1_000_000
    assert all(v[4] > 0 for v in got.values())
    assert got["name_prefix"][3] != got["nation_segment"][3]
    assert got["name_prefix"][4] != got["nation_segment"][4]


def test_oov_python_recount(spark):
    rows = _q("llm_oov_rate").fn(spark, SF_DIR).collect()
    docs = _doc_rows(spark)
    tf: dict = {}
    per_source: dict = {}
    for d in docs:
        toks = _py_tokens(d.text)
        per_source.setdefault(d.source, []).extend(toks)
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
    vocab = set(sorted(tf, key=lambda t: (-tf[t], t))[:_OOV_VOCAB])
    expect = {}
    for src, toks in per_source.items():
        oov = [t for t in toks if t not in vocab]
        expect[src] = (
            len(toks),
            len(oov),
            len(set(oov)),
            (len(oov) * 1_000_000) // len(toks),
        )
    got = {
        r.source: (r.n_tokens, r.oov_tokens, r.oov_types, r.oov_ppm)
        for r in rows
    }
    assert got == expect
    # the cut excludes a real tail — some OOV exists somewhere
    assert any(v[1] > 0 for v in got.values())


def test_session_sweep_recount_and_monotone(spark):
    rows = _q("events_session_gap_sweep").fn(spark, SF_DIR).collect()
    assert len(rows) == len(_GAP_MINUTES)
    ev = sorted(
        ((r.user_id, r.ts) for r in _rows(spark, "events")),
        key=lambda x: (x[0], x[1]),
    )
    import datetime as dt

    epoch = dt.datetime(1970, 1, 1)

    def to_us(ts):
        td = ts.replace(tzinfo=None) - epoch
        return (td.days * 86_400 + td.seconds) * 1_000_000 + td.microseconds

    by_user: dict = {}
    for uid, ts in ev:
        by_user.setdefault(uid, []).append(to_us(ts))
    expect = {}
    for m in _GAP_MINUTES:
        lim = m * 60_000_000
        n_sessions = n_events = span_total = 0
        for times in by_user.values():
            start = times[0]
            prev = times[0]
            count = 1
            for t in times[1:]:
                if t - prev > lim:
                    n_sessions += 1
                    n_events += count
                    span_total += (prev - start) // 1_000_000
                    start, count = t, 1
                else:
                    count += 1
                prev = t
            n_sessions += 1
            n_events += count
            span_total += (prev - start) // 1_000_000
        expect[m] = (
            n_sessions,
            n_events,
            n_events // n_sessions,
            span_total // n_sessions,
        )
    got = {
        r.gap_min: (
            r.n_sessions,
            r.n_events,
            r.mean_events_per_session,
            r.mean_span_s,
        )
        for r in rows
    }
    assert got == expect
    # larger gaps merge sessions: counts non-increasing, mean length
    # non-decreasing
    ms = sorted(got)
    counts = [got[m][0] for m in ms]
    assert counts == sorted(counts, reverse=True)
    lengths = [got[m][2] for m in ms]
    assert lengths == sorted(lengths)
