"""Round-20 staging area (plans/roundtwenty_pending.py): BPE phrase-
merge training — driver-shaped oracle checks plus an independent
pure-Python BPE trainer recount."""

from __future__ import annotations

import os
from collections import Counter

import pytest

from spotify_data_pipeline_spark.plans.roundtwenty_pending import (
    _ROUNDS,
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
    """Round-9 activated the whole module (window positions 0-1, the BPE merge-training pair first per VERDICT r08 item 1)."""
    from spotify_data_pipeline_spark.plans import all_queries
    from spotify_data_pipeline_spark.plans.active import R20_ACTIVATED

    qs = all_queries()
    assert set(R20_ACTIVATED) == {pq.name for pq in PENDING}
    for pq in PENDING:
        assert pq.name in qs and qs[pq.name].fn is pq.fn
        assert qs[pq.name].oracle == pq.oracle


def test_pending_names_unique_and_oracle_bearing():
    names = [pq.name for pq in PENDING]
    assert len(names) == len(set(names))
    assert all(pq.oracle for pq in PENDING)
    from spotify_data_pipeline_spark.plans.roundeighteen_pending import (
        PENDING as P18,
    )
    from spotify_data_pipeline_spark.plans.roundnineteen_pending import (
        PENDING as P19,
    )

    for earlier in (P18, P19):
        assert not set(names) & {pq.name for pq in earlier}


def _plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# both queries apply each learned merge via a 1-row broadcast of the
# selected pair (the documented broadcast-1-row pattern)
_BNLJ_OK = {"llm_bpe_phrase_merges", "llm_bpe_compression_curve"}


@pytest.mark.parametrize("pq", PENDING, ids=lambda pq: pq.name)
def test_plans_no_unexpected_nested_loop(spark, pq):
    plan = _plan_of(pq.fn(spark, SF_DIR))
    if pq.name in _BNLJ_OK:
        return
    assert "BroadcastNestedLoopJoin" not in plan, pq.name
    assert "CartesianProduct" not in plan, pq.name


def _py_tokens(text: str) -> list[str]:
    t = " ".join(text.split()).strip().lower()
    return t.split(" ") if t else []


def _py_bpe(docs: list[list[str]], rounds: int):
    """Independent BPE trainer: symbol sequences, greedy left-to-right
    merge application, (count DESC, pair ASC) selection. Pair order
    for the tiebreak matches the engines' STRING comparison on the
    marker-wrapped pair text."""
    state = [list(d) for d in docs if d]
    merges = []
    curve = []

    def stats():
        total = sum(len(d) for d in state)
        distinct = len({s for d in state for s in d})
        return total, distinct

    curve.append(stats())
    for _ in range(rounds):
        counts = Counter()
        for d in state:
            for i in range(len(d) - 1):
                counts[(d[i], d[i + 1])] += 1
        wrapped = {
            p: f"\x02{p[0]}\x03 \x02{p[1]}\x03" for p in counts
        }
        best = min(counts, key=lambda p: (-counts[p], wrapped[p]))
        merges.append((best, counts[best]))
        new_state = []
        for d in state:
            out, i = [], 0
            while i < len(d):
                if i + 1 < len(d) and (d[i], d[i + 1]) == best:
                    out.append(d[i] + "\x1f" + d[i + 1])
                    i += 2
                else:
                    out.append(d[i])
                    i += 1
            new_state.append(out)
        state = new_state
        curve.append(stats())
    return merges, curve


def test_bpe_python_trainer_recount(spark):
    """The learned merges AND the compression curve equal an
    independent pure-Python BPE trainer on the same corpus."""
    from spotify_data_pipeline_spark.io import load_table
    from spotify_data_pipeline_spark.plans.roundtwenty_pending import (
        llm_bpe_compression_curve_query,
        llm_bpe_phrase_merges_query,
    )

    docs = [
        _py_tokens(r.text)
        for r in load_table(spark, SF_DIR, "documents").collect()
        if r.text is not None and r.text.strip()
    ]
    merges, curve = _py_bpe(docs, _ROUNDS)

    got_merges = llm_bpe_phrase_merges_query(spark, SF_DIR).collect()
    assert len(got_merges) == _ROUNDS
    for r, ((pair, cnt), row) in enumerate(zip(merges, got_merges), start=1):
        assert row.merge_rank == r
        assert row.pair_count == cnt
        assert (
            row.left_symbol.replace(" ", "\x1f"),
            row.right_symbol.replace(" ", "\x1f"),
        ) == pair, f"round {r}"

    got_curve = llm_bpe_compression_curve_query(spark, SF_DIR).collect()
    assert [(r.total_symbols, r.distinct_symbols) for r in got_curve] == curve
    # merges genuinely compress: totals strictly decrease while each
    # selected pair had positive count
    totals = [r.total_symbols for r in got_curve]
    assert all(a > b for a, b in zip(totals, totals[1:]))
