"""Round-23 staging area (plans/roundtwentythree_pending.py): the
numeric-depth wave — driver-shaped oracle checks, plan hygiene, and
independent recounts: the power iteration is recounted step-by-step
in pure integer Python AND cross-checked against numpy's exact
eigendecomposition; the nprobe sweep must hit recall 1e6 ppm when
every cell is probed."""

from __future__ import annotations

import math
import os

import pytest

from spotify_data_pipeline_spark.plans.roundtwentythree_pending import (
    _MIX_ALPHA,
    _NPS_CENTROIDS,
    _NPS_K,
    _NPS_PROBES,
    _NPS_QUERIES,
    _PCA_DIM,
    _PCA_Q,
    _PCA_STEPS,
    _PCA_VSCALE,
    _PSI_BUCKETS,
    _PSI_SPLIT,
    _PSI_WIDTH_CENTS,
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
    from spotify_data_pipeline_spark.plans.active import R23_ACTIVATED

    qs = all_queries()
    assert set(R23_ACTIVATED) == {pq.name for pq in PENDING}
    for pq in PENDING:
        assert pq.name in qs and qs[pq.name].fn is pq.fn
        assert qs[pq.name].oracle == pq.oracle


def test_pending_names_unique_and_oracle_bearing():
    names = [pq.name for pq in PENDING]
    assert len(names) == len(set(names))
    assert all(pq.oracle for pq in PENDING)
    from spotify_data_pipeline_spark.plans.roundtwenty_pending import PENDING as P20
    from spotify_data_pipeline_spark.plans.roundtwentyone_pending import (
        PENDING as P21,
    )
    from spotify_data_pipeline_spark.plans.roundtwentytwo_pending import (
        PENDING as P22,
    )

    for earlier in (P20, P21, P22):
        assert not set(names) & {pq.name for pq in earlier}


def _plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# whitelisted bounded nested-loop sides:
#   sim_pca_power_iteration — the per-step 1-row max-norm broadcast
#   sim_ivf_nprobe_sweep    — the 8-row quantizer / 10-row query
#                             broadcasts (brute anchor included)
#   llm_mix_temperature     — the 1-row weight-total broadcast
_BNLJ_OK = {
    "sim_pca_power_iteration",
    "sim_ivf_nprobe_sweep",
    "llm_mix_temperature",
}


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


def _emb(spark):
    return {
        r.vec_id: [float(x) for x in r.embedding]
        for r in _rows(spark, "embeddings")
    }


def _trunc_div(a: int, d: int) -> int:
    """Truncation-toward-zero integer division (Spark DIV / DuckDB //)."""
    q = abs(a) // d
    return q if a >= 0 else -q


def test_pca_integer_recount_and_numpy_crosscheck(spark):
    rows = _q("sim_pca_power_iteration").fn(spark, SF_DIR).collect()
    assert len(rows) == _PCA_DIM
    vecs = _emb(spark)
    qm = {
        vid: [math.floor(x * _PCA_Q + 0.5) for x in e]
        for vid, e in vecs.items()
    }
    cov = [[0] * _PCA_DIM for _ in range(_PCA_DIM)]
    for q in qm.values():
        for i in range(_PCA_DIM):
            qi = q[i]
            if qi == 0:
                continue
            row = cov[i]
            for j in range(_PCA_DIM):
                row[j] += qi * q[j]
    v = [_PCA_VSCALE] * _PCA_DIM
    for _ in range(_PCA_STEPS):
        u = [
            sum(cov[i][j] * v[j] for j in range(_PCA_DIM))
            for i in range(_PCA_DIM)
        ]
        d = max(1, max(abs(x) for x in u) // _PCA_VSCALE)
        v = [_trunc_div(x, d) for x in u]
    got = {r.dim: r.loading_e5 for r in rows}
    assert got == {i: v[i] for i in range(_PCA_DIM)}
    # cross-check the power-iteration INVARIANTS against numpy's exact
    # eigendecomposition of the SAME integer moment matrix (the
    # spectrum here is nearly flat — eigengap ~1.07 — so 3 steps
    # cannot converge; what must hold is monotone progress):
    # the Rayleigh quotient rises every step and alignment with the
    # true top eigenvector strictly improves every step.
    import numpy as np

    a = np.array(cov, dtype=float)
    w, vecs_np = np.linalg.eigh(a)
    top = vecs_np[:, int(np.argmax(w))]

    def rayleigh(x):
        x = np.array([float(c) for c in x])
        return float(x @ a @ x) / float(x @ x)

    def align(x):
        x = np.array([float(c) for c in x])
        return abs(float(x @ top)) / np.linalg.norm(x)

    vk = [_PCA_VSCALE] * _PCA_DIM
    rayleighs, aligns = [rayleigh(vk)], [align(vk)]
    for _ in range(_PCA_STEPS):
        u = [
            sum(cov[i][j] * vk[j] for j in range(_PCA_DIM))
            for i in range(_PCA_DIM)
        ]
        d = max(1, max(abs(x) for x in u) // _PCA_VSCALE)
        vk = [_trunc_div(x, d) for x in u]
        rayleighs.append(rayleigh(vk))
        aligns.append(align(vk))
    assert vk == v  # trajectory ends at the emitted vector
    assert all(b > a_ for a_, b in zip(rayleighs, rayleighs[1:])), rayleighs
    assert all(b > a_ for a_, b in zip(aligns, aligns[1:])), aligns
    # and the final Rayleigh quotient already beats the average
    # eigenvalue (progress toward the top of the spectrum)
    assert rayleighs[-1] > float(np.mean(w))


def _seq_dot(a, b) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _cos(a, b) -> float:
    return _seq_dot(a, b) / (
        math.sqrt(_seq_dot(a, a)) * math.sqrt(_seq_dot(b, b))
    )


def _rnd4(x: float) -> float:
    return math.floor(x * 10000 + 0.5) / 10000


def test_nprobe_sweep_recount_and_anchor(spark):
    rows = _q("sim_ivf_nprobe_sweep").fn(spark, SF_DIR).collect()
    vecs = _emb(spark)
    cents = {i: vecs[i] for i in range(_NPS_CENTROIDS)}
    cell = {
        vid: max(cents, key=lambda c: (_cos(e, cents[c]), -c))
        for vid, e in vecs.items()
    }
    expect = {}
    for qid in range(_NPS_QUERIES):
        qe = vecs[qid]
        probe_order = sorted(
            cents, key=lambda c: (-_cos(qe, cents[c]), c)
        )
        brute = sorted(
            ((-_rnd4(_cos(qe, v)), nid) for nid, v in vecs.items() if nid != qid)
        )[:_NPS_K]
        brute_set = {nid for _, nid in brute}
        for p in _NPS_PROBES:
            probed = set(probe_order[:p])
            cands = sorted(
                (
                    (-_rnd4(_cos(qe, v)), nid)
                    for nid, v in vecs.items()
                    if nid != qid and cell[nid] in probed
                ),
            )[:_NPS_K]
            ov = len({nid for _, nid in cands} & brute_set)
            expect[p] = expect.get(p, 0) + ov
    got = {r.nprobe: r.overlap_total for r in rows}
    assert got == expect
    ppm = {r.nprobe: r.recall_ppm for r in rows}
    # probing every cell reproduces brute force exactly
    assert ppm[max(_NPS_PROBES)] == 1_000_000
    # recall is monotone in the probe budget
    ordered = [ppm[p] for p in sorted(ppm)]
    assert ordered == sorted(ordered)


def test_psi_python_recount(spark):
    rows = _q("dq_psi_value_drift").fn(spark, SF_DIR).collect()
    assert rows
    import datetime as dt

    split = dt.datetime.strptime(_PSI_SPLIT, "%Y-%m-%d %H:%M:%S")
    ev = _rows(spark, "events")
    counts: dict = {}
    totals: dict = {}
    for r in ev:
        cents = math.floor(r.value * 100 + 0.5)
        b = min(_PSI_BUCKETS - 1, cents // _PSI_WIDTH_CENTS)
        in_a = r.ts.replace(tzinfo=None) < split
        c = counts.setdefault((r.event_type, b), [0, 0])
        c[0 if in_a else 1] += 1
        t = totals.setdefault(r.event_type, [0, 0])
        t[0 if in_a else 1] += 1
    expect = {}
    for et, (n_a, n_b) in totals.items():
        s = 0
        for b in range(_PSI_BUCKETS):
            c_a, c_b = counts.get((et, b), (0, 0))
            pa = (c_a + 1) / (n_a + _PSI_BUCKETS)
            pb = (c_b + 1) / (n_b + _PSI_BUCKETS)
            s += math.floor((pa - pb) * math.log(pa / pb) * 1_000_000 + 0.5)
        expect[et] = (n_a, n_b, s)
    got = {r.event_type: (r.n_a, r.n_b, r.psi_e6) for r in rows}
    assert got == expect
    # PSI is nonnegative by construction (sum of (p-q)ln(p/q) terms)
    assert all(v[2] >= 0 for v in got.values())


def test_mix_temperature_recount_and_flattening(spark):
    rows = _q("llm_mix_temperature").fn(spark, SF_DIR).collect()
    docs = [
        r
        for r in _rows(spark, "documents")
        if r.text is not None and r.text.strip()
    ]
    per_source: dict[str, int] = {}
    for d in docs:
        n = len(" ".join(d.text.split()).strip().lower().split(" "))
        per_source[d.source] = per_source.get(d.source, 0) + n
    w = {
        s: math.floor(math.exp(math.log(n) * _MIX_ALPHA) * 1_000_000 + 0.5)
        for s, n in per_source.items()
    }
    tot_tok, tot_w = sum(per_source.values()), sum(w.values())
    got = {
        r.source: (r.n_tok, r.raw_ppm, r.temp_ppm, r.shift_ppm) for r in rows
    }
    expect = {
        s: (
            n,
            (n * 1_000_000) // tot_tok,
            (w[s] * 1_000_000) // tot_w,
            (w[s] * 1_000_000) // tot_w - (n * 1_000_000) // tot_tok,
        )
        for s, n in per_source.items()
    }
    assert got == expect
    # temperature < 1 flattens: the biggest source loses share, the
    # smallest gains
    biggest = max(per_source, key=per_source.get)
    smallest = min(per_source, key=per_source.get)
    if per_source[biggest] != per_source[smallest]:
        assert got[biggest][3] <= 0
        assert got[smallest][3] >= 0


def test_theil_python_recount(spark):
    rows = _q("agg_theil_index").fn(spark, SF_DIR).collect()
    assert rows
    orders = _rows(spark, "orders")
    groups: dict[str, list[int]] = {}
    for r in orders:
        groups.setdefault(r.o_orderpriority, []).append(
            math.floor(r.o_totalprice * 100 + 0.5)
        )
    expect = {}
    for prio, cents in groups.items():
        n, s = len(cents), sum(cents)
        t = sum(
            math.floor(
                (c * n / s) * math.log(c * n / s) * 1_000_000 + 0.5
            )
            for c in cents
        )
        expect[prio] = (n, t // n)
    got = {r.o_orderpriority: (r.n_orders, r.theil_e6) for r in rows}
    assert got == expect
    # Theil is nonnegative and below ln(n) (maximal concentration)
    for prio, (n, t) in got.items():
        assert 0 <= t <= math.log(n) * 1_000_000 + 1
