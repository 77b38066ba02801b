"""Round-22 staging area (plans/roundtwentytwo_pending.py): the
physical-design wave — driver-shaped oracle checks, plan hygiene,
and independent pure-Python recounts of every layout simulation."""

from __future__ import annotations

import datetime as dt
import math
import os

import pytest

from spotify_data_pipeline_spark.plans.roundtwentytwo_pending import (
    _CPT_FILE_KEY,
    _CPT_TARGET,
    _CPT_TOP_BINS,
    _RG_HI,
    _RG_LO,
    _RG_ROWS,
    _SPA_TARGETS,
    _Z_BITS,
    _Z_RANGES,
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
    from spotify_data_pipeline_spark.plans.active import R22_ACTIVATED

    qs = all_queries()
    assert set(R22_ACTIVATED) == {pq.name for pq in PENDING}
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
    from spotify_data_pipeline_spark.plans.roundtwenty_pending import PENDING as P20
    from spotify_data_pipeline_spark.plans.roundtwentyone_pending import (
        PENDING as P21,
    )

    for earlier in (P18, P19, P20, P21):
        assert not set(names) & {pq.name for pq in earlier}


def _plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# whitelisted bounded nested-loop sides:
#   warehouse_zorder_audit — the 1-row row-count broadcast feeding the
#   equal-range cut (appears once per layout branch)
_BNLJ_OK = {"warehouse_zorder_audit"}


@pytest.mark.parametrize("pq", PENDING, ids=lambda pq: pq.name)
def test_plans_no_unexpected_nested_loop(spark, pq):
    plan = _plan_of(pq.fn(spark, SF_DIR))
    if pq.name in _BNLJ_OK:
        return
    assert "BroadcastNestedLoopJoin" not in plan, pq.name
    assert "CartesianProduct" not in plan, pq.name


# ---------------------------------------------------------------------------
# pure-Python recounts
# ---------------------------------------------------------------------------


def _rows(spark, tbl):
    from spotify_data_pipeline_spark.io import load_table

    return load_table(spark, SF_DIR, tbl).collect()


def _q(name):
    return next(p for p in PENDING if p.name == name)


def _morton(x: int, y: int) -> int:
    z = 0
    for b in range(_Z_BITS):
        z += ((x >> b) & 1) << (2 * b + 1)
        z += ((y >> b) & 1) << (2 * b)
    return z


def test_zorder_python_recount(spark):
    rows = _q("warehouse_zorder_audit").fn(spark, SF_DIR).collect()
    cust = _rows(spark, "customer")
    pts = []
    for c in cust:
        cents = math.floor(c.c_acctbal * 100 + 0.5)
        x = min(255, max(0, ((cents + 100000) * 256) // 1101000))
        y = min(255, c.c_nationkey * 10)
        pts.append((c.c_custkey, x, y, _morton(x, y)))
    n = len(pts)

    def summarize(key):
        order = sorted(pts, key=key)
        spans = {}
        for rn, (_, x, y, _z) in enumerate(order, start=1):
            rid = ((rn - 1) * _Z_RANGES) // n
            s = spans.setdefault(rid, [x, x, y, y])
            s[0], s[1] = min(s[0], x), max(s[1], x)
            s[2], s[3] = min(s[2], y), max(s[3], y)
        areas = [
            (s[1] - s[0] + 1) * (s[3] - s[2] + 1) for s in spans.values()
        ]
        return (
            len(areas),
            sum(areas),
            max(areas),
            sum(areas) // _Z_RANGES,
        )

    expect = {
        "zorder": summarize(lambda p: (p[3], p[0])),
        "linear": summarize(lambda p: (p[1], p[2], p[0])),
    }
    got = {
        r.layout: (r.n_ranges, r.sum_bbox_area, r.max_bbox_area, r.avg_bbox_area)
        for r in rows
    }
    assert got == expect
    # the audit discriminates: the two layouts give different boxes
    assert got["zorder"][1] != got["linear"][1]


def test_compaction_python_recount(spark):
    rows = _q("ops_compaction_plan").fn(spark, SF_DIR).collect()
    li = _rows(spark, "lineitem")
    files: dict[int, int] = {}
    for r in li:
        fid = r.l_orderkey // _CPT_FILE_KEY
        files[fid] = files.get(fid, 0) + 68 + len(r.l_returnflag) + len(
            r.l_linestatus
        )
    bins: dict[int, list[int]] = {}
    cum = 0
    for fid in sorted(files):
        b = cum // _CPT_TARGET
        cur = bins.setdefault(b, [0, 0])
        cur[0] += 1
        cur[1] += files[fid]
        cum += files[fid]
    expect = [
        (b, bins[b][0], bins[b][1], (bins[b][1] * 1_000_000) // _CPT_TARGET)
        for b in sorted(bins)[:_CPT_TOP_BINS]
    ]
    got = [(r.bin_id, r.n_files, r.bin_bytes, r.fill_ppm) for r in rows]
    assert got == expect
    # every bin except possibly the last is filled to >= target
    for b, _, bb, _ in expect[:-1]:
        assert bb >= _CPT_TARGET or b == expect[-1][0]


def test_shuffle_advice_python_recount(spark):
    rows = _q("ops_shuffle_partition_advice").fn(spark, SF_DIR).collect()
    specs = {
        "lineitem": (68, ("l_returnflag", "l_linestatus")),
        "orders": (32, ("o_orderstatus", "o_orderpriority")),
        "customer": (20, ("c_name", "c_mktsegment")),
        "events": (32, ("event_type", "props")),
    }
    expect = []
    for tbl in sorted(specs):
        fixed, cols = specs[tbl]
        data = _rows(spark, tbl)
        nb = sum(fixed + sum(len(getattr(r, c)) for c in cols) for r in data)
        for t in sorted(_SPA_TARGETS):
            expect.append((tbl, len(data), nb, t, max(1, (nb + t - 1) // t)))
    got = [
        (r.tbl, r.n_rows, r.est_bytes, r.target_bytes, r.advised_partitions)
        for r in rows
    ]
    assert got == expect


def _ts(s):
    return dt.datetime.strptime(s, "%Y-%m-%d %H:%M:%S")


def test_rowgroup_skipping_python_recount(spark):
    rows = _q("warehouse_rowgroup_skipping").fn(spark, SF_DIR).collect()
    li = _rows(spark, "lineitem")
    lo, hi = _ts(_RG_LO), _ts(_RG_HI)

    def norm(t):
        return t.replace(tzinfo=None)

    def summarize(key):
        order = sorted(li, key=key)
        groups: dict[int, list] = {}
        for rn, r in enumerate(order, start=1):
            rg = (rn - 1) // _RG_ROWS
            g = groups.setdefault(rg, [norm(r.l_shipdate), norm(r.l_shipdate), 0])
            g[0] = min(g[0], norm(r.l_shipdate))
            g[1] = max(g[1], norm(r.l_shipdate))
            g[2] += 1
        n_skipped = sum(1 for g in groups.values() if g[1] < lo or g[0] >= hi)
        scanned = sum(
            g[2] for g in groups.values() if not (g[1] < lo or g[0] >= hi)
        )
        n = len(groups)
        return (n, n_skipped, (n_skipped * 1_000_000) // n, scanned)

    expect = {
        "shipdate_sorted": summarize(
            lambda r: (norm(r.l_shipdate), r.l_orderkey, r.l_linenumber)
        ),
        "orderkey_natural": summarize(
            lambda r: (r.l_orderkey, r.l_linenumber)
        ),
    }
    got = {
        r.layout: (r.n_groups, r.n_skipped, r.skipped_ppm, r.rows_scanned)
        for r in rows
    }
    assert got == expect
    # the sorted layout skips strictly more than the natural one
    assert (
        got["shipdate_sorted"][1] > got["orderkey_natural"][1]
    ), got


def test_partition_layout_python_recount(spark):
    rows = _q("warehouse_partition_layout_cost").fn(spark, SF_DIR).collect()
    orders = _rows(spark, "orders")
    lo, hi = _ts(_RG_LO), _ts(_RG_HI)
    days: dict = {}
    for r in orders:
        d = r.o_orderdate.replace(
            hour=0, minute=0, second=0, microsecond=0, tzinfo=None
        )
        b = 32 + len(r.o_orderstatus) + len(r.o_orderpriority)
        t = 1 if lo <= r.o_orderdate.replace(tzinfo=None) < hi else 0
        g = days.setdefault(d, [0, 0, 0])
        g[0] += 1
        g[1] += b
        g[2] = max(g[2], t)

    def roll(grouper):
        parts: dict = {}
        for d, (rws, byt, tch) in days.items():
            k = grouper(d)
            p = parts.setdefault(k, [0, 0, 0])
            p[0] += rws
            p[1] += byt
            p[2] = max(p[2], tch)
        total_b = sum(p[1] for p in parts.values())
        touched = [p for p in parts.values() if p[2] == 1]
        sb = sum(p[1] for p in touched)
        return (
            len(parts),
            len(touched),
            sum(p[0] for p in touched),
            sb,
            (sb * 1_000_000) // total_b,
        )

    expect = {
        "day": roll(lambda d: d),
        "month": roll(lambda d: d.replace(day=1)),
        "none": roll(lambda d: 0),
    }
    got = {
        r.layout: (
            r.partitions_total,
            r.partitions_touched,
            r.rows_scanned,
            r.bytes_scanned,
            r.scan_ppm,
        )
        for r in rows
    }
    assert got == expect
    # finer partitioning never scans more: day <= month <= none
    assert got["day"][3] <= got["month"][3] <= got["none"][3]
    assert got["day"][3] < got["none"][3]
