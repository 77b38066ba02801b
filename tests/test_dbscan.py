"""DBSCAN composition (operators/dbscan.py): equivalence with an
independent pure-Python DBSCAN (grid-bucketed neighbors + union-find)
under the same determinism contract. Runs at ORACLE_SF like the
pending suites — at sf0.1 this model IS the third-scale proof (the
recursive-CTE oracle's transitive closure is infeasible there)."""

from __future__ import annotations

import math
import os

import pandas as pd

from spotify_data_pipeline_spark.plans.roundeleven_pending import (
    _DB_EPS_BUDGET,
    _DB_MINPTS,
    ml_dbscan_customers_query,
)

SF_DIR = os.environ.get("ORACLE_SF", "/root/testdata/sf0.001")


def _python_dbscan(sf_dir: str):
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")[
        ["o_custkey", "o_totalprice"]
    ]
    orders["cents"] = [math.floor(p * 100 + 0.5) for p in orders.o_totalprice]
    per = orders.groupby("o_custkey").cents.agg(["sum", "max"])
    m = len(per)
    maxc, maxcm = int(per["sum"].max()), int(per["max"].max())
    eps2 = _DB_EPS_BUDGET // m
    w = int(math.floor(math.sqrt(eps2))) + 1
    pts = {
        int(i): (int(r["sum"]) * 10000 // (maxc + 1), int(r["max"]) * 10000 // (maxcm + 1))
        for i, r in per.iterrows()
    }
    grid: dict = {}
    for i, (x, y) in pts.items():
        grid.setdefault((x // w, y // w), []).append(i)
    nbrs: dict = {i: [] for i in pts}
    for i, (x, y) in pts.items():
        cx, cy = x // w, y // w
        for ox in (-1, 0, 1):
            for oy in (-1, 0, 1):
                for j in grid.get((cx + ox, cy + oy), ()):
                    if j != i:
                        xj, yj = pts[j]
                        if (x - xj) ** 2 + (y - yj) ** 2 <= eps2:
                            nbrs[i].append(j)
    core = {i for i, ns in nbrs.items() if len(ns) >= _DB_MINPTS}

    parent = {i: i for i in core}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i in core:
        for j in nbrs[i]:
            if j in core:
                ra, rb = find(i), find(j)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    label = {}
    for i in core:
        comp = find(i)
        # canonical min-id per component
        label[i] = comp
    # normalize to true minimum per component
    comp_min: dict = {}
    for i, c in label.items():
        comp_min[c] = min(comp_min.get(c, i), i)
    label = {i: comp_min[find(i)] for i in core}
    border = {}
    for i in pts:
        if i in core:
            continue
        cands = [label[j] for j in nbrs[i] if j in core]
        if cands:
            border[i] = min(cands)
    noise = set(pts) - core - set(border)
    sizes: dict = {}
    for c in list(label.values()) + list(border.values()):
        sizes[c] = sizes.get(c, 0) + 1
    return {
        "n_points": m,
        "n_core": len(core),
        "n_border": len(border),
        "n_noise": len(noise),
        "n_clusters": len(sizes),
        "largest_cluster": max(sizes.values()) if sizes else None,
    }


def test_summary_matches_python_union_find(spark):
    r = ml_dbscan_customers_query(spark, SF_DIR).collect()[0]
    expect = _python_dbscan(SF_DIR)
    got = {k: getattr(r, k) for k in expect}
    assert got == expect
    # the census partitions the point set and every branch bites
    assert r.n_core + r.n_border + r.n_noise == r.n_points
    assert min(r.n_core, r.n_border, r.n_noise, r.n_clusters) > 0
