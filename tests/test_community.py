"""Modularity atoms (operators/community.py): equivalence with a
Python recount on random labeled graphs, conservation identities, and
the unlabeled-node policy."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spotify_data_pipeline_spark.operators.community import modularity_atoms


def _canon(edges):
    out = set()
    for a, b in edges:
        if a != b:
            out.add((min(a, b), max(a, b)))
    return sorted(out)


def _python_atoms(edges, labels):
    edges = _canon(edges)
    m = len(edges)
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    per = {}
    for n, d in deg.items():
        lab = labels.get(n)
        if lab is None:
            continue
        nn, ds = per.get(lab, (set(), 0))
        nn.add(n)
        per[lab] = (nn, ds + d)
    intra = {}
    for a, b in edges:
        la, lb = labels.get(a), labels.get(b)
        if la is not None and la == lb:
            intra[la] = intra.get(la, 0) + 1
    return {
        lab: (
            len(nodes),
            ds,
            intra.get(lab, 0),
            m,
            4 * m * intra.get(lab, 0) - ds * ds,
        )
        for lab, (nodes, ds) in per.items()
    }


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    raw=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=1, max_size=40
    ),
    labmod=st.integers(2, 4),
    unlabeled=st.integers(0, 9),
)
def test_atoms_match_python_model(spark, raw, labmod, unlabeled):
    edges = _canon(raw)
    if not edges:
        return
    nodes = sorted({n for e in edges for n in e})
    labels = {n: f"c{n % labmod}" for n in nodes if n != unlabeled}
    edf = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    ldf = spark.createDataFrame(sorted(labels.items()), "node BIGINT, label STRING")
    got = {
        r.label: (r.n_nodes, r.degree_sum, r.intra_edges, r.n_edges, r.q_num)
        for r in modularity_atoms(edf, ldf).collect()
    }
    assert got == _python_atoms(edges, labels)


def test_conservation_identities(spark):
    """With every node labeled: Σ degree_sum = 2m and Σ intra <= m;
    a single all-in-one community has Q·4m² = 4m·m − (2m)² = 0."""
    edges = [(1, 2), (2, 3), (3, 4), (1, 3)]
    edf = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    one = spark.createDataFrame(
        [(n, "all") for n in (1, 2, 3, 4)], "node BIGINT, label STRING"
    )
    rows = modularity_atoms(edf, one).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.degree_sum, r.intra_edges, r.n_edges) == (8, 4, 4)
    assert r.q_num == 0  # the trivial partition has modularity exactly 0

    two = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "b")], "node BIGINT, label STRING"
    )
    rows = {r.label: r for r in modularity_atoms(edf, two).collect()}
    assert sum(r.degree_sum for r in rows.values()) == 2 * 4
    assert sum(r.intra_edges for r in rows.values()) <= 4
