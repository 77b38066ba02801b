"""Pure-Python pins for bench.py's replication devices (no Spark).

The factor-16 scale probes (VERDICT r08 item 4) rest on every replica
being content-distinct from every other — a repeated transform would
make replicas near-duplicates of each other and turn the minhash /
passage / webtext ratios into candidate-blowup measurements instead of
workload-growth ones. These pins keep that property honest.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def test_rotations_distinct_up_to_25():
    pairs = bench._rotations(25)
    assert len(pairs) == len(set(pairs)) == 25
    # each is a permutation-pair of the two alphabets
    for v, c in pairs:
        assert sorted(v) == list("aeiou")
        assert sorted(c) == list("bcdfg")


def test_rotations_transform_outputs_pairwise_distinct():
    """Applying the 16 translate pairs to a sample text yields 16
    pairwise-distinct strings (the property the probes rely on)."""
    text = "the quick brown fox jumps over the lazy dog again and again"
    outs = set()
    for v, c in bench._rotations(16):
        table = str.maketrans("aeioubcdfg", v + c)
        outs.add(text.translate(table))
    assert len(outs) == 16


def test_rotations_overflow_raises():
    with pytest.raises(ValueError):
        bench._rotations(26)


def test_jvm_telemetry_error_path_returns_sentinels():
    """Telemetry must never fail a record: a broken/absent gateway
    yields -1 sentinels, and _gc_delta propagates them instead of
    computing a nonsense difference."""

    class _Boom:
        @property
        def _jvm(self):
            raise RuntimeError("no gateway")

    t = bench._jvm_telemetry(_Boom())
    assert t == {"gc_ms": -1, "heap_used_mb": -1}
    ok = {"gc_ms": 100, "heap_used_mb": 1}
    assert bench._gc_delta(t, ok) == -1
    assert bench._gc_delta(ok, t) == -1
    assert bench._gc_delta({"gc_ms": 40, "heap_used_mb": 1}, ok) == 60


def test_passage_probe_runs_first_in_probes_session():
    """VERDICT r09 item 2: the passage probe runs on the fresh probes
    session BEFORE any other probe's allocations, so a repeat of the
    r09 137x print cannot be blamed on inherited memory pressure.
    Pinned on the source since the probes tuple is local to main()."""
    import inspect

    src = inspect.getsource(bench.main)
    first = src.index('("passage_scale_probe", _passage_scale_probe)')
    assert first < src.index('("skew_guard", _skew_guard)')


def test_flagship_probes_registered():
    """The on-mission SemDeDup / Bloom-decontam flagships carry bench
    numbers (round-10): both probes exist and are wired into main()."""
    import inspect

    src = inspect.getsource(bench.main)
    assert '("semdedup_probe", _semdedup_probe)' in src
    assert '("decontam_probe", _decontam_probe)' in src
