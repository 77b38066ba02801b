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
