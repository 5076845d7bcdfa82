"""Unit tests for the from-spec Roaring bitmap codec."""

from __future__ import annotations

import random

import pytest

from nibbler_spark.operators.roaring import (
    RoaringFormatError,
    roaring_deserialize,
    roaring_serialize,
)


def test_roundtrip_across_container_kinds():
    rnd = random.Random(9)
    cases = [
        {0},
        {65535, 65536, 1 << 31, (1 << 32) - 1},
        set(range(100000, 165536)),  # run containers
        set(rnd.randrange(1 << 20) for _ in range(5000)),  # arrays
        set(range(0, 300000, 2)),  # dense even bits: bitmap containers
        set(rnd.randrange(1 << 32) for _ in range(3000)),
    ]
    for c in cases:
        assert roaring_deserialize(roaring_serialize(c)) == c


def test_run_container_compactness():
    dense = set(range(100000, 165536))
    assert len(roaring_serialize(dense)) < 40  # 65536 values, ~25 bytes


def test_container_kind_boundaries():
    """Cardinality 4096 stays array; 4097 scattered becomes bitmap;
    consecutive always run-wins."""
    arr = set(range(0, 8192, 2))  # exactly 4096 scattered values
    assert roaring_deserialize(roaring_serialize(arr)) == arr
    big = set(range(0, 2 * 4097, 2))
    assert roaring_deserialize(roaring_serialize(big)) == big
    run = set(range(5000))
    z = roaring_serialize(run)
    assert len(z) < 30 and roaring_deserialize(z) == run


def test_rejects_out_of_range_and_bad_cookie():
    with pytest.raises(RoaringFormatError):
        roaring_serialize({1 << 32})
    with pytest.raises(RoaringFormatError):
        roaring_deserialize(b"\x00\x00\x00\x00\x00\x00\x00\x00")


def test_fuzz_roundtrip():
    rnd = random.Random(31)
    for _ in range(40):
        s = set()
        for _ in range(rnd.randrange(1, 6)):
            kind = rnd.random()
            base = rnd.randrange(1 << 16) << 16
            if kind < 0.33:
                s.update(base + v for v in rnd.sample(range(65536), rnd.randrange(1, 400)))
            elif kind < 0.66:
                start = rnd.randrange(60000)
                s.update(base + v for v in range(start, start + rnd.randrange(1, 5000)))
            else:
                s.update(base + v for v in range(0, 65536, rnd.choice([2, 3, 5])))
        assert roaring_deserialize(roaring_serialize(s)) == s
