"""From-scratch bzip2 decoder vs the reference implementation (stdlib
libbzip2): byte-exact decode across levels, block counts, data regimes;
CRC-backed corruption detection; malformed-input rejection."""

from __future__ import annotations

import bz2
import os
import random

import pytest

from nibbler_spark.operators.bzip2_codec import (
    Bzip2FormatError,
    bzip2_decompress,
)


def test_roundtrip_all_levels_and_regimes():
    rng = random.Random(5)
    cases = [
        b"",
        b"x",
        b"hello world",
        b"a" * 10000,
        bytes(rng.randrange(256) for _ in range(5000)),
        ("the quick brown fox " * 500).encode(),
        bytes([1, 2, 3, 4]) * 300 + b"\x00" * 999 + b"ends",
        bytes(range(256)) * 40,
        b"\xff" * 255 + b"\x00" * 260,  # RLE1 boundary runs
    ]
    for lvl in (1, 5, 9):
        for data in cases:
            assert bzip2_decompress(bz2.compress(data, lvl)) == data


def test_random_data_forces_many_huffman_groups():
    data = os.urandom(200000)
    assert bzip2_decompress(bz2.compress(data, 9)) == data


def test_multi_block_streams():
    big = b"spark " * 200000  # > level-1 block size, several blocks
    assert bzip2_decompress(bz2.compress(big, 1)) == big


def test_detects_corruption_and_rejects_malformed():
    comp = bz2.compress(b"payload data here " * 100, 9)
    for at in (4, 20, len(comp) // 2, len(comp) - 3):
        bad = bytearray(comp)
        bad[at] ^= 0x10
        with pytest.raises(Bzip2FormatError):
            bzip2_decompress(bytes(bad))
    with pytest.raises(Bzip2FormatError):
        bzip2_decompress(b"not a bzip2 stream")
    with pytest.raises(Bzip2FormatError):
        bzip2_decompress(comp[:-10])


def test_hypothesis_style_fuzz_roundtrip():
    rng = random.Random(11)
    for _ in range(40):
        n = rng.randrange(0, 3000)
        regime = rng.randrange(3)
        if regime == 0:
            data = bytes(rng.randrange(256) for _ in range(n))
        elif regime == 1:
            data = bytes(rng.choice(b"ab") for _ in range(n))
        else:
            data = bytes(
                rng.randrange(4) if rng.random() < 0.9 else rng.randrange(256)
                for _ in range(n)
            )
        lvl = rng.choice((1, 5, 9))
        assert bzip2_decompress(bz2.compress(data, lvl)) == data
