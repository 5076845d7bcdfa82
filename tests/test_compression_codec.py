"""Unit tests for the from-spec LZ4 block and DELTA_BINARY_PACKED
codecs (operators/compression.py)."""

from __future__ import annotations

import random

import pytest

from nibbler_spark.operators.compression import (
    DeltaPackFormatError,
    Lz4FormatError,
    delta_pack,
    delta_unpack,
    lz4_compress,
    lz4_decompress,
)


def test_lz4_roundtrip_across_entropy_regimes():
    rnd = random.Random(7)
    cases = [
        b"",
        b"a",
        b"abc" * 1000,
        bytes(rnd.randrange(256) for _ in range(8000)),
        b"the quick brown fox " * 500,
        bytes(rnd.choice(b"ab") for _ in range(6000)),
        b"x" * 200000,
    ]
    for c in cases:
        z = lz4_compress(c)
        assert lz4_decompress(z, len(c)) == c
        assert len(z) <= len(c) + len(c) // 255 + 16


def test_lz4_overlapping_match_run_generation():
    """offset < match length: the copy must consume its own output —
    the format's RLE trick (offset 1 repeats one byte)."""
    data = b"Q" + b"Q" * 300 + b"tail!"
    z = lz4_compress(data)
    assert len(z) < 30
    assert lz4_decompress(z, len(data)) == data


def test_lz4_rejects_malformed():
    good = lz4_compress(b"hello world, hello world, hello world!!!")
    with pytest.raises(Lz4FormatError):
        lz4_decompress(good[:-3] if len(good) > 3 else b"\xf0", 41)
    # invalid offset: token with match but offset 0
    with pytest.raises(Lz4FormatError):
        lz4_decompress(b"\x14abc\x00\x00", None)


def test_lz4_fuzz_roundtrip():
    rnd = random.Random(42)
    for _ in range(60):
        n = rnd.randrange(0, 3000)
        # mixed structure: random runs + repeated phrases
        parts = []
        while sum(map(len, parts)) < n:
            if rnd.random() < 0.5:
                parts.append(bytes(rnd.randrange(256) for _ in range(rnd.randrange(1, 40))))
            else:
                parts.append(rnd.choice([b"lorem ipsum ", b"aaaa", b"xyz"]) * rnd.randrange(1, 20))
        data = b"".join(parts)[:n]
        assert lz4_decompress(lz4_compress(data), len(data)) == data


def test_delta_pack_roundtrip_and_ratio():
    rnd = random.Random(3)
    for _ in range(50):
        n = rnd.randrange(0, 700)
        vals = [rnd.randrange(-(10**12), 10**12) for _ in range(n)]
        if rnd.random() < 0.5:
            vals.sort()
        assert delta_unpack(delta_pack(vals)) == vals
    run = list(range(5000, 60000, 3))
    z = delta_pack(run)
    assert delta_unpack(z) == run
    assert len(z) < len(run)  # < 1 byte per value on a fixed stride


def test_delta_pack_rejects_malformed():
    z = delta_pack(list(range(300)))
    with pytest.raises(DeltaPackFormatError):
        delta_unpack(z[: len(z) // 2])


def test_snappy_roundtrip_and_tags():
    from nibbler_spark.operators.compression import (
        SnappyFormatError,
        snappy_compress,
        snappy_decompress,
    )

    rnd = random.Random(17)
    cases = [
        b"",
        b"z",
        b"hello hello hello hello!",
        bytes(rnd.randrange(256) for _ in range(9000)),
        b"ab" * 5000,  # long matches -> 64-byte copy splitting
        b"Q" * 120000,  # overlap copies + long-literal tags
        b"lorem ipsum dolor " * 600,
    ]
    for c in cases:
        z = snappy_compress(c)
        assert snappy_decompress(z) == c
    with pytest.raises(SnappyFormatError):
        snappy_decompress(snappy_compress(b"abcdabcdabcdabcd")[:-2])


def test_rle_hybrid_midstream_groups_never_pad():
    """The regression the format demands: a bit-packed span mid-stream
    must cover exactly 8k values (the reader can't see span
    boundaries) — leftovers become short RLE runs."""
    from nibbler_spark.operators.compression import (
        rle_hybrid_decode,
        rle_hybrid_encode,
    )

    # 5 mixed values, then a long run, then 3 more: forces a
    # mid-stream leftover before the run
    vals = [1, 2, 3, 2, 1] + [7] * 20 + [4, 5, 4]
    z = rle_hybrid_encode(vals, 3)
    assert rle_hybrid_decode(z, 3, len(vals)) == vals


def test_rle_hybrid_fuzz():
    from nibbler_spark.operators.compression import (
        rle_hybrid_decode,
        rle_hybrid_encode,
    )

    rnd = random.Random(23)
    for _ in range(150):
        w = rnd.randrange(1, 21)
        n = rnd.randrange(0, 600)
        vals = []
        while len(vals) < n:
            if rnd.random() < 0.5:
                vals += [rnd.randrange(1 << w)] * rnd.randrange(1, 40)
            else:
                vals += [
                    rnd.randrange(1 << w)
                    for _ in range(rnd.randrange(1, 15))
                ]
        vals = vals[:n]
        assert rle_hybrid_decode(rle_hybrid_encode(vals, w), w, n) == vals
