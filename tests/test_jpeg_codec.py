"""Unit tests for the dependency-free baseline JPEG codec."""

from __future__ import annotations

import random

import pytest

from nibbler_spark.operators.jpeg_codec import (
    JpegFormatError,
    _canonical_codes,
    _build_decode_table,
    _DC_BITS,
    _DC_VALS,
    decode_jpeg_gray,
    encode_jpeg_gray,
)


def test_canonical_tables_are_prefix_free_and_self_consistent():
    enc = _canonical_codes(_DC_BITS, _DC_VALS)
    dec = _build_decode_table(_DC_BITS, _DC_VALS)
    for sym, (code, length) in enc.items():
        assert dec[(length, code)] == sym
    codes = sorted(
        f"{code:0{length}b}" for code, length in enc.values()
    )
    for i, c in enumerate(codes[:-1]):
        assert not codes[i + 1].startswith(c)  # prefix-free


def test_constant_block_images_decode_exactly():
    """Piecewise-constant 8x8 blocks + unit quant table: the DCT round
    trip is exactly lossless — the property the declared oracle uses."""
    for w, h in [(8, 8), (16, 8), (13, 7), (24, 17), (1, 2)]:
        def px(x, y):
            return ((x // 8) * 37 + (y // 8) * 91 + 5) % 256

        d = decode_jpeg_gray(encode_jpeg_gray(w, h, px))
        expect = sum(px(x, y) for x in range(w) for y in range(h))
        assert (d["width"], d["height"], d["pixel_sum"]) == (w, h, expect)


def test_random_images_roundtrip_within_one_gray_level_per_pixel():
    rnd = random.Random(11)
    w = h = 16
    for _ in range(3):
        img = [[rnd.randrange(256) for _ in range(w)] for _ in range(h)]
        d = decode_jpeg_gray(
            encode_jpeg_gray(w, h, lambda x, y: img[y][x])
        )
        expect = sum(sum(r) for r in img)
        assert abs(d["pixel_sum"] - expect) <= w * h


def test_decoder_rejects_progressive_and_truncation():
    buf = bytearray(encode_jpeg_gray(8, 8, lambda x, y: 100))
    sof = buf.index(b"\xff\xc0")
    buf[sof + 1] = 0xC2  # pretend progressive
    with pytest.raises(JpegFormatError, match="non-baseline"):
        decode_jpeg_gray(bytes(buf))
    with pytest.raises(JpegFormatError):
        decode_jpeg_gray(b"\x89PNG")


def test_magic_dispatch_routes_jpeg():
    from nibbler_spark.operators.multimodal import decode_image

    buf = encode_jpeg_gray(8, 8, lambda x, y: 42)
    assert decode_image(buf)["fmt"] == "jpeg"
