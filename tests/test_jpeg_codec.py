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


def test_decoder_rejects_malformed_sof_and_truncation():
    # a baseline stream whose SOF marker is forged to SOF2 now routes
    # to the progressive decoder (r4), which rejects the ill-formed
    # combined DC+AC scan a baseline stream carries
    buf = bytearray(encode_jpeg_gray(8, 8, lambda x, y: 100))
    sof = buf.index(b"\xff\xc0")
    buf[sof + 1] = 0xC2
    with pytest.raises(JpegFormatError, match="share a progressive scan"):
        decode_jpeg_gray(bytes(buf))
    # genuinely unsupported SOF flavors still reject loudly
    buf[sof + 1] = 0xC3  # lossless sequential
    with pytest.raises(JpegFormatError, match="non-baseline"):
        decode_jpeg_gray(bytes(buf))
    with pytest.raises(JpegFormatError):
        decode_jpeg_gray(b"\x89PNG")


def test_magic_dispatch_routes_jpeg():
    from nibbler_spark.operators.multimodal import decode_image

    buf = encode_jpeg_gray(8, 8, lambda x, y: 42)
    assert decode_image(buf)["fmt"] == "jpeg"


# --- color (YCbCr 4:2:0), restart markers, multi-table segments -------


def _mcu_rgb(seed):
    def rgb(x, y):
        mx, my = x // 16, y // 16
        return (
            (seed + 53 * mx + 101 * my) % 256,
            (2 * seed + 71 * mx + 29 * my) % 256,
            (3 * seed + 13 * mx + 59 * my) % 256,
        )

    return rgb


def _expected_color_sums(w, h, rgb):
    from nibbler_spark.operators.jpeg_codec import (
        rgb_to_ycbcr,
        ycbcr_to_rgb,
    )

    rs = gs = bs = 0
    for y in range(h):
        for x in range(w):
            r, g, b = ycbcr_to_rgb(*rgb_to_ycbcr(*rgb(x, y)))
            rs += r
            gs += g
            bs += b
    return rs, gs, bs


def test_color_420_mcu_constant_roundtrip_is_exact():
    """Per-16x16-constant color: chroma averaging and the DCT are both
    exact, so decoded channel sums equal the closed-form conversion."""
    from nibbler_spark.operators.jpeg_codec import (
        decode_jpeg,
        encode_jpeg_color,
    )

    for w, h, dri in [(16, 16, 0), (20, 14, 2), (37, 22, 2), (5, 3, 0)]:
        rgb = _mcu_rgb(w * 31 + h)
        out = decode_jpeg(encode_jpeg_color(w, h, rgb, restart_interval=dri))
        assert out["fmt"] == "jpeg-color"
        assert (out["width"], out["height"]) == (w, h)
        assert (out["r_sum"], out["g_sum"], out["b_sum"]) == (
            _expected_color_sums(w, h, rgb)
        )
        assert out["pixel_sum"] == out["r_sum"] + out["g_sum"] + out["b_sum"]


def test_gray_restart_interval_roundtrip_exact():
    from nibbler_spark.operators.jpeg_codec import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    pix = lambda x, y: (7 + 37 * (x // 8) + 91 * (y // 8)) % 256
    for w, h, dri in [(20, 14, 2), (33, 9, 1), (40, 24, 7)]:
        out = decode_jpeg_gray(
            encode_jpeg_gray(w, h, pix, restart_interval=dri)
        )
        assert out["pixel_sum"] == sum(
            pix(x, y) for x in range(w) for y in range(h)
        )


def test_broken_restart_sequence_is_detected():
    from nibbler_spark.operators.jpeg_codec import (
        JpegFormatError,
        decode_jpeg,
        encode_jpeg_gray,
    )

    buf = bytearray(encode_jpeg_gray(32, 8, lambda x, y: 40, restart_interval=1))
    # find the first RST0 (FF D0) in the scan and bump it to RST5
    i = buf.find(b"\xff\xd0")
    assert i > 0
    buf[i + 1] = 0xD5
    with pytest.raises(JpegFormatError, match="restart sequence"):
        decode_jpeg(bytes(buf))


def test_fill_bytes_before_markers_are_tolerated():
    """T.81 allows any number of 0xFF fill bytes before a marker."""
    from nibbler_spark.operators.jpeg_codec import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    buf = encode_jpeg_gray(8, 8, lambda x, y: 99)
    # insert fill bytes before the SOF0 marker
    i = buf.find(b"\xff\xc0")
    padded = buf[:i] + b"\xff\xff\xff" + buf[i:]
    assert decode_jpeg_gray(padded)["pixel_sum"] == 99 * 64


def test_color_uses_per_id_quant_tables():
    """Chroma rides quant table 1: a coarse chroma table must change
    the decoded output vs a fine one — proving the decoder applies the
    table the component references, not just the first DQT bytes."""
    from nibbler_spark.operators.jpeg_codec import (
        decode_jpeg,
        encode_jpeg_color,
    )

    # gradient chroma so coarse quantization visibly changes values
    def rgb(x, y):
        return (10 * (x % 16), 255 - 10 * (y % 16), (x * 7 + y * 11) % 256)

    fine = decode_jpeg(encode_jpeg_color(32, 32, rgb, chroma_quant=1))
    coarse = decode_jpeg(encode_jpeg_color(32, 32, rgb, chroma_quant=50))
    assert fine["pixel_sum"] != coarse["pixel_sum"]
    # and the luma-driven total stays in the same ballpark (sanity)
    assert abs(fine["pixel_sum"] - coarse["pixel_sum"]) < 0.2 * fine["pixel_sum"]


def test_color_444_all_unit_sampling():
    """3 components all 1x1 (4:4:4): general MCU loop, no subsampling —
    constant image decodes exactly."""
    from nibbler_spark.operators.jpeg_codec import decode_jpeg
    from nibbler_spark.operators import jpeg_codec as J
    import struct

    # build a 4:4:4 encoder inline from the module's primitives
    w = h = 8
    rgb = (40, 90, 200)
    yv, cb, cr = J.rgb_to_ycbcr(*rgb)
    dc = J._canonical_codes(J._DC_BITS, J._DC_VALS)
    ac = J._canonical_codes(J._AC_BITS, J._AC_VALS)
    bw = J._BitWriterMSB()
    for v in (yv, cb, cr):
        J._encode_block_coeffs(
            J._quantized_block([v - 128] * 64, [1] * 64), 0, bw, dc, ac
        )
    scan = bw.finish()
    out = bytearray(b"\xff\xd8")
    dqt = bytes([0]) + bytes([1] * 64)
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(dqt)) + dqt
    sof = struct.pack(">BHHB", 8, h, w, 3) + bytes(
        [1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]
    )
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    dht = (
        bytes([0x00]) + bytes(J._DC_BITS) + bytes(J._DC_VALS)
        + bytes([0x10]) + bytes(J._AC_BITS) + bytes(J._AC_VALS)
    )
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    sos = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += scan + b"\xff\xd9"
    got = decode_jpeg(bytes(out))
    r2, g2, b2 = J.ycbcr_to_rgb(yv, cb, cr)
    assert (got["r_sum"], got["g_sum"], got["b_sum"]) == (
        r2 * 64, g2 * 64, b2 * 64
    )


# --- progressive (SOF2, spectral selection) -------------------------------


def test_progressive_exact_on_piecewise_constant_blocks():
    from nibbler_spark.operators.jpeg_codec import (
        decode_jpeg,
        decode_jpeg_progressive_gray,
        encode_jpeg_gray_progressive,
    )

    for w, h in [(8, 8), (16, 24), (13, 9), (33, 25)]:
        f = lambda x, y: ((x // 8) * 37 + (y // 8) * 91 + 5) % 256
        p = encode_jpeg_gray_progressive(w, h, f)
        d = decode_jpeg_progressive_gray(p)
        assert (d["width"], d["height"]) == (w, h)
        assert d["pixel_sum"] == sum(
            f(x, y) for x in range(w) for y in range(h)
        )
        # the general decoder dispatches SOF2 to the progressive path
        assert decode_jpeg(p)["pixel_sum"] == d["pixel_sum"]
        assert decode_jpeg(p)["fmt"] == "jpeg-progressive"


def test_progressive_matches_baseline_on_random_images():
    import random

    from nibbler_spark.operators.jpeg_codec import (
        decode_jpeg,
        encode_jpeg_gray,
        encode_jpeg_gray_progressive,
    )

    rnd = random.Random(13)
    for _ in range(5):
        w, h = rnd.randint(4, 40), rnd.randint(4, 40)
        img = [[rnd.randrange(256) for _ in range(w)] for _ in range(h)]
        f = lambda x, y: img[y][x]
        prog = decode_jpeg(encode_jpeg_gray_progressive(w, h, f))
        base = decode_jpeg(encode_jpeg_gray(w, h, f))
        # identical coefficients -> identical reconstruction, any image
        assert prog["pixel_sum"] == base["pixel_sum"]


def test_progressive_eobrun_spans_many_blocks():
    """A constant image quantizes every AC band to zero, so each AC
    scan is ONE EOBn code covering all blocks — the progressive-only
    symbol family. The scan must still decode exactly."""
    from nibbler_spark.operators.jpeg_codec import (
        decode_jpeg_progressive_gray,
        encode_jpeg_gray_progressive,
    )

    w = h = 64  # 64 blocks -> EOBRUN 64 = EOB6 + 6 extra bits
    p = encode_jpeg_gray_progressive(w, h, lambda x, y: 200)
    d = decode_jpeg_progressive_gray(p)
    assert d["pixel_sum"] == 200 * w * h


def test_progressive_band_split_variants():
    from nibbler_spark.operators.jpeg_codec import (
        decode_jpeg_progressive_gray,
        encode_jpeg_gray_progressive,
    )

    f = lambda x, y: (x * 7 + y * 3) % 256
    sums = set()
    for bands in (((1, 63),), ((1, 5), (6, 63)), ((1, 2), (3, 20), (21, 63))):
        p = encode_jpeg_gray_progressive(24, 16, f, bands=bands)
        sums.add(decode_jpeg_progressive_gray(p)["pixel_sum"])
    assert len(sums) == 1  # band partitioning never changes the image


def test_progressive_rejects_color_and_structural_errors():
    import pytest

    from nibbler_spark.operators.jpeg_codec import (
        JpegFormatError,
        decode_jpeg_progressive_gray,
        encode_jpeg_gray_progressive,
    )

    p = bytearray(encode_jpeg_gray_progressive(8, 8, lambda x, y: 1))
    # forge a 3-component SOF2: progressive path is grayscale-only
    i = p.find(b"\xff\xc2")
    p[i + 2 + 2 + 5] = 3  # ncomp byte of the SOF payload
    with pytest.raises(JpegFormatError, match="grayscale only"):
        decode_jpeg_progressive_gray(bytes(p))
    # refinement scans may only carry magnitude-1 symbols
    q = bytearray(encode_jpeg_gray_progressive(8, 8, lambda x, y: 1))
    with pytest.raises(JpegFormatError):
        decode_jpeg_progressive_gray(bytes(q[: len(q) // 2]))  # truncated


def test_successive_approximation_reconstructs_exactly():
    """The SA scan ladder (first scans at reduced precision + one
    refinement per bit) must reproduce the EXACT baseline quantized
    coefficients — pixel sums equal the baseline decode on arbitrary
    images, at every Al depth."""
    import random

    from nibbler_spark.operators.jpeg_codec import (
        decode_jpeg,
        encode_jpeg_gray,
        encode_jpeg_gray_progressive_sa,
    )

    rnd = random.Random(31)
    for al in (1, 2, 3):
        for _ in range(3):
            w, h = rnd.randint(4, 40), rnd.randint(4, 40)
            img = [[rnd.randrange(256) for _ in range(w)] for _ in range(h)]
            f = lambda x, y: img[y][x]
            sa = decode_jpeg(encode_jpeg_gray_progressive_sa(w, h, f, al=al))
            base = decode_jpeg(encode_jpeg_gray(w, h, f))
            assert sa["pixel_sum"] == base["pixel_sum"]


def test_sa_eobrun_correction_bits_buffering():
    """Blocks whose refinement scan has no newly-significant
    coefficient but DOES carry correction bits exercise the EOBRUN
    bit-buffering rule (bits appended after the EOBn code)."""
    from nibbler_spark.operators.jpeg_codec import (
        decode_jpeg,
        encode_jpeg_gray,
        encode_jpeg_gray_progressive_sa,
    )

    # smooth gradient: large low-frequency AC coefficients (nonzero
    # history at every precision), many zero tails
    f = lambda x, y: min(255, 4 * x + 2 * y)
    sa = decode_jpeg(encode_jpeg_gray_progressive_sa(48, 32, f, al=2))
    base = decode_jpeg(encode_jpeg_gray(48, 32, f))
    assert sa["pixel_sum"] == base["pixel_sum"]
