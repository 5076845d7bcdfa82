"""TFRecord framing codec: CRC32C spec vectors, roundtrip, corruption."""

from __future__ import annotations

import random

import pytest

from nibbler_spark.operators.tfrecord_codec import (
    TfrecordError,
    crc32c,
    masked_crc,
    read_tfrecords,
    write_tfrecords,
)


def test_crc32c_spec_vectors():
    # published CRC-32C check values (e.g. RFC 3720 appendix / zlib docs)
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0x00000000
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"\xff" * 32) == 0x62A8AB43


def test_mask_formula():
    c = crc32c(b"abc")
    assert masked_crc(b"abc") == (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def test_roundtrip_property():
    rng = random.Random(7)
    for _ in range(50):
        recs = [
            rng.randbytes(rng.randint(0, 300))
            for _ in range(rng.randint(0, 20))
        ]
        assert read_tfrecords(write_tfrecords(recs)) == recs


def test_corruption_detected():
    blob = bytearray(write_tfrecords([b"hello", b"world"]))
    blob[14] ^= 0x01  # flip a payload byte of record 1
    with pytest.raises(TfrecordError):
        read_tfrecords(bytes(blob))
    with pytest.raises(TfrecordError):
        read_tfrecords(write_tfrecords([b"x"])[:-2])  # truncated
