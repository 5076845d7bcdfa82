"""Protobuf wire-format codec: spec vectors, roundtrip, unknown-field
skip, corruption."""

from __future__ import annotations

import random
import struct

import pytest

from nibbler_spark.operators.protobuf_wire import (
    ProtoWireError,
    decode_message,
    encode_message,
    zigzag_decode,
    zigzag_encode,
)


def test_spec_vectors():
    # protobuf.dev encoding guide examples
    # field 1 (int64) = 150  ->  08 96 01
    assert encode_message([(1, "int64", 150)]) == bytes.fromhex("089601")
    # field 2 (string) = "testing" -> 12 07 74 65 73 74 69 6e 67
    assert encode_message([(2, "string", "testing")]) == bytes.fromhex(
        "120774657374696e67"
    )
    # zigzag examples from the spec table
    for plain, zz in [(0, 0), (-1, 1), (1, 2), (-2, 3), (2147483647, 4294967294)]:
        assert zigzag_encode(plain) == zz
        assert zigzag_decode(zz) == plain
    # negative int64 is 10 varint bytes (two's complement), per spec
    blob = encode_message([(1, "int64", -2)])
    assert len(blob) == 11  # 1 tag byte + 10 varint bytes
    assert decode_message(blob, {1: "int64"})[1] == -2


def test_roundtrip_property():
    rng = random.Random(11)
    for _ in range(200):
        fields = [
            (1, "int64", rng.randint(-(1 << 63), (1 << 63) - 1)),
            (2, "sint64", rng.randint(-(1 << 62), (1 << 62) - 1)),
            (3, "bool", rng.random() < 0.5),
            (4, "double", struct.unpack("<d", rng.randbytes(8))[0]),
            (5, "string", "".join(chr(rng.randint(32, 0x2FF))
                                  for _ in range(rng.randint(0, 30)))),
            (6, "bytes", rng.randbytes(rng.randint(0, 30))),
        ]
        if fields[3][2] != fields[3][2]:  # NaN: compare bit patterns
            continue
        schema = {1: "int64", 2: "sint64", 3: "bool", 4: "double",
                  5: "string", 6: "bytes"}
        got = decode_message(encode_message(fields), schema)
        for num, _typ, val in fields:
            assert got[num] == val, (num, val, got[num])


def test_none_omitted_and_unknown_skipped():
    blob = encode_message(
        [(1, "int64", 7), (2, "string", None), (9, "double", 2.5),
         (10, "string", "future-field"), (11, "sint64", -40)]
    )
    # reader only knows fields 1 and 9 — the rest must be skipped
    got = decode_message(blob, {1: "int64", 9: "double", 2: "string"})
    assert got == {1: 7, 9: 2.5}


def test_nested_message():
    inner = encode_message([(1, "string", "in"), (2, "int64", 3)])
    outer = encode_message([(1, "message", inner), (2, "int64", 4)])
    got = decode_message(outer, {1: "message", 2: "int64"})
    assert decode_message(got[1], {1: "string", 2: "int64"}) == {
        1: "in", 2: 3
    }
    assert got[2] == 4


def test_corruption():
    blob = encode_message([(1, "string", "hello")])
    with pytest.raises(ProtoWireError):
        decode_message(blob[:-2], {1: "string"})
    with pytest.raises(ProtoWireError):
        decode_message(b"\xff" * 12, {1: "int64"})  # runaway varint
