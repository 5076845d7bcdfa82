"""MessagePack codec: spec test vectors + roundtrip properties."""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from nibbler_spark.operators.msgpack_codec import (
    MsgpackError,
    pack,
    unpack,
    unpack_stream,
)

# Format-byte vectors from the published msgpack spec.
SPEC_VECTORS = [
    (None, b"\xc0"),
    (False, b"\xc2"),
    (True, b"\xc3"),
    (0, b"\x00"),
    (127, b"\x7f"),
    (-1, b"\xff"),
    (-32, b"\xe0"),
    (128, b"\xcc\x80"),
    (256, b"\xcd\x01\x00"),
    (65536, b"\xce\x00\x01\x00\x00"),
    (1 << 32, b"\xcf\x00\x00\x00\x01\x00\x00\x00\x00"),
    (-33, b"\xd0\xdf"),
    (-129, b"\xd1\xff\x7f"),
    (-32769, b"\xd2\xff\xff\x7f\xff"),
    (-(1 << 31) - 1, b"\xd3\xff\xff\xff\xff\x7f\xff\xff\xff"),
    (1.5, b"\xcb" + bytes.fromhex("3ff8000000000000")),
    ("", b"\xa0"),
    ("abc", b"\xa3abc"),
    ("a" * 32, b"\xd9\x20" + b"a" * 32),
    (b"\x01\x02", b"\xc4\x02\x01\x02"),
    ([], b"\x90"),
    ([1, 2], b"\x92\x01\x02"),
    ({"a": 1}, b"\x81\xa1a\x01"),
]


@pytest.mark.parametrize("obj,blob", SPEC_VECTORS)
def test_spec_vectors(obj, blob):
    assert pack(obj) == blob
    assert unpack(blob) == obj


def test_large_collections_use_16bit_headers():
    arr = list(range(20))
    blob = pack(arr)
    assert blob[0] == 0xDC and unpack(blob) == arr
    m = {f"k{i}": i for i in range(20)}
    blob = pack(m)
    assert blob[0] == 0xDE and unpack(blob) == m
    long = "x" * 70000
    blob = pack(long)
    assert blob[0] == 0xDB and unpack(blob) == long


def test_errors():
    with pytest.raises(MsgpackError):
        unpack(pack([1, 2, 3])[:-1])  # truncated
    with pytest.raises(MsgpackError):
        unpack(pack(1) + pack(2))  # trailing bytes
    with pytest.raises(MsgpackError):
        unpack(b"\xc1")  # never-used format byte
    with pytest.raises(MsgpackError):
        pack(object())
    with pytest.raises(MsgpackError):
        pack(1 << 64)


def test_stream_framing():
    objs = [1, "two", [3.0, None], {"k": -4}]
    assert unpack_stream(b"".join(pack(o) for o in objs)) == objs


_scalar = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(1 << 63), max_value=(1 << 64) - 1),
    st.floats(allow_nan=False, width=64),
    st.text(max_size=40),
    st.binary(max_size=40),
)
_value = st.recursive(
    _scalar,
    lambda inner: st.one_of(
        st.lists(inner, max_size=8),
        st.dictionaries(st.text(max_size=8), inner, max_size=8),
    ),
    max_leaves=30,
)


@settings(max_examples=300, deadline=None)
@given(_value)
def test_roundtrip_property(obj):
    assert unpack(pack(obj)) == obj


def test_canonical_minimality():
    # every packed int uses the smallest representation
    rng = random.Random(99)
    for _ in range(500):
        v = rng.randint(-(1 << 63), (1 << 64) - 1)
        blob = pack(v)
        assert unpack(blob) == v
        # repacking the unpacked value is byte-identical (canonical)
        assert pack(unpack(blob)) == blob
