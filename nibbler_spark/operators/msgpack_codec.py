"""Dependency-free MessagePack codec (msgpack.org spec).

The binary serialization format event buses and RPC layers actually
ship rows in — implemented from the public spec the same way the Avro
OCF codec is (`operators/avro_codec.py`): canonical minimal-size
encoding on pack, full format-byte dispatch on unpack, spec test
vectors pinned in `tests/test_msgpack_codec.py`. Supported types:
nil, bool, all int widths (fixint through [u]int64), float64, str,
bin, array, map — the closed set a relational row needs.

No reference-repo counterpart (the reference has no serialization
surface); this is driver-mandated source/sink breadth, spec-derived.
"""

from __future__ import annotations

import struct


class MsgpackError(ValueError):
    """Raised on malformed or unsupported MessagePack data."""


def pack(obj) -> bytes:
    """Serialize ``obj`` with canonical (minimal-width) encodings."""
    out = bytearray()
    _pack_into(obj, out)
    return bytes(out)


def _pack_into(obj, out: bytearray) -> None:
    if obj is None:
        out.append(0xC0)
    elif obj is True:
        out.append(0xC3)
    elif obj is False:
        out.append(0xC2)
    elif isinstance(obj, int):
        _pack_int(obj, out)
    elif isinstance(obj, float):
        out.append(0xCB)
        out += struct.pack(">d", obj)
    elif isinstance(obj, str):
        b = obj.encode("utf-8")
        n = len(b)
        if n < 32:
            out.append(0xA0 | n)
        elif n < 0x100:
            out += bytes([0xD9, n])
        elif n < 0x10000:
            out.append(0xDA)
            out += struct.pack(">H", n)
        else:
            out.append(0xDB)
            out += struct.pack(">I", n)
        out += b
    elif isinstance(obj, (bytes, bytearray)):
        n = len(obj)
        if n < 0x100:
            out += bytes([0xC4, n])
        elif n < 0x10000:
            out.append(0xC5)
            out += struct.pack(">H", n)
        else:
            out.append(0xC6)
            out += struct.pack(">I", n)
        out += bytes(obj)
    elif isinstance(obj, (list, tuple)):
        n = len(obj)
        if n < 16:
            out.append(0x90 | n)
        elif n < 0x10000:
            out.append(0xDC)
            out += struct.pack(">H", n)
        else:
            out.append(0xDD)
            out += struct.pack(">I", n)
        for v in obj:
            _pack_into(v, out)
    elif isinstance(obj, dict):
        n = len(obj)
        if n < 16:
            out.append(0x80 | n)
        elif n < 0x10000:
            out.append(0xDE)
            out += struct.pack(">H", n)
        else:
            out.append(0xDF)
            out += struct.pack(">I", n)
        for k, v in obj.items():
            _pack_into(k, out)
            _pack_into(v, out)
    else:
        raise MsgpackError(f"unsupported type {type(obj).__name__}")


def _pack_int(v: int, out: bytearray) -> None:
    if 0 <= v < 0x80:
        out.append(v)  # positive fixint
    elif -32 <= v < 0:
        out.append(v & 0xFF)  # negative fixint
    elif 0 <= v < 0x100:
        out += bytes([0xCC, v])
    elif 0 <= v < 0x10000:
        out.append(0xCD)
        out += struct.pack(">H", v)
    elif 0 <= v < 0x100000000:
        out.append(0xCE)
        out += struct.pack(">I", v)
    elif 0 <= v < 0x10000000000000000:
        out.append(0xCF)
        out += struct.pack(">Q", v)
    elif -0x80 <= v < 0:
        out.append(0xD0)
        out += struct.pack(">b", v)
    elif -0x8000 <= v < 0:
        out.append(0xD1)
        out += struct.pack(">h", v)
    elif -0x80000000 <= v < 0:
        out.append(0xD2)
        out += struct.pack(">i", v)
    elif -0x8000000000000000 <= v < 0:
        out.append(0xD3)
        out += struct.pack(">q", v)
    else:
        raise MsgpackError(f"integer out of 64-bit range: {v}")


def unpack(buf: bytes):
    """Deserialize one MessagePack object; trailing bytes raise."""
    obj, pos = _unpack_from(buf, 0)
    if pos != len(buf):
        raise MsgpackError(f"{len(buf) - pos} trailing bytes after object")
    return obj


def unpack_stream(buf: bytes) -> list:
    """Deserialize a concatenated stream of objects (the framing
    msgpack event logs use — objects back to back, no length prefix)."""
    out, pos = [], 0
    while pos < len(buf):
        obj, pos = _unpack_from(buf, pos)
        out.append(obj)
    return out


def _need(buf: bytes, pos: int, n: int) -> None:
    if pos + n > len(buf):
        raise MsgpackError("truncated MessagePack data")


def _unpack_from(buf: bytes, pos: int):
    _need(buf, pos, 1)
    b = buf[pos]
    pos += 1
    if b < 0x80:
        return b, pos
    if b >= 0xE0:
        return b - 0x100, pos
    if 0x80 <= b <= 0x8F:
        return _unpack_map(buf, pos, b & 0x0F)
    if 0x90 <= b <= 0x9F:
        return _unpack_array(buf, pos, b & 0x0F)
    if 0xA0 <= b <= 0xBF:
        return _unpack_str(buf, pos, b & 0x1F)
    if b == 0xC0:
        return None, pos
    if b == 0xC2:
        return False, pos
    if b == 0xC3:
        return True, pos
    if b == 0xC4:
        _need(buf, pos, 1)
        return _unpack_bin(buf, pos + 1, buf[pos])
    if b == 0xC5:
        _need(buf, pos, 2)
        return _unpack_bin(buf, pos + 2, struct.unpack_from(">H", buf, pos)[0])
    if b == 0xC6:
        _need(buf, pos, 4)
        return _unpack_bin(buf, pos + 4, struct.unpack_from(">I", buf, pos)[0])
    if b == 0xCA:
        _need(buf, pos, 4)
        return struct.unpack_from(">f", buf, pos)[0], pos + 4
    if b == 0xCB:
        _need(buf, pos, 8)
        return struct.unpack_from(">d", buf, pos)[0], pos + 8
    if 0xCC <= b <= 0xCF:
        n = 1 << (b - 0xCC)
        _need(buf, pos, n)
        return int.from_bytes(buf[pos : pos + n], "big"), pos + n
    if 0xD0 <= b <= 0xD3:
        n = 1 << (b - 0xD0)
        _need(buf, pos, n)
        return (
            int.from_bytes(buf[pos : pos + n], "big", signed=True),
            pos + n,
        )
    if b == 0xD9:
        _need(buf, pos, 1)
        return _unpack_str(buf, pos + 1, buf[pos])
    if b == 0xDA:
        _need(buf, pos, 2)
        return _unpack_str(buf, pos + 2, struct.unpack_from(">H", buf, pos)[0])
    if b == 0xDB:
        _need(buf, pos, 4)
        return _unpack_str(buf, pos + 4, struct.unpack_from(">I", buf, pos)[0])
    if b == 0xDC:
        _need(buf, pos, 2)
        return _unpack_array(
            buf, pos + 2, struct.unpack_from(">H", buf, pos)[0]
        )
    if b == 0xDD:
        _need(buf, pos, 4)
        return _unpack_array(
            buf, pos + 4, struct.unpack_from(">I", buf, pos)[0]
        )
    if b == 0xDE:
        _need(buf, pos, 2)
        return _unpack_map(buf, pos + 2, struct.unpack_from(">H", buf, pos)[0])
    if b == 0xDF:
        _need(buf, pos, 4)
        return _unpack_map(buf, pos + 4, struct.unpack_from(">I", buf, pos)[0])
    raise MsgpackError(f"unsupported format byte 0x{b:02x}")


def _unpack_str(buf: bytes, pos: int, n: int):
    _need(buf, pos, n)
    return buf[pos : pos + n].decode("utf-8"), pos + n


def _unpack_bin(buf: bytes, pos: int, n: int):
    _need(buf, pos, n)
    return bytes(buf[pos : pos + n]), pos + n


def _unpack_array(buf: bytes, pos: int, n: int):
    out = []
    for _ in range(n):
        v, pos = _unpack_from(buf, pos)
        out.append(v)
    return out, pos


def _unpack_map(buf: bytes, pos: int, n: int):
    out = {}
    for _ in range(n):
        k, pos = _unpack_from(buf, pos)
        v, pos = _unpack_from(buf, pos)
        out[k] = v
    return out, pos
