"""Dependency-free Protocol Buffers WIRE-FORMAT codec (the public
encoding spec: protobuf.dev/programming-guides/encoding).

The environment lacks `google.protobuf` (verified ImportError — the
same gap spark-avro had), so the engine ships the wire layer from the
spec, as it did for Avro OCF, MessagePack and TFRecord: tag bytes
(field_number << 3 | wire_type), base-128 varints, ZigZag for signed
sint64, little-endian fixed64 doubles, and length-delimited strings /
bytes / nested messages. A message is encoded from a field-descriptor
list (the subset a relational row needs); unknown fields are SKIPPED by
wire type on decode — the forward-compatibility contract that makes
protobuf protobuf.

Spec vectors pinned in tests/test_protobuf_wire.py.
"""

from __future__ import annotations

import struct

WT_VARINT = 0
WT_FIXED64 = 1
WT_LEN = 2
WT_FIXED32 = 5


class ProtoWireError(ValueError):
    """Raised on malformed wire data."""


def _write_varint(v: int, out: bytearray) -> None:
    if v < 0:
        v &= (1 << 64) - 1  # two's-complement 64-bit, per spec
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        if pos >= len(buf):
            raise ProtoWireError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            if shift >= 64:
                raise ProtoWireError("varint too long")
            return result, pos
        shift += 7


def zigzag_encode(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def zigzag_decode(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def encode_message(fields: list[tuple[int, str, object]]) -> bytes:
    """Encode ``(field_number, type, value)`` triples; types:
    int64 | sint64 | bool | double | string | bytes | message.
    None values are omitted (proto3 absent-field semantics)."""
    out = bytearray()
    for num, typ, val in fields:
        if val is None:
            continue
        if typ == "int64":
            _write_varint(num << 3 | WT_VARINT, out)
            _write_varint(int(val), out)
        elif typ == "sint64":
            _write_varint(num << 3 | WT_VARINT, out)
            _write_varint(zigzag_encode(int(val)), out)
        elif typ == "bool":
            _write_varint(num << 3 | WT_VARINT, out)
            _write_varint(1 if val else 0, out)
        elif typ == "double":
            _write_varint(num << 3 | WT_FIXED64, out)
            out += struct.pack("<d", float(val))
        elif typ in ("string", "bytes", "message"):
            data = (
                val.encode("utf-8") if typ == "string" else bytes(val)
            )
            _write_varint(num << 3 | WT_LEN, out)
            _write_varint(len(data), out)
            out += data
        else:
            raise ProtoWireError(f"unsupported field type {typ!r}")
    return bytes(out)


def decode_message(
    buf: bytes, schema: dict[int, str]
) -> dict[int, object]:
    """Decode known fields per ``schema`` ({field_number: type});
    unknown field numbers are skipped by wire type (never an error).
    Returns {field_number: decoded value}; repeated occurrences keep
    the LAST value (proto3 scalar merge rule)."""
    out: dict[int, object] = {}
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        num, wt = tag >> 3, tag & 0x07
        if wt == WT_VARINT:
            raw, pos = _read_varint(buf, pos)
            typ = schema.get(num)
            if typ == "sint64":
                out[num] = zigzag_decode(raw)
            elif typ == "bool":
                out[num] = bool(raw)
            elif typ == "int64":
                out[num] = raw - (1 << 64) if raw >= 1 << 63 else raw
        elif wt == WT_FIXED64:
            if pos + 8 > len(buf):
                raise ProtoWireError("truncated fixed64")
            if schema.get(num) == "double":
                out[num] = struct.unpack_from("<d", buf, pos)[0]
            pos += 8
        elif wt == WT_LEN:
            n, pos = _read_varint(buf, pos)
            if pos + n > len(buf):
                raise ProtoWireError("truncated length-delimited field")
            data = buf[pos : pos + n]
            pos += n
            typ = schema.get(num)
            if typ == "string":
                out[num] = data.decode("utf-8")
            elif typ in ("bytes", "message"):
                out[num] = bytes(data)
        elif wt == WT_FIXED32:
            if pos + 4 > len(buf):
                raise ProtoWireError("truncated fixed32")
            pos += 4  # skippable; no fixed32 fields in our schemas
        else:
            raise ProtoWireError(f"unsupported wire type {wt}")
    return out
