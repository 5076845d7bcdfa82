"""Dependency-free Avro Object Container File codec (SURVEY gap: Avro).

The environment ships neither ``spark-avro`` nor any Python Avro
library, so — exactly like the multimodal container parsers in
:mod:`nibbler_spark.operators.multimodal` — the format support is
implemented from the public specification (Apache Avro 1.11 spec,
"Object Container Files" + "Binary Encoding"): magic ``Obj\\x01``, a
string→bytes metadata map carrying the JSON schema and codec, a 16-byte
sync marker, then blocks of ``(record count, byte length, records,
sync)``. Scalars use the spec's encodings: zigzag-varint longs, UTF-8
strings with a long length prefix, IEEE-754 little-endian doubles,
booleans as a single byte.

Scope: null or deflate codec, flat record schemas over {long, int,
double, string, boolean} — the shape analytics interchange actually
uses — plus the spec's schema-resolution rules between writer and
reader schema versions (field reordering, defaults, promotions).
Anything else raises rather than mis-parsing.
"""

from __future__ import annotations

import json
import struct
from collections.abc import Iterable

MAGIC = b"Obj\x01"
# Deterministic sync marker (spec requires 16 bytes; randomness is not
# required, and a fixed marker keeps encoded files byte-reproducible).
SYNC = bytes(range(1, 17))

_SUPPORTED = {"long", "int", "double", "string", "boolean"}


def zigzag_encode(n: int) -> bytes:
    """Avro long: zigzag then base-128 varint, little-endian groups."""
    # Python's arbitrary-precision ints make the spec formula exact for
    # both signs: n >> 63 is 0 for n >= 0 and -1 (all ones) for n < 0.
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def zigzag_decode(buf: bytes, pos: int) -> tuple[int, int]:
    """Decode one varint-zigzag long; returns (value, new position)."""
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _encode_value(v, typ: str) -> bytes:
    if typ in ("long", "int"):
        return zigzag_encode(int(v))
    if typ == "double":
        return struct.pack("<d", float(v))
    if typ == "string":
        raw = str(v).encode("utf-8")
        return zigzag_encode(len(raw)) + raw
    if typ == "boolean":
        return b"\x01" if v else b"\x00"
    raise ValueError(f"unsupported Avro type: {typ}")


def _decode_value(buf: bytes, pos: int, typ: str):
    if typ in ("long", "int"):
        return zigzag_decode(buf, pos)
    if typ == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if typ == "string":
        n, pos = zigzag_decode(buf, pos)
        return buf[pos : pos + n].decode("utf-8"), pos + n
    if typ == "boolean":
        return buf[pos] == 1, pos + 1
    raise ValueError(f"unsupported Avro type: {typ}")


def record_schema(name: str, fields: list[tuple[str, str]]) -> str:
    """Avro JSON schema for a flat record."""
    for _, typ in fields:
        if typ not in _SUPPORTED:
            raise ValueError(f"unsupported Avro type: {typ}")
    return json.dumps(
        {
            "type": "record",
            "name": name,
            "fields": [{"name": n, "type": t} for n, t in fields],
        }
    )


def encode_container(
    rows: Iterable[tuple],
    fields: list[tuple[str, str]],
    name: str = "Row",
    codec: str = "null",
) -> bytes:
    """Encode rows into a complete single-block OCF byte string.
    ``codec='deflate'`` compresses the block with raw DEFLATE
    (RFC 1951, no zlib wrapper — per the Avro spec)."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported Avro codec: {codec}")
    schema = record_schema(name, fields).encode("utf-8")
    meta = bytearray()
    meta += zigzag_encode(2)  # map block: 2 entries
    for k, v in (
        (b"avro.schema", schema),
        (b"avro.codec", codec.encode()),
    ):
        meta += zigzag_encode(len(k)) + k
        meta += zigzag_encode(len(v)) + v
    meta += zigzag_encode(0)  # map terminator
    body = bytearray()
    n = 0
    for row in rows:
        for v, (_, typ) in zip(row, fields):
            body += _encode_value(v, typ)
        n += 1
    payload = bytes(body)
    if codec == "deflate":
        import zlib

        co = zlib.compressobj(wbits=-15)  # raw DEFLATE, no header
        payload = co.compress(payload) + co.flush()
    out = bytearray()
    out += MAGIC
    out += meta
    out += SYNC
    if n:
        out += zigzag_encode(n)
        out += zigzag_encode(len(payload))
        out += payload
        out += SYNC
    return bytes(out)


# Legal writer→reader type promotions (Avro spec, Schema Resolution):
# of the types this codec supports, int→long, int→double, long→double.
_PROMOTIONS = {
    ("int", "long"),
    ("int", "double"),
    ("long", "double"),
}


def resolve_fields(
    writer_fields: list[tuple[str, str]],
    reader_fields: list[dict],
) -> list[tuple]:
    """Schema-resolution plan (Avro spec §Schema Resolution) from a
    writer's record fields to a reader's.

    ``reader_fields`` entries are ``{"name", "type", "default"?}``.
    Rules implemented, matched BY NAME (so field reordering between
    schema versions is transparent):

    - same type → value passed through;
    - promotion int→long, int→double, long→double → value converted;
    - reader field missing from the writer → the reader's ``default``
      is used (error if none declared — per spec);
    - writer field missing from the reader → decoded and discarded;
    - any other type pair (including demotions like long→int) → error.

    Returns a per-reader-field plan of ``("copy", writer_idx, convert)``
    or ``("default", value, None)`` steps.
    """
    widx = {n: (i, t) for i, (n, t) in enumerate(writer_fields)}
    plan: list[tuple] = []
    for rf in reader_fields:
        name, rtyp = rf["name"], rf["type"]
        if rtyp not in _SUPPORTED:
            raise ValueError(f"unsupported Avro type: {rtyp}")
        if name in widx:
            i, wtyp = widx[name]
            if wtyp == rtyp:
                plan.append(("copy", i, None))
            elif (wtyp, rtyp) in _PROMOTIONS:
                conv = float if rtyp == "double" else int
                plan.append(("copy", i, conv))
            else:
                raise ValueError(
                    f"cannot resolve field {name!r}: writer {wtyp} -> "
                    f"reader {rtyp} is not a legal promotion"
                )
        else:
            if "default" not in rf:
                raise ValueError(
                    f"reader field {name!r} absent from writer schema "
                    "and declares no default"
                )
            plan.append(("default", rf["default"], None))
    return plan


def decode_container(
    buf: bytes, reader_fields: list[dict] | None = None
) -> tuple[list[tuple[str, str]], list[tuple]]:
    """Parse an OCF byte string → (fields, rows). Validates the magic,
    walks the metadata map, accepts the null or deflate codec, derives
    field order and types from the embedded JSON schema, then reads
    every block, checking record counts, byte lengths, and sync markers.

    With ``reader_fields`` (a list of ``{"name", "type", "default"?}``),
    rows are resolved from the WRITER's embedded schema to the READER's
    via :func:`resolve_fields` — field reordering, added fields with
    defaults, dropped fields, and int→long/int→double/long→double
    promotions across schema versions all decode under one reader
    schema. Returned ``fields`` are then the reader's."""
    if buf[:4] != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        count, pos = zigzag_decode(buf, pos)
        if count == 0:
            break
        if count < 0:  # spec: negative count precedes a byte size
            _, pos = zigzag_decode(buf, pos)
            count = -count
        for _ in range(count):
            klen, pos = zigzag_decode(buf, pos)
            key = buf[pos : pos + klen].decode("utf-8")
            pos += klen
            vlen, pos = zigzag_decode(buf, pos)
            meta[key] = buf[pos : pos + vlen]
            pos += vlen
    codec = meta.get("avro.codec", b"null")
    if codec not in (b"null", b"deflate"):
        raise ValueError(f"unsupported Avro codec: {codec!r}")
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    if schema.get("type") != "record":
        raise ValueError("only flat record schemas are supported")
    fields = [(f["name"], f["type"]) for f in schema["fields"]]
    for _, typ in fields:
        if typ not in _SUPPORTED:
            raise ValueError(f"unsupported Avro type: {typ}")
    plan = None
    if reader_fields is not None:
        plan = resolve_fields(fields, reader_fields)
    sync = buf[pos : pos + 16]
    pos += 16
    rows: list[tuple] = []
    while pos < len(buf):
        n, pos = zigzag_decode(buf, pos)
        blen, pos = zigzag_decode(buf, pos)
        block = buf[pos : pos + blen]
        pos += blen
        if codec == b"deflate":
            import zlib

            block = zlib.decompress(block, wbits=-15)
        bpos = 0
        for _ in range(n):
            vals = []
            for _, typ in fields:
                v, bpos = _decode_value(block, bpos, typ)
                vals.append(v)
            if plan is None:
                rows.append(tuple(vals))
            else:
                rows.append(
                    tuple(
                        (conv(vals[arg]) if conv else vals[arg])
                        if kind == "copy"
                        else arg
                        for kind, arg, conv in plan
                    )
                )
        if bpos != len(block):
            raise ValueError("Avro block length mismatch")
        if buf[pos : pos + 16] != sync:
            raise ValueError("Avro sync marker mismatch")
        pos += 16
    if reader_fields is not None:
        return [(rf["name"], rf["type"]) for rf in reader_fields], rows
    return fields, rows
