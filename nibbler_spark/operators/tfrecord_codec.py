"""Dependency-free TFRecord framing codec (the TensorFlow record
format, from the public spec in tensorflow/core/lib/io/record_writer).

Each record is framed as

    uint64 length (little-endian)
    uint32 masked_crc32c(length bytes)
    byte   data[length]
    uint32 masked_crc32c(data)

with CRC32C (Castagnoli polynomial 0x82F63B78, reflected) and the
TensorFlow mask ``((crc >> 15) | (crc << 17)) + 0xa282ead8``. The
payload is opaque bytes — TFRecord shards of msgpack/JSON rows are a
standard training-data layout; no protobuf required for the framing.

Spec vectors and corruption tests live in tests/test_tfrecord_codec.py.
"""

from __future__ import annotations

import struct

_CRC_TABLE: list[int] = []


def _crc_table() -> list[int]:
    if not _CRC_TABLE:
        poly = 0x82F63B78
        for n in range(256):
            c = n
            for _ in range(8):
                c = (c >> 1) ^ poly if c & 1 else c >> 1
            _CRC_TABLE.append(c)
    return _CRC_TABLE


def crc32c(data: bytes) -> int:
    """CRC-32C (Castagnoli), reflected, init/final xor 0xFFFFFFFF."""
    table = _crc_table()
    crc = 0xFFFFFFFF
    for b in data:
        crc = table[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def masked_crc(data: bytes) -> int:
    c = crc32c(data)
    return (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF


class TfrecordError(ValueError):
    """Raised on malformed TFRecord framing or checksum mismatch."""


def write_tfrecords(records: list[bytes]) -> bytes:
    out = bytearray()
    for data in records:
        length = struct.pack("<Q", len(data))
        out += length
        out += struct.pack("<I", masked_crc(length))
        out += data
        out += struct.pack("<I", masked_crc(data))
    return bytes(out)


def read_tfrecords(buf: bytes) -> list[bytes]:
    out: list[bytes] = []
    pos = 0
    while pos < len(buf):
        if pos + 12 > len(buf):
            raise TfrecordError("truncated TFRecord length frame")
        length_bytes = buf[pos : pos + 8]
        (length,) = struct.unpack("<Q", length_bytes)
        (lcrc,) = struct.unpack_from("<I", buf, pos + 8)
        if lcrc != masked_crc(length_bytes):
            raise TfrecordError("length checksum mismatch")
        pos += 12
        if pos + length + 4 > len(buf):
            raise TfrecordError("truncated TFRecord data")
        data = buf[pos : pos + length]
        (dcrc,) = struct.unpack_from("<I", buf, pos + length)
        if dcrc != masked_crc(data):
            raise TfrecordError("data checksum mismatch")
        out.append(bytes(data))
        pos += length + 4
    return out
