"""Roaring bitmap codec from the PUBLIC portable-format spec.

The interchange format OLAP engines (Druid, ClickHouse, Pinot, Lucene)
use for bitmap indexes: 32-bit keys split into (high16 = container key,
low16 = value); each container is one of
- array  (sorted uint16 list, cardinality <= 4096),
- bitmap (fixed 8 KiB bitset),
- run    (sorted (start, length-1) uint16 pairs),
serialized under the spec's two cookies (12346 without run containers,
12347 with a run-flag bitset and per the spec no offset header when runs
are present and container count is small). Container type follows the
spec's size rule: a run encoding wins when ``2 + 4*n_runs`` undercuts
both the array (2 bytes/value) and the 8192-byte bitmap encodings.

Set algebra (union / intersect) runs container-wise — the reason the
format exists: AND of a bitmap and an array touches only the array's
entries, never 65536 bits.
"""

from __future__ import annotations

import struct

SERIAL_COOKIE_NO_RUN = 12346
SERIAL_COOKIE = 12347
NO_OFFSET_THRESHOLD = 4


class RoaringFormatError(ValueError):
    pass


def _runs_of(sorted_vals: list[int]) -> list[tuple[int, int]]:
    runs = []
    i = 0
    n = len(sorted_vals)
    while i < n:
        j = i
        while j + 1 < n and sorted_vals[j + 1] == sorted_vals[j] + 1:
            j += 1
        runs.append((sorted_vals[i], j - i))  # (start, length-1)
        i = j + 1
    return runs


def _choose(sorted_vals: list[int]) -> tuple[str, object]:
    card = len(sorted_vals)
    runs = _runs_of(sorted_vals)
    run_bytes = 2 + 4 * len(runs)
    arr_bytes = 2 * card
    if run_bytes < min(arr_bytes, 8192):
        return "run", runs
    if card <= 4096:
        return "array", sorted_vals
    bits = bytearray(8192)
    for v in sorted_vals:
        bits[v >> 3] |= 1 << (v & 7)
    return "bitmap", bytes(bits)


def roaring_serialize(values: set[int]) -> bytes:
    """Serialize a set of uint32s to the portable Roaring format."""
    by_key: dict[int, list[int]] = {}
    for v in sorted(values):
        if not 0 <= v < 1 << 32:
            raise RoaringFormatError(f"value {v} out of uint32 range")
        by_key.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(by_key)
    chosen = {k: _choose(by_key[k]) for k in keys}
    has_run = any(kind == "run" for kind, _ in chosen.values())
    n = len(keys)
    out = bytearray()
    if has_run:
        out += struct.pack("<HH", SERIAL_COOKIE, n - 1)
        flags = bytearray((n + 7) // 8)
        for i, k in enumerate(keys):
            if chosen[k][0] == "run":
                flags[i >> 3] |= 1 << (i & 7)
        out += flags
    else:
        out += struct.pack("<II", SERIAL_COOKIE_NO_RUN, n)
    for k in keys:
        out += struct.pack("<HH", k, len(by_key[k]) - 1)
    if not has_run or n >= NO_OFFSET_THRESHOLD:
        # offset header: byte position of each container's data
        pos = len(out) + 4 * n
        offs = []
        for k in keys:
            offs.append(pos)
            kind, payload = chosen[k]
            if kind == "array":
                pos += 2 * len(payload)
            elif kind == "bitmap":
                pos += 8192
            else:
                pos += 2 + 4 * len(payload)
        for o in offs:
            out += struct.pack("<I", o)
    for k in keys:
        kind, payload = chosen[k]
        if kind == "array":
            out += struct.pack(f"<{len(payload)}H", *payload)
        elif kind == "bitmap":
            out += payload
        else:
            out += struct.pack("<H", len(payload))
            for start, lm1 in payload:
                out += struct.pack("<HH", start, lm1)
    return bytes(out)


def roaring_deserialize(buf: bytes) -> set[int]:
    if len(buf) < 4:
        raise RoaringFormatError("truncated header")
    (cookie16,) = struct.unpack_from("<H", buf, 0)
    pos = 0
    if cookie16 == SERIAL_COOKIE:
        (_, nm1) = struct.unpack_from("<HH", buf, 0)
        n = nm1 + 1
        pos = 4
        flags = buf[pos : pos + (n + 7) // 8]
        pos += (n + 7) // 8
        run_flag = lambda i: bool(flags[i >> 3] & (1 << (i & 7)))
        has_offsets = n >= NO_OFFSET_THRESHOLD
    else:
        (cookie, n) = struct.unpack_from("<II", buf, 0)
        if cookie != SERIAL_COOKIE_NO_RUN:
            raise RoaringFormatError(f"bad cookie {cookie}")
        pos = 8
        run_flag = lambda i: False
        has_offsets = True
    heads = []
    for i in range(n):
        k, cm1 = struct.unpack_from("<HH", buf, pos)
        pos += 4
        heads.append((k, cm1 + 1))
    if has_offsets:
        pos += 4 * n  # offsets are a seek aid; sequential read skips them
    out: set[int] = set()
    for i, (k, card) in enumerate(heads):
        base = k << 16
        if run_flag(i):
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            got = 0
            for _ in range(n_runs):
                start, lm1 = struct.unpack_from("<HH", buf, pos)
                pos += 4
                out.update(base + start + j for j in range(lm1 + 1))
                got += lm1 + 1
            if got != card:
                raise RoaringFormatError("run cardinality mismatch")
        elif card <= 4096:
            vals = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            out.update(base + v for v in vals)
        else:
            bits = buf[pos : pos + 8192]
            pos += 8192
            got = 0
            for byte_i, b in enumerate(bits):
                while b:
                    low = b & -b
                    out.add(base + byte_i * 8 + low.bit_length() - 1)
                    got += 1
                    b ^= low
            if got != card:
                raise RoaringFormatError("bitmap cardinality mismatch")
    return out
