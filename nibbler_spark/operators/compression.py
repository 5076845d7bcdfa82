"""From-spec compression codecs: LZ4 block format, Snappy raw format,
and Parquet's DELTA_BINARY_PACKED + RLE/bit-packed-hybrid encodings.

All are written from their public format specifications (the LZ4/Snappy
format descriptions and the Parquet encodings spec), dependency-free, and
used distributed via mapInPandas — the same discipline as the image /
audio / archive codecs in ``operators/multimodal.py``. The encoders
favor clarity over ratio (a greedy 4-byte hash matcher for LZ4, fixed
block geometry for delta packing); the decoders are general for the
formats' core profiles and raise loudly on malformed input.

Reference parity note: the reference (nibbler.go) has no compression
surface; these extend the SURVEY §2.3 EXT codec family.
"""

from __future__ import annotations

MINMATCH = 4


class Lz4FormatError(ValueError):
    pass


def lz4_compress(data: bytes) -> bytes:
    """LZ4 block-format compressor: greedy matcher over a 4-byte hash
    table. Honors the format's end conditions (the block ends with a
    literal-only sequence; the last 5 bytes are always literals; no
    match starts within the last 12 bytes)."""
    n = len(data)
    out = bytearray()
    if n == 0:
        return bytes(out)

    def write_len(base: int) -> bytes:
        # extended length bytes after a nibble of 15
        rest = bytearray()
        while base >= 255:
            rest.append(255)
            base -= 255
        rest.append(base)
        return bytes(rest)

    table: dict[bytes, int] = {}
    anchor = 0  # start of pending literals
    i = 0
    limit = n - 12  # spec: matches must not start in the last 12 bytes
    while i <= limit and i + MINMATCH <= n:
        key = data[i : i + MINMATCH]
        cand = table.get(key)
        table[key] = i
        if (
            cand is not None
            and i - cand <= 65535
            and data[cand : cand + MINMATCH] == key
        ):
            # extend the match forward (not into the last 5 bytes)
            mlen = MINMATCH
            while (
                i + mlen < n - 5
                and data[cand + mlen] == data[i + mlen]
            ):
                mlen += 1
            lit = data[anchor:i]
            ll, ml = len(lit), mlen - MINMATCH
            token = (min(ll, 15) << 4) | min(ml, 15)
            out.append(token)
            if ll >= 15:
                out += write_len(ll - 15)
            out += lit
            off = i - cand
            out += off.to_bytes(2, "little")
            if ml >= 15:
                out += write_len(ml - 15)
            i += mlen
            anchor = i
        else:
            i += 1
    # final literal-only sequence
    lit = data[anchor:]
    ll = len(lit)
    out.append(min(ll, 15) << 4)
    if ll >= 15:
        out += write_len(ll - 15)
    out += lit
    return bytes(out)


def lz4_decompress(buf: bytes, expected_size: int | None = None) -> bytes:
    """LZ4 block-format decompressor: token walk with overlap-safe
    match copies (offset < length copies repeat the window — the
    format's run-generation trick)."""
    out = bytearray()
    i = 0
    n = len(buf)
    if n == 0:
        return b""
    while i < n:
        token = buf[i]
        i += 1
        ll = token >> 4
        if ll == 15:
            while True:
                if i >= n:
                    raise Lz4FormatError("truncated literal length")
                b = buf[i]
                i += 1
                ll += b
                if b != 255:
                    break
        if i + ll > n:
            raise Lz4FormatError("truncated literals")
        out += buf[i : i + ll]
        i += ll
        if i == n:
            break  # last sequence carries no match
        if i + 2 > n:
            raise Lz4FormatError("truncated match offset")
        off = int.from_bytes(buf[i : i + 2], "little")
        i += 2
        if off == 0 or off > len(out):
            raise Lz4FormatError(f"invalid match offset {off}")
        ml = token & 0x0F
        if ml == 15:
            while True:
                if i >= n:
                    raise Lz4FormatError("truncated match length")
                b = buf[i]
                i += 1
                ml += b
                if b != 255:
                    break
        ml += MINMATCH
        start = len(out) - off
        for k in range(ml):  # byte-wise: overlap-correct by definition
            out.append(out[start + k])
    if expected_size is not None and len(out) != expected_size:
        raise Lz4FormatError(
            f"size mismatch: got {len(out)}, want {expected_size}"
        )
    return bytes(out)


# --- Parquet DELTA_BINARY_PACKED (int64) ----------------------------------


class DeltaPackFormatError(ValueError):
    pass


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _uvarint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    v = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise DeltaPackFormatError("truncated varint")
        b = buf[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, pos
        shift += 7


BLOCK = 128
MINIBLOCKS = 4
MINI = BLOCK // MINIBLOCKS  # 32 values per miniblock


def delta_pack(values: list[int]) -> bytes:
    """Parquet DELTA_BINARY_PACKED for int64: header (block size,
    miniblock count, total count, zigzag first value), then per block
    a zigzag min-delta varint, 4 per-miniblock bit widths, and
    LSB-first bit-packed (delta − min_delta) runs."""
    out = bytearray()
    out += _uvarint(BLOCK)
    out += _uvarint(MINIBLOCKS)
    out += _uvarint(len(values))
    out += _uvarint(_zigzag(values[0] if values else 0))
    if len(values) <= 1:
        return bytes(out)
    deltas = [
        values[i + 1] - values[i] for i in range(len(values) - 1)
    ]
    for bstart in range(0, len(deltas), BLOCK):
        block = deltas[bstart : bstart + BLOCK]
        mind = min(block)
        out += _uvarint(_zigzag(mind))
        adj = [d - mind for d in block]
        adj += [0] * (BLOCK - len(adj))  # pad the trailing block
        widths = []
        for m in range(MINIBLOCKS):
            mb = adj[m * MINI : (m + 1) * MINI]
            widths.append(max(v.bit_length() for v in mb) if any(mb) else 0)
        out += bytes(widths)
        for m in range(MINIBLOCKS):
            w = widths[m]
            if w == 0:
                continue
            mb = adj[m * MINI : (m + 1) * MINI]
            acc = 0
            nbits = 0
            for v in mb:  # LSB-first packing per the spec
                acc |= v << nbits
                nbits += w
                while nbits >= 8:
                    out.append(acc & 0xFF)
                    acc >>= 8
                    nbits -= 8
            if nbits:
                out.append(acc & 0xFF)
    return bytes(out)


def delta_unpack(buf: bytes) -> list[int]:
    pos = 0
    block, pos = _read_uvarint(buf, pos)
    minis, pos = _read_uvarint(buf, pos)
    if block != BLOCK or minis != MINIBLOCKS:
        raise DeltaPackFormatError(
            f"unsupported geometry {block}/{minis}"
        )
    count, pos = _read_uvarint(buf, pos)
    zz, pos = _read_uvarint(buf, pos)
    if count == 0:
        return []
    values = [_unzigzag(zz)]
    need = count - 1
    while need > 0:
        zz, pos = _read_uvarint(buf, pos)
        mind = _unzigzag(zz)
        if pos + MINIBLOCKS > len(buf):
            raise DeltaPackFormatError("truncated width list")
        widths = list(buf[pos : pos + MINIBLOCKS])
        pos += MINIBLOCKS
        deltas: list[int] = []
        for m in range(MINIBLOCKS):
            w = widths[m]
            if w == 0:
                deltas += [0] * MINI
                continue
            nbytes = (MINI * w + 7) // 8
            if pos + nbytes > len(buf):
                raise DeltaPackFormatError("truncated miniblock")
            acc = int.from_bytes(buf[pos : pos + nbytes], "little")
            pos += nbytes
            mask = (1 << w) - 1
            for k in range(MINI):
                deltas.append((acc >> (k * w)) & mask)
        for d in deltas[:need] if need < BLOCK else deltas[:BLOCK]:
            values.append(values[-1] + mind + d)
        need -= BLOCK
    if len(values) != count:
        raise DeltaPackFormatError("value count mismatch")
    return values


# --- Snappy (raw/block format) --------------------------------------------


class SnappyFormatError(ValueError):
    pass


def snappy_compress(data: bytes) -> bytes:
    """Snappy raw-format compressor from the public format description:
    uvarint uncompressed length, then literal elements (tag 0, with
    1/2-byte extended lengths) and copy elements (tag 1: 4–11 byte
    matches with 11-bit offsets; tag 2: 16-bit offsets). Greedy 4-byte
    hash matcher like the LZ4 encoder."""
    n = len(data)
    out = bytearray(_uvarint(n))

    def emit_literal(lit: bytes) -> None:
        ll = len(lit)
        if ll == 0:
            return
        if ll <= 60:
            out.append((ll - 1) << 2)
        elif ll <= 256:
            out.append(60 << 2)
            out.append(ll - 1)
        else:
            out.append(61 << 2)
            out.extend((ll - 1).to_bytes(2, "little"))
        out.extend(lit)

    def emit_copy(off: int, mlen: int) -> None:
        # split long matches into <=64-byte copies
        while mlen > 0:
            take = min(mlen, 64)
            if take < 4:
                # tag-2 copies allow 1..64; tag-1 needs 4..11 — always
                # use tag 2 for the tail to keep lengths legal
                take = mlen
            if 4 <= take <= 11 and off < 2048:
                out.append(
                    1 | ((take - 4) << 2) | ((off >> 8) << 5)
                )
                out.append(off & 0xFF)
            else:
                out.append(2 | ((take - 1) << 2))
                out.extend(off.to_bytes(2, "little"))
            mlen -= take

    table: dict[bytes, int] = {}
    anchor = 0
    i = 0
    while i + MINMATCH <= n:
        key = data[i : i + MINMATCH]
        cand = table.get(key)
        table[key] = i
        if (
            cand is not None
            and i - cand <= 65535
            and data[cand : cand + MINMATCH] == key
        ):
            mlen = MINMATCH
            while i + mlen < n and data[cand + mlen] == data[i + mlen]:
                mlen += 1
            emit_literal(data[anchor:i])
            emit_copy(i - cand, mlen)
            i += mlen
            anchor = i
        else:
            i += 1
    emit_literal(data[anchor:])
    return bytes(out)


def snappy_decompress(buf: bytes) -> bytes:
    """Snappy raw-format decompressor: element walk over the four tag
    kinds, overlap-safe copies, declared-length check."""
    want, pos = _read_uvarint(buf, 0)
    out = bytearray()
    n = len(buf)
    while pos < n:
        tag = buf[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            ll = tag >> 2
            if ll < 60:
                ll += 1
            else:
                extra = ll - 59
                if pos + extra > n:
                    raise SnappyFormatError("truncated literal length")
                ll = int.from_bytes(buf[pos : pos + extra], "little") + 1
                pos += extra
            if pos + ll > n:
                raise SnappyFormatError("truncated literal")
            out += buf[pos : pos + ll]
            pos += ll
            continue
        if kind == 1:
            mlen = ((tag >> 2) & 7) + 4
            if pos >= n:
                raise SnappyFormatError("truncated copy-1")
            off = ((tag >> 5) << 8) | buf[pos]
            pos += 1
        elif kind == 2:
            mlen = (tag >> 2) + 1
            if pos + 2 > n:
                raise SnappyFormatError("truncated copy-2")
            off = int.from_bytes(buf[pos : pos + 2], "little")
            pos += 2
        else:
            mlen = (tag >> 2) + 1
            if pos + 4 > n:
                raise SnappyFormatError("truncated copy-4")
            off = int.from_bytes(buf[pos : pos + 4], "little")
            pos += 4
        cur = len(out)
        if off == 0 or off > cur:
            raise SnappyFormatError(f"invalid copy offset {off}")
        start = cur - off
        if off >= mlen:
            # disjoint source — one slice copy
            out += out[start : start + mlen]
        else:
            # overlapping copy: the already-written tail is the repeat
            # unit; tile it instead of appending byte-at-a-time (same
            # bytes — position k copies out[start + k % off]).
            pattern = out[start:]
            out += (pattern * (mlen // off + 1))[:mlen]
    if len(out) != want:
        raise SnappyFormatError(
            f"size mismatch: got {len(out)}, want {want}"
        )
    return bytes(out)


# --- Parquet RLE / bit-packed hybrid --------------------------------------


class RleHybridFormatError(ValueError):
    pass


def rle_hybrid_encode(values: list[int], bit_width: int) -> bytes:
    """Parquet's RLE/bit-packed hybrid (the levels + dictionary-index
    encoding): runs of ≥ 8 equal values emit an RLE run
    (uvarint run_len << 1, value in ceil(w/8) LE bytes); other spans
    emit bit-packed groups of 8 (uvarint (groups << 1) | 1, LSB-first
    packed)."""
    out = bytearray()
    i = 0
    n = len(values)
    vbytes = (bit_width + 7) // 8
    while i < n:
        run = 1
        while i + run < n and values[i + run] == values[i]:
            run += 1
        if run >= 8:
            out += _uvarint(run << 1)
            out += values[i].to_bytes(vbytes, "little")
            i += run
            continue
        # bit-packed span: gather until the next long run (or end)
        start = i
        while i < n:
            run = 1
            while i + run < n and values[i + run] == values[i]:
                run += 1
            if run >= 8:
                break
            i += run
        span = values[start:i]

        def emit_packed(vals: list[int]) -> None:
            groups = (len(vals) + 7) // 8
            out.extend(_uvarint((groups << 1) | 1))
            padded = vals + [0] * (groups * 8 - len(vals))
            acc = 0
            nbits = 0
            for v in padded:
                acc |= v << nbits
                nbits += bit_width
                while nbits >= 8:
                    out.append(acc & 0xFF)
                    acc >>= 8
                    nbits -= 8
            if nbits:
                out.append(acc & 0xFF)

        if i >= n:
            # final span: group padding is legal — the reader stops at
            # the declared value count
            emit_packed(span)
        else:
            # mid-stream: bit-packed runs must cover EXACTLY 8k values
            # (the reader cannot see span boundaries); leftovers emit
            # as short RLE runs, which the format allows at any length
            full = len(span) // 8 * 8
            if full:
                emit_packed(span[:full])
            j = full
            while j < len(span):
                r = 1
                while (
                    j + r < len(span) and span[j + r] == span[j]
                ):
                    r += 1
                out.extend(_uvarint(r << 1))
                out.extend(span[j].to_bytes(vbytes, "little"))
                j += r
    return bytes(out)


def rle_hybrid_decode(buf: bytes, bit_width: int, count: int) -> list[int]:
    out: list[int] = []
    pos = 0
    vbytes = (bit_width + 7) // 8
    mask = (1 << bit_width) - 1
    while len(out) < count:
        header, pos = _read_uvarint(buf, pos)
        if header & 1:  # bit-packed groups
            groups = header >> 1
            nbytes = groups * bit_width  # groups * 8 values * w / 8
            if pos + nbytes > len(buf):
                raise RleHybridFormatError("truncated bit-packed run")
            # Each 8-value group is exactly bit_width bytes (8*w bits),
            # so decode group-by-group with SMALL ints: the old whole-run
            # accumulator was one giant Python int whose per-value shift
            # cost grew with run length (O(n^2) per page — measured 48x
            # slower at 20k values). Same LSB-first values.
            w = bit_width
            end = pos + nbytes
            if w == 0:
                # 0-bit packing (single-entry dictionary): all zeros,
                # no payload bytes — matches the old accumulator path.
                out.extend([0] * (groups * 8))
                if len(out) > count:
                    del out[count:]
                continue
            for gp in range(pos, end, w):
                acc = int.from_bytes(buf[gp : gp + w], "little")
                out.append(acc & mask)
                out.append((acc >> w) & mask)
                out.append((acc >> (2 * w)) & mask)
                out.append((acc >> (3 * w)) & mask)
                out.append((acc >> (4 * w)) & mask)
                out.append((acc >> (5 * w)) & mask)
                out.append((acc >> (6 * w)) & mask)
                out.append((acc >> (7 * w)) & mask)
            pos = end
            if len(out) > count:
                del out[count:]  # trailing group padding, as before
        else:  # RLE run
            run = header >> 1
            if pos + vbytes > len(buf):
                raise RleHybridFormatError("truncated RLE value")
            v = int.from_bytes(buf[pos : pos + vbytes], "little")
            pos += vbytes
            out += [v] * run
    if len(out) != count:
        raise RleHybridFormatError("value count overshoot")
    return out
