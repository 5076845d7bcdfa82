"""From-scratch bzip2 DECODER — public format only (the bzip2 on-disk
layout: RLE1 run packing, Burrows-Wheeler transform, move-to-front,
RUNA/RUNB zero-run coding, multi-table canonical Huffman with 50-symbol
group selectors, block and stream CRCs).

Verified against the reference implementation: the test fixtures are
produced by Python's stdlib ``bz2`` (libbzip2) and must decode
byte-identically, CRCs checked. Decoder only — the repo's compressor
family (LZ4/Snappy/DELTA/RLE) covers the encode side of simpler
formats; bzip2's value here is reading the archives the world already
has (.bz2 dumps are still a standard corpus interchange format).
"""

from __future__ import annotations


class Bzip2FormatError(ValueError):
    pass


# bzip2's CRC32: MSB-first (reflected=false), poly 0x04C11DB7
_CRC_TABLE = []
for _i in range(256):
    _c = _i << 24
    for _ in range(8):
        _c = ((_c << 1) ^ 0x04C11DB7) if (_c & 0x80000000) else (_c << 1)
    _CRC_TABLE.append(_c & 0xFFFFFFFF)


def _crc32_bz(data: bytes, crc: int = 0xFFFFFFFF) -> int:
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[
            ((crc >> 24) & 0xFF) ^ b
        ]
    return crc


class _Bits:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise Bzip2FormatError("truncated bzip2 stream")
            bit = (self.data[byte] >> (7 - (self.pos & 7))) & 1
            v = (v << 1) | bit
            self.pos += 1
        return v


def _read_huffman_tables(bits: _Bits, n_syms: int, n_groups: int):
    """Delta-encoded code lengths -> canonical decode tables (limits/
    bases/perm per group, bzip2's own canonical convention)."""
    tables = []
    for _ in range(n_groups):
        lengths = []
        length = bits.read(5)
        for _s in range(n_syms):
            while bits.read(1):
                if bits.read(1):
                    length -= 1
                else:
                    length += 1
            if not 1 <= length <= 23:
                raise Bzip2FormatError("bad huffman code length")
            lengths.append(length)
        min_len, max_len = min(lengths), max(lengths)
        # canonical: symbols ordered by (length, symbol index)
        perm = []
        for ln in range(min_len, max_len + 1):
            for s, sl in enumerate(lengths):
                if sl == ln:
                    perm.append(s)
        limit = {}
        base = {}
        code = 0
        idx = 0
        for ln in range(min_len, max_len + 1):
            n_at = sum(1 for sl in lengths if sl == ln)
            base[ln] = code - idx
            code += n_at
            idx += n_at
            limit[ln] = code - 1
            code <<= 1
        tables.append((min_len, max_len, limit, base, perm))
    return tables


def _huff_decode(bits: _Bits, table) -> int:
    min_len, max_len, limit, base, perm = table
    code = bits.read(min_len)
    ln = min_len
    while True:
        if ln > max_len:
            raise Bzip2FormatError("huffman decode overrun")
        if ln in limit and code <= limit[ln]:
            return perm[code - base[ln]]
        code = (code << 1) | bits.read(1)
        ln += 1


def bzip2_decompress(payload: bytes) -> bytes:
    """Decode a complete .bz2 stream: header, every block (BWT +
    MTF/RLE2 + Huffman groups), block CRCs, final stream CRC."""
    if len(payload) < 10 or payload[:2] != b"BZ" or payload[2:3] != b"h":
        raise Bzip2FormatError("not a bzip2 stream")
    level = payload[3] - ord("0")
    if not 1 <= level <= 9:
        raise Bzip2FormatError("bad block-size level")
    bits = _Bits(payload)
    bits.pos = 32
    out = bytearray()
    combined_crc = 0
    while True:
        magic = bits.read(48)
        if magic == 0x177245385090:  # end-of-stream
            stream_crc = bits.read(32)
            if stream_crc != combined_crc:
                raise Bzip2FormatError("stream CRC mismatch")
            return bytes(out)
        if magic != 0x314159265359:
            raise Bzip2FormatError("bad block magic")
        block_crc = bits.read(32)
        if bits.read(1):
            raise Bzip2FormatError("randomized blocks unsupported")
        orig_ptr = bits.read(24)
        # symbol map: 16-bit coarse map + 16-bit fine maps
        used = []
        coarse = bits.read(16)
        for i in range(16):
            if coarse & (0x8000 >> i):
                fine = bits.read(16)
                for j in range(16):
                    if fine & (0x8000 >> j):
                        used.append(16 * i + j)
        if not used:
            raise Bzip2FormatError("empty symbol map")
        n_syms = len(used) + 2  # RUNA, RUNB, used-1 MTF values, EOB
        n_groups = bits.read(3)
        if not 2 <= n_groups <= 6:
            raise Bzip2FormatError("bad group count")
        n_selectors = bits.read(15)
        sel_mtf = [0] * n_selectors
        for s in range(n_selectors):
            j = 0
            while bits.read(1):
                j += 1
                if j >= n_groups:
                    raise Bzip2FormatError("selector overrun")
            sel_mtf[s] = j
        # selectors are MTF-coded over group ids
        order = list(range(n_groups))
        selectors = []
        for j in sel_mtf:
            g = order.pop(j)
            selectors.append(g)
            order.insert(0, g)
        tables = _read_huffman_tables(bits, n_syms, n_groups)

        # Huffman decode of the MTF/RLE2 symbol stream
        mtf = list(used)
        bwt = bytearray()
        run = 0
        run_bit = 0
        group_pos = 0
        sel_idx = 0
        table = None
        eob = n_syms - 1
        while True:
            if group_pos == 0:
                if sel_idx >= len(selectors):
                    raise Bzip2FormatError("selector underrun")
                table = tables[selectors[sel_idx]]
                sel_idx += 1
                group_pos = 50
            group_pos -= 1
            sym = _huff_decode(bits, table)
            if sym in (0, 1):  # RUNA / RUNB: bijective base-2 zero runs
                run += (sym + 1) << run_bit
                run_bit += 1
                continue
            if run:
                bwt.extend(mtf[0:1] * run)
                run = 0
                run_bit = 0
            if sym == eob:
                break
            # MTF value sym-1
            v = mtf.pop(sym - 1)
            mtf.insert(0, v)
            bwt.append(v)
        if orig_ptr >= len(bwt):
            raise Bzip2FormatError("origPtr out of range")

        # inverse BWT (the T-vector walk)
        counts = [0] * 256
        for b in bwt:
            counts[b] += 1
        totals = [0] * 256
        acc = 0
        for v in range(256):
            totals[v] = acc
            acc += counts[v]
        seen = [0] * 256
        tvec = [0] * len(bwt)
        for i, b in enumerate(bwt):
            tvec[totals[b] + seen[b]] = i
            seen[b] += 1
        decoded = bytearray()
        p = tvec[orig_ptr]
        for _ in range(len(bwt)):
            decoded.append(bwt[p])
            p = tvec[p]

        # RLE1 inverse: 4 identical bytes are followed by a count byte
        plain = bytearray()
        i = 0
        n = len(decoded)
        while i < n:
            b = decoded[i]
            run_len = 1
            while (
                run_len < 4 and i + run_len < n and decoded[i + run_len] == b
            ):
                run_len += 1
            if run_len == 4:
                if i + 4 >= n:
                    raise Bzip2FormatError("truncated RLE1 run")
                extra = decoded[i + 4]
                plain.extend(bytes([b]) * (4 + extra))
                i += 5
            else:
                plain.extend(bytes([b]) * run_len)
                i += run_len
        crc = _crc32_bz(bytes(plain)) ^ 0xFFFFFFFF
        if crc != block_crc:
            raise Bzip2FormatError("block CRC mismatch")
        combined_crc = (
            ((combined_crc << 1) | (combined_crc >> 31)) & 0xFFFFFFFF
        ) ^ crc
        out.extend(plain)
