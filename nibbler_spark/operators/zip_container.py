"""From-scratch ZIP container codec (PKWARE APPNOTE.TXT, the public
.ZIP File Format Specification).

Crawl dumps, eval bundles, and model-artifact packages routinely ship
as ZIP archives; this implements the subset every real archive uses —
local file headers, STORED (method 0) and DEFLATE (method 8) entries,
the central directory, and the end-of-central-directory record — with
raw-DEFLATE streams via stdlib zlib (wbits=-15; the same stdlib-zlib-
for-DEFLATE stance as the PNG codec).  CRC-32s are computed and, on
read, verified against the header values; bad magic, truncated
members, size mismatches, and CRC mismatches all raise.

The reader resolves members through the CENTRAL DIRECTORY (found by
scanning the tail for the EOCD signature), not by walking local
headers — the spec-correct path, and the one that stays right when
archives carry data descriptors or padding between members.
"""

from __future__ import annotations

import struct
import zlib

_LOCAL_SIG = 0x04034B50
_CENTRAL_SIG = 0x02014B50
_EOCD_SIG = 0x06054B50


class ZipFormatError(ValueError):
    pass


def encode_zip(
    members: list[tuple[str, bytes]], method: str = "deflate"
) -> bytes:
    """Write a complete ZIP archive. ``method`` is ``'stored'``,
    ``'deflate'``, or ``'mixed'`` (alternates per member, exercising
    both read paths)."""
    if method not in ("stored", "deflate", "mixed"):
        raise ZipFormatError(f"unsupported method {method!r}")
    out = bytearray()
    central = bytearray()
    for i, (name, data) in enumerate(members):
        nm = name.encode("utf-8")
        m = (
            0
            if method == "stored" or (method == "mixed" and i % 2 == 0)
            else 8
        )
        if m == 8:
            co = zlib.compressobj(9, zlib.DEFLATED, -15)
            comp = co.compress(data) + co.flush()
        else:
            comp = data
        crc = zlib.crc32(data) & 0xFFFFFFFF
        offset = len(out)
        # General-purpose flag bit 11 (0x0800) declares the name is
        # UTF-8; without it spec-compliant readers decode non-ASCII
        # names as CP437 (APPNOTE.TXT appendix D).
        flags = 0x0800 if not name.isascii() else 0
        hdr = struct.pack(
            "<IHHHHHIIIHH",
            _LOCAL_SIG, 20, flags, m, 0, 0x21,  # fixed DOS time/date
            crc, len(comp), len(data), len(nm), 0,
        )
        out += hdr + nm + comp
        central += struct.pack(
            "<IHHHHHHIIIHHHHHII",
            _CENTRAL_SIG, 20, 20, flags, m, 0, 0x21,
            crc, len(comp), len(data), len(nm), 0, 0, 0, 0, 0, offset,
        ) + nm
    cd_off = len(out)
    out += central
    out += struct.pack(
        "<IHHHHIIH",
        _EOCD_SIG, 0, 0, len(members), len(members),
        len(central), cd_off, 0,
    )
    return bytes(out)


def parse_zip(payload: bytes) -> list[dict]:
    """Parse a ZIP archive into ``[{name, data, method, crc}]`` in
    central-directory order, verifying sizes and CRC-32 per member.
    All structural defects raise :class:`ZipFormatError` — truncated
    records never escape as raw ``struct.error``."""
    # EOCD: scan backwards through the last 64 KiB + 22 bytes. A bare
    # signature match is not enough — the 4 EOCD magic bytes can occur
    # inside an archive comment (or member data), so each candidate is
    # validated: the declared comment length must run exactly to the
    # end of the file, and the central directory must fit before the
    # record. The scan keeps walking backwards past impostors.
    tail_start = max(0, len(payload) - 65536 - 22)
    eocd = None
    for pos in range(len(payload) - 22, tail_start - 1, -1):
        if struct.unpack_from("<I", payload, pos)[0] != _EOCD_SIG:
            continue
        cand = struct.unpack_from("<IHHHHIIH", payload, pos)
        comment_len = cand[7]
        if pos + 22 + comment_len != len(payload):
            continue
        if cand[6] + cand[5] > pos:  # cd_off + cd_size past the EOCD
            continue
        eocd = cand
        break
    if eocd is None:
        raise ZipFormatError("no end-of-central-directory record")
    (_, _, _, n_here, n_total, cd_size, cd_off, _) = eocd
    if n_here != n_total:
        raise ZipFormatError("multi-disk archives unsupported")
    members = []
    pos = cd_off
    for _ in range(n_total):
        if pos + 46 > len(payload):
            raise ZipFormatError("truncated central directory")
        if struct.unpack_from("<I", payload, pos)[0] != _CENTRAL_SIG:
            raise ZipFormatError("bad central-directory signature")
        (
            _, _, _, _, m, _, _, crc, comp_size, uncomp_size,
            nlen, xlen, clen, _, _, _, local_off,
        ) = struct.unpack_from("<IHHHHHHIIIHHHHHII", payload, pos)
        if pos + 46 + nlen > len(payload):
            raise ZipFormatError("truncated central-directory name")
        name = payload[pos + 46 : pos + 46 + nlen].decode("utf-8")
        pos += 46 + nlen + xlen + clen
        # local header gives the data offset (its name/extra lengths
        # may legally differ from the central entry's)
        if local_off + 30 > len(payload):
            raise ZipFormatError(f"truncated local header for {name!r}")
        if struct.unpack_from("<I", payload, local_off)[0] != _LOCAL_SIG:
            raise ZipFormatError(f"bad local header for {name!r}")
        lnlen, lxlen = struct.unpack_from("<HH", payload, local_off + 26)
        dstart = local_off + 30 + lnlen + lxlen
        comp = payload[dstart : dstart + comp_size]
        if len(comp) != comp_size:
            raise ZipFormatError(f"truncated member {name!r}")
        if m == 0:
            data = bytes(comp)
        elif m == 8:
            try:
                data = zlib.decompress(comp, wbits=-15)
            except zlib.error as e:
                raise ZipFormatError(
                    f"bad DEFLATE stream in {name!r}: {e}"
                ) from e
        else:
            raise ZipFormatError(f"unsupported compression method {m}")
        if len(data) != uncomp_size:
            raise ZipFormatError(f"size mismatch in {name!r}")
        if zlib.crc32(data) & 0xFFFFFFFF != crc:
            raise ZipFormatError(f"CRC mismatch in {name!r}")
        members.append(
            {"name": name, "data": data, "method": m, "crc": crc}
        )
    return members
