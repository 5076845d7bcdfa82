"""From-scratch Arrow IPC (Feather V2 / stream) reader — public format
spec only (arrow-format: flatbuffers-encoded Message/Schema/RecordBatch
framing, validity bitmaps, primitive + varbinary buffer layouts).

The flatbuffers wire format is parsed BY HAND (root offset -> table ->
vtable -> field slots; strings/vectors/unions per the flatbuffers spec)
— no flatbuffers library, no pyarrow: the point is the same as the
Parquet codec (operators/parquet_codec.py): the engine's interchange
formats re-derived from their published specifications and verified
against real files written by the reference implementation.

Scope: non-nested schemas with int8..int64 / uint variants (as signed
widths), float32/float64, bool, utf8/binary; record batches without
compression or dictionaries. Raises cleanly outside it.
"""

from __future__ import annotations

import struct


class ArrowFormatError(ValueError):
    pass


# ------------------------------------------------------------ flatbuffers


class _Fb:
    """Minimal flatbuffers table accessor."""

    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf = buf
        self.pos = pos  # table position
        soffset = struct.unpack_from("<i", buf, pos)[0]
        self.vt = pos - soffset
        self.vt_size = struct.unpack_from("<H", buf, self.vt)[0]

    def _slot(self, field_id: int) -> int:
        off = 4 + 2 * field_id
        if off + 2 > self.vt_size:
            return 0
        rel = struct.unpack_from("<H", self.buf, self.vt + off)[0]
        return self.pos + rel if rel else 0

    def scalar(self, field_id: int, fmt: str, default):
        p = self._slot(field_id)
        if not p:
            return default
        return struct.unpack_from(fmt, self.buf, p)[0]

    def indirect(self, field_id: int) -> int:
        """Offset field -> absolute position of the target."""
        p = self._slot(field_id)
        if not p:
            return 0
        o = struct.unpack_from("<I", self.buf, p)[0]
        return p + o

    def string(self, field_id: int) -> str:
        t = self.indirect(field_id)
        if not t:
            return ""
        n = struct.unpack_from("<I", self.buf, t)[0]
        return self.buf[t + 4 : t + 4 + n].decode()

    def vector(self, field_id: int) -> tuple[int, int]:
        """(element_count, first_element_position)."""
        t = self.indirect(field_id)
        if not t:
            return 0, 0
        n = struct.unpack_from("<I", self.buf, t)[0]
        return n, t + 4

    def table(self, field_id: int):
        t = self.indirect(field_id)
        return _Fb(self.buf, t) if t else None

    def vector_tables(self, field_id: int) -> list:
        n, p = self.vector(field_id)
        out = []
        for k in range(n):
            o = struct.unpack_from("<I", self.buf, p + 4 * k)[0]
            out.append(_Fb(self.buf, p + 4 * k + o))
        return out


# -------------------------------------------------------------- metadata

_TYPE_INT = 2
_TYPE_FLOAT = 3
_TYPE_BINARY = 4
_TYPE_UTF8 = 5
_TYPE_BOOL = 6


def _parse_field(f: _Fb) -> dict:
    name = f.string(0)
    type_type = f.scalar(2, "<B", 0)
    t = f.table(3)
    children, _ = f.vector(5)
    if children:
        raise ArrowFormatError("nested fields not supported")
    if f.table(4) is not None:
        raise ArrowFormatError("dictionary-encoded fields not supported")
    if type_type == _TYPE_INT:
        bits = t.scalar(0, "<i", 0)
        signed = t.scalar(1, "<B", 0)
        return {"name": name, "kind": "int", "bits": bits, "signed": bool(signed)}
    if type_type == _TYPE_FLOAT:
        prec = t.scalar(0, "<h", 0)  # 0 HALF 1 SINGLE 2 DOUBLE
        if prec not in (1, 2):
            raise ArrowFormatError("half floats not supported")
        return {"name": name, "kind": "float", "bits": 32 if prec == 1 else 64}
    if type_type in (_TYPE_UTF8, _TYPE_BINARY):
        return {
            "name": name,
            "kind": "utf8" if type_type == _TYPE_UTF8 else "binary",
        }
    if type_type == _TYPE_BOOL:
        return {"name": name, "kind": "bool"}
    raise ArrowFormatError(f"unsupported arrow type id {type_type}")


_INT_FMT = {
    (8, True): "b",
    (8, False): "B",
    (16, True): "h",
    (16, False): "H",
    (32, True): "i",
    (32, False): "I",
    (64, True): "q",
    (64, False): "Q",
}


def _bit(buf: bytes, base: int, i: int) -> int:
    return (buf[base + (i >> 3)] >> (i & 7)) & 1


def arrow_ipc_read(payload: bytes) -> dict[str, list]:
    """Decode an Arrow IPC file or stream into column lists (None for
    nulls), concatenating record batches."""
    try:
        return _arrow_ipc_read(payload)
    except (struct.error, IndexError) as exc:
        raise ArrowFormatError(f"malformed arrow ipc payload: {exc}") from exc


def _arrow_ipc_read(payload: bytes) -> dict[str, list]:
    pos = 0
    if payload[:6] == b"ARROW1":
        pos = 8  # file format: magic + 2 bytes padding
    schema_fields: list[dict] | None = None
    data: dict[str, list] = {}
    while pos + 8 <= len(payload):
        cont, meta_len = struct.unpack_from("<iI", payload, pos)
        if cont != -1:
            # legacy framing without continuation marker
            meta_len = struct.unpack_from("<I", payload, pos)[0]
            meta_start = pos + 4
        else:
            meta_start = pos + 8
        if meta_len == 0:
            break  # end-of-stream marker
        root = struct.unpack_from("<I", payload, meta_start)[0]
        msg = _Fb(payload, meta_start + root)
        header_type = msg.scalar(1, "<B", 0)
        body_len = msg.scalar(3, "<q", 0)
        body_start = meta_start + meta_len
        # align body to 8 bytes
        if body_start % 8:
            body_start += 8 - body_start % 8
        if header_type == 1:  # Schema
            sch = msg.table(2)
            if sch is None:
                raise ArrowFormatError("missing schema header")
            schema_fields = [_parse_field(f) for f in sch.vector_tables(1)]
            data = {f["name"]: [] for f in schema_fields}
        elif header_type == 3:  # RecordBatch
            if schema_fields is None:
                raise ArrowFormatError("record batch before schema")
            rb = msg.table(2)
            if rb.table(3) is not None:
                raise ArrowFormatError("compressed batches not supported")
            n_rows = rb.scalar(0, "<q", 0)
            n_nodes, nodes_p = rb.vector(1)
            n_bufs, bufs_p = rb.vector(2)
            if n_nodes != len(schema_fields):
                raise ArrowFormatError("field-node/schema mismatch")

            def buffer(k: int) -> tuple[int, int]:
                off, ln = struct.unpack_from(
                    "<qq", payload, bufs_p + 16 * k
                )
                return body_start + off, ln

            bi = 0
            for fi, field in enumerate(schema_fields):
                node_len, node_nulls = struct.unpack_from(
                    "<qq", payload, nodes_p + 16 * fi
                )
                val_pos, val_len = buffer(bi)
                bi += 1
                has_validity = val_len > 0

                def valid(i: int) -> bool:
                    return (not has_validity) or bool(
                        _bit(payload, val_pos, i)
                    )

                kind = field["kind"]
                col = data[field["name"]]
                if kind in ("int", "float"):
                    dat_pos, _ = buffer(bi)
                    bi += 1
                    if kind == "int":
                        fmt = _INT_FMT[(field["bits"], field["signed"])]
                    else:
                        fmt = "f" if field["bits"] == 32 else "d"
                    width = struct.calcsize(fmt)
                    vals = struct.unpack_from(
                        f"<{node_len}{fmt}", payload, dat_pos
                    )
                    col.extend(
                        vals[i] if valid(i) else None
                        for i in range(node_len)
                    )
                elif kind == "bool":
                    dat_pos, _ = buffer(bi)
                    bi += 1
                    col.extend(
                        bool(_bit(payload, dat_pos, i)) if valid(i) else None
                        for i in range(node_len)
                    )
                elif kind in ("utf8", "binary"):
                    off_pos, _ = buffer(bi)
                    bi += 1
                    dat_pos, _ = buffer(bi)
                    bi += 1
                    offs = struct.unpack_from(
                        f"<{node_len + 1}i", payload, off_pos
                    )
                    for i in range(node_len):
                        if not valid(i):
                            col.append(None)
                        else:
                            raw = payload[
                                dat_pos + offs[i] : dat_pos + offs[i + 1]
                            ]
                            col.append(
                                raw.decode() if kind == "utf8" else bytes(raw)
                            )
                else:  # pragma: no cover
                    raise ArrowFormatError(f"unhandled kind {kind}")
            if bi != n_bufs:
                raise ArrowFormatError("buffer count mismatch")
        elif header_type == 2:  # DictionaryBatch
            raise ArrowFormatError("dictionary batches not supported")
        pos = body_start + body_len
        if pos % 8:
            pos += 8 - pos % 8
    if schema_fields is None:
        raise ArrowFormatError("no schema message found")
    return data
