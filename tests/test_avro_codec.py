"""Unit tests for the dependency-free Avro OCF codec (spec-derived)."""

from __future__ import annotations

import pytest

from nibbler_spark.operators.avro_codec import (
    MAGIC,
    decode_container,
    encode_container,
    zigzag_decode,
    zigzag_encode,
)

# Avro spec's published zigzag/varint vectors.
SPEC_VECTORS = [
    (0, b"\x00"),
    (-1, b"\x01"),
    (1, b"\x02"),
    (-2, b"\x03"),
    (2, b"\x04"),
    (-64, b"\x7f"),
    (64, b"\x80\x01"),
]


def test_zigzag_matches_spec_vectors():
    for n, b in SPEC_VECTORS:
        assert zigzag_encode(n) == b
        assert zigzag_decode(b, 0) == (n, len(b))


def test_zigzag_roundtrip_extremes():
    for n in [2**62, -(2**62), 2**40 + 7, -12345678901234]:
        assert zigzag_decode(zigzag_encode(n), 0)[0] == n


FIELDS = [
    ("id", "long"),
    ("name", "string"),
    ("score", "double"),
    ("ok", "boolean"),
]


def test_container_roundtrip_unicode_negatives_empty_string():
    rows = [
        (1, "héllo wörld", 12.31, True),
        (-99, "", -0.0, False),
        (2**40, "x" * 300, 3.141592653589793, True),
    ]
    fields, back = decode_container(encode_container(rows, FIELDS))
    assert fields == FIELDS
    assert back == rows


def test_container_empty_rowset_has_header_only():
    buf = encode_container([], FIELDS)
    assert buf.startswith(MAGIC)
    fields, rows = decode_container(buf)
    assert fields == FIELDS and rows == []


def test_decode_rejects_bad_magic():
    with pytest.raises(ValueError, match="magic"):
        decode_container(b"PAR1" + b"\x00" * 64)


def test_decode_rejects_unknown_codec():
    buf = bytearray(encode_container([(1, "a", 1.0, True)], FIELDS))
    buf = bytes(buf).replace(b"null", b"zstd", 1)
    # keep the metadata value length consistent: both are 4 bytes
    with pytest.raises(ValueError, match="codec"):
        decode_container(buf)


def test_unsupported_type_raises_on_encode():
    with pytest.raises(ValueError, match="unsupported"):
        encode_container([(b"x",)], [("payload", "bytes")])


def test_container_deflate_codec_roundtrip():
    rows = [(i, f"name-{i}" * 5, i * 0.5, i % 2 == 0) for i in range(200)]
    null_buf = encode_container(rows, FIELDS, codec="null")
    defl_buf = encode_container(rows, FIELDS, codec="deflate")
    assert len(defl_buf) < len(null_buf)  # compression actually happened
    assert decode_container(defl_buf) == (FIELDS, rows)


def test_avro_datasource_schema_from_embedded_header(tmp_path):
    """The DataSource infers its Spark schema from the first file's
    embedded Avro JSON schema — no user-supplied schema needed."""
    from nibbler_spark.sources.avro_datasource import AvroDataSource

    buf = encode_container([(1, "a", 1.5, True)], FIELDS)
    f = tmp_path / "x.avro"
    f.write_bytes(buf)
    ds = AvroDataSource(options={"path": str(tmp_path)})
    assert ds.schema() == "id long, name string, score double, ok boolean"


def test_avro_datasource_partitions_track_files(tmp_path):
    from nibbler_spark.sources.avro_datasource import AvroReader

    for i in range(3):
        (tmp_path / f"p{i}.avro").write_bytes(
            encode_container([(i, "r", 0.0, False)], FIELDS)
        )
    parts = AvroReader({"path": str(tmp_path)}).partitions()
    assert len(parts) == 3


def test_avro_stream_reader_offsets_and_replay(tmp_path):
    """Offset = set of served file names: each read() batch covers
    exactly the newly-arrived files, and readBetweenOffsets replays a
    recovered batch identically."""
    from nibbler_spark.sources.avro_datasource import AvroStreamReader

    def drop(name, rows):
        (tmp_path / name).write_bytes(encode_container(rows, FIELDS))

    r = AvroStreamReader({"path": str(tmp_path)})
    o0 = r.initialOffset()
    drop("b.avro", [(1, "x", 0.5, True)])
    drop("c.avro", [(2, "y", 1.5, False)])
    rows1, o1 = r.read(o0)
    assert [t[0] for t in rows1] == [1, 2]
    assert o1 == {"files": ["b.avro", "c.avro"]}
    rows_empty, o2 = r.read(o1)
    assert list(rows_empty) == [] and o2 == o1  # no new files, no rows
    drop("d.avro", [(3, "z", 2.5, True)])
    rows2, o3 = r.read(o2)
    assert [t[0] for t in rows2] == [3]
    assert o3 == {"files": ["b.avro", "c.avro", "d.avro"]}
    # checkpoint-recovery replay must reproduce the same batches
    assert list(r.readBetweenOffsets(o0, o1)) == list(rows1)
    assert list(r.readBetweenOffsets(o1, o3)) == list(rows2)


def test_avro_stream_reader_serves_late_lexicographic_arrivals(tmp_path):
    """A file whose name sorts BEFORE already-served files (the shape
    uuid-named writer output produces) must still be served exactly
    once — the failure mode of a positional offset into the sorted
    listing."""
    from nibbler_spark.sources.avro_datasource import AvroStreamReader

    def drop(name, rows):
        (tmp_path / name).write_bytes(encode_container(rows, FIELDS))

    r = AvroStreamReader({"path": str(tmp_path)})
    o0 = r.initialOffset()
    drop("z.avro", [(1, "x", 0.5, True)])
    rows1, o1 = r.read(o0)
    assert [t[0] for t in rows1] == [1]
    # late arrival sorting before z.avro
    drop("a.avro", [(2, "y", 1.5, False)])
    rows2, o2 = r.read(o1)
    assert [t[0] for t in rows2] == [2]  # served, not skipped
    rows3, o3 = r.read(o2)
    assert list(rows3) == []  # and nothing re-served
    # replay of the recovered second batch is exactly the late file
    assert [t[0] for t in r.readBetweenOffsets(o1, o2)] == [2]


def test_schema_resolution_reorder_default_promote_drop():
    """One reader schema decodes two writer versions: reordered fields,
    int->long promotion, a reader-only field filled from its default,
    and a writer-only field skipped."""
    from nibbler_spark.operators.avro_codec import decode_container

    reader = [
        {"name": "id", "type": "long"},
        {"name": "score", "type": "double"},
        {"name": "tag", "type": "string", "default": "legacy"},
    ]
    # writer v1: id is int, no tag
    v1 = encode_container(
        [(7, 1.5)], [("id", "int"), ("score", "double")]
    )
    fields, rows = decode_container(v1, reader_fields=reader)
    assert fields == [("id", "long"), ("score", "double"), ("tag", "string")]
    assert rows == [(7, 1.5, "legacy")]
    # writer v2: reordered, long id, has tag, extra field dropped
    v2 = encode_container(
        [("new", 2.5, True, 9)],
        [("tag", "string"), ("score", "double"),
         ("extra", "boolean"), ("id", "long")],
    )
    _, rows2 = decode_container(v2, reader_fields=reader)
    assert rows2 == [(9, 2.5, "new")]


def test_schema_resolution_promotions():
    from nibbler_spark.operators.avro_codec import decode_container

    buf = encode_container([(5, 6)], [("a", "int"), ("b", "long")])
    _, rows = decode_container(
        buf,
        reader_fields=[
            {"name": "a", "type": "double"},
            {"name": "b", "type": "double"},
        ],
    )
    assert rows == [(5.0, 6.0)]
    assert all(isinstance(v, float) for v in rows[0])


def test_schema_resolution_errors():
    import pytest

    from nibbler_spark.operators.avro_codec import decode_container

    buf = encode_container([(5,)], [("a", "long")])
    # demotion long->int is not a legal promotion
    with pytest.raises(ValueError, match="not a legal promotion"):
        decode_container(buf, reader_fields=[{"name": "a", "type": "int"}])
    # reader-only field without a default
    with pytest.raises(ValueError, match="declares no default"):
        decode_container(
            buf,
            reader_fields=[
                {"name": "a", "type": "long"},
                {"name": "missing", "type": "string"},
            ],
        )


def test_avro_stream_writer_commit_is_epoch_idempotent(tmp_path):
    """A replayed epoch (same batchId) must drop its temp files instead
    of publishing duplicates — crash-between-commit-and-checkpoint."""
    import os

    from nibbler_spark.sources.avro_datasource import (
        AvroCommit,
        AvroStreamWriter,
    )

    w = AvroStreamWriter.__new__(AvroStreamWriter)
    w.path = str(tmp_path)
    w.codec = "null"
    w.fields = [("id", "long")]

    def fake_task(payload: bytes, part: str) -> AvroCommit:
        tmp = tmp_path / f".part-{part}.avro.tmp"
        tmp.write_bytes(payload)
        return AvroCommit(f"part-{part}.avro", tmp.name)

    buf = encode_container([(1,)], [("id", "long")])
    m1 = fake_task(buf, "aaa")
    w.commit([m1], batchId=7)
    visible = sorted(f for f in os.listdir(tmp_path) if f.endswith(".avro"))
    assert visible == ["epoch-7-part-aaa.avro"]
    # replay of epoch 7 with a NEW task attempt
    m2 = fake_task(buf, "bbb")
    w.commit([m2], batchId=7)
    visible2 = sorted(f for f in os.listdir(tmp_path) if f.endswith(".avro"))
    assert visible2 == ["epoch-7-part-aaa.avro"]  # no duplicate published
    assert not (tmp_path / ".part-bbb.avro.tmp").exists()  # tmp cleaned
    # a different epoch commits normally
    m3 = fake_task(buf, "ccc")
    w.commit([m3], batchId=8)
    visible3 = sorted(f for f in os.listdir(tmp_path) if f.endswith(".avro"))
    assert visible3 == ["epoch-7-part-aaa.avro", "epoch-8-part-ccc.avro"]
