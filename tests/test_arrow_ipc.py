"""From-scratch Arrow IPC reader (operators/arrow_ipc.py) vs real
pyarrow-written files — value-exact decode across file/stream framing,
all supported types, multi-batch payloads, and clean rejection of
unsupported/malformed inputs."""

from __future__ import annotations

import io

import pyarrow as pa
import pyarrow.ipc as ipc
import pytest

from nibbler_spark.operators.arrow_ipc import ArrowFormatError, arrow_ipc_read


def _table(n=1000):
    return pa.table(
        {
            "id": pa.array(list(range(n)), pa.int64()),
            "score": pa.array([i * 0.5 for i in range(n)], pa.float64()),
            "name": pa.array([f"row{i}" for i in range(n)], pa.utf8()),
            "maybe": pa.array(
                [None if i % 3 == 0 else i for i in range(n)], pa.int32()
            ),
            "flag": pa.array([i % 2 == 0 for i in range(n)], pa.bool_()),
            "blob": pa.array(
                [bytes([i % 256, (i * 7) % 256]) for i in range(n)],
                pa.binary(),
            ),
            "f32": pa.array([float(i) for i in range(n)], pa.float32()),
            "small": pa.array([i % 100 for i in range(n)], pa.int16()),
            "u8": pa.array([i % 250 for i in range(n)], pa.uint8()),
        }
    )


def _encode(t, kind, chunk=300):
    buf = io.BytesIO()
    w = (ipc.new_file if kind == "file" else ipc.new_stream)(buf, t.schema)
    for b in t.to_batches(max_chunksize=chunk):
        w.write_batch(b)
    w.close()
    return buf.getvalue()


@pytest.mark.parametrize("kind", ["file", "stream"])
def test_reads_pyarrow_payloads_value_exact(kind):
    t = _table()
    data = arrow_ipc_read(_encode(t, kind))
    for name in t.column_names:
        assert data[name] == t.column(name).to_pylist(), name


def test_multi_batch_and_single_batch_agree():
    t = _table(777)
    a = arrow_ipc_read(_encode(t, "file", chunk=50))
    b = arrow_ipc_read(_encode(t, "file", chunk=100000))
    assert a == b


def test_empty_table():
    t = _table(0)
    data = arrow_ipc_read(_encode(t, "stream"))
    assert all(v == [] for v in data.values())


def test_all_null_column():
    t = pa.table({"x": pa.array([None, None, None], pa.int64())})
    assert arrow_ipc_read(_encode(t, "file")) == {"x": [None, None, None]}


def test_rejects_unsupported_and_malformed():
    d = pa.table({"d": pa.array(["a", "b", "a"]).dictionary_encode()})
    with pytest.raises(ArrowFormatError):
        arrow_ipc_read(_encode(d, "stream"))
    nested = pa.table({"l": pa.array([[1, 2], [3]], pa.list_(pa.int64()))})
    with pytest.raises(ArrowFormatError):
        arrow_ipc_read(_encode(nested, "file"))
    with pytest.raises(ArrowFormatError):
        arrow_ipc_read(b"garbage data here")
    good = _encode(_table(10), "file")
    with pytest.raises(ArrowFormatError):
        arrow_ipc_read(good[:40])  # truncated mid-schema
