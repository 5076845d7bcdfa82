"""MessagePack as a first-class Spark DataSource —
`format("nibbler_msgpack")`.

Files carry the wire convention msgpack event logs actually use: a
CONCATENATED STREAM of map objects (no length prefix — the codec's
framing is self-delimiting, `msgpack_codec.unpack_stream`), one map per
row, keys = column names, absent key = NULL. Typed columns come from
the required ``ddl`` option (or are inferred as strings from the first
object). Doubles ride the codec's float64 representation — lossless.

Scale shape mirrors the Avro/XML DataSources: the driver lists file
NAMES only and declares one input partition per file — decoding runs on
executors; the writer encodes each task partition into its own file and
commits via the standard two-phase write/commit/abort protocol.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

from nibbler_spark.operators.msgpack_codec import pack, unpack_stream


def _mp_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".msgpack")
    )


class MsgpackDataSource(DataSource):
    """format("nibbler_msgpack") — concatenated msgpack map streams."""

    @classmethod
    def name(cls) -> str:
        return "nibbler_msgpack"

    def schema(self) -> str:
        ddl = self.options.get("ddl")
        if ddl:
            return ddl
        for f in _mp_files(self.options.get("path")):
            with open(f, "rb") as fh:
                objs = unpack_stream(fh.read())
            if objs:
                return ", ".join(f"{k} string" for k in objs[0])
        raise ValueError("nibbler_msgpack: no rows to infer from")

    def reader(self, schema) -> "MsgpackReader":
        return MsgpackReader(self.options, schema)

    def writer(self, schema, overwrite: bool) -> "MsgpackWriter":
        return MsgpackWriter(self.options, schema, overwrite)


class MsgpackReader(DataSourceReader):
    def __init__(self, options, schema) -> None:
        self.path = options.get("path")
        self.names = [f.name for f in schema.fields]

    def partitions(self):
        return [InputPartition(f) for f in _mp_files(self.path)]

    def read(self, partition):
        with open(partition.value, "rb") as fh:
            objs = unpack_stream(fh.read())
        for obj in objs:
            yield tuple(obj.get(n) for n in self.names)


class MsgpackCommit(WriterCommitMessage):
    def __init__(self, final_name: str, tmp_name: str) -> None:
        self.final_name = final_name
        self.tmp_name = tmp_name


class MsgpackWriter(DataSourceWriter):
    def __init__(self, options, schema, overwrite: bool) -> None:
        self.path = options.get("path")
        self.names = [f.name for f in schema.fields]
        os.makedirs(self.path, exist_ok=True)
        if overwrite:
            for f in _mp_files(self.path):
                os.remove(f)

    def write(self, iterator) -> MsgpackCommit:
        part = uuid.uuid4().hex[:12]
        tmp = os.path.join(self.path, f".part-{part}.msgpack.tmp")
        with open(tmp, "wb") as fh:
            for row in iterator:
                obj = {
                    n: row[n] for n in self.names if row[n] is not None
                }
                fh.write(pack(obj))
        return MsgpackCommit(
            f"part-{part}.msgpack", os.path.basename(tmp)
        )

    def commit(self, messages) -> None:
        for m in messages:
            os.rename(
                os.path.join(self.path, m.tmp_name),
                os.path.join(self.path, m.final_name),
            )

    def abort(self, messages) -> None:
        for m in messages:
            try:
                os.remove(os.path.join(self.path, m.tmp_name))
            except OSError:
                pass


def register_msgpack_source(spark) -> None:
    spark.dataSource.register(MsgpackDataSource)
