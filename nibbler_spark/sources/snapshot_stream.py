"""The snapshot table format as a STREAMING SOURCE —
``readStream.format("nibbler_snapshot")``.

The analogue of Delta's streaming source: a stream over a lakehouse
table serves each commit's ADDED files exactly once, with the offset
being simply the last snapshot id served. Because manifests are
immutable and data files are carried over by reference, the set
difference ``files(end_sid) − files(start_sid)`` IS the append delta —
no file-modification-time heuristics, no directory listing races. A
downstream pipeline restarted from its checkpoint replays the same
snapshot range and gets byte-identical rows (``readBetweenOffsets``),
which is what makes snapshot-fed streams exactly-once end-to-end when
combined with an idempotent sink.

Contract: APPEND-ONLY consumption (like Delta's streaming source
without ``skipChangeCommits``) — compaction / copy-on-write rewrites
would surface rewritten files as new data; deletion-vector commits add
no files and stream nothing. The simple-reader path decodes driver-side
(pyarrow), which bounds per-batch volume; the partition-parallel batch
path over the same table is ``operators.snapshots.read_snapshot``.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    SimpleDataSourceStreamReader,
)

_ARROW_TO_DDL = {
    "int64": "bigint",
    "int32": "int",
    "double": "double",
    "float": "float",
    "string": "string",
    "large_string": "string",
    "bool": "boolean",
    "date32[day]": "date",
}


def _snapshot_schema_ddl(table_dir: str) -> str:
    """Derive a DDL schema from the first data file of snapshot 0 —
    a footer-only read, mirroring what format("parquet") infers."""
    import pyarrow.parquet as pq

    from nibbler_spark.operators.snapshots import snapshot_files

    first = snapshot_files(table_dir, 0)[0]
    sch = pq.read_schema(os.path.join(table_dir, first))
    cols = []
    for field in sch:
        t = str(field.type)
        if t.startswith("timestamp"):
            ddl = "timestamp"
        else:
            ddl = _ARROW_TO_DDL.get(t)
        if ddl is None:
            raise ValueError(f"unsupported snapshot column type {t!r}")
        cols.append(f"{field.name} {ddl}")
    return ", ".join(cols)


class SnapshotStreamSource(DataSource):
    """``format("nibbler_snapshot")`` — streaming read of a snapshot
    table's commit log. Option ``path`` is the table directory."""

    @classmethod
    def name(cls) -> str:
        return "nibbler_snapshot"

    def schema(self) -> str:
        return _snapshot_schema_ddl(self.options.get("path"))

    def simpleStreamReader(self, schema) -> "SnapshotStreamReader":
        return SnapshotStreamReader(self.options)


class SnapshotStreamReader(SimpleDataSourceStreamReader):
    """Offset = the last snapshot id served (-1 = nothing yet). Each
    micro-batch serves the files ADDED between that snapshot and the
    current latest — the immutable-manifest set difference."""

    def __init__(self, options) -> None:
        self.path = options.get("path")

    def initialOffset(self) -> dict:
        return {"sid": -1}

    def _added_files(self, start_sid: int, end_sid: int) -> list[str]:
        from nibbler_spark.operators.snapshots import snapshot_files

        if end_sid < 0:
            return []
        before = (
            set(snapshot_files(self.path, start_sid))
            if start_sid >= 0
            else set()
        )
        return sorted(
            p
            for p in snapshot_files(self.path, end_sid)
            if p not in before
        )

    def _decode(self, rel_paths: list[str]) -> list[tuple]:
        import pyarrow.parquet as pq

        out: list[tuple] = []
        for rel in rel_paths:
            tbl = pq.read_table(os.path.join(self.path, rel))
            cols = [c.to_pylist() for c in tbl.columns]
            out.extend(zip(*cols) if cols else [])
        return out

    def read(self, start: dict):
        from nibbler_spark.operators.snapshots import latest_snapshot

        cur = latest_snapshot(self.path)
        if cur <= start["sid"]:
            return [], {"sid": start["sid"]}
        return (
            self._decode(self._added_files(start["sid"], cur)),
            {"sid": cur},
        )

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._decode(self._added_files(start["sid"], end["sid"]))


def register_snapshot_stream_source(spark) -> None:
    """Idempotent registration of ``format("nibbler_snapshot")``."""
    spark.dataSource.register(SnapshotStreamSource)
