"""Custom Python Data Source (Spark 4 `pyspark.sql.datasource` API) —
SURVEY §2.3 A-family extension.

The reference's only ingestion surface is a Go channel
(`/root/reference/nibbler.go:78,120-122`); our engine's equivalent
"bring your own source" hook on the batch side is this API: a pure-Python
DataSource whose reader declares input partitions so generation runs
parallel on executors — each partition yields only its slice, nothing is
materialized on the driver, and the same class works unchanged on a
1000-executor cluster.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class SynthDataSource(DataSource):
    """Deterministic synthetic-rows source: ``rows`` total rows dealt
    round-robin across ``partitions`` input partitions."""

    @classmethod
    def name(cls) -> str:
        return "nibbler_synth"

    def schema(self) -> str:
        return "id long, doubled long, tag string"

    def reader(self, schema) -> "SynthReader":
        return SynthReader(self.options)


class SynthReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n = int(options.get("rows", "1000"))
        self.parts = int(options.get("partitions", "8"))

    def partitions(self):
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition):
        start = partition.value
        for k in range(start, self.n, self.parts):
            yield (k, k * 2 + 1, f"row{k}")


def register_synth_source(spark) -> None:
    """Register the source once per session (re-registration is a no-op
    overwrite in Spark 4)."""
    spark.dataSource.register(SynthDataSource)
