"""Streaming source/sink builders (SURVEY §2.3 A5–A8, A10; Kafka A7).

File-drop and rate sources are fully exercised by the declared streaming
queries; Kafka is declared here behind an availability check (the test
environment ships no broker and no kafka-sql package) — the builder is
the production code path, smoke-usable wherever a broker exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def file_drop_source(
    spark: SparkSession,
    directory: str,
    schema: str,
    fmt: str = "json",
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    """Schema'd file-drop streaming source (A5). Admission control via
    maxFilesPerTrigger is the backpressure knob (R3)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return getattr(reader, fmt)(directory)


def rate_source(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Rate source for dev/bench (A6): (timestamp, value) rows."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )


def kafka_available(spark: SparkSession) -> bool:
    """True when the spark-sql-kafka package is on the classpath."""
    try:
        spark.readStream.format("kafka").option(
            "kafka.bootstrap.servers", "localhost:9092"
        ).option("subscribe", "probe").load()
        return True
    except Exception:
        return False


def kafka_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Kafka source (A7) — the production ingestion path for the
    micro-batcher. ``maxOffsetsPerTrigger`` ≈ the reference's bounded
    queue admission (R3). Requires the spark-sql-kafka package."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    return reader.load()


def kafka_sink(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
):
    """Kafka sink (A7): expects a ``value`` (and optionally ``key``)
    binary/string column per the Spark Kafka contract."""
    return (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
    )
