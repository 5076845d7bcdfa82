"""Subprocess harness for the at-most-once-under-task-retry golden
(r4 verdict #2).  Not a pytest module — run by
tests/test_nibbler_core.py::test_at_most_once_under_task_retry.

The reference's core delivery contract is at-most-once processor
invocation (/root/reference/nibbler.go:146-148: a failed batch is
dropped, never replayed).  On Spark that contract must survive TASK
retries: executor-side failures are retried by the scheduler *below*
the ``collect()`` boundary inside ``foreachBatch``, so the driver-side
re-batcher sees each micro-batch exactly once regardless of how many
task attempts it took.  This harness proves it empirically rather than
by argument:

- master ``local[4,2]`` → every task gets 2 attempts (local-mode task
  retry is controlled by the master string, not spark.task.maxFailures);
- a row UDF in the stream source consults ``TaskContext.attemptNumber()``
  and RAISES on every first attempt (attempt 0), dropping a marker file
  per (stage, partition, attempt) so the parent test can verify that
  retries genuinely happened;
- the processor appends every delivered batch to a side-effect log;
- stdout line ``RESULT:{json}`` carries the log + marker census.

Expected: the log is exactly the no-failure golden
``[[x:0..x:3], [x:4..x:7], [x:8, x:9]]`` — no duplicated or partial
batch at the re-batcher layer — while attempt-0 failure markers AND
attempt-1 success markers both exist.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import threading
import time


def main() -> None:
    marker_dir = sys.argv[1]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in sys.path:
        sys.path.insert(0, repo)

    from pyspark.sql import SparkSession
    from pyspark.sql.functions import udf

    spark = (
        SparkSession.builder.appName("nibbler-retry-golden")
        .master("local[4,2]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    from nibbler_spark.config import Config
    from nibbler_spark.streaming.transport import FileDropReceiver, NibblerStream

    got: list[list[str]] = []
    lock = threading.Lock()

    def processor(_dl, _trig, batch):
        with lock:
            got.append([r["value"] for r in batch])

    @udf("string")
    def fail_first(v):
        from pyspark import TaskContext

        tc = TaskContext.get()
        att = tc.attemptNumber() if tc is not None else -1
        sid = tc.stageId() if tc is not None else -1
        pid = tc.partitionId() if tc is not None else -1
        with open(
            os.path.join(marker_dir, f"attempt-{sid}-{pid}-{att}"), "w"
        ):
            pass
        if att == 0:
            raise RuntimeError("injected first-attempt task failure")
        return v

    src_dir = tempfile.mkdtemp(prefix="nibbler-retry-src-")
    source = (
        spark.readStream.schema("__seq long, value string")
        .option("maxFilesPerTrigger", 1)
        .json(src_dir)
        .withColumn("value", fail_first("value"))
    )
    stream = NibblerStream(
        spark,
        Config(processor=processor, size=4, ticker_s=300.0),
        source,
        order_column="__seq",
    )
    receiver = FileDropReceiver(src_dir, stream=stream)
    stream.start()
    try:
        for i in range(10):
            receiver.send(f"x:{i}")
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            with lock:
                flushed = sum(len(b) for b in got)
            if flushed + stream.rebatcher.buffered >= 10:
                break
            time.sleep(0.1)
    finally:
        stream.stop(flush=True)

    markers = sorted(os.listdir(marker_dir))
    print(
        "RESULT:"
        + json.dumps(
            {
                "batches": got,
                "attempt0_markers": sum(m.endswith("-0") for m in markers),
                "attempt1_markers": sum(m.endswith("-1") for m in markers),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
