"""Whole-query stage-level metrics via the AppStatusStore.

`tests/test_aqe_scale.py`'s `_executed_plan_metrics` walks SQLMetrics of
the FINAL executed plan — which misses every job a query ran before its
last one (localCheckpoint rounds in label propagation / k-core, IVF
training passes, multi-stage pipelines).  For whole-query shuffle and
spill accounting the driver's AppStatusStore is the right source: it
aggregates per-stage executor metrics across ALL jobs, exactly what the
Spark UI's stage table shows.

`stageList` is reached over py4j with every Scala default made explicit
(py4j cannot fill Scala default args): (statuses, details=False,
withSummaries=False, unsortedQuantiles=Array.empty[Double],
taskStatus=[]).  Verified against pyspark 4.1.

Deltas, not totals: the store accumulates over the app lifetime (and
evicts beyond spark.ui.retainedStages=1000), so callers snapshot before
and after a query.  A single query never approaches 1000 stages here.
"""

from __future__ import annotations

from typing import Callable, Tuple

from pyspark.sql import SparkSession

FIELDS = (
    "shuffle_write_bytes",
    "shuffle_read_bytes",
    "memory_spill_bytes",
    "disk_spill_bytes",
    "input_bytes",
    "output_bytes",
)


def stage_totals(spark: SparkSession) -> dict:
    """Cumulative per-app sums of the stage metrics in FIELDS."""
    sc = spark.sparkContext
    jvm = sc._jvm
    store = sc._jsc.sc().statusStore()
    stages = store.stageList(
        jvm.java.util.ArrayList(),  # all statuses
        False,  # details
        False,  # withSummaries
        sc._gateway.new_array(jvm.double, 0),  # unsortedQuantiles
        jvm.java.util.ArrayList(),  # taskStatus
    )
    tot = dict.fromkeys(FIELDS, 0)
    for i in range(stages.size()):
        s = stages.apply(i)
        tot["shuffle_write_bytes"] += s.shuffleWriteBytes()
        tot["shuffle_read_bytes"] += s.shuffleReadBytes()
        tot["memory_spill_bytes"] += s.memoryBytesSpilled()
        tot["disk_spill_bytes"] += s.diskBytesSpilled()
        tot["input_bytes"] += s.inputBytes()
        tot["output_bytes"] += s.outputBytes()
    return tot


def measure_stages(spark: SparkSession, fn: Callable[[], object]) -> Tuple[object, dict]:
    """Run `fn` and return (its result, the stage-metric deltas it
    caused).  Negative deltas cannot occur: the store only grows within
    retention, and a query's stages all land after the snapshot."""
    before = stage_totals(spark)
    result = fn()
    after = stage_totals(spark)
    return result, {k: after[k] - before[k] for k in FIELDS}
