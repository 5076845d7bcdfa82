#!/usr/bin/env python3
"""Diagnostic bench — reproduces bench.py's headline loop (same order,
same timed action, same debris cleanup) while probing session state
BETWEEN rows, to attribute the 32-core mid-bench slowdown cluster
(positions 17-21: kcore / cdc / a41 / i42, r11 VERDICT item #1).

Per row it records, to a JSONL file:
  - per-run wall times (not just the median, so bimodality is visible)
  - JVM GC time/count delta across the row (ManagementFactory beans)
  - JVM heap used after the row
  - live Python worker process count (pyspark.daemon / worker children)
  - spark local-dir (blockmgr) bytes + file count
  - /tmp nibbler-* dir count (streaming fixture/checkpoint debris)

Usage: SPARK_GRAFT_CPUS=32 python tools/bench_diag.py [--runs N]
       [--rows name1,name2,...] [--out FILE]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _py_worker_count() -> int:
    try:
        out = subprocess.run(
            ["ps", "-eo", "cmd"], capture_output=True, text=True, timeout=10
        ).stdout
    except Exception:
        return -1
    return sum(
        1
        for line in out.splitlines()
        if "pyspark.daemon" in line or "pyspark.worker" in line
    )


def _local_dir_stats(spark) -> tuple[int, int]:
    """(bytes, files) across the context's blockmgr/spark local dirs."""
    try:
        root = spark.sparkContext._jvm.org.apache.spark.SparkEnv.get() \
            .blockManager().diskBlockManager().localDirs()
        dirs = [str(root[i].getAbsolutePath()) for i in range(len(root))]
    except Exception:
        dirs = glob.glob("/tmp/blockmgr-*")
    total = 0
    files = 0
    for d in dirs:
        for dirpath, _, names in os.walk(d):
            for f in names:
                try:
                    total += os.path.getsize(os.path.join(dirpath, f))
                    files += 1
                except OSError:
                    pass
    return total, files


def _gc_stats(spark) -> tuple[float, int]:
    jvm = spark.sparkContext._jvm
    beans = jvm.java.lang.management.ManagementFactory \
        .getGarbageCollectorMXBeans()
    t = 0.0
    c = 0
    for i in range(beans.size()):
        b = beans.get(i)
        t += b.getCollectionTime() / 1000.0
        c += b.getCollectionCount()
    return t, c


def _heap_used(spark) -> int:
    jvm = spark.sparkContext._jvm
    mem = jvm.java.lang.management.ManagementFactory.getMemoryMXBean()
    return mem.getHeapMemoryUsage().getUsed()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--rows", type=str, default="")
    ap.add_argument("--out", type=str, default="/tmp/bench_diag.jsonl")
    ap.add_argument(
        "--gc-between", action="store_true",
        help="call System.gc() in the between-rows cleanup (A/B knob)",
    )
    args = ap.parse_args()

    from bench import FROZEN_ANCHORS, ROTATING  # bench.py's exact order
    from nibbler_spark.queries import load_all
    from nibbler_spark.session import get_spark
    from nibbler_spark.sources import load_table

    rows = (
        args.rows.split(",") if args.rows else FROZEN_ANCHORS + ROTATING
    )
    specs = load_all()
    spark = get_spark(app_name="nibbler-spark-bench-diag")
    load_table(spark, SF_DIR, "lineitem").count()

    def _drop_debris() -> None:
        for tbl in spark.catalog.listTables():
            if tbl.name.startswith("mem_"):
                spark.catalog.dropTempView(tbl.name)
        spark.catalog.clearCache()
        persistent = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in list(persistent.keySet()):
            persistent.get(rid).rdd().unpersist(False)
        if args.gc_between:
            spark.sparkContext._jvm.System.gc()

    out = open(args.out, "w")
    gc_t0, gc_c0 = _gc_stats(spark)
    for pos, name in enumerate(rows):
        spec = specs.get(name)
        if spec is None:
            continue
        _drop_debris()
        pre_workers = _py_worker_count()
        pre_bytes, pre_files = _local_dir_stats(spark)
        spec.spark(spark, SF_DIR).collect()  # warm-up (untimed)
        samples = []
        for _ in range(args.runs):
            t0 = time.monotonic()
            spec.spark(spark, SF_DIR).collect()
            samples.append(round(time.monotonic() - t0, 4))
        gc_t1, gc_c1 = _gc_stats(spark)
        rec = {
            "pos": pos,
            "name": name,
            "median": round(statistics.median(samples), 4),
            "samples": samples,
            "gc_time_delta_s": round(gc_t1 - gc_t0, 3),
            "gc_count_delta": gc_c1 - gc_c0,
            "heap_used_mb": _heap_used(spark) // (1024 * 1024),
            "py_workers_pre": pre_workers,
            "py_workers_post": _py_worker_count(),
            "blockmgr_mb_pre": pre_bytes // (1024 * 1024),
            "blockmgr_files_pre": pre_files,
            "tmp_nibbler_dirs": len(glob.glob("/tmp/nibbler-*")),
        }
        gc_t0, gc_c0 = gc_t1, gc_c1
        out.write(json.dumps(rec) + "\n")
        out.flush()
        print(json.dumps(rec), flush=True)
    out.close()


if __name__ == "__main__":
    main()
