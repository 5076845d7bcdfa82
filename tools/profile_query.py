"""Isolate one declared query: capture .explain("formatted") and time it
with the noop sink (guide §1.4 — times the computation, not the collect).

Usage:
    python tools/profile_query.py NAME [NAME...] [--runs 5] [--sf DIR]
        [--plan-dir plans/r11] [--suffix before] [--collect]

Writes <plan-dir>/<name>_<suffix>.txt and prints one JSON line per query:
{"name": ..., "noop_median_sec": ..., "runs": [...]}.

--collect times .collect() instead (bench.py's timed action) for
apples-to-apples comparison with BENCH rows.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import statistics
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ap = argparse.ArgumentParser()
ap.add_argument("names", nargs="+")
ap.add_argument("--runs", type=int, default=5)
ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
ap.add_argument("--plan-dir", default=None)
ap.add_argument("--suffix", default="before")
ap.add_argument("--collect", action="store_true")
args = ap.parse_args()

from nibbler_spark.queries import load_all
from nibbler_spark.session import get_spark

specs = load_all()
spark = get_spark(app_name="nibbler-profile")
from nibbler_spark.sources import load_table

load_table(spark, args.sf, "lineitem").count()  # warm footers/JVM

def profile_one(name):
    spec = specs.get(name)
    if spec is None:
        print(json.dumps({"name": name, "err": "unknown query"}))
        return
    spark.sparkContext.setJobDescription(f"profile:{name}")
    df = spec.spark(spark, args.sf)
    if args.plan_dir:
        os.makedirs(args.plan_dir, exist_ok=True)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(
            os.path.join(args.plan_dir, f"{name}_{args.suffix}.txt"), "w"
        ) as fh:
            fh.write(buf.getvalue())

    def run_once():
        d = spec.spark(spark, args.sf)
        if args.collect:
            d.collect()
        else:
            d.write.format("noop").mode("overwrite").save()

    run_once()  # warm-up
    samples = []
    for _ in range(args.runs):
        t0 = time.monotonic()
        run_once()
        samples.append(round(time.monotonic() - t0, 4))
    print(
        json.dumps(
            {
                "name": name,
                "timed_action": "collect" if args.collect else "noop",
                "median_sec": round(statistics.median(samples), 4),
                "runs": samples,
            }
        )
    )
    spark.sparkContext.setJobDescription(None)


for name in args.names:
    try:
        profile_one(name)
    except Exception as exc:  # one bad query must not kill a long scan
        print(json.dumps({"name": name, "err": f"{type(exc).__name__}: {exc}"[:400]}))
