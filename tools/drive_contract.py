"""Simulate the external driver: plain SparkSession (no UTC/AQE pinning),
__spark_entry__ contract, full oracle sweep at sf0.01."""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

SF = os.environ.get("NIBBLER_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

only = sys.argv[1:] or None

# Parallelism knobs, overridable for partition-independence sweeps:
# the hash oracle must produce identical values at ANY partition count
# (the exact-arithmetic discipline's core claim). Defaults match the
# external driver's plain session.
_CPUS = os.environ.get("NIBBLER_DRIVE_CPUS", "8")
_SHUF = os.environ.get("NIBBLER_DRIVE_SHUFFLE", "8")
spark = (
    SparkSession.builder.master(f"local[{_CPUS}]")
    .config("spark.sql.shuffle.partitions", _SHUF)
    .appName("drive-driver-contract")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as E

df = E.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, schema={[f.name for f in df.schema]}")
assert len(rows) > 0

import duckdb

from nibbler_spark.oracle import compare

con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
    )

qs = E.queries()
oracles = E.oracle_sql()
mismatches = []
t0 = time.monotonic()
for name in sorted(qs):
    if only and name not in only:
        continue
    t1 = time.monotonic()
    try:
        df = qs[name](spark, SF)
        if name in oracles:
            rep = compare(name, df, con, oracles[name])
            ok = rep.ok
            detail = "" if ok else str(rep)
        else:
            n = len(df.collect())
            ok, detail = True, f"rows-only n={n}"
    except Exception as exc:  # noqa: BLE001
        ok, detail = False, f"EXC {type(exc).__name__}: {exc}"
    dt = time.monotonic() - t1
    status = "ok" if ok else "MISMATCH"
    print(f"{name}: {status} ({dt:.1f}s) {detail[:300]}")
    if not ok:
        mismatches.append(name)

print(f"TOTAL: {time.monotonic() - t0:.0f}s  MISMATCHES: {len(mismatches)} {mismatches}")
