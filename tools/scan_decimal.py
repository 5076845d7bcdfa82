"""List every declared query whose FINAL output schema contains a DecimalType.

These are the driver-hash hazards flagged in VERDICT.md (round 1): the driver's
canonicalizer renders Decimal values with their declared scale (trailing zeros
kept), while DuckDB's result objects carry a different scale — numerically equal
values hash differently. Policy (round 2): no DecimalType in any declared output
schema; decimals remain internal exact-arithmetic carriers only.

Schema-only: builds each DataFrame lazily, never executes it.
"""

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql.types import ArrayType, DataType, DecimalType, MapType, StructType

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def has_decimal(dt: DataType) -> bool:
    if isinstance(dt, DecimalType):
        return True
    if isinstance(dt, ArrayType):
        return has_decimal(dt.elementType)
    if isinstance(dt, MapType):
        return has_decimal(dt.keyType) or has_decimal(dt.valueType)
    if isinstance(dt, StructType):
        return any(has_decimal(f.dataType) for f in dt.fields)
    return False


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("scan-decimal")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    hits = []
    for name, fn in sorted(E.queries().items()):
        try:
            df = fn(spark, SF)
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: BUILD-ERR {type(exc).__name__}: {exc}")
            continue
        bad = [
            f"{f.name}:{f.dataType.simpleString()}"
            for f in df.schema.fields
            if has_decimal(f.dataType)
        ]
        if bad:
            hits.append(name)
            print(f"{name}: {', '.join(bad)}")
    print(f"TOTAL decimal-output queries: {len(hits)}")
    print(" ".join(hits))


if __name__ == "__main__":
    main()
