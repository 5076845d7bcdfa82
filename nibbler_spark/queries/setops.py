"""Set operation queries (SURVEY §2.3 G1–G7) over two overlapping
multisets derived from lineitem (so ALL vs DISTINCT semantics actually
differ)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nibbler_spark.queries import register
from nibbler_spark.sources import load_table

# Two overlapping multisets of (flag, status) pairs.
_A_SQL = "SELECT l_returnflag AS flag, CAST(l_quantity AS INTEGER) AS qty FROM lineitem WHERE l_quantity < 10"
_B_SQL = "SELECT l_returnflag AS flag, CAST(l_quantity AS INTEGER) AS qty FROM lineitem WHERE l_quantity < 5"


def _a(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(F.col("l_quantity") < 10).select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("int").alias("qty"),
    )


def _b(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(F.col("l_quantity") < 5).select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("int").alias("qty"),
    )


@register(
    "g01_union_all",
    survey_id="G1",
    category="setop",
    oracle=f"SELECT flag, qty FROM (({_A_SQL}) UNION ALL ({_B_SQL})) ORDER BY flag, qty",
)
def g01_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL — multiset concatenation (zero-shuffle: partitions are
    simply appended)."""
    return _a(spark, sf_dir).unionAll(_b(spark, sf_dir)).orderBy("flag", "qty")


@register(
    "g02_union_distinct",
    survey_id="G2",
    category="setop",
    oracle=f"SELECT flag, qty FROM (({_A_SQL}) UNION ({_B_SQL})) ORDER BY flag, qty",
)
def g02_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) — concatenate then dedupe."""
    return (
        _a(spark, sf_dir)
        .union(_b(spark, sf_dir))
        .distinct()
        .orderBy("flag", "qty")
    )


@register(
    "g03_union_by_name",
    survey_id="G3",
    category="setop",
    oracle="""
SELECT * FROM (
  (SELECT l_returnflag AS flag, COUNT(*) AS n, NULL AS src FROM lineitem GROUP BY 1)
  UNION ALL BY NAME
  (SELECT l_returnflag AS flag, 'b' AS src FROM lineitem GROUP BY l_returnflag)
) ORDER BY flag, n NULLS FIRST, src NULLS FIRST
""",
)
def g03_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName with allowMissingColumns — schema realignment by name,
    missing columns NULL-filled."""
    li = load_table(spark, sf_dir, "lineitem")
    left = li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.count("*").alias("n")
    )
    right = (
        li.select(F.col("l_returnflag").alias("flag"))
        .distinct()
        .withColumn("src", F.lit("b"))
    )
    return left.unionByName(right, allowMissingColumns=True).orderBy(
        "flag",
        F.col("n").asc_nulls_first(),
        F.col("src").asc_nulls_first(),
    )


@register(
    "g04_intersect",
    survey_id="G4",
    category="setop",
    oracle=f"SELECT flag, qty FROM (({_A_SQL}) INTERSECT ({_B_SQL})) ORDER BY flag, qty",
)
def g04_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct)."""
    return (
        _a(spark, sf_dir).intersect(_b(spark, sf_dir)).orderBy("flag", "qty")
    )


@register(
    "g05_intersect_all",
    survey_id="G5",
    category="setop",
    oracle=f"SELECT flag, qty FROM (({_A_SQL}) INTERSECT ALL ({_B_SQL})) ORDER BY flag, qty",
)
def g05_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — multiset intersection (min of multiplicities)."""
    return (
        _a(spark, sf_dir)
        .intersectAll(_b(spark, sf_dir))
        .orderBy("flag", "qty")
    )


@register(
    "g06_except",
    survey_id="G6",
    category="setop",
    oracle=f"SELECT flag, qty FROM (({_A_SQL}) EXCEPT ({_B_SQL})) ORDER BY flag, qty",
)
def g06_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) = subtract."""
    return (
        _a(spark, sf_dir).subtract(_b(spark, sf_dir)).orderBy("flag", "qty")
    )


@register(
    "g07_except_all",
    survey_id="G7",
    category="setop",
    oracle=f"SELECT flag, qty FROM (({_A_SQL}) EXCEPT ALL ({_B_SQL})) ORDER BY flag, qty",
)
def g07_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiset difference (multiplicities subtract)."""
    return (
        _a(spark, sf_dir).exceptAll(_b(spark, sf_dir)).orderBy("flag", "qty")
    )


@register(
    "ext_snapshot_diff",
    survey_id="EXT-SNAPSHOT-DIFF",
    category="setop",
    oracle="""
WITH new_snap AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 50 = 0
              THEN CAST(o_totalprice AS DECIMAL(18,4)) * 2
              ELSE CAST(o_totalprice AS DECIMAL(18,4)) END AS o_totalprice
  FROM orders
),
old_snap AS (
  SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,4)) AS o_totalprice
  FROM orders
)
SELECT 'old_only' AS side, o_orderkey,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice FROM (
  SELECT * FROM old_snap EXCEPT SELECT * FROM new_snap
)
UNION ALL
SELECT 'new_only' AS side, o_orderkey,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice FROM (
  SELECT * FROM new_snap EXCEPT SELECT * FROM old_snap
)
ORDER BY o_orderkey, side
""",
)
def ext_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff: symmetric difference between two table versions
    with side tags — the CDC-validation / reconciliation primitive
    ("what changed between yesterday's and today's extract"). Each
    EXCEPT is one hash-aggregate over the full row; changed keys
    surface twice (old_only + new_only), inserts/deletes once. The
    changed rows here are a deterministic 2% price rewrite."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_totalprice").cast("decimal(18,4)").alias(
            "o_totalprice"
        )
    )
    new_snap = o.select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 50 == 0, F.col("o_totalprice") * 2
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    # the diff itself compares exact decimals; the emitted column is
    # double (DecimalType output is a driver hash hazard)
    dbl = F.col("o_totalprice").cast("double").alias("o_totalprice")
    old_only = o.exceptAll(new_snap).select(
        F.lit("old_only").alias("side"), "o_orderkey", dbl
    )
    new_only = new_snap.exceptAll(o).select(
        F.lit("new_only").alias("side"), "o_orderkey", dbl
    )
    return old_only.unionByName(new_only).orderBy("o_orderkey", "side")
