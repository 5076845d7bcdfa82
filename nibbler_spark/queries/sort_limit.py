"""Sort / limit / top-k queries (SURVEY §2.3 F1–F4).

Scale notes: global ORDER BY is a range-partitioned sort; ORDER BY +
LIMIT plans as TakeOrderedAndProject (per-partition top-k, tiny merge on
the driver) — no full sort ever materializes; top-k per group is a
window filter, one shuffle on the group key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nibbler_spark.queries import register
from nibbler_spark.sources import load_table


@register(
    "f01_multi_sort_nulls",
    survey_id="F1",
    category="sort",
    oracle="""
SELECT o_orderkey, NULLIF(o_orderstatus, 'O') AS status_or_null, o_totalprice
FROM orders
ORDER BY status_or_null ASC NULLS FIRST, o_totalprice DESC, o_orderkey ASC
""",
)
def f01_multi_sort_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column sort with explicit NULLS FIRST/LAST and direction mix
    (output order is part of the declared semantics)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_or_null"),
        "o_totalprice",
    ).orderBy(
        F.col("status_or_null").asc_nulls_first(),
        F.col("o_totalprice").desc(),
        F.col("o_orderkey").asc(),
    )


@register(
    "f02_order_limit",
    survey_id="F2",
    category="sort",
    oracle="""
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
""",
)
def f02_order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 by price: plans as TakeOrderedAndProject (no global sort)."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


@register(
    "f03_offset_limit",
    survey_id="F3",
    category="sort",
    oracle="""
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 10
""",
)
def f03_offset_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OFFSET + LIMIT pagination after a total order."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(10)
        .limit(10)
    )


@register(
    "f04_topk_per_group",
    survey_id="F4",
    category="sort",
    oracle="""
SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
QUALIFY ROW_NUMBER() OVER (
  PARTITION BY l_returnflag
  ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
) <= 3
ORDER BY l_returnflag, l_extendedprice DESC, l_orderkey, l_linenumber
""",
)
def f04_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 line items per return flag: row_number window + filter
    (unique tiebreak keys make it deterministic)."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("l_extendedprice").desc(),
        F.col("l_orderkey"),
        F.col("l_linenumber"),
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            "l_returnflag",
            F.col("l_extendedprice").desc(),
            "l_orderkey",
            "l_linenumber",
        )
    )
