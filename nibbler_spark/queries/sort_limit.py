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


@register(
    "ext_skyline_2d",
    survey_id="EXT-SKYLINE",
    category="sort",
    oracle="""
WITH pts AS (
  SELECT p_partkey, CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_c,
         p_size
  FROM part
),
ranked AS (
  SELECT p_partkey, price_c, p_size,
         MAX(p_size) OVER (
           ORDER BY price_c
           RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS best_cheaper,
         MAX(p_size) OVER (PARTITION BY price_c) AS best_same
  FROM pts
)
SELECT p_partkey, price_c, p_size
FROM ranked
WHERE (best_cheaper IS NULL OR p_size > best_cheaper)
  AND p_size = best_same
ORDER BY price_c, p_partkey
""",
)
def ext_skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) over part: minimize retail price,
    maximize size; a part survives iff no other part is at most as
    expensive AND at least as large with one inequality strict.

    Dominance reduces to "is my size above every strictly-cheaper
    row's best size, and my price bucket's best at the same price" —
    computed in TWO PHASES so no stage windows over the whole table:
    (1) per-price-bucket max sizes (a tiny aggregate) take a prefix-max
    over the bucket ordering and BROADCAST back as each bucket's
    carry-in; (2) a value-RANGE frame WITHIN each bucket (RANGE, not
    ROWS, so equal-price rows stay out of their own frame) adds the
    in-bucket running best. The oracle states the same thing as one
    global RANGE window — the distributed two-pass must reproduce it
    exactly. Prices compare in integer cents so frame bounds are exact;
    at 100 TB this is the sort-filter skyline, no self-join, no
    quadratic pair blowup.
    """
    p = load_table(spark, sf_dir, "part")
    pts = p.select(
        "p_partkey",
        F.round(F.col("p_retailprice") * 100).cast("bigint").alias("price_c"),
        "p_size",
        (F.round(F.col("p_retailprice") * 100) / 1000)
        .cast("bigint")
        .alias("bucket"),
    )
    bucket_max = pts.groupBy("bucket").agg(F.max("p_size").alias("bmax"))
    w_b = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    carry = bucket_max.select(
        "bucket", F.max("bmax").over(w_b).alias("carry_in")
    )
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("price_c")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_same = Window.partitionBy("price_c")
    ranked = pts.join(F.broadcast(carry), "bucket").select(
        "p_partkey",
        "price_c",
        "p_size",
        F.greatest(
            F.coalesce(F.col("carry_in"), F.lit(-1)),
            F.coalesce(F.max("p_size").over(w_in), F.lit(-1)),
        ).alias("best_cheaper_v"),
        F.max("p_size").over(w_same).alias("best_same"),
    ).withColumn(
        "best_cheaper",
        F.when(F.col("best_cheaper_v") >= 0, F.col("best_cheaper_v")),
    )
    return (
        ranked.where(
            (F.col("best_cheaper").isNull() | (F.col("p_size") > F.col("best_cheaper")))
            & (F.col("p_size") == F.col("best_same"))
        )
        .select("p_partkey", "price_c", "p_size")
        .orderBy("price_c", "p_partkey")
    )
