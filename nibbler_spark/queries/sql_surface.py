"""SQL-surface operators beyond the CTE/EXISTS/scalar forms in
``relational.ext_sql_cte_subquery``: IN / NOT IN subqueries, LATERAL
correlated subqueries, correlated scalars in the SELECT list, and the
CDC merge-upsert dataflow. Each is a distinct Catalyst rewrite
(RewritePredicateSubquery → semi/anti join, DecorrelateInnerQuery,
lateral join planning) — declared so the plan shapes are pinned, not
assumed."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nibbler_spark.operators.merge import merge_upsert
from nibbler_spark.queries import register
from nibbler_spark.sources import load_table, register_temp_views


@register(
    "sql01_in_notin_subquery",
    survey_id="EXT-SQL",
    category="sql-surface",
    oracle="""
SELECT p_partkey, p_brand
FROM part
WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
  AND p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_discount >= 0.1)
ORDER BY p_partkey
""",
)
def sql01_in_notin_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN → left-semi, NOT IN → (null-aware) left-anti: both predicate
    subqueries rewritten to joins by Catalyst, no per-row re-execution.
    The subquery columns are non-null here so the anti join stays the
    fast non-null-aware form at scale."""
    register_temp_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT p_partkey, p_brand
        FROM part
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
          AND p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_discount >= 0.1)
        ORDER BY p_partkey
        """
    )


@register(
    "sql02_lateral_topk",
    survey_id="EXT-SQL",
    category="sql-surface",
    oracle="""
SELECT n.n_name, t.c_custkey, t.c_name, t.c_acctbal
FROM nation n, LATERAL (
  SELECT c_custkey, c_name, c_acctbal
  FROM customer
  WHERE c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey
  LIMIT 3
) t
ORDER BY n.n_name, t.c_acctbal DESC, t.c_custkey
""",
)
def sql02_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery with per-row LIMIT — the SQL spelling
    of top-k-per-group (F4); Spark decorrelates it into a ranked join
    rather than re-running the inner query per outer row."""
    register_temp_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name, t.c_custkey, t.c_name, t.c_acctbal
        FROM nation n, LATERAL (
          SELECT c_custkey, c_name, c_acctbal
          FROM customer
          WHERE c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey
          LIMIT 3
        ) t
        ORDER BY n.n_name, t.c_acctbal DESC, t.c_custkey
        """
    )


@register(
    "sql03_correlated_scalar_select",
    survey_id="EXT-SQL",
    category="sql-surface",
    oracle="""
SELECT c_custkey, c_name,
       (SELECT MAX(o_totalprice) FROM orders o WHERE o.o_custkey = c.c_custkey)
         AS max_order_price,
       (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey)
         AS n_orders
FROM customer c
ORDER BY c_custkey
""",
)
def sql03_correlated_scalar_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries in the SELECT list — decorrelated to
    a single aggregate-then-left-outer-join (one pass over orders, not
    one query per customer)."""
    register_temp_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_name,
               (SELECT MAX(o_totalprice) FROM orders o WHERE o.o_custkey = c.c_custkey)
                 AS max_order_price,
               (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey)
                 AS n_orders
        FROM customer c
        ORDER BY c_custkey
        """
    )


@register(
    "ext_merge_upsert",
    survey_id="EXT-MERGE",
    category="sql-surface",
    oracle="""
WITH changes AS (
  SELECT o_orderkey AS k, 'U' AS op, o_custkey,
         o_totalprice * CAST(1.1 AS DOUBLE) AS o_totalprice
  FROM orders WHERE o_orderkey % 10 = 0
  UNION ALL
  SELECT o_orderkey, 'D', CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE)
  FROM orders WHERE o_orderkey % 10 = 1
  UNION ALL
  SELECT o_orderkey + 10000000, 'I', o_custkey, CAST(100.0 AS DOUBLE)
  FROM orders WHERE o_orderkey % 10 = 2
),
merged AS (
  SELECT COALESCE(c.k, b.o_orderkey) AS o_orderkey,
         CASE WHEN c.op IS NOT NULL THEN c.o_custkey ELSE b.o_custkey END AS o_custkey,
         CASE WHEN c.op IS NOT NULL THEN c.o_totalprice ELSE b.o_totalprice END AS o_totalprice,
         c.op
  FROM orders b FULL JOIN changes c ON b.o_orderkey = c.k
)
SELECT o_orderkey, o_custkey, o_totalprice
FROM merged WHERE op IS NULL OR op <> 'D'
ORDER BY o_orderkey
""",
)
def ext_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC merge: a deterministic change set (10% updates, 10% deletes,
    10% inserts derived from orders itself) applied via the single-
    shuffle full-outer-join merge operator."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    updates = o.where(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        F.lit("U").alias("op"),
        "o_custkey",
        (F.col("o_totalprice") * F.lit(1.1)).alias("o_totalprice"),
    )
    deletes = o.where(F.col("o_orderkey") % 10 == 1).select(
        "o_orderkey",
        F.lit("D").alias("op"),
        F.lit(None).cast("bigint").alias("o_custkey"),
        F.lit(None).cast("double").alias("o_totalprice"),
    )
    inserts = o.where(F.col("o_orderkey") % 10 == 2).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        F.lit("I").alias("op"),
        "o_custkey",
        F.lit(100.0).alias("o_totalprice"),
    )
    changes = updates.unionByName(deletes).unionByName(inserts)
    merged = merge_upsert(
        o, changes, key="o_orderkey", value_cols=["o_custkey", "o_totalprice"]
    )
    return merged.orderBy("o_orderkey")
