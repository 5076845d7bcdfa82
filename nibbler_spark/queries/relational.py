"""Projection / filter / predicate queries (SURVEY §2.3 B1–B13) plus the
flagship TPC-H-Q1-style pricing summary (SURVEY §7 M1).

All row-level double expressions are engine-deterministic (single IEEE
ops on identical operands); aggregates use the exact-decimal discipline
from ``_helpers``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nibbler_spark.queries import register
from nibbler_spark.queries._helpers import davg, dsum, sql_davg, sql_dsum
from nibbler_spark.sources import load_table

# ---------------------------------------------------------------------------
# Flagship: TPC-H Q1-style pricing summary over lineitem.
# Exercises A1 (parquet scan w/ predicate pushdown), B6 (filter), D1
# (partial+final hash agg), F1 (sort). At 100 TB: the filter and the
# 11-column→7-column pruning reach the parquet scan; the groupBy has 4
# distinct keys so partial aggregation collapses nearly all rows map-side
# before the (tiny) shuffle.
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    survey_id="M1",
    category="flagship",
    oracle=f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_dsum('l_quantity')} AS sum_qty,
  {sql_dsum('l_extendedprice')} AS sum_base_price,
  {sql_dsum('CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))')} AS sum_disc_price,
  {sql_davg('l_quantity')} AS avg_qty,
  {sql_davg('l_discount')} AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,4)")
    )
    return (
        li.where(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# B. Projection / filter / predicates
# ---------------------------------------------------------------------------


@register(
    "b01_projection",
    survey_id="B1",
    category="projection",
    oracle="SELECT c_custkey, c_name, c_mktsegment FROM customer ORDER BY c_custkey",
)
def b01_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column projection — prunes to 3 columns at the scan."""
    return (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


@register(
    "b02_computed_projection",
    survey_id="B2",
    category="projection",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS disc_price,
       l_quantity + 1 AS qty_plus_one
FROM lineitem
ORDER BY l_orderkey, l_linenumber
""",
)
def b02_computed_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed projection + alias (row-level double ops are IEEE-identical
    across engines)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias(
            "disc_price"
        ),
        (F.col("l_quantity") + F.lit(1)).alias("qty_plus_one"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "b03_with_column",
    survey_id="B3",
    category="projection",
    oracle="""
SELECT o_orderkey, o_totalprice, o_totalprice * 0.1 AS tax_estimate
FROM orders ORDER BY o_orderkey
""",
)
def b03_with_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Add a column via withColumn."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .withColumn("tax_estimate", F.col("o_totalprice") * F.lit(0.1))
        .orderBy("o_orderkey")
    )


@register(
    "b04_drop_column",
    survey_id="B4",
    category="projection",
    oracle="""
SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey
""",
)
def b04_drop_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drop a column."""
    return (
        load_table(spark, sf_dir, "nation")
        .drop("n_regionkey")
        .orderBy("n_nationkey")
    )


@register(
    "b05_cast",
    survey_id="B5",
    category="projection",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(l_quantity AS INTEGER) AS qty_int,
       CAST(l_orderkey AS VARCHAR) AS key_str,
       CAST(l_shipdate AS DATE) AS ship_day,
       CAST(CAST(l_extendedprice AS DECIMAL(18,4)) AS DOUBLE) AS price_dec
FROM lineitem ORDER BY l_orderkey, l_linenumber
""",
)
def b05_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Casts across int/string/date/decimal.

    r11 perf (guide §2.3, h09 pattern): casts projected ABOVE the
    output sort so only the raw columns ride the range exchange and
    the cast projection runs once (the range sampler re-evaluates
    everything below the sort). Identical rows and order."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_shipdate",
        "l_extendedprice",
    ).orderBy("l_orderkey", "l_linenumber")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_orderkey").cast("string").alias("key_str"),
        F.col("l_shipdate").cast("date").alias("ship_day"),
        # decimal cast exercised as the intermediate; final emit is DOUBLE
        # (DecimalType output hashes differently under the driver — r1 fail)
        F.col("l_extendedprice").cast("decimal(18,4)").cast("double").alias("price_dec"),
    )


@register(
    "b06_filter_boolean_algebra",
    survey_id="B6",
    category="filter",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
FROM lineitem
WHERE (l_quantity > 30 AND l_discount >= 0.05) OR NOT (l_returnflag = 'N')
ORDER BY l_orderkey, l_linenumber
""",
)
def b06_filter_boolean_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comparison + AND/OR/NOT filter, pushed to the scan."""
    li = load_table(spark, sf_dir, "lineitem")
    cond = ((F.col("l_quantity") > 30) & (F.col("l_discount") >= 0.05)) | (
        ~(F.col("l_returnflag") == "N")
    )
    return li.where(cond).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag"
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "b07_isin",
    survey_id="B7",
    category="filter",
    oracle="""
SELECT event_id, event_type FROM events
WHERE event_type IN ('click', 'purchase')
ORDER BY event_id
""",
)
def b07_isin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list predicate."""
    return (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type").isin("click", "purchase"))
        .select("event_id", "event_type")
        .orderBy("event_id")
    )


@register(
    "b08_between",
    survey_id="B8",
    category="filter",
    oracle="""
SELECT o_orderkey, o_orderdate FROM orders
WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
ORDER BY o_orderkey
""",
)
def b08_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BETWEEN over timestamps."""
    return (
        load_table(spark, sf_dir, "orders")
        .where(
            F.col("o_orderdate").between(
                F.lit("1996-01-01").cast("timestamp"),
                F.lit("1996-12-31").cast("timestamp"),
            )
        )
        .select("o_orderkey", "o_orderdate")
        .orderBy("o_orderkey")
    )


@register(
    "b09_like_ilike",
    survey_id="B9",
    category="filter",
    oracle="""
SELECT p_partkey, p_name, p_type FROM part
WHERE p_name LIKE '%widget%' OR p_type ILIKE '%eConOmy%'
ORDER BY p_partkey
""",
)
def b09_like_ilike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / ILIKE patterns."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.where(
            F.col("p_name").like("%widget%") | F.col("p_type").ilike("%eConOmy%")
        )
        .select("p_partkey", "p_name", "p_type")
        .orderBy("p_partkey")
    )


@register(
    "b10_null_predicates",
    survey_id="B10",
    category="filter",
    oracle="""
SELECT l_orderkey, l_linenumber,
       NULLIF(l_discount, 0) AS disc_or_null,
       NULLIF(l_discount, 0) IS NULL AS disc_is_null,
       NULLIF(l_discount, 0) IS NOT NULL AS disc_is_not_null
FROM lineitem
ORDER BY l_orderkey, l_linenumber
""",
)
def b10_null_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS [NOT] NULL over a synthesized nullable column (source data has no
    NULLs; NULLIF introduces them identically in both engines)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_or_null = F.nullif(F.col("l_discount"), F.lit(0.0))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        disc_or_null.alias("disc_or_null"),
        disc_or_null.isNull().alias("disc_is_null"),
        disc_or_null.isNotNull().alias("disc_is_not_null"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "b11_case_when",
    survey_id="B11",
    category="filter",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice >= 300000 THEN 'high'
            WHEN o_totalprice >= 100000 THEN 'mid'
            ELSE 'low' END AS price_band
FROM orders ORDER BY o_orderkey
""",
)
def b11_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN ladder."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
    ).orderBy("o_orderkey")


@register(
    "b12_distinct",
    survey_id="B12",
    category="filter",
    oracle="""
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
ORDER BY l_returnflag, l_linestatus
""",
)
def b12_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT rows (hash-agg shuffle on the pair; partial distinct
    collapses map-side)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "b13_sample_bounded",
    survey_id="B13",
    category="filter",
    mode="bounded",
    oracle="SELECT TRUE AS frac_in_range, TRUE AS deterministic_with_seed",
)
def b13_sample_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded row sampling — engines' RNGs differ, so the declared check is
    the assertion itself: sampled fraction within ±30% of target, and the
    same seed yields the same rows twice (SURVEY B13 ⚠)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber"
    )
    total = li.count()
    s1 = li.sample(fraction=0.1, seed=42)
    s2 = li.sample(fraction=0.1, seed=42)
    n1 = s1.count()
    frac_ok = bool(0.07 * total <= n1 <= 0.13 * total)
    det_ok = s1.exceptAll(s2).count() == 0 and s2.exceptAll(s1).count() == 0
    return spark.createDataFrame(
        [(frac_ok, det_ok)], "frac_in_range boolean, deterministic_with_seed boolean"
    )


@register(
    "ext_sql_cte_subquery",
    survey_id="EXT-SQL",
    category="sql-surface",
    oracle="""
WITH cust_orders AS (
  SELECT o_custkey, COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS spend
  FROM orders GROUP BY o_custkey
)
SELECT c.c_custkey, c.c_name, co.n_orders, co.spend
FROM customer c JOIN cust_orders co ON co.o_custkey = c.c_custkey
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
  AND co.spend > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                  FROM orders) / (SELECT COUNT(*) FROM customer)
ORDER BY c.c_custkey
""",
)
def ext_sql_cte_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spark.sql() entry point with a CTE, a correlated EXISTS, and
    scalar subqueries — the full SQL-surface path through the same
    Catalyst pipeline as the DataFrame API (both are one logical plan)."""
    from nibbler_spark.sources import register_temp_views

    register_temp_views(spark, sf_dir)
    return spark.sql(
        """
        WITH cust_orders AS (
          SELECT o_custkey, COUNT(*) AS n_orders,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS spend
          FROM orders GROUP BY o_custkey
        )
        SELECT c.c_custkey, c.c_name, co.n_orders, co.spend
        FROM customer c JOIN cust_orders co ON co.o_custkey = c.c_custkey
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
          AND co.spend > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                          FROM orders) / (SELECT COUNT(*) FROM customer)
        ORDER BY c.c_custkey
        """
    )


@register(
    "ext_null_handling",
    survey_id="EXT-NA",
    category="projection",
    oracle="""
WITH t AS (
  SELECT o_orderkey,
         NULLIF(o_orderstatus, 'O') AS maybe_status,
         NULLIF(o_totalprice, 0) AS maybe_price
  FROM orders
)
SELECT o_orderkey,
       COALESCE(maybe_status, 'OPEN') AS status_filled,
       COALESCE(maybe_price, -1.0) AS price_filled
FROM t
WHERE maybe_status IS NOT NULL OR maybe_price IS NOT NULL
ORDER BY o_orderkey
""",
)
def ext_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrameNaFunctions surface: na.fill for imputation + na.drop
    (how='all') for row pruning over synthesized NULLs."""
    o = load_table(spark, sf_dir, "orders")
    t = o.select(
        "o_orderkey",
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("maybe_status"),
        F.nullif(F.col("o_totalprice"), F.lit(0.0)).alias("maybe_price"),
    )
    return (
        t.na.drop(how="all", subset=["maybe_status", "maybe_price"])
        .na.fill({"maybe_status": "OPEN", "maybe_price": -1.0})
        .select(
            "o_orderkey",
            F.col("maybe_status").alias("status_filled"),
            F.col("maybe_price").alias("price_filled"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "ext_stratified_sample",
    survey_id="EXT-STRAT",
    category="projection",
    mode="bounded",
    oracle="SELECT true AS fractions_ok, true AS deterministic_with_seed",
)
def ext_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling (sampleBy): per-stratum fractions over
    o_orderstatus with a fixed seed. Engine RNGs differ, so the declared
    check is the bound (each stratum within ±50% relative of its target
    fraction; exact repeat with the same seed) — the same discipline as
    B13. At scale sampleBy is a map-only pass, no shuffle."""
    o = load_table(spark, sf_dir, "orders")
    fractions = {"O": 0.2, "F": 0.1, "P": 0.5}
    s1 = o.sampleBy("o_orderstatus", fractions, seed=42)
    s2 = o.sampleBy("o_orderstatus", fractions, seed=42)
    totals = {r["o_orderstatus"]: r["n"] for r in
              o.groupBy("o_orderstatus").agg(F.count("*").alias("n")).collect()}
    got = {r["o_orderstatus"]: r["n"] for r in
           s1.groupBy("o_orderstatus").agg(F.count("*").alias("n")).collect()}
    ok = all(
        0.5 * fractions[k] * totals[k] <= got.get(k, 0) <= 1.5 * fractions[k] * totals[k]
        for k in fractions
    )
    det = s1.exceptAll(s2).count() == 0 and s2.exceptAll(s1).count() == 0
    return spark.createDataFrame(
        [(bool(ok), bool(det))],
        "fractions_ok boolean, deterministic_with_seed boolean",
    )


@register(
    "ext_crosstab",
    survey_id="EXT-XTAB",
    category="aggregation",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
       CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
)
def ext_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency table via DataFrameStatFunctions.crosstab — the
    two-column frequency matrix (a pivot specialization)."""
    li = load_table(spark, sf_dir, "lineitem")
    ct = li.stat.crosstab("l_returnflag", "l_linestatus")
    return ct.select(
        F.col("l_returnflag_l_linestatus").alias("l_returnflag"),
        F.col("F").cast("bigint").alias("F"),
        F.col("O").cast("bigint").alias("O"),
    ).orderBy("l_returnflag")


@register(
    "ext_monotonic_id",
    survey_id="EXT-MONOID",
    category="projection",
    mode="bounded",
    oracle="SELECT true AS ids_unique, true AS order_preserved_within_partition",
)
def ext_monotonic_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """monotonically_increasing_id: shuffle-free distributed row ids
    (partition-id in the high bits). Ids are partition-layout-dependent,
    so the declared check is the invariant pair: global uniqueness and
    monotonicity within each partition — exactly what the operator
    guarantees at any scale."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.monotonically_increasing_id().alias("rid"),
        F.spark_partition_id().alias("pid"),
    )
    n = li.count()
    uniq = li.select("rid").distinct().count() == n
    from pyspark.sql import Window

    w = Window.partitionBy("pid").orderBy("rid")
    mono = (
        li.withColumn("prev", F.lag("rid").over(w))
        .where(F.col("prev").isNotNull() & (F.col("prev") >= F.col("rid")))
        .count()
        == 0
    )
    return spark.createDataFrame(
        [(bool(uniq), bool(mono))],
        "ids_unique boolean, order_preserved_within_partition boolean",
    )


@register(
    "ext_random_split",
    survey_id="EXT-SPLIT",
    category="projection",
    mode="bounded",
    oracle="""
SELECT true AS disjoint_and_complete, true AS fractions_ok,
       true AS deterministic_with_seed
""",
)
def ext_random_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test split via randomSplit(0.8/0.2, seed): the declared
    checks are the operator's exact invariants — the two sides PARTITION
    the input (disjoint, union-complete: exact row-count identity on
    unique event_ids), fractions land within ±10% relative, and the same
    seed reproduces the same split. Sampling is a map-only pass; the
    invariant checks are count aggregates."""
    e = load_table(spark, sf_dir, "events").select("event_id")
    tr, te = e.randomSplit([0.8, 0.2], seed=42)
    tr2, _ = e.randomSplit([0.8, 0.2], seed=42)
    n, ntr, nte = e.count(), tr.count(), te.count()
    overlap = tr.join(te, "event_id", "inner").count()
    disjoint_complete = overlap == 0 and ntr + nte == n
    fractions_ok = abs(ntr - 0.8 * n) <= 0.1 * 0.8 * n
    det = tr.exceptAll(tr2).count() == 0 and tr2.exceptAll(tr).count() == 0
    return spark.createDataFrame(
        [(bool(disjoint_complete), bool(fractions_ok), bool(det))],
        "disjoint_and_complete boolean, fractions_ok boolean, "
        "deterministic_with_seed boolean",
    )


@register(
    "ext_fk_integrity_audit",
    survey_id="EXT-FK-AUDIT",
    category="projection",
    oracle="""
SELECT 'lineitem->orders' AS fk, COUNT(*) AS n_orphans FROM (
  SELECT l_orderkey FROM lineitem
  WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
)
UNION ALL
SELECT 'orders->customer' AS fk, COUNT(*) AS n_orphans FROM (
  SELECT o_custkey FROM orders
  WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
)
UNION ALL
SELECT 'customer->nation' AS fk, COUNT(*) AS n_orphans FROM (
  SELECT c_nationkey FROM customer
  WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation)
)
ORDER BY fk
""",
)
def ext_fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan counts for three FK edges via
    left-anti joins — the standing data-quality gate every pipeline runs
    after ingest. Anti joins never duplicate the probe side, and each
    audit's shuffle is keyed by its FK; the three audits are independent
    and run as one union job. (Keys here are non-null, so anti-join and
    NOT IN agree; C5 documents the NULL divergence.)"""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey")

    def audit(probe, build, pk, fk, name):
        return (
            probe.join(build, probe[pk] == build[fk], "left_anti")
            .agg(F.count("*").alias("n_orphans"))
            .select(F.lit(name).alias("fk"), "n_orphans")
        )

    return (
        audit(li, o.select("o_orderkey"), "l_orderkey", "o_orderkey",
              "lineitem->orders")
        .unionByName(
            audit(o.select("o_custkey"), c.select("c_custkey"),
                  "o_custkey", "c_custkey", "orders->customer")
        )
        .unionByName(
            audit(c.select("c_nationkey"), n, "c_nationkey", "n_nationkey",
                  "customer->nation")
        )
        .orderBy("fk")
    )


@register(
    "ext_table_profile",
    survey_id="EXT-PROFILE",
    category="projection",
    oracle="""
SELECT 'o_custkey' AS col, COUNT(*) AS n,
       COUNT(*) - COUNT(o_custkey) AS n_null,
       COUNT(DISTINCT o_custkey) AS n_distinct,
       CAST(MIN(o_custkey) AS VARCHAR) AS min_v,
       CAST(MAX(o_custkey) AS VARCHAR) AS max_v
FROM orders
UNION ALL
SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
       COUNT(DISTINCT o_orderstatus),
       MIN(o_orderstatus), MAX(o_orderstatus)
FROM orders
UNION ALL
SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority),
       COUNT(DISTINCT o_orderpriority),
       MIN(o_orderpriority), MAX(o_orderpriority)
FROM orders
ORDER BY col
""",
)
def ext_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass-per-column table profiling (count / nulls / distinct /
    min / max in long format) — the ingest-time data-profile step that
    feeds layout decisions (which columns to cluster, where skew lives).
    Values stringified so heterogeneous columns stack in one result. At
    scale this runs as one job; distinct counts can downgrade to HLL
    (D6/EXT-HLL-MERGE) when exactness isn't needed."""
    o = load_table(spark, sf_dir, "orders")

    def prof(col: str):
        return o.agg(
            F.lit(col).alias("col"),
            F.count("*").alias("n"),
            (F.count("*") - F.count(col)).alias("n_null"),
            F.countDistinct(col).alias("n_distinct"),
            F.min(col).cast("string").alias("min_v"),
            F.max(col).cast("string").alias("max_v"),
        )

    return (
        prof("o_custkey")
        .unionByName(prof("o_orderstatus"))
        .unionByName(prof("o_orderpriority"))
        .orderBy("col")
    )


@register(
    "ext_hash_priority_sample",
    survey_id="EXT-HASH-SAMPLE",
    category="projection",
    oracle="""
SELECT lang, doc_id, priority FROM (
  SELECT lang, doc_id, md5(CAST(doc_id AS VARCHAR)) AS priority,
         ROW_NUMBER() OVER (
           PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rn
  FROM documents
) WHERE rn <= 3
ORDER BY lang, priority
""",
)
def ext_hash_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-group sampling via hash priority: rank rows
    inside each group by md5(key) and keep the top 3 — statistically
    uniform (the hash is effectively random) yet exactly reproducible
    across engines, runs, and cluster sizes, unlike RNG-based sampling
    (B13/EXT-STRAT are bounded checks for that reason; this one earns a
    hash oracle). The distributed form of reservoir sampling: one
    group-keyed window, no global state."""
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    pri = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("lang").orderBy(pri, F.col("doc_id"))
    return (
        d.select("lang", "doc_id", pri.alias("priority"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("lang", "doc_id", "priority")
        .orderBy("lang", "priority")
    )


@register(
    "ext_sequence_gap_check",
    survey_id="EXT-SEQ-GAP",
    category="projection",
    oracle="""
SELECT user_id,
       COUNT(*) AS n_events,
       MIN(event_id) AS first_id,
       MAX(event_id) AS last_id,
       MAX(event_id) - MIN(event_id) + 1 - COUNT(*) AS n_missing
FROM events GROUP BY user_id
HAVING MAX(event_id) - MIN(event_id) + 1 - COUNT(*) > 0
ORDER BY user_id
""",
)
def ext_sequence_gap_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-gap detection per key: compares the observed count to
    the id-range span, reporting keys with missing ids — the cheap
    completeness check for monotonically-assigned ingest ids (event_id
    is globally sequential here, so per-user gaps are expected and
    nonzero — what matters is that both engines compute the identical
    gap arithmetic). One grouped pass, four aggregates."""
    e = load_table(spark, sf_dir, "events")
    span = F.max("event_id") - F.min("event_id") + 1
    return (
        e.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("event_id").alias("first_id"),
            F.max("event_id").alias("last_id"),
            (span - F.count("*")).alias("n_missing"),
        )
        .where(F.col("n_missing") > 0)
        .orderBy("user_id")
    )


@register(
    "ext_date_spine",
    survey_id="EXT-DATE-SPINE",
    category="projection",
    oracle="""
WITH spine AS (
  SELECT CAST(UNNEST(generate_series(DATE '2024-01-01', DATE '2024-01-31',
                                     INTERVAL 1 DAY)) AS DATE) AS d
)
SELECT s.d AS cal_date,
       CAST(dayofweek(s.d) + 1 AS INT) AS dow,
       dayofweek(s.d) + 1 IN (1, 7) AS is_weekend,
       COUNT(e.event_id) AS n_events
FROM spine s
LEFT JOIN events e ON CAST(date_trunc('day', e.ts) AS DATE) = s.d
GROUP BY s.d ORDER BY s.d
""",
)
def ext_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-spine dimension: a generated continuous calendar (no gaps,
    unlike anything derived from fact data) left-joined to the facts so
    zero-activity days appear with 0 — the reporting-correctness pattern
    every calendar chart needs. The spine generates from sequence(), is
    31 rows, and broadcasts; dayofweek uses the H5 +1 oracle rewrite."""
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("date"),
                F.lit("2024-01-31").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("cal_date")
    )
    e = load_table(spark, sf_dir, "events").select(
        "event_id", F.date_trunc("day", "ts").cast("date").alias("day")
    )
    dow = F.dayofweek("cal_date")
    return (
        F.broadcast(spine)
        .join(e, F.col("day") == F.col("cal_date"), "left")
        .groupBy("cal_date")
        .agg(F.count("event_id").alias("n_events"))
        .select(
            "cal_date",
            dow.alias("dow"),
            dow.isin(1, 7).alias("is_weekend"),
            "n_events",
        )
        .orderBy("cal_date")
    )


@register(
    "ext_dq_expectations",
    survey_id="EXT-DQ",
    category="relational",
    oracle="""
SELECT 'customer_key_unique' AS check_name,
       (SELECT COUNT(*) - COUNT(DISTINCT c_custkey) FROM customer)
         AS violations
UNION ALL
SELECT 'discount_in_range',
       (SELECT COUNT(*) FROM lineitem
        WHERE l_discount < 0 OR l_discount > 1)
UNION ALL
SELECT 'lineitem_orderkey_fk',
       (SELECT COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey))
UNION ALL
SELECT 'orderkey_unique',
       (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders)
UNION ALL
SELECT 'orders_custkey_fk',
       (SELECT COUNT(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey))
UNION ALL
SELECT 'status_in_domain',
       (SELECT COUNT(*) FROM orders
        WHERE o_orderstatus NOT IN ('O', 'F', 'P'))
UNION ALL
SELECT 'totalprice_not_null',
       (SELECT COUNT(*) FROM orders WHERE o_totalprice IS NULL)
ORDER BY check_name
""",
)
def ext_dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectation suite (the Delta CHECK-constraint /
    Great-Expectations pattern): uniqueness, null-rate, value-domain
    and referential-integrity checks each reduce to a VIOLATION COUNT —
    zero means the expectation holds — evaluated as ordinary aggregates
    so the whole audit is one declarative job per table pair, never a
    row-by-row validator. FK checks are left-anti joins (the scalable
    spelling of NOT EXISTS); uniqueness is COUNT(*) − COUNT(DISTINCT).
    At 100 TB each check is a scan + partial aggregate, FK probes
    broadcast the dimension side, and the per-check outputs union into
    a single audit artifact a pipeline can gate a publish step on."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    def row(name: str, df_count) -> DataFrame:
        return df_count.select(
            F.lit(name).alias("check_name"),
            F.col("v").cast("bigint").alias("violations"),
        )

    checks = [
        row(
            "customer_key_unique",
            c.agg((F.count("*") - F.countDistinct("c_custkey")).alias("v")),
        ),
        row(
            "discount_in_range",
            li.where(
                (F.col("l_discount") < 0) | (F.col("l_discount") > 1)
            ).agg(F.count("*").alias("v")),
        ),
        row(
            "lineitem_orderkey_fk",
            li.join(
                o.select(F.col("o_orderkey").alias("l_orderkey")),
                "l_orderkey",
                "left_anti",
            ).agg(F.count("*").alias("v")),
        ),
        row(
            "orderkey_unique",
            o.agg((F.count("*") - F.countDistinct("o_orderkey")).alias("v")),
        ),
        row(
            "orders_custkey_fk",
            o.join(
                F.broadcast(
                    c.select(F.col("c_custkey").alias("o_custkey"))
                ),
                "o_custkey",
                "left_anti",
            ).agg(F.count("*").alias("v")),
        ),
        row(
            "status_in_domain",
            o.where(
                ~F.col("o_orderstatus").isin("O", "F", "P")
            ).agg(F.count("*").alias("v")),
        ),
        row(
            "totalprice_not_null",
            o.where(F.col("o_totalprice").isNull()).agg(
                F.count("*").alias("v")
            ),
        ),
    ]
    out = checks[0]
    for chk in checks[1:]:
        out = out.unionAll(chk)
    return out.orderBy("check_name")
