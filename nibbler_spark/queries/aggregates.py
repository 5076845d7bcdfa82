"""Aggregation queries (SURVEY §2.3 D1–D21).

Engine-determinism rules: double sums/avgs go through exact decimal
(``_helpers``); integer-valued doubles (l_quantity) have exact raw-moment
sums in both engines; only builtin higher-order stats (stddev/corr/
skewness/percentile) legitimately diverge in accumulation order, so they
— and only they — are rounded to 4 dp on both sides (FIXTURES.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nibbler_spark.queries import register
from nibbler_spark.queries._helpers import davg, dec, dsum, sql_davg, sql_dsum
from nibbler_spark.sources import load_table, register_temp_views


@register(
    "d01_grouped_agg",
    survey_id="D1",
    category="aggregation",
    oracle=f"""
SELECT o_orderpriority,
       {sql_dsum('o_totalprice')} AS total,
       {sql_davg('o_totalprice')} AS avg_price,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price,
       COUNT(*) AS n
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
)
def d01_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped sum/avg/min/max/count — Spark's partial+final hash agg
    collapses map-side before the 5-key shuffle."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            dsum("o_totalprice").alias("total"),
            davg("o_totalprice").alias("avg_price"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            F.count("*").alias("n"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "d02_global_agg",
    survey_id="D2",
    category="aggregation",
    oracle=f"""
SELECT COUNT(*) AS n_rows,
       {sql_dsum('l_extendedprice')} AS total_price,
       MIN(l_shipdate) AS first_ship,
       MAX(l_shipdate) AS last_ship
FROM lineitem
""",
)
def d02_global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global aggregate, no grouping."""
    return load_table(spark, sf_dir, "lineitem").agg(
        F.count("*").alias("n_rows"),
        dsum("l_extendedprice").alias("total_price"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )


@register(
    "d03_count_null_semantics",
    survey_id="D3",
    category="aggregation",
    oracle="""
SELECT l_returnflag,
       COUNT(*) AS n_all,
       COUNT(NULLIF(l_discount, 0)) AS n_discounted
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
)
def d03_count_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(*) counts rows; count(col) skips NULLs."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_all"),
            F.count(F.nullif(F.col("l_discount"), F.lit(0.0))).alias(
                "n_discounted"
            ),
        )
        .orderBy("l_returnflag")
    )


@register(
    "d04_count_distinct",
    survey_id="D4",
    category="aggregation",
    oracle="""
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(DISTINCT (o_orderstatus, o_orderdate)) AS n_status_dates
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
)
def d04_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT DISTINCT, single- and multi-arg (expand + two-phase
    agg under the hood)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.countDistinct("o_orderstatus", "o_orderdate").alias(
                "n_status_dates"
            ),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "d05_sum_avg_distinct",
    survey_id="D5",
    category="aggregation",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_uq_qty,
       CAST(AVG(DISTINCT CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS avg_uq_qty
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
)
def d05_sum_avg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUM/AVG DISTINCT over exact decimals (distinct sets are identical,
    so the aggregates are too)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.sum_distinct(dec("l_quantity")).cast("double").alias("sum_uq_qty"),
            F.expr(
                "cast(avg(DISTINCT cast(l_quantity as decimal(18,4))) as double)"
            ).alias("avg_uq_qty"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "d06_approx_count_distinct",
    survey_id="D6",
    category="aggregation",
    mode="bounded",
    oracle="SELECT COUNT(DISTINCT l_orderkey) AS n_exact, TRUE AS within_bound FROM lineitem",
)
def d06_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++). HLL implementations differ across
    engines, so the declared check is the bound itself:
    |approx − exact| / exact ≤ 3·rsd (SURVEY D6)."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.countDistinct("l_orderkey").alias("n_exact"),
        F.approx_count_distinct("l_orderkey", rsd=0.05).alias("n_approx"),
    )
    return agg.select(
        "n_exact",
        (
            F.abs(F.col("n_approx") - F.col("n_exact"))
            / F.col("n_exact")
            <= 3 * 0.05
        ).alias("within_bound"),
    )


@register(
    "d07_having",
    survey_id="D7",
    category="aggregation",
    oracle="""
SELECT o_custkey, COUNT(*) AS n_orders
FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 12
ORDER BY o_custkey
""",
)
def d07_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING = post-aggregation filter."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
        .where(F.col("n_orders") >= 12)
        .orderBy("o_custkey")
    )


_GSETS_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
       {sql_dsum('l_quantity')} AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
ORDER BY g_flag, g_status, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
"""


@register(
    "d08_grouping_sets",
    survey_id="D8",
    category="aggregation",
    oracle=_GSETS_ORACLE,
)
def d08_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS with per-column GROUPING() flags (bit-order-free,
    SURVEY D8 ⚠)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            dsum("l_quantity").alias("sum_qty"),
        )
        .orderBy(
            "g_flag",
            "g_status",
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@register(
    "d09_rollup",
    survey_id="D9",
    category="aggregation",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
       COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY g_flag, g_status, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
""",
)
def d09_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.count("*").alias("n"),
        )
        .orderBy(
            "g_flag",
            "g_status",
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@register(
    "d10_cube",
    survey_id="D10",
    category="aggregation",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
       COUNT(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY g_flag, g_status, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
""",
)
def d10_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE — all grouping combinations."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.count("*").alias("n"),
        )
        .orderBy(
            "g_flag",
            "g_status",
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@register(
    "d11_min_by_max_by",
    survey_id="D11",
    category="aggregation",
    oracle="""
SELECT o_custkey,
       ARG_MIN(o_orderstatus, o_orderkey) AS first_status,
       ARG_MAX(o_orderstatus, o_orderkey) AS last_status,
       MIN(o_orderkey) AS first_key,
       MAX(o_orderkey) AS last_key
FROM orders GROUP BY o_custkey ORDER BY o_custkey
""",
)
def d11_min_by_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by/max_by (argmin/argmax) over the unique o_orderkey ordering —
    the deterministic replacement for first()/last() (SURVEY D11 ⚠)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.min_by("o_orderstatus", "o_orderkey").alias("first_status"),
            F.max_by("o_orderstatus", "o_orderkey").alias("last_status"),
            F.min("o_orderkey").alias("first_key"),
            F.max("o_orderkey").alias("last_key"),
        )
        .orderBy("o_custkey")
    )


@register(
    "d12_collect_list",
    survey_id="D12",
    category="aggregation",
    oracle="""
SELECT l_orderkey, LIST_SORT(LIST(l_linenumber)) AS line_numbers
FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey
""",
)
def d12_collect_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list, order-canonicalized via array_sort (collection order
    is nondeterministic in any distributed engine)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_list("l_linenumber")).alias("line_numbers"))
        .orderBy("l_orderkey")
    )


@register(
    "d13_collect_set",
    survey_id="D13",
    category="aggregation",
    oracle="""
SELECT l_orderkey, LIST_SORT(LIST(DISTINCT l_returnflag)) AS flags
FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey
""",
)
def d13_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set, sorted for canonical comparison."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_returnflag")).alias("flags"))
        .orderBy("l_orderkey")
    )


@register(
    "d14_stddev_variance",
    survey_id="D14",
    category="aggregation",
    oracle="""
SELECT l_returnflag,
       ROUND(STDDEV_SAMP(l_quantity), 4) AS sd_samp,
       ROUND(STDDEV_POP(l_quantity), 4) AS sd_pop,
       ROUND(VAR_SAMP(l_quantity), 4) AS var_samp,
       ROUND(VAR_POP(l_quantity), 4) AS var_pop
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
)
def d14_stddev_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stddev/variance (sample & population) — builtin accumulation
    differs across engines, hence 4 dp rounding on both sides."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 4).alias("sd_samp"),
            F.round(F.stddev_pop("l_quantity"), 4).alias("sd_pop"),
            F.round(F.var_samp("l_quantity"), 4).alias("var_samp"),
            F.round(F.var_pop("l_quantity"), 4).alias("var_pop"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "d15_corr_covar",
    survey_id="D15",
    category="aggregation",
    oracle="""
SELECT l_returnflag,
       ROUND(CORR(l_quantity, l_extendedprice), 4) + 0 AS qty_price_corr,
       ROUND(COVAR_SAMP(l_quantity, l_discount), 4) + 0 AS qty_disc_covs,
       ROUND(COVAR_POP(l_quantity, l_discount), 4) + 0 AS qty_disc_covp
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
)
def d15_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """corr / covar_samp / covar_pop."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            (F.round(F.corr("l_quantity", "l_extendedprice"), 4) + F.lit(0.0)).alias(
                "qty_price_corr"
            ),
            (F.round(F.covar_samp("l_quantity", "l_discount"), 4) + F.lit(0.0)).alias(
                "qty_disc_covs"
            ),
            (F.round(F.covar_pop("l_quantity", "l_discount"), 4) + F.lit(0.0)).alias(
                "qty_disc_covp"
            ),
        )
        .orderBy("l_returnflag")
    )


@register(
    "d16_skewness_kurtosis",
    survey_id="D16",
    category="aggregation",
    oracle="""
WITH m AS (
  SELECT l_returnflag,
         AVG(l_quantity) AS mu,
         AVG(l_quantity * l_quantity) AS m2r,
         AVG(l_quantity * l_quantity * l_quantity) AS m3r,
         AVG(l_quantity * l_quantity * l_quantity * l_quantity) AS m4r
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       ROUND((m3r - 3 * mu * m2r + 2 * mu * mu * mu)
             / POWER(m2r - mu * mu, 1.5), 4) + 0 AS skew,
       ROUND((m4r - 4 * mu * m3r + 6 * mu * mu * m2r - 3 * mu * mu * mu * mu)
             / POWER(m2r - mu * mu, 2) - 3, 4) + 0 AS kurt
FROM m ORDER BY l_returnflag
""",
)
def d16_skewness_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's skewness/kurtosis are POPULATION moments (g1, excess g2);
    DuckDB's builtins apply sample corrections — the oracle recomputes
    Spark's formula from raw moments (SURVEY D16 ⚠). l_quantity is
    integer-valued so the raw moment sums are exact in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            (F.round(F.skewness("l_quantity"), 4) + F.lit(0.0)).alias("skew"),
            (F.round(F.kurtosis("l_quantity"), 4) + F.lit(0.0)).alias("kurt"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "d17_percentile_median",
    survey_id="D17",
    category="aggregation",
    oracle="""
SELECT l_returnflag,
       ROUND(QUANTILE_CONT(l_extendedprice, 0.5), 4) AS p50,
       ROUND(QUANTILE_CONT(l_extendedprice, 0.9), 4) AS p90,
       ROUND(MEDIAN(l_extendedprice), 4) AS med
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
)
def d17_percentile_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentile / median — both engines interpolate linearly."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_extendedprice", 0.5), 4).alias("p50"),
            F.round(F.percentile("l_extendedprice", 0.9), 4).alias("p90"),
            F.round(F.median("l_extendedprice"), 4).alias("med"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "d18_approx_percentile",
    survey_id="D18",
    category="aggregation",
    mode="bounded",
    oracle="SELECT TRUE AS within_bound",
)
def d18_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile — sketch-based; declared check: the approximate
    median lies between the exact p45 and p55 (rank-error bound)."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.approx_percentile("l_extendedprice", 0.5, 1000).alias("ap50"),
        F.percentile("l_extendedprice", 0.45).alias("p45"),
        F.percentile("l_extendedprice", 0.55).alias("p55"),
    )
    return agg.select(
        (
            (F.col("ap50") >= F.col("p45")) & (F.col("ap50") <= F.col("p55"))
        ).alias("within_bound")
    )


@register(
    "d19_mode",
    survey_id="D19",
    category="aggregation",
    oracle="SELECT MODE(event_type) AS modal_type FROM events",
)
def d19_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mode — event_type has a unique modal value at every scale factor
    (verified in the data; ties would be nondeterministic in both
    engines, SURVEY D19 ⚠)."""
    return load_table(spark, sf_dir, "events").agg(
        F.mode("event_type").alias("modal_type")
    )


@register(
    "d20_pivot",
    survey_id="D20",
    category="aggregation",
    oracle=f"""
SELECT l_returnflag,
       {sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS qty_f,
       {sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS qty_o
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
)
def d20_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot on explicit values (explicit value lists avoid a discovery
    pass — mandatory at scale)."""
    li = load_table(spark, sf_dir, "lineitem")
    pivoted = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(dec("l_quantity")).cast("double"))
    )
    return pivoted.select(
        "l_returnflag",
        F.col("F").alias("qty_f"),
        F.col("O").alias("qty_o"),
    ).orderBy("l_returnflag")


@register(
    "d21_time_bucket_agg",
    survey_id="D21",
    category="aggregation",
    oracle=f"""
SELECT TIME_BUCKET(INTERVAL '1 hour', ts) AS bucket_start,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS total_value
FROM events GROUP BY 1 ORDER BY 1
""",
)
def d21_time_bucket_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch windowed-time aggregation: groupBy(window(ts, 1h)) ≡
    time_bucket. Epoch-aligned hour buckets agree across engines."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            dsum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("bucket_start"), "n_events", "total_value"
        )
        .orderBy("bucket_start")
    )


@register(
    "ext_freq_items",
    survey_id="EXT-FREQ",
    category="aggregation",
    mode="bounded",
    oracle="SELECT true AS all_heavy_hitters_found",
)
def ext_freq_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via DataFrameStatFunctions.freqItems (a single-pass
    Karp/Misra-Gries-style sketch — map-side summaries merged on the
    driver, no shuffle of the raw column). The sketch guarantees a
    SUPERSET of the items with true frequency >= support, so the declared
    bound is containment: every o_orderstatus value with exact frequency
    >= 0.25 (all three, by construction of the testdata) appears in the
    sketch result. Exact frequencies come from a plain groupBy."""
    o = load_table(spark, sf_dir, "orders")
    found = set(
        o.stat.freqItems(["o_orderstatus"], support=0.25).collect()[0][0]
    )
    n = o.count()
    heavy = {
        r["o_orderstatus"]
        for r in o.groupBy("o_orderstatus").count().collect()
        if r["count"] >= 0.25 * n
    }
    return spark.createDataFrame(
        [(bool(heavy <= found),)], "all_heavy_hitters_found boolean"
    )


@register(
    "ext_histogram_bins",
    survey_id="EXT-HIST",
    category="aggregation",
    oracle="""
WITH b AS (
  SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM orders
),
binned AS (
  SELECT CAST(LEAST(FLOOR((o_totalprice - lo) / ((hi - lo) / 20)), 19)
              AS BIGINT) AS bin,
         o_totalprice
  FROM orders CROSS JOIN b
)
SELECT bin, COUNT(*) AS n,
       MIN(o_totalprice) AS bin_min, MAX(o_totalprice) AS bin_max
FROM binned GROUP BY bin ORDER BY bin
""",
)
def ext_histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width 20-bin histogram with data-dependent bounds: the
    1-row min/max aggregate is broadcast back over the table (the
    two-pass pattern — at 100 TB the bounds pass is a cheap
    column-pruned scan and the broadcast is one row), then binning is a
    codegen'd floor expression and the final rollup has 20 groups.
    All arithmetic is double on identical operands in both engines."""
    o = load_table(spark, sf_dir, "orders").select("o_totalprice")
    b = o.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    binned = o.crossJoin(F.broadcast(b)).select(
        F.least(
            F.floor(
                (F.col("o_totalprice") - F.col("lo"))
                / ((F.col("hi") - F.col("lo")) / 20)
            ),
            F.lit(19),
        )
        .cast("bigint")
        .alias("bin"),
        "o_totalprice",
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.min("o_totalprice").alias("bin_min"),
            F.max("o_totalprice").alias("bin_max"),
        )
        .orderBy("bin")
    )


@register(
    "ext_hll_sketch_union",
    survey_id="EXT-HLL-MERGE",
    category="aggregation",
    mode="bounded",
    oracle="SELECT true AS union_estimate_within_5pct",
)
def ext_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch pattern: per-group HLL sketches of o_custkey
    (hll_sketch_agg, Apache DataSketches), then hll_union_agg collapses
    the group sketches into one global estimate WITHOUT rescanning the
    data — the exact mechanism that lets 1000 executors each summarize
    their partitions and ship kilobytes to a final reducer at 100 TB.
    Declared bound: the unioned estimate is within 5% of the exact
    distinct count (HLL default accuracy is ~2.5% at lgK=12)."""
    o = load_table(spark, sf_dir, "orders")
    sk = o.groupBy("o_orderstatus").agg(
        F.hll_sketch_agg("o_custkey").alias("sk")
    )
    est = sk.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).collect()[0]["est"]
    exact = o.select("o_custkey").distinct().count()
    ok = exact > 0 and abs(est - exact) / exact <= 0.05
    return spark.createDataFrame(
        [(bool(ok),)], "union_estimate_within_5pct boolean"
    )


@register(
    "d22_unpivot",
    survey_id="D22",
    category="aggregation",
    oracle="""
SELECT l_orderkey, l_linenumber, metric, amount
FROM (
  SELECT l_orderkey, l_linenumber,
         CAST(l_extendedprice AS DOUBLE) AS extendedprice,
         CAST(l_discount AS DOUBLE) AS discount,
         CAST(l_tax AS DOUBLE) AS tax
  FROM lineitem WHERE l_orderkey % 500 = 0
)
UNPIVOT (amount FOR metric IN (extendedprice, discount, tax))
ORDER BY l_orderkey, l_linenumber, metric
""",
)
def d22_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) — the inverse of D20's pivot: three measure
    columns rotate into (metric, amount) rows. A zero-shuffle narrow
    transformation (each input row expands to three output rows in
    place); at 100 TB it triples row count but never exchanges."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_orderkey") % 500 == 0
    )
    wide = li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_extendedprice").cast("double").alias("extendedprice"),
        F.col("l_discount").cast("double").alias("discount"),
        F.col("l_tax").cast("double").alias("tax"),
    )
    return wide.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["extendedprice", "discount", "tax"],
        variableColumnName="metric",
        valueColumnName="amount",
    ).orderBy("l_orderkey", "l_linenumber", "metric")


@register(
    "ext_iqr_outliers",
    survey_id="EXT-IQR",
    category="aggregation",
    oracle="""
WITH q AS (
  SELECT quantile_cont(o_totalprice, 0.25) AS q1,
         quantile_cont(o_totalprice, 0.75) AS q3
  FROM orders
)
SELECT o_orderstatus,
       COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN o_totalprice > q3 + 1.5 * (q3 - q1)
                       OR o_totalprice < q1 - 1.5 * (q3 - q1)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM orders CROSS JOIN q
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def ext_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IQR (Tukey-fence) outlier detection: exact quartiles from one
    aggregate, broadcast back as a single row, and a conditional count
    per group — the histogram-bounds pattern applied to data quality.
    Both engines use linear-interpolation percentiles (D17 precedent)
    and the fence arithmetic runs in double on identical operands."""
    o = load_table(spark, sf_dir, "orders")
    q = o.agg(
        F.percentile("o_totalprice", 0.25).alias("q1"),
        F.percentile("o_totalprice", 0.75).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    is_out = (F.col("o_totalprice") > F.col("q3") + 1.5 * iqr) | (
        F.col("o_totalprice") < F.col("q1") - 1.5 * iqr
    )
    return (
        o.crossJoin(F.broadcast(q))
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_total"),
            F.sum(F.when(is_out, 1).otherwise(0))
            .cast("bigint")
            .alias("n_outliers"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "ext_ols_by_group",
    survey_id="EXT-OLS",
    category="aggregation",
    oracle="""
WITH m AS (
  SELECT o_orderstatus,
         COUNT(*) AS n,
         CAST(SUM(CAST(epoch(o_orderdate) / 86400 AS DECIMAL(28,10)))
              AS DOUBLE) AS sx,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(28,10))) AS DOUBLE) AS sy,
         CAST(SUM(CAST((epoch(o_orderdate) / 86400) * o_totalprice
                       AS DECIMAL(28,10))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST((epoch(o_orderdate) / 86400)
                       * (epoch(o_orderdate) / 86400)
                       AS DECIMAL(28,10))) AS DOUBLE) AS sxx
  FROM orders GROUP BY o_orderstatus
)
SELECT o_orderstatus, n,
       CAST(CAST((n * sxy - sx * sy) / (n * sxx - sx * sx) AS DECIMAL(18,8))
            AS DOUBLE) AS slope,
       CAST(CAST((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n
            AS DECIMAL(18,6)) AS DOUBLE) AS intercept
FROM m ORDER BY o_orderstatus
""",
)
def ext_ols_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group linear regression (price vs order day) by the closed
    form slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²): the four moments are
    ONE partial-aggregated pass with exact-decimal sums, and the formula
    runs in double on identical operands — unlike the engines' native
    regr_slope (streaming covariance accumulation, order-dependent),
    this is bit-reproducible at any parallelism; final values rounded
    through decimals to absorb the one division/multiplication chain.
    The grouped-sufficient-statistics shape is exactly how distributed
    ML fits millions of small per-entity models in one pass."""
    o = load_table(spark, sf_dir, "orders")
    x = F.unix_timestamp("o_orderdate") / 86400
    y = F.col("o_totalprice")
    m = o.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.sum(x.cast("decimal(28,10)")).cast("double").alias("sx"),
        F.sum(y.cast("decimal(28,10)")).cast("double").alias("sy"),
        F.sum((x * y).cast("decimal(28,10)")).cast("double").alias("sxy"),
        F.sum((x * x).cast("decimal(28,10)")).cast("double").alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n")
    return m.select(
        "o_orderstatus",
        "n",
        slope.cast("decimal(18,8)").cast("double").alias("slope"),
        intercept.cast("decimal(18,6)").cast("double").alias("intercept"),
    ).orderBy("o_orderstatus")


@register(
    "d24_boolean_aggregates",
    survey_id="D24",
    category="aggregation",
    oracle="""
SELECT l_returnflag,
       CAST(count_if(l_discount > 0.05) AS BIGINT) AS n_discounted,
       bool_or(l_quantity >= 49) AS any_bulk,
       bool_and(l_extendedprice > 0) AS all_positive
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
)
def d24_boolean_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregate family: count_if / bool_or (ANY) / bool_and
    (EVERY). All three partial-aggregate to one bit or count per
    partition before the exchange — constant shuffle volume per group
    at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count_if(F.col("l_discount") > 0.05)
            .cast("bigint")
            .alias("n_discounted"),
            F.bool_or(F.col("l_quantity") >= 49).alias("any_bulk"),
            F.bool_and(F.col("l_extendedprice") > 0).alias("all_positive"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "ext_auc",
    survey_id="EXT-AUC",
    category="aggregation",
    oracle="""
WITH scored AS (
  SELECT n_chars AS score,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
  FROM documents
),
per_score AS (
  SELECT score,
         CAST(SUM(pos) AS BIGINT) AS p_s,
         CAST(SUM(1 - pos) AS BIGINT) AS n_s
  FROM scored GROUP BY score
),
cum AS (
  SELECT score, p_s, n_s,
         COALESCE(SUM(p_s) OVER (ORDER BY score
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_p
  FROM per_score
),
tot AS (
  SELECT CAST(SUM(p_s) AS BIGINT) AS p_tot, CAST(SUM(n_s) AS BIGINT) AS n_tot
  FROM per_score
)
SELECT p_tot, n_tot,
       CAST(CAST(CAST(SUM(2 * n_s * cum_p + p_s * n_s) AS DOUBLE)
            / (2.0 * p_tot * n_tot) AS DECIMAL(18,12)) AS DOUBLE) AS auc
FROM cum CROSS JOIN tot
GROUP BY p_tot, n_tot
""",
)
def ext_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC of a score (n_chars) against a binary label (lang='en'),
    in the exact tie-averaged integral form: group by distinct score,
    cumulative positives below each score, AUC = Σ(2·N_s·cumP +
    P_s·N_s) / (2·P·N). All arithmetic stays in integers until one
    final division of identical operands — deterministic at any
    parallelism, unlike rank-based formulations that need a global
    row_number. The window runs over DISTINCT SCORES (bounded domain),
    not rows — the scale-sane shape for metric computation on billions
    of examples."""
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        F.col("n_chars").alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )
    per_score = scored.groupBy("score").agg(
        F.sum("pos").cast("bigint").alias("p_s"),
        F.sum(1 - F.col("pos")).cast("bigint").alias("n_s"),
    )
    from pyspark.sql import Window

    w = (
        Window.orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = per_score.withColumn(
        "cum_p", F.coalesce(F.sum("p_s").over(w), F.lit(0))
    )
    tot = per_score.agg(
        F.sum("p_s").cast("bigint").alias("p_tot"),
        F.sum("n_s").cast("bigint").alias("n_tot"),
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("p_tot", "n_tot")
        .agg(
            (
                F.sum(
                    2 * F.col("n_s") * F.col("cum_p")
                    + F.col("p_s") * F.col("n_s")
                ).cast("double")
                / (2.0 * F.col("p_tot") * F.col("n_tot"))
            )
            .cast("decimal(18,12)")
            .cast("double")
            .alias("auc")
        )
    )


@register(
    "d25_weighted_avg",
    survey_id="D25",
    category="aggregation",
    oracle="""
SELECT l_returnflag,
       CAST(CAST(CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(28,8)))
                 AS DOUBLE)
            / CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
            AS DECIMAL(18,6)) AS DOUBLE) AS wavg_price,
       CAST(SUM(CAST(l_quantity * (1 - l_discount) AS DECIMAL(28,8)))
            AS DOUBLE) AS effective_qty
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
)
def d25_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted average (quantity-weighted price) and weighted sum —
    the two-sufficient-statistics pattern: both decimal-exact sums ride
    one partial-agg pass. The numerator sum carries ~19 significant
    digits — beyond double — and the engines' decimal-to-double
    conversions round the excess differently, so the final average is
    rounded through DECIMAL(18,6) (the entropy-query discipline)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            (
                F.sum(
                    (F.col("l_quantity") * F.col("l_extendedprice")).cast(
                        "decimal(28,8)"
                    )
                ).cast("double")
                / F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast(
                    "double"
                )
            )
            .cast("decimal(18,6)")
            .cast("double")
            .alias("wavg_price"),
            F.sum(
                (F.col("l_quantity") * (1 - F.col("l_discount"))).cast(
                    "decimal(28,8)"
                )
            )
            .cast("double")
            .alias("effective_qty"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "d26_string_agg",
    survey_id="D26",
    category="aggregation",
    oracle="""
SELECT o_orderpriority,
       string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
         AS statuses
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
)
def d26_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (listagg/string_agg, Spark 4): the
    report-friendly sibling of collect_list. Determinism requires the
    explicit ORDER BY inside the aggregate (D12 discipline) — here via
    sorted distinct collection re-joined, matching DuckDB's
    string_agg(DISTINCT ... ORDER BY)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.array_join(
                F.array_sort(F.collect_set("o_orderstatus")), ","
            ).alias("statuses")
        )
        .orderBy("o_orderpriority")
    )


@register(
    "ext_robust_zscore",
    survey_id="EXT-ROBUST-Z",
    category="aggregation",
    oracle="""
WITH med AS (
  SELECT o_orderstatus AS m_status, MEDIAN(o_totalprice) AS med
  FROM orders GROUP BY o_orderstatus
),
mad AS (
  SELECT o.o_orderstatus AS d_status,
         MEDIAN(ABS(o.o_totalprice - m.med)) AS mad
  FROM orders o JOIN med m ON m.m_status = o.o_orderstatus
  GROUP BY o.o_orderstatus
)
SELECT o.o_orderstatus,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN ABS(o.o_totalprice - m.med) > 3.0 * d.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM orders o
JOIN med m ON m.m_status = o.o_orderstatus
JOIN mad d ON d.d_status = o.o_orderstatus
GROUP BY o.o_orderstatus
ORDER BY o.o_orderstatus
""",
)
def ext_robust_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via median/MAD (median absolute
    deviation): immune to the outliers it hunts, unlike mean/stddev
    z-scores, and the IQR fences' heavier-duty sibling. Two grouped
    median passes (the MAD needs the median first) + one conditional
    count, all joined broadcast-style on the tiny group key. Medians
    interpolate identically in both engines (D17)."""
    o = load_table(spark, sf_dir, "orders")
    med = o.groupBy(F.col("o_orderstatus").alias("m_status")).agg(
        F.median("o_totalprice").alias("med")
    )
    mad = (
        o.join(F.broadcast(med), o["o_orderstatus"] == F.col("m_status"))
        .groupBy(F.col("o_orderstatus").alias("d_status"))
        .agg(
            F.median(F.abs(F.col("o_totalprice") - F.col("med"))).alias(
                "mad"
            )
        )
    )
    return (
        o.join(F.broadcast(med), o["o_orderstatus"] == F.col("m_status"))
        .join(F.broadcast(mad), o["o_orderstatus"] == F.col("d_status"))
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(
                    F.abs(F.col("o_totalprice") - F.col("med"))
                    > 3.0 * F.col("mad"),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "ext_pareto_share",
    survey_id="EXT-PARETO",
    category="aggregation",
    oracle="""
WITH cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS spend
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT o_custkey, spend,
         ROW_NUMBER() OVER (ORDER BY spend DESC, o_custkey) AS rn,
         COUNT(*) OVER () AS n_cust
  FROM cust
)
SELECT CAST(CAST(CAST(SUM(CASE WHEN rn <= CAST(CEIL(n_cust / 10.0) AS BIGINT)
                          THEN CAST(spend AS DECIMAL(28,8))
                          ELSE CAST(0 AS DECIMAL(28,8)) END) AS DOUBLE)
            / CAST(SUM(CAST(spend AS DECIMAL(28,8))) AS DOUBLE)
            AS DECIMAL(18,10)) AS DOUBLE) AS top_decile_share,
       CAST(MAX(n_cust) AS BIGINT) AS n_customers
FROM ranked
""",
)
def ext_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration (the 80/20 check): the spend share of the
    top decile of customers. Per-customer spend is one keyed aggregate;
    the global rank runs over CUSTOMERS (already reduced — at 100 TB
    rank the aggregate, never the facts); numerator and denominator are
    decimal-exact sums dividing as identical doubles, rounded through
    decimal because per-customer spends are themselves derived doubles."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("spend")
    )
    from nibbler_spark.queries._helpers import two_phase_rank

    n_cust_row = cust.agg(F.count("*").alias("n_cust"))
    ranked = two_phase_rank(
        cust,
        -(F.col("spend") / 10000).cast("bigint"),
        [F.col("spend").desc(), F.col("o_custkey")],
        "rn",
    ).crossJoin(F.broadcast(n_cust_row))
    top_n = F.ceil(F.col("n_cust") / 10.0).cast("bigint")
    zero = F.lit(0).cast("decimal(28,8)")
    return ranked.agg(
        (
            F.sum(
                F.when(
                    F.col("rn") <= top_n,
                    F.col("spend").cast("decimal(28,8)"),
                ).otherwise(zero)
            ).cast("double")
            / F.sum(F.col("spend").cast("decimal(28,8)")).cast("double")
        )
        .cast("decimal(18,10)")
        .cast("double")
        .alias("top_decile_share"),
        F.max("n_cust").cast("bigint").alias("n_customers"),
    )


@register(
    "ext_abtest_proportions",
    survey_id="EXT-ABTEST",
    category="aggregation",
    oracle="""
WITH counts AS (
  SELECT user_id, user_id % 2 AS arm,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS n_purch
  FROM events GROUP BY user_id
),
med AS (SELECT MEDIAN(n_purch) AS m FROM counts),
assigned AS (
  SELECT arm, CASE WHEN n_purch > (SELECT m FROM med) THEN 1 ELSE 0 END
           AS converted
  FROM counts
),
arms AS (
  SELECT arm, COUNT(*) AS n, CAST(SUM(converted) AS BIGINT) AS conv
  FROM assigned GROUP BY arm
)
SELECT a.n AS n_a, a.conv AS conv_a, b.n AS n_b, b.conv AS conv_b,
       CAST(CAST(
         (CAST(a.conv AS DOUBLE) / a.n - CAST(b.conv AS DOUBLE) / b.n)
         / SQRT(
             (CAST(a.conv + b.conv AS DOUBLE) / (a.n + b.n))
             * (1 - CAST(a.conv + b.conv AS DOUBLE) / (a.n + b.n))
             * (CAST(1 AS DOUBLE) / a.n + CAST(1 AS DOUBLE) / b.n)
           )
         AS DECIMAL(18,6)) AS DOUBLE) AS z_stat
FROM (SELECT * FROM arms WHERE arm = 0) a
CROSS JOIN (SELECT * FROM arms WHERE arm = 1) b
""",
)
def ext_abtest_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test for an A/B split (arms by user_id parity,
    conversion = above-median purchase count — a median split keeps both
    outcome classes populated at every scale, so the pooled variance is
    never zero): the experimentation-readout primitive. Per-user counts
    reduce in one keyed pass, arms in a 2-group rollup, and the pooled
    z-statistic is pure arithmetic on identical integers — rounded
    through decimal only for the final SQRT (transcendental
    discipline)."""
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("n_purch")
    )
    med = counts.agg(F.median("n_purch").alias("m"))
    assigned = counts.crossJoin(F.broadcast(med)).select(
        (F.col("user_id") % 2).alias("arm"),
        F.when(F.col("n_purch") > F.col("m"), 1).otherwise(0).alias(
            "converted"
        ),
    )
    arms = assigned.groupBy("arm").agg(
        F.count("*").alias("n"),
        F.sum("converted").cast("bigint").alias("conv"),
    )
    a = arms.where(F.col("arm") == 0).select(
        F.col("n").alias("n_a"), F.col("conv").alias("conv_a")
    )
    b = arms.where(F.col("arm") == 1).select(
        F.col("n").alias("n_b"), F.col("conv").alias("conv_b")
    )
    j = a.crossJoin(b)
    p_a = F.col("conv_a").cast("double") / F.col("n_a")
    p_b = F.col("conv_b").cast("double") / F.col("n_b")
    p_pool = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    z = (p_a - p_b) / F.sqrt(
        p_pool
        * (1 - p_pool)
        * (
            F.lit(1).cast("double") / F.col("n_a")
            + F.lit(1).cast("double") / F.col("n_b")
        )
    )
    return j.select(
        "n_a", "conv_a", "n_b", "conv_b",
        z.cast("decimal(18,6)").cast("double").alias("z_stat"),
    )


@register(
    "ext_gini_coefficient",
    survey_id="EXT-GINI",
    category="aggregation",
    oracle="""
WITH cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS spend
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT spend,
         ROW_NUMBER() OVER (ORDER BY spend, o_custkey) AS i,
         COUNT(*) OVER () AS n
  FROM cust
)
SELECT CAST(MAX(n) AS BIGINT) AS n_customers,
       CAST(CAST(
         2.0 * CAST(SUM(CAST(i * spend AS DECIMAL(38,8))) AS DOUBLE)
           / (MAX(n) * CAST(SUM(CAST(spend AS DECIMAL(38,8))) AS DOUBLE))
         - CAST(MAX(n) + 1 AS DOUBLE) / MAX(n)
         AS DECIMAL(18,10)) AS DOUBLE) AS gini
FROM ranked
""",
)
def ext_gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend — the single-number
    inequality measure completing the Pareto share: G = 2·Σ(i·x_i) /
    (n·Σx) − (n+1)/n over ascending-ranked spends. Ranks run over the
    per-customer AGGREGATE (EXT-PARETO discipline), both sums are
    decimal-exact, and the closing arithmetic divides identical
    doubles, rounded through decimal."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("spend")
    )
    from nibbler_spark.queries._helpers import two_phase_rank

    n_row = cust.agg(F.count("*").alias("n"))
    ranked = (
        two_phase_rank(
            cust,
            (F.col("spend") / 10000).cast("bigint"),
            [F.col("spend"), F.col("o_custkey")],
            "i",
        )
        .crossJoin(F.broadcast(n_row))
        .select("spend", "i", "n")
    )
    gini = (
        F.lit(2.0)
        * F.sum((F.col("i") * F.col("spend")).cast("decimal(38,8)")).cast(
            "double"
        )
        / (
            F.max("n")
            * F.sum(F.col("spend").cast("decimal(38,8)")).cast("double")
        )
        - (F.max("n") + 1).cast("double") / F.max("n")
    )
    return ranked.agg(
        F.max("n").cast("bigint").alias("n_customers"),
        gini.cast("decimal(18,10)").cast("double").alias("gini"),
    )


@register(
    "d27_linear_regression_agg",
    survey_id="EXT-REGR",
    category="aggregation",
    oracle="""
WITH q AS (
  SELECT l_returnflag,
         CAST(l_quantity AS BIGINT) AS x,
         CAST(FLOOR(l_extendedprice) AS BIGINT) AS y
  FROM lineitem
),
s AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(x * y) AS DOUBLE) AS sxy,
         CAST(SUM(x * x) AS DOUBLE) AS sxx,
         CAST(SUM(y * y) AS DOUBLE) AS syy
  FROM q GROUP BY l_returnflag
)
SELECT l_returnflag, CAST(n AS BIGINT) AS regr_n,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
         AS intercept,
       ROUND((n * sxy - sx * sy) * (n * sxy - sx * sy)
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
FROM s ORDER BY l_returnflag
""",
)
def d27_linear_regression_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregate family (the regr_slope / regr_
    intercept / regr_r2 surface) computed ENGINE-EXACTLY: quantity and
    floored price are integers, so the five sufficient statistics
    (Σx, Σy, Σxy, Σx², Σy²) accumulate as exact BIGINTs — no summation-
    order sensitivity at any partition count — and the closed-form
    slope/intercept/R² then run in double on identical operands in both
    engines. This is also the 100 TB shape: one map-side-combined
    groupBy carrying five integers per group, with the regression math
    on the tiny aggregate. (Spark's builtin regr_* aggregates compute
    the same statistics in pure double, whose accumulation order is
    partition-dependent — fine numerically, but not hash-checkable;
    tests/test_new_surface.py pins the builtin against this form within
    tolerance.)"""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("bigint").alias("x"),
        F.floor("l_extendedprice").cast("bigint").alias("y"),
    )
    s = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        "l_returnflag",
        n.cast("bigint").alias("regr_n"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(
            (n * sxy - sx * sy)
            * (n * sxy - sx * sy)
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("r2"),
    ).orderBy("l_returnflag")


@register(
    "d29_robust_stats",
    survey_id="EXT-ROBUST",
    category="aggregation",
    oracle="""
WITH li AS (
  SELECT l_returnflag AS flag,
         CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem
),
b AS (
  SELECT flag,
         QUANTILE_CONT(cents, 0.05) AS p5,
         QUANTILE_CONT(cents, 0.95) AS p95,
         QUANTILE_CONT(cents, 0.5) AS med
  FROM li GROUP BY flag
),
j AS (SELECT li.*, b.p5, b.p95, b.med FROM li JOIN b USING (flag))
SELECT flag AS l_returnflag, COUNT(*) AS n,
  ROUND(MIN(p5), 4) AS p5, ROUND(MIN(p95), 4) AS p95,
  ROUND(CAST(SUM(CAST(cents AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 4)
    AS mean_all,
  ROUND(CAST(SUM(CAST(cents AS DECIMAL(18,4)))
               FILTER (WHERE cents >= p5 AND cents <= p95) AS DOUBLE)
        / (COUNT(*) FILTER (WHERE cents >= p5 AND cents <= p95)), 4)
    AS trimmed_mean,
  ROUND(CAST(SUM(LEAST(GREATEST(cents, CAST(CEIL(p5) AS BIGINT)),
                       CAST(FLOOR(p95) AS BIGINT))) AS DOUBLE)
        / COUNT(*), 4) AS winsorized_mean,
  ROUND(QUANTILE_CONT(ABS(cents - med), 0.5), 4) AS mad
FROM j GROUP BY flag ORDER BY flag
""",
)
def d29_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust statistics per group — trimmed mean (drop outside
    [p5, p95]), winsorized mean (CLAMP to the integer grid of
    [⌈p5⌉, ⌊p95⌋] — ceil/floor keep every clamped value an exact
    BIGINT so the sum has no float accumulation), and MAD (median of
    absolute deviations from the median). The exact percentiles
    interpolate identically in both engines (the d17 contract); all
    means divide exact sums. Two passes — a tiny per-group percentile
    aggregate broadcast back onto the fact rows, then one combined
    conditional aggregate — which is the right 100 TB shape: robust
    estimators need the quantile before they can trim, and the
    broadcast avoids a second fact shuffle."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.floor(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
    )
    b = li.groupBy("flag").agg(
        F.percentile("cents", 0.05).alias("p5"),
        F.percentile("cents", 0.95).alias("p95"),
        F.percentile("cents", 0.5).alias("med"),
    )
    j = li.join(F.broadcast(b), "flag")
    inlier = (F.col("cents") >= F.col("p5")) & (F.col("cents") <= F.col("p95"))
    clamped = F.least(
        F.greatest(F.col("cents"), F.ceil("p5").cast("bigint")),
        F.floor("p95").cast("bigint"),
    )
    return (
        j.groupBy("flag")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("p5"), 4).alias("p5"),
            F.round(F.min("p95"), 4).alias("p95"),
            F.round(
                F.sum(dec("cents")).cast("double") / F.count("*"), 4
            ).alias("mean_all"),
            F.round(
                F.sum(F.when(inlier, dec("cents"))).cast("double")
                / F.count(F.when(inlier, F.lit(1))),
                4,
            ).alias("trimmed_mean"),
            F.round(
                F.sum(clamped).cast("double") / F.count("*"), 4
            ).alias("winsorized_mean"),
            F.round(
                F.percentile(F.abs(F.col("cents") - F.col("med")), 0.5), 4
            ).alias("mad"),
        )
        .withColumnRenamed("flag", "l_returnflag")
        .orderBy("l_returnflag")
    )


@register(
    "d30_bitmap_distinct",
    survey_id="EXT-BITMAP",
    category="aggregation",
    oracle="""
SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS nd_parts,
       COUNT(DISTINCT l_suppkey) AS nd_supps
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
)
def d30_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via bitmap aggregates (Spark 3.5
    bitmap_bit_position / bitmap_construct_agg / bitmap_or_agg /
    bitmap_count): values land as bits in 32k-bit buckets, per-bucket
    bitmaps OR together, and the popcount sum is the exact NDV. Unlike
    COUNT(DISTINCT) — whose distinct-expand shuffle carries every
    (group, value) pair — the bitmap form shuffles at most
    ceil(domain / 262144) fixed-size binary blobs per group, and the
    bitmaps themselves are MERGEABLE state (the same shape as the
    incremental-rollup pattern: store per-partition bitmaps, OR them at
    query time). Two distinct dimensions aggregated in one pass;
    hash-checked against plain COUNT(DISTINCT)."""
    register_temp_views(spark, sf_dir)
    return spark.sql(
        """
        WITH buckets AS (
          SELECT l_returnflag,
                 bitmap_bucket_number(l_partkey) AS pb,
                 bitmap_construct_agg(bitmap_bit_position(l_partkey))
                   AS pbm,
                 bitmap_bucket_number(l_suppkey) AS sb,
                 bitmap_construct_agg(bitmap_bit_position(l_suppkey))
                   AS sbm
          FROM lineitem
          GROUP BY l_returnflag, bitmap_bucket_number(l_partkey),
                   bitmap_bucket_number(l_suppkey)
        )
        SELECT l_returnflag,
               CAST(SUM(p_cnt) AS BIGINT) AS nd_parts,
               CAST(SUM(s_cnt) AS BIGINT) AS nd_supps
        FROM (
          SELECT l_returnflag, pb,
                 bitmap_count(bitmap_or_agg(pbm)) AS p_cnt, 0 AS s_cnt
          FROM buckets GROUP BY l_returnflag, pb
          UNION ALL
          SELECT l_returnflag, sb, 0, bitmap_count(bitmap_or_agg(sbm))
          FROM buckets GROUP BY l_returnflag, sb
        )
        GROUP BY l_returnflag ORDER BY l_returnflag
        """
    )


@register(
    "d31_approx_top_k",
    survey_id="EXT-TOPK-SKETCH",
    category="aggregation",
    oracle="""
SELECT o_orderpriority AS item, COUNT(*) AS cnt
FROM orders GROUP BY o_orderpriority
ORDER BY cnt DESC, item LIMIT 3
""",
)
def d31_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`approx_top_k` (Spark 4): sketch-based heavy hitters in ONE
    aggregate — the engine tracks up to maxItemsTracked items map-side
    and merges the sketches, so no (group, value) distinct-expand
    shuffle ever happens. Here the tracked capacity (10k) exceeds the
    column's domain, so every count is EXACT and the exploded, re-ranked
    output hash-matches the plain GROUP BY oracle — the same
    exact-when-small / approximate-when-huge contract as
    approx_count_distinct. Ties re-ranked by (count DESC, item) on both
    sides for a pinned order."""
    register_temp_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT s.item, s.count AS cnt
        FROM (
          SELECT explode(approx_top_k(o_orderpriority, 3, 10000)) AS s
          FROM orders
        )
        ORDER BY cnt DESC, s.item LIMIT 3
        """
    )


@register(
    "d32_unpivot_melt",
    survey_id="EXT-UNPIVOT",
    category="aggregation",
    oracle="""
WITH wide AS (
  SELECT l_returnflag,
         CAST(SUM(CASE WHEN l_linestatus = 'F'
                       THEN CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS cents_f,
         CAST(SUM(CASE WHEN l_linestatus = 'O'
                       THEN CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS cents_o
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, status, cents
FROM wide UNPIVOT (cents FOR status IN (cents_f AS 'F', cents_o AS 'O'))
ORDER BY l_returnflag, status
""",
)
def d32_unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt) — the inverse of d20's pivot: a wide per-flag
    aggregate with one column per line status folds back into long
    (flag, status, value) rows. Spark's `unpivot` is a zero-shuffle
    row-local expansion (each input row emits one output row per value
    column — an Expand node, no exchange), which is why melt is free
    at any scale while the pivot that produced the wide form cost a
    shuffle. Round-tripping both directions pins the pair. DuckDB's
    UNPIVOT states the same fold natively."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100).cast("bigint")
    wide = li.groupBy("l_returnflag").agg(
        F.sum(F.when(F.col("l_linestatus") == "F", cents).otherwise(0))
        .cast("bigint")
        .alias("cents_f"),
        F.sum(F.when(F.col("l_linestatus") == "O", cents).otherwise(0))
        .cast("bigint")
        .alias("cents_o"),
    )
    return (
        wide.unpivot(
            ids=["l_returnflag"],
            values=["cents_f", "cents_o"],
            variableColumnName="status",
            valueColumnName="cents",
        )
        .withColumn(
            "status",
            F.when(F.col("status") == "cents_f", "F").otherwise("O"),
        )
        .orderBy("l_returnflag", "status")
    )


@register(
    "d33_crosstab",
    survey_id="EXT-CROSSTAB",
    category="aggregation",
    oracle="""
SELECT o_orderstatus,
       CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
            AS BIGINT) AS urgent,
       CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END)
            AS BIGINT) AS high,
       CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END)
            AS BIGINT) AS low
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
""",
)
def d33_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency crosstab via `df.stat.crosstab` — the DataFrame
    statistics API's pairwise frequency table (one pass, same
    pivot-aggregate plan as d20 under the hood). Columns re-selected
    and renamed to a pinned subset so the output is schema-stable
    across scales; exact integer counts, hash mode."""
    o = load_table(spark, sf_dir, "orders")
    ct = o.stat.crosstab("o_orderstatus", "o_orderpriority")
    return ct.select(
        F.col("o_orderstatus_o_orderpriority").alias("o_orderstatus"),
        F.col("1-URGENT").cast("bigint").alias("urgent"),
        F.col("2-HIGH").cast("bigint").alias("high"),
        F.col("5-LOW").cast("bigint").alias("low"),
    ).orderBy("o_orderstatus")


@register(
    "d36_histogram_numeric",
    survey_id="EXT-HIST-NUMERIC",
    category="aggregation",
    mode="bounded",
    oracle="SELECT TRUE AS bins_ok, TRUE AS mass_ok, TRUE AS range_ok",
)
def d36_histogram_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """histogram_numeric — Spark's streaming adaptive-bin histogram
    aggregate (Ben-Haim/Tom-Tov sketch, the one Hive popularized). Bin
    centroids depend on merge order, so no hash oracle can exist; the
    declared bounded contract instead: exactly the requested number of
    bins come back, the bin masses sum to the row count (the sketch
    never drops mass), and every centroid lies inside the data's
    [min, max]. Scale: O(bins) state per partition, merged
    associatively — the same mergeable-sketch family as the portable
    HLL/CMS rows."""
    o = load_table(spark, sf_dir, "orders")
    row = o.agg(
        F.expr("histogram_numeric(o_totalprice, 12)").alias("h"),
        F.count("*").alias("n"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    ).collect()[0]
    bins = row["h"]
    mass = sum(b["y"] for b in bins)
    bins_ok = len(bins) == 12
    mass_ok = abs(mass - row["n"]) < 1e-6
    range_ok = all(row["lo"] <= b["x"] <= row["hi"] for b in bins)
    return o.sparkSession.createDataFrame(
        [(bool(bins_ok), bool(mass_ok), bool(range_ok))],
        "bins_ok boolean, mass_ok boolean, range_ok boolean",
    )


@register(
    "d37_listagg",
    survey_id="EXT-LISTAGG",
    category="aggregation",
    oracle="""
SELECT o_orderpriority,
       string_agg(o_orderstatus, ',' ORDER BY o_orderstatus, o_orderkey)
         AS statuses,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders WHERE o_custkey % 150 = 0
GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
)
def d37_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """listagg WITHIN GROUP (Spark 4 / ISO SQL:2023) — ordered string
    concatenation per group, the aggregate ad-hoc reporting leans on.
    The WITHIN GROUP ordering clause is what makes it deterministic
    (unordered listagg is partition-order-dependent and would never
    hash-match); (status, orderkey) is a total order. DuckDB's
    string_agg with ORDER BY is the oracle spelling. Scale: result
    size grows with group size — keep listagg to bounded groups (the
    d12 collect_list caveat applies verbatim)."""
    register_temp_views(spark, sf_dir)
    return spark.sql(
        """SELECT o_orderpriority,
                  listagg(o_orderstatus, ',')
                    WITHIN GROUP (ORDER BY o_orderstatus, o_orderkey)
                    AS statuses,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM orders WHERE o_custkey % 150 = 0
           GROUP BY o_orderpriority ORDER BY o_orderpriority"""
    )


@register(
    "d38_grouping_id",
    survey_id="D38",
    category="aggregation",
    oracle="""
SELECT COALESCE(l_returnflag, '<all>') AS flag,
       COALESCE(l_linestatus, '<all>') AS status,
       GROUPING(l_returnflag) AS g_flag,
       GROUPING(l_linestatus) AS g_status,
       GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
ORDER BY gid, flag, status
""",
)
def d38_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() / grouping-id disambiguation — the piece that makes
    GROUPING SETS results machine-consumable: a NULL group key is
    ambiguous (real NULL data vs subtotal row) until GROUPING(col)
    tags which columns are aggregated away in each output row; the
    composed grouping id (here g_flag*2 + g_status, matching Spark's
    bit order) keys downstream routing. Same one-pass Expand+Aggregate
    plan as D8 — grouping flags are free metadata, not extra passes."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("li_d38")
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, '<all>') AS flag,
               COALESCE(l_linestatus, '<all>') AS status,
               CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS INT) AS g_status,
               CAST(GROUPING(l_returnflag) * 2
                    + GROUPING(l_linestatus) AS INT) AS gid,
               COUNT(*) AS n
        FROM li_d38
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
        ORDER BY gid, flag, status
        """
    )
