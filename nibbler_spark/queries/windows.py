"""Window function queries (SURVEY §2.3 E1–E10).

Every frame orders by a unique tiebreaker (event_id) unless tie semantics
are the point (rank family). Window sums go through exact decimal so
segment-tree vs sequential accumulation differences can't surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nibbler_spark.queries import register
from nibbler_spark.queries._helpers import dec
from nibbler_spark.sources import load_table

# Canonical per-user event ordering: unique by (ts, event_id).
_W = "PARTITION BY user_id ORDER BY ts, event_id"


def _w():
    return Window.partitionBy("user_id").orderBy("ts", "event_id")


@register(
    "e01_row_number_topk",
    survey_id="E1",
    category="window",
    oracle=f"""
SELECT event_id, user_id, ts,
       ROW_NUMBER() OVER ({_W}) AS rn
FROM events
ORDER BY event_id
""",
)
def e01_row_number_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number per user in event-time order (BENCH-B3 headline). One
    shuffle on user_id; per-partition sort only."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id", "user_id", "ts", F.row_number().over(_w()).alias("rn")
    ).orderBy("event_id")


@register(
    "e02_rank_dense_rank",
    survey_id="E2",
    category="window",
    oracle="""
SELECT event_id, user_id, event_type,
       RANK() OVER (PARTITION BY user_id ORDER BY event_type) AS rnk,
       DENSE_RANK() OVER (PARTITION BY user_id ORDER BY event_type) AS drnk
FROM events
ORDER BY event_id
""",
)
def e02_rank_dense_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank over a tied ordering (event_type) — both are
    deterministic under ties, unlike row_number."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_type")
    return e.select(
        "event_id",
        "user_id",
        "event_type",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    ).orderBy("event_id")


@register(
    "e03_percent_rank_cume_dist",
    survey_id="E3",
    category="window",
    oracle="""
SELECT event_id, user_id,
       ROUND(PERCENT_RANK() OVER (PARTITION BY user_id ORDER BY event_type), 4) AS pr,
       ROUND(CUME_DIST() OVER (PARTITION BY user_id ORDER BY event_type), 4) AS cd
FROM events
ORDER BY event_id
""",
)
def e03_percent_rank_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist (rounded — rank ratios are simple division
    but 4 dp keeps the convention uniform for ratio outputs)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_type")
    return e.select(
        "event_id",
        "user_id",
        F.round(F.percent_rank().over(w), 4).alias("pr"),
        F.round(F.cume_dist().over(w), 4).alias("cd"),
    ).orderBy("event_id")


@register(
    "e04_ntile",
    survey_id="E4",
    category="window",
    oracle=f"""
SELECT event_id, user_id, NTILE(4) OVER ({_W}) AS quartile
FROM events ORDER BY event_id
""",
)
def e04_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4) over a total per-user order."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id", "user_id", F.ntile(4).over(_w()).alias("quartile")
    ).orderBy("event_id")


@register(
    "e05_lag_lead",
    survey_id="E5",
    category="window",
    oracle=f"""
SELECT event_id, user_id, value,
       LAG(value, 1, -1.0) OVER ({_W}) AS prev_value,
       LEAD(value, 2) OVER ({_W}) AS next2_value
FROM events ORDER BY event_id
""",
)
def e05_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag with default, lead with offset (NULL default)."""
    e = load_table(spark, sf_dir, "events")
    w = _w()
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value", 1, -1.0).over(w).alias("prev_value"),
        F.lead("value", 2).over(w).alias("next2_value"),
    ).orderBy("event_id")


@register(
    "e06_first_last_value",
    survey_id="E6",
    category="window",
    oracle=f"""
SELECT event_id, user_id,
       FIRST_VALUE(event_type) OVER
         ({_W} ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_type,
       LAST_VALUE(event_type) OVER
         ({_W} ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type
FROM events ORDER BY event_id
""",
)
def e06_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last value with an explicit full-partition frame (the default
    frame would make last_value ≡ current row)."""
    e = load_table(spark, sf_dir, "events")
    w = _w().rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return e.select(
        "event_id",
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
    ).orderBy("event_id")


@register(
    "e07_running_total",
    survey_id="E7",
    category="window",
    oracle=f"""
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER
         ({_W} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_value
FROM events ORDER BY event_id
""",
)
def e07_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per user (exact decimal accumulation)."""
    e = load_table(spark, sf_dir, "events")
    w = _w().rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return e.select(
        "event_id",
        "user_id",
        F.sum(dec("value")).over(w).cast("double").alias("running_value"),
    ).orderBy("event_id")


@register(
    "e08_moving_average",
    survey_id="E8",
    category="window",
    oracle=f"""
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER
         ({_W} ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
       / COUNT(value) OVER
         ({_W} ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mov_avg
FROM events ORDER BY event_id
""",
)
def e08_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving average = exact decimal sum / frame count."""
    e = load_table(spark, sf_dir, "events")
    w = _w().rowsBetween(-2, Window.currentRow)
    return e.select(
        "event_id",
        "user_id",
        (
            F.sum(dec("value")).over(w).cast("double")
            / F.count("value").over(w)
        ).alias("mov_avg"),
    ).orderBy("event_id")


@register(
    "e09_range_frame",
    survey_id="E9",
    category="window",
    oracle="""
SELECT event_id, user_id,
       COUNT(*) OVER (
         PARTITION BY user_id
         ORDER BY CAST(FLOOR(EPOCH(ts)) AS BIGINT)
         RANGE BETWEEN 600 PRECEDING AND CURRENT ROW
       ) AS n_last_10min
FROM events ORDER BY event_id
""",
)
def e09_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over time: events per user in the trailing 10 minutes.
    Spark's rangeBetween needs a numeric order key, so both sides order by
    floor(epoch seconds) (SURVEY E9 ⚠)."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-600, Window.currentRow)
    )
    return e.select(
        "event_id", "user_id", F.count("*").over(w).alias("n_last_10min")
    ).orderBy("event_id")


@register(
    "e10_unframed_partition_agg",
    survey_id="E10",
    category="window",
    oracle="""
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (PARTITION BY user_id) AS DOUBLE)
         AS user_total,
       COUNT(*) OVER (PARTITION BY user_id) AS user_events
FROM events ORDER BY event_id
""",
)
def e10_unframed_partition_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-wide aggregate attached to every row (no ORDER BY ⇒
    whole-partition frame)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    return e.select(
        "event_id",
        "user_id",
        F.sum(dec("value")).over(w).cast("double").alias("user_total"),
        F.count("*").over(w).alias("user_events"),
    ).orderBy("event_id")


@register(
    "e11_nth_value",
    survey_id="E11",
    category="window",
    oracle="""
SELECT user_id, event_id, ts,
       nth_value(value, 2) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS second_value
FROM events WHERE user_id % 25 = 0
ORDER BY user_id, ts, event_id
""",
)
def e11_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value with an explicit running frame: the second value seen so
    far per user (NULL until two rows have arrived). Same single
    user-keyed exchange as every E-series window."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").where(F.col("user_id") % 25 == 0)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        "ts",
        F.nth_value("value", 2).over(w).alias("second_value"),
    ).orderBy("user_id", "ts", "event_id")


@register(
    "e12_quantile_normalize",
    survey_id="E12",
    category="window",
    oracle="""
SELECT doc_id, lang, n_chars,
       percent_rank() OVER (PARTITION BY lang ORDER BY n_chars)
         AS len_quantile
FROM documents ORDER BY doc_id
""",
)
def e12_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of a feature within groups: percent_rank
    of document length per language — the rank-based rescaling that
    makes a feature comparable across differently-distributed strata
    (an ML-preprocessing staple). Ties share a rank in both engines, so
    no tiebreaker is needed inside the frame; (n-1) denominators divide
    identical integers."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("n_chars")
    return d.select(
        "doc_id",
        "lang",
        "n_chars",
        F.percent_rank().over(w).alias("len_quantile"),
    ).orderBy("doc_id")


@register(
    "e13_time_range_frame",
    survey_id="E13",
    category="window",
    oracle="""
SELECT event_id, user_id, ts,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_events_1h,
       CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) OVER w AS BIGINT)
         AS cents_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
ORDER BY user_id, ts, event_id
""",
)
def e13_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frames — the window surface E9's numeric
    range frame doesn't cover: a trailing ONE-HOUR event-time frame
    per user (RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT
    ROW), the rolling-window shape feature stores and fraud rules are
    built from. RANGE (not ROWS) semantics matter twice: ties on ts
    share a frame, and gaps shrink it — both engines implement the
    SQL-standard definition and must agree row-for-row. Counts and
    exact cents sums per frame; the identical windowed aggregation is
    expressed through Spark's INTERVAL range frame (via the SQL
    window clause — the DataFrame API spells it rangeBetween over a
    cast) and DuckDB's. One user-keyed exchange."""
    register = load_table(spark, sf_dir, "events")
    register.createOrReplaceTempView("nb_events_rangeframe")
    return spark.sql(
        """
SELECT event_id, user_id, ts,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_events_1h,
       CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) OVER w AS BIGINT)
         AS cents_1h
FROM nb_events_rangeframe
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
ORDER BY user_id, ts, event_id
"""
    )


@register(
    "e14_frame_distinct_count",
    survey_id="E14",
    category="window",
    oracle="""
SELECT event_id, user_id,
       CAST(COUNT(DISTINCT event_type) OVER w AS BIGINT)
         AS distinct_types_5
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
ORDER BY user_id, event_id
""",
)
def e14_frame_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT aggregation inside a moving window frame — the
    behavioral-variety signal (how many distinct actions in the last 5
    events) that Spark's window functions famously reject
    (COUNT(DISTINCT) OVER is unsupported): the standard rewrite is
    size(collect_set(...)) over the same frame — set semantics inside
    the frame buffer, identical to DuckDB's native windowed
    COUNT(DISTINCT), proven row-for-row here. The (ts, event_id)
    tie-broken ordering keeps frames deterministic. One user-keyed
    exchange; the frame state is a bounded 5-element set per row."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    return (
        e.select(
            "event_id",
            "user_id",
            F.size(F.collect_set("event_type").over(w))
            .cast("bigint")
            .alias("distinct_types_5"),
        )
        .orderBy("user_id", "event_id")
    )
