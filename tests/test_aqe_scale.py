"""Runtime AQE behaviors that matter at 100 TB: skew-join splitting and
partition coalescing. These are *executed-plan* checks — AQE decisions
only exist after runtime statistics arrive, so each test runs the job and
inspects the final adaptive plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from nibbler_spark.sources import load_table


def _final_plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_aqe_splits_skewed_join_partitions(spark, sf_dir):
    """A 99%-one-key build side joined without broadcast must trigger
    AQE's skew-split (thresholds lowered to fire at test scale; at real
    scale the defaults catch the same shape)."""
    # AQE splits a skewed reduce partition at map-output granularity, so
    # the shuffle needs many mappers (one small file = one unsplittable
    # map output). At real scale the thousands of scan tasks provide this
    # for free.
    li = load_table(spark, sf_dir, "lineitem").repartition(16)
    # Severely skew the key: 99% of rows land on key 0.
    skewed = li.select(
        F.when(F.rand(seed=7) < 0.99, F.lit(0))
        .otherwise((F.col("l_orderkey") % 50) + 1)
        .alias("k"),
        "l_extendedprice",
    )
    dim = spark.range(0, 51).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.coalescePartitions.enabled",
            "spark.sql.adaptive.forceOptimizeSkewedJoin",
        )
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1KB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
    spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    try:
        joined = skewed.join(dim, "k")
        plan = _final_plan(joined)
        assert "SortMergeJoin(skew=true)" in plan, plan[:2000]
        assert "AQEShuffleRead skewed" in plan
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)


def test_aqe_coalesces_small_shuffle_partitions(spark, sf_dir):
    """A tiny aggregate shuffled across many partitions must coalesce to
    far fewer at runtime (AQEShuffleRead coalesced)."""
    nation = load_table(spark, sf_dir, "nation")
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    try:
        agg = nation.groupBy("n_regionkey").agg(F.count("*").alias("n"))
        plan = _final_plan(agg)
        assert "AQEShuffleRead" in plan and "coalesced" in plan, plan[:2000]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
