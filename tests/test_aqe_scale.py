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


def test_aqe_flips_smj_to_broadcast_at_runtime(spark, sf_dir):
    """Static stats see the whole orders file (SMJ planned); the
    non-pushable filter leaves a tiny runtime side, and AQE re-plans the
    exchange into a broadcast. At 100 TB this is what saves a full fact
    shuffle when a predicate turns out selective."""
    old_static = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1KB")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "1MB")
    try:
        orders = load_table(spark, sf_dir, "orders").where(
            F.md5("o_orderstatus") == F.md5(F.lit("P"))
        )
        cust = load_table(spark, sf_dir, "customer")
        j = cust.join(orders, cust.c_custkey == orders.o_custkey).select(
            "c_custkey", "o_orderkey"
        )
        plan = _final_plan(j)
        final, _, initial = plan.partition("== Initial Plan ==")
        assert "BroadcastHashJoin" in final, final[:1500]
        assert "SortMergeJoin" in initial, initial[:1500]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_static)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def _executed_plan_metrics(df):
    """Collect (simpleClassName, {metric: value}) from the EXECUTED
    adaptive plan — the same SQLMetric values a QueryExecutionListener
    receives in onSuccess(qe.executedPlan).  Descends through
    QueryStageExec wrappers (their physical subtree hangs off .plan(),
    not .children())."""
    out = []

    def walk(node):
        name = node.getClass().getSimpleName()
        mets = {}
        try:
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                mets[kv._1()] = kv._2().value()
        except Exception:
            pass
        out.append((name, mets))
        if name.endswith("QueryStageExec"):
            walk(node.plan())
        for i in range(node.children().size()):
            walk(node.children().apply(i))

    jplan = df._jdf.queryExecution().executedPlan()
    if jplan.getClass().getSimpleName().startswith("AdaptiveSparkPlan"):
        jplan = jplan.executedPlan()
    walk(jplan)
    return out


def test_zipf_skew_join_listener_metrics(spark, sf_dir):
    """r4 verdict #4 (BENCH-K22 companion): the UNSALTED zipf(1.5) join
    — hot key ~29% of the fact — must engage AQE's skew split, and the
    engagement is asserted from the executed plan's SQLMetrics
    (numSkewedPartitions / numSkewedSplits on AQEShuffleReadExec), not
    just plan strings: these are the exact values a
    QueryExecutionListener observes.  Thresholds lowered to fire at
    test scale (defaults catch the same shape at 100 TB); the salted
    registered variant ext_zipf_skew_join needs no skew handling — its
    oracle gate already proves output parity with this plain join."""
    from nibbler_spark.queries.scale_patterns import zipf_skew_join_frames

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
        df = zipf_skew_join_frames(spark, sf_dir, salted=False)
        df.collect()  # metrics exist only after execution
        nodes = _executed_plan_metrics(df)
        reads = [m for n, m in nodes if n == "AQEShuffleReadExec"]
        assert reads, [n for n, _ in nodes]
        skewed_parts = sum(int(m.get("numSkewedPartitions", 0)) for m in reads)
        skew_splits = sum(int(m.get("numSkewedSplits", 0)) for m in reads)
        assert skewed_parts >= 1, nodes
        # a split that engaged produced strictly more read-partitions
        # than it marked skewed
        assert skew_splits >= skewed_parts, nodes
        # and the join really ran as the skew-aware SMJ
        assert any(n == "SortMergeJoinExec" for n, _ in nodes)
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)
