"""Physical-plan assertions (SURVEY §4.2): the scale-critical properties
Catalyst must deliver for the declared queries — verified via explain()
so a regression (lost pushdown, surprise cartesian, missed broadcast)
fails loudly long before it costs anything at 100 TB."""

from __future__ import annotations

import pytest

from nibbler_spark.queries import load_all

SPECS = load_all()


def _plan(spark, sf_dir, name: str) -> str:
    df = SPECS[name].spark(spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_q1_filter_pushdown_and_column_pruning(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # 11-column table pruned to exactly the 6 referenced columns
    read = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_quantity" in read and "l_partkey" not in read and "l_tax" not in read


def test_c07_broadcast_hash_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "c07_broadcast_join")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_c01_3way_no_sort_merge_at_test_scale(spark, sf_dir):
    """Dimensions broadcast; partial aggregation present before the final
    group-by exchange."""
    plan = _plan(spark, sf_dir, "c01_join_3way_agg")
    assert "BroadcastHashJoin" in plan
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_f02_take_ordered_no_global_sort(spark, sf_dir):
    plan = _plan(spark, sf_dir, "f02_order_limit")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_k06_broadcast_query_and_take_ordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "k06_cosine_topk")
    assert "BroadcastExchange" in plan
    assert "TakeOrderedAndProject" in plan


def test_k04_blocked_join_is_hash_not_cartesian(spark, sf_dir):
    """The Jaccard pair query must hash-join on the (lang, source, size
    band) block keys — a CartesianProduct here would be the O(n²) scale
    killer, and the band must land in the equi-join keys (not a post
    filter) so the shuffle itself separates short from long docs."""
    plan = _plan(spark, sf_dir, "k04_jaccard_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    key_lines = [
        ln for ln in plan.splitlines()
        if ln.startswith(("Left keys", "Right keys"))
    ]
    assert key_lines, f"no equi-join key section found:\n{plan}"
    assert any("lang" in ln and "pband" in ln for ln in key_lines), (
        f"size band not in the left equi-join keys:\n{key_lines}"
    )
    assert any("lang" in ln and "band" in ln and "pband" not in ln
               for ln in key_lines), (
        f"size band not in the right equi-join keys:\n{key_lines}"
    )


def test_bmp_pipeline_chained_map_no_shuffle(spark, sf_dir):
    """The encode→decode image pipeline must be two CHAINED MapInPandas
    stages with no exchange between them (partition-local Arrow flow;
    the only exchange is the final output sort) and a scan pruned to
    doc_id alone."""
    # The registered query checkpoints the Python chain before its
    # final sort (r11 wave 5: the range partitioner's sampling job
    # would re-run the chain), so the chained-map property is asserted
    # on the pre-checkpoint frame the query is built from.
    from nibbler_spark.queries.multimodal import bmp_pipeline

    df = bmp_pipeline(spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert plan.count("MapInPandas") >= 2
    assert "Exchange" not in plan  # fully partition-local Arrow flow
    read = next(ln for ln in plan.splitlines() if "ReadSchema" in ln)
    assert "doc_id" in read and "text" not in read
    # And the registered query's visible plan is just sort-over-
    # checkpointed-result: one exchange (the output sort), Python done.
    final = _plan(spark, sf_dir, "ext_image_decode_bmp")
    tree = final.split("(1) Scan")[0]  # tree view only, not the details
    assert tree.count("Exchange") == 1
    assert "Scan ExistingRDD" in final


def test_simhash_banded_pairs_hash_join(spark, sf_dir):
    """Simhash candidate generation joins on band buckets — must stay an
    equi hash join (bench BENCH-K3 watches its runtime; this watches
    its shape)."""
    plan = _plan(spark, sf_dir, "ext_simhash_banded_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_e01_single_window_exchange(spark, sf_dir):
    """The window computation itself needs exactly one hash exchange on
    user_id (the trailing range exchange is the deterministic output
    sort)."""
    plan = _plan(spark, sf_dir, "e01_row_number_topk")
    assert plan.count("hashpartitioning") == 1


def test_q1_whole_stage_codegen(spark, sf_dir):
    df = SPECS["q1_pricing_summary"].spark(spark, sf_dir)
    code_plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "codegen"
        )
    )
    assert "WholeStageCodegen" in code_plan


def test_bucketed_join_no_fact_shuffle(spark, sf_dir):
    """Both sides bucketed by the join key: the SMJ reads buckets
    directly — no hashpartitioning exchange before the join (the only
    exchange is the post-aggregation one)."""
    from nibbler_spark.queries.scale_patterns import bucketed_tables

    t_orders, t_lineitem = bucketed_tables(spark, sf_dir)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table(t_orders)
        li = spark.table(t_lineitem)
        joined = li.join(o, li.l_orderkey == o.o_orderkey).select(
            "l_extendedprice", "o_orderpriority"
        )
        plan = joined._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "SortMergeJoin" in plan
        assert "hashpartitioning" not in plan  # bucket co-location holds
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_tq06_all_predicates_pushed(spark, sf_dir):
    """The scan-bound Q6 analogue: every predicate reaches the parquet
    reader and only the 3 referenced columns are read."""
    plan = _plan(spark, sf_dir, "tq06_revenue_forecast")
    pushed = next(l for l in plan.splitlines() if "PushedFilters" in l)
    for frag in ("l_shipdate", "l_discount", "l_quantity"):
        assert frag in pushed
    read = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_extendedprice" in read and "l_orderkey" not in read


def test_tq05_dimension_chain_broadcast(spark, sf_dir):
    """region→nation and supplier broadcast; no cartesian anywhere in the
    6-table join."""
    plan = _plan(spark, sf_dir, "tq05_regional_revenue")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_tq18_aggregates_before_join(spark, sf_dir):
    """Agg-then-join shape: the lineitem aggregate (partial+final pair)
    feeds the joins, the plan ends in TakeOrderedAndProject, and nothing
    degrades to a cartesian."""
    plan = _plan(spark, sf_dir, "tq18_large_orders")
    assert plan.count("HashAggregate") >= 2  # partial + final on l_orderkey
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_sorted_layout_filter_reaches_scan(spark, sf_dir):
    """The range-clustered rewrite must expose the ts band to the parquet
    reader (PushedFilters), which is what activates row-group min-max
    skipping over the sorted files."""
    plan = _plan(spark, sf_dir, "ext_sorted_layout_skipping")
    pushed = next(l for l in plan.splitlines() if "PushedFilters" in l)
    assert "GreaterThanOrEqual(ts" in pushed and "LessThan(ts" in pushed


def test_partition_pruning_reaches_scan(spark, sf_dir):
    from nibbler_spark.queries import load_all

    df = load_all()["ext_partition_pruning"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "event_type" in pf[0]


def test_tq19_disjunction_pushed_to_both_scans(spark, sf_dir):
    """The OR-of-ANDs mixes columns from both join sides; Catalyst must
    derive per-side disjunctions and push them below the join so each
    scan prunes independently (the residual stays on the join)."""
    plan = _plan(spark, sf_dir, "tq19_disjunctive_revenue")
    assert "BroadcastHashJoin" in plan
    # lineitem scan receives the OR of quantity ranges
    li_scan = next(
        l for l in plan.splitlines()
        if "PushedFilters" in l and "l_quantity" in l
    )
    assert "Or(" in li_scan
    # part scan receives the brand/size disjunction
    p_scan = next(
        l for l in plan.splitlines()
        if "PushedFilters" in l and "p_brand" in l
    )
    assert "Or(" in p_scan


def test_histogram_bounds_broadcast_not_shuffled(spark, sf_dir):
    """The 1-row min/max aggregate must come back as a broadcast nested
    loop (one row against the table) — never a shuffle of the fact
    side."""
    plan = _plan(spark, sf_dir, "ext_histogram_bins")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_tq04_semi_join_no_duplication(spark, sf_dir):
    """EXISTS compiles to a semi join (orders never duplicated by
    multiple matching lineitems) with the date filter pushed to the
    orders scan."""
    plan = _plan(spark, sf_dir, "tq04_priority_check")
    assert "LeftSemi" in plan
    o_scan = next(
        l for l in plan.splitlines()
        if "PushedFilters" in l and "o_orderdate" in l
    )
    assert "GreaterThanOrEqual(o_orderdate" in o_scan


def test_c14_bucketed_band_join_is_equi_on_time_bin(spark, sf_dir):
    """The bucketed rewrite must join on (user_id, bin) as real equi
    keys — time in the shuffle key — with no nested-loop fallback."""
    plan = _plan(spark, sf_dir, "c14_interval_join_bucketed")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "pbin" in plan  # the exploded bin participates in the join keys


def test_sessionize_single_hash_exchange(spark, sf_dir):
    """Both windows and the groupBy hash on user_id — exactly one hash
    exchange; the only other exchange is the presentation sort."""
    plan = _plan(spark, sf_dir, "ext_sessionize_batch")
    hashes = [
        l for l in plan.splitlines()
        if "hashpartitioning" in l and "user_id" in l
    ]
    assert len(hashes) >= 1
    assert plan.count("Exchange hashpartitioning") <= 1


def test_knn_join_broadcasts_queries_not_corpus(spark, sf_dir):
    """The query set broadcasts (nested-loop against the corpus); the
    corpus is never shuffled before the similarity computation."""
    plan = _plan(spark, sf_dir, "ext_knn_join")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_dynamic_partition_pruning_subquery(spark, sf_dir):
    """The fact scan's partition filter must come from a runtime
    dynamicpruning subquery fed by the filtered dimension."""
    plan = _plan(spark, sf_dir, "ext_dynamic_partition_pruning")
    assert "dynamicpruning" in plan.lower()


def test_decontaminate_broadcasts_eval_grams(spark, sf_dir):
    """The distinct eval n-gram set must broadcast (it is
    benchmark-sized against a 100 TB train corpus) and the probe must
    be a codegen BroadcastHashJoin; the corpus side may shuffle only
    for its single (doc_id) aggregation — per-doc gram dedup must stay
    row-local (array_distinct), never a corpus-wide DISTINCT."""
    plan = _plan(spark, sf_dir, "ext_decontaminate_ngram")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # eval-side distinct + the one corpus groupBy(doc_id) — no third
    # corpus-keyed exchange (a gram-keyed DISTINCT would add one).
    assert plan.count("Exchange hashpartitioning") <= 2


def test_sq8_stats_broadcast_no_corpus_reshuffle(spark, sf_dir):
    """Per-dimension quantizer stats are a 64-row aggregate joined back
    with a broadcast — the embedding corpus itself must not shuffle for
    the code assignment."""
    plan = _plan(spark, sf_dir, "ext_sq8_quantization")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_sequence_packing_two_phase_prefix_sum(spark, sf_dir):
    """Concat-and-chunk packing must run the Blelloch two-pass: the
    corpus-sized window is PARTITIONED by bucket (never a single global
    window over documents) and the bucket offsets broadcast back."""
    plan = _plan(spark, sf_dir, "ext_sequence_packing")
    import re

    n_windows = len(re.findall(r"^\(\d+\) Window", plan, re.M))
    assert n_windows == 2, f"expected 2 Window nodes, got {n_windows}"
    assert "BroadcastHashJoin" in plan
    # the big-table window must carry a partition spec (the bucket)
    win_args = [
        ln for ln in plan.splitlines()
        if "windowspecdefinition" in ln and "bucket" in ln
    ]
    assert win_args, f"no bucket-partitioned window found:\n{plan}"


def test_skyline_two_phase_carry_broadcast(spark, sf_dir):
    """The skyline's strictly-cheaper running max must come from the
    bucketed two-pass (carry-in broadcast + in-bucket RANGE frame), not
    a global single-partition window over part."""
    plan = _plan(spark, sf_dir, "ext_skyline_2d")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    win_args = [
        ln for ln in plan.splitlines()
        if "windowspecdefinition" in ln and "bucket" in ln
    ]
    assert win_args, f"no bucket-partitioned window found:\n{plan}"


def test_ewma_band_join_is_equi_on_type(spark, sf_dir):
    """The 14-day EWMA self-join runs on the daily AGGREGATE with
    event_type as an equi key — never a nested loop over raw events."""
    plan = _plan(spark, sf_dir, "ext_ewma_anomaly")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    key_lines = [
        ln for ln in plan.splitlines()
        if ln.startswith(("Left keys", "Right keys"))
    ]
    assert any("event_type" in ln for ln in key_lines), (
        f"event_type not an equi-join key:\n{key_lines}"
    )


def test_logreg_weight_broadcast(spark, sf_dir):
    """Each GD round must broadcast the 5-weight vector against the
    exploded feature matrix — a corpus-side shuffle for the weight join
    would be the scale killer."""
    plan = _plan(spark, sf_dir, "ext_logreg_gd")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_boilerplate_reference_set_broadcast(spark, sf_dir):
    """The high-DF boilerplate gram set must broadcast back for the
    per-doc probe (decontamination shape with a corpus-derived
    reference set)."""
    plan = _plan(spark, sf_dir, "ext_boilerplate_ngrams")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_training_pipeline_filter_pushdown_and_broadcasts(spark, sf_dir):
    """The funnel composite must push the quality floor into the scan
    (pruning before the dedup shuffle), broadcast the eval gram set,
    and never degrade to a cartesian."""
    plan = _plan(spark, sf_dir, "ext_training_data_pipeline")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("n_chars" in ln for ln in pushed), (
        f"quality floor not pushed to scan:\n{pushed}"
    )


def test_ivf_persisted_partition_pruning(spark, sf_dir):
    """The persisted-IVF probe must read only the probed cells: the
    corpus scan carries a PartitionFilters entry on label (static
    pruning — other cells' files are never opened)."""
    plan = _plan(spark, sf_dir, "ext_ivf_persisted")
    part = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("label" in ln and "IN" in ln.upper() for ln in part), (
        f"no label partition filter on the cell scan:\n{part}"
    )


def test_adaptive_join_strategy_switches_on_measured_skew(spark, sf_dir):
    """The chooser must actually CONSUME the skew measurement: the
    forced-skew scenario joins on (user_id, salt) — salt in the join
    keys — while the natural distribution joins plain, no salt anywhere
    in its plan. Both stay equi-joins."""
    from nibbler_spark.queries.scale_patterns import _adaptive_scenario

    skew_df, skew_strategy = _adaptive_scenario(spark, sf_dir, skewed=True)
    unif_df, unif_strategy = _adaptive_scenario(spark, sf_dir, skewed=False)
    assert skew_strategy == "salted"
    assert unif_strategy == "shuffle"
    skew_plan = skew_df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    unif_plan = unif_df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "salt" in skew_plan
    assert "salt" not in unif_plan
    for plan in (skew_plan, unif_plan):
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_embedding_neardup_lsh_candidates_not_allpairs(spark, sf_dir):
    """The r2 verdict's one scale-killer: near-dup pairs must come from
    the banded-LSH candidate equi-join on (band_id, band_val) — never a
    label-only (or unconditioned) self-join of the embedding table. The
    exact-cosine verify then runs on candidates alone."""
    plan = _plan(spark, sf_dir, "ext_embedding_neardup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # band keys participate in the candidate join
    assert "band_id" in plan and "band_val" in plan
    # no join keyed on label at all (the old all-pairs block)
    assert "label" not in plan


def test_portable_minhash_band_equi_join_and_slim_fanout(spark, sf_dir):
    """The portable MinHash pipeline must generate candidates via the
    (band_id, v1, v2) equi-join — never a cartesian — and the shingle
    arrays must not ride the seed fan-out (the hashed relation carries
    only doc_id, seed, h)."""
    plan = _plan(spark, sf_dir, "ext_minhash_lsh_portable")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "band_id" in plan


def test_triangle_count_all_joins_equi(spark, sf_dir):
    """Triangle enumeration must stay equi-join end-to-end (edge build
    on block keys, wedge join on the shared vertex, closure semi-join
    on the (x, y) pair) — any nested-loop here is the Σdeg² hub
    blowup the degree-ordered orientation exists to avoid."""
    plan = _plan(spark, sf_dir, "ext_triangle_count")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.parametrize(
    ("qname", "windows_allowed"),
    [
        ("ext_bm25_topk", False),
        ("ext_weighted_sample", False),
        ("ext_boilerplate_ngrams", False),
        ("ext_streak_lengths", True),  # keyed gaps-and-islands window ok
        ("ext_vocab_coverage", False),
    ],
)
def test_topk_plans_take_ordered_not_global_window(
    spark, sf_dir, qname, windows_allowed
):
    """Corpus-scale top-k must plan as TakeOrderedAndProject
    (per-partition top-k + driver merge of k rows) — a row_number over
    an unpartitioned window would single-partition the scored table.
    Queries may keep windows PARTITIONED by a key; none may carry an
    unpartitioned one."""
    plan = _plan(spark, sf_dir, qname)
    assert "TakeOrderedAndProject" in plan
    if windows_allowed:
        # every window spec must carry a partition column before the
        # ordering spec (windowspecdefinition(key..., ord ASC ...))
        specs = [
            ln for ln in plan.splitlines() if "windowspecdefinition" in ln
        ]
        assert all("user_id" in ln for ln in specs), specs
    else:
        assert "Window" not in plan


@pytest.mark.parametrize(
    "qname", ["ext_rrf_fusion", "ext_pareto_share", "ext_gini_coefficient"]
)
def test_full_rank_queries_use_bucketed_windows(spark, sf_dir, qname):
    """Full-corpus ranks (not top-k) must come from the two-phase
    bucketed row_number: every window spec in the plan either carries
    the _rk_bucket partition or is the tiny bucket-level prefix sum —
    no row_number over an unpartitioned corpus-scale window."""
    plan = _plan(spark, sf_dir, qname)
    specs = [
        ln for ln in plan.splitlines() if "windowspecdefinition" in ln
    ]
    assert specs
    for ln in specs:
        assert "_rk_bucket" in ln, f"unbucketed window spec: {ln}"


def test_label_propagation_no_cartesian_and_slim_keys(spark, sf_dir):
    """The LPA round joins must all be equi-joins (no nested-loop /
    cartesian anywhere), and the shingle index the pair join shuffles
    must be the hashed bigint, not the raw shingle string."""
    plan = _plan(spark, sf_dir, "ext_label_propagation")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_paragraph_dedup_single_chunk_shuffle_no_cartesian(spark, sf_dir):
    plan = _plan(spark, sf_dir, "ext_paragraph_dedup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_winnowing_windows_partition_by_doc(spark, sf_dir):
    """Every window spec in the winnowing plan partitions by doc_id —
    fingerprint selection must never sort the corpus globally."""
    plan = _plan(spark, sf_dir, "ext_winnowing")
    specs = [
        ln for ln in plan.splitlines() if "windowspecdefinition" in ln
    ]
    assert specs
    for ln in specs:
        assert "doc_id" in ln, f"window not doc-partitioned: {ln}"


def test_entity_resolution_dictionary_collapse_before_pairing(
    spark, sf_dir
):
    """The ER funnel's pair join must be an equi-join on the length
    band (never a cartesian over names), and the fact re-join must
    broadcast the tiny label dictionary."""
    plan = _plan(spark, sf_dir, "ext_entity_resolution")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_analyze_table_stats_enable_broadcast(spark, sf_dir):
    """Cost-based optimization wiring: after ANALYZE TABLE COMPUTE
    STATISTICS, the catalog carries row/size stats and a join against
    the small analyzed table plans as a broadcast join WITHOUT an
    explicit hint — the statistics path a 100 TB deployment relies on
    for automatic join-strategy choices."""
    import uuid as _uuid

    from nibbler_spark.sources import load_table

    tbl = f"nibbler_cbo_{_uuid.uuid4().hex[:8]}"
    try:
        load_table(spark, sf_dir, "nation").write.saveAsTable(tbl)
    except Exception:
        import pytest as _pytest

        _pytest.skip("no writable warehouse in this session")
    try:
        spark.sql(f"ANALYZE TABLE {tbl} COMPUTE STATISTICS")
        stats = spark.sql(f"DESCRIBE EXTENDED {tbl}").collect()
        rows = {r["col_name"]: r["data_type"] for r in stats}
        assert "Statistics" in rows  # sizeInBytes (+ rowCount) recorded
        cust = load_table(spark, sf_dir, "customer")
        joined = cust.join(
            spark.table(tbl), cust["c_nationkey"] == spark.table(tbl)["n_nationkey"]
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_hot_queries_run_inside_wholestage_codegen(spark, sf_dir):
    """The relational hot path must stay JVM-side: executed plans of
    the headline scan/join/window/agg queries all carry
    WholeStageCodegen spans, and none of them contain a Python
    evaluation operator (BatchEvalPython/ArrowEvalPython) — Python is
    reserved for the declared UDF/multimodal surfaces."""
    from nibbler_spark.queries import load_all

    specs = load_all()
    for name in (
        "q1_pricing_summary",
        "c01_join_3way_agg",
        "e01_row_number_topk",
        "tq05_regional_revenue",
        "ext_sessionize_batch",
        "ext_decontaminate_ngram",
    ):
        df = specs[name].spark(spark, sf_dir)
        df.collect()  # AQE finalizes (and annotates codegen) on execution
        plan = df._jdf.queryExecution().executedPlan().toString()
        # codegen stages render as "*(n)" operator prefixes
        assert "*(" in plan or "WholeStageCodegen" in plan, name
        assert "EvalPython" not in plan, name


def test_topk_per_group_uses_window_group_limit(spark, sf_dir):
    """Catalyst's rank-filter pushdown (WindowGroupLimit, Spark 3.5+)
    must fire for the top-k-per-group shape: each partition keeps only
    k rows per group BEFORE the full window sort — at 100 TB the
    difference between sorting every group and a bounded per-group
    heap."""
    from nibbler_spark.queries import load_all

    plan = (
        load_all()["f04_topk_per_group"]
        .spark(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan


def test_ahash_band_join_no_cartesian(spark, sf_dir):
    """ext_image_ahash_neardup candidates come from the (band, value)
    equi-join — a cartesian would be the all-pairs anti-pattern the
    banding exists to avoid."""
    plan = _plan(spark, sf_dir, "ext_image_ahash_neardup")
    assert "CartesianProduct" not in plan
    assert "bv" in plan and "band" in plan


def test_link_prediction_wedge_join_and_anti(spark, sf_dir):
    """The wedge join keys on the middle node z and existing edges drop
    via a left-anti join — never a cartesian."""
    plan = _plan(spark, sf_dir, "ext_link_prediction")
    assert "CartesianProduct" not in plan
    assert "LeftAnti" in plan


def test_containment_inverted_index_no_cartesian(spark, sf_dir):
    """Containment candidates must come from the shingle inverted-index
    equi-join (pairs that actually share content)."""
    plan = _plan(spark, sf_dir, "ext_containment_dedup")
    assert "CartesianProduct" not in plan


def test_trunc_sweep_window_partitioned_by_query(spark, sf_dir):
    """Every rank window in the sweep partitions BY QUERY (q_id, d) —
    a corpus-global window would single-partition the ranking."""
    plan = _plan(spark, sf_dir, "ext_dim_truncation_sweep")
    for line in plan.splitlines():
        if "row_number()" in line:
            assert "q_id" in line and "d#" in line


def test_geohash_stays_jvm_side(spark, sf_dir):
    """The Morton interleave + base32 render is pure column expressions:
    no Python evaluation anywhere in the plan."""
    plan = _plan(spark, sf_dir, "ext_geohash_encode")
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_gbdt_stage1_winner_broadcast(spark, sf_dir):
    """The stage-1 best split joins back to the fact rows as a broadcast
    1-row side (never a shuffle of the fact table against it)."""
    plan = _plan(spark, sf_dir, "ext_gbdt_round")
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan


def test_pip_edges_broadcast_no_shuffle_of_points(spark, sf_dir):
    """Point-in-polygon: the 13-edge table must be the broadcast side of
    a nested-loop join; the parity groupBy is the only exchange of the
    point stream."""
    plan = _plan(spark, sf_dir, "ext_point_in_polygon")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_dbscan_neighbor_join_no_cartesian(spark, sf_dir):
    """DBSCAN candidates come from the 3x3 stencil equi-join, never an
    all-pairs product."""
    plan = _plan(spark, sf_dir, "ext_dbscan_grid")
    assert "CartesianProduct" not in plan


def test_filtered_ann_broadcasts_probe_sides(spark, sf_dir):
    """Filtered ANN: query vector and probed-cell list ride broadcasts;
    the embedding fact side is never broadcast."""
    plan = _plan(spark, sf_dir, "ext_filtered_ann")
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_phrase_search_posting_joins_keyed(spark, sf_dir):
    """Phrase search: position intersections are equi-joins (hash or
    sort-merge on doc), not theta products."""
    plan = _plan(spark, sf_dir, "ext_phrase_search")
    assert "CartesianProduct" not in plan
    assert "Join" in plan


def test_sweepline_windows_ride_day_buckets(spark, sf_dir):
    """The sweepline's cumulative sums are day-partitioned (two-phase);
    no unpartitioned window over the delta stream."""
    import re

    plan = _plan(spark, sf_dir, "ext_interval_sweepline")
    # every Window spec either partitions by user_id (session build) or
    # by day (two-phase cumsum), except the tiny per-day offset prefix
    specs = re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", plan)
    unpartitioned = [s for s in specs if s.strip() == ""]
    assert len(unpartitioned) <= 1  # only the kilobyte day-offset table


def test_one_pass_profile_is_one_aggregate(spark, sf_dir):
    import re

    plan = _plan(spark, sf_dir, "ext_table_profile_onepass")
    # single scan feeds all 6x5 metrics (formatted plans number nodes)
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_rolling_regression_single_window_node(spark, sf_dir):
    """All five sufficient statistics share ONE window frame pass."""
    plan = _plan(spark, sf_dir, "ext_rolling_regression")
    assert plan.count("Window ") <= 1 or plan.count("Window\n") <= 1


def test_dsir_scoring_join_broadcasts_stats(spark, sf_dir):
    """The 1024-row bucket stats table and the 1-row totals must ride
    broadcast joins — scoring at 100 TB is a map-side probe, never a
    corpus-wide shuffle join."""
    plan = _plan(spark, sf_dir, "ext_dsir_importance_weights")
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row totals cross join
    assert "SortMergeJoin" not in plan


def test_novelty_decay_no_corpus_join_back(spark, sf_dir):
    """Novelty deciles come from MIN inside the gram aggregate; the only
    joins are the broadcast max-doc-id row and the 10-row decile
    combine — never a corpus-table self-join."""
    plan = _plan(spark, sf_dir, "ext_ngram_novelty_decay")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_louvain_no_cartesian_argmax_partial(spark, sf_dir):
    """Candidate generation rides the keyed inverted-index join (no
    cartesian anywhere), and the argmax is a partial-combining
    aggregate (HashAggregate with partial_max), not a global sort."""
    plan = _plan(spark, sf_dir, "ext_louvain_sync_round")
    assert "CartesianProduct" not in plan
    assert "partial_max" in plan


def test_unigram_segmentation_model_broadcast_no_udf(spark, sf_dir):
    """The piece-score map broadcasts as one row, and the Viterbi fold
    stays JVM-side — no Python evaluation anywhere in the plan."""
    plan = _plan(spark, sf_dir, "ext_unigram_lm_segmentation")
    assert "BroadcastNestedLoopJoin" in plan  # 1-row model cross join
    assert "EvalPython" not in plan and "ArrowEval" not in plan


def test_viterbi_decode_single_shuffle_no_udf(spark, sf_dir):
    """One sessionize exchange, then codegen arithmetic: no Python eval,
    no join at all."""
    plan = _plan(spark, sf_dir, "ext_viterbi_decode")
    assert "EvalPython" not in plan and "ArrowEval" not in plan
    assert "Join" not in plan
    # exactly two exchanges: the sessionize hash exchange (between the
    # partial and final collect_list aggregates — map-side combine
    # present) and the final orderBy's range exchange
    import re

    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchanges == 2, plan[:2000]
    assert plan.count("ObjectHashAggregate") >= 2


def test_kneser_ney_type_total_broadcast(spark, sf_dir):
    """The 1-row bigram-type total rides a broadcast nested-loop cross
    join; the vocab-side joins stay keyed."""
    plan = _plan(spark, sf_dir, "ext_kneser_ney_bigram")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_good_turing_spine_joins_broadcast(spark, sf_dir):
    """The 11-row spine and scalar total ride broadcasts; the only
    corpus-scale exchange is the token count (map-side combined)."""
    plan = _plan(spark, sf_dir, "ext_good_turing_smoothing")
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row total
    assert "SortMergeJoin" not in plan


def test_ppmi_head_filter_before_pair_count(spark, sf_dir):
    """The top-50 head list semi-joins as a broadcast BEFORE the c12
    count shuffle, and the scoring joins broadcast the small sides."""
    plan = _plan(spark, sf_dir, "ext_ppmi_associations")
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    import re

    m = re.search(r"BroadcastHashJoin.*?LeftSemi", plan, re.S)
    assert m is not None, plan[:3000]
    assert "TakeOrderedAndProject" in plan  # the top-50 head selection


def test_bleu_grams_never_leave_their_row(spark, sf_dir):
    """No join at all: one lead() window per lang, then row-local gram
    folds into a 5-row aggregate."""
    plan = _plan(spark, sf_dir, "ext_bleu_self_similarity")
    assert "EvalPython" not in plan
    assert "Join" not in plan
    assert plan.count("Window") >= 1


def test_rouge_l_dp_is_pure_codegen(spark, sf_dir):
    """The LCS fold is column arithmetic: no Python eval, no join, one
    pairing window plus one aggregate."""
    plan = _plan(spark, sf_dir, "ext_rouge_l_similarity")
    assert "EvalPython" not in plan
    assert "Join" not in plan
    assert "HashAggregate" in plan


def test_suffix_array_no_cartesian_all_keyed(spark, sf_dir):
    """r11 layout: one fixed-width pack (row-local, off a 1-row
    broadcast vocab dictionary — the only nested-loop join allowed),
    one bucketed window exchange for order+adjacency, keyed joins for
    the LCP token attach. No cartesian products over data-sized
    frames, no Python eval, and no rank self-join anywhere."""
    plan = _plan(spark, sf_dir, "ext_suffix_array_lcp")
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    # the 1-row vmap dictionary broadcast sits behind the rank-array
    # checkpoint; the post-checkpoint plan must be BNLJ-free
    assert "BroadcastNestedLoopJoin" not in plan
    assert "ExistingRDD" in plan


def test_kl_divergence_single_corpus_scan(spark, sf_dir):
    """The (lang, token) count is materialized ONCE (localCheckpoint):
    Catalyst has no DAG-level subtree sharing, so the naive plan
    re-scanned the corpus per consumer (5 parquet scans — caught by
    this test's first version). The final plan must contain ZERO
    corpus scans; everything derives from the vocab-sized rank table."""
    plan = _plan(spark, sf_dir, "ext_lang_kl_divergence")
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # 1-row corpus total
    assert "documents.parquet" not in plan
    assert "ExistingRDD" in plan


def test_cond_entropy_c1_folds_out_of_bigram_table(spark, sf_dir):
    """Same materialize-once discipline for the bigram count table."""
    plan = _plan(spark, sf_dir, "ext_bigram_conditional_entropy")
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "documents.parquet" not in plan
    assert "ExistingRDD" in plan


def test_chrf_grams_never_leave_their_row(spark, sf_dir):
    plan = _plan(spark, sf_dir, "ext_chrf_self_similarity")
    assert "EvalPython" not in plan
    assert "Join" not in plan


def test_kn_heldout_scoring_joins_keyed_totals_broadcast(spark, sf_dir):
    """Scoring joins are keyed on (lang, w1[, w2]) against the
    checkpointed vocab-scale LM tables; lang totals broadcast; no
    cartesian; exactly two corpus scans (train explode + held explode
    — the LM table itself is an ExistingRDD checkpoint)."""
    plan = _plan(spark, sf_dir, "ext_kn_heldout_perplexity")
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "ExistingRDD" in plan
    assert plan.count("BroadcastHashJoin") >= 1


def test_kmeanspp_rounds_broadcast_centers_argmax_partial(spark, sf_dir):
    """Every distance pass broadcasts the <=4 chosen centers
    (BroadcastNestedLoopJoin on the 1-to-4-row side is the cross join
    shape); the argmax is a partial-combining struct-max (HashAggregate
    pair), never a sort; no Python eval."""
    plan = _plan(spark, sf_dir, "ext_kmeanspp_seeding")
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "HashAggregate" in plan
    # the argmax reduce is sortless: the only range exchange is the
    # deterministic output orderBy
    assert plan.count("Exchange rangepartitioning") <= 1


def test_haar_all_levels_one_aggregate_pair(spark, sf_dir):
    """The closed-form sign trick: no per-level join, no recursion —
    one daily count then one grouped detail aggregate."""
    plan = _plan(spark, sf_dir, "ext_haar_energy_decomposition")
    assert "EvalPython" not in plan
    assert "Join" not in plan
    assert "Window" not in plan  # argmax is min_by, not a window


def test_bwt_zero_exchanges_before_final_group(spark, sf_dir):
    """Entirely row-local: the only exchanges are the 5-row aggregate
    and the output sort."""
    plan = _plan(spark, sf_dir, "ext_bwt_compressibility")
    assert "EvalPython" not in plan
    import re

    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchanges <= 4, plan[:2000]


def test_margin_mining_ivf_funnel_no_pool_cross(spark, sf_dir):
    """r6 verdict #1: candidate generation must be the IVF probe
    funnel, never a pool-scale cross product. The only nested-loop
    joins allowed are against the 1-row collected seed array (the two
    crossJoin(broadcast(seed_row)) map stages); candidates come from a
    keyed equi-join on cell; no CartesianProduct anywhere."""
    plan = _plan(spark, sf_dir, "ext_margin_pair_mining")
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    # assignment + probe: each a BNLJ against the single collected
    # seed row — a pool-scale broadcast side would be a 3rd+ BNLJ
    assert plan.count("BroadcastNestedLoopJoin") <= 2
    assert "ExistingRDD" in plan  # the candidate table checkpoint
    assert "TakeOrderedAndProject" in plan  # final top-20


def test_silhouette_probe_set_is_fixed_size(spark, sf_dir):
    """r6 verdict #2: the broadcast probe side must be O(1) in the
    corpus (count-derived modulus ~64 rows), not a fixed-percentage
    sample. Measured at two corpus sizes: the probe count is the same
    ~64 at both, and the join side carrying the corpus is NOT the
    broadcast build side."""
    from pyspark.sql import functions as F

    from nibbler_spark.sources import load_table

    plan = _plan(spark, sf_dir, "ext_silhouette_sampled")
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    for d in (sf_dir, sf_dir.replace("sf0.01", "sf0.001")):
        e = load_table(spark, d, "embeddings")
        n = e.count()
        probes = e.where(
            F.col("vec_id") % F.lit(max(1, n // 64)) == 0
        ).count()
        # ceil(n / (n DIV 64)) <= 128 for every n >= 64 (approaches
        # 64 as n grows) — a CONSTANT bound independent of corpus
        # size, which is the broadcast-safety property; tiny corpora
        # (n < 64) degrade to modulus 1 = probe all
        assert probes <= 128 or n < 64, (d, n, probes)


def test_submodular_rounds_keyed_anti_joins(spark, sf_dir):
    """Round joins stay keyed (anti/semi on shingle / doc_id); argmax
    is partial-combining; the shingle table is a checkpoint."""
    plan = _plan(spark, sf_dir, "ext_submodular_coverage")
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "ExistingRDD" in plan


def test_jsd_single_corpus_scan_keyed_vocab_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "ext_jensen_shannon_matrix")
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "documents.parquet" not in plan  # tf checkpointed once
    assert "ExistingRDD" in plan


def test_adaboost_histograms_partial_combining(spark, sf_dir):
    """Each round's candidate histogram must show a partial+final
    HashAggregate pair (the MLlib bin-statistics shape)."""
    plan = _plan(spark, sf_dir, "ext_adaboost_two_rounds")
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2


def test_span_corruption_row_local_no_joins(spark, sf_dir):
    """Span masking is ONE map over the corpus (overlap-merge is a
    row-local disjunction, not sequential state) + one combinable
    5-group aggregate: no join of any kind, no Python eval."""
    plan = _plan(spark, sf_dir, "ext_span_corruption_prep")
    assert "EvalPython" not in plan
    assert "Join" not in plan
    assert "HashAggregate" in plan


def test_length_bucketed_batching_keyed_windows(spark, sf_dir):
    """Both batch assignments are windows over KEYED partitions
    ((lang, bucket) / (lang)) — no single-partition window, no
    cartesian anywhere."""
    plan = _plan(spark, sf_dir, "ext_length_bucketed_batching")
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan


def test_glove_cooc_head_filtered_before_exchange(spark, sf_dir):
    """The corpus-scale pair stream is semi-joined against the
    broadcast top-30 heads BEFORE the (w1, w2) aggregate exchange —
    the PPMI recipe."""
    plan = _plan(spark, sf_dir, "ext_glove_cooccurrence")
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_wordpiece_vocab_scale_segmentation(spark, sf_dir):
    """Segmentation folds run on the DISTINCT (lang, word) table with
    three 1-row broadcast inventories (vocab list, initial pieces,
    continuation pieces) — at most 3 nested-loop joins, all against
    single collected rows; the greedy cursor walk is a row-local
    F.aggregate (no Python eval)."""
    plan = _plan(spark, sf_dir, "ext_wordpiece_apply")
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    # 3 joins; formatted mode prints each operator twice (tree line +
    # details block)
    assert plan.count("BroadcastNestedLoopJoin") <= 6


def test_vocab_coverage_curve_vocab_scale_rank(spark, sf_dir):
    """One corpus-scale combinable count, then vocabulary-scale work
    only; the 6-point sweep joins a broadcast literal frame."""
    plan = _plan(spark, sf_dir, "ext_vocab_coverage_curve")
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_sgns_interval_lookup_is_bucketed_equi_join(spark, sf_dir):
    """The inverse-CDF token lookup must be the bucketed interval
    EQUI-join (probe bucket u DIV B against exploded interval
    buckets), never a nested-loop range scan over the vocabulary."""
    plan = _plan(spark, sf_dir, "ext_skipgram_negative_sampling")
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_window_funnel_row_local_chain_test(spark, sf_dir):
    """The funnel is one per-user fold: three sorted arrays + row-local
    array algebra — no self-join on events (the oracle's EXISTS joins
    are the independent witness, not the scale design)."""
    plan = _plan(spark, sf_dir, "ext_window_funnel")
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    # exactly one corpus-scale exchange: the per-user aggregate
    assert plan.count("hashpartitioning") <= 1


def test_burstiness_combinable_aggregates_takeordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "ext_token_burstiness")
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_rbo_language_scale_after_rankings(spark, sf_dir):
    """Per-language top-10 rankings are keyed windows; everything
    after operates on O(languages) rows; the depth sweep is a 10-row
    broadcast."""
    plan = _plan(spark, sf_dir, "ext_rank_biased_overlap")
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan


def test_neyman_single_corpus_aggregate(spark, sf_dir):
    plan = _plan(spark, sf_dir, "ext_neyman_allocation")
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "HashAggregate" in plan


def test_iterative_pruning_keyed_rounds_no_global_sort(spark, sf_dir):
    """Each pruning round: keyed semi-join against the kept list,
    combinable vocab counts, vocab-scale join back, bucketed two-phase
    median rank — no cartesian, no Python eval; kept lists are
    checkpoints."""
    plan = _plan(spark, sf_dir, "ext_iterative_quality_pruning")
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "ExistingRDD" in plan


def test_prefix_cache_windows_partition_by_first_token(spark, sf_dir):
    """No unpartitioned corpus window: both lag windows must partition
    by the first token (the cross-bucket-LCP=0 argument)."""
    plan = _plan(spark, sf_dir, "ext_prefix_cache_analysis")
    specs = [
        ln for ln in plan.splitlines() if "windowspecdefinition" in ln
    ]
    assert specs
    for ln in specs:
        assert "tok1" in ln, f"window not tok1-partitioned: {ln}"
    assert "CartesianProduct" not in plan


def test_token_budget_windows_all_bucketed(spark, sf_dir):
    """Both Blelloch passes: every corpus-side window partitions by a
    coarse bucket (_rk_bucket for the rank, cbucket for the prefix
    sum); only bucket-count-sized frames see ordering-only windows."""
    plan = _plan(spark, sf_dir, "ext_token_budget_threshold")
    specs = [
        ln for ln in plan.splitlines() if "windowspecdefinition" in ln
    ]
    assert specs
    for ln in specs:
        assert "_rk_bucket" in ln or "cbucket" in ln, (
            f"unbucketed window spec: {ln}"
        )
    assert "CartesianProduct" not in plan


def test_bq_recall_broadcast_probe_no_cartesian(spark, sf_dir):
    """The probes x corpus pass must be the bounded broadcast
    nested-loop (probe side is O(1) by the count-derived modulus);
    never a CartesianProduct, and the top-10s are partitioned
    windows."""
    plan = _plan(spark, sf_dir, "ext_binary_embedding_recall")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    specs = [
        ln for ln in plan.splitlines() if "windowspecdefinition" in ln
    ]
    assert specs
    for ln in specs:
        assert "probe_id" in ln, f"window not probe-partitioned: {ln}"


def test_embedding_jsd_seed_join_bounded(spark, sf_dir):
    """Assignment is row-local against the 1-row collected seed array:
    the only nested-loop joins are against 1-row frames (seed array,
    totals), and there is no corpus-sized window at all."""
    plan = _plan(spark, sf_dir, "ext_embedding_distribution_divergence")
    assert "CartesianProduct" not in plan
    assert "windowspecdefinition" not in plan

def test_cdc_chunk_windows_doc_partitioned_no_cartesian(spark, sf_dir):
    """ext_cdc_chunk_dedup: the chunk-assembly LAG window must be
    PARTITIONED BY doc_id (an unpartitioned window would serialize the
    corpus through one task at 100 TB), and nothing may cartesian."""
    plan = _plan(spark, sf_dir, "ext_cdc_chunk_dedup")
    assert "hashpartitioning(doc_id" in plan
    assert "CartesianProduct" not in plan


def test_wordpiece_curve_broadcast_inventories_no_cartesian(spark, sf_dir):
    """ext_wordpiece_vocab_curve: the four per-size segmentations ride
    single-row BROADCAST inventory joins (BroadcastNestedLoopJoin on a
    1-row build side is the intended shape), never a CartesianProduct;
    the corpus-scale word count happens once upstream."""
    plan = _plan(spark, sf_dir, "ext_wordpiece_vocab_curve")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_preference_pairs_group_partitioned_no_cartesian(spark, sf_dir):
    plan = _plan(spark, sf_dir, "ext_preference_pair_mining")
    assert "CartesianProduct" not in plan


def test_speculative_acceptance_lang_partitioned_windows(spark, sf_dir):
    """Both argmax windows must be hash-partitioned by their group keys
    — (lang, prev) for the bigram target, lang for the unigram draft —
    never a single-partition global window."""
    plan = _plan(spark, sf_dir, "ext_speculative_acceptance")
    assert "hashpartitioning(lang" in plan
    assert "CartesianProduct" not in plan


def test_h09_h12_projection_above_output_sort(spark, sf_dir):
    """h09/h12 (r11): the heavy scalar/HOF projection must sit ABOVE
    the output sort's range exchange — below it, the computed columns
    ride the exchange and the range partitioner's sampling job
    evaluates the whole projection a second time. Pin: the Sort's
    child Exchange carries only the raw input columns."""
    for name, computed in (
        ("h09_math", "price_sqrt"),
        ("h12_array_lambdas", "agg_sum"),
        ("b05_cast", "price_dec"),
    ):
        plan = _plan(spark, sf_dir, name)
        tree = plan.split("(1) Scan")[0]
        # exactly one exchange (the output sort), projection above it
        assert tree.count("Exchange") == 1, f"{name}:\n{tree}"
        exch = next(
            s for s in plan.split("\n\n") if s.startswith("(") and
            "Exchange" in s.splitlines()[0] and "rangepartitioning" in s
        )
        assert computed not in exch, (
            f"{name}: computed column rides the sort exchange:\n{exch}"
        )


def test_sql07_recursion_body_reads_materialized_seq(spark, sf_dir):
    """sql07 (r11): Spark inlines non-recursive CTEs into every
    UnionLoop step, so an un-materialized seq re-scanned orders and
    re-ran the row_number window ~40x. Pin: the loop body joins the
    localCheckpointed seq (LogicalRDD) — no parquet relation, no
    Window inside the loop."""
    plan = _plan(spark, sf_dir, "sql07_recursive_cte")
    loop = plan[plan.index("UnionLoop") :]
    head = loop[: loop.index("(1) UnionLoop")]  # tree view of the loop
    assert "LogicalRelation" not in head, head
    assert "Window" not in head, head
    assert "LogicalRDD" in head, head
