"""Brute-force and cross-query invariants for the round-4 continuation
operators — the properties the per-row hash oracles can't state."""

from __future__ import annotations

from collections import Counter, defaultdict

from pyspark.sql import functions as F

from nibbler_spark.queries import load_all
from nibbler_spark.sources import load_table

SPECS = load_all()


def test_market_basket_matches_bruteforce(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    baskets = defaultdict(set)
    for r in rows:
        baskets[r["l_orderkey"]].add(r["l_partkey"])
    supp = Counter()
    pair = Counter()
    for items in baskets.values():
        for p in items:
            supp[p] += 1
        s = sorted(items)
        for i, a in enumerate(s):
            for b in s[i + 1 :]:
                pair[(a, b)] += 1
    n = len(baskets)
    cands = [
        (a, b, c, supp[a], supp[b], c / supp[a], n * c / (supp[a] * supp[b]))
        for (a, b), c in pair.items()
        if c >= 3
    ]
    cands.sort(key=lambda t: (-round(t[6], 6), t[0], t[1]))
    out = SPECS["ext_market_basket"].spark(spark, sf_dir).collect()
    assert len(out) == min(20, len(cands))
    for got, exp in zip(out, cands):
        assert (got["part_a"], got["part_b"], got["n_both"]) == exp[:3]
        assert abs(got["lift"] - exp[6]) < 1e-5


def test_rfm_scores_partition_customers(spark, sf_dir):
    out = SPECS["ext_rfm_segmentation"].spark(spark, sf_dir).collect()
    n_cust = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r["n_customers"] for r in out) == n_cust
    for r in out:
        assert 1 <= r["r_score"] <= 5
        assert 1 <= r["f_score"] <= 5
        assert 1 <= r["m_score"] <= 5


def test_cusum_changepoint_matches_python(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("x")
        )
        .orderBy("d")
        .collect()
    )
    xs = [r["x"] for r in rows]
    n, s = len(xs), sum(xs)
    best = None
    cx = 0
    for i, x in enumerate(xs, start=1):
        cx += x
        stat = abs(n * cx - i * s)
        cand = (-stat, rows[i - 1]["d"])
        if best is None or cand < best:
            best = cand
    out = SPECS["ext_cusum_changepoint"].spark(spark, sf_dir).collect()[0]
    assert out["cp_day"] == best[1]
    assert out["scaled_stat"] == -best[0]
    assert out["n_days"] == n


def test_theil_sen_matches_python(spark, sf_dir):
    import statistics

    rows = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.expr(
                "datediff(to_date(o_orderdate), date '1970-01-01') div 7"
            ).alias("di")
        )
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("x")
        )
        .collect()
    )
    pts = sorted((r["di"], r["x"]) for r in rows)
    slopes = [
        (x2 - x1) / (d2 - d1)
        for i, (d1, x1) in enumerate(pts)
        for (d2, x2) in pts[i + 1 :]
    ]
    med = statistics.median(slopes)
    out = SPECS["ext_theil_sen_trend"].spark(spark, sf_dir).collect()[0]
    assert out["n_pairs"] == len(slopes)
    assert abs(out["slope_cents_per_week"] - med) < 1e-4


def test_bucketed_band_join_equals_c10(spark, sf_dir):
    a = [
        tuple(r)
        for r in SPECS["c10_interval_join"].spark(spark, sf_dir).collect()
    ]
    b = [
        tuple(r)
        for r in SPECS["ext_bucketed_band_join"]
        .spark(spark, sf_dir)
        .collect()
    ]
    assert a == b and a


def test_ndcg_bounds(spark, sf_dir):
    out = SPECS["ext_ndcg_eval"].spark(spark, sf_dir).collect()[0]
    assert 0 < out["ndcg_at_10"] <= 1.0
    assert out["dcg_e9"] <= out["idcg_e9"]


def test_histogram_quantile_bounds_hold(spark, sf_dir):
    for r in SPECS["ext_histogram_quantile"].spark(spark, sf_dir).collect():
        assert r["within_bucket"]
        assert r["est_lo_cents"] <= r["exact_cents"] <= r["est_hi_cents"]


def test_join_cardinality_estimate_is_upper_bound(spark, sf_dir):
    out = SPECS["ext_join_cardinality_estimate"].spark(
        spark, sf_dir
    ).collect()[0]
    assert out["is_upper_bound"]
    assert 1.0 <= out["overestimate_ratio"] < 1.5  # 4x2048 cells: tight


def test_stratified_split_covers_and_partitions(spark, sf_dir):
    out = SPECS["ext_stratified_split"].spark(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in out) == n_docs
    splits = {r["split"] for r in out}
    assert splits <= {"train", "val", "test"}
    train = sum(r["n_docs"] for r in out if r["split"] == "train")
    assert 0.6 * n_docs < train < 0.95 * n_docs


def test_ivf_incremental_equals_inline(spark, sf_dir):
    inline = [
        tuple(r)
        for r in SPECS["ext_ivf_ann"].spark(spark, sf_dir).collect()
    ]
    incr = [
        tuple(r)
        for r in SPECS["ext_ivf_incremental_append"]
        .spark(spark, sf_dir)
        .collect()
    ]
    assert inline == incr and inline


def test_robots_filter_matches_bruteforce(spark, sf_dir):
    """Longest-match verdicts equal a from-scratch Python resolver,
    including the /private/archive/ re-allow override."""
    ids = [
        r["doc_id"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .collect()
    ]
    rules = [("/", True), ("/private/", False), ("/private/archive/", True)]
    n_allowed = n_blocked = 0
    allowed_sum = 0
    for did in ids:
        m4, m30 = did % 4, did % 30
        path = (
            f"/private/p{m30}" if m4 == 0
            else f"/private/archive/a{m30}" if m4 == 1
            else f"/public/q{m30}" if m4 == 2
            else "/"
        )
        best = max(
            (r for r in rules if path.startswith(r[0])),
            key=lambda r: (len(r[0]), r[0]),
        )
        if best[1]:
            n_allowed += 1
            allowed_sum += did
        else:
            n_blocked += 1
    out = SPECS["ext_robots_txt_filter"].spark(spark, sf_dir).collect()[0]
    assert (out["n_allowed"], out["n_blocked"]) == (n_allowed, n_blocked)
    assert out["allowed_checksum"] == allowed_sum


def test_crawl_pipeline_funnel_is_monotone(spark, sf_dir):
    out = SPECS["ext_crawl_pipeline"].spark(spark, sf_dir).collect()[0]
    assert (
        out["n_fetched"]
        >= out["n_allowed"]
        >= out["n_canonical"]
        >= out["n_kept"]
        > 0
    )
