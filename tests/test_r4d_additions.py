"""Round-4 continuation additions: plan shapes, invariants, and the
catalog-transaction concurrency property for the new query families
(KMV/theta sketches, KS test, Poisson bootstrap, IPF raking, CDC
apply, multi-table transactions, corpus statistics)."""

from __future__ import annotations

import os
import tempfile
import threading

from pyspark.sql import functions as F

from nibbler_spark.queries import load_all

SPECS = load_all()


def _run(spark, sf_dir, name):
    return SPECS[name].spark(spark, sf_dir)


# ------------------------------------------------------------- KMV / theta


def test_kmv_setops_internal_consistency(spark, sf_dir):
    rows = {r["measure"]: r for r in _run(
        spark, sf_dir, "ext_kmv_theta_setops"
    ).collect()}
    assert set(rows) == {"a", "b", "union", "intersect"}
    # inclusion-exclusion sanity on the TRUE counts the query carries
    assert (
        rows["union"]["true_n"]
        == rows["a"]["true_n"] + rows["b"]["true_n"]
        - rows["intersect"]["true_n"]
    )
    for r in rows.values():
        assert r["within_bound"], r


def test_kmv_sketch_build_is_top_k_not_global_sort(spark, sf_dir):
    # the sketch primitive: distinct hashes -> orderBy -> limit must
    # compile to TakeOrderedAndProject (no full sort at any corpus size)
    from nibbler_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    hv = F.conv(
        F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 12), 16, 10
    ).cast("bigint")
    sk = li.select(hv.alias("hv")).distinct().orderBy("hv").limit(256)
    plan = sk._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


# ------------------------------------------------------------------ KS test


def test_ks_windows_are_bucket_partitioned(spark, sf_dir):
    df = _run(spark, sf_dir, "ext_ks_two_sample")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # every window spec over the distinct-value table must carry the
    # bucket key — no unpartitioned window on corpus-sized data (the
    # offsets window rides the tiny per-bucket table)
    for line in plan.splitlines():
        if "windowspecdefinition(cents" in line:
            raise AssertionError(
                f"value-level window lost its bucket partition: {line}"
            )


def test_ks_statistic_matches_brute_force(spark, sf_dir):
    row = _run(spark, sf_dir, "ext_ks_two_sample").first()
    from nibbler_spark.sources import load_table

    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .select("o_orderpriority", "o_totalprice")
        .collect()
    )
    import math

    s1 = sorted(
        math.floor(r["o_totalprice"] * 100)
        for r in o
        if r["o_orderpriority"] == "1-URGENT"
    )
    s2 = sorted(
        math.floor(r["o_totalprice"] * 100)
        for r in o
        if r["o_orderpriority"] == "5-LOW"
    )
    import bisect

    vals = sorted(set(s1) | set(s2))
    d_num = max(
        abs(
            bisect.bisect_right(s1, v) * len(s2)
            - bisect.bisect_right(s2, v) * len(s1)
        )
        for v in vals
    )
    assert row["d_num"] == d_num
    assert row["n1"] == len(s1) and row["n2"] == len(s2)


# ------------------------------------------------------- Poisson bootstrap


def test_poisson_thresholds_match_distribution():
    import math

    from nibbler_spark.queries.ml_exact import _POIS_T

    c = 0.0
    for k, t in enumerate(_POIS_T):
        c += math.exp(-1) / math.factorial(k)
        assert t == math.floor(c * (1 << 48))


def test_bootstrap_ci_brackets_point(spark, sf_dir):
    row = _run(spark, sf_dir, "ext_poisson_bootstrap_ci").first()
    assert row["point_in_ci"]
    assert row["ci_lo_cents"] < row["ci_hi_cents"]
    # CI width is sane: within 50% of the point for n >= 1500 rows
    assert (
        row["ci_hi_cents"] - row["ci_lo_cents"]
    ) < 0.5 * row["point_mean_cents"]


# ------------------------------------------------------------- IPF raking


def test_ipf_marginals(spark, sf_dir):
    rows = _run(spark, sf_dir, "ext_ipf_raking").collect()
    assert rows and all(r["rows_matched"] for r in rows)
    assert all(r["cols_improved"] for r in rows)
    # weights are strictly positive on every surviving cell
    assert all(r["weight_q"] > 0 for r in rows)


# ----------------------------------------------------- catalog transactions


def test_catalog_commit_concurrency_no_lost_updates():
    from nibbler_spark.operators.snapshots import (
        catalog_commit,
        catalog_latest,
        catalog_read,
    )

    cat = tempfile.mkdtemp(prefix="nibbler-cat-conc-")
    os.rmdir(cat)
    n_threads = 8
    got: list[int] = []
    barrier = threading.Barrier(n_threads)

    def worker(i: int) -> None:
        barrier.wait()
        ver = catalog_commit(
            cat, {"t": {"dir": f"/d{i}", "snapshot_id": i}}
        )
        got.append(ver)

    threads = [
        threading.Thread(target=worker, args=(i,)) for i in range(n_threads)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    # every commit survived under a distinct version; none overwritten
    assert sorted(got) == list(range(n_threads))
    assert catalog_latest(cat) == n_threads - 1
    pinned = {catalog_read(cat, v)["t"]["snapshot_id"] for v in got}
    assert pinned == set(range(n_threads))


# --------------------------------------------------------------- CDC merge


def test_merge_into_snapshot_is_idempotent_for_absolute_changes(
    spark, sf_dir
):
    import shutil

    from nibbler_spark.operators.snapshots import (
        merge_into_snapshot,
        read_snapshot,
        write_snapshot,
    )

    table = tempfile.mkdtemp(prefix="nibbler-mergeidem-")
    shutil.rmtree(table)
    os.makedirs(table)
    base = spark.range(20).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    write_snapshot(base, table)
    changes = spark.range(5).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 2 == 0, F.lit("U"))
        .otherwise(F.lit("D"))
        .alias("op"),
        F.lit(777).cast("bigint").alias("v"),
    )
    merge_into_snapshot(spark, table, changes, key="k", value_cols=["v"])
    once = sorted(
        (r["k"], r["v"]) for r in read_snapshot(spark, table).collect()
    )
    # replaying the same absolute-value change set must be a no-op on
    # table STATE (the exactly-once argument ext_stream_cdc_apply makes)
    merge_into_snapshot(spark, table, changes, key="k", value_cols=["v"])
    twice = sorted(
        (r["k"], r["v"]) for r in read_snapshot(spark, table).collect()
    )
    assert once == twice


# ------------------------------------------------------- corpus statistics


def test_corpus_statistics_ranges(spark, sf_dir):
    rows = _run(spark, sf_dir, "ext_corpus_statistics").collect()
    assert rows
    for r in rows:
        assert 0 < r["type_token_ratio"] <= 1
        assert 0 <= r["simpson_index"] < 1
        # Zipf slope of a natural-ish corpus is negative
        assert r["zipf_slope"] < 0


# ----------------------------------------------- KMV mergeability property


def test_kmv_merge_property_pure_python():
    """k-smallest-of-union == k-smallest of (k-smallest(A) ∪
    k-smallest(B)) — the identity both ext_kmv_theta_setops and the
    streaming union (i27) lean on, checked over random splits."""
    import hashlib
    import random

    rng = random.Random(1234)
    k = 64
    for _ in range(50):
        universe = [
            int(hashlib.md5(str(x).encode()).hexdigest()[:12], 16)
            for x in rng.sample(range(100000), rng.randint(10, 800))
        ]
        cut = rng.randint(0, len(universe))
        a, b = set(universe[:cut]), set(universe[cut:])
        sk = lambda s: sorted(s)[:k]
        merged = sorted(set(sk(a)) | set(sk(b)))[:k]
        direct = sk(a | b)
        assert merged == direct


# --------------------------------------------- IVF sweep / PSI / frame dedup


def test_ivf_sweep_invariants(spark, sf_dir):
    rows = sorted(
        _run(spark, sf_dir, "ext_ivf_nprobe_sweep").collect(),
        key=lambda r: r["nprobe"],
    )
    assert [r["nprobe"] for r in rows] == [1, 2, 4, 10]
    assert all(r["monotone_ok"] and r["full_probe_exact"] for r in rows)
    # candidate volume grows with probe depth; full probe sees all
    cands = [r["n_candidates"] for r in rows]
    assert cands == sorted(cands)
    assert rows[-1]["hits"] == 10 and rows[-1]["recall_at_10"] == 1.0


def test_psi_symmetric_split_shows_no_drift(spark, sf_dir):
    rows = _run(spark, sf_dir, "ext_psi_drift").collect()
    assert len(rows) == 10
    # the two halves of a homogeneous synthetic month must not drift
    assert all(not r["drift_detected"] for r in rows)
    assert abs(rows[0]["psi_total"]) < 0.1


def test_video_frame_dedup_finds_cross_doc_duplicates(spark, sf_dir):
    rows = _run(spark, sf_dir, "ext_video_frame_dedup").collect()
    total = sum(r["class_size"] * r["n_classes"] for r in rows)
    uniq = sum(r["n_classes"] for r in rows)
    assert total > uniq  # the fixture plants genuine duplicate frames


def test_null_skew_join_nulls_never_enter_the_join(spark, sf_dir):
    df = _run(spark, sf_dir, "ext_null_skew_join")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # the join's fact side must exclude null keys before the exchange
    # (Catalyst pushes the isNotNull through the CASE that creates k),
    # and the union branch must be the isnull complement
    assert "ELSE isnotnull(" in plan
    assert "ELSE isnull(" in plan
