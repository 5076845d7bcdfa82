"""Cross-row invariants for the round-4 continuation operators — the
properties their hash oracles cannot express."""

from __future__ import annotations

from pyspark.sql import functions as F

from nibbler_spark.queries import load_all

SPECS = load_all()


def test_mann_whitney_u_sum_invariant(spark, sf_dir):
    """U1 + U2 = n1*n2 exactly (doubled form), and the rank-sum stays
    inside its feasible integer range."""
    row = SPECS["ext_mann_whitney_u"].spark(spark, sf_dir).first()
    assert row["two_u1"] + row["two_u2"] == 2 * row["n1"] * row["n2"]
    n1, n = row["n1"], row["n1"] + row["n2"]
    assert n1 * (n1 + 1) <= row["two_r1"] <= n1 * (2 * n - n1 + 1)


def test_containment_excerpt_pairs_all_found(spark, sf_dir):
    """Every planted excerpt (base doc_id + 1e9) must report its base
    document among its containment partners — recall 1.0 on the
    planted near-supersets."""
    out = SPECS["ext_containment_dedup"].spark(spark, sf_dir)
    got = {
        (r["doc_a"], r["doc_b"])
        for r in out.where(F.col("doc_a") >= 1000000000).collect()
    }
    from nibbler_spark.sources import load_table

    planted = (
        load_table(spark, sf_dir, "documents")
        .where(
            (F.size(F.split("text", " ")) >= 20)
            & (F.col("doc_id") % 31 == 0)
        )
        .select("doc_id")
        .collect()
    )
    for r in planted:
        assert (r["doc_id"] + 1000000000, r["doc_id"]) in got


def test_ahash_planted_pairs_found_and_close(spark, sf_dir):
    """Every (23k, 23k+1) pair present in the corpus appears with
    Hamming distance <= 3 (the perturbation flips at most 3 bits)."""
    out = SPECS["ext_image_ahash_neardup"].spark(spark, sf_dir)
    rows = out.collect()
    planted = [
        r for r in rows if r["doc_b"] == r["doc_a"] + 1 and r["doc_a"] % 23 == 0
    ]
    assert planted, "no planted pairs at this sf"
    assert all(r["hamming"] <= 3 for r in planted)
    from nibbler_spark.sources import load_table

    ids = {
        r["doc_id"]
        for r in load_table(spark, sf_dir, "documents")
        .where((F.col("doc_id") % 23).isin(0, 1))
        .select("doc_id")
        .collect()
    }
    expect = {i for i in ids if i % 23 == 0 and i + 1 in ids}
    assert {r["doc_a"] for r in planted} == expect


def test_dim_truncation_recall_anchor(spark, sf_dir):
    """recall@10 is exactly 1.0 at full dimension and weakly increases
    as a trend anchor: the full-dim row must be the maximum."""
    rows = SPECS["ext_dim_truncation_sweep"].spark(spark, sf_dir).collect()
    by_d = {r["d"]: r["recall_at_10"] for r in rows}
    assert by_d[64] == 1.0
    assert max(by_d.values()) == by_d[64]


def test_calibration_ece_bins_partition(spark, sf_dir):
    """Bins partition the score domain: totals equal the orders count
    and every gap is bounded by its bin mass on the 1e6 grid."""
    rows = SPECS["ext_calibration_ece"].spark(spark, sf_dir).collect()
    from nibbler_spark.sources import load_table

    n = load_table(spark, sf_dir, "orders").count()
    assert sum(r["n"] for r in rows) == n
    for r in rows:
        assert 0 <= r["gap_scaled"] <= 1000000 * r["n"]


def test_kaplan_meier_curve_monotone_nonincreasing(spark, sf_dir):
    rows = SPECS["ext_kaplan_meier"].spark(spark, sf_dir).collect()
    assert rows, "empty survival curve"
    lns = [r["ln_s_scaled"] for r in rows]
    assert all(a >= b for a, b in zip(lns, lns[1:]))
    assert all(r["d_events"] >= 1 for r in rows)
    assert all(r["n_risk"] > r["d_events"] for r in rows)


def test_markov_two_step_rows_sum_to_one(spark, sf_dir):
    """Each from-state's two-step probabilities must sum to 1 up to
    the 1e-15 grid loss (≤ 25 ulps of the grid per row)."""
    rows = SPECS["ext_markov_two_step"].spark(spark, sf_dir).collect()
    by_from: dict = {}
    for r in rows:
        by_from.setdefault(r["from_type"], 0)
        by_from[r["from_type"]] += r["p2_scaled"]
    assert len(by_from) == 5
    for total in by_from.values():
        assert 10**15 - 30 <= total <= 10**15


def test_shapley_efficiency_axiom(spark, sf_dir):
    """Σ_j φ_j = v(all channels) − v(no channels) — exactly, in the
    scaled-integer domain."""
    from pyspark.sql import functions as F

    from nibbler_spark.sources import load_table

    out = SPECS["ext_shapley_attribution"].spark(spark, sf_dir).collect()
    total = sum(r["phi_scaled_24"] for r in out)
    e = load_table(spark, sf_dir, "events")
    has = lambda t: F.max(F.when(F.col("event_type") == t, 1).otherwise(0))
    per_user = e.groupBy("user_id").agg(
        (
            has("click") + 2 * has("view") + 4 * has("signup")
            + 8 * has("error")
        ).alias("mask"),
        has("purchase").alias("converted"),
    )
    cells = {
        r["mask"]: (r["n"], r["c"])
        for r in per_user.groupBy("mask")
        .agg(F.count("*").alias("n"), F.sum("converted").alias("c"))
        .collect()
    }
    import math

    def v(mask):
        if mask not in cells:
            return 0
        n, c = cells[mask]
        return math.floor(c / n * 1e12)

    assert total == 24 * (v(15) - v(0))


def test_als_round_solves_normal_equations(spark, sf_dir):
    """Each emitted factor pair must satisfy (Σqqᵀ + λI)p = Σq,
    recomputed independently from the interaction data."""
    rows = SPECS["ext_als_round"].spark(spark, sf_dir).collect()
    assert rows
    from nibbler_spark.sources import load_table
    from pyspark.sql import functions as F

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_partkey") % 3 == 0
    ).select("l_orderkey", "l_partkey")
    inter = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(F.col("o_custkey").alias("u"), F.col("l_partkey").alias("i"))
        .distinct()
        .collect()
    )
    by_u: dict = {}
    for r in inter:
        by_u.setdefault(r["u"], []).append(r["i"])
    for r in rows[:5]:
        items = by_u[r["user_id"]]
        q = [((i * 2654435761) % 1000, (i * 40503) % 1000) for i in items]
        a = sum(x * x for x, _ in q) + 100000
        b = sum(x * y for x, y in q)
        d = sum(y * y for _, y in q) + 100000
        b0 = sum(x for x, _ in q) * 1000
        b1 = sum(y for _, y in q) * 1000
        p0, p1 = r["p0"], r["p1"]
        assert abs(a * p0 + b * p1 - b0) <= 1e-3 * max(1, abs(b0))
        assert abs(b * p0 + d * p1 - b1) <= 1e-3 * max(1, abs(b1))
