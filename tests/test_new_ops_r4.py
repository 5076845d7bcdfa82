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
