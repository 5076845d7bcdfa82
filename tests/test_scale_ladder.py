"""Growth-exponent pins for the dedup/graph flagships (r4 verdict #1).

BENCH_SF1.json records the wall-time ladder (generated sf0.1 → sf1 via
tools/gen_scale_data.py; measured 3.1x–5.6x for 10x docs, gate 12x).
Wall time is environment-dependent, so CI pins the machine-independent
quantity instead: the CARDINALITY growth of the intermediates that
dominate each flagship's cost.  For a corpus whose shingle space scales
with n (the generator's density-matched vocab — the 100 TB regime; see
gen_scale_data.py's module docstring for why a fixed fixture vocab
makes ANY exact pair set quadratic), these must grow near-linearly:

- df-capped 5-shingle graph EDGES (ext_label_propagation /
  ext_kcore_decomposition cost driver),
- exact 3-shingle J >= 0.6 PAIRS (k05_minhash_lsh's recall baseline and
  the true near-dup output size),
- duplicated 8-gram GROUPS (ext_substring_span_dedup's shuffle volume).

Rungs: n=2,000 vs n=8,000 (4x).  Pin: exponent = log4(c2/c1) <= 1.35
(near-linear with room for the planted-pair second-order term), plus
strict growth (the proxy is not degenerate/constant).  Sub-linear
exponents are expected and fine: the random-collision component of the
5-shingle graph scales as n·(instances/space) = n^(1/3) once the vocab
density-matches — cost growing *slower* than data is exactly the 100 TB
property being pinned.
"""

from __future__ import annotations

import math
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from tools.gen_scale_data import write_sf

N_SMALL, N_BIG = 2_000, 8_000
EXP_MAX = 1.35


@pytest.fixture(scope="module")
def rungs():
    base = tempfile.mkdtemp(prefix="nibbler-ladder-")
    small = os.path.join(base, "small")
    big = os.path.join(base, "big")
    write_sf(N_SMALL / 50_000, small)
    write_sf(N_BIG / 50_000, big)
    return small, big


def _exponent(c_small: int, c_big: int) -> float:
    assert c_small > 0 and c_big > 0
    return math.log(c_big / c_small) / math.log(N_BIG / N_SMALL)


def _assert_near_linear(c_small: int, c_big: int, what: str) -> None:
    e = _exponent(c_small, c_big)
    assert c_big > c_small, f"{what}: proxy did not grow ({c_small} -> {c_big})"
    assert e <= EXP_MAX, (
        f"{what}: counts {c_small} -> {c_big}, growth exponent {e:.2f} "
        f"> {EXP_MAX} (superlinear)"
    )


def test_dfcap_graph_edges_near_linear(spark, rungs):
    from nibbler_spark.queries.llm_dedup import _dfcap_shingle_digraph

    small, big = rungs
    counts = [
        _dfcap_shingle_digraph(spark, d)[1].count() for d in (small, big)
    ]
    _assert_near_linear(counts[0], counts[1], "df-capped 5-shingle edges")


def test_exact_jaccard_pairs_near_linear(spark, rungs):
    from nibbler_spark.queries.llm_dedup import exact_jaccard_pairs

    small, big = rungs
    counts = []
    for d in (small, big):
        doc = spark.read.parquet(os.path.join(d, "documents.parquet"))
        toks = F.split("text", " ")
        sh = F.array_distinct(
            F.when(
                F.size(toks) >= 3,
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - 2),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at(toks, i),
                        F.element_at(toks, i + 1),
                        F.element_at(toks, i + 2),
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        )
        t = doc.select("doc_id", sh.alias("ts"))
        counts.append(
            exact_jaccard_pairs(t, threshold=0.6, df_cap=1000).count()
        )
    _assert_near_linear(counts[0], counts[1], "exact J>=0.6 pairs")


def test_duplicated_8gram_groups_near_linear(spark, rungs):
    small, big = rungs
    counts = []
    for d in (small, big):
        doc = spark.read.parquet(os.path.join(d, "documents.parquet"))
        t = doc.select("doc_id", F.split("text", " ").alias("t"))
        g = t.select(
            F.explode(
                F.expr(
                    "CASE WHEN size(t) >= 8 THEN "
                    "transform(sequence(1, size(t) - 7), "
                    "i -> xxhash64(array_join(slice(t, i, 8), ' '))) "
                    "ELSE CAST(array() AS ARRAY<BIGINT>) END"
                )
            ).alias("gh")
        )
        counts.append(
            g.groupBy("gh")
            .agg(F.count("*").alias("c"))
            .where(F.col("c") >= 2)
            .count()
        )
    _assert_near_linear(counts[0], counts[1], "duplicated 8-gram groups")


def test_simhash64_band_candidates_near_linear_16bit_saturates(spark, rungs):
    """The r5 ladder classifies `ext_simhash_banded_pairs` (16-bit) as
    candidate-bound-exact with `ext_simhash64_banded_pairs` as its scale
    path.  Pin the machine-independent fact behind that classification:
    the 16-bit band join's candidate volume grows ~quadratically (the
    65,536-value fingerprint space saturates as docs are added) while
    the 64-bit band join's stays near-linear (random band collisions
    ~ n^2/65536 per band value are negligible; survivors are genuine
    near-dups).  Measured at these rungs: exponent ~1.97 vs ~0.69."""
    from nibbler_spark.queries.llm_dedup import (
        simhash_band_pairs,
        simhash_fingerprints,
    )

    small, big = rungs
    counts = {}
    for nbits, nbands, band_bits in ((16, 4, 4), (64, 4, 16)):
        counts[nbits] = []
        for d in (small, big):
            sims = simhash_fingerprints(spark, d, nbits, "s")
            _, cand = simhash_band_pairs(
                sims, "s", nbands=nbands, band_bits=band_bits
            )
            counts[nbits].append(cand.count())
    _assert_near_linear(counts[64][0], counts[64][1], "64-bit band candidates")
    e16 = _exponent(counts[16][0], counts[16][1])
    assert e16 > 1.5, (
        f"16-bit band candidates grew with exponent {e16:.2f} <= 1.5 — "
        "saturation premise of the candidate-bound classification not met"
    )
    assert counts[64][1] < counts[16][1], (
        "64-bit banding should produce strictly fewer candidates than "
        f"16-bit at the big rung ({counts[64][1]} vs {counts[16][1]})"
    )


@pytest.mark.parametrize(
    "qname",
    [
        "k05_minhash_lsh",
        "ext_label_propagation",
        "ext_substring_span_dedup",
        # r7 (verdict #3): the llm-vectors quartet's cost drivers are
        # compute-side (probe-bounded pair volumes, measured in
        # BENCH_SF1); their SHUFFLE volume must stay near-linear —
        # kmeans++ carries only (vec_id, key) reductions, symspell's
        # delete-1 blocks are vocab-bound.
        # silhouette AND medoid (probe-sample rework, r8) are pinned
        # separately below: their shuffle volume is FLAT in the corpus
        # (fixed ~64-probe broadcast), which the strict growth
        # assertion here would reject as a degenerate proxy
        "ext_kmeanspp_seeding",
        "ext_symspell_typo_recovery",
    ],
)
def test_flagship_shuffle_volume_near_linear_no_disk_spill(
    spark, rungs, qname
):
    """Machine-independent companion to BENCH_SF1's wall-time ladder:
    whole-query SHUFFLE WRITE volume (every job, incl. localCheckpoint
    rounds — nibbler_spark/stage_metrics.py) must grow near-linearly
    with the corpus, and nothing may spill to disk.  Shuffle volume is
    the 100 TB cost driver; wall time is the environment-dependent
    shadow of it.  Compressed shuffle sizes wobble slightly run-to-run,
    so the pin allows the same 1.35 exponent as the cardinality pins."""
    from nibbler_spark.queries import load_all
    from nibbler_spark.stage_metrics import measure_stages

    spec = load_all()[qname]
    small, big = rungs
    vols = []
    for d in (small, big):
        _, m = measure_stages(spark, lambda: spec.spark(spark, d).collect())
        assert m["disk_spill_bytes"] == 0, (
            f"{qname} spilled {m['disk_spill_bytes']}B to disk at {d}"
        )
        vols.append(m["shuffle_write_bytes"])
    _assert_near_linear(vols[0], vols[1], f"{qname} shuffle write bytes")


def test_dbscan_adaptive_eps_background_sublinear_cluster_mass_quadratic(
    rungs,
):
    """The DBSCAN decomposition pinned machine-independently (the r5
    audit finding): with density-relative eps² = minPts·AREA div (8n),
    BACKGROUND neighbor pairs must stay sub-linear (the densification
    fix), while planted-cluster clique pairs grow ~quadratically with
    membership — the intrinsic cluster-mass term any exact density
    clusterer pays.  Counts computed exactly in DuckDB (the query's own
    integer fixture arithmetic)."""
    import duckdb

    small, big = rungs
    counts = {}
    for d in (small, big):
        q = f"""
WITH pts AS (
  SELECT event_id,
         event_id % 67 < 2 AS planted,
         CASE WHEN event_id % 67 < 2 THEN
           (CASE event_id % 5 WHEN 0 THEN 10000 WHEN 1 THEN 30000
                 WHEN 2 THEN 50000 WHEN 3 THEN 70000 ELSE 90000 END)
           + CAST(('0x' || substr(md5('x:' || event_id), 1, 12)) AS BIGINT) % 300
         ELSE CAST(('0x' || substr(md5('x:' || event_id), 1, 12)) AS BIGINT) % 100000 END AS xi,
         CASE WHEN event_id % 67 < 2 THEN
           (CASE event_id % 5 WHEN 0 THEN 10000 WHEN 1 THEN 70000
                 WHEN 2 THEN 20000 WHEN 3 THEN 80000 ELSE 30000 END)
           + CAST(('0x' || substr(md5('y:' || event_id), 1, 12)) AS BIGINT) % 300
         ELSE CAST(('0x' || substr(md5('y:' || event_id), 1, 12)) AS BIGINT) % 100000 END AS yi
  FROM '{d}/events.parquet'
  WHERE event_id % 67 < 2 OR event_id % 31 = 0
),
sc AS (SELECT 40000000000 // (8 * COUNT(*)) AS eps2 FROM pts)
SELECT a.planted AND b.planted AS both_planted, COUNT(*) AS c
FROM pts a, pts b, sc
WHERE (a.xi-b.xi)*(a.xi-b.xi)+(a.yi-b.yi)*(a.yi-b.yi) <= sc.eps2
GROUP BY 1
"""
        counts[d] = dict(duckdb.sql(q).fetchall())
    e_bg = _exponent(counts[small][False], counts[big][False])
    e_pl = _exponent(counts[small][True], counts[big][True])
    assert e_bg <= 1.0, f"background pairs superlinear: exp {e_bg:.2f}"
    assert e_pl >= 1.8, (
        f"planted clique pairs not ~quadratic (exp {e_pl:.2f}) — the "
        "cluster-mass classification premise would be stale"
    )


def test_pmh_band_candidates_near_linear(spark, rungs):
    """i42_stream_minhash_neardup / ext_minhash_lsh_portable cost
    driver (r6 ladder rows): the md5-minhash band join's candidate
    volume — sum of C(n,2) over occupied (band_id, v1, v2) buckets.
    The 48-bit minhash space never saturates, so collisions are either
    genuine near-dups (linear: planted pairs grow with n) or vanishing
    random ones; the streaming variant probes exactly these buckets as
    keyed state, so this count is also its per-epoch work bound."""
    from nibbler_spark.queries.llm_dedup import (
        pmh_band_structs,
        pmh_shingles,
    )

    small, big = rungs
    counts = []
    for d in (small, big):
        doc = spark.read.parquet(os.path.join(d, "documents.parquet"))
        ts = pmh_shingles(F.col("text"))
        bands = (
            doc.select("doc_id", ts.alias("ts"))
            .where(F.size("ts") >= 1)
            .select(F.explode(pmh_band_structs(F.col("ts"))).alias("b"))
            .groupBy("b.band_id", "b.v1", "b.v2")
            .agg(F.count("*").alias("c"))
        )
        row = bands.agg(
            F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("pairs")
        ).collect()[0]
        counts.append(int(row["pairs"] or 0))
    _assert_near_linear(counts[0], counts[1], "pmh band candidate pairs")


def test_ann_coarse_volume_linear_per_query(spark, rungs):
    """ext_ann_rerank_pipeline (r6 ladder row, candidate-bound class):
    the funnel's intrinsic work is its coarse scored-pair volume =
    queries x docs-in-2-probed-cells.  On the ladder the query set is
    sampled FROM the corpus (vec_id % 97), so TOTAL volume grows
    ~n^2 by construction; the production-relevant quantity is the
    PER-QUERY volume (probed 2/10 of the corpus), which must stay
    near-linear in corpus size — that is what makes the IVF probe an
    ANN index rather than a brute-force scan."""
    from tools.scale_ladder import _ann_coarse_pairs

    small, big = rungs
    per_query = []
    for d in (small, big):
        emb = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
        n_q = emb.where(F.col("vec_id") % 97 == 0).count()
        assert n_q > 0
        per_query.append(_ann_coarse_pairs(spark, d) / n_q)
    # corpus rung ratio is 4x (embeddings scale with sf too)
    e = math.log(per_query[1] / per_query[0]) / math.log(N_BIG / N_SMALL)
    assert per_query[1] > per_query[0]
    assert e <= EXP_MAX, (
        f"per-query coarse volume exponent {e:.2f} > {EXP_MAX}: the "
        "probe is not pruning cells (brute-force regression)"
    )


def test_margin_funnel_candidates_prune(spark, rungs):
    """ext_margin_pair_mining (r7 fix of the r6 verdict's scale-killer):
    candidate generation must be the nprobe=2-of-16-cell IVF funnel,
    never the pool cross product. Machine-independent pin: the
    candidate table is a small fraction of |A| x |B| at BOTH rungs
    (hash-seeded cells give ~2/16 in expectation; 0.35 allows cell
    skew), and it grows with the pools (the funnel is not degenerate)."""
    from nibbler_spark.queries.llm_vectors import margin_candidate_frame

    small, big = rungs
    cands = []
    for d in (small, big):
        emb = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
        na = emb.where(F.col("label") == 0).count()
        nb = emb.where(F.col("label") == 1).count()
        c = margin_candidate_frame(spark, d).count()
        assert c > 0
        assert c <= 0.35 * na * nb, (
            f"{d}: {c} candidates vs {na}x{nb} pools — the funnel is "
            "not pruning (pool-scale cross product regression)"
        )
        cands.append(c)
    assert cands[1] > cands[0]


@pytest.mark.parametrize(
    "qname", ["ext_silhouette_sampled", "ext_medoid_exemplars"]
)
def test_probe_sampled_shuffle_flat_no_spill(spark, rungs, qname):
    """The probe-sample family's designed scale shape is STRONGER than
    near-linear: the probe set is O(1) in the corpus (count-derived
    modulus — silhouette's r7 fix, medoid's r8 rework per the r7
    verdict #1), scores are computed ROW-LOCALLY against the broadcast
    probe array, so whole-query shuffle volume is ~FLAT as the corpus
    grows. Pin flatness (within 2x wobble for compressed sizes) and
    zero spill."""
    from nibbler_spark.queries import load_all
    from nibbler_spark.stage_metrics import measure_stages

    spec = load_all()[qname]
    small, big = rungs
    vols = []
    for d in (small, big):
        _, m = measure_stages(spark, lambda: spec.spark(spark, d).collect())
        assert m["disk_spill_bytes"] == 0
        vols.append(m["shuffle_write_bytes"])
    assert vols[1] <= 2 * vols[0], (
        f"{qname} shuffle grew with the corpus ({vols[0]} -> "
        f"{vols[1]}B): the probe set is no longer O(1)"
    )


def test_medoid_probe_sets_are_fixed_size(spark, rungs):
    """Machine-independent premise of medoid's near-linear ladder row
    (r7 verdict #1 fix): the per-label probe sample stays ~64 rows at
    BOTH rungs even though label populations grew 4x — the modulus is
    count-derived, not a fixed percentage."""
    from nibbler_spark.sources import load_table

    small, big = rungs
    per_rung = []
    for d in (small, big):
        e = load_table(spark, d, "embeddings")
        lc = e.groupBy("label").agg(F.count("*").alias("n"))
        probes = (
            e.join(F.broadcast(lc), "label")
            .where(
                F.col("vec_id")
                % F.greatest(F.lit(1), F.expr("n DIV 64"))
                == 0
            )
            .groupBy("label")
            .count()
        )
        counts = [r["count"] for r in probes.collect()]
        per_rung.append(counts)
    for counts in per_rung:
        assert max(counts) <= 130, counts  # ~64, bounded wobble
    # 4x the corpus must NOT mean 4x the probes
    assert max(per_rung[1]) <= 2 * max(per_rung[0]) + 64, per_rung


def test_margin_candidate_growth_sqrt_blocked(spark, rungs):
    """Machine-independent premise of margin mining's candidate gate
    (r7 verdict #2 fix): with the ceil(sqrt(|B|)) codebook the cell
    equi-join's output grows ~n^1.5, never the ~n^2/k of a fixed-k
    codebook.  Allow 1.75 at this 4x mini-rung for assignment skew."""
    from nibbler_spark.queries.llm_vectors import margin_candidate_frame

    small, big = rungs
    counts = [
        margin_candidate_frame(spark, d).count() for d in (small, big)
    ]
    e = _exponent(counts[0], counts[1])
    assert counts[1] > counts[0], counts
    assert e <= 1.75, (
        f"margin candidates {counts[0]} -> {counts[1]} grew with "
        f"exponent {e:.2f} > 1.75 — the sqrt-blocked funnel premise "
        "does not hold"
    )


def test_finalize_candidate_gates_logic():
    """The r7 verdict #3 gate itself: candidate-bound rows may not
    absorb quadratic candidate GROWTH via a cheap per-candidate cost —
    exponent > gate with a self-referential scale_path must fail;
    a genuinely substitutable near-linear scale path, or a bounded
    exponent, passes."""
    from tools.scale_ladder import finalize_candidate_gates

    rows = {
        # quadratic growth, scale_path is itself -> must FAIL
        "q_quad_self": {
            "scale_class": "candidate-bound-exact",
            "scale_path": "q_quad_self",
            "candidate_ratio": 100.0,
            "ratio_per_candidate": 0.1,
        },
        # quadratic growth but a real near-linear substitute -> pass
        "q_quad_sub": {
            "scale_class": "candidate-bound-exact",
            "scale_path": "q_linear",
            "candidate_ratio": 100.0,
            "ratio_per_candidate": 0.1,
        },
        # sqrt-blocked growth (n^1.5) -> pass on its own exponent
        "q_sqrt": {
            "scale_class": "candidate-bound-exact",
            "scale_path": "q_sqrt",
            "candidate_ratio": 31.6,
            "ratio_per_candidate": 0.5,
        },
        # bounded growth but per-candidate cost blew up -> must FAIL
        "q_costly": {
            "scale_class": "candidate-bound-exact",
            "scale_path": "q_linear",
            "candidate_ratio": 10.0,
            "ratio_per_candidate": 2.0,
        },
        "q_linear": {"scale_class": "near-linear", "near_linear": True},
    }
    finalize_candidate_gates(rows)
    assert rows["q_quad_self"]["near_linear"] is False
    assert rows["q_quad_self"]["candidate_growth_ok"] is False
    assert rows["q_quad_sub"]["near_linear"] is True
    assert rows["q_sqrt"]["near_linear"] is True
    assert rows["q_sqrt"]["candidate_exponent"] == 1.5
    assert rows["q_costly"]["near_linear"] is False


def test_scale_path_waiver_self_enforcing():
    """r8 verdict #3: a dangling waiver must FAIL the ladder.  A
    candidate-bound row over the growth gate whose named scale_path is
    (a) absent from the merged row set, or (b) present but itself
    regressed to non-near-linear, may not pass — a future regression in
    the substitute (e.g. k05) may not leave the waiving row (k04) green."""
    from tools.scale_ladder import finalize_candidate_gates

    def quad_row(path):
        return {
            "scale_class": "candidate-bound-exact",
            "scale_path": path,
            "candidate_ratio": 77.6,  # 10x data -> exponent 1.89 (k04 r8)
            "ratio_per_candidate": 0.1,
        }

    # (a) target missing from the merged row set entirely
    rows = {"q_waived": quad_row("q_gone")}
    finalize_candidate_gates(rows)
    assert rows["q_waived"]["scale_path_ok"] is False
    assert rows["q_waived"]["near_linear"] is False

    # (b) target present but itself measured NON-near-linear
    rows = {
        "q_waived": quad_row("q_regressed"),
        "q_regressed": {"scale_class": "near-linear", "near_linear": False},
    }
    finalize_candidate_gates(rows)
    assert rows["q_waived"]["scale_path_ok"] is False
    assert rows["q_waived"]["near_linear"] is False

    # (c) target present but itself candidate-bound (a waiver may not
    # chain onto another waived row)
    rows = {
        "q_waived": quad_row("q_also_bound"),
        "q_also_bound": {
            "scale_class": "candidate-bound-exact",
            "scale_path": "q_also_bound",
            "candidate_ratio": 10.0,
            "ratio_per_candidate": 0.1,
        },
    }
    finalize_candidate_gates(rows)
    assert rows["q_waived"]["near_linear"] is False

    # healthy waiver still passes and is marked
    rows = {
        "q_waived": quad_row("q_ok"),
        "q_ok": {"scale_class": "near-linear", "near_linear": True},
    }
    finalize_candidate_gates(rows)
    assert rows["q_waived"]["scale_path_ok"] is True
    assert rows["q_waived"]["near_linear"] is True
