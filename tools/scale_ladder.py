#!/usr/bin/env python3
"""Scale-factor ladder for the dedup/graph flagships (r4 verdict #1).

Measures the flagship operators whose 100 TB claims were previously
plan-asserted only, at generated sf0.1 (5,000 docs — distributionally
matched to the real driver sf0.1) and generated sf1 (50,000 docs,
density-matched vocab; see tools/gen_scale_data.py), and records wall
times + the growth ratio into BENCH_SF1.json.

Near-linear gate: a 10x corpus should cost <= ~12x wall time (linear
plus shuffle/log factors).  Queries returning bounded-mode booleans must
stay True at every rung — the sf1 run is a correctness check too.

Candidate-bound exact operators: two flagships are EXACT baselines whose
intrinsic work is the candidate-pair volume, which their own blocking
scheme cannot keep linear on this corpus — `k04_jaccard_pairs` (exact
Jaccard: docs-per-(lang,source,size-band) block grows with n, so
candidates grow ~n^2/blocks) and `ext_simhash_banded_pairs` (its oracle
pins a 16-bit fingerprint space that 50k docs saturate — the hamming<=3
OUTPUT itself grows ~n^2).  For those the ladder measures the candidate
volume at both rungs and gates on wall-time-per-candidate instead of
wall-time-per-input-row, and records the registered SCALE-PATH operator
(`k05_minhash_lsh` / `ext_simhash64_banded_pairs`) that keeps total work
linear at 100 TB.  Both classifications appear explicitly in the output.

Run:  python tools/scale_ladder.py            (~a few minutes)
      python tools/scale_ladder.py k05_minhash_lsh   (subset; merges
      into the existing BENCH_SF1.json instead of clobbering it)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

FLAGSHIPS = [
    # the five the r4 verdict named
    "k05_minhash_lsh",
    "ext_label_propagation",
    "ext_kcore_decomposition",
    "ext_containment_dedup",
    "ext_substring_span_dedup",
    # r5 extension: every other documents-only dedup/training flagship
    "k04_jaccard_pairs",
    "ext_simhash_banded_pairs",
    "ext_simhash64_banded_pairs",
    "ext_paragraph_dedup",
    "ext_minhash_lsh_portable",
    "ext_decontaminate_ngram",
    "ext_sequence_packing",
    "ext_training_data_pipeline",
    # events- and embeddings-based flagships (generator r5 additions)
    "ext_sessionize_batch",
    "ext_behavioral_analytics_pipeline",
    "ext_embedding_neardup",
    "k06_cosine_topk",
    # r6 (verdict #4): the retrieval and streaming flagships join the
    # ladder — the two scale-with-corpus queries that had no sf1 row.
    "i42_stream_minhash_neardup",
    "ext_ann_rerank_pipeline",
    # r6 (verdict #1 follow-through): the reworked day-grain rollup —
    # 10x denser events over the same 30-day span; the merge cost is
    # per-partition aggregate state, so wall time should be far
    # sub-linear in row count.
    "ext_incremental_rollup",
    # r6 session 2: the new tokenizer/selection/streaming flagships —
    # unigram segmentation is vocab-bound after the one word-table
    # shuffle, DSIR is fixed-feature-space scoring, and the online
    # packer's state is one long per language.
    "ext_unigram_lm_segmentation",
    "ext_dsir_importance_weights",
    "i43_stream_grouped_packing",
    # r6 session 3: the prefix-doubling suffix array — the suffix table
    # is 48x docs and every doubling round is window + dense-rank +
    # keyed join, so wall time should track n log-ish; the top-30 LCP
    # output is constant-size.
    "ext_suffix_array_lcp",
    # r6 session 3, second half: held-out LM scoring (two corpus scans
    # + vocab-scale keyed joins), greedy coverage (5 anti-join rounds
    # over the distinct-shingle table), online drift (fixed
    # 1024-bucket state; cost is the token->bucket map per epoch).
    "ext_kn_heldout_perplexity",
    "ext_submodular_coverage",
    "i46_stream_kl_drift",
    # r7 (verdict #3): the r6s3 llm-vectors quartet + SymSpell.
    # kmeans++ is 4 rounds of broadcast-center distance passes
    # (linear per round); silhouette probes a FIXED ~64-row set
    # against the corpus (linear); symspell's delete-1 blocking is
    # corpus-vocab-bound. medoid and margin mining are measured
    # per-candidate below.
    "ext_kmeanspp_seeding",
    "ext_silhouette_sampled",
    "ext_symspell_typo_recovery",
    "ext_medoid_exemplars",
    "ext_margin_pair_mining",
    # r7 additions: the corpus-scaling new operators — glove's pair
    # stream is head-filtered before the exchange, SGNS is row-local
    # pairs + a bucketed interval join, span corruption is one map +
    # one aggregate, the online funnel's state is O(users), and the
    # online CMS / bottom-k sketches hold O(1) state.
    "ext_glove_cooccurrence",
    "ext_skipgram_negative_sampling",
    "ext_span_corruption_prep",
    "ext_window_funnel",
    "i49_stream_window_funnel",
    "i47_stream_countmin",
    # r7 batch 5: the self-referential pruning loop (3 rounds of
    # corpus-scale scoring against a shrinking kept list) and the two
    # remaining O(1)-state online monitors.
    "ext_iterative_quality_pruning",
    "i48_stream_bottomk_kmv",
    "i50_stream_length_moments",
]
GATE_RATIO = 12.0  # 10x data -> <= 12x wall (near-linear)
# candidate-bound gate: wall time may grow at most this much faster than
# the measured candidate-pair volume (constant per-candidate cost).
GATE_PER_WORK = 1.5


def _k04_candidate_pairs(spark, sf_dir: str) -> int:
    """Candidate-pair volume of k04's (lang, source, size-band) blocking:
    the number of pairs the equi-join materializes BEFORE the J >= 0.8
    filter.  Replicates the query's own blocking exactly (llm_dedup.py
    k04_jaccard_pairs)."""
    from pyspark.sql import functions as F

    from nibbler_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents")
    sz = F.size(F.array_distinct(F.split("text", " ")))
    t = d.select("doc_id", "lang", "source", sz.alias("sz"))

    def band_of(c):
        return F.floor(F.log(c.cast("double")) / F.log(F.lit(1.25))).cast(
            "int"
        )

    build = t.withColumn("band", band_of(F.col("sz")))
    lo = F.floor((4 * F.col("sz") + 4) / 5).cast("int")
    hi = F.floor(5 * F.col("sz") / 4).cast("int")
    probe = t.withColumn(
        "pband", F.explode(F.sequence(band_of(lo), band_of(hi)))
    )
    return (
        probe.alias("a")
        .join(
            build.alias("b"),
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.pband") == F.col("b.band"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .count()
    )


def _simhash16_candidate_pairs(spark, sf_dir: str) -> int:
    """Candidate-pair volume of the 16-bit simhash band join: sum of
    C(n,2) over (band_id, band_val) buckets — what the equi-join emits
    before dedup + the hamming filter."""
    from pyspark.sql import functions as F

    from nibbler_spark.queries.llm_dedup import (
        simhash_band_pairs,
        simhash_fingerprints,
    )

    sims = simhash_fingerprints(spark, sf_dir, 16, "simhash16")
    bands, _ = simhash_band_pairs(sims, "simhash16", nbands=4, band_bits=4)
    g = bands.groupBy("band_id", "band_val").count()
    row = g.agg(
        F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("pairs")
    ).collect()[0]
    return int(row["pairs"] or 0)


def _ann_coarse_pairs(spark, sf_dir: str) -> int:
    """Coarse-stage scored-pair volume of ext_ann_rerank_pipeline:
    sum over queries of the doc count in its 2 probed IVF cells — the
    quantity the funnel's cost is actually proportional to.  On the
    ladder this grows ~quadratically BY CONSTRUCTION (the query set is
    vec_id % 97 of the corpus, so queries grow with the rung); the
    per-QUERY volume (pairs / n_queries = probed 2/10 of the corpus)
    is the linear claim a fixed production workload sees, and the gate
    below normalizes by this measured volume rather than input rows."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from nibbler_spark.queries.llm_vectors import cosine
    from nibbler_spark.sources import load_table

    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select(
        "label", F.posexplode("embedding").alias("pos", "val")
    ).select(
        "label", "pos",
        F.floor(F.col("val").cast("double") * F.lit(1e10)).alias("v"),
    )
    cent = (
        ex.groupBy("label", "pos")
        .agg(
            ((F.sum("v").cast("double") / F.lit(1e10)) / F.count("v")).alias(
                "c"
            )
        )
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))),
                lambda s: s["c"],
            ).alias("centroid")
        )
    )
    q = e.where(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    w_probe = Window.partitionBy("qid").orderBy(
        F.col("csim").desc(), F.col("label")
    )
    probe = (
        cent.crossJoin(F.broadcast(q))
        .select(
            "qid",
            "label",
            cosine(F.col("centroid"), F.col("qe")).alias("csim"),
        )
        .withColumn("pr", F.row_number().over(w_probe))
        .where(F.col("pr") <= 2)
        .select("qid", "label")
    )
    return (
        e.where(F.col("vec_id") % 97 != 0)
        .select("label")
        .join(F.broadcast(probe), "label")
        .count()
    )


def _medoid_pairs(spark, sf_dir: str) -> int:
    """Candidate-pair volume of the label-blocked medoid computation:
    sum over labels of n_l * (n_l - 1) — the exact join output the
    per-point distance sums aggregate over.  The rung grows labels'
    populations 10x at fixed label count, so pair volume grows ~100x
    BY CONSTRUCTION; the gate normalizes per candidate.  The scale
    path at 100 TB is finer blocking: labels come from the IVF/k-means
    partitioner (ext_kmeanspp_seeding), so block sizes are a knob, not
    a corpus-proportional given."""
    from pyspark.sql import functions as F

    from nibbler_spark.sources import load_table

    g = load_table(spark, sf_dir, "embeddings").groupBy("label").count()
    row = g.agg(
        F.sum(F.col("count") * (F.col("count") - 1)).alias("p")
    ).collect()[0]
    return int(row["p"] or 0)


def _margin_candidates(spark, sf_dir: str) -> int:
    """Candidate volume of the margin-mining IVF funnel: the cell
    equi-join's output rows (nprobe=2 of 16 hash-seeded cells).  The
    rung grows both pools 10x at the FIXED 16-cell codebook, so
    candidates grow ~100x/16 by construction; at 100 TB the cell count
    grows ~sqrt(|B|) and per-source candidates stay bounded.  The gate
    normalizes per candidate."""
    from nibbler_spark.queries.llm_vectors import margin_candidate_frame

    return margin_candidate_frame(spark, sf_dir).count()


# name -> (scale-path query name, candidate-volume measurer)
CANDIDATE_BOUND = {
    "k04_jaccard_pairs": ("k05_minhash_lsh", _k04_candidate_pairs),
    "ext_simhash_banded_pairs": (
        "ext_simhash64_banded_pairs",
        _simhash16_candidate_pairs,
    ),
    # The funnel's intrinsic work is (queries x probed cells); the rung
    # workload samples queries FROM the corpus (vec_id % 97), so total
    # volume grows ~n^2/485 while per-query volume stays linear — the
    # wall gate normalizes by the measured volume, and the per-query
    # linearity is CI-pinned in tests/test_scale_ladder.py.  The scale
    # path at a fixed production workload is the same pipeline (probed
    # cells only; MaxSim bounded by 20 x n_queries).
    "ext_ann_rerank_pipeline": (
        "ext_ann_rerank_pipeline",
        _ann_coarse_pairs,
    ),
    # r7: label-blocked medoids (blocks = clusters; finer k-means
    # blocking is the scale knob) and the margin-mining funnel (fixed
    # 16-cell codebook on the ladder; cells grow ~sqrt at scale).
    "ext_medoid_exemplars": ("ext_kmeanspp_seeding", _medoid_pairs),
    "ext_margin_pair_mining": (
        "ext_margin_pair_mining",
        _margin_candidates,
    ),
}


def _ensure_data() -> tuple[str, str]:
    from tools.gen_scale_data import write_sf

    base = os.path.join(_REPO, ".scale_data")
    small = os.path.join(base, "sf0.1")
    big = os.path.join(base, "sf1")
    for sf, d in ((0.1, small), (1.0, big)):
        if not os.path.exists(os.path.join(d, "documents.parquet")):
            write_sf(sf, d)
    return small, big


def main() -> None:
    names = sys.argv[1:] or FLAGSHIPS
    small, big = _ensure_data()

    from nibbler_spark.queries import load_all
    from nibbler_spark.session import get_spark

    specs = load_all()
    spark = get_spark(app_name="nibbler-scale-ladder")

    from nibbler_spark.stage_metrics import measure_stages

    out: dict[str, dict] = {}
    for name in names:
        spec = specs[name]
        spec.spark(spark, small).collect()  # JVM/codegen warm-up, untimed
        t_small = []
        for _ in range(2):
            t0 = time.monotonic()
            rows_small = spec.spark(spark, small).collect()
            t_small.append(time.monotonic() - t0)
        t0 = time.monotonic()
        rows_small, m_small = measure_stages(
            spark, lambda: spec.spark(spark, small).collect()
        )
        t_small.append(time.monotonic() - t0)
        ts = statistics.median(t_small)
        t0 = time.monotonic()
        rows_big, m_big = measure_stages(
            spark, lambda: spec.spark(spark, big).collect()
        )
        tb = time.monotonic() - t0
        # bounded-mode queries return booleans — they must hold at sf1
        bools = [
            v
            for r in rows_big
            for v in r.asDict().values()
            if isinstance(v, bool)
        ]
        ratio = tb / ts
        sw_small = m_small["shuffle_write_bytes"]
        sw_big = m_big["shuffle_write_bytes"]
        entry = {
            "t_sf0.1_sec": round(ts, 3),
            "t_sf1_sec": round(tb, 3),
            "ratio": round(ratio, 2),
            "rows_sf0.1": len(rows_small),
            "rows_sf1": len(rows_big),
            "bounded_checks_sf1": all(bools) if bools else None,
            # whole-query stage accounting (every job incl. checkpoint
            # rounds — nibbler_spark/stage_metrics.py): the 100 TB cost
            # driver is shuffle volume, and it must grow with the data,
            # not with the square of it; any DISK spill at this scale
            # means partition sizing is wrong.
            "shuffle_write_mb_sf0.1": round(sw_small / 1e6, 2),
            "shuffle_write_mb_sf1": round(sw_big / 1e6, 2),
            "shuffle_ratio": round(sw_big / sw_small, 2) if sw_small else None,
            "disk_spill_bytes_sf1": m_big["disk_spill_bytes"],
        }
        if name in CANDIDATE_BOUND:
            scale_path, measurer = CANDIDATE_BOUND[name]
            w_small = measurer(spark, small)
            w_big = measurer(spark, big)
            work_ratio = w_big / max(w_small, 1)
            per_work = ratio / work_ratio
            entry.update(
                {
                    "scale_class": "candidate-bound-exact",
                    "scale_path": scale_path,
                    "candidates_sf0.1": w_small,
                    "candidates_sf1": w_big,
                    "candidate_ratio": round(work_ratio, 2),
                    "ratio_per_candidate": round(per_work, 3),
                    "near_linear": per_work <= GATE_PER_WORK,
                }
            )
        else:
            entry.update(
                {"scale_class": "near-linear", "near_linear": ratio <= GATE_RATIO}
            )
        out[name] = entry
        print(f"{name}: {ts:.2f}s -> {tb:.2f}s  ratio {ratio:.2f}x", flush=True)

    path = os.path.join(_REPO, "BENCH_SF1.json")
    if os.path.exists(path) and (sys.argv[1:] or []):
        # subset run: merge into the existing ladder instead of clobbering
        with open(path) as f:
            prev = json.load(f).get("queries", {})
        prev.update(out)
        out = prev

    result = {
        "sf_small": 0.1,
        "sf_big": 1.0,
        "docs_small": 5000,
        "docs_big": 50000,
        "gate_ratio": GATE_RATIO,
        "gate_per_candidate": GATE_PER_WORK,
        "generator": "tools/gen_scale_data.py (seed 42, density-matched vocab)",
        "queries": out,
        "all_near_linear": all(e["near_linear"] for e in out.values()),
        "all_bounded_ok": all(
            e["bounded_checks_sf1"] in (True, None) for e in out.values()
        ),
        "all_no_disk_spill": all(
            e.get("disk_spill_bytes_sf1", 0) == 0 for e in out.values()
        ),
    }
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(json.dumps({k: v for k, v in result.items() if k != "queries"}))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
