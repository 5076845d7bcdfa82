#!/usr/bin/env python3
"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Headline set mirrors BASELINE.md's measurement plan (BENCH-B1..B4, S1).
Timing = median of N runs (default 3) of full query execution including
collect of the (small) result.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# Median of 5 (r3, was 3): the r2 verdict flagged tq18's +18% drift as
# likely sf0.1 sampling noise — the wider sample settles per-query drift.
RUNS = int(os.environ.get("NIBBLER_BENCH_RUNS", "5"))

# Registry names of the headline queries (BASELINE.md plan). Missing names
# are skipped so the bench degrades gracefully mid-build.
HEADLINE = [
    "q1_pricing_summary",  # BENCH-B1
    "c01_join_3way_agg",  # BENCH-B2
    "e01_row_number_topk",  # BENCH-B3 (window rank per group)
    "k06_cosine_topk",  # BENCH-B4
    "i01_tumbling_window_parity",  # BENCH-S2 (streaming drain end-to-end)
    "tq05_regional_revenue",  # BENCH-B5 (6-table join, broadcast dims)
    "tq06_revenue_forecast",  # BENCH-B6 (scan-bound, full pushdown)
    "tq18_large_orders",  # BENCH-B7 (agg-then-join)
    # Scale-pattern additions (r2): dedup + sessionization regressions
    # should show up in the bench, not just scan/join/window ones.
    "k05_minhash_lsh",  # BENCH-K1 (MinHash-LSH near-dup end-to-end)
    "ext_sessionize_batch",  # BENCH-K2 (gaps-and-islands sessionization)
    "ext_simhash_banded_pairs",  # BENCH-K3 (simhash banding + pair gen)
    "k04_jaccard_pairs",  # BENCH-K4 (banded exact-Jaccard oracle path)
    # Training-prep additions (r4): decontamination joins the corpus
    # against a broadcast eval-gram set; packing is the two-phase
    # distributed prefix sum — both shapes the scale story leans on.
    "ext_decontaminate_ngram",  # BENCH-K5 (eval n-gram decontamination)
    "ext_sequence_packing",  # BENCH-K6 (concat-and-chunk packing)
    # r3 additions (verdict next-round #5): the end-to-end curation
    # funnel and a three-way exists/not-exists rewrite guard the two
    # composite shapes the per-operator rows don't cover.
    "ext_training_data_pipeline",  # BENCH-K7 (end-to-end curation funnel)
    "tq21_suppliers_who_kept_waiting",  # BENCH-B8 (exists/not-exists)
    # r4 additions (verdict next-round #7): the two most plan-heavy
    # near-dup pipelines — sign-bit-LSH embedding near-dup and the
    # engine-portable MinHash+banding — get regression coverage.
    "ext_embedding_neardup",  # BENCH-K8 (12-band sign-LSH + exact verify)
    "ext_minhash_lsh_portable",  # BENCH-K9 (md5 MinHash, 6x2 banding)
    # r4 second-half additions: the iterative message-passing shape
    # (3 LPA rounds over the shingle graph) and sub-document dedup with
    # ordered reassembly — both new composite heavies this round.
    "ext_label_propagation",  # BENCH-K10 (LPA on df-capped shingle graph)
    "ext_paragraph_dedup",  # BENCH-K11 (chunk dedup + doc reassembly)
    # r4 continuation: any-alignment duplicated-span detection (the
    # Lee-et-al ExactSubstr audit shape) and the NB scoring join (the
    # |classes|-fanout candidate-scoring shape the ML family leans on).
    "ext_substring_span_dedup",  # BENCH-K12 (8-gram span-merge dedup)
    "ext_naive_bayes",  # BENCH-K13 (gridded-ln NB train + score)
    # the acquisition-side funnel (WARC decode -> robots -> URL dedup ->
    # quality) — the Arrow-codec counterpart of K7's curation funnel.
    "ext_crawl_pipeline",  # BENCH-K14 (crawl-ingestion funnel)
    # r4 continuation (second session): the degeneracy-peel iterative
    # shape (3 k-core rounds: alive-induced degree -> filter, per round)
    # and the streaming-CDC-into-lakehouse composite (paced merges into
    # the snapshot format) — the two heaviest new plan families.
    "ext_kcore_decomposition",  # BENCH-K15 (k-core peel on shingle graph)
    "ext_stream_cdc_apply",  # BENCH-K16 (streaming MERGE into snapshots)
    # r4 fourth session: perceptual-hash image near-dup (mapInPandas
    # decode+hash, 4x16-bit Hamming banding) and asymmetric containment
    # dedup over the shingle inverted index — the two new dedup
    # modalities (lossy image, sub-document superset) join the bench.
    "ext_image_ahash_neardup",  # BENCH-K17 (aHash + Hamming-band LSH)
    "ext_containment_dedup",  # BENCH-K18 (inverted-index containment)
    # the full lakehouse write path under load: 4 bucket commits, a
    # U/D/I MERGE with touched-file detection, the row-level CDF
    # sidecar, and the change-feed read back.
    "ext_snapshot_row_cdc",  # BENCH-K19 (MERGE + row-level CDF)
    # r4 final session: from-scratch format decode + chain analytics
    "a41_parquet_raw_reader",  # BENCH-K20 (raw Parquet decode, 8 files)
    "ext_markov_attribution",  # BENCH-K21 (5-variant absorbing chains)
    # r5 (verdict #4): the salted zipf(1.5) skew join; its unsalted twin
    # is timed separately below as k22_skew_join_unsalted (BENCH-K22).
    "ext_zipf_skew_join",  # BENCH-K22 (salted zipf skew join)
    # r5 session 2: the 64-bit simhash scale path (ladder-measured
    # near-linear where the 16-bit BENCH-K3 row is candidate-bound).
    "ext_simhash64_banded_pairs",  # BENCH-K23 (64-bit simhash banding)
    # r5 session 3: online dedup-index ingestion (streaming LSH state
    # whose pair union hash-matches the batch pipeline) and the
    # coarse-to-fine retrieval funnel (IVF probe -> cosine top-20 ->
    # MaxSim rerank).
    "i42_stream_minhash_neardup",  # BENCH-K24 (streaming LSH dedup)
    "ext_ann_rerank_pipeline",  # BENCH-K25 (IVF -> MaxSim rerank funnel)
    # r6: online training-sequence packing (4 explicit catch-up drains,
    # O(1) state per language) and the synchronous Louvain sweep on the
    # weighted shingle graph (exact integer modularity gains).
    "i43_stream_grouped_packing",  # BENCH-K26 (ingest-time packing)
    "ext_louvain_sync_round",  # BENCH-K27 (Louvain phase-1 sweep)
    # r6 session 3: the prefix-doubling suffix array (6 dense-rank
    # rounds + cross-doc LCP top-30) — the ExactSubstr dedup flagship.
    "ext_suffix_array_lcp",  # BENCH-K28 (suffix array + LCP)
    # r6 session 3, second half: greedy max-coverage data selection
    # (5 anti-join rounds over the checkpointed shingle table).
    "ext_submodular_coverage",  # BENCH-K29 (greedy coverage)
]


def _sf_from_dir(sf_dir: str) -> float:
    name = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    from nibbler_spark.queries import load_all
    from nibbler_spark.session import get_spark

    specs = load_all()
    spark = get_spark(app_name="nibbler-spark-bench")
    # Warm the JVM + parquet footers once.
    from nibbler_spark.sources import load_table

    load_table(spark, SF_DIR, "lineitem").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = specs.get(name)
        if spec is None:
            continue
        # One untimed warm-up pass: page cache + codegen + broadcast
        # build are amortized in any steady-state deployment, and the
        # timed medians should measure the query, not the first touch
        # of the parquet files.
        spec.spark(spark, SF_DIR).collect()
        samples = []
        for _ in range(RUNS):
            t0 = time.monotonic()
            df = spec.spark(spark, SF_DIR)
            df.collect()
            samples.append(time.monotonic() - t0)
        timings[name] = round(statistics.median(samples), 4)

    # BENCH-K22 companion row: the UNSALTED zipf(1.5) skew join, timed
    # against the salted registered variant above (same builder, same
    # merge-hinted SMJ).  Recorded so the salted/unsalted delta under
    # a power-law key is a measured number, not an argument; the AQE
    # skew-split engagement on this plan is asserted from executed-plan
    # SQLMetrics in tests/test_aqe_scale.py.
    try:
        from nibbler_spark.queries.scale_patterns import zipf_skew_join_frames

        zipf_skew_join_frames(spark, SF_DIR, salted=False).collect()
        samples = []
        for _ in range(RUNS):
            t0 = time.monotonic()
            zipf_skew_join_frames(spark, SF_DIR, salted=False).collect()
            samples.append(time.monotonic() - t0)
        timings["k22_skew_join_unsalted"] = round(
            statistics.median(samples), 4
        )
    except ImportError:
        pass

    # Release session debris the headline loop accumulated before the
    # composite below is timed (r5 verdict #5 — the tq_power_22 drift).
    # Isolated-session steady state is stable (consecutive runs within
    # 1%, code cache ~80/240 MB — measured r6, see NOTES.md); what moves
    # the in-bench number across rounds is the GROWING pile of
    # memory-sink tables (every streaming drain registers a mem_* temp
    # view holding its result rows on the driver heap) and pinned
    # localCheckpoint RDD blocks competing with execution memory.  Drop
    # them all so the composite sees the same heap every round
    # regardless of how many headline rows precede it.
    for tbl in spark.catalog.listTables():
        if tbl.name.startswith("mem_"):
            spark.catalog.dropTempView(tbl.name)
    spark.catalog.clearCache()
    persistent = spark.sparkContext._jsc.getPersistentRDDs()
    for rid in list(persistent.keySet()):
        persistent.get(rid).rdd().unpersist(False)

    # TPC-H power run (BENCH-B9): all 22 reduced-schema analogues
    # executed sequentially as ONE timed metric — the classic composite
    # the per-row bench entries don't capture (optimizer consistency
    # across the whole suite, not per-query peaks). Median of RUNS
    # passes after one warm-up sweep.
    tq_names = sorted(n for n in specs if n.startswith("tq"))
    if len(tq_names) >= 20:
        for n in tq_names:
            specs[n].spark(spark, SF_DIR).collect()  # warm-up
        samples = []
        for _ in range(RUNS):
            t0 = time.monotonic()
            for n in tq_names:
                specs[n].spark(spark, SF_DIR).collect()
            samples.append(time.monotonic() - t0)
        timings["tq_power_22"] = round(statistics.median(samples), 4)

    # Streaming re-batcher throughput (BENCH-S1): items/s through the
    # size-OR-time core at Size=100.  Measured in a FRESH SUBPROCESS
    # (r4 verdict #7): the in-process reading swung 3.06M -> 2.39M
    # across rounds under identical code because the shared interpreter
    # carries the query suite's py4j callback threads and GC debt; a
    # clean interpreter with no JVM attached removes the interference
    # at the source (max-of-3 within the subprocess still guards
    # scheduler blips).
    try:
        import subprocess

        snippet = (
            # 200k items widens each timing window to ~100 ms (20k = ~8 ms
            # was inside CPU-frequency-ramp noise); max-of-5 then reads
            # the unthrottled steady state.
            "import sys; sys.path.insert(0, %r); "
            "from nibbler_spark.streaming.rebatcher import "
            "bench_rebatcher_throughput as b; "
            "print(max(b(n_items=200000, size=100) for _ in range(5)))"
            % _REPO
        )
        out = subprocess.run(
            [sys.executable, "-c", snippet],
            capture_output=True,
            text=True,
            timeout=120,
        )
        if out.returncode == 0:
            timings["s1_rebatcher_items_per_sec"] = round(
                float(out.stdout.strip().splitlines()[-1]), 1
            )
    except (subprocess.TimeoutExpired, ValueError, IndexError):
        pass

    total = round(
        sum(
            v
            for k, v in timings.items()
            if not k.startswith("s1_")
            # composite / diagnostic rows stay out of the headline sum:
            # tq_power_22 re-times queries already summed individually,
            # and the unsalted k22 twin is the measured contrast for
            # ext_zipf_skew_join, not a second operator.
            and k not in ("tq_power_22", "k22_skew_join_unsalted")
        ),
        4,
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_from_dir(SF_DIR),
            }
        )
    )


if __name__ == "__main__":
    main()
