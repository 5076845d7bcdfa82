"""Compare a bench JSON line against the recorded per-row baselines.

Usage:
    python tools/bench_compare.py BENCH_r03.json        # driver capture
    python bench.py | tail -1 | python tools/bench_compare.py -

Prints per-row ratio vs the baseline table below (the measured values
BASELINE.md records) and the summed ratio. Exit code 1 if any row
breaches the 2x acceptance gate.
"""

from __future__ import annotations

import json
import sys

# Baseline seconds per query, as recorded in BASELINE.md (bench.py
# medians on local[32], sf0.1). s1_rebatcher_items_per_sec is a
# throughput band, checked separately.
BASELINE_SEC = {
    "q1_pricing_summary": 1.55,
    "c01_join_3way_agg": 1.70,
    "e01_row_number_topk": 1.38,
    "k06_cosine_topk": 0.42,  # ratcheted r9 (was 0.58)
    "i01_tumbling_window_parity": 2.08,
    "tq05_regional_revenue": 1.66,
    "tq06_revenue_forecast": 0.40,
    "tq18_large_orders": 0.94,  # ratcheted r9 (was 2.03)
    "k05_minhash_lsh": 3.60,
    "ext_sessionize_batch": 1.30,
    "ext_simhash_banded_pairs": 0.70,
    "k04_jaccard_pairs": 1.00,
    "ext_decontaminate_ngram": 1.25,  # ratcheted r9 (was 2.10)
    "ext_sequence_packing": 0.62,
    "ext_training_data_pipeline": 1.90,
    "tq21_suppliers_who_kept_waiting": 1.26,
    "ext_embedding_neardup": 1.20,
    "ext_minhash_lsh_portable": 1.00,
    "ext_label_propagation": 1.80,
    "ext_paragraph_dedup": 0.70,
    "ext_substring_span_dedup": 1.80,
    "ext_naive_bayes": 1.50,
    "ext_crawl_pipeline": 1.24,
    "ext_kcore_decomposition": 1.80,
    "ext_stream_cdc_apply": 3.50,
    "ext_image_ahash_neardup": 0.97,
    "ext_containment_dedup": 1.25,
    "ext_snapshot_row_cdc": 2.77,
    "a41_parquet_raw_reader": 1.63,
    "ext_markov_attribution": 1.08,
    "ext_zipf_skew_join": 1.20,
    "k22_skew_join_unsalted": 1.06,
    "ext_simhash64_banded_pairs": 0.63,
    "tq_power_22": 15.1,
    "i42_stream_minhash_neardup": 8.11,  # ratcheted r9 (was 13.5)
    "ext_ann_rerank_pipeline": 1.57,
    "i43_stream_grouped_packing": 3.45,
    "ext_louvain_sync_round": 1.75,
    "ext_glove_cooccurrence": 1.71,
    "ext_window_funnel": 1.30,
    "ext_skipgram_negative_sampling": 1.85,
    "ext_prefix_cache_analysis": 0.63,
    "ext_binary_embedding_recall": 1.69,
    "i51_stream_spacesaving": 4.18,
    # r10: NSW/HNSW re-anchored for the shared PERSISTED build (the r9
    # 9.98/12.57 s anchors timed a full per-query graph rebuild; the
    # operators now measure search over the committed graph).
    "ext_nsw_greedy_search": 2.76,
    "ext_hnsw_layered_search": 5.63,
    "ext_tokenizer_roundtrip": 2.64,
    # r10 new rotating rows (anchored at the r10 round-close median-of-5,
    # canary 0.561 s):
    "ext_unicode_fold_dedup": 0.88,
    "i55_stream_ddsketch_union": 7.15,
    "ext_self_consistency_vote": 0.68,
    # r11 new rotating rows (anchored at the r11 round-close
    # median-of-5, canary 0.555 s):
    "ext_dedup_cluster_canonical": 12.72,
    "ext_curriculum_schedule": 1.11,
    "ext_quality_distillation": 1.04,
}
REBATCHER_MIN = 1.4e6  # items/s floor of the recorded band


CANARY_MID = 0.50  # BASELINE.md clean-band midpoint


def watchlist(paths: list[str]) -> list[str]:
    """Anchor-ratchet watch-list (r9 verdict #8, run mechanically at
    round close): rows measured <0.7x their CURRENT anchor in every
    one of the last 3 recorded BENCH_r*.json are ratchet candidates
    per BASELINE.md's policy (re-anchor at the median of the 3).
    Prints the check's result — even when empty — for BASELINE.md."""
    import glob
    import statistics

    if not paths:
        paths = sorted(glob.glob("BENCH_r*.json"))[-3:]
    if len(paths) < 3:
        print(f"watchlist: need 3 rounds, have {len(paths)} — no check")
        return []
    rounds = []
    for p in paths:
        data = json.loads(open(p).read())
        parsed = data.get("parsed") or data
        qs = parsed.get("queries") or data.get("queries")
        if not qs:
            # r10: the driver's tail capture truncated the JSON line
            # (parsed: null) — skip the file rather than crash; the
            # caller substitutes the builder's BENCH_SELF record
            print(f"watchlist: {p} has no parseable queries — skipped")
            continue
        rounds.append(qs)
    if len(rounds) < 3:
        print(f"watchlist: only {len(rounds)} parseable rounds — no check")
        return []
    out = []
    for name, base in sorted(BASELINE_SEC.items()):
        vals = [r.get(name) for r in rounds]
        if any(v is None for v in vals):
            continue
        ratios = [v / base for v in vals]
        if all(r < 0.7 for r in ratios):
            med = statistics.median(vals)
            out.append(name)
            print(f"watchlist RATCHET {name}: "
                  f"{'/'.join(f'{r:.2f}x' for r in ratios)} vs {base}s "
                  f"-> new anchor {med}s (median of 3)")
    if not out:
        # the nearest-miss row, for the BASELINE.md note
        near = None
        for name, base in BASELINE_SEC.items():
            vals = [r.get(name) for r in rounds]
            if any(v is None for v in vals):
                continue
            worst = max(v / base for v in vals)
            if near is None or worst < near[0]:
                near = (worst, name)
        print(f"watchlist: EMPTY over {[p.split('/')[-1] for p in paths]} — "
              "no frozen row <0.7x its anchor for all 3 rounds"
              + (f" (nearest: {near[1]} at worst {near[0]:.2f}x)"
                 if near else ""))
    return out


def main() -> int:
    args = [a for a in sys.argv[1:]]
    if args and args[0] == "--watchlist":
        watchlist(args[1:])
        return 0
    src = args[0] if args else "-"
    raw = sys.stdin.read() if src == "-" else open(src).read()
    data = json.loads(raw)
    parsed = data.get("parsed", data)
    queries = parsed.get("queries") or data["queries"]
    # r9 verdict #5: gate on the CANARY-NORMALIZED ratio (ratio /
    # (canary_sec / 0.50)) with the raw one recorded alongside — the
    # mechanical form of BASELINE.md's reading rule. Falls back to raw
    # when the JSON predates the canary field.
    canary = parsed.get("canary_sec") or data.get("canary_sec")
    norm = (canary / CANARY_MID) if canary else 1.0
    bad = 0
    total_run = total_base = 0.0
    for name, sec in sorted(queries.items()):
        if name == "s1_rebatcher_items_per_sec":
            ok = sec >= REBATCHER_MIN
            print(f"{name:42s} {sec:>12.0f} items/s "
                  f"{'OK' if ok else 'BREACH (< band floor)'}")
            bad += 0 if ok else 1
            continue
        base = BASELINE_SEC.get(name)
        if base is None:
            print(f"{name:42s} {sec:>8.3f}s  (no baseline row)")
            continue
        ratio = sec / base
        nratio = ratio / norm
        total_run += sec
        total_base += base
        flag = "" if nratio <= 2.0 else "  << BREACHES 2x GATE (normalized)"
        print(f"{name:42s} {sec:>8.3f}s / {base:>5.2f}s = "
              f"{ratio:4.2f}x raw, {nratio:4.2f}x norm{flag}")
        bad += 0 if nratio <= 2.0 else 1
    if total_base:
        tr = total_run / total_base
        print(f"{'SUM (rows with baselines)':42s} {total_run:>8.2f}s / "
              f"{total_base:>5.2f}s = {tr:4.2f}x raw, {tr / norm:4.2f}x norm"
              f" (canary {canary if canary else 'n/a'} s, mid {CANARY_MID})")
    print(f"gate breaches (normalized): {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
