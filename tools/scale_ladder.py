#!/usr/bin/env python3
"""Scale-factor ladder for the dedup/graph flagships (r4 verdict #1).

Measures the five flagship operators whose 100 TB claims were previously
plan-asserted only, at generated sf0.1 (5,000 docs — distributionally
matched to the real driver sf0.1) and generated sf1 (50,000 docs,
density-matched vocab; see tools/gen_scale_data.py), and records wall
times + the growth ratio into BENCH_SF1.json.

Near-linear gate: a 10x corpus should cost <= ~12x wall time (linear
plus shuffle/log factors).  Queries returning bounded-mode booleans must
stay True at every rung — the sf1 run is a correctness check too.

Run:  python tools/scale_ladder.py            (~a few minutes)
      python tools/scale_ladder.py k05_minhash_lsh   (subset)
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
]
GATE_RATIO = 12.0  # 10x data -> <= 12x wall (near-linear)


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

    out: dict[str, dict] = {}
    for name in names:
        spec = specs[name]
        spec.spark(spark, small).collect()  # JVM/codegen warm-up, untimed
        t_small = []
        for _ in range(3):
            t0 = time.monotonic()
            rows_small = spec.spark(spark, small).collect()
            t_small.append(time.monotonic() - t0)
        ts = statistics.median(t_small)
        t0 = time.monotonic()
        rows_big = spec.spark(spark, big).collect()
        tb = time.monotonic() - t0
        # bounded-mode queries return booleans — they must hold at sf1
        bools = [
            v
            for r in rows_big
            for v in r.asDict().values()
            if isinstance(v, bool)
        ]
        entry = {
            "t_sf0.1_sec": round(ts, 3),
            "t_sf1_sec": round(tb, 3),
            "ratio": round(tb / ts, 2),
            "rows_sf0.1": len(rows_small),
            "rows_sf1": len(rows_big),
            "bounded_checks_sf1": all(bools) if bools else None,
            "near_linear": tb / ts <= GATE_RATIO,
        }
        out[name] = entry
        print(f"{name}: {ts:.2f}s -> {tb:.2f}s  ratio {tb/ts:.2f}x", flush=True)

    result = {
        "sf_small": 0.1,
        "sf_big": 1.0,
        "docs_small": 5000,
        "docs_big": 50000,
        "gate_ratio": GATE_RATIO,
        "generator": "tools/gen_scale_data.py (seed 42, density-matched vocab)",
        "queries": out,
        "all_near_linear": all(e["near_linear"] for e in out.values()),
        "all_bounded_ok": all(
            e["bounded_checks_sf1"] in (True, None) for e in out.values()
        ),
    }
    path = os.path.join(_REPO, "BENCH_SF1.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: v for k, v in result.items() if k != "queries"}))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
