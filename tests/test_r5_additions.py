"""Round-5 additions: perplexity terciles, the right-outer streaming
join, and the eviction-proof stage-metric attribution."""

from __future__ import annotations

from pyspark.sql import functions as F

from nibbler_spark.queries import load_all


def test_perplexity_tercile_balance_and_order(spark, sf_dir):
    """Within every language the head/middle/tail doc counts differ by
    at most 1 (the exact rank cut is balanced by construction), and the
    buckets are ordered: every head doc scores >= every middle doc >=
    every tail doc (min_score/max_score envelopes must not invert)."""
    rows = (
        load_all()["ext_perplexity_buckets"].spark(spark, sf_dir).collect()
    )
    by_lang: dict[str, dict[str, tuple]] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], {})[r["bucket"]] = (
            r["n_docs"],
            r["min_score"],
            r["max_score"],
        )
    assert by_lang, "no output rows"
    for lang, buckets in by_lang.items():
        counts = [b[0] for b in buckets.values()]
        assert max(counts) - min(counts) <= 1, (lang, buckets)
        order = [b for b in ("head", "middle", "tail") if b in buckets]
        for hi, lo in zip(order, order[1:]):
            # ties may straddle the cut, so envelopes can touch but the
            # better bucket's floor can't drop below the worse's ceiling
            assert buckets[hi][1] >= buckets[lo][2] or (
                buckets[hi][1] == buckets[lo][1]
            ), (lang, hi, lo, buckets)


def test_perplexity_buckets_no_corpus_wide_window(spark, sf_dir):
    """The per-language rank must come from the two-phase pattern:
    every window spec in the plan carries the fine score bucket (_fb)
    in its partitioning — a window partitioned by lang alone would
    funnel 41% of a 100 TB corpus (en) through one task."""
    df = load_all()["ext_perplexity_buckets"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    for line in plan.splitlines():
        if "row_number" not in line:
            continue
        assert "_fb" in line, f"row_number window without _fb bucket: {line}"


def test_stream_right_outer_null_direction(spark, sf_dir):
    """i41 must emit unmatched-right rows (purchases with no preceding
    same-user event in 2 minutes) as NULL-left, and its matched subset
    must agree with the inner-join core of i38's left-outer result."""
    rows = (
        load_all()["i41_stream_stream_right_outer"]
        .spark(spark, sf_dir)
        .collect()
    )
    unmatched = [r for r in rows if r["eid_a"] is None]
    matched = [r for r in rows if r["eid_a"] is not None]
    assert matched, "no matched pairs — fixture degenerate"
    assert unmatched, "no unmatched purchases — right-outer arm vacuous"
    assert all(r["eid_b"] is not None for r in rows)


def test_measure_stages_immune_to_store_eviction(spark, sf_dir):
    """The r5 audit bug pinned: with spark.ui.retainedStages at its
    1000 default, a long session's evictions between the before/after
    snapshots corrupt a cumulative-total delta.  The id-based
    measure_stages must return the same shuffle volume for the same
    query no matter how much history the store already holds, so two
    consecutive measurements of an identical job must agree exactly
    (bytes are deterministic at fixed partitioning)."""
    from nibbler_spark.sources import load_table
    from nibbler_spark.stage_metrics import measure_stages

    def job():
        return (
            load_table(spark, sf_dir, "events")
            .repartition(4, "user_id")
            .groupBy("user_id")
            .agg(F.count("*").alias("n"))
            .collect()
        )

    _, m1 = measure_stages(spark, job)
    _, m2 = measure_stages(spark, job)
    assert m1["shuffle_write_bytes"] > 0
    assert m1["shuffle_write_bytes"] == m2["shuffle_write_bytes"], (m1, m2)


def test_ann_rerank_actually_reorders(spark, sf_dir):
    """The MaxSim stage must be non-vacuous: if the reranked order
    equaled the coarse pooled-cosine order, the pipeline would collapse
    to its first stage (the fixture lesson: prove the interesting
    branch FIRES, not just that outputs match)."""
    rows = (
        load_all()["ext_ann_rerank_pipeline"].spark(spark, sf_dir).collect()
    )
    assert rows
    assert any(r["rnk"] != r["coarse_rank"] for r in rows)
    # every reranked doc came from the coarse top-20
    assert all(1 <= r["coarse_rank"] <= 20 for r in rows)


def test_stream_minhash_cross_batch_pairs_fire(spark, sf_dir):
    """The online dedup index is only meaningful if pairs spanning
    micro-batches actually occur — a single-epoch drain would never
    exercise the state-carry path.  The pair log tags each emission:
    both kinds must appear, and the distinct pair set must equal the
    batch pipeline's candidate set restricted to verified pairs."""
    from nibbler_spark.queries.streaming_q import _stream_minhash_pair_log

    log = _stream_minhash_pair_log(spark, sf_dir).collect()
    assert any(r["xbatch"] for r in log), "no cross-batch pair emitted"
    assert any(not r["xbatch"] for r in log), "no within-batch pair"
    # at-most-once per (pair, bucket): re-emission would double-count
    seen = {}
    for r in log:
        seen[(r["doc_a"], r["doc_b"])] = seen.get(
            (r["doc_a"], r["doc_b"]), 0
        ) + 1
    assert max(seen.values()) <= 6, "pair emitted more often than bands"


def test_maxsim_grid_matches_numpy_reference(spark):
    """maxsim_grid vs an independent numpy replica of the declared
    semantics (slice, floor-grid dot as int64, max over doc tokens, sum
    over query tokens) on random float32 vectors — the helper feeds two
    registered queries, so its arithmetic is pinned beyond the oracle."""
    import math

    import numpy as np

    from nibbler_spark.queries.llm_vectors import maxsim_grid

    rng = np.random.default_rng(7)
    rows = []
    for i in range(20):
        q = rng.standard_normal(64).astype(np.float32)
        d = rng.standard_normal(64).astype(np.float32)
        rows.append((i, [float(x) for x in q], [float(x) for x in d]))

    def ref(qv, dv):
        total = 0
        for i in range(8):
            best = None
            for j in range(8):
                s = 0
                for k in range(8):
                    s += math.floor(
                        float(np.float32(qv[i * 8 + k]))
                        * float(np.float32(dv[j * 8 + k]))
                        * 1e10
                    )
                best = s if best is None or s > best else best
            total += best
        return total

    df = spark.createDataFrame(
        rows, "id long, qe array<float>, de array<float>"
    )
    got = {
        r["id"]: r["g"]
        for r in df.select(
            "id", maxsim_grid(F.col("qe"), F.col("de")).alias("g")
        ).collect()
    }
    for i, qv, dv in rows:
        assert got[i] == ref(qv, dv), i
