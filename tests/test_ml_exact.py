"""Semantic invariants for the hash-exact ML operators and the round-4
additions (span dedup, grid spatial join) — brute-force recomputations
and cross-row properties the per-row DuckDB hash oracles can't state."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from nibbler_spark.queries import load_all
from nibbler_spark.sources import load_table

SPECS = load_all()


def test_decision_stump_matches_bruteforce(spark, sf_dir):
    """The stump's (feature, threshold, gini) must equal an exhaustive
    pure-Python search over every candidate split."""
    rows = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_quantity", "l_discount", "l_returnflag")
        .collect()
    )
    data = {
        "qty": [(int(r["l_quantity"]), r["l_returnflag"] == "R") for r in rows],
        "disc_cents": [
            (int(round(r["l_discount"] * 100)), r["l_returnflag"] == "R")
            for r in rows
        ],
    }
    best = None
    for feat, pairs in data.items():
        hist = defaultdict(lambda: [0, 0])
        for v, pos in pairs:
            hist[v][0] += 1
            hist[v][1] += pos
        nt = sum(n for n, _ in hist.values())
        pt = sum(p for _, p in hist.values())
        nl = pl = 0
        vmax = max(hist)
        for v in sorted(hist):
            nl += hist[v][0]
            pl += hist[v][1]
            if v == vmax:
                continue
            nr, pr = nt - nl, pt - pl
            g = (
                nl
                - (pl * pl + (nl - pl) * (nl - pl)) / nl
                + nr
                - (pr * pr + (nr - pr) * (nr - pr)) / nr
            ) / nt
            cand = (g, feat, v)
            if best is None or cand < best:
                best = cand
    out = SPECS["ext_decision_stump"].spark(spark, sf_dir).collect()[0]
    assert (out["feature"], out["threshold"]) == (best[1], best[2])
    assert abs(out["gini"] - best[0]) < 1e-12
    assert out["n_left"] + out["n_right"] == len(rows)


def test_naive_bayes_matches_pure_python_reference(spark, sf_dir):
    """Confusion matrix equals a from-scratch NB with the same 1e-9
    gridded-log scoring (shares no machinery with either engine)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    ).collect()
    gridln = lambda x: math.floor(math.log(x) * 1e9)
    tokc: Counter = Counter()
    n_l: Counter = Counter()
    d_l: Counter = Counter()
    vocab = set()
    for r in docs:
        toks = r["text"].split(" ")
        d_l[r["lang"]] += 1
        for w in toks:
            tokc[(w, r["lang"])] += 1
            n_l[r["lang"]] += 1
            vocab.add(w)
    v, d_tot = len(vocab), len(docs)
    langs = sorted(d_l)
    conf: Counter = Counter()
    for r in docs:
        m = Counter(r["text"].split(" "))
        t_doc = sum(m.values())
        scored = []
        for lang in langs:
            s = gridln(d_l[lang]) - gridln(d_tot)
            s -= t_doc * gridln(n_l[lang] + v)
            for w, mw in m.items():
                c = tokc.get((w, lang), 0)
                if c:
                    s += mw * gridln(c + 1)
            scored.append((-s, lang))
        pred = min(scored)[1]
        conf[(r["lang"], pred)] += 1
    out = SPECS["ext_naive_bayes"].spark(spark, sf_dir).collect()
    got = {(r["actual_lang"], r["pred_lang"]): r["n_docs"] for r in out}
    assert got == dict(conf)
    # the classifier must beat the majority-class baseline on its own
    # training set (languages have disjoint-enough vocabularies)
    acc = sum(n for (a, p), n in conf.items() if a == p) / d_tot
    assert acc > max(d_l.values()) / d_tot


def test_equidepth_buckets_are_balanced(spark, sf_dir):
    rows = SPECS["ext_equidepth_bucketing"].spark(spark, sf_dir).collect()
    assert [r["bucket"] for r in rows] == list(range(10))
    n_tot = sum(r["n"] for r in rows)
    for r in rows:
        # equi-depth: every decile within ±2% of n/10 (ties on exact
        # cut values can shift a handful of rows)
        assert abs(r["n"] - n_tot / 10) <= max(2, 0.02 * n_tot)
    for a, b in zip(rows, rows[1:]):
        assert a["hi"] <= b["lo"]


def test_mutual_information_nonnegative_and_midband(spark, sf_dir):
    rows = SPECS["ext_mutual_information"].spark(spark, sf_dir).collect()
    # df-band tokens are scarce at sf0.001 — just require a non-empty
    # result capped at the declared top-20
    assert 1 <= len(rows) <= 20
    assert all(r["mi"] >= 0 for r in rows)
    mis = [r["mi"] for r in rows]
    assert mis == sorted(mis, reverse=True)


def test_substring_span_dedup_bruteforce(spark, sf_dir):
    """Span stats equal a pure-Python recomputation of the duplicated
    8-gram position-cover on the real corpus."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).collect()
    grams: Counter = Counter()
    toks = {}
    for r in docs:
        t = r["text"].split(" ")
        toks[r["doc_id"]] = t
        for i in range(len(t) - 7):
            grams[" ".join(t[i : i + 8])] += 1
    expect = {}
    for did, t in toks.items():
        covered = set()
        for i in range(len(t) - 7):
            if grams[" ".join(t[i : i + 8])] >= 2:
                covered.update(range(i, i + 8))
        spans = []
        for p in sorted(covered):
            if spans and p == spans[-1][1] + 1:
                spans[-1][1] = p
            else:
                spans.append([p, p])
        expect[did] = (
            len(spans),
            sum(b - a + 1 for a, b in spans),
            max((b - a + 1 for a, b in spans), default=0),
        )
    out = SPECS["ext_substring_span_dedup"].spark(spark, sf_dir).collect()
    for r in out:
        assert (
            r["n_dup_spans"],
            r["dup_tokens"],
            r["longest_span"],
        ) == expect[r["doc_id"]], r["doc_id"]


def test_grid_spatial_join_equals_allpairs(spark, sf_dir):
    """The 3x3-stencil candidate generation must lose nothing: total
    pair count equals the brute-force all-pairs radius count."""
    ids = [
        r["event_id"]
        for r in load_table(spark, sf_dir, "events")
        .select("event_id")
        .collect()
    ]
    import hashlib

    def coord(prefix, eid):
        h = hashlib.md5(f"{prefix}:{eid}".encode()).hexdigest()
        return int(h[:12], 16) % 100000

    pts = [(eid, coord("x", eid), coord("y", eid)) for eid in ids]
    bycell = defaultdict(list)
    for eid, x, y in pts:
        bycell[(x // 500, y // 500)].append((eid, x, y))
    n_true = 0
    for (cx, cy), members in bycell.items():
        neigh = [
            p
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            for p in bycell.get((cx + dx, cy + dy), ())
        ]
        for a in members:
            for b in neigh:
                if a[0] < b[0] and (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2 <= 250000:
                    n_true += 1
    out = SPECS["ext_grid_spatial_join"].spark(spark, sf_dir).collect()
    assert out, "radius pairs must exist at every sf"
    assert out[0]["n_pairs_total"] == n_true
    d2s = [r["d2"] for r in out]
    assert d2s == sorted(d2s)


def test_grid_spatial_join_plan_has_no_cartesian(spark, sf_dir):
    plan = SPECS["ext_grid_spatial_join"].spark(
        spark, sf_dir
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the 1-row count total is the only nested-loop join allowed
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_span_dedup_plan_has_no_cartesian(spark, sf_dir):
    plan = SPECS["ext_substring_span_dedup"].spark(
        spark, sf_dir
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_isotonic_minimax_equals_classic_pav(spark, sf_dir):
    """The minimax identity must equal the textbook sequential
    pool-adjacent-violators sweep (independent implementation sharing
    no machinery with either engine)."""
    from nibbler_spark.queries import load_all

    rows = (
        load_all()["ext_isotonic_regression"].spark(spark, sf_dir).collect()
    )
    pts = [(r["disc_cents"], r["n"], r["n_returned"]) for r in rows]

    # classic weighted PAV
    blocks = [[n, s] for (_, n, s) in pts]  # [weight, sum]
    merged: list[list[int]] = []
    for b in blocks:
        merged.append(list(b))
        while len(merged) >= 2 and (
            merged[-2][1] * merged[-1][0]
            > merged[-1][1] * merged[-2][0]
        ):  # prev mean > cur mean (cross-multiplied): pool
            w2, s2 = merged.pop()
            merged[-1][0] += w2
            merged[-1][1] += s2
    # map each original point back to its pooled block's mean
    means = []
    bi, remaining = 0, merged[0][0]
    for _, n, _ in pts:
        while remaining < n:
            # a block boundary can't split an original point: PAV pools
            # whole points, so weights always align
            raise AssertionError("block misalignment")
        means.append(merged[bi][1] / merged[bi][0])
        remaining -= n
        if remaining == 0 and bi + 1 < len(merged):
            bi += 1
            remaining = merged[bi][0]
    assert len(means) == len(pts)
    for r, m in zip(rows, means):
        assert abs(r["fitted_rate"] - m) <= 1e-6
    # and monotonicity, the whole point
    assert all(
        rows[i]["fitted_rate"] <= rows[i + 1]["fitted_rate"] + 1e-12
        for i in range(len(rows) - 1)
    )


def test_dsir_kappa_matches_sklearn_free_reference(spark, sf_dir):
    """Cohen's kappa re-derived from the confusion cells in Fraction
    arithmetic; the cells themselves must describe a real partition of
    the corpus and the published double must equal num/den exactly."""
    from fractions import Fraction

    from nibbler_spark.queries import load_all
    from nibbler_spark.sources import load_table

    r = (
        load_all()["ext_dsir_classifier_kappa"]
        .spark(spark, sf_dir)
        .collect()[0]
    )
    tp, fp, fn, tn = r["tp"], r["fp"], r["fn"], r["tn"]
    n = tp + fp + fn + tn
    assert r["n"] == n
    assert n == load_table(spark, sf_dir, "documents").count()
    po = Fraction(tp + tn, n)
    pe = Fraction((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn), n * n)
    kappa = (po - pe) / (1 - pe)
    assert Fraction(r["kappa_num"], r["kappa_den"]) == kappa
    assert r["kappa"] == r["kappa_num"] / r["kappa_den"]
    # the scorer must beat chance as an English detector
    assert kappa > 0
