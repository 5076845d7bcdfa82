"""Round-10 changes: brute-force / identity tests for the r9-verdict
reworks — the persisted shared NSW graph, the cluster-mass-capped
DBSCAN, and the CDC text-carry fix. The oracle drive checks
Spark == DuckDB; these check the SEMANTICS are the declared ones,
independent of both engines where possible.
"""

from __future__ import annotations

import hashlib

import pytest


def test_nsw_persisted_graph_identical_to_inline_build(spark, sf_dir):
    """The cached_dir snapshot of the NN-descent layer-0 graph must be
    row-identical to a from-scratch build — losslessness is what lets
    NSW and HNSW share one build while their oracles replay the build
    from the raw table."""
    from nibbler_spark.queries.retrieval import (
        nsw_descent_edges,
        nsw_descent_edges_inline,
    )

    edges_p, assigned_p, n_p, md_p = nsw_descent_edges(spark, sf_dir)
    edges_i, assigned_i, n_i, md_i = nsw_descent_edges_inline(spark, sf_dir)
    assert (n_p, md_p) == (n_i, md_i)
    ep = {(r["src"], r["dst"]) for r in edges_p.collect()}
    ei = {(r["src"], r["dst"]) for r in edges_i.collect()}
    assert ep == ei
    ap = {(r["vec_id"], r["cell"], r["cell2"]) for r in assigned_p.collect()}
    ai = {(r["vec_id"], r["cell"], r["cell2"]) for r in assigned_i.collect()}
    assert ap == ai


def _brute_dbscan(pts, eps2, min_pts=4, rounds=3):
    """Plain all-pairs DBSCAN with 3-round min-label propagation —
    the ORIGINAL (pre-cap) semantics _dbscan_capped must reproduce."""
    ids = sorted(pts)
    nbr = {
        a: [
            b
            for b in ids
            if (pts[a][0] - pts[b][0]) ** 2 + (pts[a][1] - pts[b][1]) ** 2
            <= eps2
        ]
        for a in ids
    }  # includes self, mirroring the query's self-pair counting
    core = {a for a in ids if len(nbr[a]) >= min_pts}
    labels = {a: a for a in core}
    for _ in range(rounds):
        prop = {}
        for a in core:
            cand = [labels[b] for b in nbr[a] if b in core and b != a]
            if cand:
                prop[a] = min(cand)
        labels = {
            a: min(labels[a], prop.get(a, labels[a])) for a in core
        }
    border = {}
    for a in ids:
        if a in core:
            continue
        cand = [labels[b] for b in nbr[a] if b in core]
        if cand:
            border[a] = min(cand)
    stats = {}
    for a, lab in labels.items():
        stats.setdefault(lab, [0, 0])[0] += 1
    for a, lab in border.items():
        stats.setdefault(lab, [0, 0])[1] += 1
    n_noise = len(ids) - len(core) - len(border)
    return stats, n_noise, len(ids)


def test_dbscan_capped_matches_all_pairs_with_above_cap_cluster(spark):
    """_dbscan_capped on a fixture with an ABOVE-CAP cluster (40 points
    inside one 300-box => dense sub-cells well past minPts, exercising
    the clique-certificate path, plus certified cross-cell pairs)
    must equal the plain all-pairs 3-round replay: same per-cluster
    core/border counts, same noise. Also plants two dense blobs ~600
    apart so the bbox AMBIGUOUS band (min<=eps2<max) is non-empty and
    the point-level relief valve runs."""
    from pyspark.sql import functions as F  # noqa: F401

    from nibbler_spark.queries.scale_patterns import _dbscan_capped

    pts = {}
    # above-cap cluster: 40 points in a 300-box at (10000, 10000)
    for k in range(40):
        hx = int(hashlib.md5(f"ax:{k}".encode()).hexdigest()[:12], 16) % 300
        hy = int(hashlib.md5(f"ay:{k}".encode()).hexdigest()[:12], 16) % 300
        pts[k] = (10000 + hx, 10000 + hy)
    # second blob ~600 away: cross-blob cell pairs are ambiguous at
    # eps=500 (some pairs in range, some not)
    for k in range(12):
        hx = int(hashlib.md5(f"bx:{k}".encode()).hexdigest()[:12], 16) % 200
        hy = int(hashlib.md5(f"by:{k}".encode()).hexdigest()[:12], 16) % 200
        pts[100 + k] = (10600 + hx, 10000 + hy)
    # thin scatter incl. border candidates and pure noise
    pts[200] = (10450, 10450)  # likely border of blob A
    pts[201] = (30000, 30000)  # noise
    pts[202] = (30020, 30010)  # noise pair (2 < minPts)
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in sorted(pts.items())],
        "event_id long, xi long, yi long",
    )
    got = {
        r["cluster_label"]: (
            r["n_core"],
            r["n_border"],
            r["n_noise"],
            r["n_points"],
        )
        for r in _dbscan_capped(spark, df, eps2=250_000, wcell=500)
        .collect()
    }
    stats, n_noise, n_points = _brute_dbscan(pts, 250_000)
    top = sorted(
        stats.items(), key=lambda kv: (-(kv[1][0] + kv[1][1]), kv[0])
    )[:10]
    want = {
        lab: (c, b, n_noise, n_points) for lab, (c, b) in top
    }
    assert got == want
    # the fixture really exercises the dense path: blob A is above cap
    assert any(c >= 40 for c, _, _, _ in got.values())


def test_dbscan_capped_matches_oracle_semantics_sparse_only(spark):
    """All-sparse fixture (no sub-cell reaches minPts): the capped path
    must degrade to exactly the stencil-join semantics."""
    from nibbler_spark.queries.scale_patterns import _dbscan_capped

    pts = {}
    for k in range(30):
        hx = int(hashlib.md5(f"sx:{k}".encode()).hexdigest()[:12], 16)
        hy = int(hashlib.md5(f"sy:{k}".encode()).hexdigest()[:12], 16)
        pts[k] = (hx % 3000, hy % 3000)
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in sorted(pts.items())],
        "event_id long, xi long, yi long",
    )
    got = {
        r["cluster_label"]: (r["n_core"], r["n_border"])
        for r in _dbscan_capped(spark, df, eps2=250_000, wcell=500)
        .collect()
    }
    stats, n_noise, n_points = _brute_dbscan(pts, 250_000)
    top = sorted(
        stats.items(), key=lambda kv: (-(kv[1][0] + kv[1][1]), kv[0])
    )[:10]
    assert got == {lab: (c, b) for lab, (c, b) in top}


def test_cdc_chunk_window_exchange_carries_no_text(spark, sf_dir):
    """The r9 advisory fix: the doc_id window exchange must project
    only (doc_id, lang, i[, w]) — the document text reaches the chunk
    hash via the post-window join, crossing the wire once per doc."""
    from nibbler_spark.queries import load_all

    df = load_all()["ext_cdc_chunk_dedup"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # find the window operator's child exchange projection: the text
    # column must not appear between the first window and its exchange
    import re

    wins = [
        seg
        for seg in plan.split("+-")
        if "Window" in seg or "Exchange hashpartitioning(doc_id" in seg
    ]
    assert wins, "expected a doc_id-partitioned window in the plan"
    for seg in wins:
        assert "text" not in seg, f"text crosses the window exchange: {seg}"


def test_unicode_fold_dedup_brute_force(spark, sf_dir):
    """Pure-Python replay of the declared-subset NFKC fold + planted
    homoglyph twins: every planted twin must collapse onto its ASCII
    original (keeper = original doc_id), and the Spark output must
    equal the replay group-for-group."""
    import hashlib as _h

    from nibbler_spark.queries import load_all
    from nibbler_spark.queries.llm_dedup import (
        _UF_CIRCLED,
        _UF_FW_DST,
        _UF_FW_SRC,
        _UF_LIGS,
        _UF_SUP,
    )
    from nibbler_spark.sources import load_table

    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    fw_lower = "".join(chr(0xFF41 + i) for i in range(26))

    def plant(t):
        t = t.replace("st", "ﬆ").replace("fi", "ﬁ")
        return t.translate(
            str.maketrans("abcdefghijklmnopqrstuvwxyz", fw_lower)
        )

    tr = str.maketrans(
        _UF_FW_SRC + "".join(s for s, _ in _UF_SUP + _UF_CIRCLED),
        _UF_FW_DST + "".join(d for _, d in _UF_SUP + _UF_CIRCLED),
    )

    def fold(t):
        t = t.translate(tr)
        for src, dst in _UF_LIGS:
            t = t.replace(src, dst)
        return t

    corpus = dict(docs)
    for did, t in docs.items():
        if did % 11 == 0:
            corpus[did + 10_000_000] = plant(t)
    groups = {}
    for did, t in sorted(corpus.items()):
        key = _h.md5(fold(t).encode()).hexdigest()
        g = groups.setdefault(key, [0, None, 0])
        g[0] += 1
        g[1] = did if g[1] is None else min(g[1], did)
        g[2] += 1 if did >= 10_000_000 else 0
    want = {
        k: tuple(v) for k, v in groups.items() if v[0] > 1
    }
    got = {
        r["canon_key"]: (r["n_members"], r["keeper_doc_id"], r["n_planted"])
        for r in load_all()["ext_unicode_fold_dedup"]
        .spark(spark, sf_dir)
        .collect()
    }
    assert got == want
    # the fixture really planted: every 11th doc produced a twin group
    # whose keeper is the ASCII original
    planted_groups = [v for v in got.values() if v[2] >= 1]
    assert planted_groups
    assert all(k < 10_000_000 for _, k, _ in planted_groups)
    # and the fold round-trips: fold(plant(x)) == x for ASCII corpus
    for did, t in list(docs.items())[:50]:
        assert fold(plant(t)) == t


def _md5i(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def test_self_consistency_vote_brute_force(spark, sf_dir):
    """Replay the 9-sample plurality vote in pure Python."""
    from collections import Counter

    from nibbler_spark.queries import load_all
    from nibbler_spark.sources import load_table

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang")
        .collect()
    )
    agg = {}
    for r in docs:
        truth = r["doc_id"] % 5
        answers = []
        for s in range(9):
            hs = _md5i(f"{r['doc_id']}:{s}")
            answers.append(truth if hs % 10 < 6 else 5 + hs % 4)
        cnt = Counter(answers)
        best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))[0]
        vc = 1 if best == truth else 0
        gc = 1 if answers[0] == truth else 0
        a = agg.setdefault(r["lang"], [0, 0, 0, 0, 0])
        a[0] += 1
        a[1] += gc
        a[2] += vc
        a[3] += 1 if vc and not gc else 0
        a[4] += 1 if gc and not vc else 0
    want = {
        lang: (
            n,
            1_000_000 * g // n,
            1_000_000 * v // n,
            resc,
            deg,
            v >= g,
        )
        for lang, (n, g, v, resc, deg) in agg.items()
    }
    got = {
        r["lang"]: (
            r["n_tasks"],
            r["greedy_acc_micro"],
            r["vote_acc_micro"],
            r["n_rescued"],
            r["n_degraded"],
            r["vote_not_worse"],
        )
        for r in load_all()["ext_self_consistency_vote"]
        .spark(spark, sf_dir)
        .collect()
    }
    assert got == want
    assert all(v[5] for v in got.values())  # the self-consistency claim


def test_scaling_law_fit_brute_force(spark, sf_dir):
    """Replay the gridded-ln OLS in exact integer arithmetic and check
    the planted slope is recovered within the jitter bound."""
    import math

    from nibbler_spark.queries import load_all
    from nibbler_spark.sources import load_table

    langs = {
        r["lang"]
        for r in load_table(spark, sf_dir, "documents")
        .select("lang")
        .distinct()
        .collect()
    }
    want = {}
    for lang in langs:
        b_milli = 300 + (_md5i(f"b:{lang}") % 5) * 100
        xs, ys = [], []
        for i in range(10):
            xg = math.floor(math.log(1_000_000 * (1 << i)) * 1e9)
            jit = _md5i(f"{lang}:{i}") % 2001 - 1000
            # floor-division semantics must match SQL DIV for positives
            yg = 20_000_000_000 - (b_milli * xg) // 1000 + jit
            xs.append(xg)
            ys.append(yg)
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        num, den = n * sxy - sx * sy, n * sxx - sx * sx
        # SQL DIV truncates toward zero; Python // floors — align
        slope = (1_000_000 * num) // den
        if (1_000_000 * num) % den and (num < 0) != (den < 0):
            slope += 1
        t = slope * sx
        t_div = t // 1_000_000
        if t % 1_000_000 and t < 0:
            t_div += 1  # SQL DIV truncates toward zero
        # (sy - t_div) and n are positive here, so // matches SQL DIV
        icg = (sy - t_div) // n
        want[lang] = (b_milli, slope, icg, abs(slope + b_milli * 1000) <= 2)
    got = {
        r["lang"]: (
            r["planted_b_milli"],
            r["slope_micro"],
            r["intercept_g"],
            r["recovered_ok"],
        )
        for r in load_all()["ext_scaling_law_fit"]
        .spark(spark, sf_dir)
        .collect()
    }
    assert got == want
    assert all(v[3] for v in got.values())


def test_mixture_reweight_brute_force(spark, sf_dir):
    """Replay the one-round DoReMi reweighting in pure Python."""
    from nibbler_spark.queries import load_all
    from nibbler_spark.sources import load_table

    rows = (
        load_table(spark, sf_dir, "documents")
        .select("lang", "source", "text")
        .collect()
    )
    per = {}
    tot_div = 0
    for r in rows:
        toks = r["text"].split(" ")
        dm = 1_000_000 * len(set(toks)) // len(toks)
        tot_div += dm
        d = per.setdefault((r["lang"], r["source"]), [0, 0])
        d[0] += 1
        d[1] += dm
    N = len(rows)
    ref = tot_div // N
    num = {}
    for k, (n, s) in per.items():
        loss = s // n
        excess = max(0, loss - ref)
        num[k] = (n, loss, excess, n * (1_000_000 + 10 * excess))
    den = sum(v[3] for v in num.values())
    want = {
        k: (
            n,
            loss,
            ref,
            excess,
            1_000_000 * n // N,
            1_000_000 * nm // den,
        )
        for k, (n, loss, excess, nm) in num.items()
    }
    got = {
        (r["lang"], r["source"]): (
            r["n_docs"],
            r["loss_micro"],
            r["ref_micro"],
            r["excess_micro"],
            r["old_weight_micro"],
            r["new_weight_micro"],
        )
        for r in load_all()["ext_mixture_reweight"]
        .spark(spark, sf_dir)
        .collect()
    }
    assert got == want


def test_stream_ddsketch_matches_offline_prefix_sketch(spark, sf_dir):
    """The online keyed-count trajectory must equal the pure-Python
    offline prefix sketch at every epoch, and the bucket identity
    gridln(true_q) // 25e6 == answer bucket must hold."""
    import math
    from collections import Counter

    from nibbler_spark.queries import load_all
    from nibbler_spark.sources import load_table

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    )
    hi = max(r["doc_id"] for r in docs)
    by_epoch = [[] for _ in range(4)]
    for r in docs:
        ep = min(3, r["doc_id"] * 4 // (hi + 1))
        for tok in r["text"].split(" "):
            v = 1 + (_md5i(tok) // 64) % 1_000_000
            by_epoch[ep].append(v)
    got = {
        r["epoch"]: r.asDict()
        for r in load_all()["i55_stream_ddsketch_union"]
        .spark(spark, sf_dir)
        .collect()
    }
    prefix = []
    for ep in range(4):
        prefix += by_epoch[ep]
        buckets = Counter(
            math.floor(math.log(v) * 1e9) // 25_000_000 for v in prefix
        )
        n = len(prefix)
        g = got[ep]
        assert g["n_values"] == n
        assert g["n_buckets"] == len(buckets)
        assert g["bucket_chk"] == sum(i * c for i, c in buckets.items())
        svals = sorted(prefix)
        for q, bcol, tcol, okcol in (
            (50, "p50_bucket", "true_p50", "p50_ok"),
            (95, "p95_bucket", "true_p95", "p95_ok"),
            (99, "p99_bucket", "true_p99", "p99_ok"),
        ):
            r_ = (q * n + 99) // 100
            true_v = svals[r_ - 1]
            cum = 0
            bucket = None
            for i in sorted(buckets):
                cum += buckets[i]
                if cum >= r_:
                    bucket = i
                    break
            assert g[bcol] == bucket
            assert g[tcol] == true_v
            assert g[okcol] is True
            assert math.floor(math.log(true_v) * 1e9) // 25_000_000 == bucket


def test_grpo_advantage_brute_force(spark, sf_dir):
    """Replay the group-relative advantage computation in pure Python;
    the centering invariant must hold per lang."""
    from nibbler_spark.queries import load_all
    from nibbler_spark.sources import load_table

    docs = (
        load_table(spark, sf_dir, "documents")
        .where("doc_id % 3 = 0")
        .select("doc_id", "lang")
        .collect()
    )
    agg = {}
    for r in docs:
        rewards = [
            _md5i(f"{r['doc_id']}/{s}") % 1_000_000 for s in range(8)
        ]
        mean = sum(rewards) // 8
        advs = [x - mean for x in rewards]
        a = agg.setdefault(
            r["lang"], {"n": 0, "p": 0, "pos": 0, "s": 0,
                        "mx": None, "mn": None}
        )
        a["n"] += 8
        a["p"] += 1
        a["pos"] += sum(1 for x in advs if x > 0)
        a["s"] += sum(advs)
        hi, lo = max(advs), min(advs)
        a["mx"] = hi if a["mx"] is None else max(a["mx"], hi)
        a["mn"] = lo if a["mn"] is None else min(a["mn"], lo)
    want = {
        k: (v["n"], v["p"], v["pos"], v["s"], v["mx"], v["mn"],
            abs(v["s"]) <= 8 * v["p"])
        for k, v in agg.items()
    }
    got = {
        r["lang"]: (
            r["n_samples"], r["n_prompts"], r["n_positive"],
            r["sum_adv_micro"], r["max_adv_micro"], r["min_adv_micro"],
            r["centered_ok"],
        )
        for r in load_all()["ext_grpo_advantage"]
        .spark(spark, sf_dir)
        .collect()
    }
    assert got == want
    assert all(v[6] for v in got.values())


def test_rejection_sampling_ft_brute_force(spark, sf_dir):
    """Replay the threshold + per-answer dedupe curation in Python."""
    from nibbler_spark.queries import load_all
    from nibbler_spark.sources import load_table

    docs = (
        load_table(spark, sf_dir, "documents")
        .where("doc_id % 4 = 1")
        .select("doc_id", "lang")
        .collect()
    )
    kept = {}
    for r in docs:
        for s in range(16):
            h = hashlib.md5(f"{r['doc_id']}#{s}".encode()).hexdigest()
            reward = int(h[:12], 16) % 1_000_000
            akey = int(h[12:20], 16) % 50
            if reward < 700_000:
                continue
            k = (r["doc_id"], r["lang"], akey)
            cur = kept.get(k)
            if cur is None or (-reward * 100 + s) < (
                -cur[0] * 100 + cur[1]
            ):
                kept[k] = (reward, s)
    agg = {}
    for (pid, lang, _), (reward, s) in kept.items():
        a = agg.setdefault(lang, {"pr": set(), "n": 0, "sr": 0, "cs": 0})
        a["pr"].add(pid)
        a["n"] += 1
        a["sr"] += reward
        a["cs"] += s
    want = {
        k: (
            len(v["pr"]), v["n"], v["sr"],
            1_000_000 * v["n"] // (16 * len(v["pr"])), v["cs"],
        )
        for k, v in agg.items()
    }
    got = {
        r["lang"]: (
            r["n_prompts_kept"], r["n_examples"], r["sum_reward_micro"],
            r["keep_rate_micro"], r["kept_checksum"],
        )
        for r in load_all()["ext_rejection_sampling_ft"]
        .spark(spark, sf_dir)
        .collect()
    }
    assert got == want


def test_bootstrap_ci_brute_force(spark, sf_dir):
    """Replay the deterministic percentile bootstrap in pure Python."""
    from nibbler_spark.queries import load_all
    from nibbler_spark.sources import load_table

    rows = (
        load_table(spark, sf_dir, "documents")
        .select("lang", "doc_id", "text")
        .collect()
    )
    by_lang = {}
    for r in sorted(rows, key=lambda r: (r["lang"], r["doc_id"])):
        toks = r["text"].split(" ")
        qv = 1_000_000 * len(set(toks)) // len(toks) + len(toks)
        by_lang.setdefault(r["lang"], []).append(1 if qv >= 700_000 else 0)
    want = {}
    for lang, hits in by_lang.items():
        n = len(hits)
        reps = []
        for b in range(200):
            s = sum(
                hits[_md5i(f"{lang}:{b}:{d}") % n] for d in range(100)
            )
            reps.append((10_000 * s // 100, b))
        reps.sort()
        lo, hi = reps[4][0], reps[194][0]
        point = 10_000 * sum(hits) // n
        want[lang] = (point, lo, hi, lo <= point <= hi)
    got = {
        r["lang"]: (
            r["point_bp"], r["lo_bp"], r["hi_bp"], r["point_in_ci"]
        )
        for r in load_all()["ext_bootstrap_ci"].spark(spark, sf_dir)
        .collect()
    }
    assert got == want
    assert all(v[3] for v in got.values())
