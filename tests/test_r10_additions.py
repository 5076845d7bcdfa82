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
