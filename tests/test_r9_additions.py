"""Round-9 additions: pure-Python brute-force replays of the new
operators, independent of both Spark and DuckDB (the oracle drive
checks Spark == DuckDB; these check the SEMANTICS are the declared
ones).
"""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import pytest

from nibbler_spark.sources import load_table


def _gcos(a, b):
    def dot(x, y):
        return sum(math.floor(p * q * 1e10) for p, q in zip(x, y)) / 1e10

    return math.floor(
        dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))) * 1e9
    )


def _md5_order(ids):
    return sorted(
        ids, key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v)
    )


def test_hnsw_layered_consistent_with_nsw_and_structurally_not_worse(
    spark, sf_dir
):
    """The layered query's l0-only baseline IS ext_nsw_greedy_search's
    walk (same entry, same edges, same hops), its multi-entry selection
    makes regret <= l0_regret STRUCTURAL per probe, and its exact-best
    column must agree with the nsw query's."""
    from nibbler_spark.queries import load_all

    specs = load_all()
    nsw = {
        r["qid"]: r
        for r in specs["ext_nsw_greedy_search"].spark(spark, sf_dir).collect()
    }
    hnsw = {
        r["qid"]: r
        for r in specs["ext_hnsw_layered_search"]
        .spark(spark, sf_dir)
        .collect()
    }
    assert set(nsw) == set(hnsw)
    for qid, h in hnsw.items():
        b = nsw[qid]
        assert h["l0_found"] == b["found"]
        assert h["l0_found_cg"] == b["found_cg"]
        assert h["best_cg"] == b["best_cg"]
        assert h["regret_nano"] <= h["l0_regret_nano"]
        assert h["found_cg"] >= h["l0_found_cg"]
        assert h["layered_total_not_worse"] is True


def test_hnsw_layered_walk_matches_bruteforce(spark, sf_dir):
    """Replay the L2/L1/L0 descent in pure Python.  Layer-0 edges are
    taken from nsw_descent_edges (that build is independently
    brute-force-verified in test_r8_additions'
    test_nsw_greedy_search_matches_bruteforce); the layer membership,
    L1 graph, every walk hop, the multi-entry selection, and the
    regret arithmetic are replayed from scratch here."""
    from nibbler_spark.queries import load_all
    from nibbler_spark.queries.retrieval import _NSW_HOPS, _NSW_KNN
    from nibbler_spark.queries.retrieval import nsw_descent_edges

    vecs = {
        r["vec_id"]: list(r["embedding"])
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    n = len(vecs)
    md = max(1, n // 16)
    ncells = math.isqrt(n)
    if ncells * ncells != n:
        ncells += 1
    n4 = int(math.ceil(math.sqrt(math.sqrt(n))))
    order = _md5_order(vecs)
    seeds = order[:ncells]
    l2 = order[:n4]
    entry = order[0]

    edges_df, _, _, _ = nsw_descent_edges(spark, sf_dir)
    edges = defaultdict(set)
    for r in edges_df.collect():
        edges[r["src"]].add(r["dst"])

    # L1 graph: top-k among seeds, all-pairs
    l1g = defaultdict(set)
    for u in seeds:
        ranked = sorted(
            (-_gcos(vecs[u], vecs[w]), w) for w in seeds if w != u
        )[:_NSW_KNN]
        l1g[u].update(w for _, w in ranked)

    def walk(qid, start, graph, hops):
        cur = start
        for _ in range(hops):
            cands = ({cur} | graph[cur]) - {qid}
            cur = min((-_gcos(vecs[qid], vecs[c]), c) for c in cands)[1]
        return cur

    rows = {
        r["qid"]: r
        for r in load_all()["ext_hnsw_layered_search"]
        .spark(spark, sf_dir)
        .collect()
    }
    qids = sorted(v for v in vecs if v % md == 0)
    assert set(rows) == set(qids)
    tot_lay = tot_l0 = 0
    for qid in qids:
        e2 = min((-_gcos(vecs[qid], vecs[c]), c) for c in l2 if c != qid)[1]
        l1_land = walk(qid, e2, l1g, 2)
        hfound = walk(qid, l1_land, edges, _NSW_HOPS)
        l0_found = walk(qid, entry, edges, _NSW_HOPS)
        h_cg = _gcos(vecs[qid], vecs[hfound])
        b_cg = _gcos(vecs[qid], vecs[l0_found])
        if (b_cg, -l0_found) > (h_cg, -hfound):
            found, found_cg = l0_found, b_cg
        else:
            found, found_cg = hfound, h_cg
        best = max(_gcos(vecs[qid], vecs[w]) for w in vecs if w != qid)
        r = rows[qid]
        assert r["found"] == found
        assert r["found_cg"] == found_cg
        assert r["l0_found"] == l0_found
        assert r["l0_found_cg"] == b_cg
        assert r["best_cg"] == best
        assert r["regret_nano"] == best - found_cg
        assert r["l0_regret_nano"] == best - b_cg
        tot_lay += best - found_cg
        tot_l0 += best - b_cg
    assert all(
        r["layered_total_not_worse"] == (tot_lay <= tot_l0)
        for r in rows.values()
    )
