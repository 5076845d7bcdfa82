"""Spark-level validation of the large-star/small-star connected
components operator (operators/graph.py) against union-find on random
graphs — the algorithm-level twin of ext_cc_two_phase's oracle check."""

from __future__ import annotations

import random

from nibbler_spark.operators.graph import (
    canonical_edges,
    connected_components,
)


def _union_find(nodes, edges):
    p = {n: n for n in nodes}

    def find(x):
        while p[x] != x:
            p[x] = p[p[x]]
            x = p[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            p[max(ru, rv)] = min(ru, rv)
    return {n: find(n) for n in nodes}


def test_cc_matches_union_find_random_graphs(spark):
    rng = random.Random(7)
    for trial in range(8):
        n = rng.randint(2, 120)
        edges = set()
        for _ in range(rng.randint(0, 3 * n)):
            u, v = rng.sample(range(n), 2)
            edges.add((u, v))
        if not edges:
            continue
        df = spark.createDataFrame(
            [(u, v) for u, v in sorted(edges)], "src long, dst long"
        )
        comp = {
            r["node"]: r["component"]
            for r in connected_components(canonical_edges(df)).collect()
        }
        touched = sorted({x for e in edges for x in e})
        truth = _union_find(touched, edges)
        assert comp == {n: truth[n] for n in touched}, f"trial {trial}"


def test_cc_long_chain_converges(spark):
    """A 256-node path graph: diameter 255, but star contraction must
    converge in O(log n) rounds (max_rounds=50 default is far above the
    ~log2(256)=8 needed — the assertion is convergence + correctness)."""
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(255)], "src long, dst long"
    )
    comp = connected_components(canonical_edges(df)).collect()
    assert len(comp) == 256
    assert all(r["component"] == 0 for r in comp)
