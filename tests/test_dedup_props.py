"""Property tests for the df-capped exact-Jaccard inverted index
(queries/llm_dedup.exact_jaccard_pairs) — the k05 recall baseline."""

from __future__ import annotations

import itertools
import random

from nibbler_spark.queries.llm_dedup import exact_jaccard_pairs


def _corpus(spark, docs):
    return spark.createDataFrame(
        [(i, sorted(set(ts))) for i, ts in enumerate(docs)],
        "doc_id long, ts array<string>",
    )


def _pairs(df):
    return sorted((r["doc_a"], r["doc_b"]) for r in df.collect())


def _brute_force(docs, threshold):
    out = []
    for a, b in itertools.combinations(range(len(docs)), 2):
        sa, sb = set(docs[a]), set(docs[b])
        if not sa | sb:
            continue
        if len(sa & sb) / len(sa | sb) >= threshold:
            out.append((a, b))
    return sorted(out)


def test_exact_pairs_match_brute_force_when_cap_inactive(spark):
    rng = random.Random(7)
    vocab = [f"s{i}" for i in range(30)]
    docs = []
    for _ in range(40):
        base = rng.sample(vocab, rng.randint(3, 10))
        docs.append(base)
        if rng.random() < 0.4:  # planted near-dup: mutate one shingle
            dup = list(base)
            dup[rng.randrange(len(dup))] = rng.choice(vocab)
            docs.append(dup)
    t = _corpus(spark, docs)
    got = _pairs(exact_jaccard_pairs(t, threshold=0.6, df_cap=10_000))
    assert got == _brute_force(docs, 0.6)


def test_df_cap_error_is_one_sided(spark):
    """An active cap may only REMOVE pairs (computed J is a lower
    bound), never invent them — the property that keeps a capped
    baseline a valid recall denominator."""
    rng = random.Random(11)
    vocab = [f"s{i}" for i in range(12)]
    boiler = "BOILERPLATE"  # appears in every doc → df = n_docs
    docs = []
    for _ in range(30):
        docs.append(rng.sample(vocab, rng.randint(2, 6)) + [boiler])
    t = _corpus(spark, docs)
    uncapped = set(_pairs(exact_jaccard_pairs(t, 0.5, df_cap=10_000)))
    capped = set(_pairs(exact_jaccard_pairs(t, 0.5, df_cap=5)))
    assert capped <= uncapped
    assert uncapped == set(_brute_force(docs, 0.5))


def test_df_cap_prunes_hot_shingles_from_the_join(spark):
    """With the cap at 1 every shared shingle is hot → empty index →
    zero candidate pairs, proving the anti-join actually removes
    high-df shingles from the probe."""
    docs = [["x", "y"], ["x", "y"], ["x", "z"]]
    t = _corpus(spark, docs)
    assert _pairs(exact_jaccard_pairs(t, 0.01, df_cap=1)) == []
    # and cap >= max df restores the full exact set
    assert _pairs(exact_jaccard_pairs(t, 0.01, df_cap=3)) == [
        (0, 1),
        (0, 2),
        (1, 2),
    ]
