"""Deterministic scale-ladder corpus generator (round-5 verdict item #1).

The driver ships `documents.parquet` only up to sf0.1 (5,000 docs).  The
100 TB design claims for the dedup/graph flagships (k05_minhash_lsh,
ext_label_propagation, ext_kcore_decomposition, ext_containment_dedup,
ext_substring_span_dedup) were plan-asserted but never *measured* beyond
sf0.1 — this module closes that gap by generating statistically-matched
corpora at any size, seeded, with the same generative shape as the
driver's seed-42 generator (measured from the real sf0.1 table):

- vocabulary: the exact 30 uniform tokens of the driver corpus (the
  31st token, ``dup``, is the planted near-duplicate marker);
- token count per doc: uniform 10..100 (measured min/max/mean
  10/100/54.1);
- lang mix: en ~41%, de/es/fr/zh ~14.7% each (measured 2059/702/748/
  752/753 at sf0.1);
- source: uniform src0..src19;
- planted near-dups: ~5% of docs are a copy of a uniformly-random
  earlier doc with `` dup`` appended (measured 250 dup-marked docs per
  5,000, 243 of them exact `replace(text,' dup','')` matches of another
  doc) — this is what gives the corpus its linear-in-n true-pair count,
  the property the scale ladder pins.

Vocabulary scaling above the anchor: a FIXED 30-token vocab saturates
the 3-token-shingle space (27,000 combos) as n grows — per-shingle df
rises ∝ n and any exact J >= 0.6 pair set becomes a quadratic OUTPUT no
algorithm can make sub-quadratic (the r3 k05 lesson, NOTES.md).  Real
crawl corpora do the opposite: their shingle space grows with the
corpus, holding per-pair shingle-collision density roughly constant.
The generator therefore scales the vocab as ``round(30 * (n/5000)**(1/3))``
(3-shingle space then grows ∝ n, pinning expected df constant) — at the
5,000-doc anchor this is exactly the driver's 30 tokens, so generated
sf0.1 matches the real sf0.1 distributionally, and larger rungs model
the 100 TB density regime rather than the fixture's degeneracy.  Extra
tokens are ``w000``..; pass ``vocab_size`` explicitly to override.

NOT bit-identical to the driver data (the driver's RNG stream is not
public); identical *distributions*, which is what wall-time scaling
measurements need.  Correctness at sf1 is still checked: every flagship
returns either bounded-mode booleans or integer-exact aggregates, and
the ladder asserts the bounded checks hold at every rung.

Usage:
    python tools/gen_scale_data.py 1.0          # -> .scale_data/sf1/
    python tools/gen_scale_data.py 0.3 --out /tmp/sf0.3
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# The 30 real-corpus tokens (alphabetical), measured uniform at sf0.1.
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
SOURCES = [f"src{i}" for i in range(20)]
DOCS_PER_SF = 50_000  # sf0.1 == 5,000 docs
DUP_RATE = 0.05


def auto_vocab_size(n_docs: int) -> int:
    """Density-matched vocab size: 30 at the 5,000-doc anchor, growing
    as n^(1/3) so the 3-shingle space grows ~linearly in n (see module
    docstring).  Floor of 8 keeps tiny rungs non-degenerate."""
    return max(8, int(round(30.0 * (n_docs / 5000.0) ** (1.0 / 3.0))))


def _vocab(vocab_size: int) -> list[str]:
    if vocab_size <= len(VOCAB):
        return VOCAB[:vocab_size]
    extra = [f"w{i:03d}" for i in range(vocab_size - len(VOCAB))]
    return VOCAB + extra


def generate_documents(
    n_docs: int, seed: int = 42, vocab_size: int | None = None
) -> pa.Table:
    """n_docs documents with the driver corpus's measured distributions."""
    rng = np.random.default_rng(seed)
    words = _vocab(auto_vocab_size(n_docs) if vocab_size is None else vocab_size)
    lengths = rng.integers(10, 101, size=n_docs)
    total = int(lengths.sum())
    tok_idx = rng.integers(0, len(words), size=total)
    offs = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(lengths, out=offs[1:])
    vocab = np.asarray(words)
    texts = [
        " ".join(vocab[tok_idx[offs[i]: offs[i + 1]]])
        for i in range(n_docs)
    ]
    # Plant near-dups: ~DUP_RATE of docs (never doc 0) become a copy of
    # a uniformly-random earlier doc with " dup" appended.
    is_dup = rng.random(n_docs) < DUP_RATE
    is_dup[0] = False
    for i in np.flatnonzero(is_dup):
        j = int(rng.integers(0, i))
        texts[i] = texts[j] + " dup"
    langs = rng.choice(LANGS, size=n_docs, p=LANG_P)
    sources = rng.choice(SOURCES, size=n_docs)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs.tolist(), type=pa.string()),
            "source": pa.array(sources.tolist(), type=pa.string()),
            "n_chars": pa.array(
                np.asarray([len(t) for t in texts], dtype=np.int64)
            ),
        }
    )


EVENTS_PER_SF = 1_000_000  # sf0.1 == 100,000 rows (measured)
USERS_PER_SF = 15_000  # user_id uniform over 15,000*sf users
VECS_PER_SF = 20_000  # sf0.1 == 2,000 vectors
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
_TS0 = np.datetime64("2024-01-01T00:00:00.000000")
_TS_SPAN_US = 30 * 86_400 * 1_000_000  # 30 days (measured Jan 1-30)


def generate_events(n_events: int, sf: float, seed: int = 43) -> pa.Table:
    """Events matched to the driver table's measured distributions:
    uniform event types (5), uniform users over 15,000*sf ids, uniform
    timestamps across 30 days of Jan-2024, exponential(mean 50) values
    rounded to cents (measured quantiles 5.4/14.6/34.8/68.9/114/228 ==
    Exp(50)'s), props = {"k": uniform 0..99}."""
    rng = np.random.default_rng(seed)
    n_users = max(1, int(round(USERS_PER_SF * sf)))
    ts = _TS0 + rng.integers(0, _TS_SPAN_US, size=n_events).astype(
        "timedelta64[us]"
    )
    value = np.round(rng.exponential(50.0, size=n_events), 2)
    k = rng.integers(0, 100, size=n_events)
    return pa.table(
        {
            "event_id": pa.array(np.arange(n_events, dtype=np.int64)),
            "ts": pa.array(ts, type=pa.timestamp("us")),
            "user_id": pa.array(
                rng.integers(0, n_users, size=n_events).astype(np.int64)
            ),
            "event_type": pa.array(
                np.asarray(EVENT_TYPES)[
                    rng.integers(0, len(EVENT_TYPES), size=n_events)
                ].tolist(),
                type=pa.string(),
            ),
            "value": pa.array(value, type=pa.float64()),
            "props": pa.array(
                [f'{{"k": {int(x)}}}' for x in k], type=pa.string()
            ),
        }
    )


def generate_embeddings(n_vecs: int, seed: int = 44) -> pa.Table:
    """Embeddings matched to the driver table: unit-norm float32[64]
    gaussian directions (measured: norm 1.0, per-dim std 1/sqrt(64),
    label geometrically uncorrelated), label uniform 0..9."""
    rng = np.random.default_rng(seed)
    v = rng.standard_normal((n_vecs, 64)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n_vecs, dtype=np.int64)),
            "embedding": pa.array(
                [row for row in v], type=pa.list_(pa.float32())
            ),
            "label": pa.array(
                rng.integers(0, 10, size=n_vecs).astype(np.int32)
            ),
        }
    )


# --- TPC-H-shaped tables (r10 verdict #2): the shuffle audit skipped
# 63 queries (all tq*, the skew/bloom/bucketed join family) because the
# rungs only carried documents/events/embeddings. These generators
# match the driver testdata's measured distributions (sf0.01 profile:
# all columns INDEPENDENT uniforms — l_extendedprice is NOT tied to
# p_retailprice, l_shipdate not to o_orderdate, o_totalprice not to
# the lineitem sum; lines-per-order is Binomial(n_li, 1/n_orders) via
# uniform l_orderkey draws, ~Poisson(4)) at any scale. Row ratios per
# unit sf: customer 150k, supplier 10k, part 200k, orders 1.5M,
# lineitem 6M; region/nation fixed at 5/25.
REGION_NAMES = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
MKT_SEGMENTS = [
    "AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY",
]
P_NAME_1 = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
P_NAME_2 = [
    "anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget",
]
P_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
O_STATUS = ["F", "O", "P"]
O_PRIORITIES = [
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
]
RETURN_FLAGS = ["A", "N", "R"]
LINE_STATUS = ["F", "O"]
_DATE0 = np.datetime64("1995-01-01T00:00:00.000000")


def generate_tpch(sf: float, seed: int = 45) -> dict[str, pa.Table]:
    """All 7 TPC-H-shaped tables at scale ``sf``, distribution-matched
    to the driver testdata (see the profile note above)."""
    rng = np.random.default_rng(seed)
    n_cust = max(1, int(round(150_000 * sf)))
    n_supp = max(1, int(round(10_000 * sf)))
    n_part = max(1, int(round(200_000 * sf)))
    n_ord = max(1, int(round(1_500_000 * sf)))
    n_li = max(1, int(round(6_000_000 * sf)))

    region = pa.table(
        {
            "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
            "r_name": pa.array(REGION_NAMES, type=pa.string()),
        }
    )
    nk = np.arange(25, dtype=np.int32)
    nation = pa.table(
        {
            "n_nationkey": pa.array(nk),
            "n_name": pa.array([f"NATION_{i}" for i in nk]),
            "n_regionkey": pa.array((nk % 5).astype(np.int32)),
        }
    )
    ck = np.arange(n_cust, dtype=np.int64)
    customer = pa.table(
        {
            "c_custkey": pa.array(ck),
            "c_name": pa.array([f"Customer#{i:09d}" for i in ck]),
            "c_nationkey": pa.array(
                rng.integers(0, 25, size=n_cust).astype(np.int32)
            ),
            "c_acctbal": pa.array(
                np.round(rng.uniform(-1000, 10000, size=n_cust), 2)
            ),
            "c_mktsegment": pa.array(
                np.asarray(MKT_SEGMENTS)[
                    rng.integers(0, 5, size=n_cust)
                ].tolist()
            ),
        }
    )
    sk = np.arange(n_supp, dtype=np.int64)
    supplier = pa.table(
        {
            "s_suppkey": pa.array(sk),
            "s_name": pa.array([f"Supplier#{i:09d}" for i in sk]),
            "s_nationkey": pa.array(
                rng.integers(0, 25, size=n_supp).astype(np.int32)
            ),
            "s_acctbal": pa.array(
                np.round(rng.uniform(-1000, 10000, size=n_supp), 2)
            ),
        }
    )
    pk = np.arange(n_part, dtype=np.int64)
    part = pa.table(
        {
            "p_partkey": pa.array(pk),
            "p_name": pa.array(
                [
                    f"{P_NAME_1[a]} {P_NAME_2[b]}"
                    for a, b in zip(
                        rng.integers(0, 8, size=n_part),
                        rng.integers(0, 8, size=n_part),
                    )
                ]
            ),
            "p_brand": pa.array(
                [f"Brand#{i}" for i in rng.integers(1, 26, size=n_part)]
            ),
            "p_type": pa.array(
                np.asarray(P_TYPES)[
                    rng.integers(0, 6, size=n_part)
                ].tolist()
            ),
            "p_size": pa.array(
                rng.integers(1, 51, size=n_part).astype(np.int32)
            ),
            "p_retailprice": pa.array(
                np.round(900.0 + (pk % 1000) * 0.1, 1)
            ),
        }
    )
    ok = np.arange(n_ord, dtype=np.int64)
    orders = pa.table(
        {
            "o_orderkey": pa.array(ok),
            "o_custkey": pa.array(
                rng.integers(0, n_cust, size=n_ord).astype(np.int64)
            ),
            "o_orderstatus": pa.array(
                np.asarray(O_STATUS)[
                    rng.integers(0, 3, size=n_ord)
                ].tolist()
            ),
            "o_totalprice": pa.array(
                np.round(rng.uniform(1000, 500000, size=n_ord), 2)
            ),
            "o_orderdate": pa.array(
                _DATE0
                + (
                    rng.integers(0, 2405, size=n_ord) * 86_400_000_000
                ).astype("timedelta64[us]"),
                type=pa.timestamp("us"),
            ),
            "o_orderpriority": pa.array(
                np.asarray(O_PRIORITIES)[
                    rng.integers(0, 5, size=n_ord)
                ].tolist()
            ),
        }
    )
    lineitem = pa.table(
        {
            "l_orderkey": pa.array(
                rng.integers(0, n_ord, size=n_li).astype(np.int64)
            ),
            "l_partkey": pa.array(
                rng.integers(0, n_part, size=n_li).astype(np.int64)
            ),
            "l_suppkey": pa.array(
                rng.integers(0, n_supp, size=n_li).astype(np.int64)
            ),
            "l_linenumber": pa.array(
                rng.integers(1, 8, size=n_li).astype(np.int32)
            ),
            "l_quantity": pa.array(
                rng.integers(1, 51, size=n_li).astype(np.float64)
            ),
            "l_extendedprice": pa.array(
                np.round(rng.uniform(900, 105000, size=n_li), 2)
            ),
            "l_discount": pa.array(
                np.round(rng.integers(0, 11, size=n_li) * 0.01, 2)
            ),
            "l_tax": pa.array(
                np.round(rng.integers(0, 9, size=n_li) * 0.01, 2)
            ),
            "l_returnflag": pa.array(
                np.asarray(RETURN_FLAGS)[
                    rng.integers(0, 3, size=n_li)
                ].tolist()
            ),
            "l_linestatus": pa.array(
                np.asarray(LINE_STATUS)[
                    rng.integers(0, 2, size=n_li)
                ].tolist()
            ),
            "l_shipdate": pa.array(
                _DATE0
                + (
                    rng.integers(1, 2501, size=n_li) * 86_400_000_000
                ).astype("timedelta64[us]"),
                type=pa.timestamp("us"),
            ),
        }
    )
    return {
        "region": region,
        "nation": nation,
        "customer": customer,
        "supplier": supplier,
        "part": part,
        "orders": orders,
        "lineitem": lineitem,
    }


def write_sf(sf: float, out_dir: str, seed: int = 42) -> str:
    n = int(round(sf * DOCS_PER_SF))
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "documents.parquet")
    tmp = path + ".tmp"
    pq.write_table(generate_documents(n, seed=seed), tmp)
    os.replace(tmp, path)
    for name, tbl in (
        (
            "events",
            generate_events(int(round(sf * EVENTS_PER_SF)), sf, seed + 1),
        ),
        ("embeddings", generate_embeddings(int(round(sf * VECS_PER_SF)), seed + 2)),
        *generate_tpch(sf, seed + 3).items(),
    ):
        p = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(tbl, p + ".tmp")
        os.replace(p + ".tmp", p)
    return path


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sf", type=float, help="scale factor (sf1 = 50k docs)")
    ap.add_argument("--out", default=None, help="output dir")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale_data",
        f"sf{args.sf:g}",
    )
    path = write_sf(args.sf, out, seed=args.seed)
    print(path)


if __name__ == "__main__":
    main()
