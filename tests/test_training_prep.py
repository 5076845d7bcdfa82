"""Semantic invariants for the training-prep operator family — the
properties the DuckDB hash oracles can't state directly (cross-row
consistency, closed-form recomputation, value bounds)."""

from __future__ import annotations

from nibbler_spark.queries import load_all
from nibbler_spark.queries.training_prep import _NGRAM_N, _PACK_CTX

SPECS = load_all()


def test_sequence_packing_is_a_consistent_concat_stream(spark, sf_dir):
    """The packed layout must describe one contiguous token stream:
    cumulative sums chain exactly, and every doc's [first_seq, last_seq]
    matches the closed form recomputed from scratch."""
    rows = (
        SPECS["ext_sequence_packing"]
        .spark(spark, sf_dir)
        .orderBy("doc_id")
        .collect()
    )
    assert rows
    prev_cum = 0
    for r in rows:
        assert r["n_tokens"] > 0
        assert r["cum_tokens"] == prev_cum + r["n_tokens"]
        assert r["first_seq"] == prev_cum // _PACK_CTX
        assert r["last_seq"] == (r["cum_tokens"] - 1) // _PACK_CTX
        assert r["n_seqs"] == r["last_seq"] - r["first_seq"] + 1
        prev_cum = r["cum_tokens"]
    # the stream covers sequences 0..last with no gaps
    assert rows[0]["first_seq"] == 0
    for a, b in zip(rows, rows[1:]):
        assert b["first_seq"] in (a["last_seq"], a["last_seq"] + 1)


def test_decontaminate_never_flags_eval_docs_and_bounds_ratio(spark, sf_dir):
    rows = SPECS["ext_decontaminate_ngram"].spark(spark, sf_dir).collect()
    assert rows  # synthetic corpus shares vocabulary: matches exist
    for r in rows:
        assert r["doc_id"] % 97 != 0  # train split only
        assert 1 <= r["n_matched"] <= r["n_grams"]
        assert 0.0 < r["contamination"] <= 1.0


def test_domain_mixture_weights_sum_to_one_and_flatten(spark, sf_dir):
    rows = SPECS["ext_domain_mixture"].spark(spark, sf_dir).collect()
    assert abs(sum(r["mixture_weight"] for r in rows) - 1.0) < 1e-9
    assert abs(sum(r["natural_share"] for r in rows) - 1.0) < 1e-9
    # alpha < 1 compresses the distribution: the largest domain's share
    # shrinks, the smallest domain's share grows.
    big = max(rows, key=lambda r: r["n_tokens"])
    small = min(rows, key=lambda r: r["n_tokens"])
    assert big["mixture_weight"] < big["natural_share"]
    assert small["mixture_weight"] > small["natural_share"]


def test_sq8_codes_in_range_and_error_bounded(spark, sf_dir):
    rows = SPECS["ext_sq8_quantization"].spark(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert len(r["codes"]) == 64
        assert all(0 <= c <= 255 for c in r["codes"])
        assert r["sq_err"] >= 0.0


def test_weighted_sample_prefers_heavy_docs(spark, sf_dir):
    """Not a distributional test (the draw is a fixed hash), but the
    mechanism must at least correlate with weight: the selected sample's
    mean n_chars should exceed the corpus mean (inclusion probability
    is proportional to n_chars)."""
    import duckdb

    sample = SPECS["ext_weighted_sample"].spark(spark, sf_dir).collect()
    assert len(sample) == 25
    con = duckdb.connect()
    corpus_mean = con.execute(
        f"SELECT AVG(n_chars) FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()[0]
    sample_mean = sum(r["n_chars"] for r in sample) / len(sample)
    assert sample_mean > corpus_mean * 0.95


def test_bpe_pairs_are_two_chars_and_sorted(spark, sf_dir):
    rows = SPECS["ext_bpe_pair_stats"].spark(spark, sf_dir).collect()
    assert len(rows) == 20
    assert all(len(r["pair"]) == 2 for r in rows)
    ws = [r["w"] for r in rows]
    assert ws == sorted(ws, reverse=True)


def test_ngram_helper_short_doc_yields_empty(spark):
    """Spark's sequence(1, 0) is DESCENDING [1, 0] — the helper must
    special-case docs shorter than n (regression for the bpe/gram bug)."""
    from pyspark.sql import functions as F

    from nibbler_spark.queries.training_prep import _token_ngrams

    df = spark.createDataFrame(
        [("a b",), ("a b c d e f",)], "text string"
    ).select(_token_ngrams(F.split("text", " "), _NGRAM_N).alias("gs"))
    out = [r["gs"] for r in df.collect()]
    assert out[0] == []
    assert out[1] == ["a b c d e", "b c d e f"]


def test_two_phase_rank_equals_global_row_number(spark):
    """Property: for random (value, id) rows and any coarse-monotone
    bucket width, the two-phase bucketed rank must equal row_number()
    over the single global ordering — ascending and descending."""
    import random

    from pyspark.sql import functions as F

    from nibbler_spark.queries._helpers import two_phase_rank

    rng = random.Random(123)
    for trial in range(5):
        rows = [
            (i, rng.randint(0, 500)) for i in range(rng.randint(5, 120))
        ]
        df = spark.createDataFrame(rows, "id long, v long")
        width = rng.choice([1, 7, 64, 1000])
        # ascending
        got = {
            r["id"]: r["rk"]
            for r in two_phase_rank(
                df,
                (F.col("v") / width).cast("bigint"),
                [F.col("v"), F.col("id")],
                "rk",
            ).collect()
        }
        expect = {
            rid: i + 1
            for i, (rid, _) in enumerate(
                sorted(rows, key=lambda t: (t[1], t[0]))
            )
        }
        assert got == expect, f"asc trial {trial} width {width}"
        # descending
        got = {
            r["id"]: r["rk"]
            for r in two_phase_rank(
                df,
                -(F.col("v") / width).cast("bigint"),
                [F.col("v").desc(), F.col("id")],
                "rk",
            ).collect()
        }
        expect = {
            rid: i + 1
            for i, (rid, _) in enumerate(
                sorted(rows, key=lambda t: (-t[1], t[0]))
            )
        }
        assert got == expect, f"desc trial {trial} width {width}"


def test_bpe_train_matches_classic_sennrich_reference(spark, sf_dir):
    """Independent validation of the multi-round trainer: a pure-Python
    classic BPE (Sennrich-style — count adjacent symbol pairs weighted
    by word frequency, merge the argmax everywhere left-to-right,
    repeat) must produce the identical 8-round merge list. Unlike the
    DuckDB oracle, this reference shares NO code or string-REPLACE
    machinery with the Spark side, so it would catch a delimiter bug
    that both engines made symmetrically."""
    from collections import Counter

    from pyspark.sql import functions as F

    from nibbler_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    words = Counter()
    for r in (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
        .where(F.length("tok") >= 2)
        .collect()
    ):
        words[tuple(r["tok"])] = r["c"]

    def merge_word(syms, a, b):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return tuple(out)

    expected = []
    for rnd in range(1, 9):
        pairs = Counter()
        for syms, c in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        (a, b), w = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        expected.append((rnd, a, b, a + b, w))
        words = Counter(
            {merge_word(s, a, b): c for s, c in words.items()}
        )

    got = [
        (r["round"], r["a"], r["b"], r["merged"], r["w"])
        for r in load_all()["ext_bpe_train_8rounds"]
        .spark(spark, sf_dir)
        .orderBy("round")
        .collect()
    ]
    assert got == expected


def test_fertility_and_compression_match_pure_python_reference(
    spark, sf_dir
):
    """Independent validation of ext_bpe_compression_stats and
    ext_multilingual_fertility: a pure-Python classic BPE trains the
    same 8 merges, applies them word-by-word with the Sennrich
    left-to-right merge (no string-REPLACE machinery shared with either
    engine), and re-derives every output number exactly."""
    from collections import Counter

    from pyspark.sql import functions as F

    from nibbler_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    lang_words = Counter()
    for r in (
        docs.select("lang", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count("*").alias("c"))
        .where(F.length("tok") >= 2)
        .collect()
    ):
        lang_words[(r["lang"], tuple(r["tok"]))] = r["c"]

    def merge_word(syms, a, b):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return tuple(out)

    # train globally (lang-pooled), exactly like _bpe_train
    words = Counter()
    for (_, syms), c in lang_words.items():
        words[syms] += c
    rules = []
    for _ in range(8):
        pairs = Counter()
        for syms, c in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        (a, b), _w = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        rules.append((a, b))
        words = Counter({merge_word(s, a, b): c for s, c in words.items()})

    def apply_rules(syms):
        for a, b in rules:
            syms = merge_word(syms, a, b)
        return syms

    # --- global compression stats ---
    n_words = len({s for (_, s) in lang_words})
    before = after = 0
    vocab = set()
    glob = Counter()
    for (_, syms), c in lang_words.items():
        glob[syms] += c
    for syms, c in glob.items():
        enc = apply_rules(syms)
        before += c * len(syms)
        after += c * len(enc)
        vocab.update(enc)
    got = (
        load_all()["ext_bpe_compression_stats"]
        .spark(spark, sf_dir)
        .collect()[0]
    )
    assert got["n_distinct_words"] == n_words
    assert got["symbols_before"] == before
    assert got["symbols_after"] == after
    assert got["vocab_after"] == len(vocab)
    assert got["compression_micro"] == (1_000_000 * before) // after
    assert got["compression_micro"] >= 1_000_000  # merges never lengthen

    # --- per-language fertility ---
    ref = {}
    for (lang, syms), c in lang_words.items():
        enc = apply_rules(syms)
        occ, b4, af = ref.get(lang, (0, 0, 0))
        ref[lang] = (occ + c, b4 + c * len(syms), af + c * len(enc))
    rows = (
        load_all()["ext_multilingual_fertility"]
        .spark(spark, sf_dir)
        .collect()
    )
    assert sorted(r["lang"] for r in rows) == sorted(ref)
    for r in rows:
        occ, b4, af = ref[r["lang"]]
        assert r["word_occurrences"] == occ
        assert r["symbols_before"] == b4
        assert r["symbols_after"] == af
        assert r["fertility_micro"] == (1_000_000 * af) // occ
        assert r["compression_micro"] == (1_000_000 * b4) // af
