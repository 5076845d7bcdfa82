"""Cross-row invariants for the round-4 final-session additions:
DDSketch-style quantiles, integer ray-casting point-in-polygon,
MATCH_RECOGNIZE-lite, and the batch perceptron — brute-force references
and guarantees the per-row hash oracles can't state."""

from __future__ import annotations

import random
import re
from collections import defaultdict

from nibbler_spark.queries import load_all
from nibbler_spark.sources import load_table

SPECS = load_all()


# ---------------------------------------------------------------- DDSketch


def _dds_index(v: int) -> int:
    if v < 32:
        return v
    b = v.bit_length()
    m = v >> (b - 5)
    return 32 + (b - 6) * 16 + (m - 16)


def _dds_decode(i: int) -> tuple[int, int]:
    if i < 32:
        return i, 1
    g = i - 32
    s = g // 16 + 1
    m = 16 + g % 16
    return m << s, 1 << s


def test_ddsketch_bucket_guarantee_exhaustive_small():
    """Every v in [1, 4096]: v lands in its decoded bucket and the
    midpoint is within 1/32 relative error."""
    for v in range(1, 4097):
        i = _dds_index(v)
        lo, w = _dds_decode(i)
        assert lo <= v < lo + w, (v, i, lo, w)
        mid2 = 2 * lo + w - 1  # 2x midpoint of the integer range
        assert 32 * abs(mid2 - 2 * v) <= 2 * v, (v, i, lo, w)


def test_ddsketch_bucket_guarantee_random_large():
    rng = random.Random(7)
    for _ in range(20000):
        v = rng.randrange(1, 1 << 52)
        i = _dds_index(v)
        lo, w = _dds_decode(i)
        assert lo <= v < lo + w
        assert 32 * abs((2 * lo + w - 1) - 2 * v) <= 2 * v


def test_ddsketch_index_monotone():
    """Bucket index is monotone in v — required for rank walking."""
    rng = random.Random(11)
    vals = sorted(rng.randrange(1, 1 << 40) for _ in range(5000))
    idxs = [_dds_index(v) for v in vals]
    assert idxs == sorted(idxs)


def test_ddsketch_query_guarantees_hold(spark, sf_dir):
    rows = SPECS["ext_ddsketch_quantile"].spark(spark, sf_dir).collect()
    assert {r["q_pct"] for r in rows} == {25, 50, 90, 99}
    for r in rows:
        assert r["within_bucket"] and r["within_bound"]
        # the guarantee the flags assert, recomputed here
        assert 32 * abs(r["est_x2"] - r["exact_x2"]) <= r["exact_x2"]


# ------------------------------------------------------ point-in-polygon


def _pip_float(px, py, verts):
    """Reference ray cast using FLOAT division (a structurally different
    formulation from the query's cross-multiplied integer predicate)."""
    inside = False
    n = len(verts)
    for k in range(n):
        x1, y1 = verts[k]
        x2, y2 = verts[(k + 1) % n]
        if (y1 > py) != (y2 > py):
            xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
            if px < xint:
                inside = not inside
    return inside


def _pip_int(px, py, verts):
    """The query's integer predicate, mirrored."""
    par = 0
    n = len(verts)
    for k in range(n):
        x1, y1 = verts[k]
        x2, y2 = verts[(k + 1) % n]
        if (y1 > py) != (y2 > py):
            lhs = (px - x1) * (y2 - y1)
            rhs = (py - y1) * (x2 - x1)
            if (lhs < rhs) if (y2 - y1) > 0 else (lhs > rhs):
                par ^= 1
    return par == 1


def test_pip_integer_predicate_matches_float_raycast():
    rng = random.Random(3)
    for _ in range(200):
        nv = rng.randrange(3, 9)
        # random simple-ish polygon: random star-shaped around a center
        cx, cy = rng.randrange(200, 800), rng.randrange(200, 800)
        import math

        angs = sorted(rng.uniform(0, 2 * math.pi) for _ in range(nv))
        verts = [
            (
                cx + int(rng.randrange(50, 180) * math.cos(a)),
                cy + int(rng.randrange(50, 180) * math.sin(a)),
            )
            for a in angs
        ]
        if len({v for v in verts}) < 3:
            continue
        for _ in range(50):
            px, py = rng.randrange(0, 1000), rng.randrange(0, 1000)
            # skip exact vertex-y ties where float and half-open integer
            # conventions could legitimately differ at boundaries
            if any(py == y for _, y in verts):
                continue
            assert _pip_int(px, py, verts) == _pip_float(px, py, verts)


def test_pip_query_nonvacuous(spark, sf_dir):
    rows = SPECS["ext_point_in_polygon"].spark(spark, sf_dir).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["n_inside"] > 0  # every polygon actually fires
        assert r["coord_checksum"] > 0


# ------------------------------------------------- MATCH_RECOGNIZE-lite


def test_match_recognize_matches_regex_bruteforce(spark, sf_dir):
    """Per-user greedy V+P match counts equal a regex over the user's
    event-type string in (ts, event_id) order."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    per_user = defaultdict(list)
    for r in ev:
        per_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    want = {}
    for u, rows in per_user.items():
        rows.sort()
        s = "".join(
            {"view": "v", "purchase": "p"}.get(t, "x") for _, _, t in rows
        )
        ms = re.findall(r"v+p", s)
        if ms:
            want[u] = (len(ms), max(len(m) - 1 for m in ms))
    got = {
        r["user_id"]: (r["n_matches"], r["max_view_run"])
        for r in SPECS["ext_match_recognize_lite"].spark(spark, sf_dir).collect()
    }
    assert got == want
    assert want  # non-vacuous


# ------------------------------------------------------ batch perceptron


def test_batch_perceptron_matches_pure_python(spark, sf_dir):
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("text", "lang", "n_chars")
        .collect()
    )
    data = [
        (
            r["n_chars"],
            len(r["text"]) - len(r["text"].replace(" ", "")) + 1,
            1 if r["lang"] == "en" else -1,
        )
        for r in docs
    ]
    w0 = w1 = w2 = 0
    want = []
    for rnd in (1, 2, 3):
        d0 = d1 = d2 = nerr = 0
        for x1, x2, y in data:
            if y * (w0 + w1 * x1 + w2 * x2) <= 0:
                d0 += y
                d1 += y * x1
                d2 += y * x2
                nerr += 1
        w0, w1, w2 = w0 + d0, w1 + d1, w2 + d2
        want.append((rnd, w0, w1, w2, nerr))
    got = [
        (r["round"], r["w0"], r["w1"], r["w2"], r["n_updates"])
        for r in SPECS["ext_batch_perceptron"].spark(spark, sf_dir).collect()
    ]
    assert got == want
    assert want[0][4] > 0


# ----------------------------------------------------------------- FLAC


def test_flac_roundtrip_all_regimes():
    from nibbler_spark.operators.multimodal import encode_flac, flac_samples

    rng = random.Random(1)

    def mk(regime, n):
        if n == 0:
            return []
        if regime == 0:
            return [123] * n
        if regime == 1:
            return [(-5000 + 13 * i) % 20000 - 10000 for i in range(n)]
        if regime == 2:
            s = [0]
            for _ in range(n - 1):
                s.append(
                    max(-32768, min(32767, s[-1] + rng.randrange(-50, 51)))
                )
            return s
        if regime == 3:
            return [rng.randrange(-32768, 32768) for _ in range(n)]
        return [(-32768 if i % 2 else 32767) for i in range(n)]

    for regime in range(5):
        for n in (0, 1, 5, 255, 256, 257, 700):
            s = mk(regime, n)
            for po in (0, 1, 2):
                pl = encode_flac(
                    n, 44100, lambda i: s[i], partition_order=po
                )
                assert flac_samples(pl) == s, (regime, n, po)


def test_flac_subframe_types_all_fire():
    """The three encoder paths (CONSTANT, FIXED order>0, order 0 /
    escape) all appear across the query's waveform classes."""
    from nibbler_spark.operators.multimodal import encode_flac

    types = set()
    for did in (0, 1, 2, 3, 4, 5):
        def wave(i, did=did):
            if did % 3 == 0:
                return (did * 97) % 4000 - 2000
            if did % 3 == 1:
                return -8000 + 13 * i + (did + i) % 5
            return ((did * 37 + 11 * i * i) % 8192) - 4096

        pl = encode_flac(300, 8000, wave, partition_order=1)
        # walk subframe types: first subframe starts right after the
        # frame header; cheap proxy — scan for encoder decisions by
        # re-deriving which branch fires
        vals = [wave(i) for i in range(300)]
        if all(v == vals[0] for v in vals[:256]):
            types.add("constant")
        else:
            types.add("fixed")
        assert pl[:4] == b"fLaC"
    assert types == {"constant", "fixed"}


def test_flac_detects_corruption():
    import pytest

    from nibbler_spark.operators.multimodal import (
        AudioFormatError,
        encode_flac,
        parse_flac,
    )

    pl = encode_flac(300, 8000, lambda i: (i * 7) % 100)
    with pytest.raises(AudioFormatError):
        parse_flac(b"junk" + pl)
    with pytest.raises(AudioFormatError):
        parse_flac(pl[:-3])
    # positions inside protected regions: the STREAMINFO MD5 (bytes
    # 26..41 — caught by the decoded-audio MD5 check) and frame bytes
    # (caught by CRC-8/CRC-16). STREAMINFO's min/max-blocksize fields
    # are NOT protected — FLAC metadata carries no CRC, so a flip there
    # is legitimately undetectable.
    for at in (30, 44, 60, len(pl) - 5):
        bad = bytearray(pl)
        bad[at] ^= 0xFF
        with pytest.raises(AudioFormatError):
            parse_flac(bytes(bad))


def test_flac_compresses_smooth_signals():
    from nibbler_spark.operators.multimodal import encode_flac

    pl = encode_flac(4096, 44100, lambda i: (i % 1000) - 500)
    assert len(pl) < 8192 * 0.25  # ≥4x on a ramp (16-bit raw = 8192 B)


def test_flac_audio_dispatch(spark, sf_dir):
    rows = SPECS["ext_audio_decode_flac"].spark(spark, sf_dir).collect()
    assert rows and all(r["fmt"] == "flac" for r in rows)


# ------------------------------------------- filtered ANN / MAP / seqpat


def test_filtered_ann_fills_k(spark, sf_dir):
    rows = {
        r["strategy"]: r
        for r in SPECS["ext_filtered_ann"].spark(spark, sf_dir).collect()
    }
    assert rows["exact"]["n_results"] == 10
    assert rows["ivf_probe4"]["n_results"] == 10  # in-list filter never under-fills
    assert rows["exact"]["recall_pct"] == 100
    assert 0 <= rows["ivf_probe4"]["recall_pct"] <= 100


def test_map_mrr_matches_bruteforce(spark, sf_dir):
    import math

    e = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding", "label")
        .collect()
    )
    vecs = {r["vec_id"]: (list(r["embedding"]), r["label"]) for r in e}

    def grid_dot(a, b):
        return sum(
            math.floor(float(x) * float(y) * 1e10) for x, y in zip(a, b)
        )

    want = {}
    for qid in (1, 2, 3, 4, 5):
        qv, ql = vecs[qid]
        scored = sorted(
            (
                (-grid_dot(v, qv), vid)
                for vid, (v, lbl) in vecs.items()
                if vid != qid
            ),
        )[:10]
        hits, ap, first = 0, 0, 0
        for rk, (_, vid) in enumerate(scored, 1):
            if vecs[vid][1] == ql:
                hits += 1
                ap += 2520 * hits // rk
                if first == 0:
                    first = rk
        want[qid] = (hits, first, 2520 // first if first else 0, ap)
    got = {
        r["q_id"]: (
            r["hits_at_10"],
            r["first_hit_rank"],
            r["mrr_x2520"],
            r["ap_x2520"],
        )
        for r in SPECS["ext_map_mrr_eval"].spark(spark, sf_dir).collect()
    }
    assert got == want
    assert any(v[0] > 0 for v in want.values())  # some query has hits


def test_sequential_patterns_existential_semantics(spark, sf_dir):
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    per_user = defaultdict(list)
    for r in ev:
        per_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    types = sorted({t for rows in per_user.values() for _, _, t in rows})
    want = {}
    for a in types:
        for b in types:
            n = 0
            for rows in per_user.values():
                rows.sort()
                seen_a = False
                ok = False
                for _, _, t in rows:
                    if seen_a and t == b:
                        ok = True
                        break
                    if t == a:
                        seen_a = True
                if ok:
                    n += 1
            if n:
                want[(a, b)] = n
    got = {
        (r["a_type"], r["b_type"]): r["support_users"]
        for r in SPECS["ext_sequential_patterns"].spark(spark, sf_dir).collect()
    }
    assert got == want


# ------------------------------------------- hilbert / sweepline / knn


def _xy2d(n, x, y):
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_query_matches_reference(spark, sf_dir):
    row = SPECS["ext_hilbert_clustering"].spark(spark, sf_dir).collect()[0]
    assert row["n_cells"] == 1024 and row["n_distinct_d"] == 1024
    assert row["adjacent_steps"] == 1023  # the Hilbert property
    assert row["hilbert_runs"] == 22 and row["morton_runs"] == 46
    assert row["hilbert_tighter"]
    # occupied-cell runs: recompute from the same mapping
    rows = (
        load_table(spark, sf_dir, "part")
        .select("p_size", "p_retailprice")
        .collect()
    )
    import math

    occ = {
        (
            r["p_size"] % 32,
            int(math.floor((r["p_retailprice"] - 900.0) / 34.0)) % 32,
        )
        for r in rows
    }
    box = [
        (x, y) for (x, y) in occ if 5 <= x <= 20 and 9 <= y <= 24
    ]

    def runs(keys):
        ks = sorted(keys)
        return (
            1 + sum(1 for i in range(1, len(ks)) if ks[i] - ks[i - 1] > 1)
            if ks
            else 0
        )

    def morton(x, y):
        z = 0
        for i in range(5):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    assert row["occ_box_cells"] == len(box)
    assert row["occ_hilbert_runs"] == runs([_xy2d(32, x, y) for x, y in box])
    assert row["occ_morton_runs"] == runs([morton(x, y) for x, y in box])


def test_sweepline_matches_bruteforce(spark, sf_dir):
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id")
        .collect()
    )
    per_user = defaultdict(list)
    for r in ev:
        us = int(r["ts"].timestamp() * 1_000_000)
        per_user[r["user_id"]].append((us, r["event_id"]))
    intervals = []
    for rows in per_user.values():
        rows.sort()
        start = prev = rows[0][0]
        for us, _ in rows[1:]:
            if us - prev > 1800000000:
                intervals.append((start, prev))
                start = us
            prev = us
        intervals.append((start, prev))
    deltas = []
    for s, e in intervals:
        deltas.append((s, 1))
        deltas.append((e + 1, -1))
    deltas.sort()
    active = 0
    day_max = {}
    day_starts = defaultdict(int)
    for t, d in deltas:
        active += d
        day = t // 86400000000
        day_max[day] = max(day_max.get(day, -(10**9)), active)
        if d == 1:
            day_starts[day] += 1
    got = {
        r["day"]: (r["max_concurrency"], r["n_session_starts"])
        for r in SPECS["ext_interval_sweepline"].spark(spark, sf_dir).collect()
    }
    want = {d: (day_max[d], day_starts.get(d, 0)) for d in day_max}
    assert got == want
    assert max(v[0] for v in want.values()) > 1  # overlap actually occurs


def test_knn_confusion_matches_bruteforce(spark, sf_dir):
    import math

    e = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding", "label")
        .collect()
    )
    vecs = {r["vec_id"]: (list(r["embedding"]), r["label"]) for r in e}
    conf = defaultdict(int)
    for qid, (qv, ql) in vecs.items():
        if qid % 23 != 0:
            continue
        scored = sorted(
            (
                -sum(
                    math.floor(float(a) * float(b) * 1e10)
                    for a, b in zip(v, qv)
                ),
                vid,
            )
            for vid, (v, _) in vecs.items()
            if vid != qid
        )[:5]
        votes = defaultdict(int)
        for _, vid in scored:
            votes[vecs[vid][1]] += 1
        best = max(votes.values())
        pred = min(lbl for lbl, n in votes.items() if n == best)
        conf[(ql, pred)] += 1
    got = {
        (r["true_label"], r["pred_label"]): r["n"]
        for r in SPECS["ext_knn_classifier_eval"].spark(spark, sf_dir).collect()
    }
    assert got == dict(conf)


# ---------------------------------------- phrase / markov / forest


def test_phrase_search_matches_bruteforce(spark, sf_dir):
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    )
    want = {}
    for phrase in ("table hash", "a agg batch"):
        pt = phrase.split(" ")
        nd = no = chk = 0
        for r in docs:
            toks = r["text"].split(" ")
            c = sum(
                1
                for i in range(len(toks) - len(pt) + 1)
                if toks[i : i + len(pt)] == pt
            )
            if c:
                nd += 1
                no += c
                chk += r["doc_id"] * c
        want[phrase] = (nd, no, chk)
    got = {
        r["phrase"]: (r["n_docs"], r["n_occurrences"], r["doc_checksum"])
        for r in SPECS["ext_phrase_search"].spark(spark, sf_dir).collect()
    }
    assert got == want
    assert all(v[0] > 0 for v in want.values())  # both phrases occur


def test_markov_attribution_invariants(spark, sf_dir):
    rows = SPECS["ext_markov_attribution"].spark(spark, sf_dir).collect()
    by_var = {r["variant"]: r for r in rows}
    assert set(by_var) == {"none", "click", "error", "signup", "view"}
    base = by_var["none"]["conv_grid"]
    assert 0 < base <= 1000000000
    for v, r in by_var.items():
        # graph surgery only removes conversion paths -> monotone
        assert r["conv_grid"] <= base
        assert r["removal_effect_x1e6"] >= 0
        assert r["baseline_grid"] == base
    # at least one channel actually carries conversions
    assert any(
        r["removal_effect_x1e6"] > 0 for v, r in by_var.items() if v != "none"
    )


def test_random_forest_confusion_partitions_table(spark, sf_dir):
    rows = SPECS["ext_random_forest_vote"].spark(spark, sf_dir).collect()
    assert len(rows) == 4
    n_rows = (
        load_table(spark, sf_dir, "lineitem").count()
    )
    for r in rows:
        assert r["tp"] + r["fp"] + r["tn"] + r["fn"] == n_rows
        assert r["left_pred"] in (0, 1) and r["right_pred"] in (0, 1)
        assert r["gini"] > 0
    feats = [r["feature"] for r in sorted(rows, key=lambda x: x["tree"])]
    assert feats == ["qty", "disc", "qty", "disc"]


# --------------------------------------- latency hist / LTV / DBSCAN


def test_conversion_latency_histogram_invariants(spark, sf_dir):
    rows = (
        SPECS["ext_conversion_latency_histogram"]
        .spark(spark, sf_dir)
        .collect()
    )
    assert rows
    total = rows[0]["n_conv"]
    assert sum(r["n_users"] for r in rows) == total
    shares = [r["cum_share_x1e6"] for r in rows]
    assert shares == sorted(shares)  # cumulative is monotone
    assert shares[-1] == 1000000  # last bucket closes the distribution


def test_cohort_ltv_cumulative_consistent(spark, sf_dir):
    rows = SPECS["ext_cohort_ltv"].spark(spark, sf_dir).collect()
    assert rows
    by_cohort = defaultdict(list)
    for r in rows:
        by_cohort[r["cohort_day"]].append(r)
    for cohort, rs in by_cohort.items():
        rs.sort(key=lambda r: r["age_day"])
        run = 0
        for r in rs:
            run += r["day_cents"]
            assert r["cum_cents"] == run


def test_dbscan_recovers_planted_clusters(spark, sf_dir):
    rows = SPECS["ext_dbscan_grid"].spark(spark, sf_dir).collect()
    assert rows
    # top-5 clusters are the planted ones: similar sizes, all-core
    top5 = rows[:5]
    sizes = [r["cluster_total"] for r in top5]
    assert min(sizes) >= 4  # each planted box is dense enough to core
    # planted points = event ids with id % 67 < 2 among the sampled set
    n_points = rows[0]["n_points"]
    planted_total = sum(r["cluster_total"] for r in top5)
    # the 5 planted clusters carry the bulk of clustered mass
    assert planted_total > n_points // 4
    assert rows[0]["n_noise"] > 0  # background scatter produces noise


# ---------------------------------------------- batch-8 invariants


def test_rolling_regression_exact_stats(spark, sf_dir):
    rows = SPECS["ext_rolling_regression"].spark(spark, sf_dir).collect()
    assert rows
    days = [r["day"] for r in rows]
    series = {r["day"]: r["cents"] for r in rows}
    for r in rows:
        window = [
            (d, series[d]) for d in days if r["day"] - 13 <= d <= r["day"]
        ]
        n = len(window)
        sx = sum(d for d, _ in window)
        sy = sum(c for _, c in window)
        sxy = sum(d * c for d, c in window)
        sxx = sum(d * d for d, _ in window)
        assert r["n"] == n
        assert r["slope_num"] == n * sxy - sx * sy
        assert r["slope_den"] == n * sxx - sx * sx


def test_user_path_sankey_shares(spark, sf_dir):
    rows = SPECS["ext_user_path_sankey"].spark(spark, sf_dir).collect()
    assert len(rows) == 15
    ns = [r["n"] for r in rows]
    assert ns == sorted(ns, reverse=True)
    assert all(0 < r["share_x1e6"] <= 1000000 for r in rows)


def test_hash_collision_audit_consistent(spark, sf_dir):
    rows = SPECS["ext_hash_collision_audit"].spark(spark, sf_dir).collect()
    assert len(rows) == 20
    s = rows[0]
    assert s["n_used_buckets"] <= 1024
    assert s["n_collision_buckets"] <= s["n_used_buckets"]
    assert rows[0]["n_tokens"] == s["max_bucket_load"]


# ------------------------------------------- Lindley / MV rewrite


def test_lindley_matches_sequential_replay(spark, sf_dir):
    """The closed-form prefix-min backlog must equal the sequential
    Lindley recursion W_i = max(W_prev - dt, 0) + c replayed per user."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id")
        .collect()
    )
    per_user = defaultdict(list)
    for r in ev:
        per_user[r["user_id"]].append(
            (int(r["ts"].timestamp() * 1_000_000), r["event_id"])
        )
    C = 60000000
    want = {}
    for u, rows in per_user.items():
        rows.sort()
        w = 0
        prev_t = None
        max_w = 0
        busy = 0
        for t, _ in rows:
            if prev_t is not None:
                w = max(w - (t - prev_t), 0)
            if w == 0:
                busy += 1
            w += C
            prev_t = t
            max_w = max(max_w, w)
        want[u] = (len(rows), max_w, w, busy)
    got = {
        r["user_id"]: (
            r["n_events"],
            r["max_backlog_us"],
            r["final_backlog_us"],
            r["n_busy_periods"],
        )
        for r in SPECS["ext_queue_backlog_lindley"].spark(spark, sf_dir).collect()
    }
    assert got == want
    assert any(v[3] > 1 for v in want.values())  # queues actually drain


def test_mv_rewrite_equals_fact_answers(spark, sf_dir):
    rows = SPECS["ext_mv_query_rewrite"].spark(spark, sf_dir).collect()
    mv_rows = [r for r in rows if r["served_from"] == "mv"]
    fact_rows = [r for r in rows if r["served_from"] == "fact"]
    assert mv_rows and fact_rows
    # re-derive q1 from the fact table and compare against the MV path
    o = load_table(spark, sf_dir, "orders").collect()
    import math
    from collections import Counter

    n = Counter()
    cents = Counter()
    for r in o:
        n[r["o_orderpriority"]] += 1
        cents[r["o_orderpriority"]] += int(
            math.floor(r["o_totalprice"] * 100)
        )
    got = {r["grp"]: (r["n_orders"], r["cents"]) for r in mv_rows}
    assert got == {k: (n[k], cents[k]) for k in n}


# -------------------------------------------- smape / critical path


def test_smape_terms_exact(spark, sf_dir):
    rows = SPECS["ext_forecast_eval_smape"].spark(spark, sf_dir).collect()
    assert rows
    for r in rows:
        num, den, a = r["f_num"], r["f_den"], r["actual_cents"]
        assert r["term_x1e6"] == 1000000 * abs(num - a * den) // (
            num + a * den
        )
        assert 0 <= r["term_x1e6"] <= 1000000
    assert rows[0]["smape_x1e6"] == sum(r["term_x1e6"] for r in rows) // len(
        rows
    )


def test_critical_path_matches_bruteforce(spark, sf_dir):
    import hashlib

    def h48(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)

    edges = defaultdict(list)
    for u in range(150):
        for v in range(150):
            if v // 25 == u // 25 + 1 and h48(f"{u}:{v}") % 7 == 0:
                edges[u].append((v, 1 + h48(f"w:{u}:{v}") % 100))
    dist = {n: 0 for n in range(25)}
    paths = {n: 1 for n in range(25)}
    for layer in range(5):
        for u in [n for n in dist if n // 25 == layer]:
            for v, w in edges[u]:
                cand = dist[u] + w
                if v not in dist or cand > dist[v]:
                    dist[v] = cand
                    paths[v] = 0
        for u in [n for n in dist if n // 25 == layer]:
            for v, w in edges[u]:
                if dist[u] + w == dist[v]:
                    paths[v] += paths[u]
    want = {}
    for layer in range(6):
        nodes = [n for n in dist if n // 25 == layer]
        mx = max(dist[n] for n in nodes)
        want[layer] = (
            len(nodes),
            mx,
            sum(paths[n] for n in nodes if dist[n] == mx),
            sum(dist[n] for n in nodes),
        )
    got = {
        r["layer"]: (
            r["n_reached"],
            r["max_dist"],
            r["n_paths_at_max"],
            r["dist_checksum"],
        )
        for r in SPECS["ext_critical_path"].spark(spark, sf_dir).collect()
    }
    assert got == want
    assert want[5][1] > want[1][1]  # path actually grows through layers


# ------------------------------- classification report / scenes / i33


def test_classification_report_internally_consistent(spark, sf_dir):
    rows = SPECS["ext_classification_report"].spark(spark, sf_dir).collect()
    assert rows
    total = sum(r["tp"] + r["fn"] for r in rows)
    assert sum(r["tp"] for r in rows) * 1000000 // total == rows[0][
        "accuracy_x1e6"
    ]
    for r in rows:
        if r["tp"] + r["fp"]:
            assert (
                r["precision_x1e6"]
                == 1000000 * r["tp"] // (r["tp"] + r["fp"])
            )
        assert (
            r["f1_x1e6"]
            == 2000000 * r["tp"] // (2 * r["tp"] + r["fp"] + r["fn"])
            if (r["tp"] + r["fp"] + r["fn"])
            else True
        )


def test_scene_detection_recovers_planted_cuts(spark, sf_dir):
    rows = SPECS["ext_video_scene_detection"].spark(spark, sf_dir).collect()
    assert rows
    for r in rows:
        did = r["doc_id"]
        planted = sum(1 for f in range(1, 12) if (did * 7 + f) % 5 == 0)
        assert r["n_cuts"] == planted  # precision & recall 1 by design
        assert r["n_scenes"] == planted + 1
        assert r["n_frames"] == 12
    assert any(r["n_cuts"] > 0 for r in rows)


# ----------------------------------------- bloom FP / cross-validation


def test_bloom_fp_calibration_flags(spark, sf_dir):
    rows = SPECS["ext_bloom_fp_calibration"].spark(spark, sf_dir).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["calibrated"]
        assert 0 < r["n_ones"] < 4096
        assert r["expected_fp"] == 1000 * r["n_ones"] ** 4 // 4096**4
    # when occupancy predicts FPs, they actually occur (at the tiny
    # sf0.001 occupancy the exact expectation is 0 and measured must
    # agree — the calibrated flag already pins that)
    if sum(r["expected_fp"] for r in rows) >= 4:
        assert sum(r["measured_fp"] for r in rows) > 0


def test_cross_validation_no_leakage_and_pooling(spark, sf_dir):
    rows = SPECS["ext_cross_validation"].spark(spark, sf_dir).collect()
    assert [r["fold"] for r in rows] == [0, 1, 2]
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_test"] for r in rows) == n_docs  # folds partition
    c_all = sum(r["n_correct"] for r in rows)
    n_all = sum(r["n_test"] for r in rows)
    for r in rows:
        assert r["cv_accuracy_x1e6"] == 1000000 * c_all // n_all
        assert 0 <= r["n_correct"] <= r["n_test"]


# --------------------------------- dyn session / one-pass profile


def test_dynamic_session_stream_nonvacuous(spark, sf_dir):
    rows = (
        SPECS["i34_stream_dynamic_gap_session"].spark(spark, sf_dir).collect()
    )
    assert rows
    # dynamic gap visible: purchase-extended sessions exist (end - last
    # event >= 30 min for some session) — weak proxy: session spans vary
    spans = {(r["s_end"] - r["s_start"]).total_seconds() for r in rows}
    assert len(spans) > 1


def test_one_pass_profile_single_scan(spark, sf_dir):
    rows = SPECS["ext_table_profile_onepass"].spark(spark, sf_dir).collect()
    assert [r["column_name"] for r in rows] == sorted(
        [
            "o_custkey",
            "o_orderdate",
            "o_orderkey",
            "o_orderpriority",
            "o_orderstatus",
            "o_totalprice",
        ]
    )
    n = rows[0]["n_rows"]
    assert all(r["n_rows"] == n for r in rows)
    ok = {r["column_name"]: r for r in rows}
    assert ok["o_orderkey"]["n_distinct"] == n  # primary key
    assert ok["o_orderstatus"]["n_distinct"] <= 3
    # single-scan plan: exactly one relation appears
    plan = (
        SPECS["ext_table_profile_onepass"]
        .spark(spark, sf_dir)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("Relation") == 1


# ------------------------------------- shoelace / CSV dialect sniffing


def test_shoelace_matches_rectangle_decomposition(spark, sf_dir):
    rows = {
        r["polygon_id"]: r
        for r in SPECS["ext_polygon_measures"].spark(spark, sf_dir).collect()
    }
    # L-shape = 50000x20000 + 20000x30000 rectangles
    assert rows[1]["area_x2"] == 2 * (50000 * 20000 + 20000 * 30000)
    # diamond with diagonals 40000x40000: area = d1*d2/2
    assert rows[2]["area_x2"] == 40000 * 40000
    # triangle base 40000, height 25000
    assert rows[3]["area_x2"] == 40000 * 25000
    for r in rows.values():
        assert r["n_inside"] > 0 and r["density_x1e10_per_unit"] > 0


def test_csv_sniffer_and_splitter():
    from nibbler_spark.queries.sources_sinks import (
        _csv_render,
        _csv_split,
        sniff_csv_dialect,
    )

    fields = ['He said "hi", twice', "42", "-370"]
    for d in (",", ";", "\t"):
        line = _csv_render(fields, d)
        assert _csv_split(line, d) == fields, d
    text = "\n".join(
        _csv_render([f'a,b"{i}"', str(i), str(i * 2)], ";")
        for i in range(20)
    )
    assert sniff_csv_dialect(text) == ";"
    import pytest

    with pytest.raises(ValueError):
        sniff_csv_dialect("singlefieldonly\nanother\n")


# ------------------------------------ time range frame / rate limiter


def test_time_range_frame_trailing_hour(spark, sf_dir):
    rows = SPECS["e13_time_range_frame"].spark(spark, sf_dir).collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(r)
    import math

    for u, rs in list(by_user.items())[:10]:
        rs.sort(key=lambda r: (r["ts"], r["event_id"]))
        for r in rs:
            lo = r["ts"].timestamp() - 3600
            in_frame = [
                x for x in rs if lo <= x["ts"].timestamp() <= r["ts"].timestamp()
            ]
            assert r["n_events_1h"] == len(in_frame)


def test_rate_limiter_matches_sequential_replay(spark, sf_dir):
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id")
        .collect()
    )
    per_user = defaultdict(list)
    for r in ev:
        per_user[r["user_id"]].append(
            (int(r["ts"].timestamp() * 1_000_000), r["event_id"])
        )
    want = {}
    for u, rows in per_user.items():
        rows.sort()
        tokens, prev, n_adm, chk, mn = 2000, None, 0, 0, None
        for t, eid in rows:
            if prev is not None:
                tokens = min(2000, tokens + (t - prev) // 3600000)
            if tokens >= 1000:
                tokens -= 1000
                n_adm += 1
                chk += eid
            prev = t
            mn = tokens if mn is None else min(mn, tokens)
        want[u] = (len(rows), n_adm, chk, mn)
    got = {
        r["user_id"]: (
            r["n_events"],
            r["n_admitted"],
            r["admitted_checksum"],
            r["min_tokens_milli"],
        )
        for r in SPECS["ext_rate_limiter_admission"].spark(spark, sf_dir).collect()
    }
    assert got == want
    # the limiter actually drops something somewhere
    assert any(w[1] < w[0] for w in want.values())


# --------------------------------------- luhn / SRM / stream profile


def test_luhn_check_digits_validate():
    """The computed check digit must make the full number Luhn-valid
    under an independent textbook implementation."""

    def luhn_valid(num: int) -> bool:
        digits = [int(c) for c in str(num)][::-1]
        total = 0
        for i, d in enumerate(digits):
            if i % 2 == 1:
                d *= 2
                if d > 9:
                    d -= 9
            total += d
        return total % 10 == 0

    for ck in (1, 7, 42, 1499):
        body = 400000000000 + ck * 37
        digs = [(body // 10**i) % 10 for i in range(12)]
        s = sum(
            (d * 2 - 9 if d * 2 > 9 else d * 2) if i % 2 == 0 else d
            for i, d in enumerate(digs)
        )
        check = (10 - s % 10) % 10
        assert luhn_valid(body * 10 + check), ck


def test_srm_unbiased_coin_stays_quiet(spark, sf_dir):
    row = SPECS["ext_srm_check"].spark(spark, sf_dir).collect()[0]
    assert row["o0"] + row["o1"] == row["n"]
    assert not row["srm_flag"]  # md5 is a fair coin at these n
    assert row["chi2_x1e6"] == 1000000 * (2 * row["o0"] - row["n"]) ** 2 // row["n"]


def test_stream_profile_matches_batch(spark, sf_dir):
    rows = {
        r["metric"]: r["value"]
        for r in SPECS["i35_stream_incremental_profile"].spark(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    import math

    base = ev.collect()
    assert rows["n_rows"] == 2 * len(base)
    assert rows["min_user"] == min(r["user_id"] for r in base)
    assert rows["max_user"] == max(r["user_id"] for r in base)
    assert rows["cents"] == 2 * sum(
        int(math.floor(r["value"] * 100)) for r in base
    )


def test_behavioral_pipeline_stages_consistent(spark, sf_dir):
    rows = {
        r["stage"]: (r["metric_a"], r["metric_b"])
        for r in SPECS["ext_behavioral_analytics_pipeline"]
        .spark(spark, sf_dir)
        .collect()
    }
    assert set(rows) == {"sessions", "funnel", "attribution", "ltv_week1"}
    # funnel: converters <= signups; sessions >= users
    assert rows["funnel"][1] <= rows["funnel"][0]
    assert rows["sessions"][0] >= rows["sessions"][1]
    # attribution: view-credited cents <= total purchase cents
    assert 0 <= rows["attribution"][0] <= rows["attribution"][1]
    # LTV week-1 revenue is positive and bounded by total purchases
    assert 0 < rows["ltv_week1"][0] <= rows["attribution"][1]


def test_bounce_and_dau_consistency(spark, sf_dir):
    b = SPECS["ext_bounce_rate"].spark(spark, sf_dir).collect()
    assert b and all(0 <= r["n_bounces"] <= r["n_sessions"] for r in b)
    d = SPECS["ext_dau_wau_mau"].spark(spark, sf_dir).collect()
    assert d
    for r in d:
        assert r["dau"] <= r["wau"] <= r["mau"]  # nesting of windows
        assert 0 < r["stickiness_x1e6"] <= 1000000
    days = [r["day"] for r in d]
    assert days == sorted(days)
