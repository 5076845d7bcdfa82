"""Round-11 changes: regression tests for the r10 ADVICE items —
the micro-cell certificate composite-keying fix in _dbscan_capped,
the ZIP container hardening, and round-11 operator additions.
"""

from __future__ import annotations

import hashlib

import pytest

from tests.test_r10_additions import _brute_dbscan


def test_dbscan_micro_cert_straddling_cells_sound(spark):
    """r10 ADVICE (high): micro cells are keyed by the COMPOSITE
    (cid, mid) — a micro cell straddling two dense cells must not let
    a certificate proven from one cell's partial bbox apply to the
    other cell's members.

    Fixture (eps2=1922 => eps~43.8, ws=31, ws2=2): four dense blobs
    S-C-A-B chained along x, a micro cell x in {92,93} straddling
    dense cells scx=2 (A: x=91..92) and scx=3 (B: t=(93,100)), and a
    cert2 pair proven from A's partial bbox [92,92] against C's micro
    cell {(49,100)}. Under mid-only keying that certificate would
    short-circuit t's label to C's (and thence the global min's, one
    hop early), merging t into cluster 0 after the 3-round horizon:
    old keying yields core counts (13, 3); the exact all-pairs 3-round
    replay yields (12, 4)."""
    from nibbler_spark.queries.scale_patterns import _dbscan_capped

    pts = {
        # S blob (global-min ids), cell scx=0
        0: (3, 100), 1: (4, 100), 2: (4, 101), 3: (5, 100),
        # C blob, cell scx=1; c=(49,100) alone in micro cell mx=24
        4: (46, 100), 5: (47, 100), 6: (47, 101), 7: (49, 100),
        # A blob, cell scx=2; (92,*) in the straddling micro cell mx=46
        8: (91, 100), 9: (91, 101), 10: (92, 100), 11: (92, 101),
        # B blob, cell scx=3; t=(93,100) shares micro cell mx=46 with A
        12: (93, 100), 13: (120, 100), 14: (120, 101), 15: (121, 100),
    }
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in sorted(pts.items())],
        "event_id long, xi long, yi long",
    )
    got = {
        r["cluster_label"]: (r["n_core"], r["n_border"], r["n_noise"])
        for r in _dbscan_capped(spark, df, eps2=1922, wcell=44).collect()
    }
    stats, n_noise, _ = _brute_dbscan(pts, 1922)
    want = {lab: (c, b, n_noise) for lab, (c, b) in stats.items()}
    assert got == want
    # the fixture really exercises the divergence channel: two clusters,
    # t correctly in the C/A/B-side one (12 vs 4 core) — mid-only
    # keying reads (13, 3)
    assert got == {0: (12, 0, 0), 4: (4, 0, 0)}


def test_bench_final_json_line_fits_driver_window():
    """r10 verdict #1: the driver captures only the last ~2000 chars of
    bench.py stdout and parses the FINAL line. Rebuild that line with
    the current headline set at worst-case numeric widths and assert it
    stays comfortably inside the window — adding rotating rows must not
    silently push the driver artifact back to `parsed: null`."""
    import json

    import bench

    names = bench.HEADLINE + ["tq_power_22", "s1_rebatcher_items_per_sec"]
    line = json.dumps(
        {
            "metric": "headline_queries_total",
            "value": 99999.9999,
            "frozen_total": 99999.9999,
            "rotating_total": 99999.9999,
            "canary_sec": 0.5555,
            "canary_band": [0.45, 0.55],
            "canary_mid": 0.5,
            "unit": "sec",
            "queries": {n: 99999.9999 for n in names},
            "worst_ratio_canary_normalized": 9.9999,
            "worst_row": max(names, key=len),
            "sf": 0.1,
        }
    )
    assert len(line) <= 1800, (
        f"bench final JSON line would be {len(line)} chars at worst-case "
        "widths; trim the headline set or move fields to the detail line"
    )


class TestZipHardening:
    """r10 ADVICE (low): UTF-8 name flag, ZipFormatError on truncation,
    EOCD-impostor-in-comment resilience."""

    def test_utf8_name_flag_set_and_zipfile_decodes(self):
        import io
        import struct
        import zipfile

        from nibbler_spark.operators.zip_container import encode_zip

        payload = encode_zip(
            [("docs/naïve-ß≈.txt", b"abc"), ("plain.txt", b"xyz")],
            method="stored",
        )
        # local header flags at offset 6: bit 11 set for the non-ASCII
        # name, clear for the ASCII one
        flags0 = struct.unpack_from("<H", payload, 6)[0]
        assert flags0 & 0x0800
        with zipfile.ZipFile(io.BytesIO(payload)) as zf:
            names = zf.namelist()
            assert "docs/naïve-ß≈.txt" in names
            infos = {i.filename: i.flag_bits for i in zf.infolist()}
            assert infos["docs/naïve-ß≈.txt"] & 0x0800
            assert not infos["plain.txt"] & 0x0800

    def test_truncated_central_directory_raises_format_error(self):
        from nibbler_spark.operators.zip_container import (
            ZipFormatError,
            encode_zip,
            parse_zip,
        )

        payload = bytearray(encode_zip([("a.txt", b"hello world")]))
        # overwrite the EOCD's cd_off to point past the payload, then
        # re-point the comment-length validation window: forge an EOCD
        # whose cd_off lands mid-file so the CD read is truncated junk
        eocd = len(payload) - 22
        import struct

        struct.pack_into("<I", payload, eocd + 16, len(payload) - 30)
        with pytest.raises(ZipFormatError):
            parse_zip(bytes(payload))
        # hard truncation mid-central-directory also stays typed
        good = encode_zip([("a.txt", b"hello world")])
        with pytest.raises(ZipFormatError):
            parse_zip(good[:-40] + good[-22:])

    def test_eocd_signature_inside_comment_is_skipped(self):
        import io
        import struct
        import zipfile

        from nibbler_spark.operators.zip_container import parse_zip

        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("m.txt", "payload body")
            # a comment embedding a spurious EOCD signature plus
            # plausible-looking zeros — the backwards scan hits this
            # impostor FIRST and must reject it (comment length says
            # the real record ends the file)
            zf.comment = (
                b"x" * 5 + struct.pack("<IHHHHIIH", 0x06054B50,
                                       0, 0, 1, 1, 46, 0, 0) + b"y" * 7
            )
        got = parse_zip(buf.getvalue())
        assert [(m["name"], m["data"]) for m in got] == [
            ("m.txt", b"payload body")
        ]


def _docs_fixture(spark, sf_dir):
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/documents.parquet")
    return tbl.to_pylist()


def test_shard_rebalance_plan_matches_python_greedy(spark, sf_dir):
    """Brute-force replay: HRW homes + byte sums + the greedy itself in
    plain Python with no Spark/DuckDB machinery; the operator's 8-row
    plan must match exactly (loads, movement, invariant)."""
    import hashlib

    from nibbler_spark.queries import load_all

    docs = _docs_fixture(spark, sf_dir)

    def hrw(doc_id, n):
        return max(
            range(n),
            key=lambda s: hashlib.md5(f"{s}:{doc_id}".encode()).hexdigest(),
        )

    by_src = {}
    for d in docs:
        s = d["source"]
        e = by_src.setdefault(s, {"bytes": 0, "homes": {}})
        e["bytes"] += d["n_chars"]
        h = hrw(d["doc_id"], 8)
        e["homes"][h] = e["homes"].get(h, 0) + 1
    summary = [
        (
            s,
            e["bytes"],
            min(e["homes"], key=lambda k: (-e["homes"][k], k)),
        )
        for s, e in by_src.items()
    ]
    total = sum(b for _, b, _ in summary)
    cap = total * 5 // 32
    loads = [0] * 8
    per_shard = {
        j: {"n": 0, "bytes": 0, "mn": 0, "mb": 0} for j in range(8)
    }
    moved_total = 0
    forced = True
    for s, b, home in sorted(summary, key=lambda r: (-r[1], r[0])):
        hl = loads[home]
        ch = (
            home
            if hl + b <= cap
            else min(range(8), key=lambda j: (loads[j], j))
        )
        loads[ch] += b
        per_shard[ch]["n"] += 1
        per_shard[ch]["bytes"] += b
        if ch != home:
            per_shard[ch]["mn"] += 1
            per_shard[ch]["mb"] += b
            moved_total += b
            forced = forced and (hl + b > cap)
    got = load_all()["ext_shard_rebalance_plan"].spark(spark, sf_dir)
    rows = {r["shard"]: r for r in got.collect()}
    assert set(rows) == set(range(8))
    for j in range(8):
        r = rows[j]
        assert (
            r["n_sources"],
            r["planned_bytes"],
            r["moved_in_sources"],
            r["moved_in_bytes"],
            r["total_moved_bytes"],
            r["cap_bytes"],
            r["all_moves_forced"],
        ) == (
            per_shard[j]["n"],
            per_shard[j]["bytes"],
            per_shard[j]["mn"],
            per_shard[j]["mb"],
            moved_total,
            cap,
            forced,
        )


def test_quality_distillation_matches_python_nb(spark, sf_dir):
    """Brute-force NB-distillation replay (pure Python, math.log with
    the same 1e-9 floor grid) — confusion matrix and token lists."""
    import math

    from nibbler_spark.queries import load_all

    docs = _docs_fixture(spark, sf_dir)
    g = lambda x: math.floor(math.log(x) * 1e9)
    stop = {"the", "a", "of", "and", "to"}
    labs = {}
    for d in docs:
        t = d["text"].split(" ")
        ns = sum(1 for w in t if w in stop)
        labs[d["doc_id"]] = (
            t,
            1 if (30 <= len(t) <= 90 and 15 * ns >= len(t)) else 0,
        )
    pc, nc = {}, {}
    for t, y in labs.values():
        for w in t:
            (pc if y else nc)[w] = (pc if y else nc).get(w, 0) + 1
    vocab = set(pc) | set(nc)
    wgt = {w: g(pc.get(w, 0) + 1) - g(nc.get(w, 0) + 1) for w in vocab}
    p_tot, n_tot, v = sum(pc.values()), sum(nc.values()), len(vocab)
    n_pos = sum(y for _, y in labs.values())
    bias = g(n_pos + 1) - g(len(labs) - n_pos + 1)
    const = g(n_tot + v) - g(p_tot + v)
    tp = fp = fn = tn = 0
    for t, y in labs.values():
        sc = bias + sum(wgt[w] for w in t) + len(t) * const
        yhat = 1 if sc > 0 else 0
        tp += y and yhat
        fp += (not y) and yhat
        fn += y and (not yhat)
        tn += (not y) and (not yhat)
    top_pos = " ".join(
        w for w in sorted(vocab, key=lambda w: (-wgt[w], w))[:5]
    )
    top_neg = " ".join(
        w for w in sorted(vocab, key=lambda w: (wgt[w], w))[:5]
    )
    r = (
        load_all()["ext_quality_distillation"]
        .spark(spark, sf_dir)
        .collect()[0]
    )
    assert (
        r["n_docs"],
        r["n_pos_teacher"],
        r["tp"],
        r["fp"],
        r["fn"],
        r["tn"],
        r["agreement_micro"],
        r["top_pos_tokens"],
        r["top_neg_tokens"],
    ) == (
        len(labs),
        n_pos,
        tp,
        fp,
        fn,
        tn,
        (tp + tn) * 1000000 // len(labs),
        top_pos,
        top_neg,
    )


def test_dedup_index_compaction_matches_python(spark, sf_dir):
    """Brute-force epoch/band replay (pure Python md5 minhash) for the
    compaction record — including the pair-set equality invariant."""
    import hashlib

    from nibbler_spark.queries import load_all
    from nibbler_spark.queries.llm_dedup import _PMH_BAND, _PMH_SEEDS

    docs = _docs_fixture(spark, sf_dir)

    def shingles(text):
        t = text.split(" ")
        return list(
            dict.fromkeys(
                " ".join(t[i : i + 3]) for i in range(len(t) - 2)
            )
        ) if len(t) >= 3 else []

    def bands(text):
        ts = shingles(text)
        if not ts:
            return []
        mh = [
            min(
                int(
                    hashlib.md5(f"{seed}:{tok}".encode()).hexdigest()[:12],
                    16,
                )
                for tok in ts
            )
            for seed in range(_PMH_SEEDS)
        ]
        return [
            (b, mh[b * _PMH_BAND], mh[b * _PMH_BAND + 1])
            for b in range(_PMH_SEEDS // _PMH_BAND)
        ]

    entries = []  # (doc, epoch, band, v1, v2)
    latest_text = {}
    for d in docs:
        did, text = d["doc_id"], d["text"]
        if did % 3 < 2:
            entries += [(did, 1, *b) for b in bands(text)]
            latest_text[did] = text
        if did % 6 == 0:
            rt = text + " compaction revision marker"
            entries += [(did, 2, *b) for b in bands(rt)]
            latest_text[did] = rt
        if did % 3 == 2:
            entries += [(did, 2, *b) for b in bands(text)]
            latest_text[did] = text
    le = {}
    for did, ep, *_ in entries:
        le[did] = max(le.get(did, 0), ep)
    compacted = [e for e in entries if e[1] == le[e[0]]]

    def pairset(rows):
        buckets = {}
        for did, *_, b, v1, v2 in [
            (r[0], None, r[2], r[3], r[4]) for r in rows
        ]:
            buckets.setdefault((b, v1, v2), set()).add(did)
        out = set()
        for mem in buckets.values():
            ms = sorted(mem)
            for i, a in enumerate(ms):
                for b2 in ms[i + 1 :]:
                    out.add((a, b2))
        return out

    cp = pairset(compacted)
    fresh = [
        (did, le[did], *b)
        for did, text in latest_text.items()
        for b in bands(text)
    ]
    fpairs = pairset(fresh)
    r = (
        load_all()["ext_dedup_index_compaction"]
        .spark(spark, sf_dir)
        .collect()[0]
    )
    assert (
        r["n_entries_before"],
        r["n_entries_after"],
        r["n_dropped"],
        r["n_buckets_before"],
        r["n_buckets_after"],
        r["n_pairs_compacted"],
        r["n_pairs_fresh"],
        r["pairs_equal"],
    ) == (
        len(entries),
        len(compacted),
        len(entries) - len(compacted),
        len({(b, v1, v2) for _, _, b, v1, v2 in entries}),
        len({(b, v1, v2) for _, _, b, v1, v2 in compacted}),
        len(cp),
        len(fpairs),
        cp == fpairs,
    )
    assert r["n_dropped"] > 0  # the fixture really has superseded entries
    assert r["pairs_equal"]


def test_curriculum_schedule_matches_python(spark, sf_dir):
    """Brute-force rarity/ntile replay in pure Python."""
    import math

    from nibbler_spark.queries import load_all

    docs = _docs_fixture(spark, sf_dir)
    g = lambda x: math.floor(math.log(x) * 1e9)
    df = {}
    for d in docs:
        for w in set(d["text"].split(" ")):
            df[w] = df.get(w, 0) + 1
    n = len(docs)
    rows = []
    for d in docs:
        toks = d["text"].split(" ")
        tot = sum(g(n) - g(df[w]) for w in toks)
        rows.append(
            (d["doc_id"], d["lang"], len(toks), tot // len(toks))
        )
    rows.sort(key=lambda r: (r[3], r[0]))
    want = {}
    for rk, (did, lang, t_doc, rar) in enumerate(rows):
        st = rk * 4 // n
        e = want.setdefault(
            st,
            {"n": 0, "mn": None, "mx": None, "tok": 0, "en": 0, "zh": 0},
        )
        e["n"] += 1
        e["mn"] = rar if e["mn"] is None else min(e["mn"], rar)
        e["mx"] = rar if e["mx"] is None else max(e["mx"], rar)
        e["tok"] += t_doc
        e["en"] += lang == "en"
        e["zh"] += lang == "zh"
    got = {
        r["stage"]: (
            r["n_docs"],
            r["min_rarity_g"],
            r["max_rarity_g"],
            r["total_tokens"],
            r["n_en"],
            r["n_zh"],
        )
        for r in load_all()["ext_curriculum_schedule"]
        .spark(spark, sf_dir)
        .collect()
    }
    assert got == {
        st: (e["n"], e["mn"], e["mx"], e["tok"], e["en"], e["zh"])
        for st, e in want.items()
    }
    assert set(got) == {0, 1, 2, 3}


def test_dedup_cluster_canonical_matches_python(spark, sf_dir):
    """Brute-force MinHash pair graph + 3-round min-label + canonical
    argmax in pure Python."""
    import hashlib

    from nibbler_spark.queries import load_all
    from nibbler_spark.queries.llm_dedup import _PMH_BAND, _PMH_SEEDS

    docs = _docs_fixture(spark, sf_dir)
    sh = {}
    nch = {}
    for d in docs:
        t = d["text"].split(" ")
        sh[d["doc_id"]] = (
            list(
                dict.fromkeys(
                    " ".join(t[i : i + 3]) for i in range(len(t) - 2)
                )
            )
            if len(t) >= 3
            else []
        )
        nch[d["doc_id"]] = d["n_chars"]
    buckets = {}
    for did, ts in sh.items():
        if not ts:
            continue
        mh = [
            min(
                int(
                    hashlib.md5(f"{s}:{tok}".encode()).hexdigest()[:12], 16
                )
                for tok in ts
            )
            for s in range(_PMH_SEEDS)
        ]
        for b in range(_PMH_SEEDS // _PMH_BAND):
            buckets.setdefault(
                (b, mh[b * _PMH_BAND], mh[b * _PMH_BAND + 1]), []
            ).append(did)
    pairs = set()
    for mem in buckets.values():
        ms = sorted(set(mem))
        for i, a in enumerate(ms):
            for b in ms[i + 1 :]:
                c = len(set(sh[a]) & set(sh[b]))
                u = len(sh[a]) + len(sh[b]) - c
                if 5 * c >= 3 * u:
                    pairs.add((a, b))
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    labels = {v: v for v in adj}
    for _ in range(3):
        labels = {
            v: min([labels[v]] + [labels[u] for u in adj[v]])
            for v in adj
        }
    clus = {}
    for v, lab in labels.items():
        clus.setdefault(lab, []).append(v)
    want = []
    for lab, mem in clus.items():
        canon = max(mem, key=lambda v: (nch[v], -v))
        tot = sum(nch[v] for v in mem)
        want.append(
            (
                lab,
                len(mem),
                canon,
                nch[canon],
                len(mem) - 1,
                tot - nch[canon],
            )
        )
    want.sort(key=lambda r: (-r[1], r[0]))
    got = [
        tuple(r)
        for r in load_all()["ext_dedup_cluster_canonical"]
        .spark(spark, sf_dir)
        .collect()
    ]
    assert got == want[:20]
    assert got and got[0][1] >= 2  # real multi-member clusters exist


def test_stream_quality_gate_matches_python(spark, sf_dir):
    """Pure-Python replay of the per-source arrived-bytes budget gate
    over (epoch, doc_id) order — the streaming trajectory must equal
    the offline prefix replay exactly, and the fixture must exercise
    both admit and drop branches."""
    from nibbler_spark.queries import load_all
    from nibbler_spark.queries.streaming_q import _QGATE_QUOTA

    docs = _docs_fixture(spark, sf_dir)
    hi = max(d["doc_id"] for d in docs)
    rows = sorted(
        (
            (
                d["source"],
                min(3, int(d["doc_id"] * 4 / (hi + 1))),
                d["doc_id"],
                d["n_chars"],
            )
            for d in docs
        ),
        key=lambda r: (r[0], r[1], r[2]),
    )
    state = {}
    cards = {}
    for src, ep, _, n in rows:
        s = state.setdefault(src, [0, 0, 0, 0])
        s[0] += n
        if s[0] <= _QGATE_QUOTA:
            s[1] += 1
            s[2] += n
        else:
            s[3] += 1
        cards[(src, ep)] = (s[1], s[2], s[3])
    got = {
        (r["source"], r["epoch"]): (
            r["kept_n"],
            r["kept_bytes"],
            r["dropped_n"],
        )
        for r in load_all()["i56_stream_quality_gate"]
        .spark(spark, sf_dir)
        .collect()
    }
    assert got == cards
    finals = [
        cards[max((k for k in cards if k[0] == src), key=lambda k: k[1])]
        for src in {k[0] for k in cards}
    ]
    assert any(f[0] > 0 for f in finals)  # something admitted
    assert any(f[2] > 0 for f in finals)  # something dropped


def test_dedup_survivorship_audit_matches_python(spark, sf_dir):
    """Pure-Python replay: same graph/canonical machinery as the
    canonical test, then the per-lang fate classification."""
    import hashlib

    from nibbler_spark.queries import load_all
    from nibbler_spark.queries.llm_dedup import _PMH_BAND, _PMH_SEEDS

    docs = _docs_fixture(spark, sf_dir)
    sh, nch, lang = {}, {}, {}
    for d in docs:
        t = d["text"].split(" ")
        sh[d["doc_id"]] = (
            list(
                dict.fromkeys(
                    " ".join(t[i : i + 3]) for i in range(len(t) - 2)
                )
            )
            if len(t) >= 3
            else []
        )
        nch[d["doc_id"]] = d["n_chars"]
        lang[d["doc_id"]] = d["lang"]
    buckets = {}
    for did, ts in sh.items():
        if not ts:
            continue
        mh = [
            min(
                int(
                    hashlib.md5(f"{s}:{tok}".encode()).hexdigest()[:12], 16
                )
                for tok in ts
            )
            for s in range(_PMH_SEEDS)
        ]
        for b in range(_PMH_SEEDS // _PMH_BAND):
            buckets.setdefault(
                (b, mh[b * _PMH_BAND], mh[b * _PMH_BAND + 1]), []
            ).append(did)
    pairs = set()
    for mem in buckets.values():
        ms = sorted(set(mem))
        for i, a in enumerate(ms):
            for b in ms[i + 1 :]:
                c = len(set(sh[a]) & set(sh[b]))
                u = len(sh[a]) + len(sh[b]) - c
                if 5 * c >= 3 * u:
                    pairs.add((a, b))
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    labels = {v: v for v in adj}
    for _ in range(3):
        labels = {
            v: min([labels[v]] + [labels[u] for u in adj[v]]) for v in adj
        }
    clus = {}
    for v, lab in labels.items():
        clus.setdefault(lab, []).append(v)
    keep = {
        lab: max(mem, key=lambda v: (nch[v], -v))
        for lab, mem in clus.items()
    }
    want = {}
    for did in nch:
        lg = lang[did]
        e = want.setdefault(lg, [0, 0, 0, 0, 0])  # unt, kept, drop, dc, n
        e[4] += 1
        if did not in labels:
            e[0] += 1
        elif did == keep[labels[did]]:
            e[1] += 1
        else:
            e[2] += 1
            e[3] += nch[did]
    got = {
        r["lang"]: (
            r["n_untouched"],
            r["n_kept"],
            r["n_dropped"],
            r["dropped_chars"],
            r["survival_micro"],
        )
        for r in load_all()["ext_dedup_survivorship_audit"]
        .spark(spark, sf_dir)
        .collect()
    }
    assert got == {
        lg: (e[0], e[1], e[2], e[3], (e[0] + e[1]) * 1000000 // e[4])
        for lg, e in want.items()
    }
    assert any(e[2] > 0 for e in want.values())  # dedup really dropped


def test_minhash_param_planner_matches_python(spark, sf_dir):
    """Pure-Python replay of the 4-banding planner card."""
    import hashlib

    from nibbler_spark.queries import load_all
    from nibbler_spark.queries.llm_dedup import (
        _PMH_SEEDS,
        _mpp_est_micro,
    )

    docs = _docs_fixture(spark, sf_dir)
    sh = {}
    for d in docs:
        t = d["text"].split(" ")
        sh[d["doc_id"]] = (
            list(
                dict.fromkeys(
                    " ".join(t[i : i + 3]) for i in range(len(t) - 2)
                )
            )
            if len(t) >= 3
            else []
        )
    sig = {}
    for did, ts in sh.items():
        if ts:
            sig[did] = [
                min(
                    int(
                        hashlib.md5(f"{s}:{tok}".encode()).hexdigest()[
                            :12
                        ],
                        16,
                    )
                    for tok in ts
                )
                for s in range(_PMH_SEEDS)
            ]
    cands = {}
    for r in (1, 2, 3, 4):
        nb = _PMH_SEEDS // r
        buckets = {}
        for did, mh in sig.items():
            for b in range(nb):
                buckets.setdefault(
                    (b, tuple(mh[b * r : (b + 1) * r])), []
                ).append(did)
        ps = set()
        for mem in buckets.values():
            ms = sorted(set(mem))
            for i, a in enumerate(ms):
                for b2 in ms[i + 1 :]:
                    ps.add((a, b2))
        cands[r] = ps
    ver1 = {
        (a, b)
        for a, b in cands[1]
        if 5 * len(set(sh[a]) & set(sh[b]))
        >= 3 * (len(sh[a]) + len(sh[b]) - len(set(sh[a]) & set(sh[b])))
    }
    got = {
        r["r_rows"]: (
            r["n_bands"],
            r["est_recall_micro"],
            r["n_candidates"],
            r["n_verified"],
            r["recall_micro"],
        )
        for r in load_all()["ext_minhash_param_planner"]
        .spark(spark, sf_dir)
        .collect()
    }
    want = {
        r: (
            _PMH_SEEDS // r,
            _mpp_est_micro(r),
            len(cands[r]),
            len(cands[r] & ver1),
            len(cands[r] & ver1) * 1000000 // len(ver1),
        )
        for r in (1, 2, 3, 4)
    }
    assert got == want
    # coarser bandings are candidate-subsets of the r=1 reference
    assert cands[4] <= cands[2] <= cands[1] and cands[3] <= cands[1]
