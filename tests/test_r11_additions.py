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
