"""ICO (favicon) codec unit tests (functions/ico.py).

Anchors: (1) the committed fixtures decode BIT-EXACTLY to a loop-math
truth computed from the raw RGBA arrays before container assembly;
(2) the DECLARED policies — largest entry, lowest-index tie-break,
0→256 size bytes, embedded-alpha vs AND-mask fallback — each have a
dedicated fixture whose truth encodes the policy; (3) malformed
containers reject loudly.
"""

from __future__ import annotations

import hashlib
import os
import struct

import pytest

from diachronic_spark.functions.ico import IcoError, decode_ico
from diachronic_spark.sources.ico_fixture import (
    ICOS_DIR,
    TRUTH_PATH,
    generate_icos,
    truth_row,
)


def test_fixture_set_bit_exact_vs_loop_truth():
    for ico in generate_icos():
        t = truth_row(ico)
        w, h, c, pix = decode_ico(ico["blob"])
        assert (w, h, c) == (t["width"], t["height"], 4)
        assert hashlib.sha256(pix).hexdigest() == t["pix_sha"], (
            f"ico {ico['ico_id']} diverged from loop truth"
        )


def test_committed_ico_fixtures_are_regenerable():
    import pyarrow.parquet as pq

    icos = generate_icos()
    assert len(icos) == 9
    for ico in icos:
        path = os.path.join(ICOS_DIR, f"icon_{ico['ico_id']:03d}.ico")
        with open(path, "rb") as f:
            assert f.read() == ico["blob"], f"fixture drift: {path}"
    stored = {
        r["ico_id"]: r for r in pq.read_table(TRUTH_PATH).to_pylist()
    }
    for ico in icos:
        assert truth_row(ico) == stored[ico["ico_id"]]


def test_policies_have_dedicated_fixtures():
    """The declared selection/alpha policies are each load-bearing in
    at least one fixture: flipping the policy would flip that
    fixture's truth."""
    icos = generate_icos()
    # ico 6: three entries, the 32x32 PNG in the MIDDLE must win
    assert icos[6]["n_entries"] == 3
    assert (icos[6]["width"], icos[6]["height"]) == (32, 32)
    # ico 7: area tie -> entry 0 (a PNG; entry 1 is a DIB whose alpha
    # plane would change sum_a)
    assert icos[7]["n_entries"] == 2
    w, h, c, pix = decode_ico(icos[7]["blob"])
    assert hashlib.sha256(pix).hexdigest() == truth_row(icos[7])["pix_sha"]
    # ico 8: 256x256 stored as size byte 0
    blob = icos[8]["blob"]
    assert blob[6] == 0 and blob[7] == 0
    assert decode_ico(blob)[:2] == (256, 256)
    # ico 3: 32bpp with an all-zero alpha plane -> AND-mask alpha
    t3 = truth_row(icos[3])
    assert 0 < t3["sum_a"] < 255 * t3["width"] * t3["height"]


def test_decode_rejects_malformed():
    ok = generate_icos()[0]["blob"]
    with pytest.raises(IcoError, match="signature"):
        decode_ico(b"\x00\x00\x02\x00" + ok[4:])  # cursor type
    with pytest.raises(IcoError, match="empty"):
        decode_ico(ok[:4] + b"\x00\x00")
    with pytest.raises(IcoError, match="directory"):
        decode_ico(ok[:6])  # truncated ICONDIRENTRY table
    # entry data offset pointing inside the directory
    bad = bytearray(ok)
    struct.pack_into("<I", bad, 6 + 12, 3)
    with pytest.raises(IcoError, match="inside the directory"):
        decode_ico(bytes(bad))
    # entry data out of bounds
    bad = bytearray(ok)
    struct.pack_into("<I", bad, 6 + 8, 1 << 30)  # size
    with pytest.raises(IcoError, match="out of bounds"):
        decode_ico(bytes(bad))
    # truncated DIB payload (ico 2 is a single-DIB icon)
    dib = generate_icos()[2]["blob"]
    with pytest.raises(IcoError):
        decode_ico(dib[: len(dib) - 40])


def test_png_entry_dimension_mismatch_rejected():
    """A PNG entry whose IHDR disagrees with the directory must raise,
    not silently trust either side."""
    ico = generate_icos()[0]  # single 16x16 PNG entry
    bad = bytearray(ico["blob"])
    bad[6] = 15  # directory says 15x16 now
    with pytest.raises(IcoError, match="!= directory"):
        decode_ico(bytes(bad))


def test_roundtrip_property_fuzz():
    """Random small RGBA icons through the DIB-32 assembly path must
    decode back bit-exactly (alpha plane form: mask present but
    ignored)."""
    from hypothesis import given, settings, strategies as st

    from diachronic_spark.sources.ico_fixture import (
        _dib_truth_rgba,
        _entry_blob,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        seed=st.integers(min_value=0, max_value=10**6),
        w=st.integers(min_value=1, max_value=33),
        h=st.integers(min_value=1, max_value=33),
        kind=st.sampled_from(["dib32", "dib32z", "dib24", "dib8"]),
    )
    def check(seed, w, h, kind):
        data = _entry_blob(seed, kind, w, h)
        blob = (
            b"\x00\x00\x01\x00\x01\x00"
            + struct.pack(
                "<BBBBHHII",
                0 if w == 256 else w, 0 if h == 256 else h,
                0, 0, 1, 32, len(data), 22,
            )
            + data
        )
        dw, dh, dc, pix = decode_ico(blob)
        assert (dw, dh, dc) == (w, h, 4)
        bpp = {"dib32": 32, "dib32z": 32, "dib24": 24, "dib8": 8}[kind]
        alpha = {"dib32": "plane", "dib32z": "zero",
                 "dib24": "opaque", "dib8": "mask"}[kind]
        want = bytearray()
        for row in _dib_truth_rgba(seed, w, h, bpp, alpha):
            for px in row:
                want += bytes(px)
        assert pix == bytes(want)

    check()


_HOST_ICOS = [
    p
    for p in (
        "/root/.pyenv/versions/3.13.0/lib/python3.13/idlelib/Icons/idle.ico",
        "/mnt/sandboxing/model_tools_env/v1/python/install/lib/"
        "python3.11/idlelib/Icons/idle.ico",
    )
    if os.path.exists(p)
]


@pytest.mark.skipif(not _HOST_ICOS, reason="host .ico files absent")
def test_decode_third_party_icons():
    """CPython's idle.ico (4 mixed entries: three 32bpp DIBs + one
    256x256 PNG) — third-party container assembly. The whole-file
    decode exercises directory parsing + the 0→256 rule + the PNG
    path; each DIB entry is then re-wrapped as a single-entry icon so
    the real-world XOR/AND layout is decoded too."""
    for p in _HOST_ICOS:
        with open(p, "rb") as f:
            blob = f.read()
        w, h, c, pix = decode_ico(blob)
        assert (w, h, c) == (256, 256, 4) and len(pix) == w * h * 4
        (count,) = struct.unpack("<H", blob[4:6])
        for i in range(count):
            e = blob[6 + 16 * i : 22 + 16 * i]
            w8, h8, _nc, _res, _pl, _bpp, size, off = struct.unpack(
                "<BBBBHHII", e
            )
            sub = (
                blob[:4]
                + struct.pack("<H", 1)
                + e[:12]
                + struct.pack("<I", 22)
                + blob[off : off + size]
            )
            sw, sh, sc, spix = decode_ico(sub)
            assert (sw, sh, sc) == (w8 or 256, h8 or 256, 4)
            assert len(spix) == sw * sh * 4
