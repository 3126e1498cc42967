"""Baseline-TIFF codec unit tests (functions/tiff.py).

Anchors: (1) the committed fixtures decode BIT-EXACTLY to the
pre-assembly display-pixel truth; (2) EXTERNAL validation — CPython's
python.tiff (a libtiff-era RGBA file shipped with the stdlib test
suite) decodes bit-identically to its independently-shipped raw-RGB
PPM twin; (3) the TIFF-LZW early-change rule round-trips across
every code-width boundary (hypothesis); (4) declared policies
(first-IFD, ColorMap high byte) are load-bearing; (5) malformed/
unsupported containers reject loudly.
"""

from __future__ import annotations

import hashlib
import os
import re
import struct

import pytest

from diachronic_spark.functions.tiff import (
    TiffError,
    _lzw_decode,
    decode_tiff,
    page_count,
)
from diachronic_spark.sources.tiff_fixture import (
    TIFFS_DIR,
    TRUTH_PATH,
    _lzw_encode,
    generate_tiffs,
    truth_row,
)

_HOST_DIRS = [
    "/root/.pyenv/versions/3.12.1/lib/python3.12/test/imghdrdata",
    "/root/.pyenv/versions/3.10.13/lib/python3.10/test/imghdrdata",
]


def test_fixture_set_bit_exact_vs_loop_truth():
    for t in generate_tiffs():
        tr = truth_row(t)
        w, h, c, pix = decode_tiff(t["blob"])
        assert (w, h, c) == (tr["width"], tr["height"], tr["channels"])
        assert hashlib.sha256(pix).hexdigest() == tr["pix_sha"], (
            f"tiff {t['img_id']} diverged from loop truth"
        )
        assert page_count(t["blob"]) == tr["n_pages"]


def test_committed_tiff_fixtures_are_regenerable():
    import pyarrow.parquet as pq

    tiffs = generate_tiffs()
    assert len(tiffs) == 7
    for t in tiffs:
        path = os.path.join(TIFFS_DIR, f"scan_{t['img_id']:03d}.tif")
        with open(path, "rb") as f:
            assert f.read() == t["blob"], f"fixture drift: {path}"
    stored = {
        r["img_id"]: r for r in pq.read_table(TRUTH_PATH).to_pylist()
    }
    for t in tiffs:
        assert truth_row(t) == stored[t["img_id"]]


def test_host_tiff_matches_its_ppm_twin():
    """CPython ships the same 16x16 logo as python.tiff (RGBA,
    uncompressed, written by a real third-party encoder) AND
    python.ppm (raw P6 RGB) — decoding the TIFF must reproduce the
    PPM's RGB channels byte-for-byte."""
    host = next((d for d in _HOST_DIRS if os.path.isdir(d)), None)
    if host is None:
        pytest.skip("no host imghdrdata directory")
    with open(os.path.join(host, "python.tiff"), "rb") as f:
        tif = f.read()
    with open(os.path.join(host, "python.ppm"), "rb") as f:
        ppm = f.read()
    m = re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)\s", ppm)
    pw, ph, _mx = map(int, m.groups())
    body = ppm[m.end() :]
    w, h, c, pix = decode_tiff(tif)
    assert (w, h, c) == (pw, ph, 4)
    assert all(
        pix[i * 4 + k] == body[i * 3 + k]
        for i in range(w * h)
        for k in range(3)
    )


def test_multi_page_keeps_first_ifd_only():
    t = generate_tiffs()[6]
    assert page_count(t["blob"]) == 2
    tr = truth_row(t)
    w, h, c, _pix = decode_tiff(t["blob"])
    # page 2 declares 2x2; the declared policy keeps page 1's 6x4
    assert (w, h) == (tr["width"], tr["height"]) == (6, 4)


def test_colormap_high_byte_rule_is_load_bearing():
    """Fixture 4's ColorMap low bytes are junk; flipping the decode
    to the low byte would change every palette pixel."""
    t = generate_tiffs()[4]
    _w, _h, _c, pix = decode_tiff(t["blob"])
    assert hashlib.sha256(pix).hexdigest() == truth_row(t)["pix_sha"]


def test_lzw_early_change_roundtrip_fuzz():
    """Encoder and decoder cross every 9→10→11→12 bit boundary in
    agreement — the early-change rule is exactly where TIFF LZW
    implementations classically disagree with GIF's."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        data=st.binary(min_size=0, max_size=3000),
        mode=st.sampled_from(["raw", "runs", "cycle"]),
    )
    def check(data, mode):
        if mode == "runs":
            data = b"".join(
                bytes([b % 7]) * (1 + b % 5) for b in data
            )
        elif mode == "cycle":
            data = bytes(i % 251 for i in range(len(data) * 3))
        enc = _lzw_encode(data)
        assert _lzw_decode(enc, len(data)) == data

    check()
    # deterministic deep case: crosses into 12-bit codes
    data = bytes((i * 7 + (i >> 3)) % 256 for i in range(30000))
    assert _lzw_decode(_lzw_encode(data), len(data)) == data


def _patch_tag(blob: bytes, tag: int, new_inline: int) -> bytes:
    """Rewrite an IFD entry's inline value (first IFD, II or MM)."""
    e = "<" if blob[:2] == b"II" else ">"
    (off,) = struct.unpack_from(e + "I", blob, 4)
    (n,) = struct.unpack_from(e + "H", blob, off)
    out = bytearray(blob)
    for i in range(n):
        pos = off + 2 + 12 * i
        t, typ, cnt = struct.unpack_from(e + "HHI", blob, pos)
        if t == tag:
            fmt = {3: "H", 4: "I"}[typ]
            struct.pack_into(e + fmt, out, pos + 8, new_inline)
            return bytes(out)
    raise AssertionError(f"tag {tag} not found")


def test_loud_rejections():
    t0 = generate_tiffs()[0]  # II, gray, uncompressed
    blob = t0["blob"]

    with pytest.raises(TiffError, match="signature"):
        decode_tiff(b"GI87" + blob[4:])
    with pytest.raises(TiffError, match="truncated|overruns"):
        decode_tiff(blob[:40])
    with pytest.raises(TiffError, match="unsupported compression"):
        decode_tiff(_patch_tag(blob, 259, 7))  # JPEG-in-TIFF
    with pytest.raises(TiffError, match="planar"):
        decode_tiff(_patch_tag(blob, 284, 2))
    with pytest.raises(TiffError, match="bit depth"):
        decode_tiff(_patch_tag(blob, 258, 16))
    with pytest.raises(TiffError, match="photometric"):
        decode_tiff(_patch_tag(blob, 262, 6))  # YCbCr
    with pytest.raises(TiffError, match="overruns"):
        decode_tiff(_patch_tag(blob, 273, len(blob)))
    # t3 carries LZW + predictor 2: unknown predictor value, the
    # malformed predictor-without-compression combination, and a
    # truncated LZW stream all reject loudly
    t3 = generate_tiffs()[3]
    with pytest.raises(TiffError, match="predictor"):
        decode_tiff(_patch_tag(t3["blob"], 317, 3))
    with pytest.raises(TiffError, match="predictor 2"):
        decode_tiff(_patch_tag(t3["blob"], 259, 1))
    with pytest.raises(TiffError):
        decode_tiff(t3["blob"][:-60])


def test_packbits_noop_byte_is_skipped():
    """0x80 is a spec'd no-op between runs; the committed encoder
    never emits it, so pin the decoder directly."""
    from diachronic_spark.functions.tiff import _unpackbits

    assert _unpackbits(b"\x02abc\x80\xfeZ", 6) == b"abcZZZ"


def test_dispatch_routes_tiff():
    from diachronic_spark.operators.multimodal import decode

    t = generate_tiffs()[0]
    w, h, c, pix = decode(t["blob"])
    assert (w, h, c) == (16, 16, 1) and len(pix) == 256
