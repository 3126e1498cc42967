"""Baseline-JPEG codec unit tests (functions/jpeg.py).

Three independent anchors: (1) hand-computable DC-only blocks — the
IDCT of a DC-only block is a FLAT plane at DC/8, so expected pixels
derive from arithmetic a reviewer can check on paper; (2) the
committed fixture set decodes BIT-EXACTLY to a pure-Python loop-math
truth computed from the quantized coefficients (test_multimodal has
the drift check; here the equality itself); (3) libjpeg-encoded
host test images parse end-to-end where present — third-party
entropy coding, optimized multi-length Huffman tables, real photos.
"""

from __future__ import annotations

import glob
import hashlib
import os

import pytest

from diachronic_spark.functions.jpeg import (
    JpegError,
    decode_jpeg,
)
from diachronic_spark.sources.jpeg_fixture import (
    generate_jpegs,
    truth_row,
)

_HOST_JPEGS = [
    p
    for pat in (
        "/mnt/sandboxing/model_tools_env/v1/python/install/lib/"
        "python3.11/site-packages/IPython/core/tests/2x2.jpg",
        "/mnt/sandboxing/model_tools_env/v1/python/install/lib/"
        "python3.11/test/imghdrdata/python.jpg",
        "/root/.rustup/toolchains/stable-x86_64-unknown-linux-gnu/"
        "share/doc/rust/html/embedded-book/assets/verify.jpeg",
    )
    for p in glob.glob(pat)
]


def test_dc_only_block_arithmetic_by_hand():
    """Paper-checkable anchor for the transform pair: the orthonormal
    DCT of a CONSTANT block v is DC-only with F[0][0] = 8·(v−128)
    (basis row 0 is the constant 1/(2√2), and 64·(v−128)/(2√2)² =
    8·(v−128)); inverting that lone coefficient reconstructs the flat
    plane exactly."""
    import numpy as np

    from diachronic_spark.functions.jpeg import COS_BASIS, idct_block

    assert abs(COS_BASIS[0][0] - 0.35355339059327373) < 1e-15
    v = 200.0
    f00 = sum(
        (v - 128.0) * COS_BASIS[0][x] * COS_BASIS[0][y]
        for x in range(8)
        for y in range(8)
    )
    assert abs(f00 - 8 * (v - 128.0)) < 1e-9
    coef = np.zeros((8, 8))
    coef[0, 0] = 8 * (v - 128.0)
    assert np.allclose(idct_block(coef), v - 128.0, atol=1e-9)


def test_fixture_set_bit_exact_vs_loop_truth():
    for img in generate_jpegs():
        t = truth_row(img)
        w, h, c, pix = decode_jpeg(img["blob"])
        assert (w, h, c) == (t["width"], t["height"], t["channels"])
        assert hashlib.sha256(pix).hexdigest() == t["pix_sha"], (
            f"img {img['img_id']} diverged from loop truth"
        )


def test_committed_jpeg_fixtures_are_regenerable():
    from diachronic_spark.sources.jpeg_fixture import JPEGS_DIR

    import pyarrow.parquet as pq

    from diachronic_spark.sources.jpeg_fixture import TRUTH_PATH

    imgs = generate_jpegs()
    assert len(imgs) == 12
    for img in imgs:
        path = os.path.join(JPEGS_DIR, f"img_{img['img_id']:03d}.jpg")
        with open(path, "rb") as f:
            assert f.read() == img["blob"], f"fixture drift: {path}"
    stored = {
        r["img_id"]: r for r in pq.read_table(TRUTH_PATH).to_pylist()
    }
    for img in imgs:
        assert truth_row(img) == stored[img["img_id"]]


def test_decode_rejects_malformed():
    ok = generate_jpegs()[0]["blob"]
    with pytest.raises(JpegError, match="SOI"):
        decode_jpeg(b"GIF89a" + ok)
    with pytest.raises(JpegError, match="truncated"):
        decode_jpeg(ok[: len(ok) // 3])
    # flip the SOF0 marker to SOF3 (lossless) — must reject loudly
    # (SOF2 progressive decodes for real since round 8)
    i = ok.index(b"\xff\xc0")
    lossless = ok[:i] + b"\xff\xc3" + ok[i + 2 :]
    with pytest.raises(JpegError, match="SOF"):
        decode_jpeg(lossless)
    # corrupt a byte mid-entropy-stream: the decoder must fail loudly
    # (desync -> bad Huffman code / category / run), never emit
    # silently wrong pixels of the wrong SIZE
    j = ok.index(b"\xff\xda") + 30
    bad = bytearray(ok)
    bad[j] ^= 0x5A
    try:
        w, h, c, pix = decode_jpeg(bytes(bad))
        assert len(pix) == w * h * c  # if it decodes, shape holds
    except JpegError:
        pass


@pytest.mark.skipif(not _HOST_JPEGS, reason="host JPEGs not present")
def test_decode_third_party_encoded_jpegs():
    """libjpeg-encoded files (real Huffman tables, real photos) must
    decode end-to-end: a bit-reader or Huffman bug desyncs within a
    few MCUs on any non-trivial image."""
    for p in _HOST_JPEGS:
        with open(p, "rb") as f:
            w, h, c, pix = decode_jpeg(f.read())
        assert w > 0 and h > 0 and len(pix) == w * h * c


def test_single_component_scan_ignores_sampling_factors():
    """T.81 A.2: a scan with Ns=1 is NON-interleaved — one data unit
    per MCU, row-major over the component's own ceil/8 grid, sampling
    factors ignored. A grayscale file that declares 2x2 luma sampling
    (what ``jpegtran -grayscale`` leaves behind) must decode to the
    SAME pixels as its 1x1 twin: the entropy stream is identical, only
    the SOF sampling byte differs (ADVICE r7)."""
    for img in generate_jpegs():
        if img["color"]:
            continue
        ok = img["blob"]
        base = decode_jpeg(ok)
        i = ok.index(b"\xff\xc0")
        # FF C0 len(2) prec(1) h(2) w(2) nc(1) cid(1) -> hv byte
        assert ok[i + 11] == 0x11
        patched = ok[: i + 11] + b"\x22" + ok[i + 12 :]
        assert decode_jpeg(patched) == base, (
            f"img {img['img_id']}: declared 2x2 grayscale diverged"
        )


# --- progressive (SOF2) --------------------------------------------------

_HOST_PROG = [
    p
    for pat in (
        "/usr/share/doc/nodejs/thin-white-stripe.jpg",
        "/usr/share/doc/nodejs/full-white-stripe.jpg",
        "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/"
        "multi-channel/grayscale.jpg",
        "/root/.rustup/toolchains/stable-x86_64-unknown-linux-gnu/"
        "share/doc/rust/html/embedded-book/assets/f3.jpg",
    )
    for p in glob.glob(pat)
]


def test_progressive_twins_bit_exact_vs_truth_and_baseline():
    """Each committed progressive twin carries the SAME quantized
    coefficients as its baseline fixture via a full SOF2 scan script
    (DC first/refine, AC bands 1-5/6-63 first + refinement, EOBn
    runs, restarts) — decode must be bit-identical BOTH to the
    loop-math truth and to the baseline decode: the entropy layers
    differ, the coefficients must not."""
    from diachronic_spark.sources.jpeg_fixture import (
        _assemble_progressive,
    )

    for img in generate_jpegs():
        t = truth_row(img)
        w, h, c, pix = decode_jpeg(_assemble_progressive(img))
        assert (w, h, c) == (t["width"], t["height"], t["channels"])
        assert hashlib.sha256(pix).hexdigest() == t["pix_sha"], (
            f"img {img['img_id']} progressive diverged from truth"
        )
        assert (w, h, c, pix) == decode_jpeg(img["blob"]), (
            f"img {img['img_id']} progressive != baseline"
        )


def test_committed_progressive_fixtures_are_regenerable():
    from diachronic_spark.sources.jpeg_fixture import (
        PROG_DIR,
        _assemble_progressive,
    )

    for img in generate_jpegs():
        path = os.path.join(PROG_DIR, f"prog_{img['img_id']:03d}.jpg")
        with open(path, "rb") as f:
            assert f.read() == _assemble_progressive(img), (
                f"fixture drift: {path}"
            )


def test_progressive_rejects_malformed():
    from diachronic_spark.sources.jpeg_fixture import (
        _assemble_progressive,
    )

    ok = _assemble_progressive(generate_jpegs()[0])
    # truncate mid-scan: loud, never silent garbage
    with pytest.raises(JpegError):
        decode_jpeg(ok[: int(len(ok) * 0.6)])
    # drop the EOI: a progressive stream without EOI never
    # reconstructed — loud
    with pytest.raises(JpegError, match="truncated"):
        decode_jpeg(ok[:-2] + b"\x00\x00")
    # baseline scan header (Ss=0..Se=63) under a progressive frame
    # mixes DC and AC bands — loud
    i = generate_jpegs()[0]["blob"].index(b"\xff\xc0")
    prog_hdr = generate_jpegs()[0]["blob"]
    bad = prog_hdr[:i] + b"\xff\xc2" + prog_hdr[i + 2 :]
    with pytest.raises(JpegError, match="mixing DC and AC"):
        decode_jpeg(bad)


@pytest.mark.skipif(not _HOST_PROG, reason="host progressive JPEGs absent")
def test_decode_third_party_progressive_jpegs():
    """libjpeg/mozjpeg-encoded progressive files (optimized per-scan
    Huffman tables, real scan scripts, real photos — including a
    grayscale one) must decode end-to-end: any error in the EOBn or
    refinement bit accounting desyncs within a few blocks."""
    for p in _HOST_PROG:
        with open(p, "rb") as f:
            w, h, c, pix = decode_jpeg(f.read())
        assert w > 0 and h > 0 and len(pix) == w * h * c


def test_fuzz_baseline_and_progressive_agree():
    """Property fuzz over GENERATED configurations (dims off every
    grid, all sampling layouts, all quant variants, restart
    intervals): the baseline stream, the progressive twin, and the
    loop-math truth must agree bit-for-bit. Exercises EOBn run
    batching, the refinement correction-bit interleave, ZRL-in-
    refinement, and restart resets far beyond the 12 committed
    configs."""
    from hypothesis import given, settings, strategies as st

    from diachronic_spark.sources.jpeg_fixture import build_img

    @settings(max_examples=60, deadline=None)
    @given(
        seed=st.integers(min_value=0, max_value=10**6),
        w=st.integers(min_value=1, max_value=40),
        h=st.integers(min_value=1, max_value=40),
        color=st.booleans(),
        samp=st.sampled_from([(1, 1), (2, 1), (1, 2), (2, 2)]),
        qv=st.integers(min_value=0, max_value=2),
        rst=st.sampled_from([0, 1, 2, 5]),
    )
    def check(seed, w, h, color, samp, qv, rst):
        from diachronic_spark.sources.jpeg_fixture import (
            _assemble_progressive,
        )

        img = build_img(seed, w, h, color, samp, qv, rst, False)
        t = truth_row(img)
        base = decode_jpeg(img["blob"])
        prog = decode_jpeg(_assemble_progressive(img))
        assert base == prog, "baseline != progressive"
        bw, bh, bc, bpix = base
        assert (bw, bh, bc) == (t["width"], t["height"], t["channels"])
        assert hashlib.sha256(bpix).hexdigest() == t["pix_sha"]

    check()


def test_exif_fixture_parses_to_truth_and_leaves_pixels_alone():
    """EXIF extraction (q169): every fixture parses to the metadata
    dicts it was built from; injecting the APP1 segment (plus the
    XMP decoy) provably does not perturb the decoded pixels; absent
    metadata yields an all-NULL row, not an error."""
    from diachronic_spark.functions.exif import FIELDS, parse_exif
    from diachronic_spark.sources.exif_fixture import (
        generate_exif_jpegs,
        truth_row,
    )
    from diachronic_spark.sources.jpeg_fixture import build_img

    jpegs = generate_exif_jpegs()
    assert len(jpegs) == 6
    for j in jpegs:
        got = parse_exif(j["blob"])
        t = truth_row(j)
        assert got == {k: t[k] for k in FIELDS}
        plain = build_img(
            700 + j["img_id"], 8, 8, False, (1, 1), 0, 0, False
        )["blob"]
        assert decode_jpeg(j["blob"]) == decode_jpeg(plain)
    # the no-metadata fixture is the NULL row
    null_row = parse_exif(jpegs[2]["blob"])
    assert all(v is None for v in null_row.values())


def test_exif_corrupt_block_is_loud():
    import pytest as _pytest

    from diachronic_spark.functions.exif import ExifError, parse_exif
    from diachronic_spark.sources.exif_fixture import generate_exif_jpegs

    blob = generate_exif_jpegs()[0]["blob"]
    # break the TIFF header inside the Exif APP1
    bad = blob.replace(b"Exif\x00\x00II*\x00", b"Exif\x00\x00IX*\x00", 1)
    with _pytest.raises(ExifError, match="TIFF header"):
        parse_exif(bad)
    # point IFD0 past the segment
    import struct as _s

    pos = blob.find(b"Exif\x00\x00") + 6
    broken = bytearray(blob)
    _s.pack_into("<I", broken, pos + 4, 0xFFFF)
    with _pytest.raises(ExifError, match="bad IFD0"):
        parse_exif(bytes(broken))
    # committed fixtures + truth parquet are regenerable
    import os

    import pyarrow.parquet as pq

    from diachronic_spark.sources.exif_fixture import (
        EXIF_DIR,
        TRUTH_PATH,
        truth_row,
    )

    stored = {
        r["img_id"]: r for r in pq.read_table(TRUTH_PATH).to_pylist()
    }
    for j in generate_exif_jpegs():
        path = os.path.join(EXIF_DIR, f"photo_{j['img_id']:03d}.jpg")
        with open(path, "rb") as f:
            assert f.read() == j["blob"], f"fixture drift: {path}"
        assert truth_row(j) == stored[j["img_id"]]


def test_exif_marker_walk_tolerates_fill_and_tem(tmp_path):
    """ADVICE r8: T.81 B.1.1.2 allows runs of 0xFF fill bytes before
    any marker, and TEM (0x01) is standalone — a padded-but-valid
    JPEG must still surface its EXIF instead of raising."""
    from diachronic_spark.functions.exif import FIELDS, parse_exif
    from diachronic_spark.sources.exif_fixture import (
        generate_exif_jpegs,
        truth_row,
    )

    j = generate_exif_jpegs()[0]
    blob, t = j["blob"], truth_row(j)
    assert blob[:2] == b"\xff\xd8"
    # inject 3 fill bytes + a TEM marker between SOI and the APP1
    padded = blob[:2] + b"\xff\xff\xff" + b"\xff\x01" + blob[2:]
    got = parse_exif(padded)
    assert got == {k: t[k] for k in FIELDS}
