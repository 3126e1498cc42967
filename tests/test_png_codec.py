"""PNG codec unit tests (functions/png.py).

The decoder is validated against PNGs built BY HAND from the spec
(explicit filter bytes + zlib, no use of the repo's encoder), so an
encoder/decoder pair of compensating bugs cannot pass; the encoder is
then pinned by exact round-trips over every supported channel count,
size edge, and filter strategy.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from diachronic_spark.functions.png import (
    PngError,
    SIGNATURE,
    decode_png,
    encode_png,
    resize_nearest,
)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _hand_png(
    width, height, color_type, scanlines, plte=None, extra=(),
    interlace=0, depth=8,
):
    """Spec-level PNG construction: scanlines are (filter_byte, raw
    FILTERED bytes) rows, compressed as one zlib stream."""
    ihdr = struct.pack(
        ">IIBBBBB", width, height, depth, color_type, 0, 0, interlace
    )
    raw = b"".join(bytes([f]) + bytes(row) for f, row in scanlines)
    out = SIGNATURE + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    for ctype, data in extra:
        out += _chunk(ctype, data)
    out += _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
    return out


def test_decode_each_filter_type_rgb():
    """5 rows of 3x RGB pixels, one per filter type, filtered BY HAND
    per the spec equations — the decoder must reconstruct the
    originals."""
    rows = [
        [10, 20, 30, 40, 50, 60, 70, 80, 90],       # recon row 0
        [15, 25, 35, 45, 55, 65, 75, 85, 95],
        [200, 100, 50, 210, 110, 60, 220, 120, 70],
        [1, 2, 3, 255, 254, 253, 128, 127, 126],
        [0, 0, 0, 9, 9, 9, 18, 18, 18],
    ]
    bpp = 3

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    scan = []
    prev = [0] * 9
    for y, r in enumerate(rows):
        f = y % 5
        if f == 0:
            filt = r[:]
        elif f == 1:
            filt = [(r[x] - (r[x - bpp] if x >= bpp else 0)) & 0xFF
                    for x in range(9)]
        elif f == 2:
            filt = [(r[x] - prev[x]) & 0xFF for x in range(9)]
        elif f == 3:
            filt = [
                (r[x] - (((r[x - bpp] if x >= bpp else 0) + prev[x]) >> 1))
                & 0xFF
                for x in range(9)
            ]
        else:
            filt = [
                (r[x] - paeth(
                    r[x - bpp] if x >= bpp else 0,
                    prev[x],
                    prev[x - bpp] if x >= bpp else 0,
                )) & 0xFF
                for x in range(9)
            ]
        scan.append((f, filt))
        prev = r
    blob = _hand_png(3, 5, 2, scan)
    w, h, c, pix = decode_png(blob)
    assert (w, h, c) == (3, 5, 3)
    assert list(pix) == [v for r in rows for v in r]


def test_decode_grayscale_and_alpha_types():
    # gray 2x2, filter 0 rows
    g = _hand_png(2, 2, 0, [(0, [7, 9]), (0, [11, 13])])
    assert decode_png(g) == (2, 2, 1, bytes([7, 9, 11, 13]))
    # gray+alpha 2x1
    ga = _hand_png(2, 1, 4, [(0, [50, 255, 60, 128])])
    assert decode_png(ga) == (2, 1, 2, bytes([50, 255, 60, 128]))
    # RGBA 1x2 with Up filter on row 1
    rgba = _hand_png(
        1, 2, 6, [(0, [1, 2, 3, 4]), (2, [10, 10, 10, 10])]
    )
    assert decode_png(rgba) == (1, 2, 4, bytes([1, 2, 3, 4, 11, 12, 13, 14]))


def test_decode_palette_expands_to_rgb():
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
    blob = _hand_png(3, 1, 3, [(0, [2, 0, 1])], plte=plte)
    assert decode_png(blob) == (
        3, 1, 3, bytes([0, 0, 255, 255, 0, 0, 0, 255, 0])
    )


def test_decode_multi_idat_and_ancillary_chunks():
    """The zlib stream may be split across any number of IDATs, and
    unknown ANCILLARY chunks must be skipped (unknown CRITICAL ones
    rejected)."""
    raw = bytes([0, 1, 2, 3]) + bytes([0, 4, 5, 6])  # 3x gray, 2 rows...
    comp = zlib.compress(raw)
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 0, 0, 0, 0)
    blob = (
        SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"tEXt", b"comment\x00skip me")
        + _chunk(b"IDAT", comp[:5])
        + _chunk(b"IDAT", comp[5:])
        + _chunk(b"IEND", b"")
    )
    assert decode_png(blob) == (3, 2, 1, bytes([1, 2, 3, 4, 5, 6]))
    bad = (
        SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"CrIt", b"\x00")  # uppercase first letter: critical
        + _chunk(b"IDAT", comp)
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(PngError, match="critical"):
        decode_png(bad)


def test_decode_rejects_malformed():
    ok = encode_png(2, 2, 3, bytes(range(12)))
    # flip one IDAT payload byte -> CRC mismatch
    i = ok.index(b"IDAT") + 4
    bad = ok[:i] + bytes([ok[i] ^ 0xFF]) + ok[i + 1 :]
    with pytest.raises(PngError, match="CRC"):
        decode_png(bad)
    with pytest.raises(PngError, match="signature"):
        decode_png(b"GIF89a" + ok)
    with pytest.raises(PngError, match="truncated|IEND"):
        decode_png(ok[:-8])
    with pytest.raises(PngError, match="interlac"):
        decode_png(_hand_png(1, 1, 0, [(0, [1])], interlace=1))
    with pytest.raises(PngError, match="bit depth"):
        decode_png(_hand_png(1, 1, 0, [(0, [1])], depth=16))
    # wrong decompressed size: 2 rows declared, 1 provided
    with pytest.raises(PngError, match="decompressed size"):
        decode_png(_hand_png(1, 2, 0, [(0, [1])]))


def test_decode_bounds_inflate_by_declared_size():
    """Decompression-bomb guard (ADVICE r6): a 1x1 IHDR carrying a
    huge DEFLATE payload must be rejected WITHOUT materializing the
    payload — the inflate is capped at the size IHDR implies."""
    # 64 MiB of zeros compresses to ~64 KiB; declared image is 1x1 gray
    bomb = zlib.compress(b"\x00" * (64 << 20))
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)
    blob = (
        SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", bomb)
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(PngError, match="inflates past"):
        decode_png(blob)
    # one byte over the exact expected size is rejected too
    over = zlib.compress(b"\x00" * 3)  # 1x1 gray expects 2 bytes
    blob2 = (
        SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", over)
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(PngError, match="inflates past"):
        decode_png(blob2)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("size", [(1, 1), (1, 7), (7, 1), (5, 4), (23, 17)])
@pytest.mark.parametrize("strategy", ["none", "cycle"])
def test_roundtrip_all_channel_counts_and_sizes(channels, size, strategy):
    w, h = size
    n = w * h * channels
    pix = bytes((i * 37 + 11) % 256 for i in range(n))
    blob = encode_png(w, h, channels, pix, filter_strategy=strategy)
    assert decode_png(blob) == (w, h, channels, pix)


def test_roundtrip_adversarial_pixel_patterns():
    """Filter arithmetic edge cases: all-0, all-255, and a sawtooth
    that maximizes wraparound in Sub/Paeth deltas."""
    for pix in [
        bytes(60),
        bytes([255] * 60),
        bytes((i * 251) % 256 for i in range(60)),
    ]:
        blob = encode_png(5, 4, 3, pix, filter_strategy="cycle")
        assert decode_png(blob)[3] == pix


def test_resize_nearest_exact_mapping():
    # 4x2 gray -> 2x1: picks source pixels (0,0) and (0,2)
    pix = bytes([10, 20, 30, 40, 50, 60, 70, 80])
    assert resize_nearest(4, 2, 1, pix, 2, 1) == bytes([10, 30])
    # upscale 1x1 -> 3x2 replicates
    assert resize_nearest(1, 1, 3, bytes([9, 8, 7]), 3, 2) == bytes(
        [9, 8, 7] * 6
    )
    # identity resize is a no-op
    rgb = bytes(range(24))
    assert resize_nearest(4, 2, 3, rgb, 4, 2) == rgb


def test_resize_matches_numpy_reference():
    rng = np.arange(11 * 7 * 3, dtype=np.uint8).reshape(7, 11, 3)
    got = resize_nearest(11, 7, 3, rng.tobytes(), 5, 3)
    ys = (np.arange(3) * 7) // 3
    xs = (np.arange(5) * 11) // 5
    assert got == rng[ys][:, xs].tobytes()


def test_roundtrip_property_fuzz():
    """Hypothesis fuzz: encode->decode identity over arbitrary sizes,
    channel counts, pixel bytes, and both filter strategies."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        w=st.integers(1, 24),
        h=st.integers(1, 24),
        c=st.sampled_from([1, 2, 3, 4]),
        strategy=st.sampled_from(["none", "cycle"]),
        data=st.data(),
    )
    def check(w, h, c, strategy, data):
        pix = bytes(
            data.draw(
                st.lists(
                    st.integers(0, 255),
                    min_size=w * h * c,
                    max_size=w * h * c,
                )
            )
        )
        blob = encode_png(w, h, c, pix, filter_strategy=strategy)
        assert decode_png(blob) == (w, h, c, pix)

    check()
