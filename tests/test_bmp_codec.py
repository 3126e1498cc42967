"""BMP codec unit tests (functions/bmp.py).

Decoder validated against BMPs built BY HAND from the spec here
(struct-packed headers, explicit padding bytes, bottom-up row order)
— the module's own encoder is only used for round-trip pinning.
"""

from __future__ import annotations

import struct

import pytest

from diachronic_spark.functions.bmp import (
    BmpError,
    decode_bmp,
    encode_bmp,
)


def _hdr(
    w: int, h: int, bpp: int, data_len: int, *, pal: bytes = b"",
    comp: int = 0, clr_used: int = 0, gap: int = 0,
) -> bytes:
    off = 14 + 40 + len(pal) + gap
    return (
        b"BM"
        + struct.pack("<IHHI", off + data_len, 0, 0, off)
        + struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, bpp, comp, data_len,
            2835, 2835, clr_used, 0,
        )
        + pal
        + b"\xcc" * gap
    )


def test_decode_24bit_bottom_up_with_padding():
    """2x2: file rows are BGR bottom-up, stride padded 6->8; decode
    must emit RGB top-down."""
    # want decoded top-down RGB rows: [(1,2,3),(4,5,6)], [(7,8,9),(10,11,12)]
    row_top = bytes([3, 2, 1, 6, 5, 4]) + b"\x00\x00"  # BGR + pad
    row_bot = bytes([9, 8, 7, 12, 11, 10]) + b"\x00\x00"
    body = row_bot + row_top  # bottom-up: last row first
    blob = _hdr(2, 2, 24, len(body)) + body
    w, h, c, pix = decode_bmp(blob)
    assert (w, h, c) == (2, 2, 3)
    assert pix == bytes(range(1, 13))


def test_decode_24bit_top_down():
    row_top = bytes([3, 2, 1, 6, 5, 4]) + b"\x00\x00"
    row_bot = bytes([9, 8, 7, 12, 11, 10]) + b"\x00\x00"
    body = row_top + row_bot  # negative height: natural order
    blob = _hdr(2, -2, 24, len(body)) + body
    assert decode_bmp(blob)[3] == bytes(range(1, 13))


def test_decode_8bit_palette_with_clr_used_and_gap():
    """3x1 paletted, 2-entry palette via biClrUsed, 4-byte gap between
    palette and pixel data (data offset must be honored)."""
    pal = bytes([10, 20, 30, 0]) + bytes([40, 50, 60, 0])  # BGRA quads
    body = bytes([0, 1, 0]) + b"\x00"  # 3 indexes + pad to 4
    blob = _hdr(3, 1, 8, len(body), pal=pal, clr_used=2, gap=4) + body
    w, h, c, pix = decode_bmp(blob)
    assert (w, h, c) == (3, 1, 3)
    assert pix == bytes([30, 20, 10, 60, 50, 40, 30, 20, 10])


def test_decode_rejects_malformed():
    body = bytes(8)
    ok = _hdr(2, 1, 24, 8) + body
    with pytest.raises(BmpError, match="signature"):
        decode_bmp(b"PNG" + ok[2:])
    with pytest.raises(BmpError, match="compression"):
        decode_bmp(_hdr(2, 1, 24, 8, comp=1) + body)
    with pytest.raises(BmpError, match="8/24-bit"):
        decode_bmp(_hdr(2, 1, 16, 8) + body)
    with pytest.raises(BmpError, match="truncated pixel"):
        decode_bmp(ok[:-2])
    # palette index 1 with a 1-entry palette
    pal = bytes([1, 2, 3, 0])
    bad = _hdr(1, 1, 8, 4, pal=pal, clr_used=1) + bytes([1, 0, 0, 0])
    with pytest.raises(BmpError, match="palette index"):
        decode_bmp(bad)


@pytest.mark.parametrize("size", [(1, 1), (2, 3), (3, 2), (5, 4), (23, 17)])
def test_encode_decode_roundtrip(size):
    w, h = size
    pix = bytes((i * 7 + 3) % 256 for i in range(w * h * 3))
    assert decode_bmp(encode_bmp(w, h, 3, pix)) == (w, h, 3, pix)


def test_encode_rejects_bad_input():
    with pytest.raises(BmpError, match="channels"):
        encode_bmp(1, 1, 4, bytes(4))
    with pytest.raises(BmpError, match="pixel buffer"):
        encode_bmp(2, 2, 3, bytes(5))


def test_roundtrip_property_fuzz():
    """Hypothesis fuzz: encode->decode identity over arbitrary sizes
    (every padding remainder) and pixel bytes."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        w=st.integers(1, 24),
        h=st.integers(1, 24),
        data=st.data(),
    )
    def check(w, h, data):
        pix = bytes(
            data.draw(
                st.lists(
                    st.integers(0, 255),
                    min_size=w * h * 3,
                    max_size=w * h * 3,
                )
            )
        )
        assert decode_bmp(encode_bmp(w, h, 3, pix)) == (w, h, 3, pix)

    check()


def test_decode_rejects_pixel_offset_inside_headers():
    """A data offset pointing back into the file header or palette
    must raise, not silently decode header bytes as pixels (ADVICE
    r7)."""
    body = bytes(8)
    ok = _hdr(2, 1, 24, 8) + body
    bad = ok[:10] + struct.pack("<I", 0) + ok[14:]
    with pytest.raises(BmpError, match="inside header"):
        decode_bmp(bad)
    # 8-bit: offset inside the palette region
    pal = bytes([1, 2, 3, 0]) * 2
    blob8 = _hdr(1, 1, 8, 4, pal=pal, clr_used=2) + bytes(4)
    bad8 = blob8[:10] + struct.pack("<I", 14 + 40 + 4) + blob8[14:]
    with pytest.raises(BmpError, match="inside header"):
        decode_bmp(bad8)
