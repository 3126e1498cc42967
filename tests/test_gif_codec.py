"""GIF codec unit tests (functions/gif.py).

The LZW decoder is validated against streams whose CODE SEQUENCES are
derived by hand from the spec (clear/EOI, width growth at the
early-change point, the KwKwK self-reference) and packed by a
five-line inline packer — the fixture module's encoder is not used
for these, so an encoder/decoder pair of compensating bugs cannot
pass. Container-level tests hand-assemble GIFs with struct. The
fixture round-trip (22 frames vs loop-math truth) runs in
test_multimodal.py; where available, the decoder is also smoke-run
against third-party-encoded GIFs shipped with the host's stdlib.
"""

from __future__ import annotations

import glob
import struct

import pytest

from diachronic_spark.functions.gif import (
    GifError,
    decode_gif,
    lzw_decode,
)
from diachronic_spark.sources.gif_fixture import lzw_encode


def _pack(codes: list[tuple[int, int]]) -> bytes:
    """LSB-first bit packer for hand-derived (code, width) lists."""
    out = bytearray()
    acc = nbits = 0
    for code, size in codes:
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def test_lzw_hand_derived_stream():
    """min_code=2 (clear=4, eoi=5), input indexes 0,1,1,0.
    Hand trace: emit clear; '01' new -> emit 0, define 6; '11' new ->
    emit 1, define 7; '10' new -> emit 1, define 8 == 1<<3 so width
    grows to 4 for the NEXT code; emit 0 @4; eoi @4."""
    data = _pack([(4, 3), (0, 3), (1, 3), (1, 3), (0, 4), (5, 4)])
    assert lzw_decode(2, data, 4) == bytes([0, 1, 1, 0])


def test_lzw_kwkwk_case():
    """Input 0,0,0: encoder emits code 6 BEFORE the decoder could have
    defined it — the KwKwK case: entry = prev + prev[0]."""
    data = _pack([(4, 3), (0, 3), (6, 3), (5, 3)])
    assert lzw_decode(2, data, 3) == bytes([0, 0, 0])


def test_lzw_mid_stream_clear_resets_widths():
    """A CLEAR after width growth must reset both dictionary and code
    size. Trace: 0,1,1,0 grows width to 4 (as above), then CLEAR @4
    resets to 3-bit codes; 1,0 follow as literals."""
    data = _pack(
        [(4, 3), (0, 3), (1, 3), (1, 3), (0, 4), (4, 4),
         (1, 3), (0, 3), (5, 3)]
    )
    assert lzw_decode(2, data, 6) == bytes([0, 1, 1, 0, 1, 0])


def test_lzw_rejects_malformed():
    with pytest.raises(GifError, match="not a literal"):
        # first code after clear is a dictionary code
        lzw_decode(2, _pack([(4, 3), (7, 3), (5, 3)]), 2)
    with pytest.raises(GifError, match="outside dictionary"):
        # code beyond next_code
        lzw_decode(2, _pack([(4, 3), (0, 3), (7, 3), (5, 3)]), 4)
    with pytest.raises(GifError, match="exhausted"):
        lzw_decode(2, _pack([(4, 3), (0, 3)]), 4)
    with pytest.raises(GifError, match="ended at"):
        # EOI before the declared pixel count
        lzw_decode(2, _pack([(4, 3), (0, 3), (5, 3)]), 4)
    with pytest.raises(GifError, match="overruns"):
        # a two-byte dictionary entry ("01", code 6) crosses the
        # declared pixel count mid-entry (the decoder tolerates exact
        # truncation at the boundary — many real GIFs carry trailing
        # codes — but an entry SPANNING it is unambiguous corruption)
        lzw_decode(2, _pack([(4, 3), (0, 3), (1, 3), (6, 3), (5, 3)]), 3)
    with pytest.raises(GifError, match="min code size"):
        lzw_decode(1, b"\x00", 1)


def test_lzw_roundtrip_deep_widths_and_dict_reset():
    """20k bytes of pseudo-noise walks the width ladder to 12 bits and
    overflows the 4096-entry dictionary (forcing the encoder's
    mid-stream CLEAR and the decoder's deferred-growth path)."""
    data = bytes((i * 37 + (i * i) % 251) % 256 for i in range(20000))
    assert lzw_decode(8, lzw_encode(8, data), len(data)) == data
    runs = bytes((i // 7) % 2 for i in range(5000))
    assert lzw_decode(2, lzw_encode(2, runs), len(runs)) == runs


def _mini_gif(
    idx: bytes, w: int, h: int, *, interlace: bool = False,
    trailer: bool = True, colors: int = 4,
) -> bytes:
    """Hand-assembled single-frame GIF with a 4-color global table."""
    bits = max(1, (colors - 1).bit_length())
    blob = bytearray(b"GIF89a")
    blob += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    blob += bytes(
        (i * 40 + j * 10) % 256 for i in range(1 << bits) for j in range(3)
    )
    ipacked = 0x40 if interlace else 0
    blob += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, ipacked)
    comp = lzw_encode(2, idx)
    blob += bytes([2, len(comp)]) + comp + b"\x00"
    if trailer:
        blob += b"\x3b"
    return bytes(blob)


def test_decode_deinterlaces_rows():
    """h=5 interlace pass order is rows [0,4,2,1,3]; a GIF storing
    rows in that order must decode back to natural order."""
    natural = bytes([0, 0, 1, 1, 2, 2, 3, 3, 0, 1])  # 2x5, rows 0..4
    stored = b"".join(
        natural[y * 2 : (y + 1) * 2] for y in (0, 4, 2, 1, 3)
    )
    plain = decode_gif(_mini_gif(natural, 2, 5))[2][0]
    inter = decode_gif(_mini_gif(stored, 2, 5, interlace=True))[2][0]
    assert inter.interlaced and not plain.interlaced
    assert inter.pixels == plain.pixels


def test_decode_rejects_malformed_containers():
    ok = _mini_gif(bytes([0, 1, 2, 3]), 2, 2)
    with pytest.raises(GifError, match="signature"):
        decode_gif(b"PNG" + ok)
    with pytest.raises(GifError, match="trailer"):
        decode_gif(_mini_gif(bytes([0, 1, 2, 3]), 2, 2, trailer=False))
    with pytest.raises(GifError, match="no image blocks"):
        decode_gif(ok[:13] + ok[13 : 13 + 12] + b"\x3b")
    # frame references index 3 but the table is truncated to 2 colors
    # by a LOCAL table shorter than the indexes need -> build a GIF
    # with no global table and no local table instead
    noct = bytearray(b"GIF89a") + struct.pack("<HHBBB", 2, 2, 0, 0, 0)
    noct += b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
    comp = lzw_encode(2, bytes(4))
    noct += bytes([2, len(comp)]) + comp + b"\x00\x3b"
    with pytest.raises(GifError, match="color table"):
        decode_gif(bytes(noct))
    with pytest.raises(GifError, match="truncated sub-block"):
        decode_gif(ok[:-4])


@pytest.mark.skipif(
    not glob.glob(
        "/mnt/sandboxing/model_tools_env/v1/python/install/lib/"
        "python3.11/idlelib/Icons/*.gif"
    ),
    reason="host stdlib GIF icons not present",
)
def test_decode_third_party_encoded_gifs():
    """Empirical pin of the LZW width convention: files written by
    real-world encoders (stdlib idlelib icons, interlaced ones
    included) must decode cleanly — a width off-by-one desyncs the
    bitstream almost immediately on any non-trivial image."""
    paths = sorted(
        glob.glob(
            "/mnt/sandboxing/model_tools_env/v1/python/install/lib/"
            "python3.11/idlelib/Icons/*.gif"
        )
    )
    for p in paths:
        with open(p, "rb") as f:
            sw, sh, frames = decode_gif(f.read())
        for fr in frames:
            assert len(fr.pixels) == fr.width * fr.height * 3


def test_lzw_roundtrip_property_fuzz():
    """Hypothesis fuzz: LZW encode->decode identity over arbitrary
    alphabets, lengths, and min code sizes — walks every width-growth
    and clear path the pair can reach."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        bits=st.integers(2, 8),
        data=st.data(),
    )
    def check(bits, data):
        n = data.draw(st.integers(0, 2000))
        syms = bytes(
            data.draw(
                st.lists(
                    st.integers(0, (1 << bits) - 1),
                    min_size=n,
                    max_size=n,
                )
            )
        )
        if not syms:
            return  # a frame always has >= 1 pixel
        assert lzw_decode(bits, lzw_encode(bits, syms), len(syms)) == syms

    check()
