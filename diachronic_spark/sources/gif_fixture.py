"""Deterministic multi-frame GIF fixture (FIXTURES.md §7).

12 small GIFs covering the container's axes: single- and multi-frame,
global vs local color tables, interlaced frames, frame offsets,
palette sizes 2..256, extension blocks (comment + graphic control)
interleaved between frames, and one high-entropy image big enough to
drive the LZW code width up and force a dictionary reset.

The TRUTH table (per-frame geometry, sha256 of the decoded RGB
buffer, exact channel sums) is computed HERE from the raw index
arrays and palettes with independent loop math — never by calling
the decoder under test. The encoder half (``lzw_encode`` + container
assembly) lives here too; the decoder it feeds was validated against
REAL third-party encoder output (stdlib idlelib icon GIFs decode
cleanly, interlaced ones included), so the pair cannot hide a shared
width-convention bug.

Pixel content is a fixed affine(+one product term) pattern of
(gif_id, frame, x, y): no RNG, byte-stable across processes.
"""

from __future__ import annotations

import hashlib
import os
import struct

_HERE = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
GIFS_DIR = os.path.join(_HERE, "fixtures", "gif")
TRUTH_PATH = os.path.join(_HERE, "fixtures", "gif_truth.parquet")

# frame sampling step used by the q151 nested-binary query + oracle
FRAME_EVERY_N = 2

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def lzw_encode(min_code_size: int, data: bytes) -> bytes:
    """Reference GIF-LZW compressor (standard early-change widths,
    CLEAR emitted at start and on dictionary overflow, EOI at end)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    code_size = min_code_size + 1
    next_code = eoi + 1
    emit(clear, code_size)
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        emit(table[w], code_size)
        if next_code < 4096:
            table[wc] = next_code
            # widen AFTER defining the first entry whose value fills
            # the current width (the convention real decoders use —
            # pinned empirically against third-party GIFs): the wider
            # size first applies to the emission after next, matching
            # the decoder's define-lags-read-by-one schedule
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
            next_code += 1
        else:
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            code_size = min_code_size + 1
            next_code = eoi + 1
        w = bytes([ch])
    if w:
        emit(table[w], code_size)
    emit(eoi, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _interlace_rows(idx: bytes, w: int, h: int) -> bytes:
    """Store rows in GIF interlace pass order (inverse of the
    decoder's de-interlace)."""
    order = [
        y for start, step in _INTERLACE_PASSES for y in range(start, h, step)
    ]
    return b"".join(idx[y * w : (y + 1) * w] for y in order)


def _sub_block(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        part = data[i : i + 255]
        out.append(len(part))
        out += part
    out.append(0)
    return bytes(out)


def _palette(gif_id: int, tag: int, n: int) -> list[tuple[int, int, int]]:
    return [
        tuple((gif_id * 29 + tag * 71 + i * 53 + j * 97) % 256
              for j in range(3))
        for i in range(n)
    ]


def _indexes(gif_id: int, f: int, w: int, h: int, n: int) -> bytes:
    # affine + one product term: enough entropy to exercise LZW width
    # growth while staying trivially replayable by loop math
    return bytes(
        (gif_id * 13 + f * 17 + y * 31 + x * 7 + (x * y) % 19) % n
        for y in range(h)
        for x in range(w)
    )


# (frames, palette_bits, use_local_tables, with_extensions)
# frames: list of (left, top, w, h, interlaced)
_CONFIGS = [
    ([(0, 0, 1, 1, False)], 1, False, False),
    ([(0, 0, 7, 5, False)], 2, False, False),
    ([(0, 0, 16, 16, False)], 4, False, True),
    ([(0, 0, 13, 9, True)], 3, False, False),
    ([(0, 0, 8, 8, False), (0, 0, 8, 8, False)], 3, False, True),
    ([(0, 0, 10, 7, False), (3, 2, 5, 5, False), (1, 0, 12, 3, False)],
     4, False, False),
    ([(0, 0, 9, 6, False), (2, 1, 6, 9, False)], 4, True, False),
    ([(0, 0, 6, 6, False), (0, 0, 6, 6, True), (0, 0, 6, 6, False),
      (0, 0, 6, 6, True)], 5, False, True),
    ([(0, 0, 40, 25, False)], 8, False, False),
    ([(0, 0, 31, 19, False), (4, 4, 20, 11, False)], 4, True, True),
    ([(0, 0, 96, 64, False)], 8, False, False),  # deep LZW widths
    ([(0, 0, 16, 16, False), (0, 0, 16, 16, False),
      (0, 0, 16, 16, False)], 2, False, False),
]


def generate_gifs() -> list[dict]:
    """One dict per GIF: gif_id, screen dims, the assembled ``blob``,
    and per-frame raw (indexes, palette) for independent truth."""
    out = []
    for gif_id, (frames, bits, local, exts) in enumerate(_CONFIGS):
        n_colors = 1 << bits
        sw = max(f[0] + f[2] for f in frames)
        sh = max(f[1] + f[3] for f in frames)
        gct = None if local else _palette(gif_id, 0, n_colors)
        blob = bytearray(b"GIF89a")
        packed = (0x80 | (bits - 1)) if gct else 0
        blob += struct.pack("<HHBBB", sw, sh, packed, 0, 0)
        if gct:
            blob += bytes(v for rgb in gct for v in rgb)
        frows = []
        for f, (left, top, w, h, inter) in enumerate(frames):
            if exts and f == 0:
                blob += b"\x21\xfe" + _sub_block(b"diachronic fixture")
            if exts:
                # graphic control extension (skipped by the decoder)
                blob += b"\x21\xf9" + _sub_block(
                    struct.pack("<BHB", 0, 4, 0)
                )
            pal = _palette(gif_id, f + 1, n_colors) if local else gct
            idx = _indexes(gif_id, f, w, h, n_colors)
            ipacked = (0x80 | (bits - 1)) if local else 0
            if inter:
                ipacked |= 0x40
            blob += b"\x2c" + struct.pack(
                "<HHHHB", left, top, w, h, ipacked
            )
            if local:
                blob += bytes(v for rgb in pal for v in rgb)
            min_code = max(2, bits)
            stored = _interlace_rows(idx, w, h) if inter else idx
            blob += bytes([min_code]) + _sub_block(
                lzw_encode(min_code, stored)
            )
            frows.append(
                {"frame_idx": f, "left": left, "top": top, "width": w,
                 "height": h, "interlaced": inter, "indexes": idx,
                 "palette": pal}
            )
        blob += b"\x3b"
        out.append(
            {"gif_id": gif_id, "screen_w": sw, "screen_h": sh,
             "blob": bytes(blob), "frames": frows}
        )
    return out


def truth_rows(gif: dict) -> list[dict]:
    """Ground-truth features per frame, from the raw index array and
    palette with independent loop math (no numpy, no codec)."""
    rows = []
    for fr in gif["frames"]:
        pal, idx = fr["palette"], fr["indexes"]
        rgb = bytes(v for i in idx for v in pal[i])
        sums = [0, 0, 0]
        for p in range(len(idx)):
            for j in range(3):
                sums[j] += rgb[p * 3 + j]
        rows.append(
            {
                "gif_id": gif["gif_id"],
                "frame_idx": fr["frame_idx"],
                "n_frames": len(gif["frames"]),
                "screen_w": gif["screen_w"],
                "screen_h": gif["screen_h"],
                "left": fr["left"],
                "top": fr["top"],
                "width": fr["width"],
                "height": fr["height"],
                "interlaced": fr["interlaced"],
                "pix_sha": hashlib.sha256(rgb).hexdigest(),
                "sum_r": sums[0],
                "sum_g": sums[1],
                "sum_b": sums[2],
            }
        )
    return rows
