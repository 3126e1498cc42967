"""Deterministic BMP image fixture (FIXTURES.md §8).

14 BMPs covering the format's axes: 24-bit BGR and 8-bit paletted,
bottom-up and top-down storage, every row-padding remainder (widths
1..5 cross the 4-byte alignment), short palettes via biClrUsed, and a
nonzero gap between header and pixel data. Containers are assembled
HERE by struct packing straight from the spec — the decoder under
test (``functions/bmp.py``) never writes them — and the TRUTH table
is computed from the raw pixel/index arrays with independent loop
math, so encoder/decoder bug cancellation is structurally impossible
for this pair.

Pixel content is a fixed affine pattern of (img_id, x, y, channel):
no RNG, byte-stable across processes.
"""

from __future__ import annotations

import hashlib
import os
import struct

_HERE = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
BMPS_DIR = os.path.join(_HERE, "fixtures", "bmp")
TRUTH_PATH = os.path.join(_HERE, "fixtures", "bmp_truth.parquet")

# (width, height, bpp, top_down, n_pal or None, data_gap)
_CONFIGS = [
    (1, 1, 24, False, None, 0),
    (2, 3, 24, False, None, 0),
    (3, 5, 24, True, None, 0),
    (4, 4, 24, False, None, 0),
    (5, 7, 24, True, None, 8),
    (16, 16, 24, False, None, 0),
    (31, 19, 24, False, None, 0),
    (40, 25, 24, True, None, 0),
    (1, 4, 8, False, 16, 0),
    (5, 3, 8, True, 16, 0),
    (7, 7, 8, False, 64, 4),
    (8, 8, 8, False, 256, 0),
    (13, 9, 8, True, 200, 0),  # short palette via biClrUsed
    (33, 21, 8, False, 256, 0),
]


def _rgb_at(img_id: int, x: int, y: int, k: int) -> int:
    return (img_id * 13 + y * 31 + x * 7 + k * 101) % 256


def _pal_color(img_id: int, i: int) -> tuple[int, int, int]:
    return tuple(
        (img_id * 29 + i * 53 + j * 97) % 256 for j in range(3)
    )


def generate_bmps() -> list[dict]:
    """One dict per image: img_id, geometry, the assembled ``blob``,
    and ``decoded`` — the expected post-decode RGB buffer (top-down),
    built by loop math."""
    out = []
    for img_id, (w, h, bpp, td, n_pal, gap) in enumerate(_CONFIGS):
        if bpp == 24:
            # top-down RGB truth by loop math
            decoded = bytes(
                _rgb_at(img_id, x, y, k)
                for y in range(h)
                for x in range(w)
                for k in range(3)
            )
            row_bytes = w * 3
            stride = (row_bytes + 3) & ~3
            rows = []
            for y in range(h):
                r = bytearray()
                for x in range(w):
                    # file stores BGR
                    r += bytes(
                        _rgb_at(img_id, x, y, k) for k in (2, 1, 0)
                    )
                r += b"\x00" * (stride - row_bytes)
                rows.append(bytes(r))
            pal_bytes = b""
        else:
            pal = [_pal_color(img_id, i) for i in range(n_pal)]
            idx = [
                [(x * 3 + y * 5 + img_id) % n_pal for x in range(w)]
                for y in range(h)
            ]
            decoded = bytes(
                v for y in range(h) for x in range(w)
                for v in pal[idx[y][x]]
            )
            stride = (w + 3) & ~3
            rows = [
                bytes(idx[y]) + b"\x00" * (stride - w) for y in range(h)
            ]
            # palette quads stored as B,G,R,0
            pal_bytes = b"".join(
                bytes((b, g, r, 0)) for (r, g, b) in pal
            )
        body = b"".join(rows if td else rows[::-1])
        data_off = 14 + 40 + len(pal_bytes) + gap
        file_hdr = b"BM" + struct.pack(
            "<IHHI", data_off + len(body), 0, 0, data_off
        )
        dib = struct.pack(
            "<IiiHHIIiiII",
            40, w, -h if td else h, 1, bpp, 0, len(body), 2835, 2835,
            (n_pal if bpp == 8 else 0), 0,
        )
        blob = file_hdr + dib + pal_bytes + b"\xee" * gap + body
        out.append(
            {
                "img_id": img_id, "width": w, "height": h, "bpp": bpp,
                "top_down": td, "blob": blob, "decoded": decoded,
            }
        )
    return out


def truth_row(img: dict) -> dict:
    """Ground-truth features for one image from the raw decoded
    buffer (loop math, no codec)."""
    w, h, dec = img["width"], img["height"], img["decoded"]
    sums = [0, 0, 0]
    for p in range(w * h):
        for j in range(3):
            sums[j] += dec[p * 3 + j]
    return {
        "img_id": img["img_id"],
        "width": w,
        "height": h,
        "bpp": img["bpp"],
        "top_down": img["top_down"],
        "channels": 3,
        "pix_sha": hashlib.sha256(dec).hexdigest(),
        "sum_r": sums[0],
        "sum_g": sums[1],
        "sum_b": sums[2],
    }
