"""Deterministic PNG image fixture (FIXTURES.md §5).

30 small images — every supported color mode (gray, gray+alpha, RGB,
RGBA, palette) crossed with size edges (1x1 up to 40x25, including
single-row/column shapes) — encoded with the row-cycling filter
strategy so all five PNG filter paths appear in committed bytes.

The TRUTH table (width/height/channels, sha256 of the decoded pixel
buffer, exact per-channel sums, and the same facts for a 12x9
nearest-neighbor resize) is computed HERE from the raw arrays with
independent loop-level math — never by calling the codec under test —
so q143/q144's oracle checks adjudicate the decoder against the
constructed ground truth, not against itself.

Pixel content is a fixed affine pattern of (img_id, x, y, channel):
no RNG, byte-stable across processes.
"""

from __future__ import annotations

import hashlib
import os

_HERE = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
IMAGES_DIR = os.path.join(_HERE, "fixtures", "png")
TRUTH_PATH = os.path.join(_HERE, "fixtures", "png_truth.parquet")

MODES = ("gray", "ga", "rgb", "rgba", "palette")
SIZES = ((1, 1), (2, 3), (7, 5), (16, 16), (31, 19), (40, 25))
RS_W, RS_H = 12, 9
_N_PAL = 16

_MODE_CHANNELS = {"gray": 1, "ga": 2, "rgb": 3, "rgba": 4}


def _pal_color(img_id: int, i: int) -> tuple[int, int, int]:
    return tuple((img_id * 29 + i * 53 + j * 97) % 256 for j in range(3))


def generate_images() -> list[dict]:
    """One dict per image: img_id, mode, width, height, and either
    ``pixels`` (+ channels) or ``indexes`` + ``palette`` for palette
    mode, plus ``decoded`` — the expected post-decode sample buffer
    (palette expanded to RGB)."""
    out = []
    img_id = 0
    for mode in MODES:
        for w, h in SIZES:
            img = {"img_id": img_id, "mode": mode, "width": w, "height": h}
            if mode == "palette":
                pal = [ _pal_color(img_id, i) for i in range(_N_PAL) ]
                idx = bytes(
                    (x * 3 + y * 5 + img_id) % _N_PAL
                    for y in range(h)
                    for x in range(w)
                )
                img["palette"] = pal
                img["indexes"] = idx
                img["channels"] = 3
                img["decoded"] = bytes(
                    v for i in idx for v in pal[i]
                )
            else:
                c = _MODE_CHANNELS[mode]
                pix = bytes(
                    (img_id * 13 + y * 31 + x * 7 + k * 101) % 256
                    for y in range(h)
                    for x in range(w)
                    for k in range(c)
                )
                img["channels"] = c
                img["pixels"] = pix
                img["decoded"] = pix
            out.append(img)
            img_id += 1
    return out


def truth_row(img: dict) -> dict:
    """Ground-truth features for one image, from the raw arrays with
    independent loop math (no numpy, no codec)."""
    w, h, c = img["width"], img["height"], img["channels"]
    dec = img["decoded"]
    slots = {1: (0,), 2: (0, 3), 3: (0, 1, 2), 4: (0, 1, 2, 3)}[c]
    sums = [None, None, None, None]
    for i, slot in enumerate(slots):
        sums[slot] = sum(dec[p * c + i] for p in range(w * h))
    # independent nearest-neighbor: output (i, j) <- source
    # (floor(i*h/RS_H), floor(j*w/RS_W))
    rs = bytearray()
    for i in range(RS_H):
        sy = (i * h) // RS_H
        for j in range(RS_W):
            sx = (j * w) // RS_W
            rs.extend(dec[(sy * w + sx) * c : (sy * w + sx) * c + c])
    return {
        "img_id": img["img_id"],
        "mode": img["mode"],
        "width": w,
        "height": h,
        "channels": c,
        "pix_sha": hashlib.sha256(dec).hexdigest(),
        "sum_r": sums[0],
        "sum_g": sums[1],
        "sum_b": sums[2],
        "sum_a": sums[3],
        "rs_width": RS_W,
        "rs_height": RS_H,
        "rs_pix_sha": hashlib.sha256(bytes(rs)).hexdigest(),
    }
