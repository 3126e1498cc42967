"""Materialize the deterministic PNG image fixture.

Writes ``fixtures/png/img_NNN.png`` (30 images, every supported color
mode x size edge, row-cycling filters) and
``fixtures/png_truth.parquet`` — the independently-computed ground
truth (dimensions, decoded-pixel sha256, exact channel sums, and the
12x9 nearest-neighbor-resize facts) that q143/q144's DuckDB oracles
SELECT from. Both are committed; re-running must be byte-stable (the
pixel pattern is a fixed affine function, the encoder is
deterministic, zstd single row group).

Usage: python tools/make_png_fixture.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diachronic_spark.functions.png import encode_png
from diachronic_spark.sources.png_fixture import (
    IMAGES_DIR,
    TRUTH_PATH,
    generate_images,
    truth_row,
)

SCHEMA = pa.schema(
    [
        ("img_id", pa.int64()),
        ("mode", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("channels", pa.int32()),
        ("pix_sha", pa.string()),
        ("sum_r", pa.int64()),
        ("sum_g", pa.int64()),
        ("sum_b", pa.int64()),
        ("sum_a", pa.int64()),
        ("rs_width", pa.int32()),
        ("rs_height", pa.int32()),
        ("rs_pix_sha", pa.string()),
    ]
)


def _encode_palette(img: dict) -> bytes:
    """Palette PNGs are hand-assembled (the codec's encoder is
    truecolor-only): IHDR color type 3 + PLTE + filter-0 index rows."""
    import struct
    import zlib

    from diachronic_spark.functions.png import SIGNATURE, chunk

    w, h = img["width"], img["height"]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    plte = bytes(v for rgb in img["palette"] for v in rgb)
    idx = img["indexes"]
    raw = b"".join(
        b"\x00" + idx[y * w : (y + 1) * w] for y in range(h)
    )
    return (
        SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(raw, 9))
        + chunk(b"IEND", b"")
    )


def main() -> None:
    os.makedirs(IMAGES_DIR, exist_ok=True)
    rows = []
    for img in generate_images():
        if img["mode"] == "palette":
            blob = _encode_palette(img)
        else:
            blob = encode_png(
                img["width"], img["height"], img["channels"],
                img["pixels"], filter_strategy="cycle",
            )
        path = os.path.join(IMAGES_DIR, f"img_{img['img_id']:03d}.png")
        with open(path, "wb") as f:
            f.write(blob)
        rows.append(truth_row(img))
    cols = {k: [r[k] for r in rows] for k in SCHEMA.names}
    table = pa.Table.from_arrays(
        [pa.array(cols[f.name], type=f.type) for f in SCHEMA], schema=SCHEMA
    )
    pq.write_table(table, TRUTH_PATH, compression="zstd")
    print(f"wrote {len(rows)} images -> {IMAGES_DIR}, truth -> {TRUTH_PATH}")


if __name__ == "__main__":
    main()
