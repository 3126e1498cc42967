"""Materialize the deterministic baseline-JPEG fixture.

Writes ``fixtures/jpeg/img_NNN.jpg`` (12 images — gray + YCbCr at
4:4:4/4:2:2/4:2:0, off-grid dims, restart intervals, 8/16-bit quant
tables) and ``fixtures/jpeg_truth.parquet`` — ground truth decoded
from the quantized coefficients with pure loop math (shared cosine
basis, the engine's pinned accumulation order), never via the codec
under test. Both are committed; re-running must be byte-stable.

Usage: python tools/make_jpeg_fixture.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diachronic_spark.sources.jpeg_fixture import (
    JPEGS_DIR,
    PROG_DIR,
    TRUTH_PATH,
    _assemble_progressive,
    generate_jpegs,
    truth_row,
)

SCHEMA = pa.schema(
    [
        ("img_id", pa.int64()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("channels", pa.int32()),
        ("color", pa.bool_()),
        ("restart", pa.int32()),
        ("pix_sha", pa.string()),
        ("sum_r", pa.int64()),
        ("sum_g", pa.int64()),
        ("sum_b", pa.int64()),
    ]
)


def main() -> None:
    os.makedirs(JPEGS_DIR, exist_ok=True)
    os.makedirs(PROG_DIR, exist_ok=True)
    rows = []
    for img in generate_jpegs():
        path = os.path.join(JPEGS_DIR, f"img_{img['img_id']:03d}.jpg")
        with open(path, "wb") as f:
            f.write(img["blob"])
        # progressive twin: SAME quantized coefficients, SOF2 scan
        # script — decodes to the SAME truth row (no separate truth)
        ppath = os.path.join(PROG_DIR, f"prog_{img['img_id']:03d}.jpg")
        with open(ppath, "wb") as f:
            f.write(_assemble_progressive(img))
        rows.append(truth_row(img))
    cols = {k: [r[k] for r in rows] for k in SCHEMA.names}
    table = pa.Table.from_arrays(
        [pa.array(cols[f.name], type=f.type) for f in SCHEMA],
        schema=SCHEMA,
    )
    pq.write_table(table, TRUTH_PATH, compression="zstd")
    print(
        f"wrote {len(rows)} jpegs -> {JPEGS_DIR}, progressive twins -> "
        f"{PROG_DIR}, truth -> {TRUTH_PATH}"
    )


if __name__ == "__main__":
    main()
