"""Materialize the deterministic BMP image fixture.

Writes ``fixtures/bmp/img_NNN.bmp`` (14 images — 24-bit and 8-bit
paletted, bottom-up and top-down, every row-padding remainder, short
palettes, header gaps) and ``fixtures/bmp_truth.parquet`` — the
independently-computed ground truth (dimensions, decoded-RGB sha256,
exact channel sums) that q150's DuckDB oracle SELECTs from. The
containers are struct-packed straight from the spec by the fixture
module (the decoder under test never writes them). Both are
committed; re-running must be byte-stable.

Usage: python tools/make_bmp_fixture.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diachronic_spark.sources.bmp_fixture import (
    BMPS_DIR,
    TRUTH_PATH,
    generate_bmps,
    truth_row,
)

SCHEMA = pa.schema(
    [
        ("img_id", pa.int64()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("bpp", pa.int32()),
        ("top_down", pa.bool_()),
        ("channels", pa.int32()),
        ("pix_sha", pa.string()),
        ("sum_r", pa.int64()),
        ("sum_g", pa.int64()),
        ("sum_b", pa.int64()),
    ]
)


def main() -> None:
    os.makedirs(BMPS_DIR, exist_ok=True)
    rows = []
    for img in generate_bmps():
        path = os.path.join(BMPS_DIR, f"img_{img['img_id']:03d}.bmp")
        with open(path, "wb") as f:
            f.write(img["blob"])
        rows.append(truth_row(img))
    cols = {k: [r[k] for r in rows] for k in SCHEMA.names}
    table = pa.Table.from_arrays(
        [pa.array(cols[f.name], type=f.type) for f in SCHEMA],
        schema=SCHEMA,
    )
    pq.write_table(table, TRUTH_PATH, compression="zstd")
    print(f"wrote {len(rows)} bmps -> {BMPS_DIR}, truth -> {TRUTH_PATH}")


if __name__ == "__main__":
    main()
