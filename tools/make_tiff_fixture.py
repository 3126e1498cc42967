"""Materialize the deterministic baseline-TIFF fixture.

Writes ``fixtures/tiff/scan_NNN.tif`` (7 files — II/MM byte orders,
gray/WhiteIsZero/RGB/RGBA/palette, none/PackBits/LZW(+predictor 2),
multi-strip, junk-low-byte ColorMap, a two-page file) and
``fixtures/tiff_truth.parquet`` — ground truth computed from the
display-pixel formulas with plain loop math BEFORE container
assembly, never via the decoder under test. Both are committed;
re-running must be byte-stable.

Usage: python tools/make_tiff_fixture.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diachronic_spark.sources.tiff_fixture import (
    TIFFS_DIR,
    TRUTH_PATH,
    generate_tiffs,
    truth_row,
)

SCHEMA = pa.schema(
    [
        ("img_id", pa.int64()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("channels", pa.int32()),
        ("n_pages", pa.int32()),
        ("pix_sha", pa.string()),
        ("sum_c0", pa.int64()),
        ("sum_c1", pa.int64()),
        ("sum_c2", pa.int64()),
        ("sum_c3", pa.int64()),
    ]
)


def main() -> None:
    os.makedirs(TIFFS_DIR, exist_ok=True)
    rows = []
    for t in generate_tiffs():
        path = os.path.join(TIFFS_DIR, f"scan_{t['img_id']:03d}.tif")
        with open(path, "wb") as f:
            f.write(t["blob"])
        rows.append(truth_row(t))
    cols = {k: [r[k] for r in rows] for k in SCHEMA.names}
    table = pa.Table.from_arrays(
        [pa.array(cols[f.name], type=f.type) for f in SCHEMA],
        schema=SCHEMA,
    )
    pq.write_table(table, TRUTH_PATH, compression="zstd")
    print(f"wrote {len(rows)} tiffs -> {TIFFS_DIR}, truth -> {TRUTH_PATH}")


if __name__ == "__main__":
    main()
