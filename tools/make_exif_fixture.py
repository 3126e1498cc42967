"""Materialize the deterministic EXIF-in-JPEG fixture.

Writes ``fixtures/exif/photo_NNN.jpg`` (6 real decodable JPEGs with
APP1 metadata covering both byte orders, full/partial/absent tag
sets, and an XMP decoy segment) and ``fixtures/exif_truth.parquet``
— ground truth straight from the metadata dicts, never via the
parsers under test. Both committed; byte-stable.

Usage: python tools/make_exif_fixture.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diachronic_spark.sources.exif_fixture import (
    EXIF_DIR,
    TRUTH_PATH,
    generate_exif_jpegs,
    truth_row,
)

SCHEMA = pa.schema(
    [
        ("img_id", pa.int64()),
        ("make", pa.string()),
        ("model", pa.string()),
        ("orientation", pa.int32()),
        ("datetime", pa.string()),
        ("exif_w", pa.int32()),
        ("exif_h", pa.int32()),
        ("iso", pa.int32()),
        ("exposure_num", pa.int64()),
        ("exposure_den", pa.int64()),
        ("fnumber_num", pa.int64()),
        ("fnumber_den", pa.int64()),
    ]
)


def main() -> None:
    os.makedirs(EXIF_DIR, exist_ok=True)
    rows = []
    for j in generate_exif_jpegs():
        path = os.path.join(EXIF_DIR, f"photo_{j['img_id']:03d}.jpg")
        with open(path, "wb") as f:
            f.write(j["blob"])
        rows.append(truth_row(j))
    cols = {k: [r[k] for r in rows] for k in SCHEMA.names}
    table = pa.Table.from_arrays(
        [pa.array(cols[f.name], type=f.type) for f in SCHEMA],
        schema=SCHEMA,
    )
    pq.write_table(table, TRUTH_PATH, compression="zstd")
    print(f"wrote {len(rows)} photos -> {EXIF_DIR}, truth -> {TRUTH_PATH}")


if __name__ == "__main__":
    main()
