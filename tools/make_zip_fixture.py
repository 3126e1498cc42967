"""Materialize the deterministic ZIP dataset-archive fixture.

Writes ``fixtures/zip/dataset_NNN.zip`` (3 archives — stored +
deflated members, nested names, UTF-8 text, a PNG binary, an empty
member, an archive comment, a case-variant extension) and
``fixtures/zip_truth.parquet`` — ground truth computed from the
(name, bytes) member pairs BEFORE archiving. Both committed;
re-running must be byte-stable in-container (pinned DOS timestamps).

Usage: python tools/make_zip_fixture.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diachronic_spark.sources.zip_fixture import (
    TRUTH_PATH,
    ZIPS_DIR,
    generate_zips,
    truth_rows,
)

SCHEMA = pa.schema(
    [
        ("zip_id", pa.int64()),
        ("entry_idx", pa.int32()),
        ("name", pa.string()),
        ("method", pa.string()),
        ("n_bytes", pa.int64()),
        ("content_sha", pa.string()),
        ("text", pa.string()),
    ]
)


def main() -> None:
    os.makedirs(ZIPS_DIR, exist_ok=True)
    rows = []
    for zf in generate_zips():
        with open(os.path.join(ZIPS_DIR, zf["name"]), "wb") as f:
            f.write(zf["blob"])
        rows.extend(truth_rows(zf))
    cols = {k: [r[k] for r in rows] for k in SCHEMA.names}
    table = pa.Table.from_arrays(
        [pa.array(cols[f.name], type=f.type) for f in SCHEMA],
        schema=SCHEMA,
    )
    pq.write_table(table, TRUTH_PATH, compression="zstd")
    print(f"wrote {len(rows)} member rows -> {TRUTH_PATH}, zips -> {ZIPS_DIR}")


if __name__ == "__main__":
    main()
