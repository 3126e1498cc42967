"""Materialize the deterministic PDF text-extraction fixture.

Writes ``fixtures/pdf/doc_NNN.pdf`` (5 documents — Flate/none/
ASCIIHex/LZW/ASCII85 streams, ObjStm-packed objects, a Type0 font
with a ToUnicode CMap, a two-level page tree, octal-escaped Latin-1,
a raw-stream object-lookalike decoy) and
``fixtures/pdf_truth.parquet`` — page texts replayed from the
operation scripts by the declared layout policy, never through a
parser, filter, or escape. Both committed; byte-stable.

Usage: python tools/make_pdf_fixture.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diachronic_spark.sources.pdf_fixture import (
    PDFS_DIR,
    TRUTH_PATH,
    generate_pdfs,
    truth_rows,
)

SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("page_idx", pa.int32()),
        ("n_pages", pa.int32()),
        ("text", pa.string()),
        ("n_chars", pa.int64()),
    ]
)


def main() -> None:
    os.makedirs(PDFS_DIR, exist_ok=True)
    rows = []
    for d in generate_pdfs():
        path = os.path.join(PDFS_DIR, f"doc_{d['doc_id']:03d}.pdf")
        with open(path, "wb") as f:
            f.write(d["blob"])
        rows.extend(truth_rows(d))
    cols = {k: [r[k] for r in rows] for k in SCHEMA.names}
    table = pa.Table.from_arrays(
        [pa.array(cols[f.name], type=f.type) for f in SCHEMA],
        schema=SCHEMA,
    )
    pq.write_table(table, TRUTH_PATH, compression="zstd")
    print(f"wrote {len(rows)} page rows -> {TRUTH_PATH}, pdfs -> {PDFS_DIR}")


if __name__ == "__main__":
    main()
