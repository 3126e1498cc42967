"""Materialize the deterministic HTML text-extraction fixture.

Writes ``fixtures/html/page_NNN.html`` (6 noisy documents) and
``fixtures/html_truth.parquet`` — texts replayed from the block
structure by the declared policy, never via the parser. Committed;
byte-stable.

Usage: python tools/make_html_fixture.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diachronic_spark.sources.html_fixture import (
    HTML_DIR,
    TRUTH_PATH,
    generate_htmls,
    truth_row,
)

SCHEMA = pa.schema(
    [
        ("page_id", pa.int64()),
        ("text", pa.string()),
        ("n_chars", pa.int64()),
    ]
)


def main() -> None:
    os.makedirs(HTML_DIR, exist_ok=True)
    rows = []
    for d in generate_htmls():
        path = os.path.join(HTML_DIR, f"page_{d['page_id']:03d}.html")
        with open(path, "w", encoding="utf-8") as f:
            f.write(d["html"])
        rows.append(truth_row(d))
    cols = {k: [r[k] for r in rows] for k in SCHEMA.names}
    table = pa.Table.from_arrays(
        [pa.array(cols[f.name], type=f.type) for f in SCHEMA],
        schema=SCHEMA,
    )
    pq.write_table(table, TRUTH_PATH, compression="zstd")
    print(f"wrote {len(rows)} pages -> {HTML_DIR}, truth -> {TRUTH_PATH}")


if __name__ == "__main__":
    main()
