#!/usr/bin/env python
"""Materialize fixtures/wiki_tiny_raw.parquet: the raw revision rows of
fixtures/wiki_tiny.xml, one row per <revision> in document order.

This is the oracle-side input for q105 (XML-pipeline end-to-end): Spark
PARSES the committed XML and runs the snapshot pipeline; DuckDB
independently computes the same snapshot from these raw rows via SQL.
The only trusted link is raw-rows == XML content, which this tool makes
mechanical (stdlib ElementTree over the same committed file) and which
a reviewer can audit by eye — the XML is 8 revisions long.

Byte-stable on re-run: fixed schema, single row group, stats unchanged.

Usage: python tools/make_wiki_tiny_raw.py
"""

from __future__ import annotations

import datetime as dt
import os
import xml.etree.ElementTree as ET

import pyarrow as pa
import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
XML_PATH = os.path.join(ROOT, "fixtures", "wiki_tiny.xml")
OUT_PATH = os.path.join(ROOT, "fixtures", "wiki_tiny_raw.parquet")
NS = "{http://www.mediawiki.org/xml/export-0.10/}"

SCHEMA = pa.schema(
    [
        ("page_id", pa.int64()),
        ("rev_seq", pa.int32()),
        ("namespace", pa.string()),
        ("title", pa.string()),
        ("timestamp", pa.timestamp("us")),
        ("text", pa.string()),
    ]
)


def main() -> None:
    rows = []
    root = ET.parse(XML_PATH).getroot()
    for page in root.findall(f"{NS}page"):
        page_id = int(page.find(f"{NS}id").text)
        ns = page.find(f"{NS}ns").text
        title = page.find(f"{NS}title").text
        for seq, rev in enumerate(page.findall(f"{NS}revision")):
            ts = dt.datetime.strptime(
                rev.find(f"{NS}timestamp").text, "%Y-%m-%dT%H:%M:%SZ"
            )
            rows.append(
                (page_id, seq, ns, title, ts, rev.find(f"{NS}text").text)
            )
    cols = list(zip(*rows))
    table = pa.Table.from_arrays(
        [pa.array(c, type=f.type) for c, f in zip(cols, SCHEMA)],
        schema=SCHEMA,
    )
    pq.write_table(table, OUT_PATH, compression="snappy", row_group_size=64)
    print(f"wrote {OUT_PATH}: {table.num_rows} rows")


if __name__ == "__main__":
    main()
