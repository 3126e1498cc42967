"""Materialize the deterministic wiki-revisions fixture to parquet.

Writes ``fixtures/wiki_revisions.parquet`` (the in-order variant used by
q21) so the same input is readable by both engines: Spark runs the
declarative daily-snapshot over it and the DuckDB oracle reads the same
file via ``read_parquet`` — turning q21's driver check from rows-only
into full rows/schema/hash. The file is committed; re-running this tool
must be byte-stable (fixed schema, single row group, no stats drift).

Usage: python tools/make_wiki_fixture.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diachronic_spark.sources.wiki_fixture import FIXTURE_PATH, generate_rows

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
    rows = generate_rows(include_out_of_order=False)
    cols = list(zip(*rows))
    table = pa.Table.from_arrays(
        [pa.array(c, type=f.type) for c, f in zip(cols, SCHEMA)], schema=SCHEMA
    )
    os.makedirs(os.path.dirname(FIXTURE_PATH), exist_ok=True)
    pq.write_table(table, FIXTURE_PATH, compression="zstd")
    print(f"wrote {len(rows)} rows -> {FIXTURE_PATH}")


if __name__ == "__main__":
    main()
