"""Materialize the deterministic WARC (web-archive) fixture.

Writes ``fixtures/warc/crawl_NNN.warc[.gz]`` (4 files — plain,
per-record-member gzip, whole-stream gzip; warcinfo/request/
response/metadata/resource records; HTML/plain/JSON/PNG payloads;
200/204/301/404; the WARC-line-in-body boundary trap) and
``fixtures/warc_truth.parquet`` — ground truth computed from the
record dicts with plain stdlib calls BEFORE container assembly,
never via the parser under test. Both are committed; re-running
must be byte-stable (gzip mtime pinned to 0).

Usage: python tools/make_warc_fixture.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diachronic_spark.sources.warc_fixture import (
    TRUTH_PATH,
    WARCS_DIR,
    generate_warcs,
    truth_rows,
)

SCHEMA = pa.schema(
    [
        ("file_id", pa.int64()),
        ("rec_idx", pa.int32()),
        ("rec_type", pa.string()),
        ("rec_id", pa.string()),
        ("target_uri", pa.string()),
        ("http_status", pa.int32()),
        ("mime", pa.string()),
        ("content_len", pa.int64()),
        ("content_sha", pa.string()),
        ("text", pa.string()),
    ]
)


def main() -> None:
    os.makedirs(WARCS_DIR, exist_ok=True)
    rows = []
    for wf in generate_warcs():
        with open(os.path.join(WARCS_DIR, wf["name"]), "wb") as f:
            f.write(wf["blob"])
        rows.extend(truth_rows(wf))
    cols = {k: [r[k] for r in rows] for k in SCHEMA.names}
    table = pa.Table.from_arrays(
        [pa.array(cols[f.name], type=f.type) for f in SCHEMA],
        schema=SCHEMA,
    )
    pq.write_table(table, TRUTH_PATH, compression="zstd")
    print(
        f"wrote {len(rows)} record-truth rows -> {TRUTH_PATH}, "
        f"warcs -> {WARCS_DIR}"
    )


if __name__ == "__main__":
    main()
