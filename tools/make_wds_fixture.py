"""Materialize the deterministic WebDataset tar-shard fixture.

Writes ``fixtures/wds/shard_NNN.tar[.gz]`` (3 shards — plain + gz,
image/cls/caption/json members, missing optional members, a
multi-part-extension sidecar, gray/RGB/RGBA images) and
``fixtures/wds_truth.parquet`` — ground truth computed from the
sample dicts BEFORE tar assembly; the image sha is over the RAW
pixels, so the scan's extract→decode composition is what a green
row certifies. Both committed; byte-stable (tar mtime/uid pinned,
gzip mtime 0).

Usage: python tools/make_wds_fixture.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diachronic_spark.sources.wds_fixture import (
    TRUTH_PATH,
    WDS_DIR,
    generate_shards,
    truth_rows,
)

SCHEMA = pa.schema(
    [
        ("shard", pa.int64()),
        ("sample_idx", pa.int32()),
        ("key", pa.string()),
        ("n_members", pa.int32()),
        ("cls", pa.int32()),
        ("caption", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("channels", pa.int32()),
        ("pix_sha", pa.string()),
    ]
)


def main() -> None:
    os.makedirs(WDS_DIR, exist_ok=True)
    rows = []
    for sh in generate_shards():
        with open(os.path.join(WDS_DIR, sh["name"]), "wb") as f:
            f.write(sh["blob"])
        rows.extend(truth_rows(sh))
    cols = {k: [r[k] for r in rows] for k in SCHEMA.names}
    table = pa.Table.from_arrays(
        [pa.array(cols[f.name], type=f.type) for f in SCHEMA],
        schema=SCHEMA,
    )
    pq.write_table(table, TRUTH_PATH, compression="zstd")
    print(f"wrote {len(rows)} sample rows -> {TRUTH_PATH}, shards -> {WDS_DIR}")


if __name__ == "__main__":
    main()
