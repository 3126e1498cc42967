"""Materialize the deterministic multi-frame GIF fixture.

Writes ``fixtures/gif/anim_NNN.gif`` (12 GIFs, 22 frames total —
global/local color tables, interlace, offsets, extensions, deep LZW
widths) and ``fixtures/gif_truth.parquet`` — the independently-
computed per-frame ground truth (geometry, decoded-RGB sha256, exact
channel sums) that q149/q151's DuckDB oracles SELECT from. Both are
committed; re-running must be byte-stable (fixed affine pixel
pattern, deterministic reference LZW encoder, zstd single row group).

Usage: python tools/make_gif_fixture.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diachronic_spark.sources.gif_fixture import (
    GIFS_DIR,
    TRUTH_PATH,
    generate_gifs,
    truth_rows,
)

SCHEMA = pa.schema(
    [
        ("gif_id", pa.int64()),
        ("frame_idx", pa.int32()),
        ("n_frames", pa.int32()),
        ("screen_w", pa.int32()),
        ("screen_h", pa.int32()),
        ("left", pa.int32()),
        ("top", pa.int32()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("interlaced", pa.bool_()),
        ("pix_sha", pa.string()),
        ("sum_r", pa.int64()),
        ("sum_g", pa.int64()),
        ("sum_b", pa.int64()),
    ]
)


def main() -> None:
    os.makedirs(GIFS_DIR, exist_ok=True)
    rows = []
    for gif in generate_gifs():
        path = os.path.join(GIFS_DIR, f"anim_{gif['gif_id']:03d}.gif")
        with open(path, "wb") as f:
            f.write(gif["blob"])
        rows.extend(truth_rows(gif))
    cols = {k: [r[k] for r in rows] for k in SCHEMA.names}
    table = pa.Table.from_arrays(
        [pa.array(cols[f.name], type=f.type) for f in SCHEMA],
        schema=SCHEMA,
    )
    pq.write_table(table, TRUTH_PATH, compression="zstd")
    print(
        f"wrote {len(list(generate_gifs()))} gifs ({len(rows)} frames) "
        f"-> {GIFS_DIR}, truth -> {TRUTH_PATH}"
    )


if __name__ == "__main__":
    main()
