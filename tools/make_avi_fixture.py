"""Materialize the deterministic AVI/MJPEG video fixture.

Writes ``fixtures/avi/video_NNN.avi`` (6 videos — gray and color
frames at 4:4:4/4:2:2/4:2:0, odd dims, restart intervals, rec-grouped
frames, 00db ids, idx1, JUNK chunks, a second audio stream) and
``fixtures/avi_truth.parquet`` — per-frame ground truth computed by
the loop-math decode of the quantized coefficient planes
(jpeg_fixture.truth_row), never via the demuxer or JPEG codec under
test. Both are committed; re-running must be byte-stable.

Usage: python tools/make_avi_fixture.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diachronic_spark.sources.avi_fixture import (
    AVIS_DIR,
    TRUTH_PATH,
    generate_avis,
    truth_rows,
)

SCHEMA = pa.schema(
    [
        ("video_id", pa.int64()),
        ("frame_idx", pa.int32()),
        ("n_frames", pa.int32()),
        ("fps_num", pa.int32()),
        ("fps_den", pa.int32()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("channels", pa.int32()),
        ("pix_sha", pa.string()),
        ("sum_r", pa.int64()),
        ("sum_g", pa.int64()),
        ("sum_b", pa.int64()),
    ]
)


def main() -> None:
    os.makedirs(AVIS_DIR, exist_ok=True)
    rows = []
    for video in generate_avis():
        path = os.path.join(
            AVIS_DIR, f"video_{video['video_id']:03d}.avi"
        )
        with open(path, "wb") as f:
            f.write(video["blob"])
        rows.extend(truth_rows(video))
    cols = {k: [r[k] for r in rows] for k in SCHEMA.names}
    table = pa.Table.from_arrays(
        [pa.array(cols[f.name], type=f.type) for f in SCHEMA],
        schema=SCHEMA,
    )
    pq.write_table(table, TRUTH_PATH, compression="zstd")
    print(
        f"wrote {len(rows)} frame-truth rows -> {TRUTH_PATH}, "
        f"videos -> {AVIS_DIR}"
    )


if __name__ == "__main__":
    main()
