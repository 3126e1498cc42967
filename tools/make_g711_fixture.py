"""Materialize the deterministic G.711 (A-law/µ-law) WAV fixture.

Writes ``fixtures/wav_g711/g711_NNN.wav`` (6 companded clips whose
code streams sweep all 256 codes of each law, assembled byte-by-byte
with format tags 6/7 plus a ``fact`` chunk) and
``fixtures/g711_truth.parquet`` — ground truth expanded from the code
bytes with the pure-Python ITU formulas, never via the codec under
test. Committed; byte-stable on re-run.

Usage: python tools/make_g711_fixture.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diachronic_spark.sources.wav_fixture import (
    G711_DIR,
    G711_TRUTH_PATH,
    g711_truth_row,
    generate_g711_clips,
)

SCHEMA = pa.schema(
    [
        ("clip_id", pa.int64()),
        ("law", pa.string()),
        ("sample_rate", pa.int32()),
        ("n_channels", pa.int32()),
        ("sample_width", pa.int32()),
        ("n_frames", pa.int64()),
        ("frames_sha", pa.string()),
        ("sumsq_c0", pa.int64()),
        ("sumsq_c1", pa.int64()),
        ("zero_cross", pa.int64()),
    ]
)


def main() -> None:
    os.makedirs(G711_DIR, exist_ok=True)
    rows = []
    for clip in generate_g711_clips():
        path = os.path.join(G711_DIR, f"g711_{clip['clip_id']:03d}.wav")
        with open(path, "wb") as f:
            f.write(clip["blob"])
        rows.append(g711_truth_row(clip))
    cols = {k: [r[k] for r in rows] for k in SCHEMA.names}
    table = pa.Table.from_arrays(
        [pa.array(cols[f.name], type=f.type) for f in SCHEMA],
        schema=SCHEMA,
    )
    pq.write_table(table, G711_TRUTH_PATH, compression="zstd")
    print(f"wrote {len(rows)} clips -> {G711_DIR}, truth -> {G711_TRUTH_PATH}")


if __name__ == "__main__":
    main()
