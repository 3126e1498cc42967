"""Materialize the deterministic WAV audio fixture.

Writes ``fixtures/wav/clip_NNN.wav`` (24 PCM clips via the stdlib
``wave`` module — an independent RIFF writer, so the engine's own
parser is cross-checked against a second implementation) and
``fixtures/wav_truth.parquet`` — ground truth computed from the raw
sample values with plain loop math (dimensions, buffer sha256, exact
per-channel energy, zero crossings, and the mono-downmix/decimate
facts q146 replays). Committed; byte-stable on re-run.

Usage: python tools/make_wav_fixture.py
"""

from __future__ import annotations

import io
import os
import sys
import wave

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diachronic_spark.sources.wav_fixture import (
    CLIPS_DIR,
    TRUTH_PATH,
    generate_clips,
    truth_row,
)

SCHEMA = pa.schema(
    [
        ("clip_id", pa.int64()),
        ("sample_rate", pa.int32()),
        ("n_channels", pa.int32()),
        ("sample_width", pa.int32()),
        ("n_frames", pa.int64()),
        ("frames_sha", pa.string()),
        ("sumsq_c0", pa.int64()),
        ("sumsq_c1", pa.int64()),
        ("zero_cross", pa.int64()),
        ("dm_sample_rate", pa.int32()),
        ("dm_n_frames", pa.int64()),
        ("dm_frames_sha", pa.string()),
        ("dm_sumsq", pa.int64()),
    ]
)


def main() -> None:
    os.makedirs(CLIPS_DIR, exist_ok=True)
    rows = []
    for clip in generate_clips():
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(clip["channels"])
            w.setsampwidth(clip["width"])
            w.setframerate(clip["rate"])
            w.writeframes(clip["frames"])
        path = os.path.join(CLIPS_DIR, f"clip_{clip['clip_id']:03d}.wav")
        with open(path, "wb") as f:
            f.write(buf.getvalue())
        rows.append(truth_row(clip))
    cols = {k: [r[k] for r in rows] for k in SCHEMA.names}
    table = pa.Table.from_arrays(
        [pa.array(cols[f.name], type=f.type) for f in SCHEMA], schema=SCHEMA
    )
    pq.write_table(table, TRUTH_PATH, compression="zstd")
    print(f"wrote {len(rows)} clips -> {CLIPS_DIR}, truth -> {TRUTH_PATH}")


if __name__ == "__main__":
    main()
