"""Materialize the deterministic spectral-analysis WAV fixture.

Writes ``fixtures/wav_spectral/clip_NNN.wav`` (6 engineered clips)
and ``fixtures/spectral_truth.parquet`` — features computed via the
pure-Python O(N²) loop DFT over the raw samples BEFORE encoding,
sharing no spectrum algorithm with the engine's numpy rFFT.

Boundary guards (the quantize_embeddings rule) are ASSERTED here so
a committed fixture can never sit where a last-ulp FFT/DFT
divergence flips a value: every dominant peak leads its runner-up
by ≥ 10%, and every centroid×10 sits ≥ 0.05 from its floor(+0.5)
rounding boundary.

Usage: python tools/make_spectral_fixture.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diachronic_spark.sources.spectral_fixture import (
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
        ("n_frames", pa.int64()),
        ("n_fft", pa.int32()),
        ("dominant_bin", pa.int32()),
        ("dominant_hz", pa.int32()),
        ("centroid_x10", pa.int64()),
    ]
)


def main() -> None:
    os.makedirs(CLIPS_DIR, exist_ok=True)
    rows = []
    for c in generate_clips():
        f = c["feats"]
        margin = f["_peak_margin"]
        frac = (10 * f["_centroid_raw"]) % 1.0
        assert margin >= 1.1, (
            f"clip {c['clip_id']}: peak margin {margin:.3f} < 1.1 — "
            "re-engineer the signal"
        )
        assert abs(frac - 0.5) >= 0.05, (
            f"clip {c['clip_id']}: centroid_x10 fraction {frac:.3f} "
            "within 0.05 of the rounding boundary"
        )
        path = os.path.join(CLIPS_DIR, f"clip_{c['clip_id']:03d}.wav")
        with open(path, "wb") as fh:
            fh.write(c["blob"])
        rows.append(truth_row(c))
    cols = {k: [r[k] for r in rows] for k in SCHEMA.names}
    table = pa.Table.from_arrays(
        [pa.array(cols[f.name], type=f.type) for f in SCHEMA],
        schema=SCHEMA,
    )
    pq.write_table(table, TRUTH_PATH, compression="zstd")
    print(f"wrote {len(rows)} clips -> {CLIPS_DIR}, truth -> {TRUTH_PATH}")


if __name__ == "__main__":
    main()
