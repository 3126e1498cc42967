"""Materialize the deterministic ICO (favicon) fixture.

Writes ``fixtures/ico/icon_NNN.ico`` (9 icons — PNG and DIB entries,
8/24/32 bpp, alpha plane vs AND-mask fallback, multi-entry selection,
the 0→256 size rule) and ``fixtures/ico_truth.parquet`` — ground
truth computed from the raw RGBA arrays with plain loop math BEFORE
container assembly, never via the codec under test. Both are
committed; re-running must be byte-stable.

Usage: python tools/make_ico_fixture.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diachronic_spark.sources.ico_fixture import (
    ICOS_DIR,
    TRUTH_PATH,
    generate_icos,
    truth_row,
)

SCHEMA = pa.schema(
    [
        ("ico_id", pa.int64()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("channels", pa.int32()),
        ("n_entries", pa.int32()),
        ("pix_sha", pa.string()),
        ("sum_r", pa.int64()),
        ("sum_g", pa.int64()),
        ("sum_b", pa.int64()),
        ("sum_a", pa.int64()),
    ]
)


def main() -> None:
    os.makedirs(ICOS_DIR, exist_ok=True)
    rows = []
    for ico in generate_icos():
        path = os.path.join(ICOS_DIR, f"icon_{ico['ico_id']:03d}.ico")
        with open(path, "wb") as f:
            f.write(ico["blob"])
        rows.append(truth_row(ico))
    cols = {k: [r[k] for r in rows] for k in SCHEMA.names}
    table = pa.Table.from_arrays(
        [pa.array(cols[f.name], type=f.type) for f in SCHEMA],
        schema=SCHEMA,
    )
    pq.write_table(table, TRUTH_PATH, compression="zstd")
    print(f"wrote {len(rows)} icos -> {ICOS_DIR}, truth -> {TRUTH_PATH}")


if __name__ == "__main__":
    main()
