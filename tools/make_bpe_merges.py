#!/usr/bin/env python
"""Materialize fixtures/bpe_merges.parquet (char-level, q172) and
fixtures/bpe_byte_merges.parquet (BYTE-level, q183/q178) — the
committed BPE merge tables both engines apply (Spark Arrow-UDF
encode vs DuckDB recursive-CTE replay).

Training corpus: sf0.001 documents (TESTDATA.md: seed=42, read-only,
stable), 48 merges, pure deterministic trainer
(diachronic_spark/operators/bpe.py::train_merges).

Byte-stable on re-run: fixed schema, single row group.

Usage: python tools/make_bpe_merges.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from diachronic_spark.sources.bpe_fixture import (  # noqa: E402
    BYTE_MERGES_PATH,
    MERGES_PATH,
    write_byte_merges,
    write_merges,
)


def main() -> None:
    write_merges()
    print(f"wrote {MERGES_PATH}")
    write_byte_merges()
    print(f"wrote {BYTE_MERGES_PATH}")


if __name__ == "__main__":
    main()
