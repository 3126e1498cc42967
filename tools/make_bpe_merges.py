#!/usr/bin/env python
"""Materialize fixtures/bpe_merges.parquet — the committed BPE merge
table q172 applies on BOTH engines (Spark Arrow-UDF encode vs DuckDB
recursive-CTE replay).

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
    MERGES_PATH,
    write_merges,
)


def main() -> None:
    write_merges()
    print(f"wrote {MERGES_PATH}")


if __name__ == "__main__":
    main()
