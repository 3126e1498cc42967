#!/usr/bin/env python
"""Materialize the link-graph WARC fixture (fixtures/linkgraph/ +
fixtures/linkgraph_truth.parquet) for q192's host-graph PageRank
stage. Byte-stable on re-run (gzip mtime=0, fixed schema).

Usage: python tools/make_linkgraph_fixture.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from diachronic_spark.sources.linkgraph_fixture import (  # noqa: E402
    LINKGRAPH_DIR,
    TRUTH_PATH,
    write_fixture,
)


def main() -> None:
    write_fixture()
    print(f"wrote {LINKGRAPH_DIR} + {TRUTH_PATH}")


if __name__ == "__main__":
    main()
