#!/usr/bin/env python
"""Materialize the sitemap discovery fixture (fixtures/sitemap/ +
fixtures/sitemap_truth.parquet) for q181. Byte-stable on re-run
(gzip mtime=0, fixed schema).

Usage: python tools/make_sitemap_fixture.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from diachronic_spark.sources.sitemap_fixture import (  # noqa: E402
    SITEMAP_DIR,
    TRUTH_PATH,
    write_fixture,
)


def main() -> None:
    write_fixture()
    print(f"wrote {SITEMAP_DIR} + {TRUTH_PATH}")


if __name__ == "__main__":
    main()
