#!/usr/bin/env python
"""Materialize the messy-URL WARC fixture (fixtures/warc_url/ +
fixtures/warc_url_truth.parquet) for q173's URL-canonicalization
dedup stage. Byte-stable on re-run (gzip mtime=0, fixed schema).

Usage: python tools/make_warc_url_fixture.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from diachronic_spark.sources.warc_url_fixture import (  # noqa: E402
    TRUTH_PATH,
    WARC_URL_DIR,
    write_fixture,
)


def main() -> None:
    write_fixture()
    print(f"wrote {WARC_URL_DIR} + {TRUTH_PATH}")


if __name__ == "__main__":
    main()
