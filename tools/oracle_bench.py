#!/usr/bin/env python
"""DuckDB-side bench: run every oracle query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and print the same one-line JSON shape
as bench.py — the reproducible baseline bench.py is compared against.

Usage: python tools/oracle_bench.py
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from diachronic_spark.plans import ORACLE  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    # First run doubles as warmup; re-run (best-of-2, like bench.py)
    # only when the first run is fast — q22's nested-loop theta join
    # alone is ~290 s at sf0.1 and doesn't need a second sample.
    timings: dict[str, float] = {}
    for name, sql in ORACLE.items():
        t0 = time.perf_counter()
        con.sql(sql).fetchall()
        best = time.perf_counter() - t0
        if best < 5.0:
            t0 = time.perf_counter()
            con.sql(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "oracle_total_query_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
