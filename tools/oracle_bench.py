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

# VERDICT r7 item 8: q22's adjudicating oracle is the literal theta
# join, which DuckDB plans as a ~290 s nested loop at sf0.1 — most of
# the whole-baseline total, so the aggregate Spark-vs-DuckDB headline
# leans on one row. This REWRITE is the same predicate in the
# BETWEEN form DuckDB's IEJoin optimizes (verified row-identical to
# the adjudicating form at sf0.01/sf0.1). It is benched as a second
# REFERENCE row — never the adjudicating oracle — so the bench story
# can be told both ways without re-deriving it each round.
Q22_INTERVAL_REWRITE = """
SELECT o_orderstatus, count(*) AS n_pairs
FROM (SELECT epoch_us(ts - INTERVAL 29 YEAR)/1000000.0 AS te
      FROM events) e
JOIN (SELECT o_orderstatus, epoch_us(o_orderdate)/1000000.0 AS tod
      FROM orders) o
  ON e.te BETWEEN o.tod - 86400.0 AND o.tod + 86400.0
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


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
    q22_rows = None
    for name, sql in ORACLE.items():
        t0 = time.perf_counter()
        rows = con.sql(sql).fetchall()
        best = time.perf_counter() - t0
        if name == "q22":
            q22_rows = rows
        if best < 5.0:
            t0 = time.perf_counter()
            con.sql(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
    total = round(sum(timings.values()), 3)
    # reference row (outside the adjudicated-total sum): the sanity
    # check (against the rows captured above — never a re-run of the
    # nested-loop form) guards against the rewrite drifting from the
    # adjudicating oracle as either query evolves
    assert con.sql(Q22_INTERVAL_REWRITE).fetchall() == q22_rows, (
        "q22 interval rewrite no longer row-identical to the oracle"
    )
    t0 = time.perf_counter()
    con.sql(Q22_INTERVAL_REWRITE).fetchall()
    rew = time.perf_counter() - t0
    t0 = time.perf_counter()
    con.sql(Q22_INTERVAL_REWRITE).fetchall()
    rew = round(min(rew, time.perf_counter() - t0), 3)
    print(
        json.dumps(
            {
                "metric": "oracle_total_query_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "q22_interval_rewrite_reference_sec": rew,
                "value_with_q22_rewrite": round(
                    total - timings.get("q22", 0.0) + rew, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
