#!/usr/bin/env python
"""Empirical scaling curves: time every query at sf0.001 / sf0.01 /
sf0.1 in one session and report the growth ratio across each 10x data
step.

The point: SCALE.md argues each operator's 100 TB shape analytically;
this tool measures the same claim at the scales we have. A query whose
wall time grows faster than the data (ratio >> 10 across a 10x step,
once out of the fixed-overhead floor) has a super-linear term the plan
audit missed — that's a scale bug to fix, not a constant to tune.

Reading the ratios: at sf0.001 almost every query sits on the ~0.1-0.5s
scheduling floor, so t(0.01)/t(0.001) understates growth. The
informative column is t(0.1)/t(0.01) — data grows 10x; a shuffle-bound
query should grow <= ~10x, a scan-bound one much less, and anything
materially above 10x is flagged.

Usage: python tools/scaling_curves.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diachronic_spark.catalog import TABLES, load  # noqa: E402
from diachronic_spark.plans import QUERIES  # noqa: E402
from diachronic_spark.session import get_spark  # noqa: E402

SF_DIRS = [
    ("0.001", "/root/testdata/sf0.001"),
    ("0.01", "/root/testdata/sf0.01"),
    ("0.1", "/root/testdata/sf0.1"),
]

# Above this, a 10x data step growing super-10x is a red flag rather
# than scheduling noise (below it, wall time is mostly fixed overhead).
FLOOR_SEC = 0.15
SUPERLINEAR_RATIO = 12.0


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SCALING.json"
    spark = get_spark("diachronic-spark-scaling")
    spark.sparkContext.setLogLevel("ERROR")

    per_sf: dict[str, dict[str, float]] = {}
    for sf_label, sf_dir in SF_DIRS:
        cached = [load(spark, sf_dir, t).persist() for t in TABLES]
        for df in cached:
            df.count()
        for fn in QUERIES.values():  # codegen warmup per plan shape
            fn(spark, sf_dir).toPandas()
        timings: dict[str, float] = {}
        for name, fn in QUERIES.items():
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).toPandas()
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 3)
        per_sf[sf_label] = timings
        for df in cached:
            df.unpersist()

    rows = []
    flagged = []
    for name in QUERIES:
        t3, t2, t1 = (per_sf[s].get(name) for s in ("0.001", "0.01", "0.1"))
        r21 = round(t2 / t3, 1) if t3 else None
        r12 = round(t1 / t2, 1) if t2 else None
        superlinear = (
            r12 is not None and r12 > SUPERLINEAR_RATIO and t2 > FLOOR_SEC
        )
        if superlinear:
            flagged.append(name)
        rows.append(
            {
                "query": name,
                "sf0.001": t3,
                "sf0.01": t2,
                "sf0.1": t1,
                "x_001_to_01": r21,
                "x_01_to_1": r12,
                "superlinear": superlinear,
            }
        )

    result = {
        "metric": "scaling_curves",
        "unit": "sec",
        "totals": {s: round(sum(t.values()), 3) for s, t in per_sf.items()},
        "flagged_superlinear": flagged,
        "queries": rows,
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: result[k] for k in ("totals", "flagged_superlinear")}))


if __name__ == "__main__":
    main()
