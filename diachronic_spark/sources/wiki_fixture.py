"""Deterministic synthetic wiki-revisions fixture (FIXTURES.md §3).

One row per <revision> as the reference's XML parser would emit it
before filtering (/root/reference/main.py:111,145-158). Seeded, so the
same rows are produced in every process — usable both by tests and by
the q21 pipeline query without touching read-only testdata.

Covers every required edge case from FIXTURES.md §3: same-day
multi-revision pages, pre-epoch revisions, non-zero namespaces, NULL
text, out-of-order timestamps (marked via ``ooo`` titles so tests can
exclude/include them), midnight-straddling pairs, cross-page same-title
collisions, and empty pages (skipped page_ids).
"""

from __future__ import annotations

import datetime as dt
import os
import random

from pyspark.sql import DataFrame, SparkSession

from ..schemas import WIKI_REVISIONS

EPOCH = dt.datetime(2001, 1, 15)

# Materialized copy of the in-order fixture (tools/make_wiki_fixture.py),
# committed so the q21 DuckDB oracle can read the identical input via
# read_parquet — making q21 fully oracle-checkable instead of rows-only.
FIXTURE_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "fixtures",
    "wiki_revisions.parquet",
)


def generate_rows(
    n_pages: int = 200, seed: int = 42, include_out_of_order: bool = True
) -> list[tuple]:
    """Rows of (page_id, rev_seq, namespace, title, timestamp, text)."""
    rng = random.Random(seed)
    rows: list[tuple] = []
    base = dt.datetime(2000, 12, 1)
    for page_id in range(n_pages):
        if rng.random() < 0.03:
            continue  # empty page: contributes nothing (FIXTURES §3.8)
        ooo_page = include_out_of_order and rng.random() < 0.05
        title = f"Page_{page_id % 180}"  # some cross-page title collisions
        if ooo_page:
            title = f"ooo_{title}"
        namespace = "0" if rng.random() < 0.85 else rng.choice(["1", "2", "User"])
        n_revs = rng.randint(1, 12)
        t = base + dt.timedelta(
            days=rng.randint(0, 120), seconds=rng.randint(0, 86399)
        )
        timestamps = []
        for _ in range(n_revs):
            timestamps.append(t)
            # mixture of same-day bursts and multi-day gaps; occasional
            # seconds-apart midnight straddles
            step = rng.choice([60, 3600, 3600, 86399, 86400 * rng.randint(1, 9)])
            t = t + dt.timedelta(seconds=step)
        if ooo_page and n_revs >= 3:
            i = rng.randrange(1, n_revs - 1)
            timestamps[i] = timestamps[i] - dt.timedelta(days=rng.randint(1, 30))
        for seq, ts in enumerate(timestamps):
            text = None if rng.random() < 0.05 else f"text p{page_id} r{seq} " + " ".join(
                rng.choices(["alpha", "beta", "gamma", "delta"], k=rng.randint(1, 8))
            )
            # a few pages mix namespaces across revisions (ns checked per
            # revision in the reference, main.py:152)
            ns = namespace if rng.random() < 0.9 else "0"
            rows.append((page_id, seq, ns, title, ts, text))
    return rows


def wiki_revisions_df(
    spark: SparkSession,
    n_pages: int = 200,
    seed: int = 42,
    include_out_of_order: bool = True,
) -> DataFrame:
    rows = generate_rows(n_pages, seed, include_out_of_order)
    return spark.createDataFrame(rows, WIKI_REVISIONS)
