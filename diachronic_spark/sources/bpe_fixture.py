"""Committed BPE merge table (fixtures/bpe_merges.parquet).

Trained ONCE, deterministically, on the sf0.001 ``documents`` corpus
(driver-generated, seed=42 — TESTDATA.md pins it read-only and
stable) with the pure-Python trainer in ``operators/bpe.py``; the
table is then applied corpus-independently, exactly like a
production tokenizer: train on a bounded sample, encode everything.

Both engines consume THIS file for q172 — Spark broadcasts the
ranks into the Arrow encode UDF; DuckDB replays the greedy apply
loop as a recursive CTE over the same rows — so the only trusted
link is "committed table == deterministic trainer output", which
``tests/test_bpe.py::test_committed_merges_are_regenerable`` makes
mechanical.

Schema: (rank int32, lft string, rgt string), rank = merge order.
"""

from __future__ import annotations

import os
import re
from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq

from ..operators.bpe import train_merges
from ..operators.text import RE_TOKEN

ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
MERGES_PATH = os.path.join(ROOT, "fixtures", "bpe_merges.parquet")
TRAIN_SF_DIR = "/root/testdata/sf0.001"
N_MERGES = 48

SCHEMA = pa.schema(
    [("rank", pa.int32()), ("lft", pa.string()), ("rgt", pa.string())]
)


def generate_merges() -> list[tuple[str, str]]:
    """Retrain from the pinned corpus (pure stdlib + duckdb-free:
    pyarrow reads the parquet, re module pre-tokenizes)."""
    tbl = pq.read_table(
        os.path.join(TRAIN_SF_DIR, "documents.parquet"),
        columns=["text"],
    )
    wf: Counter = Counter()
    pat = re.compile(RE_TOKEN)
    for t in tbl.column("text").to_pylist():
        wf.update(pat.findall(t))
    return train_merges(dict(wf), N_MERGES)


def write_merges(path: str = MERGES_PATH) -> None:
    merges = generate_merges()
    table = pa.Table.from_pydict(
        {
            "rank": pa.array(range(len(merges)), pa.int32()),
            "lft": [a for a, _ in merges],
            "rgt": [b for _, b in merges],
        },
        schema=SCHEMA,
    )
    pq.write_table(table, path, compression="snappy")


def load_merges(path: str = MERGES_PATH) -> list[tuple[str, str]]:
    tbl = pq.read_table(path).sort_by("rank")
    return list(zip(tbl.column("lft").to_pylist(),
                    tbl.column("rgt").to_pylist()))
