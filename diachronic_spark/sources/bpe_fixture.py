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
BYTE_MERGES_PATH = os.path.join(
    ROOT, "fixtures", "bpe_byte_merges.parquet"
)
TRAIN_SF_DIR = "/root/testdata/sf0.001"
N_MERGES = 48
# 112, not 48: the ASCII word-soup corpus owns the first ~80 slots
# (rank-64 pair freq 917 vs 175 for the best multi-byte pair); the
# extra budget is what buys real multi-byte merges (é ü ñ, Greek,
# Cyrillic, kana) so q183 adjudicates merges that SPAN UTF-8 bytes,
# not just the ASCII-identity region.
N_BYTE_MERGES = 112

SCHEMA = pa.schema(
    [("rank", pa.int32()), ("lft", pa.string()), ("rgt", pa.string())]
)

# Multilingual supplement for the BYTE-LEVEL table (VERDICT r9 item
# 1): the sf corpus is pure ASCII (asserted below), where byte-level
# and char-level merges coincide symbol-for-symbol; these rows make
# multi-byte UTF-8 merges real (é/ü/ß 2-byte Latin, Greek/Cyrillic
# 2-byte, CJK 3-byte, € 3-byte) and double as q183's in-memory eval
# docs, ids offset past the sf corpus. Shared DATA between engines —
# the byte mapping and the fold are derived independently.
MULTILINGUAL_BASE_ID = 1_000_000
MULTILINGUAL: list[tuple[int, str]] = [
    (MULTILINGUAL_BASE_ID + 0,
     "le café était très agréable et le déjeuner délicieux"),
    (MULTILINGUAL_BASE_ID + 1,
     "die straße führt über die brücke zum größten gebäude"),
    (MULTILINGUAL_BASE_ID + 2,
     "el niño soñó con montañas y mañanas de español"),
    (MULTILINGUAL_BASE_ID + 3,
     "příliš žluťoučký kůň úpěl ďábelské ódy"),
    (MULTILINGUAL_BASE_ID + 4,
     "το γρήγορο καφέ αλεπού πηδά πάνω από τον τεμπέλη σκύλο"),
    (MULTILINGUAL_BASE_ID + 5,
     "съешь же ещё этих мягких французских булок да выпей чаю"),
    (MULTILINGUAL_BASE_ID + 6,
     "日本語のテキストを処理する、中文文本也一样。"),
    (MULTILINGUAL_BASE_ID + 7,
     "mixed ascii and café über 日本 text costs €42, naïve test!"),
]
# Each supplement doc's words count this many times in byte-merge
# training, so multi-byte pairs outrank the ASCII long tail of the
# 500-doc corpus for some of the 64 merge slots.
MULTILINGUAL_WEIGHT = 25


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


def generate_byte_merges() -> list[tuple[str, str]]:
    """Retrain the BYTE-LEVEL table from the pinned corpus + the
    multilingual supplement. The sf corpus must be pure ASCII (it is
    — asserted loudly, because on ASCII the stdlib ``[A-Za-z]``
    pre-tokenizer equals the unicode ``\\p{L}`` one Spark/DuckDB
    apply at q183); supplement rows pre-tokenize with the stdlib
    unicode approximation ``[^\\W\\d_]+|\\d+|[^\\w\\s]`` — trainer
    pre-tokenization only shapes TABLE CONTENT (deterministically,
    which the regen test pins), never apply-side parity."""
    from ..operators.bpe import byte_repr

    tbl = pq.read_table(
        os.path.join(TRAIN_SF_DIR, "documents.parquet"),
        columns=["text"],
    )
    wf: Counter = Counter()
    pat = re.compile(RE_TOKEN)
    for t in tbl.column("text").to_pylist():
        assert t.isascii(), (
            "byte-merge trainer assumes an ASCII sf corpus; a "
            "non-ASCII regen needs the unicode pre-tokenizer here"
        )
        wf.update(pat.findall(t))
    uni_pat = re.compile(r"[^\W\d_]+|\d+|[^\w\s]", re.UNICODE)
    for _, t in MULTILINGUAL:
        for w in uni_pat.findall(t):
            wf[w] += MULTILINGUAL_WEIGHT
    return train_merges(
        {byte_repr(w): c for w, c in wf.items()}, N_BYTE_MERGES
    )


def _write(merges: list[tuple[str, str]], path: str) -> None:
    table = pa.Table.from_pydict(
        {
            "rank": pa.array(range(len(merges)), pa.int32()),
            "lft": [a for a, _ in merges],
            "rgt": [b for _, b in merges],
        },
        schema=SCHEMA,
    )
    pq.write_table(table, path, compression="snappy")


def write_merges(path: str = MERGES_PATH) -> None:
    _write(generate_merges(), path)


def write_byte_merges(path: str = BYTE_MERGES_PATH) -> None:
    _write(generate_byte_merges(), path)


def load_merges(path: str = MERGES_PATH) -> list[tuple[str, str]]:
    tbl = pq.read_table(path).sort_by("rank")
    return list(zip(tbl.column("lft").to_pylist(),
                    tbl.column("rgt").to_pylist()))


def load_byte_merges(
    path: str = BYTE_MERGES_PATH,
) -> list[tuple[str, str]]:
    return load_merges(path)
