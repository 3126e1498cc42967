"""Deterministic ZIP dataset-archive fixture.

Three archives covering the ingestion axes a dataset mirror actually
presents: stored and deflated members, nested directory names, UTF-8
text members (CSV/JSONL/TXT with non-ASCII), a binary member (PNG
via the committed encoder), an empty member, an archive comment, and
a member whose name carries no text-policy extension.

Independence structure: members are DEFINED as (name, bytes) pairs
first; the truth rows are computed from those pairs with plain
stdlib calls BEFORE archiving. Assembly uses stdlib ``zipfile`` with
pinned metadata (fixed DOS timestamp, explicit compress level) so
re-running is byte-stable in-container; the engine under test reads
the archive back through the same stdlib — the adjudicated surface
is the Spark-side record shape, the declared text policy, and the
member-integrity facts, not a reimplementation of DEFLATE (zlib is
the container's vetted codec, the gzip/WARC precedent).
"""

from __future__ import annotations

import hashlib
import io
import os
import zipfile

from ..functions import png as PNG

_HERE = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
ZIPS_DIR = os.path.join(_HERE, "fixtures", "zip")
TRUTH_PATH = os.path.join(_HERE, "fixtures", "zip_truth.parquet")

# the declared text-policy extension list lives ENGINE-side
# (sources/files.py); the truth replays it by importing from there
from .files import TEXT_EXTS  # noqa: E402


def _png_member(seed: int) -> bytes:
    w, h = 6, 3
    pix = bytes((seed * 17 + i * 5) % 256 for i in range(w * h * 3))
    return PNG.encode_png(w, h, 3, pix)


def _member_defs(zip_id: int) -> list:
    """(name, data, method) per member; method: 'stored'/'deflate'."""
    if zip_id == 0:
        return [
            ("data/train.csv",
             "id,text,label\n1,hallo wält,0\n2,ça va,1\n".encode(),
             "deflate"),
            ("data/train.jsonl",
             b'{"id": 1, "text": "a b c"}\n{"id": 2, "text": "d e"}\n',
             "deflate"),
            ("README.md", "# Corpus v1\nUTF-8: éüß\n".encode(),
             "stored"),
        ]
    if zip_id == 1:
        return [
            ("assets/logo.png", _png_member(1), "stored"),
            ("assets/empty.txt", b"", "stored"),
            ("notes.txt", b"plain seven bit text\n" * 40, "deflate"),
        ]
    return [
        ("deep/nested/dir/shard-00000.jsonl",
         b'{"doc": "nested shard"}\n', "deflate"),
        ("blob.bin", bytes(range(256)) * 3, "deflate"),
        ("UPPER.CSV", b"A,B\n1,2\n", "stored"),  # extension case rule
    ]


def build_zip(zip_id: int) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        if zip_id == 2:
            zf.comment = b"diachronic fixture archive"
        for name, data, method in _member_defs(zip_id):
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = (
                zipfile.ZIP_DEFLATED
                if method == "deflate"
                else zipfile.ZIP_STORED
            )
            zi.external_attr = 0o644 << 16
            zf.writestr(zi, data)
    return buf.getvalue()


def generate_zips() -> list:
    return [
        {
            "zip_id": zip_id,
            "name": f"dataset_{zip_id:03d}.zip",
            "blob": build_zip(zip_id),
            "members": _member_defs(zip_id),
        }
        for zip_id in range(3)
    ]


def truth_rows(zf: dict) -> list:
    """Adjudicated rows straight from the member pairs — stdlib
    only, never through the archive reader."""
    rows = []
    for idx, (name, data, method) in enumerate(zf["members"]):
        is_text = name.lower().endswith(TEXT_EXTS)
        rows.append(
            {
                "zip_id": zf["zip_id"],
                "entry_idx": idx,
                "name": name,
                "method": method,
                "n_bytes": len(data),
                "content_sha": hashlib.sha256(data).hexdigest(),
                "text": (
                    data.decode("utf-8", "replace") if is_text else None
                ),
            }
        )
    return rows
