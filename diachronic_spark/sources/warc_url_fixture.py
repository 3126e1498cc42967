"""Deterministic messy-URL WARC fixture (q173 — VERDICT r8 item 2).

The main WARC fixture's URIs are all already canonical, so URL
canonicalization would not be load-bearing there; this second crawl
exists to make every clause of the declared policy decisive:

- case-folding (scheme ``HTTPS://``, host ``Example.ORG``),
- default-port stripping (``:443``, ``:80``) vs a NON-default port
  that must survive (``:8080``),
- fragment dropping (``#top``),
- empty path → ``/`` and single-trailing-slash removal (``/a/`` vs
  ``/a``),
- query-parameter ordering (``?b=2&a=1`` vs ``?a=1&b=2``),
- path case significance (``/Page`` vs ``/page`` must NOT collapse),
- a non-response record the dedup stage must ignore.

Duplicate captures carry DIFFERENT bodies on purpose: canonical-URL
dedup keeps the FIRST capture (min file_id, rec_idx), not equal
content — the truth table pins which body survives.

Container assembly (version line, headers, gzip layouts) reuses the
adjudicated ``warc_fixture`` byte-level assembler; truth rows are
computed from the record dicts BEFORE assembly, so the only trusted
link is dicts == bytes, same as q163.
"""

from __future__ import annotations

import gzip
import os

from .warc_fixture import assemble_record

_HERE = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
WARC_URL_DIR = os.path.join(_HERE, "fixtures", "warc_url")
TRUTH_PATH = os.path.join(_HERE, "fixtures", "warc_url_truth.parquet")


def _resp(uri: str, body: str, ctype: str = "text/plain") -> dict:
    return {
        "type": "response", "uri": uri, "status": 200,
        "reason": "OK", "ctype": ctype,
        "body": body.encode("utf-8"),
    }


def _record_defs(file_id: int) -> list:
    if file_id == 0:
        return [
            _resp("https://Example.ORG:443/news/",
                  "first capture of the news page"),
            _resp("https://example.org/news#top",
                  "SECOND capture, different body"),
            _resp("http://example.org:80/", "root page body"),
            _resp("https://example.org/search?b=2&a=1",
                  "search results capture one"),
            _resp("https://example.org/Page",
                  "upper-case path is a DIFFERENT resource"),
            _resp("https://example.org/page",
                  "lower-case path resource"),
        ]
    return [
        _resp("HTTP://EXAMPLE.org", "root page recrawl"),
        _resp("https://example.org/search?a=1&b=2",
              "search results capture two"),
        _resp("https://example.org:8080/page",
              "alt-port service is NOT the same resource"),
        _resp("https://example.org/a/", "article first capture"),
        {"type": "request", "uri": "https://example.org/a",
         "content": b"GET /a HTTP/1.1\r\nHost: example.org\r\n\r\n"},
        _resp("https://example.org/a", "article recrawl"),
    ]


# file 0 plain .warc; file 1 per-record gzip members (Common Crawl)
_LAYOUTS = {0: None, 1: "member"}


def file_name(file_id: int) -> str:
    ext = "warc" if _LAYOUTS[file_id] is None else "warc.gz"
    return f"crawl_url_{file_id:03d}.{ext}"


def generate_warcs() -> list:
    out = []
    for file_id in sorted(_LAYOUTS):
        recs = _record_defs(file_id)
        raw = [
            assemble_record(file_id, i, r) for i, r in enumerate(recs)
        ]
        blob = (
            b"".join(raw)
            if _LAYOUTS[file_id] is None
            else b"".join(gzip.compress(r, mtime=0) for r in raw)
        )
        out.append(
            {"file_id": file_id, "name": file_name(file_id),
             "blob": blob, "recs": recs}
        )
    return out


def truth_rows(wf: dict) -> list:
    """Pre-assembly truth: one row per record with the raw URI and
    the policy-extracted text (every response body here is text)."""
    rows = []
    for idx, rec in enumerate(wf["recs"]):
        rows.append(
            {
                "file_id": wf["file_id"],
                "rec_idx": idx,
                "rec_type": rec["type"],
                "raw_uri": rec.get("uri"),
                "text": (
                    rec["body"].decode("utf-8")
                    if rec["type"] == "response"
                    else None
                ),
            }
        )
    return rows


def write_fixture() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(WARC_URL_DIR, exist_ok=True)
    all_rows = []
    for wf in generate_warcs():
        with open(os.path.join(WARC_URL_DIR, wf["name"]), "wb") as f:
            f.write(wf["blob"])
        all_rows.extend(truth_rows(wf))
    schema = pa.schema(
        [
            ("file_id", pa.int64()),
            ("rec_idx", pa.int64()),
            ("rec_type", pa.string()),
            ("raw_uri", pa.string()),
            ("text", pa.string()),
        ]
    )
    pq.write_table(
        pa.Table.from_pylist(all_rows, schema=schema),
        TRUTH_PATH,
        compression="snappy",
    )
