"""Deterministic WARC (web-archive) fixture.

Four files covering the container's axes: plain .warc and .warc.gz
in BOTH compression layouts (one gzip member per record — the
Common Crawl shape — and one member overall), the record-type set a
crawl actually produces (warcinfo, request, response, metadata,
resource), HTTP responses across content types (UTF-8 HTML,
plain text, JSON, binary PNG via the committed PNG encoder), status
codes (200/301/404), a response with no Content-Type, a zero-length
body, mixed header casing, and — the boundary-robustness case — a
text body embedding a literal ``WARC/1.1\\r\\n`` line that a
delimiter-scanning parser would misread as a record start.

Independence structure: every record is DEFINED as a dict first
(type, uri, status, mime, body bytes); the truth rows are computed
from those dicts with plain stdlib calls BEFORE container assembly,
and the assembler below builds version line + headers + content
block byte-by-byte, independent of functions/warc.py's parser.
"""

from __future__ import annotations

import gzip
import hashlib
import os

from ..functions import png as PNG

_HERE = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
WARCS_DIR = os.path.join(_HERE, "fixtures", "warc")
TRUTH_PATH = os.path.join(_HERE, "fixtures", "warc_truth.parquet")


def _rec_id(file_id: int, idx: int) -> str:
    return f"<urn:uuid:0000000{file_id}-{idx:04d}-4000-8000-0000000000{idx:02d}>"


def _http(status: int, reason: str, hdrs: list, body: bytes) -> bytes:
    head = f"HTTP/1.1 {status} {reason}\r\n".encode()
    for k, v in hdrs:
        head += f"{k}: {v}\r\n".encode()
    return head + b"\r\n" + body


def _png_body(seed: int) -> bytes:
    w, h = 5, 4
    pix = bytes(
        (seed * 31 + i * 7) % 256 for i in range(w * h * 3)
    )
    return PNG.encode_png(w, h, 3, pix)


def _record_defs(file_id: int) -> list:
    """The per-file record dicts — the pre-assembly source of truth.
    Keys: type, uri (optional), content-kind fields."""
    if file_id == 0:
        html = (
            "<html><body><h1>Seite über Bäume</h1>"
            "<p>café — naïve résumé</p></body></html>"
        ).encode("utf-8")
        return [
            {"type": "warcinfo",
             "content": b"software: diachronic-fixture/1.0\r\nformat: WARC/1.1\r\n"},
            {"type": "request", "uri": "https://example.org/baeume",
             "content": b"GET /baeume HTTP/1.1\r\nHost: example.org\r\n\r\n"},
            {"type": "response", "uri": "https://example.org/baeume",
             "status": 200, "reason": "OK",
             "ctype": "text/html; charset=UTF-8", "body": html},
            {"type": "metadata", "uri": "https://example.org/baeume",
             "content": b"fetchTimeMs: 212\r\n"},
        ]
    if file_id == 1:
        return [
            {"type": "response", "uri": "https://example.org/robots.txt",
             "status": 200, "reason": "OK", "ctype": "text/plain",
             "body": b"User-agent: *\r\nDisallow: /private/\r\n"},
            {"type": "response", "uri": "https://api.example.org/v1/items",
             "status": 200, "reason": "OK",
             "ctype": "application/json; charset=utf-8",
             "body": b'{"items": [1, 2, 3], "next": null}'},
            {"type": "response", "uri": "https://example.org/missing",
             "status": 404, "reason": "Not Found", "ctype": "text/html",
             "body": b"<html><body>404</body></html>"},
        ]
    if file_id == 2:
        return [
            {"type": "response", "uri": "https://example.org/logo.png",
             "status": 200, "reason": "OK", "ctype": "image/png",
             "body": _png_body(2)},
            {"type": "response", "uri": "https://example.org/untyped",
             "status": 200, "reason": "OK", "ctype": None,
             "body": b"\x00\x01\x02 untyped bytes"},
            {"type": "response", "uri": "https://example.org/empty",
             "status": 204, "reason": "No Content", "ctype": "text/plain",
             "body": b""},
        ]
    if file_id == 4:
        # duplicates across files (the q165 capstone's dedup stage):
        # the SAME bodies as file 1's robots.txt and file 0's German
        # page, served from different URIs, plus a too-short doc the
        # quality gate must drop
        html = (
            "<html><body><h1>Seite über Bäume</h1>"
            "<p>café — naïve résumé</p></body></html>"
        ).encode("utf-8")
        return [
            {"type": "response",
             "uri": "https://mirror.example.net/robots.txt",
             "status": 200, "reason": "OK", "ctype": "text/plain",
             "body": b"User-agent: *\r\nDisallow: /private/\r\n"},
            {"type": "response",
             "uri": "https://cdn.example.net/baeume-copy",
             "status": 200, "reason": "OK",
             "ctype": "text/html; charset=UTF-8", "body": html},
            {"type": "response", "uri": "https://example.org/tiny",
             "status": 200, "reason": "OK", "ctype": "text/plain",
             "body": b"too short"},
        ]
    trap = (
        b"log line one\r\n"
        b"WARC/1.1\r\n"  # a delimiter-scanning parser would break here
        b"WARC-Type: response\r\n"
        b"log line two\r\n"
    )
    return [
        {"type": "response", "uri": "https://example.org/trap.log",
         "status": 200, "reason": "OK", "ctype": "text/plain",
         "body": trap},
        {"type": "response", "uri": "https://example.org/moved",
         "status": 301, "reason": "Moved Permanently",
         "ctype": "text/html",
         "body": b"<html>see /new</html>"},
        {"type": "resource", "uri": "file:///etc/motd",
         "content": b"plain resource bytes, no HTTP framing\n"},
    ]


def _content_block(rec: dict) -> bytes:
    if "content" in rec:
        return rec["content"]
    hdrs = []
    if rec["ctype"] is not None:
        hdrs.append(("Content-Type", rec["ctype"]))
    hdrs.append(("Content-Length", str(len(rec["body"]))))
    return _http(rec["status"], rec["reason"], hdrs, rec["body"])


# declared extraction policy: response records whose media type is
# text/* or application/json yield UTF-8 text (errors replaced)
_TEXT_MIMES_PREFIX = "text/"
_TEXT_MIMES_EXACT = {"application/json"}


def _mime(rec: dict) -> str | None:
    ct = rec.get("ctype")
    if ct is None:
        return None
    return ct.split(";", 1)[0].strip().lower()


def assemble_record(file_id: int, idx: int, rec: dict) -> bytes:
    """Byte-level record assembly, independent of the parser. Header
    casing varies per index to pin case-insensitive parsing."""
    content = _content_block(rec)
    names = (
        ("WARC-Type", "WARC-Record-ID", "WARC-Date", "Content-Length",
         "WARC-Target-URI", "Content-Type")
        if idx % 2 == 0
        else ("warc-type", "warc-record-id", "warc-date",
              "content-length", "warc-target-uri", "content-type")
    )
    out = b"WARC/1.1\r\n"
    fields = [
        (names[0], rec["type"]),
        (names[1], _rec_id(file_id, idx)),
        (names[2], f"2025-06-0{file_id + 1}T12:00:{idx:02d}Z"),
        (names[3], str(len(content))),
    ]
    if "uri" in rec:
        fields.append((names[4], rec["uri"]))
    if rec["type"] == "response":
        fields.append((names[5], "application/http; msgtype=response"))
    for k, v in fields:
        out += f"{k}: {v}\r\n".encode()
    return out + b"\r\n" + content + b"\r\n\r\n"


# per-file compression layout: None = plain .warc; "member" = one
# gzip member PER RECORD (the Common Crawl shape); "whole" = one
# member overall
_LAYOUTS = {0: None, 1: "member", 2: "whole", 3: None, 4: "member"}


def file_name(file_id: int) -> str:
    ext = "warc" if _LAYOUTS[file_id] is None else "warc.gz"
    return f"crawl_{file_id:03d}.{ext}"


def generate_warcs() -> list:
    """One dict per file: name, assembled ``blob``, record defs."""
    out = []
    for file_id in sorted(_LAYOUTS):
        recs = _record_defs(file_id)
        raw = [
            assemble_record(file_id, i, r) for i, r in enumerate(recs)
        ]
        layout = _LAYOUTS[file_id]
        if layout is None:
            blob = b"".join(raw)
        elif layout == "member":
            blob = b"".join(
                gzip.compress(r, mtime=0) for r in raw
            )
        else:
            blob = gzip.compress(b"".join(raw), mtime=0)
        out.append(
            {
                "file_id": file_id,
                "name": file_name(file_id),
                "blob": blob,
                "records": recs,
            }
        )
    return out


def truth_rows(wf: dict) -> list:
    """Adjudicated rows straight from the record dicts — stdlib
    only, no parser."""
    rows = []
    for idx, rec in enumerate(wf["records"]):
        content = _content_block(rec)
        mime = _mime(rec) if rec["type"] == "response" else None
        body = rec.get("body")
        text = None
        if (
            rec["type"] == "response"
            and mime is not None
            and (
                mime.startswith(_TEXT_MIMES_PREFIX)
                or mime in _TEXT_MIMES_EXACT
            )
        ):
            text = body.decode("utf-8", "replace")
        rows.append(
            {
                "file_id": wf["file_id"],
                "rec_idx": idx,
                "rec_type": rec["type"],
                "rec_id": _rec_id(wf["file_id"], idx),
                "target_uri": rec.get("uri"),
                "http_status": (
                    rec["status"] if rec["type"] == "response" else None
                ),
                "mime": mime,
                "content_len": len(content),
                "content_sha": hashlib.sha256(content).hexdigest(),
                "text": text,
            }
        )
    return rows


# Candidate fetch URLs for the robots.txt compliance stage (q180) —
# probing THIS fixture's robots bodies (example.org and
# mirror.example.net both publish "Disallow: /private/"). Each
# candidate is one decisive case: the blocked subtree on both hosts
# (with host case-folding), the prefix boundary ("/private" without
# the trailing slash does NOT match "/private/"), an unrelated path,
# a rule-less subdomain, and an unknown host (RFC default: allowed).
ROBOTS_CANDIDATES = (
    "https://example.org/private/secret.html",
    "https://example.org/private",
    "https://example.org/publicpage",
    "https://MIRROR.example.net/private/x",
    "https://api.example.org/v1/items",
    "https://unknown.example/whatever",
)
