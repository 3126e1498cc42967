"""Pure-stdlib WARC (ISO 28500 web-archive) record parser.

WARC is the container every web-scale LLM corpus starts from
(Common Crawl ships ~100 TB/month of it), which makes it the
missing FIRST stage of the repo's curation pipeline: everything
downstream (language ID, quality, dedup, packing — q18..q162)
consumes a documents table that in production is EXTRACTED from
WARC responses. This module is the record layer: ``parse_warc``
walks a .warc / .warc.gz payload (gzip multi-member per the spec's
record-at-a-time compression rule) into typed records;
``http_response`` splits a response record's HTTP message into
(status, headers, body) so the caller can apply its text-extraction
policy.

Malformed input fails LOUDLY with ``WarcError`` (the codec-family
contract): bad version lines, header lines without a colon, missing
mandatory headers (WARC-Type, WARC-Record-ID, Content-Length),
truncated content blocks, and missing record terminators all name
their offset. Content is sliced by Content-Length ONLY — bodies
containing literal ``WARC/1.1`` bytes must not confuse the walk
(fixture-pinned).

Reference parity: the reference pipeline (a wiki-XML ETL) has no
web-archive path; this is part of the LLM-data-pipeline extension
surface the brief mandates. Format per ISO 28500 / the IIPC WARC
1.1 specification (public).
"""

from __future__ import annotations

import gzip
import re
from typing import NamedTuple

# RFC 9110 field-name token chars (the WARC header grammar borrows
# HTTP's) — a name containing spaces means a mangled line, and
# partition-on-first-colon would otherwise quietly absorb it when the
# VALUE contains colons (timestamps, URIs).
_FIELD_NAME = re.compile(rb"^[!#$%&'*+.^_`|~0-9A-Za-z-]+$")


class WarcError(ValueError):
    """Loud rejection for malformed WARC input."""


class WarcRecord(NamedTuple):
    rec_type: str       # response / request / warcinfo / metadata / ...
    headers: dict       # lower-cased header name -> value
    content: bytes      # the raw content block (Content-Length bytes)


_GZIP_MAGIC = b"\x1f\x8b"


def _readline(blob: bytes, pos: int) -> tuple[bytes, int]:
    end = blob.find(b"\r\n", pos)
    if end < 0:
        raise WarcError(f"unterminated line at offset {pos}")
    return blob[pos:end], end + 2


def parse_warc(blob: bytes) -> list[WarcRecord]:
    """Parse a .warc or .warc.gz payload into its records.

    Gzip inputs may hold one member per record (the spec's
    record-at-a-time compression, what Common Crawl ships) or one
    member overall — both decompress to the same byte stream, and
    the walk is driven by Content-Length, never by member or
    delimiter scanning.
    """
    blob = bytes(blob)
    if blob[:2] == _GZIP_MAGIC:
        try:
            blob = gzip.decompress(blob)  # handles multi-member
        except OSError as e:
            raise WarcError(f"bad gzip stream: {e}") from None
    records: list[WarcRecord] = []
    pos, n = 0, len(blob)
    while pos < n:
        start = pos
        line, pos = _readline(blob, pos)
        if not line.startswith(b"WARC/"):
            raise WarcError(
                f"expected WARC version line at offset {start}, "
                f"got {line[:20]!r}"
            )
        headers: dict = {}
        while True:
            line, pos = _readline(blob, pos)
            if line == b"":
                break
            name, colon, value = line.partition(b":")
            if not colon or not _FIELD_NAME.match(name.strip()):
                raise WarcError(
                    f"malformed header line {line[:40]!r} near "
                    f"offset {pos}"
                )
            headers[name.strip().lower().decode("ascii")] = (
                value.strip().decode("utf-8", "replace")
            )
        for required in ("warc-type", "warc-record-id", "content-length"):
            if required not in headers:
                raise WarcError(
                    f"record at offset {start} lacks mandatory "
                    f"{required} header"
                )
        try:
            clen = int(headers["content-length"])
        except ValueError:
            raise WarcError(
                f"non-integer content-length "
                f"{headers['content-length']!r} at offset {start}"
            ) from None
        if clen < 0 or pos + clen > n:
            raise WarcError(
                f"content block at offset {pos} overruns the payload "
                f"({clen} bytes declared, {n - pos} available)"
            )
        content = blob[pos : pos + clen]
        pos += clen
        if blob[pos : pos + 4] != b"\r\n\r\n":
            raise WarcError(
                f"missing record terminator after offset {pos}"
            )
        pos += 4
        records.append(
            WarcRecord(headers["warc-type"], headers, content)
        )
    if not records:
        raise WarcError("payload contains no WARC records")
    return records


class HttpResponse(NamedTuple):
    status: int
    headers: dict       # lower-cased name -> value
    body: bytes


def http_response(content: bytes) -> HttpResponse:
    """Split a response record's HTTP message block. WARC stores the
    raw message, so this is a status line + headers + CRLFCRLF +
    body; no transfer-encoding applies (the capture is already
    de-chunked per spec)."""
    sep = content.find(b"\r\n\r\n")
    if sep < 0:
        raise WarcError("HTTP message lacks a header/body separator")
    head, body = content[:sep], content[sep + 4 :]
    lines = head.split(b"\r\n")
    parts = lines[0].split(b" ", 2)
    if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
        raise WarcError(f"bad HTTP status line {lines[0][:40]!r}")
    try:
        status = int(parts[1])
    except ValueError:
        raise WarcError(
            f"non-integer HTTP status {parts[1]!r}"
        ) from None
    headers: dict = {}
    for line in lines[1:]:
        name, colon, value = line.partition(b":")
        if not colon or not _FIELD_NAME.match(name.strip()):
            raise WarcError(f"malformed HTTP header {line[:40]!r}")
        headers[name.strip().lower().decode("ascii")] = (
            value.strip().decode("utf-8", "replace")
        )
    return HttpResponse(status, headers, body)


def mime_of(content_type: str | None) -> str | None:
    """The declared normalization for Content-Type: the media type
    alone, lower-cased, parameters stripped."""
    if content_type is None:
        return None
    return content_type.split(";", 1)[0].strip().lower() or None
