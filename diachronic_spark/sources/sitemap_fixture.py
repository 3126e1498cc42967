"""Deterministic sitemap.xml fixture (q181 — crawl DISCOVERY).

The stage BEFORE the frontier: sitemaps are how sites advertise
fetchable URLs (sitemaps.org protocol, referenced by RFC 9309's
Sitemap directive). The fixture covers the three deployed shapes:

- a plain ``urlset`` file with mixed optional fields (lastmod /
  priority present, partially present, absent),
- a GZIPPED urlset (``.xml.gz`` — the protocol's 50k-URL shards ship
  compressed; the Spark text-based XML source must decompress
  transparently),
- a ``sitemapindex`` file (children listed under <sitemap> tags —
  read with a different rowTag, contributing zero rows to the
  urlset read and vice versa).

Decisive content: locs needing canonicalization (scheme/host case,
trailing-slash run), an XML-escaped query (``&amp;`` must decode
before canonicalization sorts parameters), and a CROSS-FILE
duplicate canonical URL whose freshest lastmod must win.

Truth rows are the entry dicts BEFORE XML rendering, so the only
trusted link is dicts == bytes (the q163 regime).
"""

from __future__ import annotations

import gzip
import os

_HERE = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
SITEMAP_DIR = os.path.join(_HERE, "fixtures", "sitemap")
TRUTH_PATH = os.path.join(_HERE, "fixtures", "sitemap_truth.parquet")

_NS = "http://www.sitemaps.org/schemas/sitemap/0.9"

# (file, kind, entries); entry = (loc, lastmod, priority)
FILES = (
    (
        "sitemap_000.xml",
        "url",
        (
            ("HTTPS://Example.ORG/news/", "2025-06-01", 0.8),
            ("https://example.org/a//", "2025-05-15", None),
            ("https://example.org/search?b=2&a=1", "2025-04-01", 0.5),
            ("https://example.org/only-in-000", None, None),
            # the q182 crawl-chain capstone's decisive rows: one loc
            # the robots gate must block, one the frontier bloom must
            # recognize as already fetched (it IS a WARC response URI)
            ("https://example.org/private/archive.html", "2025-03-01",
             None),
            ("https://example.org/baeume", "2025-02-01", 0.3),
        ),
    ),
    (
        "sitemap_001.xml.gz",
        "url",
        (
            ("https://example.org/news", "2025-06-10", 0.9),
            ("https://example.org/fresh", "2025-06-05", None),
        ),
    ),
    (
        "sitemap_002_index.xml",
        "sitemap",
        (
            ("https://example.org/sitemap_000.xml", "2025-06-11", None),
            ("https://example.org/sitemap_001.xml.gz", "2025-06-12",
             None),
        ),
    ),
)


def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;")


def render(file_name: str, kind: str, entries) -> bytes:
    root = "urlset" if kind == "url" else "sitemapindex"
    out = [f'<?xml version="1.0" encoding="UTF-8"?>\n<{root} '
           f'xmlns="{_NS}">']
    for loc, lastmod, priority in entries:
        parts = [f"<{kind}>", f"<loc>{_esc(loc)}</loc>"]
        if lastmod is not None:
            parts.append(f"<lastmod>{lastmod}</lastmod>")
        if priority is not None:
            parts.append(f"<priority>{priority}</priority>")
        parts.append(f"</{kind}>")
        out.append("".join(parts))
    out.append(f"</{root}>\n")
    xml = "\n".join(out).encode("utf-8")
    return (
        gzip.compress(xml, mtime=0)
        if file_name.endswith(".gz")
        else xml
    )


def truth_rows() -> list[dict]:
    rows = []
    for fname, kind, entries in FILES:
        for loc, lastmod, priority in entries:
            rows.append(
                {"file": fname, "kind": kind, "loc": loc,
                 "lastmod": lastmod, "priority": priority}
            )
    return rows


def write_fixture() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(SITEMAP_DIR, exist_ok=True)
    for fname, kind, entries in FILES:
        with open(os.path.join(SITEMAP_DIR, fname), "wb") as f:
            f.write(render(fname, kind, entries))
    schema = pa.schema(
        [
            ("file", pa.string()),
            ("kind", pa.string()),
            ("loc", pa.string()),
            ("lastmod", pa.string()),
            ("priority", pa.float64()),
        ]
    )
    pq.write_table(
        pa.Table.from_pylist(truth_rows(), schema=schema),
        TRUTH_PATH,
        compression="snappy",
    )
