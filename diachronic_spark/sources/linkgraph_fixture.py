"""Link-graph WARC fixture (q192): HTML pages whose anchors form a
small multi-host web, for the crawl-prioritization stage — extract
<a href> links from archived HTML, canonicalize, aggregate to a
host-level edge graph, PageRank it (how real crawl schedulers rank
frontier hosts; the public analog is Common Crawl's host-level
ranking work).

Container assembly reuses the adjudicated ``warc_fixture`` byte
assembler (plain + per-record-gzip layouts); truth rows are the
record dicts BEFORE assembly, so the only trusted link is
dicts == bytes, same as q163/q173.

Declared link-extraction policy (mirrored by the oracle):
- anchors only, both quote styles, any attribute order/case
  (``<a ... href="..."``, ``<A HREF='...'``), whitespace around =;
- resolution: absolute http(s) kept; protocol-relative ``//h/p``
  gets the page scheme; root-relative ``/p`` gets the page
  scheme+host; everything else (document-relative, mailto:,
  javascript:, fragment-only) is out of declared scope and dropped;
- both page URL and resolved targets go through the house
  ``canonical_url`` policy (case, default ports, fragments, query
  sort) before hosts are compared;
- only ``text/html`` responses are parsed — a text/plain body with
  anchor markup inside must contribute nothing;
- host self-loops are dropped at the edge stage (cross-host
  endorsement is the ranking signal).

Decisive cases: duplicate links accumulate weight (a→b twice,
b→c three times); ``HTTPS://D.example:443/page#frag`` needs case +
default-port + fragment canonicalization to land on d.example;
d.example has no outlinks (dangling-mass redistribution is
load-bearing); c's about page links d and itself (self-loop drop).
"""

from __future__ import annotations

import gzip
import os

from .warc_fixture import assemble_record

_HERE = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
LINKGRAPH_DIR = os.path.join(_HERE, "fixtures", "linkgraph")
TRUTH_PATH = os.path.join(_HERE, "fixtures", "linkgraph_truth.parquet")


def _resp(uri: str, body: str, ctype: str) -> dict:
    return {
        "type": "response", "uri": uri, "status": 200,
        "reason": "OK", "ctype": ctype,
        "body": body.encode("utf-8"),
    }


def _html(uri: str, body: str) -> dict:
    return _resp(uri, body, "text/html; charset=utf-8")


def _record_defs(file_id: int) -> list:
    if file_id == 0:
        return [
            _html(
                "https://a.example/",
                "<html><body>"
                '<a href="https://b.example/articles">B articles</a>'
                "<A HREF='//c.example/feed'>C feed</A>"
                '<a class="nav" href="/about">About</a>'
                '<a href="mailto:team@a.example">mail</a>'
                '<a href="#top">top</a>'
                '<a href="docs/guide.html">guide</a>'
                "</body></html>",
            ),
            _html(
                "https://a.example/blog",
                "<p>posts</p>"
                '<a href="https://b.example/articles">B again</a>'
                '<a href="HTTPS://D.example:443/page#frag">D</a>',
            ),
            _html(
                "https://b.example/articles",
                '<a href="https://c.example/feed">c</a>'
                '<a href = "https://a.example/">back to a</a>',
            ),
            # text/plain with anchor markup INSIDE — must contribute
            # nothing (only text/html is parsed)
            _resp(
                "https://c.example/feed",
                'plain feed <a href="https://a.example/">not a link</a>',
                "text/plain",
            ),
            {
                "type": "request",
                "uri": "https://a.example/",
                "content": b"GET / HTTP/1.1\r\nHost: a.example\r\n\r\n",
            },
            # robots policy for the q195 scheduler capstone (plain
            # text, NO anchors — q192/q193 must not see it): the `*`
            # group blocks /feed and slows the host down
            _resp(
                "https://c.example/robots.txt",
                "User-agent: *\nDisallow: /feed\nCrawl-delay: 5",
                "text/plain",
            ),
        ]
    return [
        _html(
            "https://c.example/about",
            '<a href="https://d.example/page">d</a>'
            '<a href="/feed">self feed</a>'
            '<a href="javascript:void(0)">js</a>',
        ),
        # dangling host: a page with no anchors at all
        _html("https://d.example/page", "<html>no links here</html>"),
        _html(
            "https://b.example/dup",
            '<a href="https://c.example/feed">c1</a>'
            "<a href='https://c.example/feed?y=2&x=1'>c2</a>",
        ),
        # a specific-UA group that must OVERRIDE the closed `*`
        # group for the capstone's crawler identity (rankbot)
        _resp(
            "https://d.example/robots.txt",
            "User-agent: rankbot\nDisallow: /private\nCrawl-delay: 2"
            "\n\nUser-agent: *\nDisallow: /",
            "text/plain",
        ),
    ]


# file 0 plain .warc; file 1 per-record gzip members (Common Crawl)
_LAYOUTS = {0: None, 1: "member"}


def file_name(file_id: int) -> str:
    ext = "warc" if _LAYOUTS[file_id] is None else "warc.gz"
    return f"linkgraph_{file_id:03d}.{ext}"


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
    """Pre-assembly truth: raw URI, declared mime, and the UTF-8
    body for every response (all bodies here are text)."""
    rows = []
    for idx, rec in enumerate(wf["recs"]):
        is_resp = rec["type"] == "response"
        rows.append(
            {
                "file_id": wf["file_id"],
                "rec_idx": idx,
                "rec_type": rec["type"],
                "raw_uri": rec.get("uri"),
                "mime": (
                    rec["ctype"].split(";")[0].strip().lower()
                    if is_resp
                    else None
                ),
                "text": (
                    rec["body"].decode("utf-8") if is_resp else None
                ),
            }
        )
    return rows


def write_fixture() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(LINKGRAPH_DIR, exist_ok=True)
    all_rows = []
    for wf in generate_warcs():
        with open(os.path.join(LINKGRAPH_DIR, wf["name"]), "wb") as f:
            f.write(wf["blob"])
        all_rows.extend(truth_rows(wf))
    schema = pa.schema(
        [
            ("file_id", pa.int64()),
            ("rec_idx", pa.int64()),
            ("rec_type", pa.string()),
            ("raw_uri", pa.string()),
            ("mime", pa.string()),
            ("text", pa.string()),
        ]
    )
    pq.write_table(
        pa.Table.from_pylist(all_rows, schema=schema),
        TRUTH_PATH,
        compression="snappy",
    )
