"""WARC parser + source tests (functions/warc.py, sources/files.py).

Anchors: (1) the committed fixtures parse BIT-EXACTLY to the
pre-assembly record-dict truth; (2) the boundary trap — a body
embedding a literal WARC version line — must not split a record
(Content-Length drives the walk, never delimiter scanning); (3)
malformed containers reject loudly with offsets; (4) both gzip
layouts (per-record member, whole-stream) decode identically; (5) a
hypothesis fuzz assembles random record sets and round-trips them.
"""

from __future__ import annotations

import gzip
import hashlib

import pytest

from diachronic_spark.functions.warc import (
    WarcError,
    http_response,
    mime_of,
    parse_warc,
)
from diachronic_spark.sources.warc_fixture import (
    TRUTH_PATH,
    WARCS_DIR,
    assemble_record,
    generate_warcs,
    truth_rows,
)


def test_fixture_set_parses_bit_exact_vs_truth():
    for wf in generate_warcs():
        recs = parse_warc(wf["blob"])
        truths = truth_rows(wf)
        assert len(recs) == len(truths)
        for rec, t in zip(recs, truths):
            assert rec.rec_type == t["rec_type"]
            assert rec.headers.get("warc-record-id") == t["rec_id"]
            assert rec.headers.get("warc-target-uri") == t["target_uri"]
            assert len(rec.content) == t["content_len"]
            assert (
                hashlib.sha256(rec.content).hexdigest()
                == t["content_sha"]
            )
            if rec.rec_type == "response":
                resp = http_response(rec.content)
                assert resp.status == t["http_status"]
                assert (
                    mime_of(resp.headers.get("content-type"))
                    == t["mime"]
                )


def test_committed_warc_fixtures_are_regenerable():
    import os

    import pyarrow.parquet as pq

    warcs = generate_warcs()
    assert len(warcs) == 5
    for wf in warcs:
        with open(os.path.join(WARCS_DIR, wf["name"]), "rb") as f:
            assert f.read() == wf["blob"], f"fixture drift: {wf['name']}"
    stored = sorted(
        pq.read_table(TRUTH_PATH).to_pylist(),
        key=lambda r: (r["file_id"], r["rec_idx"]),
    )
    fresh = sorted(
        (r for wf in warcs for r in truth_rows(wf)),
        key=lambda r: (r["file_id"], r["rec_idx"]),
    )
    assert fresh == stored


def test_boundary_trap_is_not_split():
    """crawl_003 carries a text body containing a literal
    'WARC/1.1\\r\\nWARC-Type: response\\r\\n' line — a
    delimiter-scanning parser would see 4+ records or desync."""
    wf = generate_warcs()[3]
    recs = parse_warc(wf["blob"])
    assert len(recs) == 3
    body = http_response(recs[0].content).body
    assert b"WARC/1.1\r\n" in body


def test_gzip_layouts_decode_identically():
    plain = generate_warcs()[0]
    raw = plain["blob"]
    member = b"".join(
        gzip.compress(assemble_record(0, i, r), mtime=0)
        for i, r in enumerate(plain["records"])
    )
    whole = gzip.compress(raw, mtime=0)
    assert parse_warc(member) == parse_warc(raw)
    assert parse_warc(whole) == parse_warc(raw)


def test_loud_rejections():
    wf = generate_warcs()[0]
    blob = wf["blob"]

    with pytest.raises(WarcError, match="version line"):
        parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")
    with pytest.raises(WarcError, match="no WARC records"):
        parse_warc(b"")
    with pytest.raises(WarcError, match="bad gzip"):
        parse_warc(b"\x1f\x8b\x00garbage")
    # truncated mid-content
    with pytest.raises(WarcError):
        parse_warc(blob[:-30])
    # missing terminator: drop the final CRLFCRLF
    with pytest.raises(WarcError, match="terminator"):
        parse_warc(blob[:-4])
    # header without a colon
    bad = blob.replace(b"WARC-Date:", b"WARC-Date ", 1)
    with pytest.raises(WarcError, match="malformed header"):
        parse_warc(bad)
    # missing mandatory header
    bad = blob.replace(b"Content-Length:", b"X-Ignore-Length:", 1)
    with pytest.raises(WarcError):
        parse_warc(bad)
    # non-HTTP response content
    with pytest.raises(WarcError, match="separator"):
        http_response(b"no http here")
    with pytest.raises(WarcError, match="status line"):
        http_response(b"NOPE 200 OK\r\n\r\nbody")


def test_mime_normalization():
    assert mime_of("Text/HTML; charset=UTF-8") == "text/html"
    assert mime_of("application/json") == "application/json"
    assert mime_of(None) is None
    assert mime_of("  ;charset=x") is None


def test_fuzz_assemble_parse_roundtrip():
    """Random record sets (types, optional URIs, arbitrary bodies
    including CRLF runs and embedded WARC lines, all three
    compression layouts) round-trip through the parser."""
    from hypothesis import given, settings, strategies as st

    body_bytes = st.binary(max_size=200).map(
        lambda b: b + b"\r\nWARC/1.1\r\n" if len(b) % 3 == 0 else b
    )
    rec = st.fixed_dictionaries(
        {
            "type": st.sampled_from(
                ["warcinfo", "request", "metadata", "resource"]
            ),
            "content": body_bytes,
        }
    ) | st.fixed_dictionaries(
        {
            "type": st.just("response"),
            "uri": st.just("https://example.org/x"),
            "status": st.sampled_from([200, 301, 404, 500]),
            "reason": st.just("R"),
            "ctype": st.sampled_from(
                [None, "text/plain", "application/json", "image/png"]
            ),
            "body": body_bytes,
        }
    )

    @settings(max_examples=60, deadline=None)
    @given(
        recs=st.lists(rec, min_size=1, max_size=5),
        layout=st.sampled_from([None, "member", "whole"]),
    )
    def check(recs, layout):
        raw = [assemble_record(7, i, r) for i, r in enumerate(recs)]
        if layout is None:
            blob = b"".join(raw)
        elif layout == "member":
            blob = b"".join(gzip.compress(r, mtime=0) for r in raw)
        else:
            blob = gzip.compress(b"".join(raw), mtime=0)
        parsed = parse_warc(blob)
        assert len(parsed) == len(recs)
        for p, r in zip(parsed, recs):
            assert p.rec_type == r["type"]
            if r["type"] == "response":
                resp = http_response(p.content)
                assert resp.status == r["status"]
                assert resp.body == r["body"]
            else:
                assert p.content == r["content"]

    check()


def test_capstone_stages_are_load_bearing(spark):
    """q165's gates each remove real rows: 10 text-bearing responses
    → quality floor drops 4 (404 page, 301 page, empty 204, 'too
    short') → exact dedup drops 2 (file 4's cross-file duplicate
    bodies) → 4 docs packed."""
    import pyspark.sql.functions as F

    from diachronic_spark.functions import whitespace_tokens
    from diachronic_spark.sources.files import read_warc

    recs = read_warc(spark, WARCS_DIR)
    docs = recs.filter(
        (F.col("rec_type") == "response") & F.col("text").isNotNull()
    )
    assert docs.count() == 10
    kept = docs.filter(F.size(whitespace_tokens(F.col("text"))) >= 4)
    assert kept.count() == 6
    assert kept.select("text").distinct().count() == 4
