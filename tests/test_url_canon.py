"""URL canonicalization + canonical-URL dedup tests (q173;
functions.canonical_url, sources/warc_url_fixture.py).

Anchors: (1) every clause of the declared policy on targeted
vectors, including the must-NOT-collapse pairs; (2) keep-first
semantics — duplicate captures carry different bodies, so the kept
text pins min-(file, idx) selection rather than content dedup, and
the non-response record is excluded from multiplicity; (3) the
committed fixture is regenerable byte-stable.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from diachronic_spark.functions import canonical_url
from diachronic_spark.sources.warc_url_fixture import (
    TRUTH_PATH,
    WARC_URL_DIR,
    file_name,
    generate_warcs,
)

VECTORS = [
    ("https://Example.ORG:443/news/", "https://example.org/news"),
    ("HTTPS://example.org/news#top", "https://example.org/news"),
    ("http://example.org:80/", "http://example.org/"),
    ("http://example.org", "http://example.org/"),
    ("https://example.org/search?b=2&a=1",
     "https://example.org/search?a=1&b=2"),
    ("https://example.org:8080/page", "https://example.org:8080/page"),
    ("https://example.org/Page", "https://example.org/Page"),
    ("https://example.org/a/", "https://example.org/a"),
    ("https://example.org/a//", "https://example.org/a"),
    ("https://example.org//", "https://example.org/"),
    ("https://example.org/p?", "https://example.org/p"),
    ("file:///etc/motd", "file:///etc/motd"),
    ("not a url", None),
    ("https://example.org:443/x", "https://example.org/x"),
    ("http://example.org:443/x", "http://example.org:443/x"),
]


def test_policy_vectors(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(VECTORS)], "i int, url string"
    )
    got = {
        r.i: r.c
        for r in df.select(
            "i", canonical_url(F.col("url")).alias("c")
        ).collect()
    }
    for i, (u, want) in enumerate(VECTORS):
        assert got[i] == want, f"{u!r}: {got[i]!r} != {want!r}"


def test_q173_keeps_first_capture_and_multiplicity(spark, sf_dir):
    from diachronic_spark.plans import QUERIES

    rows = {
        r.canonical_url: r
        for r in QUERIES["q173"](spark, sf_dir).collect()
    }
    news = rows["https://example.org/news"]
    assert news.n_captures == 2
    assert news.kept_text == "first capture of the news page"
    assert (news.first_file, news.first_idx) == (0, 0)

    root = rows["http://example.org/"]
    assert root.n_captures == 2
    assert root.kept_text == "root page body"

    # the request record is excluded: /a counts its two responses only
    art = rows["https://example.org/a"]
    assert art.n_captures == 2
    assert art.kept_text == "article first capture"
    assert (art.first_file, art.first_idx) == (1, 3)

    # must-NOT-collapse pairs all survive as separate keys
    assert "https://example.org/Page" in rows
    assert "https://example.org/page" in rows
    assert "https://example.org:8080/page" in rows
    assert rows["https://example.org/search?a=1&b=2"].n_captures == 2


def test_committed_url_fixture_is_regenerable():
    import pyarrow.parquet as pq

    from diachronic_spark.sources.warc_url_fixture import truth_rows

    all_rows = []
    for wf in generate_warcs():
        with open(os.path.join(WARC_URL_DIR, file_name(wf["file_id"])),
                  "rb") as f:
            assert f.read() == wf["blob"]
        all_rows.extend(truth_rows(wf))
    committed = pq.read_table(TRUTH_PATH).to_pylist()
    assert committed == all_rows


def test_canonicalization_is_idempotent(spark):
    """One pass must be a fixpoint — re-canonicalizing any output
    (policy vectors + adversarial shapes) changes nothing."""
    import pyspark.sql.functions as F

    urls = [u for u, _ in VECTORS] + [
        "https://example.org/a///",
        "HTTP://A.B:80//x//?c=1&b=2&a=3#f",
        "https://h:443/?",
        "ftp://Host.Example//d/",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select(
        canonical_url(F.col("url")).alias("c1"),
        canonical_url(canonical_url(F.col("url"))).alias("c2"),
    ).collect()
    for r in rows:
        assert r.c1 == r.c2, f"{r.c1!r} -> {r.c2!r}"
