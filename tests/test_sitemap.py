"""Sitemap discovery tests (q181; sources/sitemap_fixture.py).

Anchors: (1) rowTag routing — the urlset read contributes zero rows
from the index file and vice versa; (2) the gzipped shard and the
XML entity in the query string both decode before canonicalization;
(3) the cross-file duplicate keeps the freshest lastmod and counts
both sources; (4) the committed fixture regenerates byte-stably.
"""

from __future__ import annotations

import os

from diachronic_spark.sources.sitemap_fixture import (
    FILES,
    SITEMAP_DIR,
    TRUTH_PATH,
    render,
    truth_rows,
)


def test_q181_discovery_semantics(spark, sf_dir):
    from diachronic_spark.plans import QUERIES

    rows = {
        (r.kind, r.url): r
        for r in QUERIES["q181"](spark, sf_dir).collect()
    }
    # 7 distinct canonical urls + 2 index children
    assert len(rows) == 9
    assert sum(1 for k, _ in rows if k == "sitemap") == 2
    # the q182 capstone's decisive advertisements are present
    assert ("url", "https://example.org/private/archive.html") in rows
    assert ("url", "https://example.org/baeume") in rows

    news = rows[("url", "https://example.org/news")]
    assert news.n_sources == 2            # case/slash variants merged
    assert news.last_seen == "2025-06-10"  # freshest advertisement
    assert news.priority == 0.9

    # entity-decoded query string, params sorted
    assert ("url", "https://example.org/search?a=1&b=2") in rows
    # trailing-slash run collapsed
    assert ("url", "https://example.org/a") in rows
    # absent optional fields surface as NULLs, not drops
    only = rows[("url", "https://example.org/only-in-000")]
    assert only.last_seen is None and only.priority is None


def test_committed_sitemap_fixture_is_regenerable():
    import pyarrow.parquet as pq

    for fname, kind, entries in FILES:
        with open(os.path.join(SITEMAP_DIR, fname), "rb") as f:
            assert f.read() == render(fname, kind, entries)
    assert pq.read_table(TRUTH_PATH).to_pylist() == truth_rows()


def test_q182_crawl_chain_gates_are_each_decisive(spark, sf_dir):
    """discovery -> robots -> frontier: the robots-blocked loc and
    the already-fetched loc each fail exactly their own gate; all
    other advertisements are fetchable; fetch = allowed AND new."""
    from diachronic_spark.plans import QUERIES

    rows = {r.url: r for r in QUERIES["q182"](spark, sf_dir).collect()}
    assert len(rows) == 7

    blocked = rows["https://example.org/private/archive.html"]
    assert (blocked.allowed, blocked.already_fetched, blocked.fetch) \
        == (False, False, False)

    fetched = rows["https://example.org/baeume"]
    assert (fetched.allowed, fetched.already_fetched, fetched.fetch) \
        == (True, True, False)

    for u, r in rows.items():
        if u not in (blocked.url, fetched.url):
            assert r.fetch is True, u
        assert r.fetch == (r.allowed and not r.already_fetched)
