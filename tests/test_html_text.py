"""HTML → text extraction tests (functions/html_text.py).

Anchors: (1) the committed fixtures extract BIT-EXACTLY to the
policy replay over the pre-render block structure; (2) tag soup is
handled leniently by contract (unclosed <p>, stray closes never
raise); (3) dropped containers and comments leak nothing; (4)
EXTERNAL validation — host /usr/share/doc manuals extract tag-free
with known phrases."""

from __future__ import annotations

import os

import pytest

from diachronic_spark.functions.html_text import html_to_text
from diachronic_spark.sources.html_fixture import (
    HTML_DIR,
    TRUTH_PATH,
    generate_htmls,
    truth_row,
)


def test_fixture_set_extracts_bit_exact_vs_policy_replay():
    for d in generate_htmls():
        assert html_to_text(d["html"]) == truth_row(d)["text"], (
            f"page {d['page_id']} diverged"
        )


def test_committed_html_fixtures_are_regenerable():
    import pyarrow.parquet as pq

    docs = generate_htmls()
    assert len(docs) == 6
    for d in docs:
        path = os.path.join(HTML_DIR, f"page_{d['page_id']:03d}.html")
        with open(path, encoding="utf-8") as f:
            assert f.read() == d["html"], f"fixture drift: {path}"
    stored = {
        r["page_id"]: r for r in pq.read_table(TRUTH_PATH).to_pylist()
    }
    for d in docs:
        assert truth_row(d) == stored[d["page_id"]]


def test_dropped_containers_and_comments_leak_nothing():
    for d in generate_htmls():
        text = html_to_text(d["html"])
        for decoy in ("decoy", "not text", "nope", "js disabled",
                      "fake", "color: red"):
            assert decoy not in text, (
                f"page {d['page_id']} leaked {decoy!r}"
            )
        # no markup remnants (a bare '<' from &lt; is legitimate text)
        for frag in ("</", "<p", "<div", "<span", "<!--"):
            assert frag not in text


def test_tag_soup_is_lenient():
    # pathological inputs must never raise
    for soup in (
        "<p>a<p>b</div></div><b>c",
        "<html><body><table><tr><td>x",
        "plain text, no tags at all",
        "<script>unclosed",
        "",
        "<p>&unknownentity; &amp</p>",
    ):
        html_to_text(soup)
    assert html_to_text("<p>a<p>b") == "a\nb"
    assert html_to_text("<div>x<br>y</div>") == "x\ny"
    assert html_to_text("A &auml; &#228; &#xE4; B") == "A ä ä ä B"


def test_host_manuals_extract_tag_free():
    cases = {
        "/usr/share/doc/bzip2/manual.html": "bzip2",
        "/usr/share/doc/fontconfig/fontconfig-user.html": "fontconfig",
    }
    found = False
    for path, needle in cases.items():
        if not os.path.exists(path):
            continue
        found = True
        with open(path, encoding="utf-8", errors="replace") as f:
            text = html_to_text(f.read())
        assert needle in text
        assert len(text) > 1000
        assert "<script" not in text and "<style" not in text
    if not found:
        pytest.skip("no host HTML manuals present")
