"""HTML → text extraction (the Common Crawl "WET" step).

The q163 WARC scan surfaces ``text/html`` response bodies RAW; this
module is the step that turns them into the documents-table text
every downstream operator (language ID, quality, dedup, packing)
actually consumes. Built on stdlib ``html.parser`` with a DECLARED,
replayable layout policy:

- content inside ``script``/``style``/``template``/``head``/
  ``noscript`` (and HTML comments) is dropped entirely;
- block-level boundaries (p, div, br, li, h1-h6, tr, table, ul, ol,
  dl, dt, dd, section, article, header, footer, nav, aside,
  blockquote, pre, hr, form, figure, figcaption) emit a newline;
- character and entity references decode (``&auml;`` → ä);
- whitespace normalizes: runs of spaces/tabs collapse to one space,
  runs of newlines collapse to one, lines are stripped, and the
  result is stripped at both ends.

This is a layout policy, not a renderer: it is the same class of
declared transform as q151's frame stride or q170's TJ kern rule —
the oracle replays it from pre-assembly structure, and divergence
between "what a browser shows" and this policy is out of scope by
construction. Malformed HTML never raises: the parser is the
stdlib's error-tolerant state machine, matching how crawl pipelines
must treat the wild's tag soup (the ONE family module whose input
contract is lenient — crawled HTML is broken by default, and a loud
parser would reject half the web).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_DROP = {"script", "style", "template", "head", "noscript"}
_BLOCK = {
    "p", "div", "br", "li", "h1", "h2", "h3", "h4", "h5", "h6",
    "tr", "table", "ul", "ol", "dl", "dt", "dd", "section",
    "article", "header", "footer", "nav", "aside", "blockquote",
    "pre", "hr", "form", "figure", "figcaption", "title", "body",
}


class _Extractor(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.parts: list = []
        self._drop = 0

    def handle_starttag(self, tag, attrs):
        if tag in _DROP:
            self._drop += 1
        elif tag in _BLOCK:
            self.parts.append("\n")

    def handle_endtag(self, tag):
        if tag in _DROP:
            if self._drop:
                self._drop -= 1
        elif tag in _BLOCK:
            self.parts.append("\n")

    def handle_startendtag(self, tag, attrs):
        if tag in _BLOCK:
            self.parts.append("\n")

    def handle_data(self, data):
        if not self._drop:
            self.parts.append(data)


def normalize_ws(s: str) -> str:
    """The declared whitespace policy: collapse space runs, strip
    each line, collapse newline runs, strip the ends."""
    s = re.sub(r"[ \t\r\f\v]+", " ", s)
    lines = [ln.strip() for ln in s.split("\n")]
    out = "\n".join(lines)
    out = re.sub(r"\n{2,}", "\n", out)
    return out.strip("\n").strip()


def html_to_text(html: str) -> str:
    """Extract visible text under the declared layout policy."""
    p = _Extractor()
    p.feed(html)
    p.close()
    return normalize_ws("".join(p.parts))
