"""Deterministic HTML text-extraction fixture.

Six documents covering the extractor's axes: dropped containers
(head/title/style/script/noscript with decoy text and tags inside
JS strings), HTML comments carrying fake markup, block-boundary
tags (p/div/li/table rows/headings/br/hr), transparent inline tags
(b/i/a/span, nested), character and entity references (named,
decimal, hex), tag soup (unclosed <p>, stray </div>), attribute
noise, and whitespace runs the policy must collapse.

Independence structure: each document is DEFINED as structured
blocks of inline items first; the truth text replays the DECLARED
policy over that structure with plain string ops (entities come
from the fixture's own table, never ``html.unescape``), while the
assembler renders the SAME structure into noisy HTML the parser
must fight through.
"""

from __future__ import annotations

import os

_HERE = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
HTML_DIR = os.path.join(_HERE, "fixtures", "html")
TRUTH_PATH = os.path.join(_HERE, "fixtures", "html_truth.parquet")

# entity name -> (html reference, decoded char); the truth uses the
# char column, the renderer the reference column
_ENTS = {
    "auml": ("&auml;", "ä"),
    "amp": ("&amp;", "&"),
    "lt": ("&lt;", "<"),
    "eacute_dec": ("&#233;", "é"),
    "snow_hex": ("&#x2603;", "☃"),
}

# inline item: plain str | ("ent", key) | (inline_tag, [items])
# block: ("tag", [inline items]) — tag only flavors the rendering
_DOCS = [
    [
        ("h1", ["Überschrift ", ("ent", "auml"), " eins"]),
        ("p", ["Erster Absatz mit ", ("b", ["fettem"]), " Text."]),
        ("p", ["Zweiter: 1 ", ("ent", "lt"), " 2 ", ("ent", "amp"),
               " caf", ("ent", "eacute_dec"), "."]),
    ],
    [
        ("p", ["tag soup: unclosed paragraphs"]),
        ("p", ["second without closing"]),
        ("li", ["list item ", ("i", [("span", ["nested inline"])])]),
        ("p", ["after stray close"]),
    ],
    [
        ("h2", ["Tabelle"]),
        ("tr", ["Zelle A Zelle B"]),
        ("tr", ["Zelle C Zelle D"]),
    ],
    [
        ("p", ["whitespace   runs\tand", ("br", None), "a break"]),
        ("pre", ["pre block line"]),
    ],
    [
        ("p", ["unicode: ", ("ent", "snow_hex"), " schneemann"]),
        ("p", ["links: ", ("a", ["anchor text"]), " done"]),
    ],
    [
        ("h3", ["last doc"]),
        ("p", ["the only visible sentence."]),
    ],
]


def _inline_text(item) -> str:
    if isinstance(item, str):
        return item
    if item[0] == "ent":
        return _ENTS[item[1]][1]
    if item[0] == "br":
        return "\n"
    return "".join(_inline_text(i) for i in item[1])


def _inline_html(item) -> str:
    if isinstance(item, str):
        return item
    if item[0] == "ent":
        return _ENTS[item[1]][0]
    if item[0] == "br":
        return "<br/>"
    tag = item[0]
    attrs = {
        "a": ' href="https://example.org/x" rel="nofollow"',
        "span": ' class="x y" data-z="1"',
    }.get(tag, "")
    inner = "".join(_inline_html(i) for i in item[1])
    return f"<{tag}{attrs}>{inner}</{tag}>"


def doc_truth(blocks: list) -> str:
    """The declared policy over the structure: per block, concat
    inline text, collapse space runs, strip; non-empty blocks join
    with one newline. (A br inside a block contributes its own
    boundary line split.)"""
    import re

    lines: list = []
    for _tag, items in blocks:
        raw = "".join(_inline_text(i) for i in items)
        for part in raw.split("\n"):
            part = re.sub(r"[ \t]+", " ", part).strip()
            if part:
                lines.append(part)
    return "\n".join(lines)


def doc_html(doc_id: int, blocks: list) -> str:
    """Noisy rendering of the same structure."""
    out = [
        "<!DOCTYPE html>",
        f'<html lang="de"><head><title>decoy title {doc_id}</title>',
        "<style>p { color: red; } /* <p>fake</p> */</style>",
        '<script type="text/javascript">var s = "<p>not text</p>";'
        " if (1 < 2) { s += '</div>'; }</script>",
        "</head><body>",
        f"<!-- comment decoy <h1>nope {doc_id}</h1> -->",
    ]
    soup = doc_id == 1
    for i, (tag, items) in enumerate(blocks):
        inner = "".join(_inline_html(it) for it in items)
        attrs = f' id="b{i}" class="blk"' if i % 2 == 0 else ""
        if soup and tag == "p":
            out.append(f"<p{attrs}>{inner}")  # unclosed: tag soup
        elif tag == "tr":
            out.append(f"<tr{attrs}><td>{inner}</td></tr>")
        else:
            out.append(f"<{tag}{attrs}>{inner}</{tag}>")
        if soup and i == 2:
            out.append("</div>")  # stray close
    out.append("<noscript>js disabled decoy</noscript>")
    out.append("</body></html>")
    return "\n".join(out)


def generate_htmls() -> list:
    return [
        {
            "page_id": i,
            "html": doc_html(i, blocks),
            "blocks": blocks,
        }
        for i, blocks in enumerate(_DOCS)
    ]


def truth_row(d: dict) -> dict:
    text = doc_truth(d["blocks"])
    return {
        "page_id": d["page_id"],
        "text": text,
        "n_chars": len(text),
    }
