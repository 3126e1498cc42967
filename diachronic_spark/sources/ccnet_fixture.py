"""In-memory corpus for paragraph-level corpus dedup (q191).

CCNet-style paragraph dedup (Wenzek et al. 2020 §3.1 — public
method) removes the boilerplate the web shares ACROSS pages (cookie
banners, subscribe footers, nav text) by hashing normalized
paragraphs corpus-wide and keeping only each paragraph's first
occurrence. The sf ``documents`` rows are single-paragraph word
soup, so a dedicated multi-paragraph corpus exists to make every
policy clause decisive — same regime as ``c4_fixture``: the shared
artifact is the DATA only; Spark runs ``operators.dedup
.paragraph_dedup`` and the oracle replays the policy in DuckDB
window/list functions.

Declared policy (mirrored verbatim by the oracle):
- paragraphs = split on ``\\n``;
- normalization = the house canonical form (lower, strip
  non-alphanumerics, collapse whitespace, trim) — case/punctuation
  variants of a paragraph hash identically;
- paragraphs whose normalized form is EMPTY are non-content and are
  dropped before dedup (they count in neither n_paras_in nor kept);
- keep-first = min (doc_id, position) over each normalized form,
  corpus-wide AND within a document;
- documents whose every paragraph is removed drop out entirely.

Decisive cases: the cookie banner appears in docs 0/2/4 (doc 0 wins
by doc_id even though its copy sits at a LATER position than doc
2's — ordering is (doc_id, pos), not pos); the subscribe footer's
case/punctuation variant in doc 3 dedups against doc 1; doc 2
repeats a paragraph within itself (first copy kept); doc 4 is all
boilerplate and vanishes; doc 5's whitespace-run variant collapses
onto doc 0's spaced paragraph; '***' normalizes to empty and is
non-content.
"""

from __future__ import annotations

_COOKIE = "Accept all cookies to continue reading this site."
_SUBSCRIBE = "Subscribe to our newsletter today!"

DOCS: list[tuple[int, str]] = [
    # 0: article with the cookie banner at pos 1 and a decorative
    # separator that normalizes to empty
    (0, "Glaciers carve valleys over thousands of years.\n"
        + _COOKIE + "\n"
        "***\n"
        "the   spaced    paragraph\n"
        "Moraines mark where the ice once paused."),
    # 1: newsletter page — subscribe footer's FIRST occurrence
    (1, "Our weekly digest covers open source data tools.\n"
        + _SUBSCRIBE),
    # 2: repeats the cookie banner (pos 0 — earlier position than
    # doc 0's copy, but doc 0 wins on doc_id) and repeats its own
    # closing paragraph within the page
    (2, _COOKIE + "\n"
        "Thanks for reading, see you next week.\n"
        "Thanks for reading, see you next week."),
    # 3: subscribe footer as a case/punctuation variant — same
    # normalized form as doc 1's, so it dedups away
    (3, "SUBSCRIBE to our newsletter — today\n"
        "Archive pages list every issue since 2019."),
    # 4: all boilerplate — the whole document drops out
    (4, _COOKIE + "\n" + _SUBSCRIBE),
    # 5: whitespace-run variant of doc 0's spaced paragraph plus a
    # unique survivor
    (5, "the spaced paragraph\n"
        "Trail conditions are updated every morning."),
]
