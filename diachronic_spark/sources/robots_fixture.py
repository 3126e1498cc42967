"""In-memory robots.txt corpus for q186 (RFC 9309 user-agent group
selection + Crawl-delay — VERDICT r9 item 4).

The WARC fixture's robots bodies are single-`*`-group (where the r9
positional scope and the RFC group semantics coincide); THESE bodies
make every new clause decisive:

- shop.example: a STACKED group (`*` + examplebot share
  ``Disallow: /shared/``) followed by an examplebot-ONLY group
  (``Disallow: /private/`` + ``Crawl-delay: 2``). For examplebot the
  chosen token is 'examplebot' and BOTH groups' rules combine
  (stacked membership + same-token combination, RFC 9309 §2.1 +
  §2.2.1) — /shared/ AND /private/ blocked, delay 2; a generic bot
  matches only `*` — /shared/ blocked, /private/ open, no delay.
- news.example: a `googlebot` group examplebot must NOT match plus a
  `*` fallback with an Allow/Disallow longest-match tie at
  /arch (Allow /archive/ vs Disallow /arch) and Crawl-delay: 7 —
  the `*` delay applies to BOTH crawlers.
- Sitemap/comment/blank lines sit INSIDE groups (they must not
  break UA runs or detach rules); field names vary case.
- wide.example: `example` (a PREFIX of examplebot) vs `*`:
  specificity = longest matching token, so examplebot obeys the
  'example' group.
- open.example has no robots at all — default allowed, NULL delay.

Shared DATA only: both engines read these rows (Spark via
createDataFrame, DuckDB via VALUES); the window/group/verdict logic
replays independently.
"""

from __future__ import annotations

ROBOTS_BODIES: list[tuple[str, str]] = [
    (
        "https://shop.example/robots.txt",
        "# storefront policy\n"
        "User-agent: *\n"
        "User-Agent: examplebot\n"
        "Disallow: /shared/\n"
        "\n"
        "Sitemap: https://shop.example/sitemap.xml\n"
        "user-agent: examplebot\n"
        "disallow: /private/\n"
        "Crawl-delay: 2\n",
    ),
    (
        "https://news.example/robots.txt",
        "User-agent: googlebot\n"
        "Disallow: /\n"
        "\n"
        "User-agent: *\n"
        "Allow: /archive/\n"
        "Disallow: /arch\n"
        "Crawl-Delay: 7\n",
    ),
    (
        "https://wide.example/robots.txt",
        "User-agent: example\n"
        "Disallow: /club/\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /\n",
    ),
]

ROBOTS_UA_CANDIDATES: tuple[str, ...] = (
    "https://shop.example/shared/cart",
    "https://shop.example/private/ledger",
    "https://shop.example/public/home",
    "https://news.example/archive/2024",
    "https://news.example/arch-old/x",
    "https://news.example/front",
    "https://wide.example/club/member",
    "https://wide.example/lobby",
    "https://open.example/anything",
)

CRAWLER_UAS: tuple[str, ...] = ("examplebot", "otherbot")

# Frontier rows for the q187 politeness scheduler: (url, priority).
# shop.example (examplebot delay 2) carries three allowed urls with
# a priority TIE at 0.8 (slot order must fall back to url asc) plus
# a NULL priority (sorts last); news.example exercises delay 7 and
# an excluded (disallowed) url that must not consume a slot;
# open.example has no robots — default delay 1.
FRONTIER: list[tuple[str, float | None]] = [
    ("https://shop.example/public/home", 0.8),
    ("https://shop.example/public/sale", 0.8),
    ("https://shop.example/public/new", 0.9),
    ("https://shop.example/public/faq", None),
    ("https://news.example/front", 0.7),
    ("https://news.example/archive/2024", 0.4),
    ("https://news.example/arch-old/x", 1.0),  # disallowed for all
    ("https://open.example/a", 0.5),
    ("https://open.example/b", 0.6),
]
