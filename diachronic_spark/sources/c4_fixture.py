"""In-memory prose corpus for the C4 cleanup rules (q174).

The sf* ``documents`` table is punctuation-free word soup and the
WARC/HTML fixture bodies are robots/JSON/markup fragments, so none
of them make the C4 page heuristics decisive (everything would
drop). This corpus exists to make every rule load-bearing — each
doc is a targeted case for exactly one clause.

Single-sourced DATA, independent ALGORITHMS: the Spark query builds
a DataFrame from ``DOCS`` and runs ``operators.text.c4_clean``
(Column expressions); the oracle formats the same rows into a SQL
VALUES literal and replays the rules in DuckDB string/list
functions. The shared artifact is the corpus only — exactly the
q172/q21 committed-fixture regime, minus the parquet indirection
(S12 in-memory source).
"""

from __future__ import annotations

DOCS: list[tuple[int, str]] = [
    # 0: survivor — 3 good lines (>=5 words, terminal punct), one
    # line without terminal punct, one 4-word line with punct
    (0, "The quick brown fox jumps over fences.\n"
        "a header without punctuation\n"
        "Too few words here.\n"
        "Every good sentence ends with punctuation!\n"
        "Does a question also count as terminal?"),
    # 1: dropped — "lorem ipsum" page filter (case-insensitive),
    # despite three otherwise-kept lines
    (1, "Lorem Ipsum dolor sit amet, consectetur adipiscing elit.\n"
        "This line would otherwise be kept here.\n"
        "And this third one would be kept too."),
    # 2: dropped — curly-brace page filter (code page)
    (2, "This page explains the function below in detail.\n"
        "function f() { return 42; }\n"
        "The brace rule drops the whole page anyway.\n"
        "Three sentences would otherwise be plenty here."),
    # 3: dropped — only 2 sentences survive the line rules
    (3, "Exactly five words end here.\n"
        "no terminal punctuation on this line\n"
        "A second full sentence survives the cut."),
    # 4: survivor — quote-terminated line counts, and one kept line
    # carries TWO sentences (sentence count is per-run, not per-line)
    (4, "She said the release was \"finally ready for everyone.\"\n"
        "It shipped on time. Nobody quite believed it.\n"
        "short line\n"
        "The retrospective praised the whole team warmly."),
    # 5: dropped — empty page
    (5, ""),
    # 6: dropped — lines pass individually but only two sentence
    # runs remain after the ellipsis collapses into one run
    (6, "The project dragged on and on and on...\n"
        "Still it never really ended anywhere."),
    # 7: survivor — exactly three sentences, boundary of the rule
    (7, "One clean sentence sits right here.\n"
        "Another clean sentence follows it closely.\n"
        "A third one seals the page's fate."),
]
