"""Two-class corpus for quality-classifier training (q194).

The real use of a hashed linear classifier in corpus curation is
prose-vs-boilerplate/spam gating (C4 and the LLaMA data pipeline
both describe fasttext-style quality filters — public precedents).
The sf ``documents`` table cannot host that query decisively: its
entire corpus shares ONE 31-word vocabulary across every lang/source
value, so no label over it is honestly learnable (measured: logistic
regression plateaus at the majority rate). This corpus has two
genuinely different word distributions plus two deliberately
ambiguous mixed documents per class, so the trained model has to
earn its accuracy and the final decision boundary is non-trivial.

Deterministic construction (no RNG): word ``i`` of document ``d`` is
``vocab[(7*d + 13*i) % len(vocab)]`` — a fixed affine walk with the
stride coprime to the vocab size, so each document cycles the class
vocabulary evenly and documents differ by phase and length. The
DOCS list is the single shared artifact: Spark builds a DataFrame
from it, the oracle formats the same rows into a VALUES literal
(the c4_fixture/ccnet_fixture regime).
"""

from __future__ import annotations

_PROSE = (
    "the river carries sediment through quiet valleys and seasons "
    "shape its banks while herons wade near shallow bends watching "
    "fish drift past smooth stones under morning light"
).split()

_SPAM = (
    "buy cheap deals now click here free bonus win big money casino "
    "offer limited prize claim instant credit unlock exclusive"
).split()


def _doc(vocab: list[str], d: int, n: int) -> str:
    v = len(vocab)
    return " ".join(vocab[(7 * d + 13 * i) % v] for i in range(n))


def _build() -> list[tuple[int, str, int]]:
    docs: list[tuple[int, str, int]] = []
    doc_id = 0
    for d in range(22):
        docs.append((doc_id, _doc(_PROSE, d, 20 + d), 1))
        doc_id += 1
        docs.append((doc_id, _doc(_SPAM, d, 20 + d), 0))
        doc_id += 1
    # ambiguous tail: prose pages with a spammy footer, and spam
    # pages padding themselves with stolen prose — the boundary cases
    # a real quality filter faces
    for d in range(2):
        docs.append(
            (doc_id, _doc(_PROSE, d + 30, 24) + " " + _doc(_SPAM, d, 8), 1)
        )
        doc_id += 1
        docs.append(
            (doc_id, _doc(_SPAM, d + 30, 24) + " " + _doc(_PROSE, d, 8), 0)
        )
        doc_id += 1
    return docs


DOCS: list[tuple[int, str, int]] = _build()
