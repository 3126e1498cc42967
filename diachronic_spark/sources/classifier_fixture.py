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


def _build_eval() -> list[tuple[int, str, int]]:
    """Held-out EVAL split for q204's classifier evaluation. The
    training corpus is linearly separable by design (q194 converges
    to 48/48), so a decisive evaluation needs documents the model
    CANNOT all get right:

    - three easy pairs (pure prose / pure spam) — the sanity mass;
    - one IDENTICAL 50/50 mixture under BOTH labels — same text, same
      margin, so exactly one of the two is wrong at any threshold and
      the AUC rank-sum crosses a genuine tie (the 1/2 term);
    - two hard inversions — a spam-dominant page labeled prose and a
      prose-dominant page labeled spam — mislabeled-data reality that
      keeps accuracy and AUC strictly inside (0, 1).
    """
    ev: list[tuple[int, str, int]] = []
    eid = 100
    for d in range(3):
        ev.append((eid, _doc(_PROSE, 50 + d, 18 + d), 1))
        eid += 1
        ev.append((eid, _doc(_SPAM, 50 + d, 18 + d), 0))
        eid += 1
    half = _doc(_PROSE, 60, 12) + " " + _doc(_SPAM, 60, 12)
    ev.append((eid, half, 1))
    eid += 1
    ev.append((eid, half, 0))
    eid += 1
    ev.append((eid, _doc(_SPAM, 61, 20) + " " + _doc(_PROSE, 61, 6), 1))
    eid += 1
    ev.append((eid, _doc(_PROSE, 62, 20) + " " + _doc(_SPAM, 62, 6), 0))
    return ev


EVAL_DOCS: list[tuple[int, str, int]] = _build_eval()
