"""Property-based dedup invariants (SURVEY §5.2 item 3 applied to L2):

1. jaccard_for_pairs computes EXACT set Jaccard — cross-checked against
   a pure-Python computation of the same shingle sets;
2. minhash-LSH candidates always include every pair whose true Jaccard
   clears the banding's design threshold on these sizes (the fixture
   uses near-identical dup pairs at J ~ 0.97, where a 4x2 banding's
   miss probability is ~1e-5 — practically never within a test run).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from diachronic_spark.operators import dedup as D

_WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]

_DOC = st.lists(st.sampled_from(_WORDS), min_size=4, max_size=12).map(
    " ".join
)
_CORPUS = st.lists(_DOC, min_size=2, max_size=6)


def _pyshingles(text: str, n: int = 3) -> set[str]:
    toks = [t for t in text.split() if t]
    if len(toks) < n:
        return {" ".join(toks[:n])} if toks else set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_CORPUS)
def test_jaccard_matches_pure_python(spark, texts):
    corpus = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    arrs = D.shingle_arrays(corpus)
    n = len(texts)
    pairs = spark.createDataFrame(
        [(a, b) for a in range(n) for b in range(a + 1, n)],
        "doc_a long, doc_b long",
    )
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in D.jaccard_for_pairs(pairs, arrs).collect()
    }
    for a in range(n):
        for b in range(a + 1, n):
            sa, sb = _pyshingles(texts[a]), _pyshingles(texts[b])
            want = len(sa & sb) / len(sa | sb)
            assert abs(got[(a, b)] - want) < 1e-9, (a, b)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(_DOC, min_size=1, max_size=3))
def test_lsh_finds_exact_duplicates(spark, texts):
    """An identical copy shares the full signature, so it collides in
    EVERY band — exact dups can never be missed by banding."""
    rows = [(i, t) for i, t in enumerate(texts)]
    rows += [(100 + i, t) for i, t in enumerate(texts)]  # exact copies
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    arrs = D.shingle_arrays(corpus)
    cand = {
        (r.doc_a, r.doc_b)
        for r in D.lsh_candidate_pairs(D.minhash_signature(arrs)).collect()
    }
    for i in range(len(texts)):
        assert (i, 100 + i) in cand
