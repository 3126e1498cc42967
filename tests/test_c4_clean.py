"""C4 rule-based cleanup tests (operators/text.py::c4_clean, q174).

Anchors: (1) each rule is decisive on its targeted corpus doc —
line punct/word filters, brace and lorem-ipsum page drops, the
3-sentence minimum at its boundary; (2) the operator is a pure
projection+filter — the q174 plan contains NO exchange and no
Python evaluator.
"""

from __future__ import annotations

from diachronic_spark.operators.text import c4_clean
from diachronic_spark.sources.c4_fixture import DOCS


def test_each_rule_is_decisive(spark):
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    out = {r.doc_id: r for r in c4_clean(df).collect()}

    assert sorted(out) == [0, 4, 7]

    d0 = out[0]
    # header (no punct) and 4-word line dropped, 3 of 5 lines kept
    assert (d0.n_lines_in, d0.n_lines_kept) == (5, 3)
    assert "a header without punctuation" not in d0.clean_text
    assert "Too few words here." not in d0.clean_text
    assert d0.n_sentences == 3

    d4 = out[4]
    # quote-terminated line kept; one kept line carries two sentence
    # runs, so sentences > lines kept
    assert d4.n_lines_kept == 3
    assert d4.n_sentences == 4
    assert 'ready for everyone."' in d4.clean_text
    assert "short line" not in d4.clean_text

    # doc 7 survives at exactly the 3-sentence boundary
    assert out[7].n_sentences == 3

    # dropped pages: lorem ipsum (1), braces (2), 2 sentences after
    # line rules (3), empty (5), ellipsis collapses to one run (6)
    for gone in (1, 2, 3, 5, 6):
        assert gone not in out


def test_q174_plan_is_shuffle_free_and_jvm_only(spark, sf_dir):
    from diachronic_spark.plans import QUERIES

    df = QUERIES["q174"](spark, sf_dir)
    p = df._jdf.queryExecution().executedPlan().toString()
    # the ONLY exchange is the final ordered-output range partition;
    # the rules themselves never shuffle (no hash partitioning)
    assert "hashpartitioning" not in p
    assert "EvalPython" not in p


def test_q178_capstone_composes_all_three_stages(spark, sf_dir):
    """C4 -> real BPE -> packing: survivors only (dropped pages carry
    no tokens into packing), token mass conserved, and the greedy
    JOIN rule provably fires (one pack holds two docs)."""
    from diachronic_spark.plans import QUERIES

    packs = QUERIES["q178"](spark, sf_dir).collect()
    packed_docs = sum(p.n_docs for p in packs)
    assert packed_docs == 3  # exactly the C4 survivors (0, 4, 7)
    assert any(p.n_docs >= 2 for p in packs)  # join rule exercised
    assert all(p.pack_tokens <= 256 or p.n_docs == 1 for p in packs)
