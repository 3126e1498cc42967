"""Real BPE tokenizer tests (operators/bpe.py, sources/bpe_fixture.py,
q172 — VERDICT r8 item 1).

Anchors: (1) lossless decode — concatenating encode_word output is
the identity on arbitrary words (hypothesis); (2) train/apply
consistency — greedy lowest-rank/leftmost apply reproduces the
training-time segmentation, i.e. encode == replaying the merges in
rank order; (3) the committed merge table is regenerable
byte-equally from the pinned corpus; (4) the Spark operators match
the pure-Python reference row-for-row, docs with no pre-tokens
surface as (0, 0); (5) the q172 plan keeps Python vocabulary-sized:
the corpus-side join is a broadcast and no row-at-a-time UDF
appears.
"""

from __future__ import annotations

import os
import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from diachronic_spark.operators.bpe import (
    bpe_token_counts,
    encode_text,
    encode_word,
    train_bpe,
    train_merges,
)
from diachronic_spark.operators.text import RE_TOKEN
from diachronic_spark.sources.bpe_fixture import (
    MERGES_PATH,
    TRAIN_SF_DIR,
    generate_merges,
    load_merges,
)

WORDS = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
    min_size=1,
    max_size=12,
)


def _replay_in_rank_order(word: str, merges) -> list[str]:
    """Training-time segmentation: apply each merge, in order, to
    every occurrence left-to-right (the Sennrich trainer's own
    update rule)."""
    syms = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


@settings(max_examples=200, deadline=None)
@given(st.lists(WORDS, min_size=1, max_size=20), st.integers(2, 40))
def test_encode_is_lossless_and_matches_rank_order_replay(ws, n):
    freqs = {}
    for w in ws:
        freqs[w] = freqs.get(w, 0) + 1
    merges = train_merges(freqs, n)
    ranks = {m: i for i, m in enumerate(merges)}
    for w in ws:
        toks = encode_word(w, ranks)
        assert "".join(toks) == w
        assert toks == _replay_in_rank_order(w, merges)


def test_trainer_is_deterministic_and_tiebreaks_lexicographically():
    # 'ab' and 'cd' tie at freq 2: ('a','b') < ('c','d') must win first
    merges = train_merges({"ab": 2, "cd": 2}, 2)
    assert merges == [("a", "b"), ("c", "d")]
    # exhausted pair space stops early instead of padding
    assert train_merges({"xy": 1}, 10) == [("x", "y")]


@pytest.mark.skipif(
    not os.path.isdir(TRAIN_SF_DIR), reason="testdata not present"
)
def test_committed_merges_are_regenerable():
    committed = load_merges()
    assert committed == generate_merges()
    assert os.path.isfile(MERGES_PATH)
    assert len(committed) == 48


def test_spark_counts_match_pure_python(spark):
    rows = [
        (0, "the quick fox 12 jumps, the fox!"),
        (1, ""),
        (2, "aaa bbb aaa"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    merges = train_merges({"the": 3, "fox": 2, "aaa": 2, "quick": 1}, 8)
    ranks = {m: i for i, m in enumerate(merges)}
    pat = re.compile(RE_TOKEN)

    got = {
        r.doc_id: (r.n_pretoks, r.n_tokens)
        for r in bpe_token_counts(df, merges).collect()
    }
    want = {}
    for doc_id, text in rows:
        pts = pat.findall(text)
        want[doc_id] = (
            len(pts),
            sum(len(encode_word(w, ranks)) for w in pts),
        )
    assert got == want
    assert got[1] == (0, 0)  # empty doc surfaces, not drops

    toks = {
        r.doc_id: r.tokens for r in encode_text(df, merges).collect()
    }
    for doc_id, text in rows:
        flat = [
            t for w in pat.findall(text) for t in encode_word(w, ranks)
        ]
        assert toks[doc_id] == flat


def test_distributed_training_matches_driver_reference(spark):
    texts = [
        "lower lowest low newer newest new",
        "wider widest wide lower lower",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id bigint, text string",
    )
    import collections

    wf = collections.Counter()
    pat = re.compile(RE_TOKEN)
    for t in texts:
        wf.update(pat.findall(t))
    assert train_bpe(df, n_merges=12) == train_merges(dict(wf), 12)


def test_q172_plan_broadcasts_vocab_and_has_no_row_udf(spark, sf_dir):
    from diachronic_spark.plans import QUERIES

    df = QUERIES["q172"](spark, sf_dir)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p  # encoded vocab joins broadcast
    assert "BatchEvalPython" not in p  # no row-at-a-time UDF
    assert "ArrowEvalPython" in p  # the vocab encode IS Arrow-batched


def test_q175_packs_conserve_real_token_budget(spark, sf_dir):
    """The BPE-budgeted packer conserves q172's token mass exactly
    and respects the 256 budget except for singleton oversize docs
    (the declared greedy contract)."""
    from pyspark.sql import functions as F

    from diachronic_spark.plans import QUERIES

    total_tokens = (
        QUERIES["q172"](spark, sf_dir)
        .agg(F.sum("n_tokens"))
        .collect()[0][0]
    )
    packs = QUERIES["q175"](spark, sf_dir).collect()
    assert sum(p.pack_tokens for p in packs) == total_tokens
    for p in packs:
        assert p.pack_tokens <= 256 or p.n_docs == 1
