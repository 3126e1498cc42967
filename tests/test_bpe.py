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


# --- BYTE-level BPE (VERDICT r9 item 1; q183/q178) ---------------------------

from diachronic_spark.operators.bpe import (  # noqa: E402
    RE_TOKEN_UNI,
    byte_repr,
    bytes_to_unicode,
    decode_tokens,
)
from diachronic_spark.sources.bpe_fixture import (  # noqa: E402
    BYTE_MERGES_PATH,
    MULTILINGUAL,
    N_BYTE_MERGES,
    generate_byte_merges,
    load_byte_merges,
)


def test_byte_unicode_table_is_the_public_gpt2_bijection():
    t = bytes_to_unicode()
    assert len(t) == 256 and len(set(t.values())) == 256  # bijective
    assert t[ord("a")] == "a" and t[ord("!")] == "!"  # printable id
    assert t[0x20] == "Ġ"  # space -> Ġ (the canonical example)
    assert t[0x0A] == "Ċ"  # newline -> Ċ
    assert all(len(c) == 1 for c in t.values())  # single-codepoint


@settings(max_examples=300, deadline=None)
@given(st.text(min_size=0, max_size=40))
def test_byte_level_roundtrips_arbitrary_unicode(s):
    """decode∘encode = id for ANY unicode input — the law char-level
    BPE cannot satisfy (its base vocab misses unseen chars; the
    256-symbol byte vocab never does). Exercised through the real
    committed merge table so trained merges are in the loop."""
    merges = load_byte_merges()
    ranks = {m: i for i, m in enumerate(merges)}
    assert decode_tokens(encode_word(byte_repr(s), ranks)) == s


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(min_size=1, max_size=8), min_size=1,
                max_size=12), st.integers(2, 30))
def test_byte_level_roundtrips_under_any_trained_table(ws, n):
    freqs = {}
    for w in ws:
        freqs[byte_repr(w)] = freqs.get(byte_repr(w), 0) + 1
    ranks = {m: i for i, m in enumerate(train_merges(freqs, n))}
    for w in ws:
        assert decode_tokens(encode_word(byte_repr(w), ranks)) == w


@pytest.mark.skipif(
    not os.path.isdir(TRAIN_SF_DIR), reason="testdata not present"
)
def test_committed_byte_merges_are_regenerable():
    committed = load_byte_merges()
    assert committed == generate_byte_merges()
    assert os.path.isfile(BYTE_MERGES_PATH)
    assert len(committed) == N_BYTE_MERGES


def test_committed_byte_merges_span_multibyte_utf8():
    """The table must contain merges over NON-identity byte symbols
    (2-byte Latin/Greek/Cyrillic, 3-byte CJK) — the property that
    makes it byte-level in substance, not just in mechanism — and a
    merge that crosses a multi-byte char boundary ('af'+'Ã©' spans
    c-a-f-é)."""
    merges = load_byte_merges()
    multibyte = [
        (a, b) for a, b in merges
        if any(ord(c) > 127 for c in a + b)
    ]
    assert len(multibyte) >= 10
    assert ("af", byte_repr("é")) in merges  # crosses the é boundary
    # a full CJK char assembled from its 3 bytes:
    assert any("".join(m) == byte_repr("本") for m in merges)


def test_unicode_pretokenizer_parity_spark_vs_duckdb(spark):
    """\\p{L}/\\p{N} classes must split identically under Java regex
    (Spark) and RE2 (DuckDB) — q183's corpus-side parity rests on
    it. Samples cover 2/3/4-byte UTF-8, unicode punctuation, and a
    non-Nd numeral (½)."""
    import duckdb

    from pyspark.sql import functions as F

    samples = [t for _, t in MULTILINGUAL] + [
        "Ελληνικά κείμενο· русский №5",
        "naïve café – cost €42,50 (½ price)",
        "emoji 🎉 mixed: abc123 x²",
    ]
    con = duckdb.connect()
    want = {
        s: con.execute(
            "SELECT regexp_extract_all(?, ?)", [s, RE_TOKEN_UNI]
        ).fetchone()[0]
        for s in samples
    }
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    rows = df.select(
        "s",
        F.regexp_extract_all(
            "s", F.lit(RE_TOKEN_UNI), F.lit(0)
        ).alias("t"),
    ).collect()
    for r in rows:
        assert r["t"] == want[r["s"]], r["s"]


def test_byte_level_spark_counts_match_pure_python(spark):
    rows = [
        (0, "café café crème"),
        (1, "日本語テキスト、テスト。"),
        (2, ""),
        (3, "plain ascii words only"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    merges = load_byte_merges()
    ranks = {m: i for i, m in enumerate(merges)}
    # Python 'regex-free' reference: reuse duckdb's RE2 for the
    # pre-tokens (stdlib re lacks \p{L}), then pure-Python encode.
    import duckdb

    con = duckdb.connect()

    def pretoks(text):
        return con.execute(
            "SELECT regexp_extract_all(?, ?)", [text, RE_TOKEN_UNI]
        ).fetchone()[0]

    got = {
        r.doc_id: (r.n_pretoks, r.n_tokens)
        for r in bpe_token_counts(
            df, merges, byte_level=True, pretoken_re=RE_TOKEN_UNI
        ).collect()
    }
    want = {}
    for doc_id, text in rows:
        pts = pretoks(text)
        want[doc_id] = (
            len(pts),
            sum(
                len(encode_word(byte_repr(w), ranks)) for w in pts
            ),
        )
    assert got == want
    assert got[2] == (0, 0)


def test_packed_shards_roundtrip_conserve_and_decode(spark, sf_dir):
    """q184's at-rest shards: token mass conservation (sum of shard
    pack_tokens == sum of per-doc byte-BPE counts over the same
    cleaned corpus), per-row len(tokens) == pack_tokens, the greedy
    budget law, and — the sink's own law — every shard row's token
    stream byte-DECODES cleanly back to unicode containing its
    source pre-tokens in order."""
    from pyspark.sql import functions as F

    from diachronic_spark.operators.text import c4_clean
    from diachronic_spark.plans import QUERIES
    from diachronic_spark.sources.c4_fixture import DOCS

    packs = QUERIES["q184"](spark, sf_dir).collect()
    docs = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    cleaned = c4_clean(docs).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    total = (
        bpe_token_counts(
            cleaned,
            load_byte_merges(),
            byte_level=True,
            pretoken_re=RE_TOKEN_UNI,
        )
        .agg(F.sum("n_tokens"))
        .collect()[0][0]
    )
    assert sum(p.pack_tokens for p in packs) == total
    for p in packs:
        toks = p.tokens_text.split("\n") if p.tokens_text else []
        assert len(toks) == p.pack_tokens
        assert p.pack_tokens <= 256 or p.n_docs == 1
        decoded = decode_tokens(toks)  # total: never raises
        assert decoded  # non-empty stream per pack


def test_packed_shards_plan_is_arrow_only_with_narrow_exchanges(
    spark,
):
    """The sink plan: no row-at-a-time Python, the vocab encode is
    Arrow-batched, and the assignment side never shuffles text — the
    only exchanges carry (w), (id, pos grouping), (bucket) fold and
    the final (bucket, pack_id) assembly."""
    from diachronic_spark.operators.bpe import build_packed_shards

    df = spark.createDataFrame(
        [(i, f"word{i} common text {i}") for i in range(20)],
        "doc_id bigint, text string",
    )
    packs = build_packed_shards(
        df, load_byte_merges(), bin_tokens=64, n_buckets=2,
        byte_level=True, pretoken_re=RE_TOKEN_UNI,
    )
    p = packs._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in p  # no row UDF anywhere
    assert "ArrowEvalPython" in p  # vocab encode is Arrow
    assert "CartesianProduct" not in p
    # the pack-assignment fold input is the narrow projection:
    # its FlatMapGroupsInPandas sees only (bucket, doc_id, n_tokens)
    assert "FlatMapGroupsInPandas" in p
    import re as _re

    fold_line = next(
        ln for ln in p.splitlines() if "FlatMapGroupsInPandas" in ln
    ).replace("n_tokens#", "")
    assert "text#" not in fold_line and "tokens#" not in fold_line
