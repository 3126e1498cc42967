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


# --- 64-bit SimHash (production width; 32-bit is the oracle shape) --------

def _py_simhash(text: str, bits: int) -> int:
    """Executable spec mirroring operators/dedup.py::simhash."""
    import hashlib
    from collections import Counter

    votes = [0] * bits
    for tok, n in Counter(t for t in text.split() if t).items():
        h = int(hashlib.md5(tok.encode()).hexdigest()[: bits // 4], 16)
        for b in range(bits):
            votes[b] += n if (h >> b) & 1 else -n
    u = sum(1 << b for b in range(bits) if votes[b] > 0)
    return u - (1 << 64) if bits == 64 and u >= (1 << 63) else u


def test_simhash64_matches_python_replay(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumped over the lazy dog",
        "alpha beta gamma delta alpha beta",
        "completely different content here entirely",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["simhash"] for r in D.simhash(df, bits=64).collect()}
    want = {i: _py_simhash(t, 64) for i, t in enumerate(texts)}
    assert got == want
    got32 = {r["doc_id"]: r["simhash"] for r in D.simhash(df, bits=32).collect()}
    want32 = {i: _py_simhash(t, 32) for i, t in enumerate(texts)}
    assert got32 == want32


def test_simhash64_block_pairs_complete_vs_brute_force(spark):
    # near-dup clusters: single-word edits of shared templates
    base = "one two three four five six seven eight nine ten"
    texts = [base]
    for i, w in enumerate(base.split()):
        toks = base.split()
        toks[i] = w + "x"
        texts.append(" ".join(toks))
    texts += ["totally unrelated words entirely distinct tokens", base + " eleven"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    sims = D.simhash(df, bits=64)
    rows = {r["doc_id"]: r["simhash"] for r in sims.collect()}
    for d in (1, 3):
        got = {
            (r["doc_a"], r["doc_b"])
            for r in D.simhash_pairs(sims, max_hamming=d, bits=64).collect()
        }
        want = {
            (a, b)
            for a in rows
            for b in rows
            if a < b and bin((rows[a] ^ rows[b]) & ((1 << 64) - 1)).count("1") <= d
        }
        assert got == want, f"d={d}: {got ^ want}"


# --- connected components (duplicate-class clustering) --------------------

def test_connected_components_chain_cliques_singletons(spark):
    # chain 0-1-2-3-4 (worst diameter), clique {10,11,12}, singletons 20,21
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12)],
        "doc_a long, doc_b long",
    )
    nodes = spark.createDataFrame(
        [(i,) for i in [0, 1, 2, 3, 4, 10, 11, 12, 20, 21]], "doc_id long"
    )
    got = {
        r["doc_id"]: r["component"]
        for r in D.connected_components(edges, nodes).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 21}


def test_connected_components_reversed_chain_converges(spark):
    # labels must flow AGAINST edge direction too (undirected closure):
    # the min id sits at the chain's far end
    edges = spark.createDataFrame(
        [(4, 3), (3, 2), (2, 1), (1, 0)], "doc_a long, doc_b long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
    got = {
        r["doc_id"]: r["component"]
        for r in D.connected_components(edges, nodes).collect()
    }
    assert got == {i: 0 for i in range(5)}


def test_connected_components_local_equals_distributed(spark):
    from diachronic_spark.operators.dedup import (
        connected_components,
        connected_components_local,
    )

    # chain 1-2-3, clique 10-11-12, pair 20-21, singletons 30/31
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11), (11, 12), (10, 12), (21, 20)],
        "doc_a long, doc_b long",
    )
    nodes = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 10, 11, 12, 20, 21, 30, 31]],
        "doc_id long",
    )
    dist = sorted(map(tuple, connected_components(edges, nodes).collect()))
    loc = sorted(
        map(tuple, connected_components_local(edges, nodes).collect())
    )
    assert dist == loc
    comp = dict(loc)
    assert comp[3] == 1 and comp[12] == 10 and comp[21] == 20
    assert comp[30] == 30 and comp[31] == 31


def test_connected_components_auto_dispatch(spark, monkeypatch):
    """Small edge sets run union-find on the probe rows; an edge set
    past the threshold must route to the distributed min-label loop."""
    import diachronic_spark.operators.dedup as dedup_mod

    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11), (11, 12), (10, 12), (21, 20)],
        "doc_a long, doc_b long",
    )
    nodes = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 10, 11, 12, 20, 21, 30]], "doc_id long"
    )
    expected = sorted(
        map(tuple, dedup_mod.connected_components(edges, nodes).collect())
    )

    calls = []
    real_distributed = dedup_mod.connected_components

    def spy(e, n, max_iter=20):
        calls.append("distributed")
        return real_distributed(e, n, max_iter=max_iter)

    monkeypatch.setattr(dedup_mod, "connected_components", spy)

    # under threshold -> local union-find, distributed never invoked
    got = sorted(
        map(
            tuple,
            dedup_mod.connected_components_auto(
                edges, nodes, local_edge_threshold=100
            ).collect(),
        )
    )
    assert got == expected and calls == []

    # over threshold (6 edges > 3) -> must take the distributed loop
    got = sorted(
        map(
            tuple,
            dedup_mod.connected_components_auto(
                edges, nodes, local_edge_threshold=3
            ).collect(),
        )
    )
    assert got == expected and calls == ["distributed"]


def test_managed_persist_bounds_and_reuses(spark):
    """One live cache entry per site key: identical plans reuse the
    cached relation, different plans evict the stale one."""
    from diachronic_spark.operators._cache import _LIVE, managed_persist, release

    release()  # isolate from other tests
    a1 = managed_persist(spark.range(10).selectExpr("id * 2 AS v"), "t.x")
    a2 = managed_persist(spark.range(10).selectExpr("id * 2 AS v"), "t.x")
    assert a1 is a2  # same plan -> reused, not re-persisted
    b = managed_persist(spark.range(10).selectExpr("id * 3 AS v"), "t.x")
    assert b is not a1
    assert a1.storageLevel.useMemory is False  # evicted
    assert b.storageLevel.useMemory is True
    # keys are (application id, site) so a replaced session can't be
    # pinned by a stale site entry (ADVICE r2)
    assert [k[1] for k in _LIVE] == ["t.x"]
    assert all(k[0] == spark.sparkContext.applicationId for k in _LIVE)
    assert [r.v for r in b.orderBy("v").collect()] == [i * 3 for i in range(10)]
    release("t.x")
    assert not _LIVE


def test_index_append_back_idempotent(spark, tmp_path):
    """The ingest loop (write index -> probe -> append survivors ->
    re-probe) admits a batch exactly once: after its survivors are
    appended, a re-submitted copy of the batch matches itself at
    jaccard 1.0 and produces ZERO survivors."""
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs today"),
        ],
        ["doc_id", "text"],
    )
    idx = str(tmp_path / "idx")
    D.write_minhash_index(corpus, idx)
    batch = spark.createDataFrame(
        [
            # near-dup of doc 1 (one word dropped) -> caught by probe 1
            (101, "the quick brown fox jumps over the lazy"),
            # novel text -> survives probe 1
            (102, "completely different words about spark streaming state"),
        ],
        ["doc_id", "text"],
    )
    ann1 = D.dedup_against_index(spark, batch, idx, threshold=0.5)
    surv1 = {r.doc_id for r in ann1.filter("survived").collect()}
    assert surv1 == {102}

    survivors = batch.join(
        ann1.filter("survived").select("doc_id"), "doc_id"
    )
    D.append_to_minhash_index(survivors, idx)

    # re-submit the SAME batch under fresh ids (doc_id contract:
    # disjoint from the index, which now contains 102)
    resubmit = batch.selectExpr("doc_id + 1000 AS doc_id", "text")
    ann2 = D.dedup_against_index(spark, resubmit, idx, threshold=0.5)
    rows = {r.doc_id: r for r in ann2.collect()}
    assert not [r for r in rows.values() if r.survived]
    # the appended survivor is what catches the re-submitted copy
    assert rows[1102].max_jaccard == 1.0

    # appending an EMPTY survivor set is a no-op (the steady-state
    # "all caught" batch): the index answers identically afterwards
    D.append_to_minhash_index(survivors.limit(0), idx)
    ann3 = D.dedup_against_index(spark, resubmit, idx, threshold=0.5)
    assert sorted(map(tuple, ann3.collect())) == sorted(
        map(tuple, ann2.collect())
    )


def test_index_delete_and_compact(spark, tmp_path):
    """Retraction lifecycle: tombstoned docs stop producing candidates
    immediately (no rewrite), compaction folds the tombstones into the
    physical files with IDENTICAL probe results, and an append after a
    delete behaves normally."""
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs today"),
        ],
        ["doc_id", "text"],
    )
    idx = str(tmp_path / "idx")
    D.write_minhash_index(corpus, idx)
    batch = spark.createDataFrame(
        [(101, "the quick brown fox jumps over the lazy")],
        ["doc_id", "text"],
    )
    # caught while doc 1 is live
    ann = D.dedup_against_index(spark, batch, idx, threshold=0.5)
    assert not ann.first().survived

    D.delete_from_minhash_index(
        spark.createDataFrame([(1,)], ["doc_id"]), idx
    )
    # materialize: ann2's plan reads the tombstone files, which the
    # compaction below deletes — a lazy re-collect would fail
    ann2 = D.dedup_against_index(spark, batch, idx, threshold=0.5).collect()
    (r2,) = ann2
    assert r2.survived and r2.n_cand == 0 and r2.max_jaccard == -1.0

    # compaction: same probe answer, tombstone table gone, physical
    # rows for doc 1 removed
    D.compact_minhash_index(spark, idx)
    import os as _os

    assert not _os.path.exists(f"{idx}/tombstones")
    assert (
        spark.read.parquet(f"{idx}/bands").filter("doc_id = 1").count()
        == 0
    )
    ann3 = D.dedup_against_index(spark, batch, idx, threshold=0.5)
    assert sorted(map(tuple, ann3.collect())) == sorted(map(tuple, ann2))
    # compacting with no tombstones is a no-op
    D.compact_minhash_index(spark, idx)
    assert (
        spark.read.parquet(f"{idx}/shingles").filter("doc_id = 2").count()
        == 1
    )

    # append after delete: the batch (now a survivor) is admitted and
    # catches its own re-submission
    D.append_to_minhash_index(batch, idx)
    resub = batch.selectExpr("doc_id + 1000 AS doc_id", "text")
    r4 = D.dedup_against_index(spark, resub, idx, threshold=0.5).first()
    assert not r4.survived and r4.max_jaccard == 1.0


def test_index_full_takedown_compacts_to_readable_empty(spark, tmp_path):
    """Deleting EVERY doc then compacting must leave a readable
    (schema-only) index, not an unreadable dir of _SUCCESS files —
    probes against the emptied index answer 'no candidates'."""
    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"],
    )
    idx = str(tmp_path / "idx")
    D.write_minhash_index(corpus, idx)
    D.delete_from_minhash_index(
        spark.createDataFrame([(1,)], ["doc_id"]), idx
    )
    D.compact_minhash_index(spark, idx)
    assert spark.read.parquet(f"{idx}/bands").count() == 0
    batch = spark.createDataFrame(
        [(101, "the quick brown fox jumps over the lazy")],
        ["doc_id", "text"],
    )
    r = D.dedup_against_index(spark, batch, idx, threshold=0.5).first()
    assert r.survived and r.n_cand == 0

    # takedown → APPEND → probe (ADVICE r5 item 1): the schema-only
    # empty table must keep the partitioned band=N layout, or the next
    # partitioned append leaves a root-level file beside band dirs and
    # partition discovery fails with "conflicting directory structures",
    # bricking every later probe. The appended doc must then catch its
    # own re-submission (the index is live again).
    D.append_to_minhash_index(batch, idx)
    assert (
        spark.read.parquet(f"{idx}/bands").filter("doc_id = 101").count()
        > 0
    )
    resub = batch.selectExpr("doc_id + 1000 AS doc_id", "text")
    r2 = D.dedup_against_index(spark, resub, idx, threshold=0.5).first()
    assert not r2.survived and r2.max_jaccard == 1.0


def test_duplicated_spans_cross_doc_only(spark):
    """Only spans shared ACROSS documents count; within-doc repeats and
    short docs score zero."""
    shared = "one two three four five six seven eight"
    docs = spark.createDataFrame(
        [
            (1, f"{shared} tail a b c"),
            (2, f"lead x {shared} y z"),
            (3, "totally different words in this document here now ok"),
            # within-doc repeat of an 8-token span, no other doc has it
            (4, "r1 r2 r3 r4 r5 r6 r7 r8 r1 r2 r3 r4 r5 r6 r7 r8"),
            (5, "too short"),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in D.duplicated_spans(docs, width=8).collect()}
    assert rows[1].n_dup == 1 and rows[2].n_dup == 1  # exactly the shared span
    assert rows[3].n_dup == 0
    assert rows[4].n_dup == 0  # within-doc repeat is not cross-doc
    assert rows[4].n_windows == 9
    assert rows[5].n_windows == 0 and rows[5].dup_span_frac == 0.0
    assert abs(rows[1].dup_span_frac - 1 / rows[1].n_windows) < 1e-12


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_CORPUS)
def test_duplicated_spans_matches_pure_python(spark, texts):
    """Cross-doc span counts agree with a direct per-doc computation
    over the same window definition (width 3 keeps the word-soup
    corpus in collision range)."""
    width = 3
    docs = spark.createDataFrame(
        list(enumerate(texts)), ["doc_id", "text"]
    )
    spans = {}
    for i, t in enumerate(texts):
        toks = [w for w in t.split() if w]
        spans[i] = [
            " ".join(toks[j : j + width])
            for j in range(len(toks) - width + 1)
        ] if len(toks) >= width else []
    owners = {}
    for i, ws in spans.items():
        for w in set(ws):
            owners.setdefault(w, set()).add(i)
    expected = {
        i: (
            len(ws),
            sum(1 for w in ws if len(owners[w]) >= 2),
        )
        for i, ws in spans.items()
    }
    got = {
        r.doc_id: (r.n_windows, r.n_dup)
        for r in D.duplicated_spans(docs, width=width).collect()
    }
    assert got == expected


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(_DOC, min_size=2, max_size=8),
    threshold=st.sampled_from([0.3, 0.5, 0.6, 0.8]),
)
def test_ppjoin_is_complete(spark, texts, threshold):
    """ppjoin_pairs finds EVERY pair with exact Jaccard >= t — the
    prefix-filter + positional-bound pruning must be lossless, for
    any threshold and any corpus (small random corpora of highly
    overlapping vocab maximize shared-shingle structure)."""
    corpus = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b)
        for r in D.ppjoin_pairs(
            D.shingle_arrays(corpus), threshold
        ).collect()
    }
    sets = {i: _pyshingles(t) for i, t in enumerate(texts)}
    want = set()
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and inter / union >= threshold:
                want.add((a, b))
    assert got == want


def test_paragraph_dedup_keep_first_and_reassembly(spark):
    """Corpus-wide keep-first is (doc_id, pos) min; within-doc repeats
    collapse; surviving text preserves original paragraph order; a
    fully-boilerplate doc disappears."""
    from diachronic_spark.operators import dedup as D

    docs = spark.createDataFrame(
        [
            (1, "unique one\nshared para\nunique two"),
            # doc 2's copy of "shared para" sits at an EARLIER pos,
            # but doc 1 wins on doc_id
            (2, "shared para\nSHARED, para!\nonly here"),
            (3, "shared para"),
        ],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r for r in D.paragraph_dedup(docs).collect()}
    assert set(got) == {1, 2}
    assert got[1].clean_text == "unique one\nshared para\nunique two"
    # doc 2: both shared variants (raw + case/punct) dedup away
    assert got[2].clean_text == "only here"
    assert got[2].n_paras_in == 3 and got[2].n_paras_kept == 1


def test_remove_duplicated_spans_policy_clauses(spark):
    """Every clause decisive: the global-min (doc_id, pos) occurrence
    keeps its tokens, the non-canonical occurrence is cut, within-doc
    repeats and short docs pass through, and reassembly is
    whitespace-join-normalized on every path."""
    shared = "one two three four five six seven eight"
    docs = spark.createDataFrame(
        [
            (1, f"{shared} tail a b c"),
            (2, f"lead x {shared} y z"),
            # within-doc repeat only — not cross-doc, never cut
            (4, "r1 r2 r3 r4 r5 r6 r7 r8 r1 r2 r3 r4 r5 r6 r7 r8"),
            (5, "too   short"),
        ],
        ["doc_id", "text"],
    )
    rows = {
        r.doc_id: r
        for r in D.remove_duplicated_spans(docs, width=8).collect()
    }
    # doc 1 holds the canonical (min doc_id) occurrence — untouched
    assert rows[1].n_removed == 0
    assert rows[1].cleaned_text == f"{shared} tail a b c"
    # doc 2's occurrence is non-canonical — exactly the 8 span tokens go
    assert rows[2].n_removed == 8
    assert rows[2].cleaned_text == "lead x y z"
    assert rows[4].n_removed == 0 and rows[4].n_tokens == 16
    assert rows[5].n_removed == 0
    assert rows[5].cleaned_text == "too short"  # join-normalized


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_CORPUS)
def test_remove_duplicated_spans_matches_pure_python(spark, texts):
    """The full removal policy (qualify at >=2 distinct docs, keep the
    global-min (doc, pos) occurrence, cut covered positions, reassemble
    in order) agrees with a direct Python replay at width 3."""
    width = 3
    toks = {
        i: [w for w in t.split() if w] for i, t in enumerate(texts)
    }
    occ: dict[str, list[tuple[int, int]]] = {}
    for i, ts in toks.items():
        for j in range(len(ts) - width + 1):
            occ.setdefault(" ".join(ts[j : j + width]), []).append(
                (i, j + 1)
            )
    covered: dict[int, set[int]] = {i: set() for i in toks}
    for positions in occ.values():
        if len({d for d, _ in positions}) >= 2:
            keep = min(positions)
            for d, p in positions:
                if (d, p) != keep:
                    covered[d].update(range(p, p + width))
    expected = {}
    for i, ts in toks.items():
        kept = [
            t for k, t in enumerate(ts, start=1) if k not in covered[i]
        ]
        expected[i] = (len(ts), len(ts) - len(kept), " ".join(kept))
    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.cleaned_text)
        for r in D.remove_duplicated_spans(docs, width=width).collect()
    }
    assert got == expected


def test_hard_negatives_two_phase_equals_single_window(spark):
    """The salted phase-1 prune never changes the result: compare
    against a direct single-window computation (numpy) on random
    vectors, including the different-label constraint and the
    rounded-cosine/vec_id tie order."""
    import numpy as np

    from diachronic_spark.operators.similarity import hard_negatives

    rng = np.random.default_rng(7)
    n, dim = 60, 8
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    labels = (rng.integers(0, 3, size=n)).astype(int)
    emb = spark.createDataFrame(
        [
            (int(i), [float(x) for x in vecs[i]], int(labels[i]))
            for i in range(n)
        ],
        "vec_id bigint, embedding array<float>, label int",
    )
    got = [
        (r.anchor_id, r.rank, r.vec_id, r.cos_sim)
        for r in hard_negatives(
            emb, n_anchors=4, k=3, salt_buckets=5
        ).collect()
    ]
    expected = []
    for a in range(4):
        cands = []
        for j in range(n):
            if labels[j] == labels[a]:
                continue
            va, vj = vecs[a].astype(float), vecs[j].astype(float)
            cos = float(va @ vj / (np.linalg.norm(va) * np.linalg.norm(vj)))
            cands.append((j, round(cos, 4)))
        cands.sort(key=lambda t: (-t[1], t[0]))
        for rank, (j, cos) in enumerate(cands[:3], start=1):
            expected.append((a, rank, j, cos))
    assert got == expected


def test_margin_bitext_mine_matches_numpy(spark):
    """Margin scores and ranking agree with a direct numpy replay of
    Artetxe & Schwenk's ratio-margin (k-NN sums over the other side,
    6dp rounding at each declared point)."""
    import math

    import numpy as np

    from diachronic_spark.operators.similarity import margin_bitext_mine

    rng = np.random.default_rng(11)
    na, nb, dim = 12, 9, 8
    va = rng.normal(size=(na, dim)).astype(np.float32)
    vb = rng.normal(size=(nb, dim)).astype(np.float32)
    rows = [
        (int(i), [float(x) for x in va[i]], 0) for i in range(na)
    ] + [
        (100 + int(j), [float(x) for x in vb[j]], 1) for j in range(nb)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    got = [
        (r.src_id, r.tgt_id, r.cos_sim, r.margin)
        for r in margin_bitext_mine(emb, k=3, top=10).collect()
    ]

    def f6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    cos = {}
    for i in range(na):
        for j in range(nb):
            x, y = va[i].astype(float), vb[j].astype(float)
            cos[(i, 100 + j)] = f6(
                float(x @ y / (np.linalg.norm(x) * np.linalg.norm(y)))
            )
    def knn_sum(pairs_for, key_is_src):
        out = {}
        ids = range(na) if key_is_src else [100 + j for j in range(nb)]
        for a in ids:
            cands = sorted(
                (
                    (c, other)
                    for (s, t), c in cos.items()
                    for other in [t if key_is_src else s]
                    if (s if key_is_src else t) == a
                ),
                key=lambda p: (-p[0], p[1]),
            )[:3]
            s = 0.0
            for c, _ in sorted(cands, key=lambda p: (p[0], p[1])):
                s += c
            out[a] = s
        return out

    sx, sy = knn_sum(cos, True), knn_sum(cos, False)
    expected = sorted(
        (
            (s, t, c, f6(c / ((sx[s] + sy[t]) / 6.0)))
            for (s, t), c in cos.items()
        ),
        key=lambda r: (-r[3], r[0], r[1]),
    )[:10]
    assert got == expected
