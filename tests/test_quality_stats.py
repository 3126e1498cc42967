"""quality audit, snapshot_diff, histogram units."""

from __future__ import annotations

from pyspark.sql import functions as F

from diachronic_spark.operators.merge import merge_upsert, snapshot_diff
from diachronic_spark.operators.quality import (
    audit,
    fk_violations,
    range_violations,
    unique_violations,
)
from diachronic_spark.operators.stats import equi_width_histogram


def test_quality_checks(spark):
    dup = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "z")], "k int, v string"
    )
    parent = spark.createDataFrame([(1,), (2,)], "k int")
    child = spark.createDataFrame(
        [(1,), (9,), (None,)], "fk int"
    )  # 9 orphan; NULL is not a violation
    vals = spark.createDataFrame([(5,), (50,), (None,)], "x int")
    out = {
        r["check_name"]: r["n_violations"]
        for r in audit(
            {
                "uniq": unique_violations(dup, ["k"]),
                "fk": fk_violations(child, "fk", parent, "k"),
                "rng": range_violations(vals, F.col("x") <= 10),
            }
        ).collect()
    }
    assert out == {"uniq": 1, "fk": 1, "rng": 2}  # rng: 50 + NULL


def test_snapshot_diff_roundtrips_merge(spark):
    t = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 3.0)], "k int, v double"
    )
    src = spark.createDataFrame(
        [(2, "U", 9.0), (3, "D", None), (7, "I", 7.0)],
        "k int, op string, v double",
    )
    d = snapshot_diff(t, merge_upsert(t, src, "k", ["v"]), "k", ["v"])
    got = {(r["k"], r["change_type"]) for r in d.collect()}
    assert got == {(2, "changed"), (3, "removed"), (7, "added")}


def test_snapshot_diff_null_safe_compare(spark):
    a = spark.createDataFrame([(1, None), (2, None)], "k int, v double")
    b = spark.createDataFrame([(1, None), (2, 5.0)], "k int, v double")
    got = {(r["k"], r["change_type"]) for r in
           snapshot_diff(a, b, "k", ["v"]).collect()}
    assert got == {(2, "changed")}  # NULL==NULL is unchanged


def test_histogram_bins_and_degenerate(spark):
    df = spark.createDataFrame([(float(i),) for i in range(10)], "x double")
    h = {r["bin"]: r["n"] for r in
         equi_width_histogram(df, "x", bins=3).collect()}
    # width 3: [0,3) [3,6) [6,9], max lands in last bin
    assert h == {0: 3, 1: 3, 2: 4}
    one = spark.createDataFrame([(5.0,), (5.0,)], "x double")
    rows = equi_width_histogram(one, "x", bins=4).collect()
    assert len(rows) == 1 and rows[0]["bin"] == 0 and rows[0]["n"] == 2


def test_q69_profiles_every_column_on_empty_input(spark):
    """The profile is anchored on the literal column list: an empty
    (or fully filtered) table still yields one row per profiled column
    with zero counts and null bounds, matching the oracle's UNION ALL
    of GROUP-BY-less aggregates."""
    import diachronic_spark.plans.ext_queries as X
    from diachronic_spark.catalog import load as real_load
    from pyspark.sql import functions as F

    empty_li = real_load(spark, "/root/testdata/sf0.001", "lineitem").filter(
        F.lit(False)
    )
    orig = X.load
    X.load = lambda s, sf, t: empty_li if t == "lineitem" else orig(s, sf, t)
    try:
        rows = X.q69(spark, "/root/testdata/sf0.001").collect()
    finally:
        X.load = orig
    assert [(r.col_name, r.n_nulls, r.n_distinct, r.min_v, r.max_v)
            for r in rows] == [
        (c, 0, 0, None, None) for c in X.PROFILE_COLS
    ]


def test_repetition_signals_known_values(spark):
    from diachronic_spark.operators import text as T

    docs = spark.createDataFrame(
        [
            # 6 tokens: bigrams [ab,ba,ab,ba,ab] -> top 3/5; trigrams
            # [aba,bab,aba,bab] -> distinct 2/4 -> dup 0.5
            (1, "a b a b a b"),
            (2, "all distinct words here now"),  # no repeats
            (3, "x y"),       # 1 bigram, 0 trigrams
            (4, "solo"),      # no n-grams at all
            (5, ""),          # empty text
        ],
        ["doc_id", "text"],
    )
    rows = {
        r.doc_id: r
        for r in T.repetition_signals(docs).collect()
    }
    assert rows[1].dup_trigram_frac == 0.5
    assert abs(rows[1].top_bigram_frac - 0.6) < 1e-12
    assert rows[2].dup_trigram_frac == 0.0
    assert rows[2].top_bigram_frac == 0.25  # 4 distinct bigrams
    assert rows[3].dup_trigram_frac == 0.0
    assert rows[3].top_bigram_frac == 1.0
    assert rows[4].dup_trigram_frac == 0.0
    assert rows[4].top_bigram_frac == 0.0
    assert rows[5].dup_trigram_frac == 0.0
    assert rows[5].top_bigram_frac == 0.0


def test_mixture_sample_tokens_budget_and_determinism(spark):
    from diachronic_spark.operators import text as T

    docs = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de", "tok " * 10) for i in range(40)],
        ["doc_id", "lang", "text"],
    )
    # en weight 3, de weight 1; budget 80 tokens -> en target 60
    # (6 docs of 10), de target 20 (2 docs)
    out = T.mixture_sample_tokens(
        docs, {"en": 3, "de": 1}, 80, bucket_col="lang"
    )
    rows = out.collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    assert sum(r.n_tokens for r in by_lang["en"]) == 60
    assert sum(r.n_tokens for r in by_lang["de"]) == 20
    # per-bucket cumsum never exceeds the target
    assert max(r.cum_tokens for r in by_lang["en"]) <= 60
    assert max(r.cum_tokens for r in by_lang["de"]) <= 20
    # deterministic across runs
    again = sorted(map(tuple, T.mixture_sample_tokens(
        docs, {"en": 3, "de": 1}, 80, bucket_col="lang"
    ).collect()))
    assert again == sorted(map(tuple, rows))
    # unweighted buckets are dropped entirely
    none_fr = T.mixture_sample_tokens(
        docs.withColumn("lang", docs.lang), {"fr": 1.0}, 100,
        bucket_col="lang",
    )
    assert none_fr.count() == 0


def test_exact_percentile_bracketed_bit_identical(spark):
    """The bracketed selection must reproduce F.percentile exactly —
    same order statistics AND the same floating-point interpolation —
    across tie-heavy data, tiny groups, and boundary percentiles."""
    import random

    from pyspark.sql import functions as F

    from diachronic_spark.operators.stats import exact_percentile_bracketed

    random.seed(11)
    rows = (
        [("g%d" % (i % 4), random.choice([1.0, 2.5, 2.5, 7.0,
                                          random.random() * 100]))
         for i in range(3000)]
        + [("one", 42.0), ("two", 1.0), ("two", 9.0)]
    )
    d = spark.createDataFrame(rows, ["g", "v"])
    for p in [0.0, 0.5, 0.9, 1.0]:
        exact = {
            r.g: r.p
            for r in d.groupBy("g")
            .agg(F.percentile(F.col("v"), p).alias("p"))
            .collect()
        }
        got = {
            r.g: r.p_exact
            for r in exact_percentile_bracketed(d, "g", "v", p).collect()
        }
        assert got == exact  # bit-identical, no tolerance


def test_exact_percentile_bracketed_null_groups(spark):
    """Groups whose values are entirely NULL return NULL (matching the
    percentile aggregate) instead of vanishing; mixed-null groups
    ignore the nulls."""
    from pyspark.sql import functions as F

    from diachronic_spark.operators.stats import exact_percentile_bracketed

    d = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("a", None), ("b", None), ("b", None)],
        "g string, v double",
    )
    got = {r.g: (r.n, r.p_exact) for r in
           exact_percentile_bracketed(d, "g", "v", 0.5).collect()}
    exact = {r.g: r.p for r in
             d.groupBy("g").agg(F.percentile(F.col("v"), 0.5).alias("p"))
             .collect()}
    assert set(got) == {"a", "b"} == set(exact)
    assert got["a"] == (2, exact["a"]) == (2, 2.0)
    assert got["b"] == (0, None) and exact["b"] is None


def test_grouped_ols_known_line_and_degenerate(spark):
    from diachronic_spark.operators.stats import grouped_ols

    rows = [
        # y = 3x + 10 exactly -> slope 3, intercept 10, r2 = 1
        ("fit", 0, 10), ("fit", 1, 13), ("fit", 2, 16), ("fit", 3, 19),
        # scattered: slope well-defined, 0 < r2 < 1
        ("noisy", 0, 0), ("noisy", 1, 5), ("noisy", 2, 4),
        # constant x: slope/r2 null
        ("degx", 7, 1), ("degx", 7, 9),
        # constant y: slope 0, r2 null
        ("degy", 1, 4), ("degy", 2, 4),
    ]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {r.g: r for r in grouped_ols(df, "g", "x", "y").collect()}
    assert got["fit"].slope == 3.0
    assert got["fit"].intercept == 10.0
    assert got["fit"].r2 == 1.0
    assert 0.0 < got["noisy"].r2 < 1.0
    assert got["degx"].slope is None and got["degx"].r2 is None
    assert got["degy"].slope == 0.0 and got["degy"].r2 is None


def _greedy_replay(toks, budget):
    """Naive per-doc greedy fold — the independent truth for the
    searchsorted jump implementation."""
    packs, acc, p = [], 0, -1
    for t in toks:
        if p < 0 or acc + t > budget:
            p, acc = p + 1, t
        else:
            acc += t
        packs.append(p)
    return packs


def test_pack_sequences_greedy_matches_naive_replay(spark):
    from diachronic_spark.operators import text as T

    # token counts chosen to hit every branch: exact fill, overflow
    # by one, oversize doc (> budget) mid-stream and at bucket start
    docs = spark.createDataFrame(
        [
            (i, " ".join(["w"] * n))
            for i, n in enumerate(
                [10, 20, 2, 100, 31, 1, 32, 5, 64, 40, 40, 40, 3, 7, 90]
            )
        ],
        ["doc_id", "text"],
    )
    budget = 32
    out = T.pack_sequences_greedy(
        docs, bin_tokens=budget, n_buckets=4
    ).collect()
    # rebuild the per-bucket doc order the operator used and replay
    from diachronic_spark.functions import md5_prefix32
    import pyspark.sql.functions as F

    narrow = docs.select(
        "doc_id",
        (md5_prefix32(F.col("doc_id")) % 4).cast("int").alias("bucket"),
        F.size(F.split("text", r"\s+")).alias("tok"),
    ).collect()
    by_bucket = {}
    for r in sorted(narrow, key=lambda r: (r.bucket, r.doc_id)):
        by_bucket.setdefault(r.bucket, []).append((r.doc_id, r.tok))
    expect = {}
    for b, pairs in by_bucket.items():
        packs = _greedy_replay([t for _, t in pairs], budget)
        for (doc, tok), p in zip(pairs, packs):
            row = expect.setdefault((b, p), [0, 0, None, None])
            row[0] += 1
            row[1] += tok
            row[2] = doc if row[2] is None else min(row[2], doc)
            row[3] = doc if row[3] is None else max(row[3], doc)
    got = {
        (r.bucket, r.pack_id): [r.n_docs, r.pack_tokens, r.first_doc, r.last_doc]
        for r in out
    }
    assert got == expect
    # invariants: a pack over budget must be a singleton oversize doc
    for r in out:
        assert r.pack_tokens <= budget or r.n_docs == 1
    # every doc lands exactly once
    assert sum(r.n_docs for r in out) == 15


def test_pack_sequences_greedy_jump_fuzz():
    """The operator's searchsorted jump fold equals the naive per-doc
    fold on random token streams (no Spark needed — the fold is
    pure)."""
    from hypothesis import given, settings, strategies as st

    from diachronic_spark.operators.text import _greedy_pack_ids

    @settings(max_examples=200, deadline=None)
    @given(
        toks=st.lists(st.integers(min_value=0, max_value=50), max_size=60),
        budget=st.integers(min_value=1, max_value=40),
    )
    def check(toks, budget):
        assert list(_greedy_pack_ids(toks, budget)) == _greedy_replay(
            toks, budget
        )

    check()


def test_pack_sequences_greedy_validation(spark):
    import pytest as _pytest

    from diachronic_spark.operators import text as T

    with _pytest.raises(ValueError, match="bin_tokens"):
        T.pack_sequences_greedy(None, bin_tokens=0)


def test_bm25_topk_matches_pure_python(spark):
    """BM25 scores and ranking agree with a direct Python computation
    of the Okapi formula (k1=1.2, b=0.75) over a corpus where the
    data-driven query (df ranks 1-2 here, skip_top_df=0) and the
    length normalization are both decisive."""
    import math

    from diachronic_spark.operators.text import bm25_topk

    texts = {
        1: "apple banana apple cherry",
        2: "apple banana banana banana date egg fig grape",
        3: "apple cherry cherry date",
        4: "banana date",
        5: "egg fig grape hazel icefruit jack kiwi lemon",
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], ["doc_id", "text"]
    )
    got = [
        (r.doc_id, r.dl, r.score)
        for r in bm25_topk(
            docs, n_query_terms=2, skip_top_df=0, top_k=5
        ).collect()
    ]

    toks = {i: t.split() for i, t in texts.items()}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    df: dict[str, int] = {}
    for ts in toks.values():
        for w in set(ts):
            df[w] = df.get(w, 0) + 1
    qterms = sorted(df, key=lambda w: (-df[w], w))[:2]
    k1, b = 1.2, 0.75
    expected = []
    for i, ts in toks.items():
        contribs = []
        for w in sorted(qterms):
            tf = ts.count(w)
            if tf == 0:
                continue
            idf = math.log(1.0 + (n - df[w] + 0.5) / (df[w] + 0.5))
            c = idf * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * len(ts) / avgdl)
            )
            contribs.append(math.floor(c * 1e10 + 0.5) / 1e10)
        if contribs:
            s = 0.0
            for c in contribs:
                s += c
            expected.append(
                (i, len(ts), math.floor(s * 1e6 + 0.5) / 1e6)
            )
    expected.sort(key=lambda r: (-r[2], r[0]))
    assert got == expected


def test_temperature_rebalance_properties(spark):
    """alpha=1 is the identity (every rate 1.0, corpus unchanged);
    alpha=0.3 flattens: the dominant language's rate < 1 < the rare
    language's rate, emitted mass ~ N, epochs enumerate 1..copies,
    and the draw is deterministic across invocations."""
    from diachronic_spark.operators.sampling import temperature_rebalance

    rows = [(i, "big") for i in range(90)] + [
        (100 + i, "small") for i in range(10)
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, lang string")

    ident = temperature_rebalance(docs, alpha=1.0)
    assert ident.count() == 100
    assert ident.select("rate").distinct().collect()[0].rate == 1.0

    flat = temperature_rebalance(docs, alpha=0.3)
    rates = {r.lang: r.rate for r in flat.select("lang", "rate").distinct().collect()}
    assert rates["big"] < 1.0 < rates["small"]
    total = flat.count()
    assert abs(total - 100) <= 5  # Bernoulli residue, not drift
    # epochs enumerate 1..copies for an upsampled doc
    eps = sorted(
        r.epoch
        for r in flat.filter("lang = 'small' and doc_id = 100").collect()
    )
    assert eps == list(range(1, len(eps) + 1)) and len(eps) >= 1
    # pure function of the key: second run emits the identical multiset
    a = sorted((r.doc_id, r.epoch) for r in flat.collect())
    b = sorted(
        (r.doc_id, r.epoch)
        for r in temperature_rebalance(docs, alpha=0.3).collect()
    )
    assert a == b


def test_q204_auc_matches_pairwise_definition(spark):
    """The rank-sum AUC (distinct-margin grain + exclusive cumq)
    equals the O(n^2) pairwise definition, ties at 1/2 — checked on
    the actual eval margins AND on a synthetic tie-heavy set."""
    import math

    from diachronic_spark.plans.ext_queries import q204

    row = q204(spark, "/root/testdata/sf0.001").collect()[0]
    # pairwise replay on the same margins
    from pyspark.sql import functions as F

    from diachronic_spark.operators.classifier import (
        score_margin, train_quality_weights,
    )
    from diachronic_spark.sources.classifier_fixture import DOCS, EVAL_DOCS

    schema = "doc_id bigint, text string, label int"
    docs = spark.createDataFrame(DOCS, schema)
    w, _, _ = train_quality_weights(
        docs, F.col("label") == 1, "text", 16, 4.0, 5
    )
    rows = (
        spark.createDataFrame(EVAL_DOCS, schema)
        .select("label", score_margin(w).alias("m"))
        .collect()
    )
    pos = [r.m for r in rows if r.label == 1]
    neg = [r.m for r in rows if r.label == 0]
    num = sum(1.0 for p in pos for q in neg if p > q) + 0.5 * sum(
        1.0 for p in pos for q in neg if p == q
    )
    want = math.floor(num / (len(pos) * len(neg)) * 1e6 + 0.5) / 1e6
    assert row.auc == want
    assert 0.0 < row.auc < 1.0 and 0.0 < row.accuracy < 1.0
    # the identical-text opposite-label pair guarantees >= 1 error on
    # each side of the gate OR a tie contribution — here: both
    assert row.fp >= 1 and row.fn >= 1
