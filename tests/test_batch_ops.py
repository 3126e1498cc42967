"""Unit tests for sessionize / gap_fill_locf / sampling / tfidf edges
that the sf0.01 parity run can't isolate."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from diachronic_spark.operators import sampling as SA
from diachronic_spark.operators import sessions as SN
from diachronic_spark.operators import timeseries as TS


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_sessionize_gap_boundary_and_ties(spark):
    # gap == threshold continues the session (strict >); equal
    # timestamps break ties on event_id so order is total.
    rows = [
        (1, _ts("2024-01-01 00:00:00"), 7),
        (2, _ts("2024-01-01 00:30:00"), 7),   # exactly 1800s: same session
        (3, _ts("2024-01-01 01:00:01"), 7),   # 1801s: new session
        (5, _ts("2024-01-01 01:00:01"), 7),   # tie ts -> ordered by id
        (4, _ts("2024-01-02 00:00:00"), 9),   # other user independent
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    got = {
        r["event_id"]: r["session_idx"]
        for r in SN.sessionize(df, gap_seconds=1800).collect()
    }
    assert got == {1: 1, 2: 1, 3: 2, 5: 2, 4: 1}


def test_gap_fill_locf_leading_gap_stays_null(spark):
    # key B has no observation in the first bucket: filled stays null
    # until B's first real row; counts zero-fill everywhere.
    rows = [
        ("A", _ts("2024-01-01 00:15:00"), 1.0),
        ("A", _ts("2024-01-01 03:15:00"), 3.0),
        ("B", _ts("2024-01-01 02:15:00"), 9.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    rolled = TS.bucket_rollup(
        df, "k", "ts", "hour",
        {"n": F.count(F.lit(1)), "avg_v": F.avg("v")},
    )
    out = TS.gap_fill_locf(rolled, "k", "hour", fill=("avg_v",), zero=("n",))
    got = {
        (r["k"], r["bucket"].hour): (r["n"], r["avg_v_filled"])
        for r in out.collect()
    }
    # spine: hours 0..3 for both keys (global bounds)
    assert len(got) == 8
    assert got[("A", 0)] == (1, 1.0)
    assert got[("A", 1)] == (0, 1.0)      # LOCF carries hour-0 avg
    assert got[("A", 2)] == (0, 1.0)
    assert got[("A", 3)] == (1, 3.0)
    assert got[("B", 0)] == (0, None)     # before first obs: null
    assert got[("B", 1)] == (0, None)
    assert got[("B", 2)] == (1, 9.0)
    assert got[("B", 3)] == (0, 9.0)


def test_hash_sample_consistent_across_tables(spark):
    # the same keys survive sampling in any table sampled on that key,
    # so FK joins between samples still line up
    a = spark.range(0, 1000).withColumnRenamed("id", "k")
    b = a.withColumn("payload", F.col("k") * 2)
    ka = {r["k"] for r in SA.hash_sample_fraction(a, "k", 0.2).collect()}
    kb = {r["k"] for r in SA.hash_sample_fraction(b, "k", 0.2).collect()}
    assert ka == kb
    assert 100 < len(ka) < 300  # ~200 expected


def test_stratified_sample_exact_sizes_and_determinism(spark):
    df = spark.range(0, 500).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("lang"),
    )
    s1 = SA.stratified_sample_k(df, "lang", "doc_id", k=7).collect()
    s2 = SA.stratified_sample_k(df, "lang", "doc_id", k=7).collect()
    assert sorted(map(tuple, s1)) == sorted(map(tuple, s2))
    by_stratum = {}
    for r in s1:
        by_stratum.setdefault(r["lang"], set()).add(r["doc_id"])
    assert {len(v) for v in by_stratum.values()} == {7}
    # small stratum caps at its size, not k
    tiny = spark.createDataFrame(
        [(1, "x"), (2, "x")], "doc_id long, lang string"
    )
    assert SA.stratified_sample_k(tiny, "lang", "doc_id", k=7).count() == 2


def test_fingerprint_rolling_matches_python_replay(spark):
    # pure-Python Horner replay over code points, incl. CJK + short doc
    from diachronic_spark.operators.text import RH_BASE, RH_MOD, fingerprint_rolling

    texts = ["hello world this is a longer document text", "的是了在我有", "ab"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["fp"], r["n_grams"])
        for r in fingerprint_rolling(df, k=16, stride=4).collect()
    }

    def replay(t):
        codes = [ord(c) for c in t]
        last = max(len(t) - 15, 1)
        hs = []
        for i in range(1, last + 1, 4):
            acc = 0
            for c in codes[i - 1 : i - 1 + 16]:
                acc = (acc * RH_BASE + c) % RH_MOD
            hs.append(acc)
        return min(hs), len(hs)

    assert got == {i: replay(t) for i, t in enumerate(texts)}


def test_fingerprint_rolling_same_window_structure_as_md5(spark):
    # both variants sketch the same windows: n_grams must agree, and
    # identical texts must share fp under both
    from diachronic_spark.operators.text import fingerprint, fingerprint_rolling

    df = spark.createDataFrame(
        [(1, "abcdefghijklmnopqrstuvwxyz"), (2, "abcdefghijklmnopqrstuvwxyz"),
         (3, "completely different text here")],
        "doc_id long, text string",
    )
    md5v = {r["doc_id"]: (r["fp"], r["n_grams"]) for r in fingerprint(df).collect()}
    roll = {r["doc_id"]: (r["fp"], r["n_grams"]) for r in fingerprint_rolling(df).collect()}
    assert {k: v[1] for k, v in md5v.items()} == {k: v[1] for k, v in roll.items()}
    assert md5v[1][0] == md5v[2][0] and roll[1][0] == roll[2][0]
    assert roll[1][0] != roll[3][0]


def test_chunk_tokens_edges(spark):
    from diachronic_spark.operators.text import chunk_tokens

    rows = [
        (1, "a b c d e f g"),   # 7 tokens: size 3 stride 2 -> 4 chunks
        (2, "x"),               # shorter than size -> one chunk
        (3, ""),                # empty -> one empty chunk, row preserved
        (4, "p q r"),           # exactly size -> chunks at 1 and 3
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_id, r.chunk_id): (r.chunk_tokens, r.chunk_text)
        for r in chunk_tokens(df, size=3, stride=2).collect()
    }
    assert got == {
        (1, 0): (3, "a b c"), (1, 1): (3, "c d e"),
        (1, 2): (3, "e f g"), (1, 3): (1, "g"),
        (2, 0): (1, "x"),
        (3, 0): (0, ""),
        (4, 0): (3, "p q r"), (4, 1): (1, "r"),
    }
    # overlap invariant: consecutive chunks share size-stride tokens
    c0, c1 = got[(1, 0)][1].split(), got[(1, 1)][1].split()
    assert c0[-1] == c1[0]


def test_quantize_embeddings_range_and_zero_guard(spark):
    from diachronic_spark.operators.similarity import quantize_embeddings

    rows = [
        (0, [1.0, -2.0, 0.5]),
        (1, [0.0, 0.0, 0.0]),     # zero vector: scale guard, q = 0
        (2, [-0.1, 0.1, 0.05]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r for r in quantize_embeddings(df).collect()}
    for r in out.values():
        assert all(-127 <= q <= 127 for q in r.q_vec)
    assert out[1].scale == 1.0 and out[1].q_vec == [0, 0, 0]
    # max-magnitude component always maps to ±127 (scale definition)
    assert max(abs(q) for q in out[0].q_vec) == 127
    # dequantization error bounded by half a quantization step
    for r in (out[0], out[2]):
        step = 1.0 / r.scale
        for x, dq in zip(r.embedding, r.dq_vec):
            assert abs(x - dq) <= step / 2 + 1e-12


def test_fingerprint_rolling_np_equals_expression_form(spark):
    """The Arrow-vectorized production dual must match the expression
    form bit-for-bit, including CJK text, short docs, and real corpus
    rows (the q31 contract)."""
    from diachronic_spark.operators.text import (
        fingerprint_rolling,
        fingerprint_rolling_np,
    )

    texts = [
        "hello world this is a longer document text",
        "的是了在我有和不的是了在我有和不",
        "ab",
        "exactly sixteen!!",
        None,  # NULL text must null-propagate in BOTH forms
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    from diachronic_spark.catalog import load

    corpus = load(
        spark, "/root/testdata/sf0.001", "documents"
    ).select("doc_id", "text").limit(200)
    for frame in (df, corpus):
        a = {
            r["doc_id"]: (r["fp"], r["n_grams"])
            for r in fingerprint_rolling(frame).collect()
        }
        b = {
            r["doc_id"]: (r["fp"], r["n_grams"])
            for r in fingerprint_rolling_np(frame).collect()
        }
        assert a == b


def test_fingerprint_np_fuzz_batch(spark):
    """Seeded random-unicode batch: both fingerprint forms must agree
    on mixed-script text, whitespace runs, astral chars, empty and
    k-boundary lengths — one Spark job covering 80 generated docs."""
    import random

    from diachronic_spark.operators.text import (
        fingerprint_rolling,
        fingerprint_rolling_np,
    )

    rng = random.Random(20240814)
    alphabets = [
        "abcdefghij ",
        "的是了在我有和不 ",
        "αβγδε ζηθικ",
        "😀😃🚀🌍 xyz",   # astral plane
        " \t\n ascii",
    ]
    texts = [""]
    for n in (1, 15, 16, 17, 40, 200):
        for a in alphabets:
            texts.append("".join(rng.choice(a) for _ in range(n)))
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    a = {r["doc_id"]: (r["fp"], r["n_grams"])
         for r in fingerprint_rolling(df).collect()}
    b = {r["doc_id"]: (r["fp"], r["n_grams"])
         for r in fingerprint_rolling_np(df).collect()}
    assert a == b


def test_gap_fill_linear_interior_lerp_edges_null(spark):
    # A observed on days 1 and 4 (cents 100 -> 400): days 2/3 lerp to
    # 200/300; B observed only on day 2: its spine edges (days 1, 3,
    # 4) have no bracketing pair and stay null — no extrapolation.
    rows = [
        ("A", _ts("2024-01-01 05:00:00"), 100),
        ("A", _ts("2024-01-04 05:00:00"), 400),
        ("B", _ts("2024-01-02 05:00:00"), 70),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, cents long")
    rolled = TS.bucket_rollup(
        df, "k", "ts", "day", {"cents": F.sum("cents")}
    )
    out = TS.gap_fill_linear(rolled, "k", "cents")
    got = {
        (r["k"], r["bucket"].day): (r["cents"], r["cents_est"])
        for r in out.collect()
    }
    assert got[("A", 1)] == (100, 100.0)
    assert got[("A", 2)] == (None, 200.0)
    assert got[("A", 3)] == (None, 300.0)
    assert got[("A", 4)] == (400, 400.0)
    assert got[("B", 2)] == (70, 70.0)
    for day in (1, 3, 4):
        assert got[("B", day)] == (None, None)


def test_global_running_sum_matches_global_window(spark):
    """The two-phase distributed prefix sum must be bit-identical to
    the single-partition-window formulation for integral values —
    including under skewed keys, ties in the first order column, and
    more partitions than rows."""
    from pyspark.sql import Window

    from diachronic_spark.operators.sampling import global_running_sum

    rows = [(i, (i * 7919) % 13, 1 + (i * 31) % 97) for i in range(500)]
    df = spark.createDataFrame(rows, "id bigint, grp bigint, v bigint")
    got = {
        r.id: r.cum
        for r in global_running_sum(
            df, "v", ["grp", "id"], cache_key="test.grs"
        ).collect()
    }
    w = Window.orderBy("grp", "id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = {
        r.id: r.cum
        for r in df.withColumn("cum", F.sum("v").over(w)).collect()
    }
    assert got == want

    # more partitions than rows: empty range partitions must not
    # produce offset gaps
    tiny = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "id bigint, v bigint"
    )
    got2 = {
        r.id: r.cum
        for r in global_running_sum(
            tiny, "v", ["id"], cache_key="test.grs.tiny", n_partitions=8
        ).collect()
    }
    assert got2 == {1: 10, 2: 30, 3: 60}


def test_global_running_sum_null_semantics_match_global_window(spark):
    """NULL handling must replicate the global window exactly: a row's
    cum is NULL only while NO non-null value precedes it anywhere —
    including across partition boundaries (a leading all-null range
    partition must inherit the offset, not stay NULL)."""
    from pyspark.sql import Window

    from diachronic_spark.operators.sampling import global_running_sum

    rows = [
        (1, 5), (2, None), (3, None), (4, 7), (5, None), (6, 2),
        (0, None),  # leading null: global cum must be NULL here
    ]
    df = spark.createDataFrame(rows, "id bigint, v bigint")
    got = {
        r.id: r.cum
        for r in global_running_sum(
            df, "v", ["id"], cache_key="test.grs.null", n_partitions=4
        ).collect()
    }
    w = Window.orderBy("id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = {
        r.id: r.cum
        for r in df.withColumn("cum", F.sum("v").over(w)).collect()
    }
    assert got == want
    assert want[0] is None and want[2] == 5 and want[5] == 12


def test_global_running_sum_decimal_stays_exact(spark):
    """A DECIMAL val_col must keep exact decimal arithmetic end to end
    (ADVICE r6: the old isinstance-int probe routed Decimal offsets
    through a double column, silently losing exactness)."""
    from decimal import Decimal

    from pyspark.sql import Window

    from diachronic_spark.operators.sampling import global_running_sum

    # values chosen to be unrepresentable in binary floating point
    rows = [(i, Decimal("0.1") + Decimal(i)) for i in range(50)]
    df = spark.createDataFrame(rows, "id bigint, v decimal(20,1)")
    out = global_running_sum(
        df, "v", ["id"], cache_key="test.grs.dec", n_partitions=6
    )
    # the out column must be a decimal, not double
    assert out.schema["cum"].dataType.typeName() == "decimal"
    got = {r.id: r.cum for r in out.collect()}
    w = Window.orderBy("id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = {
        r.id: r.cum
        for r in df.withColumn("cum", F.sum("v").over(w)).collect()
    }
    assert got == want
    assert got[49] == Decimal("1230.0")  # sum(0..49) + 50*0.1, exact


def test_dsir_log_weights_prefers_target_like_docs(spark):
    """A raw doc written in the target's vocabulary must outscore a
    raw doc written in the raw pool's own vocabulary, and the weight
    must be a pure function of the token multiset (fold order fixed
    by token order, terms from the dense LLR table)."""
    from diachronic_spark.operators.sampling import dsir_log_weights

    target_words = "alpha beta gamma delta"
    raw_words = "omega psi chi phi"
    rows = (
        # target corpus: repeats its vocabulary
        [(i, f"{target_words} {target_words}", True) for i in range(5)]
        # raw pool background: its own vocabulary
        + [(10 + i, f"{raw_words} {raw_words}", False) for i in range(5)]
        # the two probes
        + [(100, target_words, False), (101, raw_words, False)]
    )
    df = spark.createDataFrame(rows, "doc_id bigint, text string, t boolean")
    out = dsir_log_weights(df, target=F.col("t"), n_buckets=64)
    got = {r.doc_id: r for r in out.collect()}
    assert set(got) == {10, 11, 12, 13, 14, 100, 101}
    assert got[100].log_weight > got[101].log_weight
    assert got[100].n_tokens == 4
    # permutation of the same tokens scores identically (sum of the
    # same 10dp-rounded terms in a different order can differ in the
    # last ulp only if terms differ in magnitude wildly; the 6dp final
    # round absorbs that — assert equality as the contract)
    df2 = spark.createDataFrame(
        rows + [(102, "delta gamma beta alpha", False)],
        "doc_id bigint, text string, t boolean",
    )
    out2 = {r.doc_id: r for r in dsir_log_weights(
        df2, target=F.col("t"), n_buckets=64).collect()}
    assert out2[102].log_weight == out2[100].log_weight
