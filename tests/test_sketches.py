"""Count-min sketch invariants + bigram/entropy helper units."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from diachronic_spark.operators.sketches import (
    count_min_build,
    count_min_estimate,
    count_min_merge,
)
from diachronic_spark.operators.text import bigram_pairs, char_entropy


def _tok_df(spark):
    rows = []
    for g, tokens in [
        ("x", ["a"] * 50 + ["b"] * 20 + ["c"] * 5),
        ("y", ["a"] * 30 + ["d"] * 7 + ["e"] * 1),
    ]:
        rows += [(g, t) for t in tokens]
    return spark.createDataFrame(rows, "g string, tok string")


def test_cms_never_underestimates_and_merge_equals_direct(spark):
    df = _tok_df(spark)
    direct = count_min_build(df, "tok", width=16)
    merged = count_min_merge(count_min_build(df, "tok", width=16, partial_by=["g"]))
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, merged.collect())
    )
    exact = df.groupBy("tok").agg(F.count(F.lit(1)).alias("n_exact"))
    est = count_min_estimate(merged, exact, "tok", width=16)
    for r in est.collect():
        assert r["cm_est"] >= r["n_exact"]  # CMS overestimate invariant


def test_cms_estimate_exact_when_wide(spark):
    # width >> distinct keys: collisions vanish, estimates are exact
    df = _tok_df(spark)
    cells = count_min_build(df, "tok", width=4096)
    exact = df.groupBy("tok").agg(F.count(F.lit(1)).alias("n_exact"))
    est = count_min_estimate(cells, exact, "tok", width=4096)
    assert all(r["cm_est"] == r["n_exact"] for r in est.collect())


def test_bigram_pairs_short_docs(spark):
    df = spark.createDataFrame(
        [("a b c",), ("solo",), ("",)], "text string"
    )
    from diachronic_spark.functions import whitespace_tokens

    out = df.select(
        bigram_pairs(whitespace_tokens(F.col("text"))).alias("bg")
    ).collect()
    assert [[(p["a"], p["b"]) for p in r["bg"]] for r in out] == [
        [("a", "b"), ("b", "c")],
        [],
        [],
    ]


def test_char_entropy_known_values(spark):
    df = spark.createDataFrame(
        [("aaaa",), ("abab",), ("",), ("abcd",)], "text string"
    )
    out = [r["h"] for r in df.select(char_entropy(F.col("text")).alias("h")).collect()]
    assert out[0] == 0.0                      # single symbol
    assert math.isclose(out[1], 1.0)          # two equiprobable symbols
    assert out[2] == 0.0                      # empty text guard
    assert math.isclose(out[3], 2.0)          # four equiprobable symbols


def test_with_char_entropy_matches_column_form(spark):
    from diachronic_spark.operators.text import with_char_entropy

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, ""), (4, "abcd"), (5, "aab bba")],
        "doc_id int, text string",
    )
    col_form = {
        r["doc_id"]: r["h"]
        for r in df.select(
            "doc_id", char_entropy(F.col("text")).alias("h")
        ).collect()
    }
    df_form = {
        r["doc_id"]: r["entropy"]
        for r in with_char_entropy(df).select("doc_id", "entropy").collect()
    }
    for k in col_form:
        assert abs(col_form[k] - df_form[k]) < 1e-12, k


# --- KMV ---------------------------------------------------------------------


def _kmv_df(spark):
    # group 'big' has 100 distinct values (> k), 'small' has 5 (< k)
    rows = [("big", f"u{i}") for i in range(100)] * 2 + [
        ("small", f"u{i}") for i in range(5)
    ]
    return spark.createDataFrame(rows, "g string, v string")


def test_kmv_exact_below_k_and_plausible_above(spark):
    from diachronic_spark.operators.sketches import kmv_build, kmv_estimate

    sk = kmv_build(_kmv_df(spark), "g", "v", k=16)
    got = {
        r.g: (len(r.kmv), r.est)
        for r in sk.select(
            "g", "kmv", kmv_estimate(F.col("kmv"), 16).alias("est")
        ).collect()
    }
    assert got["small"] == (5, 5.0)  # sketch IS the set below k
    n, est = got["big"]
    assert n == 16
    assert 40 <= est <= 250  # unbiased estimator, wide tolerance at k=16


def test_kmv_merge_equals_sketch_of_union(spark):
    from diachronic_spark.operators.sketches import kmv_build, kmv_merge

    df = _kmv_df(spark)
    merged = (
        kmv_build(df, "g", "v", k=16)
        .groupBy()
        .agg(F.array_sort(F.collect_list(F.struct("g", "kmv"))).alias("ps"))
        .select(
            kmv_merge(
                F.col("ps")[0]["kmv"], F.col("ps")[1]["kmv"], 16
            ).alias("m")
        )
        .collect()[0]
        .m
    )
    direct = (
        kmv_build(df.withColumn("g", F.lit("all")), "g", "v", k=16)
        .collect()[0]
        .kmv
    )
    assert merged == direct


def test_kmv_intersection_exact_when_small(spark):
    from diachronic_spark.operators.sketches import (
        kmv_build,
        kmv_intersection_estimate,
    )

    # A = {u0..u9}, B = {u5..u14}: |A ∩ B| = 5, |A ∪ B| = 15 < k=32
    rows = [("a", f"u{i}") for i in range(10)] + [
        ("b", f"u{i}") for i in range(5, 15)
    ]
    df = spark.createDataFrame(rows, "g string, v string")
    est = (
        kmv_build(df, "g", "v", k=32)
        .groupBy()
        .agg(F.array_sort(F.collect_list(F.struct("g", "kmv"))).alias("ps"))
        .select(
            kmv_intersection_estimate(
                F.col("ps")[0]["kmv"], F.col("ps")[1]["kmv"], 32
            ).alias("e")
        )
        .collect()[0]
        .e
    )
    assert est == 5.0  # sketches are the sets -> exact
